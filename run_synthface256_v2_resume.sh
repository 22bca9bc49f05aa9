#!/bin/bash
# Tail of run_synthface256_v2.sh, restarted after the orchestrator shell
# died with the previous session while the stage-1 VQVAE trainer (still
# alive) kept running. v3: reuses the latent shards infer_vqvae already
# pickles (the preset sets save_latents, and infer_vqvae's encode path and
# shard format are identical to gen_vqvae_latents) instead of re-encoding
# all 3000 256^2 images a second time — on this 1-vCPU VM the host PNG
# decode dominates and the duplicate pass costs ~40 min. Shards are
# pickle-validated first (an earlier racing writer was killed mid-run);
# any invalid/missing shard falls back to gen_vqvae_latents.
# Same stage commands and artifact layout as run_synthface256_v2.sh:26-101.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence256_v2
CFG=synthface256_text_image_cond

# Wait (bounded) for the in-flight infer_vqvae (orphaned child of the old
# resumer) to finish writing its recon grid + latent shards.
WAIT_PID=${SF256_WAIT_PID:-}
if [ -n "$WAIT_PID" ]; then
  for i in $(seq 1 240); do
    kill -0 "$WAIT_PID" 2>/dev/null || break
    sleep 30
  done
  kill -0 "$WAIT_PID" 2>/dev/null && { echo "stage still alive after 2h" >&2; exit 2; }
fi

DEADLINE=${SF256_DEADLINE:-$(( $(date +%s) + 10800 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

VQ=$(ls -d $R/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)
[ -d "$VQ" ] || { echo "no VQVAE latest ckpt" >&2; exit 1; }

# Reuse infer_vqvae's latent shards if all three validate; else regenerate.
if python - <<'EOF'
import pickle, sys, glob
shards = sorted(glob.glob("runs_evidence256_v2/recon/synthface256/vqvae_latents/*.pkl"))
total = 0
for s in shards:
    try:
        with open(s, "rb") as f:
            d = pickle.load(f)
        total += len(d)
    except Exception as e:
        print(f"bad shard {s}: {e}", file=sys.stderr)
        sys.exit(1)
print(f"validated {len(shards)} shards, {total} latents", file=sys.stderr)
sys.exit(0 if total == 3000 else 1)
EOF
then
  mkdir -p $R/latents/synthface256
  rm -rf $R/latents/synthface256/vqvae_latents
  cp -al $R/recon/synthface256/vqvae_latents $R/latents/synthface256/vqvae_latents
else
  python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents \
    --config $CFG --ckpt "$VQ" --batch-size 16 \
    --output-root $R/latents > $R/latents.log 2>&1 || exit 1
fi
date +%s > $R/t_latents_end

LDM_BUDGET=$(( $(left) - 1800 ))
[ $LDM_BUDGET -lt 600 ] && LDM_BUDGET=600
timeout $LDM_BUDGET python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
  --config $CFG --latent-root $R/latents --vqvae-ckpt "$VQ" \
  --steps-per-call 4 --output-root $R/ldm > $R/ldm.log 2>&1
RC=$?; [ $RC -ne 0 ] && [ $RC -ne 124 ] && exit 1
date +%s > $R/t_ldm_end
CKPT_DIR=$(ls -d $R/ldm/*/synthface256/checkpoints | head -1)
EMA=$CKPT_DIR/ema_ddpm_ckpt_text_image_cond_latest
RAW=$CKPT_DIR/ddpm_ckpt_text_image_cond_latest
[ -d "$EMA" ] || EMA=$RAW

if [ $(left) -gt 1500 ]; then
python -m stablediffusion_pytorch_tpu.tools.sample_ddpm \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --num-samples 16 --mask-from-dataset \
  --prompt "This person has long brown hair and blue eyes." \
  --cf-guidance-scale 2.0 --sampler ddim --steps 100 --method quadratic \
  --output-root $R/samples > $R/sample.log 2>&1
fi
date +%s > $R/t_sample_end

for EP in 000 005 011; do
  [ $(left) -gt 1200 ] || break
  C=$CKPT_DIR/ema_epoch_${EP}_ddpm_ckpt_text_image_cond
  [ -d "$C" ] || C=$CKPT_DIR/epoch_${EP}_ddpm_ckpt_text_image_cond
  [ -d "$C" ] || continue
  python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
    --config $CFG --ckpt "$C" --vqvae-ckpt "$VQ" --limit 16 --batch-size 8 \
    --steps 50 --cf-guidance-scale 2.0 --out-dir $R/fid_traj/ep_$EP \
    >> $R/fidtraj.log 2>&1
  python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
    --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/fid_traj/ep_$EP \
    --image-size 256 --limit 1000 >> $R/fidtraj.log 2>&1
done
date +%s > $R/t_fidtraj_end

if [ $(left) -gt 900 ]; then
python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit 32 --batch-size 8 \
  --steps 50 --cf-guidance-scale 2.0 --out-dir $R/fid_set > $R/fidgen.log 2>&1
python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
  --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/fid_set \
  --image-size 256 --limit 1000 > $R/fid.log 2>&1
fi
date +%s > $R/t_fid_end

if [ $(left) -gt 600 ]; then
python -m stablediffusion_pytorch_tpu.tools.prompt_ab \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --prompts "This person has long black hair and brown eyes.|This person has long blond hair and blue eyes." \
  --region hair --num-per-prompt 6 --steps 50 --cf-guidance-scale 4.0 \
  --output-root $R/prompt_ab > $R/prompt_ab.log 2>&1
fi
date +%s > $R/t_ab_end

echo SYNTHFACE256_V2_DONE
