#!/bin/bash
# Tail of run_synthface256_v2.sh, restarted after the orchestrator shell
# died with the previous session while the stage-1 VQVAE trainer (still
# alive) kept running. Waits for that trainer to finish, then runs the
# remaining evidence stages with a fresh deadline. Same stage commands and
# artifact layout as run_synthface256_v2.sh:26-101.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence256_v2
CFG=synthface256_text_image_cond

# Wait (bounded) for the in-flight VQVAE trainer to exit.
VQ_PID=${SF256_VQ_PID:-1208}
for i in $(seq 1 240); do
  kill -0 "$VQ_PID" 2>/dev/null || break
  sleep 30
done
if kill -0 "$VQ_PID" 2>/dev/null; then
  echo "VQVAE trainer still alive after 2h wait — aborting tail" >&2
  exit 2
fi
date +%s > $R/t_vqvae_end

DEADLINE=${SF256_DEADLINE:-$(( $(date +%s) + 10800 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

VQ=$(ls -d $R/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)
[ -d "$VQ" ] || { echo "no VQVAE latest ckpt" >&2; exit 1; }

python -m stablediffusion_pytorch_tpu.tools.infer_vqvae \
  --config $CFG --ckpt "$VQ" \
  --output-root $R/recon > $R/recon.log 2>&1

python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents \
  --config $CFG --ckpt "$VQ" --batch-size 16 \
  --output-root $R/latents > $R/latents.log 2>&1 || exit 1
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
