#!/bin/bash
# Round-3 256^2 flagship evidence, attempt 3: same pipeline as v2 (which
# committed full-scale evidence) but 2.5x the LDM budget (30 epochs vs
# 12) to (a) push framework-FID lower with clearly converged curves and
# (b) test whether prompt steering emerges at 256^2 with more training —
# v2's honest negative was "not steered at 12 epochs" while the 64^2
# flagship steers 2.74x at 60 epochs.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence256_v3
CFG=synthface256_text_image_cond
mkdir -p $R

# Hard deadline (unix ts). Caller overrides; default = now + 2h50m.
DEADLINE=${SF256_DEADLINE:-$(( $(date +%s) + 17400 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }

date +%s > $R/t_start
[ -d data/synthface256/CelebA-HQ-img ] || \
  python -m stablediffusion_pytorch_tpu.tools.make_synth_data faces \
    --root data/synthface256 --count 3000 --im-size 256 > $R/dataset.log 2>&1 || exit 1
python -m stablediffusion_pytorch_tpu.tools.train_vqvae \
  --config $CFG --output-root $R/vqvae > $R/vqvae.log 2>&1 || exit 1
date +%s > $R/t_vqvae_end
VQ=$(ls -d $R/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)

# stage-1 evidence: side-by-side recon grid at 256^2
python -m stablediffusion_pytorch_tpu.tools.infer_vqvae \
  --config $CFG --ckpt "$VQ" \
  --output-root $R/recon > $R/recon.log 2>&1

python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents \
  --config $CFG --ckpt "$VQ" --batch-size 16 \
  --output-root $R/latents > $R/latents.log 2>&1 || exit 1
date +%s > $R/t_latents_end

# LDM: bounded so the evidence tail (~30 min) always fits. rc=124 (timeout)
# is fine — per-epoch checkpoints exist; anything else fatal.
LDM_BUDGET=$(( $(left) - 1800 ))
[ $LDM_BUDGET -lt 600 ] && LDM_BUDGET=600
timeout $LDM_BUDGET python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
  --config $CFG --latent-root $R/latents --vqvae-ckpt "$VQ" \
  --epochs 30 --steps-per-call 4 --output-root $R/ldm > $R/ldm.log 2>&1
RC=$?; [ $RC -ne 0 ] && [ $RC -ne 124 ] && exit 1
date +%s > $R/t_ldm_end
CKPT_DIR=$(ls -d $R/ldm/*/synthface256/checkpoints | head -1)
EMA=$CKPT_DIR/ema_ddpm_ckpt_text_image_cond_latest
RAW=$CKPT_DIR/ddpm_ckpt_text_image_cond_latest
[ -d "$EMA" ] || EMA=$RAW

# sample grid from the (warmup-)EMA checkpoint
if [ $(left) -gt 1500 ]; then
python -m stablediffusion_pytorch_tpu.tools.sample_ddpm \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --num-samples 16 --mask-from-dataset \
  --prompt "This person has long brown hair and blue eyes." \
  --cf-guidance-scale 2.0 --sampler ddim --steps 100 --method quadratic \
  --output-root $R/samples > $R/sample.log 2>&1
fi
date +%s > $R/t_sample_end

# FID trajectory: 16-image sets from early/late epoch checkpoints
for EP in 000 009 019 029; do
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

# final 32-image FID set from the EMA checkpoint
if [ $(left) -gt 900 ]; then
python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit 64 --batch-size 8 \
  --steps 50 --cf-guidance-scale 2.0 --out-dir $R/fid_set > $R/fidgen.log 2>&1
python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
  --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/fid_set \
  --image-size 256 --limit 1000 > $R/fid.log 2>&1
fi
date +%s > $R/t_fid_end

# prompt-steering A/B at the production scale
if [ $(left) -gt 600 ]; then
python -m stablediffusion_pytorch_tpu.tools.prompt_ab \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --prompts "This person has long black hair and brown eyes.|This person has long blond hair and blue eyes." \
  --region hair --num-per-prompt 8 --steps 50 --cf-guidance-scale 4.0 \
  --output-root $R/prompt_ab > $R/prompt_ab.log 2>&1
fi
if [ $(left) -gt 600 ]; then
python -m stablediffusion_pytorch_tpu.tools.prompt_ab \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --prompts "This person wears red clothes.|This person wears blue clothes." \
  --region cloth --num-per-prompt 8 --steps 50 --cf-guidance-scale 4.0 \
  --output-root $R/prompt_ab_cloth > $R/prompt_ab_cloth.log 2>&1
fi
date +%s > $R/t_ab_end

echo SYNTHFACE256_V3_DONE
