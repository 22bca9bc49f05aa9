#!/bin/bash
# Round-3 256^2 flagship evidence, attempt 2 (VERDICT r2 task 2).
# v1 (runs_evidence256) trained end-to-end but its VQVAE mean-collapsed:
# the GAN phase without LPIPS (no pretrained weights in-env) drove the
# 256^2 decoder to predict-the-mean (decode std 0.08). v2 disables the
# adversarial stage (preset comment explains), retrains both stages with
# the EMA-warmup trainer, and runs every evidence stage sized to the
# remaining round budget. All stages on the real chip.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence256_v2
CFG=synthface256_text_image_cond
mkdir -p $R

date +%s > $R/t_start
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

python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
  --config $CFG --latent-root $R/latents --vqvae-ckpt "$VQ" \
  --steps-per-call 4 --output-root $R/ldm > $R/ldm.log 2>&1 || exit 1
date +%s > $R/t_ldm_end
CKPT_DIR=$(ls -d $R/ldm/*/synthface256/checkpoints | head -1)
EMA=$CKPT_DIR/ema_ddpm_ckpt_text_image_cond_latest

# sample grid from the (warmup-)EMA checkpoint
python -m stablediffusion_pytorch_tpu.tools.sample_ddpm \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --num-samples 16 --mask-from-dataset \
  --prompt "This person has long brown hair and blue eyes." \
  --cf-guidance-scale 2.0 --sampler ddim --steps 100 --method quadratic \
  --output-root $R/samples > $R/sample.log 2>&1
date +%s > $R/t_sample_end

# FID trajectory: 24-image sets from three epoch checkpoints
for EP in 000 005 011; do
  C=$CKPT_DIR/ema_epoch_${EP}_ddpm_ckpt_text_image_cond
  [ -d "$C" ] || continue
  python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
    --config $CFG --ckpt "$C" --vqvae-ckpt "$VQ" --limit 24 --batch-size 8 \
    --steps 50 --cf-guidance-scale 2.0 --out-dir $R/fid_traj/ep_$EP \
    >> $R/fidtraj.log 2>&1
  python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
    --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/fid_traj/ep_$EP \
    --image-size 256 --limit 1000 >> $R/fidtraj.log 2>&1
done
date +%s > $R/t_fidtraj_end

# final 64-image FID set from the EMA checkpoint
python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit 64 --batch-size 8 \
  --steps 50 --cf-guidance-scale 2.0 --out-dir $R/fid_set > $R/fidgen.log 2>&1
python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
  --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/fid_set \
  --image-size 256 --limit 1000 > $R/fid.log 2>&1
date +%s > $R/t_fid_end

# prompt-steering A/B at the production scale
python -m stablediffusion_pytorch_tpu.tools.prompt_ab \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --prompts "This person has long black hair and brown eyes.|This person has long blond hair and blue eyes." \
  --region hair --num-per-prompt 8 --steps 100 --cf-guidance-scale 4.0 \
  --output-root $R/prompt_ab > $R/prompt_ab.log 2>&1
date +%s > $R/t_ab_end

echo SYNTHFACE256_V2_DONE
