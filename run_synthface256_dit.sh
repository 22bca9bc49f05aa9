#!/bin/bash
# Three-way model-family comparison at the production 256^2/32^2 shape —
# the TPU analogue of the reference's headline table
# (/root/reference/plot_fid_comparison.py:5-9: UNet 14.77 / DiT-9L 12.64 /
# DiT-12L 11.76 on one CelebHQ latent set). Reuses the v3 VQVAE + latents so
# all three denoisers train on identical data; UNet numbers come from the
# committed v3(+ext) run. Per family: train -> sample grid -> 64-image
# framework-FID set -> hair prompt A/B.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V3=runs_evidence256_v3
R=runs_evidence256_dit
mkdir -p $R
DEADLINE=${SF256_DEADLINE:-$(( $(date +%s) + 14400 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }
VQ=$(ls -d $V3/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)
date +%s > $R/t_start

run_family() {
  local CFG=$1 EPOCHS=$2 TRAIN_BUDGET=$3
  local OUT=$R/$CFG
  timeout $TRAIN_BUDGET python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
    --config $CFG --latent-root $V3/latents --vqvae-ckpt "$VQ" \
    --epochs $EPOCHS --steps-per-call 4 \
    --output-root $OUT/ldm > $R/${CFG}_train.log 2>&1
  local RC=$?; [ $RC -ne 0 ] && [ $RC -ne 124 ] && return 1
  date +%s > $R/t_${CFG}_train_end
  local CKPT_DIR=$(ls -d $OUT/ldm/*/*/checkpoints | head -1)
  local EMA=$CKPT_DIR/ema_ddpm_ckpt_text_image_cond_latest
  [ -d "$EMA" ] || EMA=$CKPT_DIR/ddpm_ckpt_text_image_cond_latest

  if [ $(left) -gt 2400 ]; then
  python -m stablediffusion_pytorch_tpu.tools.sample_ddpm \
    --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
    --num-samples 16 --mask-from-dataset \
    --prompt "This person has long brown hair and blue eyes." \
    --cf-guidance-scale 2.0 --sampler ddim --steps 100 --method quadratic \
    --output-root $OUT/samples > $R/${CFG}_sample.log 2>&1
  fi
  if [ $(left) -gt 1800 ]; then
  python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
    --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit 64 --batch-size 8 \
    --steps 50 --cf-guidance-scale 2.0 --out-dir $OUT/fid_set > $R/${CFG}_fidgen.log 2>&1
  python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
    --real-dir data/synthface256/CelebA-HQ-img --fake-dir $OUT/fid_set \
    --image-size 256 --limit 1000 > $R/${CFG}_fid.log 2>&1
  fi
  if [ $(left) -gt 1200 ]; then
  python -m stablediffusion_pytorch_tpu.tools.prompt_ab \
    --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
    --prompts "This person has long black hair and brown eyes.|This person has long blond hair and blue eyes." \
    --region hair --num-per-prompt 8 --steps 50 --cf-guidance-scale 4.0 \
    --output-root $OUT/prompt_ab > $R/${CFG}_ab.log 2>&1
  fi
  date +%s > $R/t_${CFG}_end
}

# DiT-12L first (the reference's best model), then DiT-9L with what's left.
# 70 epochs matches the UNet's total budget (30 + 40-epoch extension).
run_family synthface256_dit12 70 $(( $(left) - 7200 > 1200 ? $(left) - 7200 : 1200 ))
run_family synthface256_dit9 70 $(( $(left) - 3000 > 900 ? $(left) - 3000 : 900 ))
date +%s > $R/t_end
echo SYNTHFACE256_DIT_DONE
