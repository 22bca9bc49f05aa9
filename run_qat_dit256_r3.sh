#!/bin/bash
# Round-3 QAT at the production shape: progressive LSQ -> AnDi on the
# 256^2/32^2-latent text+mask DiT-9L trained by run_synthface256_dit.sh —
# the TPU analogue of the reference's headline experiment
# (Model_DiT_9L_train.py:577-626: FP -> LSQ -> AnDi (-> ADDA) on CelebHQ,
# FID 12.64 ideal vs 12.44 with CIM noise). Scores FP first, then the
# quantized model, under the identical DDIM protocol/seed.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence256_qat
mkdir -p $R
V3=runs_evidence256_v3
VQ=$(ls -d $V3/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)
FP=$(ls -d runs_evidence256_dit/synthface256_dit9/ldm/*/synthface256_dit9/checkpoints/ema_ddpm_ckpt_text_image_cond_latest 2>/dev/null | head -1)
[ -d "$FP" ] || FP=$(ls -d runs_evidence256_dit/synthface256_dit9/ldm/*/synthface256_dit9/checkpoints/ddpm_ckpt_text_image_cond_latest | head -1)
date +%s > $R/t_start

timeout ${QAT256_BUDGET:-10800} python -m stablediffusion_pytorch_tpu.tools.train_qat \
  --config synthface256_dit9 \
  --latent-dir $V3/latents/synthface256/vqvae_latents \
  --resume "$FP" \
  --stages LSQ,LSQ_AnDi --cycles 2 --epochs-per-cycle 1 --max-batches 180 \
  --batch-size 16 \
  --eval-fp-first --eval-vqvae-ckpt "$VQ" \
  --eval-fid-images data/synthface256/CelebA-HQ-img \
  --eval-samples 64 --eval-steps 50 --eval-guidance 2.0 \
  --output-root $R/andi > $R/qat_dit256.log 2>&1
date +%s > $R/t_end
echo QAT_DIT256_DONE
