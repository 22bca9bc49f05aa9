#!/bin/bash
# Flagship-pipeline evidence on procedural synthfaces: text+mask cond LDM.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence3
mkdir -p $R

python -m stablediffusion_pytorch_tpu.tools.train_vqvae --config synthface_text_image_cond \
  --epochs 20 --output-root $R/vqvae > $R/vqvae.log 2>&1 || exit 1
VQ=$(ls -d $R/vqvae/*/synthface/checkpoints/vqvae_autoencoder_ckpt | head -1)

python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents --config synthface_text_image_cond \
  --ckpt "$VQ" --batch-size 32 --output-root $R/latents > $R/latents.log 2>&1 || exit 1

python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond --config synthface_text_image_cond \
  --epochs 60 --latent-root $R/latents --vqvae-ckpt "$VQ" \
  --output-root $R/ldm > $R/ldm.log 2>&1 || exit 1
EMA=$(ls -d $R/ldm/*/synthface/checkpoints/ema_ddpm_ckpt_text_image_cond_latest | head -1)

python -m stablediffusion_pytorch_tpu.tools.sample_ddpm --config synthface_text_image_cond \
  --ckpt "$EMA" --vqvae-ckpt "$VQ" --num-samples 16 --mask-from-dataset \
  --prompt "a face with brown hair" --cf-guidance-scale 2.0 \
  --sampler ddim --steps 100 --output-root $R/samples > $R/sample.log 2>&1

echo SYNTHFACE_PIPELINE_DONE
