#!/bin/bash
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence3
VQ=runs_evidence3/vqvae/ddpm_20260817-052950/synthface/checkpoints/vqvae_autoencoder_ckpt
python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond --config synthface_text_image_cond \
  --epochs 25 --latent-root $R/latents --vqvae-ckpt "$VQ" \
  --resume runs_evidence3/ldm/ddpm_20260817-060508/synthface/checkpoints/ddpm_ckpt_text_image_cond_latest \
  --output-root $R/ldm2 > $R/ldm2.log 2>&1 || exit 1
EMA=$(ls -d $R/ldm2/*/synthface/checkpoints/ema_ddpm_ckpt_text_image_cond_latest | head -1)

python -m stablediffusion_pytorch_tpu.tools.sample_ddpm --config synthface_text_image_cond \
  --ckpt "$EMA" --vqvae-ckpt "$VQ" --num-samples 16 --mask-from-dataset \
  --prompt "a face with brown hair" --cf-guidance-scale 2.0 \
  --sampler ddim --steps 100 --output-root $R/samples > $R/sample.log 2>&1

python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
  --config synthface_text_image_cond --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --out-dir $R/fid_set --limit 128 --steps 50 --cf-guidance-scale 2.0 \
  --batch-size 32 > $R/fidgen.log 2>&1

python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
  --real-dir data/synthface/CelebA-HQ-img --fake-dir $R/fid_set \
  --image-size 64 --limit 128 > $R/fid.log 2>&1

echo SYNTHFACE_RESUME_DONE
