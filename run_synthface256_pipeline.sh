#!/bin/bash
# PRODUCTION-SCALE flagship-pipeline evidence (VERDICT r2 task #2):
# text+mask conditional LDM at the reference's actual workload shape —
# 256^2 images, 8x-downsample VQVAE -> 32^2 latents, the full
# [256,384,512,768] conditional UNet (reference config
# celebhq_text_image_cond.yaml), 512^2 18-channel masks, bf16 train.
# Procedural synthface data (zero-egress stand-in for CelebAMask-HQ).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence256
mkdir -p $R

[ -d data/synthface256/CelebA-HQ-img ] || \
  python -m stablediffusion_pytorch_tpu.tools.make_synth_data faces \
    --root data/synthface256 --count 3000 --im-size 256 --seed 1111

date +%s > $R/t_vqvae_start
python -m stablediffusion_pytorch_tpu.tools.train_vqvae \
  --config synthface256_text_image_cond \
  --output-root $R/vqvae > $R/vqvae.log 2>&1 || exit 1
date +%s > $R/t_vqvae_end
VQ=$(ls -d $R/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)

python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents \
  --config synthface256_text_image_cond \
  --ckpt "$VQ" --batch-size 16 --output-root $R/latents > $R/latents.log 2>&1 || exit 1
date +%s > $R/t_latents_end

python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
  --config synthface256_text_image_cond \
  --latent-root $R/latents --vqvae-ckpt "$VQ" --steps-per-call 4 \
  --output-root $R/ldm > $R/ldm.log 2>&1 || exit 1
date +%s > $R/t_ldm_end
EMA=$(ls -d $R/ldm/*/synthface256/checkpoints/ema_ddpm_ckpt_text_image_cond_latest | head -1)

python -m stablediffusion_pytorch_tpu.tools.sample_ddpm \
  --config synthface256_text_image_cond \
  --ckpt "$EMA" --vqvae-ckpt "$VQ" --num-samples 16 --mask-from-dataset \
  --prompt "A face with long brown hair and blue eyes." --cf-guidance-scale 2.0 \
  --sampler ddim --steps 100 --method quadratic \
  --output-root $R/samples > $R/sample.log 2>&1
date +%s > $R/t_sample_end

echo SYNTHFACE256_PIPELINE_DONE
