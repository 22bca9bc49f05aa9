#!/bin/bash
# Round-3 QAT quality evidence (VERDICT r2 task 4): full pipeline order on
# the trained MNIST class-cond LDM — convert -> enhance adapters ->
# progressive LSQ/AnDi/ADDA with MORE cycles and steps than round 2
# (which stopped at ADDA loss 0.60 vs FP 0.056 after 2x60 steps) — then
# sample the QUANTIZED model and score framework-FID against the FP
# checkpoint under the identical DDIM protocol/seed, in the same process.
# A second --no-enhance arm with the same budget isolates what the
# adapters buy (reference: train_..._tc05_andi.py:497-546 inserts them
# before the noise stages).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence256/qat_r3
mkdir -p $R

VQ=$(ls -d runs_evidence2/mnist_vqvae/*/mnist/checkpoints/vqvae_autoencoder_ckpt | head -1)
FP=runs_evidence2/mnist_ldm/ddpm_20260817-020647/mnist/checkpoints/ema_ddpm_ckpt_class_cond_latest

# main arm: adapters on, eval FP + quantized under one protocol
python -m stablediffusion_pytorch_tpu.tools.train_qat \
  --config mnist_class_cond \
  --latent-dir runs_evidence2/latents/mnist/vqvae_latents \
  --resume "$FP" \
  --stages LSQ,LSQ_AnDi,LSQ_ADDA --cycles 2 --max-batches 120 \
  --batch-size 16 --epochs-per-cycle 1 \
  --eval-vqvae-ckpt "$VQ" --eval-fid-images data/mnist/train/images \
  --eval-fp-first --eval-samples 100 --eval-steps 100 --eval-guidance 2.0 \
  --output-root $R/with_enhance > $R/qat_with.log 2>&1
date +%s > $R/t_with_end

# ablation arm: identical budget, no adapters
python -m stablediffusion_pytorch_tpu.tools.train_qat \
  --config mnist_class_cond \
  --latent-dir runs_evidence2/latents/mnist/vqvae_latents \
  --resume "$FP" \
  --stages LSQ,LSQ_AnDi,LSQ_ADDA --cycles 2 --max-batches 120 \
  --batch-size 16 --epochs-per-cycle 1 --no-enhance \
  --eval-vqvae-ckpt "$VQ" --eval-fid-images data/mnist/train/images \
  --eval-samples 100 --eval-steps 100 --eval-guidance 2.0 \
  --output-root $R/no_enhance > $R/qat_without.log 2>&1
date +%s > $R/t_without_end
echo QAT_R3_DONE
