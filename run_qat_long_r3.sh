#!/bin/bash
# Long-budget QAT arms (round 3): the short arms proved the pipeline +
# adapter effect (ADDA 0.43 vs 0.52) but at 240 ADDA steps vs the
# reference's 500-epoch ADDA schedule (Model_DiT_9L_train.py:593). These
# arms reuse the same FP checkpoint/latents and raise the budget ~19x:
# 2 cycles x 3 epochs x 750 steps per stage.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence_qat_r3
VQ=$(ls -d $R/vqvae/*/mnist/checkpoints/vqvae_autoencoder_ckpt | head -1)
FP=$(ls -d $R/ldm/*/mnist/checkpoints/ema_ddpm_ckpt_class_cond_latest | head -1)
LAT=$R/latents/mnist/vqvae_latents

python -m stablediffusion_pytorch_tpu.tools.train_qat \
  --config mnist_class_cond --latent-dir "$LAT" --resume "$FP" \
  --stages LSQ,LSQ_AnDi,LSQ_ADDA --cycles 2 --max-batches 750 \
  --batch-size 16 --epochs-per-cycle 3 \
  --eval-vqvae-ckpt "$VQ" --eval-fid-images data/mnist/train/images \
  --eval-samples 100 --eval-steps 100 --eval-guidance 2.0 \
  --output-root $R/long_with > $R/qat_long_with.log 2>&1
date +%s > $R/t_long_with_end

python -m stablediffusion_pytorch_tpu.tools.train_qat \
  --config mnist_class_cond --latent-dir "$LAT" --resume "$FP" \
  --stages LSQ,LSQ_AnDi,LSQ_ADDA --cycles 2 --max-batches 750 \
  --batch-size 16 --epochs-per-cycle 3 --no-enhance \
  --eval-vqvae-ckpt "$VQ" --eval-fid-images data/mnist/train/images \
  --eval-samples 100 --eval-steps 100 --eval-guidance 2.0 \
  --output-root $R/long_without > $R/qat_long_without.log 2>&1
date +%s > $R/t_long_without_end
echo QAT_LONG_DONE
