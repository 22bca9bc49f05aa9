#!/bin/bash
# Sequential on-chip evidence pipeline (round 2): longer VQVAE -> latents ->
# longer LDM -> samples -> FID trajectory -> QAT-on-real-latents.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence2
mkdir -p $R

python -m stablediffusion_pytorch_tpu.tools.train_vqvae --config mnist \
  --epochs 30 --output-root $R/mnist_vqvae > $R/vqvae.log 2>&1 || exit 1
VQ=$(ls -d $R/mnist_vqvae/*/mnist/checkpoints/vqvae_autoencoder_ckpt | head -1)
echo "VQ=$VQ"

python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents --config mnist_class_cond \
  --ckpt "$VQ" --batch-size 64 --output-root $R/latents > $R/latents.log 2>&1 || exit 1

python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond --config mnist_class_cond \
  --epochs 60 --latent-root $R/latents --vqvae-ckpt "$VQ" \
  --output-root $R/mnist_ldm > $R/ldm.log 2>&1 || exit 1
LDMRUN=$(ls -d $R/mnist_ldm/*/mnist | head -1)
EMA=$LDMRUN/checkpoints/ema_ddpm_ckpt_class_cond_latest
echo "EMA=$EMA"

python -m stablediffusion_pytorch_tpu.tools.sample_ddpm --config mnist_class_cond \
  --ckpt "$EMA" --vqvae-ckpt "$VQ" --num-samples 100 --class-id -1 \
  --cf-guidance-scale 2.0 --sampler ddpm \
  --output-root $R/samples_allclass > $R/sample_ddpm.log 2>&1 || exit 1

python -m stablediffusion_pytorch_tpu.tools.sample_ddpm --config mnist_class_cond \
  --ckpt "$EMA" --vqvae-ckpt "$VQ" --num-samples 100 --class-id -1 \
  --cf-guidance-scale 2.0 --sampler ddim --steps 200 \
  --output-root $R/samples_ddim > $R/sample_ddim.log 2>&1

SDTPU_FID_CKPT_ROOT=$LDMRUN/checkpoints SDTPU_FID_VQ=$VQ SDTPU_FID_OUT=$R SDTPU_FID_LAST_EPOCH=59 \
python tools_fid_traj.py > $R/fid_traj.log 2>&1

python -m stablediffusion_pytorch_tpu.tools.train_qat \
  --config mnist_class_cond --latent-dir $R/latents/mnist/vqvae_latents \
  --stages LSQ,LSQ_AnDi,LSQ_ADDA --cycles 2 --epochs-per-cycle 1 \
  --batch-size 64 --max-batches 60 --resume "$EMA" \
  --output-root $R/qat_mnist > $R/qat.log 2>&1

echo PIPELINE_DONE
