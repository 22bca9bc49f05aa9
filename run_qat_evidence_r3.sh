#!/bin/bash
# QAT quality evidence (VERDICT r2 task 4): full pipeline order on a
# trained MNIST class-cond LDM — convert -> enhance adapters ->
# progressive LSQ/AnDi/ADDA — then sample the QUANTIZED model and score
# framework-FID against the FP checkpoint under the identical DDIM
# protocol/seed, in the same process. A second --no-enhance arm with the
# same budget isolates what the adapters buy (reference:
# train_..._tc05_andi.py:497-546 inserts them before the noise stages).
#
# SELF-CONTAINED: the round-2 MNIST checkpoints/latents this originally
# resumed from were destroyed by the mid-round-3 VM reboot, so stages 0-3
# regenerate them (data -> VQVAE 10 epochs -> latents -> class-cond LDM)
# with the same parameters as the committed runs_evidence2 config
# snapshots. ~60-75 min of chip time end-to-end; set QAT_LDM_EPOCHS to
# trade FP quality for wall clock (round-2 evidence used 40).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=${QAT_R:-runs_evidence_qat_r3}
mkdir -p $R

# 0. dataset
[ -d data/mnist/train/images ] || \
  python -m stablediffusion_pytorch_tpu.tools.make_synth_data mnist \
    --root data/mnist > $R/dataset.log 2>&1 || exit 1

# 1. FP VQVAE (10 epochs, as runs_evidence2/mnist_vqvae)
VQ=$(ls -d $R/vqvae/*/mnist/checkpoints/vqvae_autoencoder_ckpt 2>/dev/null | head -1)
if [ -z "$VQ" ]; then
  python -m stablediffusion_pytorch_tpu.tools.train_vqvae \
    --config mnist --output-root $R/vqvae > $R/vqvae.log 2>&1 || exit 1
  VQ=$(ls -d $R/vqvae/*/mnist/checkpoints/vqvae_autoencoder_ckpt | head -1)
fi

# 2. latents
if [ ! -d $R/latents ]; then
  python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents \
    --config mnist --ckpt "$VQ" --batch-size 64 \
    --output-root $R/latents > $R/latents.log 2>&1 || exit 1
fi
LAT=$R/latents/mnist/vqvae_latents

# 3. FP class-cond LDM (round-2 evidence used 40 epochs; override to fit)
FP=$(ls -d $R/ldm/*/mnist/checkpoints/ema_ddpm_ckpt_class_cond_latest 2>/dev/null | head -1)
if [ -z "$FP" ]; then
  python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
    --config mnist_class_cond --latent-root $R/latents --vqvae-ckpt "$VQ" \
    --epochs ${QAT_LDM_EPOCHS:-40} --steps-per-call 4 \
    --output-root $R/ldm > $R/ldm.log 2>&1 || exit 1
  FP=$(ls -d $R/ldm/*/mnist/checkpoints/ema_ddpm_ckpt_class_cond_latest | head -1)
fi
date +%s > $R/t_fp_end

# 4. main arm: adapters on, eval FP + quantized under one protocol
python -m stablediffusion_pytorch_tpu.tools.train_qat \
  --config mnist_class_cond \
  --latent-dir "$LAT" \
  --resume "$FP" \
  --stages LSQ,LSQ_AnDi,LSQ_ADDA --cycles 2 --max-batches 120 \
  --batch-size 16 --epochs-per-cycle 1 \
  --eval-vqvae-ckpt "$VQ" --eval-fid-images data/mnist/train/images \
  --eval-fp-first --eval-samples 100 --eval-steps 100 --eval-guidance 2.0 \
  --output-root $R/with_enhance > $R/qat_with.log 2>&1
date +%s > $R/t_with_end

# 5. ablation arm: identical budget, no adapters
python -m stablediffusion_pytorch_tpu.tools.train_qat \
  --config mnist_class_cond \
  --latent-dir "$LAT" \
  --resume "$FP" \
  --stages LSQ,LSQ_AnDi,LSQ_ADDA --cycles 2 --max-batches 120 \
  --batch-size 16 --epochs-per-cycle 1 --no-enhance \
  --eval-vqvae-ckpt "$VQ" --eval-fid-images data/mnist/train/images \
  --eval-samples 100 --eval-steps 100 --eval-guidance 2.0 \
  --output-root $R/no_enhance > $R/qat_without.log 2>&1
date +%s > $R/t_without_end
echo QAT_R3_DONE
