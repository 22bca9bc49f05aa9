#!/bin/bash
# Round-4 VERDICT #5: converge 256^2 stage-1 with the discriminator ON —
# the reference's production VQVAE recipe (tools/train_vqvae.py:124-166:
# MSE + codebook + commitment + LPIPS + adversarial past disc_start).
# Uses the synthface256_gan preset: fallback LPIPS (perceptual_weight 1.0)
# as the texture anchor, disc engages at ~epoch 5 of 20; the trainer logs
# the decode-std mean-collapse guard every log interval. Ends with a recon
# grid from the trained checkpoint. Idempotent: skipped when the done
# marker exists; resumes from the newest epoch checkpoint otherwise.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence_r4/stage1_gan
mkdir -p $R
[ -f $R/t_done ] && { echo STAGE1_GAN_ALREADY_DONE; exit 0; }
date +%s > $R/t_start

# One UNCONTENDED serving sweep over batches 1,4,8 first (ADVICE r3 #2:
# round-3's table stitched two runs measured under different host load;
# this runs in the quiet window right after the family pass releases the
# chip, giving the single-file sweep PERF.md should cite).
if [ ! -f runs_evidence_r4/serving_sweep_r4.json ]; then
  timeout 2400 python -m stablediffusion_pytorch_tpu.tools.bench_serving \
    --config synthface256_text_image_cond --batches 1,4,8 --steps 50 \
    --reps 3 --bf16 --streaming --chunk 10 \
    --out runs_evidence_r4/serving_sweep_r4.json \
    > runs_evidence_r4/serving_sweep_r4.log 2>&1
fi

RESUME=""
LAST=$(ls -d $R/train/*/synthface256_gan/checkpoints/epoch_*_vqvae_autoencoder_ckpt 2>/dev/null | sort | tail -1)
if [ -n "$LAST" ]; then
  DISC=$(dirname "$LAST")/vqvae_discriminator_ckpt
  RESUME="--resume-gen $LAST"
  [ -d "$DISC" ] && RESUME="$RESUME --resume-disc $DISC"
fi

timeout ${GAN_TIMEOUT:-5400} python -m stablediffusion_pytorch_tpu.tools.train_vqvae \
  --config synthface256_gan --output-root $R/train $RESUME \
  > $R/train.log 2>&1
RC=$?
[ $RC -ne 0 ] && [ $RC -ne 124 ] && { echo STAGE1_GAN_FAILED rc=$RC; exit 1; }

CK=$(ls -d $R/train/*/synthface256_gan/checkpoints/vqvae_autoencoder_ckpt 2>/dev/null | head -1)
python -m stablediffusion_pytorch_tpu.tools.infer_vqvae \
  --config synthface256_gan --ckpt "$CK" \
  --output-root $R/recon > $R/recon.log 2>&1
date +%s > $R/t_done
echo STAGE1_GAN_DONE
