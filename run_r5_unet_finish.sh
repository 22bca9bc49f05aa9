#!/bin/bash
# Round-5 family: finish the UNet arm to matched epoch 3 (VERDICT r4 #2/#6).
# The VM restart killed it mid-epoch-2-save; the committed non-EMA `latest`
# is end-of-epoch-2 weights. Resume weights-only (same methodology the dit12
# arm used after its own restart) and train global epoch 3, then FID-score
# e003 at seeds 1111/2222 (gen on chip, scoring backgrounded on CPU).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence_r5/family
CFG=synthface256_10k_text_image_cond
VQ=runs_evidence256_10k_r4/vqvae/ddpm_20260819-131836/synthface256/checkpoints/vqvae_autoencoder_ckpt
LATEST=$(ls -dt $R/$CFG/ldm/*/*/checkpoints/ddpm_ckpt_text_image_cond_latest 2>/dev/null | head -1)
if [ ! -d "$(ls -d $R/$CFG/ldm/*/*/checkpoints/ema_epoch_003_ddpm_ckpt_text_image_cond 2>/dev/null | head -1)" ]; then
  timeout 1500 python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
    --config $CFG --latent-root $R/latents --vqvae-ckpt "$VQ" \
    --start-epoch 3 --epochs 4 --steps-per-call 8 --resume "$LATEST" \
    --output-root $R/$CFG/ldm >> $R/${CFG}_train.log 2>&1
fi
E=3; FID_N=256
for SEED in 1111 2222; do
  TAG=$(printf "e%03d_s%s" $E $SEED)
  [ -f $R/${CFG}_fid_${TAG}.log ] && grep -q '"fid"' $R/${CFG}_fid_${TAG}.log && continue
  EMA=$(ls -d $R/$CFG/ldm/*/*/checkpoints/ema_epoch_$(printf %03d $E)_ddpm_ckpt_text_image_cond 2>/dev/null | head -1)
  [ -d "$EMA" ] || { echo "NO_CKPT $CFG e$E"; break; }
  timeout 900 python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
    --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit $FID_N --batch-size 16 \
    --steps 50 --cf-guidance-scale 2.0 --seed $SEED \
    --out-dir $R/$CFG/fid_${TAG} > $R/${CFG}_fidgen_${TAG}.log 2>&1 || break
  ( JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
      --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/$CFG/fid_${TAG} \
      --image-size 256 --limit 1000 > $R/${CFG}_fid_${TAG}.log 2>&1 ) &
done
wait
echo UNET_FINISH_DONE
