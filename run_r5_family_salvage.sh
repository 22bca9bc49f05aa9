#!/bin/bash
# Round-5 family salvage: the interleaved trainer (run_r5_family.sh) lost
# its dit12 chunk to a timeout after the VM restart ate the first pass, so
# the matched-epoch loop exited at depth 0. Checkpoint state at salvage
# time: dit9 e0-e3 done, dit12 e0 done, unet none. This script finishes
# the remaining arms to epoch 3 and scores ALL THREE at the matched epoch
# (seed 1111, then more seeds while time lasts), FID eval overlapped on
# CPU while the chip moves to the next arm. Exits before R5_END with the
# bench reserve intact.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence_r5/family
export R5_END=${R5_END:-1787213100}
MARGIN=480
left() { echo $(( R5_END - $(date +%s) )); }
hold() { while [ -f /tmp/chip_hold ]; do sleep 30; done; }
VQ=runs_evidence256_10k_r4/vqvae/ddpm_20260819-131836/synthface256/checkpoints/vqvae_autoencoder_ckpt

# wait for the master pipeline's S5 bench prewarm to release the chip
while ps -p "$(cat /tmp/pipeline.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do
  sleep 20
  [ $(left) -lt $MARGIN ] && exit 1
done

train_to4() {  # $1=config $2=start_epoch $3=budget_s
  local CFG=$1 SE=$2 BUD=$3
  local OUT=$R/$CFG
  local RESUME=""
  local LATEST=$(ls -dt $OUT/ldm/*/*/checkpoints/ddpm_ckpt_text_image_cond_latest 2>/dev/null | head -1)
  [ -n "$LATEST" ] && RESUME="--resume $LATEST"
  hold
  timeout $BUD python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
    --config $CFG --latent-root $R/latents --vqvae-ckpt "$VQ" \
    --start-epoch $SE --epochs 4 --steps-per-call 8 $RESUME \
    --output-root $OUT/ldm >> $R/${CFG}_train.log 2>&1
}

if [ ! -d "$(ls -d $R/synthface256_dit12_10k/ldm/*/*/checkpoints/ema_epoch_003_ddpm_ckpt_text_image_cond 2>/dev/null | head -1)" ]; then
  [ $(left) -gt $(( MARGIN + 2300 )) ] && train_to4 synthface256_dit12_10k 1 1000
fi
if [ ! -d "$(ls -d $R/synthface256_10k_text_image_cond/ldm/*/*/checkpoints/ema_epoch_003_ddpm_ckpt_text_image_cond 2>/dev/null | head -1)" ]; then
  [ $(left) -gt $(( MARGIN + 1400 )) ] && train_to4 synthface256_10k_text_image_cond 0 1200
fi
date +%s > $R/t_train_end

E=3
FID_N=256
score() {  # $1=config $2=seed  (gen on chip; FID eval backgrounded on CPU)
  local CFG=$1 SEED=$2
  local TAG=$(printf "e%03d_s%s" $E $SEED)
  [ -f $R/${CFG}_fid_${TAG}.log ] && grep -q '"fid"' $R/${CFG}_fid_${TAG}.log && return 0
  local EMA=$(ls -d $R/$CFG/ldm/*/*/checkpoints/ema_epoch_$(printf %03d $E)_ddpm_ckpt_text_image_cond 2>/dev/null | head -1)
  [ -d "$EMA" ] || { echo "NO_CKPT $CFG e$E"; return 1; }
  hold
  timeout 900 python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
    --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit $FID_N --batch-size 16 \
    --steps 50 --cf-guidance-scale 2.0 --seed $SEED \
    --out-dir $R/$CFG/fid_${TAG} > $R/${CFG}_fidgen_${TAG}.log 2>&1 || return 1
  ( JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
      --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/$CFG/fid_${TAG} \
      --image-size 256 --limit 1000 > $R/${CFG}_fid_${TAG}.log 2>&1 ) &
}

ARMS="synthface256_dit9_10k synthface256_dit12_10k synthface256_10k_text_image_cond"
for SEED in 1111 2222 3333; do
  for CFG in $ARMS; do
    [ $(left) -gt $(( MARGIN + 500 )) ] && score $CFG $SEED
  done
done
wait
date +%s > $R/t_end
echo FAMILY_R5_SALVAGE_DONE
