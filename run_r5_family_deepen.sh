#!/bin/bash
# Round-5 family deepen (VERDICT r4 #2/#5/#6): extend all three arms from
# matched epoch 3 to matched epoch 7 (DiT-9L FIRST — it gets first claim on
# wall-clock, VERDICT #6), then FID-score e007 at 2 seeds, then add a third
# seed at e003 if time remains. Waits for the QAT full run to release the
# chip; exits with a bench-prewarm reserve intact.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence_r5/family
export R5_END=${R5_END:-1787236000}
MARGIN=900   # bench prewarm + quiesce reserve
left() { echo $(( R5_END - $(date +%s) )); }
VQ=runs_evidence256_10k_r4/vqvae/ddpm_20260819-131836/synthface256/checkpoints/vqvae_autoencoder_ckpt

# wait for the QAT full schedule to release the chip
while ps -p "$(cat /tmp/qat_full.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do
  sleep 30
  [ $(left) -lt $(( MARGIN + 1200 )) ] && { echo DEEPEN_SKIPPED_NO_TIME; exit 1; }
done

E2=7
train_to8() {  # $1=config $2=budget_s — resume weights-only from newest latest
  local CFG=$1 BUD=$2
  local OUT=$R/$CFG
  [ -d "$(ls -d $OUT/ldm/*/*/checkpoints/ema_epoch_$(printf %03d $E2)_ddpm_ckpt_text_image_cond 2>/dev/null | head -1)" ] && return 0
  local LATEST=$(ls -dt $OUT/ldm/*/*/checkpoints/ddpm_ckpt_text_image_cond_latest 2>/dev/null | head -1)
  timeout $BUD python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
    --config $CFG --latent-root $R/latents --vqvae-ckpt "$VQ" \
    --start-epoch 4 --epochs $(( E2 + 1 )) --steps-per-call 8 --resume "$LATEST" \
    --output-root $OUT/ldm >> $R/${CFG}_train.log 2>&1
}

score() {  # $1=config $2=epoch $3=seed — gen on chip, FID scored on CPU
  local CFG=$1 E=$2 SEED=$3
  local TAG=$(printf "e%03d_s%s" $E $SEED)
  [ -f $R/${CFG}_fid_${TAG}.log ] && grep -q '"fid"' $R/${CFG}_fid_${TAG}.log && return 0
  local EMA=$(ls -d $R/$CFG/ldm/*/*/checkpoints/ema_epoch_$(printf %03d $E)_ddpm_ckpt_text_image_cond 2>/dev/null | head -1)
  [ -d "$EMA" ] || { echo "NO_CKPT $CFG e$E"; return 1; }
  timeout 900 python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
    --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit 256 --batch-size 16 \
    --steps 50 --cf-guidance-scale 2.0 --seed $SEED \
    --out-dir $R/$CFG/fid_${TAG} > $R/${CFG}_fidgen_${TAG}.log 2>&1 || return 1
  ( JAX_PLATFORMS=cpu PYTHONPATH=/root/repo \
    python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
      --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/$CFG/fid_${TAG} \
      --image-size 256 --limit 1000 > $R/${CFG}_fid_${TAG}.log 2>&1 ) &
}

ARMS="synthface256_dit9_10k synthface256_dit12_10k synthface256_10k_text_image_cond"
# 1) matched training to e007, DiT-9L first
for CFG in $ARMS; do
  [ $(left) -gt $(( MARGIN + 1500 )) ] && train_to8 $CFG 1300
done
date +%s > $R/t_deepen_train_end
# 2) e007 scores, seed 1111 for all arms before seed 2222 for any
for SEED in 1111 2222; do
  for CFG in $ARMS; do
    [ $(left) -gt $(( MARGIN + 600 )) ] && score $CFG $E2 $SEED
  done
done
# 3) third seed at e003 (error bars, VERDICT #5) with leftover time
for CFG in $ARMS; do
  [ $(left) -gt $(( MARGIN + 600 )) ] && score $CFG 3 3333
done
# 4) third seed at e007 if still time
for CFG in $ARMS; do
  [ $(left) -gt $(( MARGIN + 600 )) ] && score $CFG $E2 3333
done
wait
date +%s > $R/t_deepen_end
echo FAMILY_R5_DEEPEN_DONE
