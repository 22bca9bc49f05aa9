#!/bin/bash
# Round-5 VERDICT #2/#5/#6: the three-family comparison at EQUAL EPOCHS.
#
# The round-4 run trained UNet 26 / DiT-12L 13 / DiT-9L 7 epochs (unequal —
# verdict weak #2) and its checkpoints were then lost to the inter-round VM
# reboot, so round 5 retrains all three arms from scratch on the same
# committed stage-1 VQVAE + regenerated deterministic 10k latent set — but
# INTERLEAVED: each pass trains every arm exactly EPOCHS_PER_CHUNK more
# epochs (global epoch numbering via train_ddpm_cond --start-epoch), so at
# ANY cutoff the arms are within one chunk of each other and the committed
# table is a fair matched-epoch ranking. DiT-9L (the reference's production
# model, verdict #6) goes FIRST in every round so it is never the
# shallowest arm again.
#
# After training: FID at the deepest common epoch with 3 sampler seeds
# (verdict #5: mean±std error bars), plus a 1-seed mid-depth point per arm
# for the FID-vs-epoch trajectory, all against the same 3k-image real set
# every committed round-3/4 number used.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence_r5/family
mkdir -p $R
END=${R5_END:-$(( $(date +%s) + 14400 ))}
SCORING_RESERVE=${SCORING_RESERVE:-4000}   # 3 arms x 3 seeds (+ mid points if time)
BENCH_RESERVE=900
left() { echo $(( END - $(date +%s) )); }
hold() { while [ -f /tmp/chip_hold ]; do sleep 30; done; }
[ -f $R/t_start ] || date +%s > $R/t_start

VQ=runs_evidence256_10k_r4/vqvae/ddpm_20260819-131836/synthface256/checkpoints/vqvae_autoencoder_ckpt
[ -d "$VQ" ] || { echo MISSING_VQ; exit 1; }

# wait for the deterministic datasets (background CPU job)
while [ ! -f runs_evidence_r5/.datasets_done ]; do
  sleep 20
  [ $(left) -lt $(( SCORING_RESERVE + BENCH_RESERVE )) ] && exit 1
done

# shared 10k latents (chip; ~10 min at batch 16)
if [ ! -f $R/latents/.done ]; then
  hold
  timeout 4500 python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents \
    --config synthface256_dit9a_10k --ckpt "$VQ" --batch-size 16 \
    --output-root $R/latents > $R/latents.log 2>&1 || exit 1
  touch $R/latents/.done
fi
LSRC=$(ls -d $R/latents/*/vqvae_latents | head -1)
for TN in synthface256_dit9_10k synthface256_dit12_10k synthface256_10k; do
  mkdir -p $R/latents/$TN
  [ -e $R/latents/$TN/vqvae_latents ] || \
    ln -s "$(realpath "$LSRC")" $R/latents/$TN/vqvae_latents
done
date +%s > $R/t_latents_end

CHUNK=${EPOCHS_PER_CHUNK:-4}
# DiT-9L first (verdict #6), then DiT-12L, then UNet
ARMS="synthface256_dit9_10k synthface256_dit12_10k synthface256_10k_text_image_cond"
# measured r4 pace: ~150-205 s/epoch/arm; one full 3-arm round of CHUNK
# epochs plus per-arm compile ~= 3*(CHUNK*210+150) s
ROUND_COST=$(( 3 * (CHUNK * 210 + 150) ))

train_chunk() {  # $1=config $2=start_epoch
  local CFG=$1 SE=$2
  local OUT=$R/$CFG
  local RESUME=""
  local LATEST=$(ls -dt $OUT/ldm/*/*/checkpoints/ddpm_ckpt_text_image_cond_latest 2>/dev/null | head -1)
  [ -n "$LATEST" ] && RESUME="--resume $LATEST"
  timeout $(( CHUNK * 210 + 600 )) python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
    --config $CFG --latent-root $R/latents --vqvae-ckpt "$VQ" \
    --start-epoch $SE --epochs $(( SE + CHUNK )) --steps-per-call 8 $RESUME \
    --output-root $OUT/ldm >> $R/${CFG}_train.log 2>&1
}

DEPTH=0
[ -f $R/depth ] && DEPTH=$(cat $R/depth)
while [ $(left) -gt $(( SCORING_RESERVE + BENCH_RESERVE + ROUND_COST )) ]; do
  OK=1
  for CFG in $ARMS; do
    hold
    train_chunk $CFG $DEPTH || { OK=0; break; }
  done
  [ $OK -eq 1 ] || break
  DEPTH=$(( DEPTH + CHUNK ))
  echo $DEPTH > $R/depth
  echo "FAMILY_R5_DEPTH $DEPTH epochs (all arms)"
done
date +%s > $R/t_train_end

# ---- scoring at matched epochs ----
DEPTH=$(cat $R/depth 2>/dev/null || echo 0)
[ $DEPTH -lt 1 ] && { echo NO_DEPTH; exit 1; }
E_FINAL=$(( DEPTH - 1 ))
E_MID=$(( DEPTH / 2 - 1 ))
FID_N=256

score() {  # $1=config $2=epoch_idx $3=seed
  local CFG=$1 E=$2 SEED=$3
  local OUT=$R/$CFG
  local TAG=$(printf "e%03d_s%s" $E $SEED)
  [ -f $R/${CFG}_fid_${TAG}.log ] && grep -q '"fid"' $R/${CFG}_fid_${TAG}.log && return 0
  local EMA=$(ls -d $OUT/ldm/*/*/checkpoints/ema_epoch_$(printf %03d $E)_ddpm_ckpt_text_image_cond 2>/dev/null | head -1)
  [ -d "$EMA" ] || EMA=$(ls -d $OUT/ldm/*/*/checkpoints/epoch_$(printf %03d $E)_ddpm_ckpt_text_image_cond 2>/dev/null | head -1)
  [ -d "$EMA" ] || { echo "NO_CKPT $CFG e$E"; return 1; }
  hold
  timeout 1500 python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
    --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit $FID_N --batch-size 16 \
    --steps 50 --cf-guidance-scale 2.0 --seed $SEED \
    --out-dir $R/$CFG/fid_${TAG} > $R/${CFG}_fidgen_${TAG}.log 2>&1
  python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
    --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/$CFG/fid_${TAG} \
    --image-size 256 --limit 1000 > $R/${CFG}_fid_${TAG}.log 2>&1
}

# final matched epoch, 3 sampler seeds per arm (error bars), then one
# sample grid per arm, then mid-depth trajectory points while time lasts
for SEED in 1111 2222 3333; do
  for CFG in $ARMS; do
    [ $(left) -gt $(( BENCH_RESERVE + 600 )) ] && score $CFG $E_FINAL $SEED
  done
done
for CFG in $ARMS; do
  if [ $(left) -gt $(( BENCH_RESERVE + 300 )) ]; then
    EMA=$(ls -d $R/$CFG/ldm/*/*/checkpoints/ema_epoch_$(printf %03d $E_FINAL)_ddpm_ckpt_text_image_cond 2>/dev/null | head -1)
    hold
    timeout 900 python -m stablediffusion_pytorch_tpu.tools.sample_ddpm \
      --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
      --num-samples 16 --mask-from-dataset \
      --prompt "This person has long brown hair and blue eyes." \
      --cf-guidance-scale 2.0 --sampler ddim --steps 100 --method quadratic \
      --output-root $R/$CFG/samples > $R/${CFG}_sample.log 2>&1
  fi
done
if [ $E_MID -ge 1 ]; then
  for CFG in $ARMS; do
    [ $(left) -gt $(( BENCH_RESERVE + 600 )) ] && score $CFG $E_MID 1111
  done
fi
date +%s > $R/t_end
echo FAMILY_R5_DONE depth=$DEPTH
