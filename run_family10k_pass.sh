#!/bin/bash
# Round-4: the reboot-proof 10k-face THREE-family comparison (VERDICT r3 #1).
# UNet vs DiT-9L vs DiT-12L (reference geometries,
# /root/reference/plot_fid_comparison.py:5-9) trained on one shared 10k-image
# latent set, scored with >=256-image FID sets (VERDICT r3 #6).
#
# Reboot-proofing, per the verdict: every stage is idempotent/resumable
# (data regenerates bit-identically from seeds; VQVAE/latents are skipped if
# present; each arm resumes from its newest per-epoch checkpoint), and a
# companion harvester (run_harvest_r4.sh) commits logs/CSVs/grids/FID points
# to git every few minutes so no evidence lives only in gitignored state.
#
# Budget: one v5e chip; arms get wall-clock budgets (weighted by model cost)
# toward --epochs 200 with per-epoch checkpoints, so a later round can extend
# the same run toward the full reference budget instead of restarting.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence256_10k_r4
mkdir -p $R
DEADLINE=${SF10K_DEADLINE:-$(( $(date +%s) + 20400 ))}   # default now+5h40m
left() { echo $(( DEADLINE - $(date +%s) )); }
[ -f $R/t_start ] || date +%s > $R/t_start

# 1. procedural datasets (CPU, deterministic: 3k seed 1111 = FID real dir
#    matching every committed round-3 number; 10k seed 2222 training set)
[ -d data/synthface256/CelebA-HQ-img ] || \
  python -m stablediffusion_pytorch_tpu.tools.make_synth_data faces \
    --root data/synthface256 --count 3000 --im-size 256 > $R/dataset3k.log 2>&1 || exit 1
[ -d data/synthface256_10k/CelebA-HQ-img ] || \
  python -m stablediffusion_pytorch_tpu.tools.make_synth_data faces \
    --root data/synthface256_10k --count 10000 --im-size 256 --seed 2222 \
    > $R/dataset10k.log 2>&1 || exit 1
date +%s > $R/t_data_end

# 2. VQVAE stage-1 (same 12-epoch 3k recipe as round 3's v3 stage) — skipped
#    if a checkpoint is already present (committed by the harvester).
VQ=$(ls -d $R/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt 2>/dev/null | head -1)
if [ -z "$VQ" ]; then
  python -m stablediffusion_pytorch_tpu.tools.train_vqvae \
    --config synthface256_text_image_cond --output-root $R/vqvae > $R/vqvae.log 2>&1 || exit 1
  VQ=$(ls -d $R/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)
  # commit the stage-1 checkpoint itself (small; the single long-pole
  # dependency of the whole pipeline) so a reboot cannot force a retrain
  git add -f "$VQ" && git commit -q -m "family10k r4: stage-1 VQVAE checkpoint" -- "$VQ" || true
fi
date +%s > $R/t_vqvae_end
python -m stablediffusion_pytorch_tpu.tools.infer_vqvae \
  --config synthface256_text_image_cond --ckpt "$VQ" \
  --output-root $R/recon > $R/recon.log 2>&1

# 3. shared 10k latents (skipped if already on disk)
if [ ! -f $R/latents/.done ]; then
  timeout 4500 python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents \
    --config synthface256_dit9a_10k --ckpt "$VQ" --batch-size 16 \
    --output-root $R/latents > $R/latents.log 2>&1 || exit 1
  touch $R/latents/.done
fi
# the shared latent set was generated under one task_name; each arm's
# trainer resolves <latent-root>/<its task_name>/vqvae_latents, so expose
# the one set under every arm's name (symlinks recreate after any reboot)
LSRC=$(ls -d $R/latents/*/vqvae_latents | head -1)
for TN in synthface256_dit9_10k synthface256_dit12_10k synthface256_10k; do
  mkdir -p $R/latents/$TN
  [ -e $R/latents/$TN/vqvae_latents ] || \
    ln -s "$(realpath "$LSRC")" $R/latents/$TN/vqvae_latents
done
date +%s > $R/t_latents_end

TAIL=1200   # per arm: 16-sample grid + 256-img FID set (50 DDIM steps) + FID
FID_N=256

run_arm() {  # $1=config $2=train_budget
  local CFG=$1 BUDGET=$2
  local OUT=$R/$CFG
  if [ ! -f $R/t_${CFG}_end ]; then
    local RESUME=""
    local CKPT_DIR=$(ls -d $OUT/ldm/*/*/checkpoints 2>/dev/null | head -1)
    if [ -n "$CKPT_DIR" ] && [ -d "$CKPT_DIR/ddpm_ckpt_text_image_cond_latest" ]; then
      RESUME="--resume $CKPT_DIR/ddpm_ckpt_text_image_cond_latest"
    fi
    if [ $BUDGET -gt 120 ]; then
      timeout $BUDGET python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
        --config $CFG --latent-root $R/latents --vqvae-ckpt "$VQ" \
        --epochs 200 --steps-per-call 8 $RESUME \
        --output-root $OUT/ldm >> $R/${CFG}_train.log 2>&1
      local RC=$?; [ $RC -ne 0 ] && [ $RC -ne 124 ] && return 1
    fi
    date +%s > $R/t_${CFG}_train_end
    CKPT_DIR=$(ls -d $OUT/ldm/*/*/checkpoints 2>/dev/null | head -1)
    local EMA=$CKPT_DIR/ema_ddpm_ckpt_text_image_cond_latest
    [ -d "$EMA" ] || EMA=$CKPT_DIR/ddpm_ckpt_text_image_cond_latest
    python -m stablediffusion_pytorch_tpu.tools.sample_ddpm \
      --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
      --num-samples 16 --mask-from-dataset \
      --prompt "This person has long brown hair and blue eyes." \
      --cf-guidance-scale 2.0 --sampler ddim --steps 100 --method quadratic \
      --output-root $OUT/samples > $R/${CFG}_sample.log 2>&1
    python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
      --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit $FID_N --batch-size 8 \
      --steps 50 --cf-guidance-scale 2.0 --out-dir $OUT/fid_set > $R/${CFG}_fidgen.log 2>&1
    python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
      --real-dir data/synthface256/CelebA-HQ-img --fake-dir $OUT/fid_set \
      --image-size 256 --limit 1000 > $R/${CFG}_fid.log 2>&1
    date +%s > $R/t_${CFG}_end
  fi
}

# Arms ordered cheap->expensive so at least one completes even under a
# squeezed deadline; budgets recomputed before each arm from time left.
# Weights approximate relative step cost (UNet 256/384/512/768 is ~2x a
# h=288 DiT), aiming for comparable epoch counts across arms.
W_dit9=22; W_dit12=28; W_unet=50
ARMS="synthface256_dit9_10k synthface256_dit12_10k synthface256_10k_text_image_cond"
WSUM=100
NTAILS=3
for CFG in $ARMS; do
  case $CFG in
    synthface256_dit9_10k) W=$W_dit9;;
    synthface256_dit12_10k) W=$W_dit12;;
    *) W=$W_unet;;
  esac
  AVAIL=$(( $(left) - NTAILS*TAIL ))
  [ $AVAIL -lt 300 ] && AVAIL=300
  BUDGET=$(( AVAIL * W / WSUM ))
  run_arm $CFG $BUDGET || exit 1
  WSUM=$(( WSUM - W ))
  NTAILS=$(( NTAILS - 1 ))
done
date +%s > $R/t_end
echo FAMILY10K_R4_DONE
