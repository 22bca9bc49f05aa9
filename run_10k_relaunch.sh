#!/bin/bash
# Round-3 continuation, relaunched after a VM reboot wiped the gitignored
# data/checkpoints: regenerates the full chain (procedural data -> VQVAE ->
# 10k latents) and runs BOTH arms of the 10k-scale family comparison on the
# shared latents (DiT-9La, then the flagship UNet), each bounded by a
# timeout with per-epoch checkpoints so the eval tail always runs.
#
# Data determinism: data/synthface256 regenerates bit-identically (seed
# 1111 default), so the FID real-dir matches every committed round-3
# number. The 10k set uses seed 2222 (same distribution, new draws).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence256_10k
mkdir -p $R
DEADLINE=${SF10K_DEADLINE:-$(( $(date +%s) + 37200 ))}   # default now+10h20m
left() { echo $(( DEADLINE - $(date +%s) )); }
date +%s > $R/t_start

# 1. procedural datasets (CPU)
[ -d data/synthface256/CelebA-HQ-img ] || \
  python -m stablediffusion_pytorch_tpu.tools.make_synth_data faces \
    --root data/synthface256 --count 3000 --im-size 256 > $R/dataset3k.log 2>&1 || exit 1
[ -d data/synthface256_10k/CelebA-HQ-img ] || \
  python -m stablediffusion_pytorch_tpu.tools.make_synth_data faces \
    --root data/synthface256_10k --count 10000 --im-size 256 --seed 2222 \
    > $R/dataset10k.log 2>&1 || exit 1
date +%s > $R/t_data_end

# 2. VQVAE (same 12-epoch 3k recipe as the committed v3 stage; recon 0.004)
python -m stablediffusion_pytorch_tpu.tools.train_vqvae \
  --config synthface256_text_image_cond --output-root $R/vqvae > $R/vqvae.log 2>&1 || exit 1
date +%s > $R/t_vqvae_end
VQ=$(ls -d $R/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)
python -m stablediffusion_pytorch_tpu.tools.infer_vqvae \
  --config synthface256_text_image_cond --ckpt "$VQ" \
  --output-root $R/recon > $R/recon.log 2>&1

# 3. shared 10k latents
timeout 4500 python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents \
  --config synthface256_dit9a_10k --ckpt "$VQ" --batch-size 16 \
  --output-root $R/latents > $R/latents.log 2>&1 || exit 1
date +%s > $R/t_latents_end

TAIL=2400   # sample grid + 64-img FID set + FID + prompt A/B per arm
AVAIL=$(( $(left) - 2*TAIL ))
[ $AVAIL -lt 1200 ] && AVAIL=1200
DIT_BUDGET=$(( AVAIL * 55 / 100 ))
UNET_BUDGET=$(( AVAIL * 45 / 100 ))

run_arm() {  # $1=config $2=train_budget $3=epochs
  local CFG=$1 BUDGET=$2 EPOCHS=$3
  local OUT=$R/$CFG
  timeout $BUDGET python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
    --config $CFG --latent-root $R/latents --vqvae-ckpt "$VQ" \
    --epochs $EPOCHS --steps-per-call 4 \
    --output-root $OUT/ldm > $R/${CFG}_train.log 2>&1
  local RC=$?; [ $RC -ne 0 ] && [ $RC -ne 124 ] && return 1
  date +%s > $R/t_${CFG}_train_end
  local CKPT_DIR=$(ls -d $OUT/ldm/*/*/checkpoints | head -1)
  local EMA=$CKPT_DIR/ema_ddpm_ckpt_text_image_cond_latest
  [ -d "$EMA" ] || EMA=$CKPT_DIR/ddpm_ckpt_text_image_cond_latest
  python -m stablediffusion_pytorch_tpu.tools.sample_ddpm \
    --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
    --num-samples 16 --mask-from-dataset \
    --prompt "This person has long brown hair and blue eyes." \
    --cf-guidance-scale 2.0 --sampler ddim --steps 100 --method quadratic \
    --output-root $OUT/samples > $R/${CFG}_sample.log 2>&1
  python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
    --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit 64 --batch-size 8 \
    --steps 50 --cf-guidance-scale 2.0 --out-dir $OUT/fid_set > $R/${CFG}_fidgen.log 2>&1
  python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
    --real-dir data/synthface256/CelebA-HQ-img --fake-dir $OUT/fid_set \
    --image-size 256 --limit 1000 > $R/${CFG}_fid.log 2>&1
  python -m stablediffusion_pytorch_tpu.tools.prompt_ab \
    --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
    --prompts "This person has long black hair and brown eyes.|This person has long blond hair and blue eyes." \
    --region hair --num-per-prompt 8 --steps 50 --cf-guidance-scale 4.0 \
    --output-root $OUT/prompt_ab > $R/${CFG}_ab.log 2>&1
  date +%s > $R/t_${CFG}_end
}

run_arm synthface256_dit9a_10k $DIT_BUDGET 200 || exit 1
run_arm synthface256_10k_text_image_cond $UNET_BUDGET 70 || exit 1
date +%s > $R/t_end
echo SYNTHFACE256_10K_DONE
