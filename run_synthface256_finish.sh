#!/bin/bash
# Finish the 256^2 flagship evidence after stopping the LDM trainer early
# (per-epoch checkpoints exist; 60 configured epochs do not fit the round):
# sample grid, FID trajectory over epoch checkpoints, final 96-image FID
# set, and the 256^2 prompt-steering A/B. All stages on-chip.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence256
CFG=synthface256_text_image_cond
VQ=$(ls -d $R/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)
CKPT_DIR=$(ls -d $R/ldm/*/synthface256/checkpoints | head -1)
# NON-EMA checkpoints: at this run's 3.3k-step horizon the flat-decay EMA
# shadow was still ~98% at its random init (measured; see RESULTS.md round 3
# and the EMA-warmup fix in training/ema.py) and the interrupted epoch-19
# save lost the non-EMA 'latest', so epoch_018 is the terminal checkpoint.
EMA=$CKPT_DIR/epoch_018_ddpm_ckpt_text_image_cond

# 1. sample grid from the EMA checkpoint (mask-conditioned, CFG)
python -m stablediffusion_pytorch_tpu.tools.sample_ddpm \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --num-samples 16 --mask-from-dataset \
  --prompt "This person has long brown hair and blue eyes." \
  --cf-guidance-scale 2.0 --sampler ddim --steps 100 --method quadratic \
  --output-root $R/samples > $R/sample.log 2>&1
date +%s > $R/t_sample_end

# 2. FID trajectory: 32-image sets from epoch checkpoints
for EP in 000 004 008 012 018; do
  C=$CKPT_DIR/epoch_${EP}_ddpm_ckpt_text_image_cond
  [ -d "$C" ] || continue
  python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
    --config $CFG --ckpt "$C" --vqvae-ckpt "$VQ" --limit 32 --batch-size 8 \
    --steps 50 --cf-guidance-scale 2.0 --out-dir $R/fid_traj/ep_$EP \
    >> $R/fidtraj.log 2>&1
  python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
    --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/fid_traj/ep_$EP \
    --image-size 256 --limit 1000 >> $R/fidtraj.log 2>&1
done
date +%s > $R/t_fidtraj_end

# 3. final 96-image FID set from the EMA checkpoint
python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit 96 --batch-size 8 \
  --steps 50 --cf-guidance-scale 2.0 --out-dir $R/fid_set > $R/fidgen.log 2>&1
python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
  --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/fid_set \
  --image-size 256 --limit 1000 > $R/fid.log 2>&1
date +%s > $R/t_fid_end

# 4. prompt-steering A/B at the production scale
python -m stablediffusion_pytorch_tpu.tools.prompt_ab \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --prompts "This person has long black hair and brown eyes.|This person has long blond hair and blue eyes." \
  --region hair --num-per-prompt 8 --steps 100 --cf-guidance-scale 4.0 \
  --output-root $R/prompt_ab > $R/prompt_ab.log 2>&1
date +%s > $R/t_ab_end

echo SYNTHFACE256_FINISH_DONE
