#!/bin/bash
# DiT-9La at ~1/10 the reference's DiT budget (10k images x 200 epochs;
# reference: 30k CelebHQ x 250, Model_DiT_9L_train.py:113-454). The round-3
# family comparison found DiTs losing to the UNet at 3k/70ep — a known
# data-hunger effect — and the 70-epoch DiT runs never steered on text.
# This run scales data 3.3x and epochs 2.9x on the TPU-first aligned
# geometry to test both: FID trend vs the UNet's 0.357, and prompt A/B
# steering. Reuses the committed v3 VQVAE (recon 0.004; the 10k set is the
# same procedural distribution, new seed) and the committed eval protocol
# (64-img framework-FID vs the SAME real dir as all prior numbers, hair
# prompt A/B at cfg 4.0).
#
# Waits for the in-flight in5 QAT extension to release the chip first.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V3=runs_evidence256_v3
R=runs_evidence256_dit9a_10k
CFG=synthface256_dit9a_10k
OUT=$R/$CFG
mkdir -p $R
left() { echo $(( DEADLINE - $(date +%s) )); }
VQ=$(ls -d $V3/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)

# serialize on the single chip: wait (up to 3h) for the QAT extension
for i in $(seq 1 1080); do
  [ -f runs_evidence_qat_r3/t_in5_ext_end ] && break
  sleep 10
done
DEADLINE=${SF10K_DEADLINE:-$(( $(date +%s) + 25200 ))}   # 7h from chip-free
date +%s > $R/t_start

timeout 3600 python -m stablediffusion_pytorch_tpu.tools.gen_vqvae_latents \
  --config $CFG --ckpt "$VQ" --batch-size 16 \
  --output-root $R/latents > $R/latents.log 2>&1 || exit 1
date +%s > $R/t_latents_end

# rc=124 (timeout) is fine — per-epoch checkpoints exist; else fatal
LDM_BUDGET=$(( $(left) - 2700 ))
[ $LDM_BUDGET -lt 600 ] && LDM_BUDGET=600
timeout $LDM_BUDGET python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
  --config $CFG --latent-root $R/latents --vqvae-ckpt "$VQ" \
  --epochs 200 --steps-per-call 4 \
  --output-root $OUT/ldm > $R/${CFG}_train.log 2>&1
RC=$?; [ $RC -ne 0 ] && [ $RC -ne 124 ] && exit 1
date +%s > $R/t_train_end
CKPT_DIR=$(ls -d $OUT/ldm/*/*/checkpoints | head -1)
EMA=$CKPT_DIR/ema_ddpm_ckpt_text_image_cond_latest
[ -d "$EMA" ] || EMA=$CKPT_DIR/ddpm_ckpt_text_image_cond_latest

if [ $(left) -gt 2400 ]; then
python -m stablediffusion_pytorch_tpu.tools.sample_ddpm \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --num-samples 16 --mask-from-dataset \
  --prompt "This person has long brown hair and blue eyes." \
  --cf-guidance-scale 2.0 --sampler ddim --steps 100 --method quadratic \
  --output-root $OUT/samples > $R/${CFG}_sample.log 2>&1
fi
if [ $(left) -gt 1500 ]; then
python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit 64 --batch-size 8 \
  --steps 50 --cf-guidance-scale 2.0 --out-dir $OUT/fid_set > $R/${CFG}_fidgen.log 2>&1
python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
  --real-dir data/synthface256/CelebA-HQ-img --fake-dir $OUT/fid_set \
  --image-size 256 --limit 1000 > $R/${CFG}_fid.log 2>&1
fi
if [ $(left) -gt 900 ]; then
python -m stablediffusion_pytorch_tpu.tools.prompt_ab \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --prompts "This person has long black hair and brown eyes.|This person has long blond hair and blue eyes." \
  --region hair --num-per-prompt 8 --steps 50 --cf-guidance-scale 4.0 \
  --output-root $OUT/prompt_ab > $R/${CFG}_ab.log 2>&1
fi
date +%s > $R/t_end
echo SYNTHFACE256_DIT9A_10K_DONE
