#!/bin/bash
# UNet arm of the 10k-scale comparison: the flagship [256,384,512,768]
# text+mask UNet on the SAME 10k latents as the DiT-9La 10k run, so the
# round-3 family-comparison question ("does the UNet's 3k/70ep win persist
# when the DiT gets data?") is answered with both arms at the new scale.
# 70 epochs = the committed family-comparison budget; identical eval tail.
# Waits for the DiT-10k pipeline to release the chip.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V3=runs_evidence256_v3
DIT10K=runs_evidence256_dit9a_10k
R=runs_evidence256_unet_10k
CFG=synthface256_10k_text_image_cond
OUT=$R/$CFG
mkdir -p $R
left() { echo $(( DEADLINE - $(date +%s) )); }
VQ=$(ls -d $V3/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)

# serialize on the single chip: wait (up to 8h) for the DiT-10k pipeline
for i in $(seq 1 2880); do
  [ -f $DIT10K/t_end ] && break
  sleep 10
done
DEADLINE=${UNET10K_DEADLINE:-$(( $(date +%s) + 14400 ))}   # 4h from chip-free
date +%s > $R/t_start

LDM_BUDGET=$(( $(left) - 2700 ))
[ $LDM_BUDGET -lt 600 ] && LDM_BUDGET=600
timeout $LDM_BUDGET python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
  --config $CFG --latent-root $DIT10K/latents --vqvae-ckpt "$VQ" \
  --epochs 70 --steps-per-call 4 \
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
echo SYNTHFACE256_UNET_10K_DONE
