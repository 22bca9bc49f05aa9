#!/bin/bash
# 256^2 v3 extension: resume the 30-epoch LDM (loss 0.0155) for 40 more
# epochs to test whether text steering emerges at 256^2 with a
# 64^2-flagship-scale budget (that model steered 2.74x at 60 epochs;
# v3's hair separation grew 0.47@12ep -> 0.58@30ep). Then re-run the
# samples / final FID / both A/Bs from the new EMA checkpoint.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence256_v3
CFG=synthface256_text_image_cond
DEADLINE=${SF256_DEADLINE:-$(( $(date +%s) + 9000 ))}
left() { echo $(( DEADLINE - $(date +%s) ))
}
VQ=$(ls -d $R/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)
OLD=$(ls -d $R/ldm/*/synthface256/checkpoints | head -1)
RESUME=$OLD/ddpm_ckpt_text_image_cond_latest

LDM_BUDGET=$(( $(left) - 2100 ))
timeout $LDM_BUDGET python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
  --config $CFG --latent-root $R/latents --vqvae-ckpt "$VQ" \
  --resume "$RESUME" --epochs 40 --steps-per-call 4 \
  --output-root $R/ldm_ext > $R/ldm_ext.log 2>&1
RC=$?; [ $RC -ne 0 ] && [ $RC -ne 124 ] && exit 1
date +%s > $R/t_ldmext_end
CKPT_DIR=$(ls -d $R/ldm_ext/*/synthface256/checkpoints | head -1)
EMA=$CKPT_DIR/ema_ddpm_ckpt_text_image_cond_latest
[ -d "$EMA" ] || EMA=$CKPT_DIR/ddpm_ckpt_text_image_cond_latest

if [ $(left) -gt 1500 ]; then
python -m stablediffusion_pytorch_tpu.tools.sample_ddpm \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --num-samples 16 --mask-from-dataset \
  --prompt "This person has long brown hair and blue eyes." \
  --cf-guidance-scale 2.0 --sampler ddim --steps 100 --method quadratic \
  --output-root $R/samples_ext > $R/sample_ext.log 2>&1
fi

if [ $(left) -gt 1000 ]; then
python -m stablediffusion_pytorch_tpu.tools.batch_condition_image_generator \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" --limit 64 --batch-size 8 \
  --steps 50 --cf-guidance-scale 2.0 --out-dir $R/fid_set_ext > $R/fidgen_ext.log 2>&1
python -m stablediffusion_pytorch_tpu.tools.fid_evaluation \
  --real-dir data/synthface256/CelebA-HQ-img --fake-dir $R/fid_set_ext \
  --image-size 256 --limit 1000 > $R/fid_ext.log 2>&1
fi

if [ $(left) -gt 500 ]; then
python -m stablediffusion_pytorch_tpu.tools.prompt_ab \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --prompts "This person has long black hair and brown eyes.|This person has long blond hair and blue eyes." \
  --region hair --num-per-prompt 8 --steps 50 --cf-guidance-scale 4.0 \
  --output-root $R/prompt_ab_ext > $R/prompt_ab_ext.log 2>&1
fi
if [ $(left) -gt 300 ]; then
python -m stablediffusion_pytorch_tpu.tools.prompt_ab \
  --config $CFG --ckpt "$EMA" --vqvae-ckpt "$VQ" \
  --prompts "This person wears red clothes.|This person wears blue clothes." \
  --region cloth --num-per-prompt 8 --steps 50 --cf-guidance-scale 4.0 \
  --output-root $R/prompt_ab_cloth_ext > $R/prompt_ab_cloth_ext.log 2>&1
fi
date +%s > $R/t_ext_end
echo SYNTHFACE256_V3EXT_DONE
