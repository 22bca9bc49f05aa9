#!/bin/bash
# TPU-aligned DiT-9La (hidden 256 = 2x128) vs the reference DiT-9L geometry
# (hidden 288 = 2.25x128, 66% MXU padding ceiling — PERF.md round 3).
# Measures the whole-model step-time win with the slope protocol, then
# trains DiT-9La under the IDENTICAL budget/eval protocol as the committed
# family comparison (run_synthface256_dit.sh: same v3 VQVAE + latents,
# 70 epochs, grid + 64-image framework-FID set + hair prompt A/B) so the
# quality cost of the alignment redesign is scored, not assumed.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
V3=runs_evidence256_v3
R=runs_evidence256_dit9a
CFG=synthface256_dit9a
OUT=$R/$CFG
mkdir -p $R
DEADLINE=${SF256_DEADLINE:-$(( $(date +%s) + 7200 ))}
left() { echo $(( DEADLINE - $(date +%s) )); }
VQ=$(ls -d $V3/vqvae/*/synthface256/checkpoints/vqvae_autoencoder_ckpt | head -1)
date +%s > $R/t_start

timeout 1800 python tools_dit_aligned_probe.py $R/aligned_probe.json \
  > $R/aligned_probe.log 2>&1

timeout $(( $(left) - 2700 > 900 ? $(left) - 2700 : 900 )) \
  python -m stablediffusion_pytorch_tpu.tools.train_ddpm_cond \
  --config $CFG --latent-root $V3/latents --vqvae-ckpt "$VQ" \
  --epochs 70 --steps-per-call 4 \
  --output-root $OUT/ldm > $R/${CFG}_train.log 2>&1
RC=$?; [ $RC -ne 0 ] && [ $RC -ne 124 ] && exit 1
date +%s > $R/t_${CFG}_train_end
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
echo SYNTHFACE256_DIT9A_DONE
