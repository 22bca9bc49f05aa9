#!/bin/bash
# Round-4 VERDICT #3 safety net: run_qat_full_r4.sh writes t_done even when
# its 4.5h timeout kills train_qat before the final quantized eval, and the
# phase-2 chain then moves on to the family extension loop. This watcher
# waits for t_done; if qat_eval.json is missing but the ADDA stage reached a
# checkpoint, it resumes the final ADDA state (--adda-resume trains one
# ~2.5-min cycle at the final input_bit=5 params, then evals 256 images
# under the same protocol/seed as the FP row) and commits the result. If the
# timeout hit before ADDA ever checkpointed, it logs QAT_FINISH_MANUAL for
# the session to handle. Idempotent via the .finish_done marker.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence_r4/qat_full
[ -f $R/.finish_done ] && { echo QAT_FINISH_ALREADY_DONE; exit 0; }

while [ ! -f $R/t_done ]; do sleep 120; done

EVAL=$(ls $R/full/*/mnist/qat_eval.json 2>/dev/null | head -1)
if [ -n "$EVAL" ]; then
  touch $R/.finish_done
  echo QAT_FINISH_NOT_NEEDED
  exit 0
fi

ADDA=$(ls -dt $R/full/*/mnist/LSQ_ADDA/w*/ddpm_ckpt 2>/dev/null | head -1)
if [ -z "$ADDA" ]; then
  echo QAT_FINISH_MANUAL: no ADDA checkpoint, timeout hit mid-LSQ/AnDi
  exit 1
fi

VQ=$(ls -d $R/vqvae/*/mnist/checkpoints/vqvae_autoencoder_ckpt | head -1)
LAT=$R/latents/mnist/vqvae_latents
timeout 3600 python -m stablediffusion_pytorch_tpu.tools.train_qat \
  --config mnist_class_cond --latent-dir "$LAT" \
  --stages LSQ_ADDA --adda-resume "$ADDA" --cycles 2 \
  --epochs-per-cycle 1 --max-batches 150 --batch-size 16 \
  --eval-vqvae-ckpt "$VQ" --eval-fid-images data/mnist/train/images \
  --eval-samples 256 --eval-steps 100 --eval-guidance 2.0 \
  --output-root $R/finish > $R/finish.log 2>&1
RC=$?
[ $RC -eq 0 ] && touch $R/.finish_done
git add -f $R/finish 2>/dev/null
git commit -q -m "qat_full r4: final ADDA in5 eval (post-timeout finisher)" || true
echo QAT_FINISH_DONE rc=$RC
