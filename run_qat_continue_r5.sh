#!/bin/bash
# Round-5 QAT continuation watcher. The full-schedule run (run_qat_full_r5.sh)
# has a hard chip-budget timeout; if it dies mid-stage this script resumes
# from the newest per-cycle stage checkpoint (--andi-resume/--adda-resume,
# tools/train_qat.py mid-stage resume contract) instead of forfeiting
# completed cycles — the exact failure mode of rounds 3/4. When the schedule
# (or its continuation) is done, it releases the family-deepen gate
# (/tmp/qat_gate.pid sentinel).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence_r5/qat_full
VQ=runs_evidence_r4/qat_full/vqvae/ddpm_20260819-181844/mnist/checkpoints/vqvae_autoencoder_ckpt
FP=runs_evidence_r4/qat_full/ldm/ddpm_20260819-182931/mnist/checkpoints/ema_ddpm_ckpt_class_cond_latest
LAT=$R/latents/mnist/vqvae_latents
export R5_END=${R5_END:-1787236000}
left() { echo $(( R5_END - $(date +%s) )); }

# wait for the primary run to exit
while ps -p "$(cat /tmp/qat_real.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do
  sleep 30
done

RUN=$(ls -dt $R/full/ddpm_2026*/mnist 2>/dev/null | head -1)
EVAL_DONE=$(ls "$RUN"/qat_eval.json 2>/dev/null)

if [ -z "$EVAL_DONE" ] && [ $(left) -gt 3300 ]; then
  # where did it stop?
  LAST=$(grep -a "INFO:sdtpu:stage .* cycle" $R/qat_full.log | tail -1)
  ADDA_CK=$(ls -dt "$RUN"/LSQ_ADDA/w*/ddpm_ckpt 2>/dev/null | head -1)
  ANDI_CK=$(ls -dt "$RUN"/LSQ_AnDi/w*/ddpm_ckpt 2>/dev/null | head -1)
  BUD=$(( $(left) - 2700 )); [ $BUD -gt 4500 ] && BUD=4500
  if [ -n "$ADDA_CK" ]; then
    timeout $BUD python -m stablediffusion_pytorch_tpu.tools.train_qat \
      --config mnist_class_cond --latent-dir "$LAT" \
      --stages LSQ_ADDA --adda-resume "$ADDA_CK" --cycles 2 \
      --epochs-per-cycle 1 --max-batches ${QAT_MAX_BATCHES:-16} --batch-size 16 \
      --eval-vqvae-ckpt "$VQ" --eval-fid-images data/mnist/train/images \
      --eval-samples 256 --eval-steps 100 --eval-guidance 2.0 \
      --output-root $R/full_cont > $R/qat_cont.log 2>&1
  elif [ -n "$ANDI_CK" ]; then
    # last completed AnDi cycle from the log -> resume at the next one
    K=$(grep -a "INFO:sdtpu:stage LSQ_AnDi cycle" $R/qat_full.log | tail -1 \
        | sed 's/.*cycle \([0-9]*\):.*/\1/')
    K=${K:-0}
    timeout $BUD python -m stablediffusion_pytorch_tpu.tools.train_qat \
      --config mnist_class_cond --latent-dir "$LAT" \
      --stages LSQ_AnDi,LSQ_ADDA --andi-resume "$ANDI_CK" \
      --andi-start-cycle $(( K + 1 )) \
      --epochs-per-cycle 1 --max-batches ${QAT_MAX_BATCHES:-16} --batch-size 16 \
      --eval-vqvae-ckpt "$VQ" --eval-fid-images data/mnist/train/images \
      --eval-samples 256 --eval-steps 100 --eval-guidance 2.0 \
      --output-root $R/full_cont > $R/qat_cont.log 2>&1
  else
    echo "NO_STAGE_CKPT_TO_RESUME (stopped at: $LAST)"
  fi
fi
date +%s > $R/t_done
# release the family-deepen gate
kill "$(cat /tmp/qat_gate.pid 2>/dev/null)" 2>/dev/null
echo QAT_CONTINUE_DONE
