#!/bin/bash
# Round-4 VERDICT #3 safety net: run_qat_full_r4.sh writes t_done even when
# its 4.5h timeout kills train_qat early, and the phase-2 chain then moves
# on to the family extension loop. This watcher holds the chip
# (/tmp/qat_hold, respected by run_family10k_ext_r4.sh), waits for t_done,
# and — if the final qat_eval.json is missing — resumes from the furthest
# checkpoint:
#   * LSQ_ADDA cycle ckpt  -> --adda-resume (one final-bits cycle + eval)
#   * LSQ_AnDi cycle ckpt  -> --andi-resume from the next cycle, then the
#     ADDA stage and the eval (the measured AnDi pace of ~4.3 min/cycle
#     overruns the 23:14 timeout by ~90 min)
# then commits the artifacts and releases the hold. Idempotent via
# .finish_done.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence_r4/qat_full
[ -f $R/.finish_done ] && { echo QAT_FINISH_ALREADY_DONE; exit 0; }
touch /tmp/qat_hold
trap 'rm -f /tmp/qat_hold' EXIT

while [ ! -f $R/t_done ]; do sleep 120; done

EVAL=$(ls $R/full/*/mnist/qat_eval.json 2>/dev/null | head -1)
if [ -n "$EVAL" ]; then
  touch $R/.finish_done
  echo QAT_FINISH_NOT_NEEDED
  exit 0
fi

VQ=$(ls -d $R/vqvae/*/mnist/checkpoints/vqvae_autoencoder_ckpt | head -1)
LAT=$R/latents/mnist/vqvae_latents
COMMON="--config mnist_class_cond --latent-dir $LAT \
  --epochs-per-cycle 1 --max-batches 150 --batch-size 16 \
  --eval-vqvae-ckpt $VQ --eval-fid-images data/mnist/train/images \
  --eval-samples 256 --eval-steps 100 --eval-guidance 2.0 \
  --output-root $R/finish"

ADDA=$(ls -dt $R/full/*/mnist/LSQ_ADDA/w*/ddpm_ckpt 2>/dev/null | head -1)
ANDI=$(ls -dt $R/full/*/mnist/LSQ_AnDi/w*/ddpm_ckpt 2>/dev/null | head -1)
if [ -n "$ADDA" ]; then
  timeout 3600 python -m stablediffusion_pytorch_tpu.tools.train_qat \
    $COMMON --stages LSQ_ADDA --adda-resume "$ADDA" --cycles 2 \
    > $R/finish.log 2>&1
  RC=$?
elif [ -n "$ANDI" ]; then
  TRAJ=$(ls $R/full/*/mnist/qat_trajectory.csv | head -1)
  # last completed AnDi cycle from the trajectory CSV -> resume at +1
  START=$(python - "$TRAJ" <<'EOF'
import csv, sys
last = -1
for row in csv.DictReader(open(sys.argv[1])):
    if row["stage"] == "LSQ_AnDi":
        last = max(last, int(row["cycle"]))
print(last + 1)
EOF
)
  timeout 16200 python -m stablediffusion_pytorch_tpu.tools.train_qat \
    $COMMON --stages LSQ_AnDi,LSQ_ADDA --andi-resume "$ANDI" \
    --andi-start-cycle "$START" > $R/finish.log 2>&1
  RC=$?
else
  echo QAT_FINISH_MANUAL: no AnDi/ADDA checkpoint found
  exit 1
fi
[ $RC -eq 0 ] && touch $R/.finish_done
git add -f $R/finish 2>/dev/null
git commit -q -m "qat_full r4: resumed schedule completion + final in5 eval" || true
echo QAT_FINISH_DONE rc=$RC
