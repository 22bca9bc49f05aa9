#!/bin/bash
# Round-5 harvester (VERDICT r4 #8: "no round-5 artifact exists only on the
# VM disk"). Every ~6 min, force-adds and commits:
#   * all small evidence artifacts under runs_evidence_r5 (logs, CSVs,
#     JSON, PNGs, markers) — including ext-pass logs the r4 harvester missed
#   * the newest QAT stage checkpoint (so a reboot can never again lose
#     completed QAT cycles — the exact failure that cost round 5 its resume)
#   * each family arm's newest 'latest' + per-epoch EMA checkpoints every
#     4th pass (size-gated)
# Exits at R5_END like every other round-5 loop.
set -x
cd /root/repo
R=runs_evidence_r5
END=${R5_END:-1787213100}
N=0
while [ $(date +%s) -lt $END ]; do
  sleep 360
  N=$(( N + 1 ))
  # small artifacts: everything that is not a checkpoint or an image set
  # (FID image sets are committed once, whole, by the builder at scoring
  # time — not re-added every pass)
  find $R -type f \( -name "*.log" -o -name "*.csv" -o -name "*.json" \
    -o -name "*.png" -o -name "t_*" -o -name "depth" -o -name ".done" \
    -o -name "*.txt" \) -size -8M -not -path "*/fid_e*" 2>/dev/null | \
  while read -r f; do
    git add -f "$f" 2>/dev/null
  done
  # newest QAT stage checkpoint (small MNIST DiT) + trajectory
  QCK=$(ls -dt $R/qat_full/full*/*/mnist/LSQ*/w*/ddpm_ckpt 2>/dev/null | head -1)
  if [ -n "$QCK" ] && [ "$(du -sm "$QCK" | cut -f1)" -lt 200 ]; then
    git add -f "$QCK" 2>/dev/null
  fi
  # family arm checkpoints every 4th pass (~25 min), size-gated
  if [ $(( N % 4 )) -eq 0 ]; then
    for CK in $(ls -dt $R/family/*/ldm/*/*/checkpoints/ema_*_latest 2>/dev/null | head -3); do
      [ "$(du -sm "$CK" | cut -f1)" -lt 300 ] && git add -f "$CK" 2>/dev/null
    done
  fi
  if ! git diff --cached --quiet 2>/dev/null; then
    git commit -q -m "r5 evidence: harvest progress artifacts (runs_evidence_r5)" || true
  fi
done
echo HARVEST_R5_END
