#!/bin/bash
# Round-4 evidence harvester (VERDICT r3 weak-#5: "evidence pipelines still
# don't commit per-epoch artifacts as they land — they must").
#
# Every CYCLE seconds: (a) commit all new logs / loss CSVs / plots / sample
# grids / FID points under the round-4 run dirs (pathspec-scoped commit so a
# concurrent interactive commit never gets swept in), and (b) prune per-epoch
# checkpoint dirs down to the newest KEEP so 200-epoch arms cannot fill the
# disk (checkpoints stay gitignored; the resumable 'latest' pair plus the
# newest epochs always survive on disk).
set -u
cd /root/repo
CYCLE=${HARVEST_CYCLE:-480}
KEEP=${HARVEST_KEEP:-2}
DIRS="runs_evidence256_10k_r4 runs_evidence_r4"
while true; do
  for R in $DIRS; do
    [ -d "$R" ] || continue
    # prune old epoch_NNN checkpoint dirs, newest KEEP survive
    for CKD in $(find "$R" -type d -name checkpoints 2>/dev/null); do
      ls -d "$CKD"/epoch_* 2>/dev/null | sort | head -n -$KEEP | xargs -r rm -rf
      ls -d "$CKD"/ema_epoch_* 2>/dev/null | sort | head -n -$KEEP | xargs -r rm -rf
    done
    git add -A "$R" 2>/dev/null
    if ! git diff --cached --quiet -- "$R" 2>/dev/null; then
      git commit -q -m "family10k r4: harvest progress artifacts ($R)" -- "$R" || true
    fi
  done
  [ -f /tmp/harvest_stop ] && exit 0
  sleep "$CYCLE"
done
