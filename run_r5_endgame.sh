#!/bin/bash
# Round-5 endgame (VERDICT r4 #1: protect the driver's bench). Waits for the
# family-deepen pipeline to release the chip, then:
#   1. quiesces every builder chip loop (nothing may contend with the
#      driver's end-of-round bench — the r4 null-bench failure),
#   2. runs bench.py ONCE to re-warm the persistent XLA cache at the
#      current git rev (compile cache survives; the driver's bench then
#      meets a warm cache and an idle chip),
#   3. commits the warm artifact.
# After this exits nothing started by the builder touches the chip again.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
export R5_END=${R5_END:-1787236000}
left() { echo $(( R5_END - $(date +%s) )); }

# wait for deepen (or until the reserve window forces the endgame)
while ps -p "$(cat /tmp/deepen.pid 2>/dev/null || echo 0)" >/dev/null 2>&1; do
  sleep 30
  if [ $(left) -lt 780 ]; then
    kill "$(cat /tmp/deepen.pid)" 2>/dev/null   # reserve window: reclaim chip
    sleep 10
    break
  fi
done

# hard quiesce: kill any straggler chip loops by RECORDED pid (never by name)
for f in /tmp/qat_full.pid /tmp/qat_real.pid /tmp/qat_cont.pid /tmp/unet_finish.pid; do
  p=$(cat $f 2>/dev/null) && [ -n "$p" ] && kill $p 2>/dev/null
done
sleep 5

# warm the cache + bank the final number
timeout 500 python bench.py > runs_evidence_r5/bench_r5_final.json 2> runs_evidence_r5/bench_r5_final.log
tail -1 runs_evidence_r5/bench_r5_final.json

git add -f runs_evidence_r5/bench_r5_final.json runs_evidence_r5/bench_r5_final.log 2>/dev/null
git commit -q -m "r5 endgame: final bench prewarm on idle chip (cache warm for driver bench)" || true
echo R5_ENDGAME_DONE
