#!/bin/bash
# Round-3 task-3 perf session (VERDICT r2: close the 2.9ms->1.7ms DiT gap
# or prove the real floor). Run on a QUIET chip — shared-chip interference
# swings single runs ~2x (PERF.md measurement rules).
#
#   1. bench.py baseline (default XLA attention path)
#   2. bench.py with SDTPU_FM_XLA=1 (feature-major q/k/v production +
#      plain-XLA attention core — the round-3 hybrid whose round-2
#      measurement session was lost to the VM reboot)
#   3. tools_perf_probe_r3.py — GEMM MXU-padding-ceiling probe at the
#      flagship shapes (H=288 pads to 3x128 tiles; prediction ~56-75%)
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=${PERF_R:-runs_perf_r3}
mkdir -p $R

python bench.py > $R/bench_baseline.json 2> $R/bench_baseline.log
sleep 10
SDTPU_FM_XLA=1 python bench.py > $R/bench_fm_xla.json 2> $R/bench_fm_xla.log
sleep 10
timeout 900 python tools_perf_probe_r3.py > $R/gemm_probe.jsonl 2> $R/gemm_probe.log

echo PERF_SESSION_DONE
cat $R/bench_baseline.json $R/bench_fm_xla.json $R/gemm_probe.jsonl
