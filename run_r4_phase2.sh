#!/bin/bash
# Round-4 phase-2 orchestrator (single TPU chip, so strictly serialized):
#   0. wait for the family10k first pass (complete three-arm FID table)
#   1. stage-1 GAN-on 256^2 convergence              (VERDICT r3 #5)
#   2. full 102-cycle progressive QAT schedule        (VERDICT r3 #3)
#   3. family-comparison extension loop toward 200ep  (VERDICT r3 #1)
# Every stage is idempotent and commits artifacts continuously via
# run_harvest_r4.sh; relaunching this script after a reboot resumes from
# whatever finished. Run detached:
#   nohup bash run_r4_phase2.sh > runs_evidence_r4/phase2.log 2>&1 &
set -x
cd /root/repo
mkdir -p runs_evidence_r4
R1=runs_evidence256_10k_r4

# 0. wait for the first family pass (marker written by run_family10k_r4.sh)
while [ ! -f $R1/t_end ]; do
  # if the pipeline shell died without finishing (reboot), relaunch it
  if [ -f /tmp/family10k.pid ] && ! kill -0 $(cat /tmp/family10k.pid) 2>/dev/null; then
    SF10K_DEADLINE=$(( $(date +%s) + 7200 )) nohup bash run_family10k_r4.sh \
      > runs_evidence256_10k_r4.launch.log 2>&1 &
    echo $! > /tmp/family10k.pid
  fi
  sleep 120
done

bash run_stage1_gan_r4.sh
bash run_qat_full_r4.sh
EXT_END=${PHASE2_EXT_END:-$(( $(date +%s) + 86400 ))} bash run_family10k_ext_r4.sh
echo R4_PHASE2_DONE
