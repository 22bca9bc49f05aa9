#!/bin/bash
# Round-4 family-comparison EXTENSION loop: after the first budgeted pass
# of run_family10k_r4.sh lands a complete three-arm FID table, keep pushing
# every arm toward the reference's 200-epoch budget for as long as the
# round lives. Each pass clears the per-arm done markers (data / VQVAE /
# latents markers stay), re-enters the same idempotent pipeline — arms
# resume from their newest 'latest' checkpoints — and re-runs the
# sample-grid + 256-image FID tails, so after EVERY pass the committed
# table is complete and strictly deeper than the pass before. A VM reboot
# costs at most one in-flight pass.
set -x
cd /root/repo
R=runs_evidence256_10k_r4
PASS_S=${EXT_PASS_S:-5400}            # wall budget per extension pass
END=${EXT_END:-$(( $(date +%s) + 86400 ))}
PASS=1
while [ $(date +%s) -lt $(( END - 1800 )) ]; do
  # the QAT finisher (run_qat_finish_r4.sh) holds the chip while it
  # completes a timeout-cut qat_full run — one workload per chip
  while [ -f /tmp/qat_hold ]; do sleep 120; END=$(( END + 120 )); done
  rm -f $R/t_synthface256_dit9_10k_end $R/t_synthface256_dit12_10k_end \
        $R/t_synthface256_10k_text_image_cond_end \
        $R/t_synthface256_dit9_10k_train_end \
        $R/t_synthface256_dit12_10k_train_end \
        $R/t_synthface256_10k_text_image_cond_train_end $R/t_end
  SF10K_DEADLINE=$(( $(date +%s) + PASS_S )) bash run_family10k_pass.sh \
    > $R/ext_pass_${PASS}.log 2>&1
  echo "EXT_PASS_${PASS}_DONE rc=$?"
  PASS=$(( PASS + 1 ))
done
echo FAMILY10K_EXT_LOOP_END
