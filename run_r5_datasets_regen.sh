#!/bin/bash
# Round-5 dataset regeneration after the 03:44 VM reboot wiped the
# (gitignored) data/ tree. All three procedural sets are deterministic
# given their seeds, so this reproduces byte-identical images — the 3k
# set (default seed) is the SAME FID real set every committed round-3/4/5
# number used, and the 10k set (seed 2222) is the same training set.
# Order: mnist first (the QAT pipeline segment needs it), then 3k (FID
# real dir), then 10k (family training set); .datasets_done last so
# run_r5_family.sh waits for all of them.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence_r5
[ -d data/mnist/train/images ] || \
  python -m stablediffusion_pytorch_tpu.tools.make_synth_data mnist \
    --root data/mnist > $R/dataset_mnist.log 2>&1 || exit 1
touch $R/.mnist_done
[ -d data/synthface256/CelebA-HQ-img ] || \
  python -m stablediffusion_pytorch_tpu.tools.make_synth_data faces \
    --root data/synthface256 --count 3000 --im-size 256 \
    > $R/dataset3k.log 2>&1 || exit 1
[ -d data/synthface256_10k/CelebA-HQ-img ] || \
  python -m stablediffusion_pytorch_tpu.tools.make_synth_data faces \
    --root data/synthface256_10k --count 10000 --im-size 256 --seed 2222 \
    > $R/dataset10k.log 2>&1 || exit 1
touch $R/.datasets_done
echo DATASETS_REGEN_DONE
