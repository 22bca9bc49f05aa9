#!/bin/bash
# in5 extension (round 3): the long-budget QAT run proved the full analog
# CIM array trains to 1.4x FP at input_bit=8, but the final input_bit=5
# tightening got only 3 epochs (2250 steps) and plateaued at loss 0.19 —
# the reference gives this exact stage 250 epochs/cycle
# (Model_DiT_9L_train.py:593). This run resumes that final ADDA state
# (--adda-resume rebuilds the quantized tree and restores step sizes /
# ADC gains / enhance blends) and gives the in5 stage ~7x more budget,
# checkpointing per epoch, then samples + scores the in5 array model.
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
R=runs_evidence_qat_r3
VQ=$(ls -d $R/vqvae/*/mnist/checkpoints/vqvae_autoencoder_ckpt | head -1)
LAT=$R/latents/mnist/vqvae_latents
CK=$R/long_with/ddpm_20260818-062448/mnist/LSQ_ADDA/w4b_0.080/ddpm_ckpt
date +%s > $R/t_in5_ext_start

timeout ${IN5_TIMEOUT:-9000} \
python -m stablediffusion_pytorch_tpu.tools.train_qat \
  --config mnist_class_cond --latent-dir "$LAT" \
  --stages LSQ_ADDA --cycles 2 --adda-resume "$CK" \
  --epochs-per-cycle ${IN5_EPOCHS:-20} --max-batches 750 \
  --batch-size 16 --save-every-epoch \
  --eval-vqvae-ckpt "$VQ" --eval-fid-images data/mnist/train/images \
  --eval-samples 100 --eval-steps 100 --eval-guidance 2.0 \
  --output-root $R/in5_ext > $R/qat_in5_ext.log 2>&1
RC=$?
date +%s > $R/t_in5_ext_end
echo QAT_IN5_EXT_DONE rc=$RC
