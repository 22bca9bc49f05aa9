"""Eval the AnDi-stage (w4 in8 noise0.1) trained state of the long
with-enhance arm under the exact evaluate_model protocol — this is the
configuration the REFERENCE samples its headline with-CIM-noise FID sets
from (batch_condition_image_generator.py:88-94 converts to layers_qn_lsq
w4/in8/noise, NOT the in5 ADDA array sim)."""
import argparse, glob, os, sys
import jax, jax.numpy as jnp
from flax import nnx
from stablediffusion_pytorch_tpu.cim import registry as reg_dict
from stablediffusion_pytorch_tpu.cim.progressive import ProgressiveTrain
from stablediffusion_pytorch_tpu.models import Unet
from stablediffusion_pytorch_tpu.tools.common import load_config
from stablediffusion_pytorch_tpu.tools.train_qat import evaluate_model
from stablediffusion_pytorch_tpu.training.checkpoint import load_model

cfg = load_config("mnist_class_cond")
model = Unet(cfg.autoencoder_params["z_channels"],
             dict(cfg.get("ldm_params") or cfg.diffusion_model_config),
             rngs=nnx.Rngs(0))
pt = ProgressiveTrain(model)
pt.convert_to_layers(list(reg_dict.nn_layers), "layers_qn_lsq",
    noise_scale=0.1, input_bit=8, output_bit=8, weight_bit=4)
pt.add_enhance_branch_LoR(ops_factor=0.05)
pt.add_enhance_layers(ops_factor=0.05)
ck = "runs_evidence_qat_r3/long_with/ddpm_20260818-062448/mnist/LSQ_AnDi/w4b_0.100/ddpm_ckpt"
load_model(ck, model)
print("loaded", ck, flush=True)

args = argparse.Namespace(
    eval_samples=100, eval_steps=100, eval_guidance=2.0,
    eval_vqvae_ckpt=glob.glob(
        "runs_evidence_qat_r3/vqvae/*/mnist/checkpoints/vqvae_autoencoder_ckpt")[0],
    eval_fid_images="data/mnist/train/images")
out = "runs_evidence_qat_r3/long_with/ddpm_20260818-062448/mnist"
row = evaluate_model(model, cfg, args, out, "quantized_andi_w4in8n0.1")
print(row, flush=True)
