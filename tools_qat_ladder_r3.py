"""Round-3 QAT diagnostic: WHERE does the ADDA-stage loss come from?

The r3 evidence run (runs_evidence_qat_r3) measured LSQ 0.053 / AnDi 0.11
/ ADDA 0.43 against FP 0.041 — an order of magnitude at ADDA — and the
quantized samples break. Before spending chip-hours on longer schedules,
this ladder isolates the knobs: it rebuilds the trained FP MNIST LDM,
converts it to the full CIM array layer (`layers_qn_lsq_adda_cim`,
reference: cim_qn_train/layers_utils_adda.py semantics) at a sequence of
configs from "ideal limit" to "production TC05", calibrates, and measures
the PAIRED noise-prediction loss (identical latents/t/noise per rung) —
all UNTRAINED post-conversion, so each rung shows the pure conversion
cost that QAT training then has to win back.

Rungs:
  fp          no conversion (baseline)
  ideal       w8  in8 out8 dac8 adc12, noise 0   -> expect ~fp
  w4          w4  in8 out8 dac8 adc12, noise 0   -> LSQ 4-bit weight cost
  dac5        w4  in8 out8 dac5 adc12, noise 0   -> + 5-bit DAC input cost
  adc8        w4  in8 out8 dac5 adc8,  noise 0, TC05 gain clamp + adc_k
  production  adc8 + weight noise 0.08            (the eval config)

CPU-runnable (JAX_PLATFORMS=cpu) — conversion math is platform-agnostic;
the chip stays free for training runs. Results feed RESULTS.md round 3.
"""

import json
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.cim import registry as reg_dict
from stablediffusion_pytorch_tpu.cim.layers import calibrate_quant_layers
from stablediffusion_pytorch_tpu.cim.progressive import ProgressiveTrain
from stablediffusion_pytorch_tpu.cim.weight_mapper import map_weight_for_model
from stablediffusion_pytorch_tpu.models import DIT, Unet
from stablediffusion_pytorch_tpu.schedulers import add_noise
from stablediffusion_pytorch_tpu.schedulers.linear import (
    make_compvis_linear_schedule,
)
from stablediffusion_pytorch_tpu.tools.common import load_config
from stablediffusion_pytorch_tpu.tools.train_qat import _latent_data_iter
from stablediffusion_pytorch_tpu.training.checkpoint import load_model

R = sys.argv[1] if len(sys.argv) > 1 else "runs_evidence_qat_r3"
FP_CKPT = sys.argv[2] if len(sys.argv) > 2 else None
LATENTS = sys.argv[3] if len(sys.argv) > 3 else None
N_BATCHES = 6
BATCH = 16

# Every rung anchors at the TC05 operating point (w4, dac5, adc8,
# gain 1/64, adc_k 9.071 — Model_DiT_9L_train.py:587-590) and varies ONE
# knob, with the gain re-derived by the reference's bit bookkeeping
# (layers_utils_adda.py:53-74): gain = 1/64 * 2^(adc-8) / 2^(dac-5)
# / 2^(w-4). Without that bookkeeping a "relaxed" rung clips its fatter
# DAC slices and looks WORSE than production — an earlier revision of
# this harness made exactly that mistake (kept in git history).
RUNGS = [
    ("fp", None),
    ("relaxed_w8_adc12", dict(weight_bit=8, input_bit=8, output_bit=8,
                              dac_bit=5, adc_bit=12, noise_scale=0.0)),
    ("w4_adc12", dict(weight_bit=4, input_bit=8, output_bit=8,
                      dac_bit=5, adc_bit=12, noise_scale=0.0)),
    ("w4_adc8", dict(weight_bit=4, input_bit=8, output_bit=8,
                     dac_bit=5, adc_bit=8, noise_scale=0.0)),
    ("production", dict(weight_bit=4, input_bit=8, output_bit=8,
                        dac_bit=5, adc_bit=8, noise_scale=0.08)),
]


def find_default(pattern):
    import glob

    hits = sorted(glob.glob(pattern))
    if not hits:
        raise SystemExit(f"no match: {pattern}")
    return hits[0]


def build_model(cfg):
    z = cfg.autoencoder_params["z_channels"]
    if "dit_model_config" in cfg:
        return DIT(z, dict(cfg.dit_model_config), rngs=nnx.Rngs(0))
    if "ldm_params" in cfg:
        return Unet(z, dict(cfg.ldm_params), rngs=nnx.Rngs(0))
    return Unet(z, dict(cfg.diffusion_model_config), rngs=nnx.Rngs(0))


def main():
    cfg = load_config("mnist_class_cond")
    fp_ckpt = FP_CKPT or find_default(
        f"{R}/ldm/*/mnist/checkpoints/ema_ddpm_ckpt_class_cond_latest")
    latents = LATENTS or find_default(f"{R}/latents/mnist/vqvae_latents")
    sched = make_compvis_linear_schedule(
        cfg.diffusion_params["num_timesteps"],
        cfg.diffusion_params["beta_start"],
        cfg.diffusion_params["beta_end"])

    batches = []
    it = _latent_data_iter(cfg, latents, BATCH, seed=0,
                           max_batches=N_BATCHES)
    for lat, cond in it():
        batches.append((lat, cond))
    print(json.dumps({"n_batches": len(batches),
                      "latent_shape": list(batches[0][0].shape)}),
          flush=True)

    # paired (t, noise) per batch — identical across rungs
    key = jax.random.PRNGKey(7)
    pairs = []
    for lat, _ in batches:
        key, kn, kt = jax.random.split(key, 3)
        noise = jax.random.normal(kn, lat.shape, lat.dtype)
        t = jax.random.randint(kt, (lat.shape[0],), 0,
                               cfg.diffusion_params["num_timesteps"])
        pairs.append((noise, t))

    def mean_loss(model):
        tot = []
        for (lat, cond), (noise, t) in zip(batches, pairs):
            noisy = add_noise(sched, lat, noise, t)
            pred = model(noisy, t, cond)
            tot.append(float(jnp.mean(
                (pred.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2)))
        return float(np.mean(tot))

    results = {}
    for tag, knobs in RUNGS:
        model = build_model(cfg)
        load_model(fp_ckpt, model)
        if knobs is not None:
            kn = dict(knobs)
            pt = ProgressiveTrain(model)
            # direct FP -> ADDA: source types are the PLAIN nn layers
            # (the pipeline's ADDA stage converts custom_layers because it
            # runs after LSQ already swapped them in)
            n = pt.convert_to_layers(
                list(reg_dict.nn_layers), "layers_qn_lsq_adda_cim",
                adc_k=9.071428571, array_size=(576, 2048), **kn)
            assert n > 0, "conversion matched zero layers"
            print(json.dumps({"rung": tag, "converted": n}), flush=True)
            g = (1 / 64) * 2 ** (kn["adc_bit"] - 8) \
                / 2 ** (kn["dac_bit"] - 5) / 2 ** (kn["weight_bit"] - 4)
            for _, m in pt.customized_layers():
                m.adc_adjust_mode = "current"
                m.adc_gain_min = g
                m.adc_gain_max = g
            map_weight_for_model(model, array_size=(576, 2048),
                                 array_device_name="TC05")
            lat0, cond0 = batches[0]
            calibrate_quant_layers(
                model,
                lambda m: m(lat0, jnp.zeros((lat0.shape[0],), jnp.int32),
                            cond0))
        results[tag] = round(mean_loss(model), 5)
        print(json.dumps({"rung": tag, "knobs": knobs,
                          "paired_loss": results[tag]}), flush=True)

    out = os.path.join(R, "qat_ladder.json")
    with open(out, "w") as f:
        json.dump({"protocol": f"paired noise-MSE, {len(batches)} batches "
                               f"of {BATCH}, untrained post-conversion",
                   "results": results}, f, indent=2)
    print(json.dumps({"wrote": out}), flush=True)


if __name__ == "__main__":
    main()
