"""PPLdmTrainer (training/pp.py) on the virtual CPU mesh: the full
pipeline-parallel optimizer step — Adam + EMA over the 'pipe'-sharded
stacked layer state — matches the single-device LdmTrainer step for step,
checkpoints round-trip through Orbax into a plain model, and the CLI's
--pp path wires the trainer correctly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx
from jax.sharding import Mesh

from stablediffusion_pytorch_tpu.models import DIT
from stablediffusion_pytorch_tpu.schedulers import (
    make_compvis_linear_schedule,
)
from stablediffusion_pytorch_tpu.training import LdmTrainer, PPLdmTrainer

TINY = {
    "hidden_size": 32,
    "patch_size": 2,
    "timestep_emb_dim": 16,
    "num_layers": 4,
    "num_heads": 4,
    "head_dim": 8,
}

TEXT_COND = {
    "condition_types": ["text"],
    "text_condition_config": {
        "text_embed_model": "clip",
        "train_text_embed_model": False,
        "text_embed_dim": 24,
        "cond_drop_prob": 0.1,
    },
}


def _build(seed=0, text=False):
    cfg = dict(TINY)
    if text:
        cfg["condition_config"] = TEXT_COND
    m = DIT(4, cfg, rngs=nnx.Rngs(seed))
    # the output head is zero-init (identity at start); give it real
    # weights so losses/grads exercise the whole stack non-trivially
    m.proj_out.kernel[...] = 0.02 * jax.random.normal(
        jax.random.PRNGKey(12), m.proj_out.kernel.shape)
    return m


def _sched():
    return make_compvis_linear_schedule(50, 0.0015, 0.0195)


def _latents(b=8, seed=3):
    return jax.random.normal(jax.random.PRNGKey(seed), (b, 8, 8, 4),
                             jnp.float32)


def _pipe_mesh():
    return Mesh(np.array(jax.devices()[:4]), ("pipe",))


class TestPPTrainerParity:
    def test_matches_single_device_losses(self):
        """3 optimizer steps: pipelined Adam+EMA over the 4-stage sharded
        stack reproduces the single-device trainer's losses (same init,
        same keys) — the whole training path, not just the forward."""
        sched = _sched()
        ref = LdmTrainer(_build(), sched, lr=1e-3, ema_warmup=True)
        pp = PPLdmTrainer(_build(), sched, _pipe_mesh(), n_microbatches=2,
                          lr=1e-3, ema_warmup=True)
        for i in range(3):
            k = jax.random.PRNGKey(100 + i)
            lat = _latents(seed=i)
            l_ref = float(ref.train_step(lat, None, k)["loss"])
            l_pp = float(pp.train_step(lat, None, k)["loss"])
            np.testing.assert_allclose(l_pp, l_ref, rtol=2e-4,
                                       err_msg=f"step {i}")
        # trained params agree after syncing the pipeline state back
        pp.sync_into_model()
        ref_state = jax.tree.leaves(nnx.state(ref.model, nnx.Param))
        pp_state = jax.tree.leaves(nnx.state(pp.model, nnx.Param))
        for a, b in zip(ref_state, pp_state):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)
        # EMA buffers agree too, in model-state shape
        for a, b in zip(jax.tree.leaves(ref.ema_params),
                        jax.tree.leaves(pp.ema_params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-5)

    def test_multi_step_matches_step_loop(self):
        """train_multi_step (one jitted scan) == the same steps one by one."""
        sched = _sched()
        a = PPLdmTrainer(_build(1), sched, _pipe_mesh(), n_microbatches=2,
                         lr=1e-3)
        b = PPLdmTrainer(_build(1), sched, _pipe_mesh(), n_microbatches=2,
                         lr=1e-3)
        key = jax.random.PRNGKey(7)
        stack = jnp.stack([_latents(seed=10 + i) for i in range(3)])
        losses_scan = np.asarray(a.train_multi_step(stack, None, key))
        keys = jax.random.split(key, 3)
        losses_loop = np.asarray(
            [float(b.train_step(stack[i], None, keys[i])["loss"])
             for i in range(3)])
        np.testing.assert_allclose(losses_scan, losses_loop, rtol=1e-5)


class TestPPCheckpointRoundtrip:
    def test_orbax_roundtrip_into_plain_model(self, tmp_path):
        """save_train_checkpoint on the synced PP model restores into a
        fresh single-device model that reproduces the pipelined forward."""
        from stablediffusion_pytorch_tpu.training.checkpoint import (
            load_model, save_train_checkpoint,
        )

        sched = _sched()
        pp = PPLdmTrainer(_build(2), sched, _pipe_mesh(), n_microbatches=2,
                          lr=1e-3)
        for i in range(2):
            pp.train_step(_latents(seed=20 + i), None,
                          jax.random.PRNGKey(i))
        pp.sync_into_model()
        save_train_checkpoint(str(tmp_path), "ppckpt", 1, pp.model,
                              pp.ema_params)

        restored = _build(99)  # different init, fully overwritten by load
        load_model(str(tmp_path / "ppckpt_latest"), restored)
        x, t = _latents(seed=30), jnp.zeros((8,), jnp.int32)
        out_pipe = pp._forward(pp.params["stack"], pp.params["rest"], x, t,
                               None)
        out_restored = restored(x, t)
        np.testing.assert_allclose(np.asarray(out_restored),
                                   np.asarray(out_pipe), atol=1e-5)
        # ema variant restores as a state tree with the same structure
        ema_like = nnx.state(restored, nnx.Param)
        from stablediffusion_pytorch_tpu.training.checkpoint import (
            load_state,
        )
        ema = load_state(str(tmp_path / "ema_ppckpt_latest"), ema_like)
        assert len(jax.tree.leaves(ema)) == len(jax.tree.leaves(ema_like))


@pytest.mark.slow
class TestPPThroughCLI:
    def test_train_ddpm_cond_pp_flag(self, tmp_path):
        """tools/train_ddpm_cond --pp 4 --microbatches 2: multi-epoch
        pipeline-parallel training through the production CLI, per-epoch
        Orbax checkpoints restoring into a plain single-device model."""
        import argparse
        import os

        import yaml
        from PIL import Image

        from stablediffusion_pytorch_tpu.tools import train_ddpm_cond
        from stablediffusion_pytorch_tpu.tools.common import (
            build_denoiser, load_config,
        )
        from stablediffusion_pytorch_tpu.training.checkpoint import (
            load_model,
        )

        data_dir = tmp_path / "mnist" / "train" / "0"
        data_dir.mkdir(parents=True)
        rng = np.random.default_rng(0)
        for i in range(8):
            Image.fromarray(
                rng.integers(0, 255, (16, 16), np.uint8), "L"
            ).save(data_dir / f"{i}.png")

        cfg = {
            "dataset_params": {
                "im_path": str(tmp_path / "mnist" / "train"),
                "im_channels": 1, "im_size": 16, "name": "mnist"},
            "diffusion_params": {"num_timesteps": 20, "beta_start": 0.0015,
                                 "beta_end": 0.0195},
            "ldm_params": {},
            "dit_model_config": dict(TINY),
            "autoencoder_params": {
                "z_channels": 2, "codebook_size": 8,
                "down_channels": [8, 16], "mid_channels": [16, 16],
                "down_sample": [True], "attn_down": [False],
                "norm_channels": 4, "num_heads": 2, "num_down_layers": 1,
                "num_mid_layers": 1, "num_up_layers": 1},
            "train_params": {
                "seed": 7, "task_name": "tinypp", "ldm_batch_size": 8,
                "ldm_epochs": 2, "ldm_lr": 1e-3,
                "vqvae_latent_dir_name": "vqvae_latents",
                "ldm_ckpt_name": "ddpm_ckpt",
                "vqvae_autoencoder_ckpt_name": "vqvae_autoencoder_ckpt"},
        }
        cfg_path = tmp_path / "tinypp.yaml"
        cfg_path.write_text(yaml.safe_dump(cfg))

        arts = train_ddpm_cond.train(argparse.Namespace(
            config=str(cfg_path), epochs=2, bf16=False, vqvae_ckpt=None,
            resume=None, text_weights=None, latent_root=None,
            output_root=str(tmp_path / "runs"), steps_per_call=1,
            tp=1, pp=4, microbatches=2))
        ckpt = os.path.join(arts["ckpt_dir"], "ddpm_ckpt_latest")
        assert os.path.isdir(ckpt)
        assert os.path.isdir(os.path.join(arts["ckpt_dir"],
                                          "ema_ddpm_ckpt_latest"))
        # the PP-trained checkpoint restores into a plain model and runs
        restored = build_denoiser(load_config(str(cfg_path)))
        load_model(ckpt, restored)
        out = restored(jnp.zeros((2, 8, 8, 2)), jnp.zeros((2,), jnp.int32))
        assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
class TestPPHybridText:
    def test_dp_pp_text_conditioned_step(self):
        """Hybrid 2x2 DP x PP with text conditioning + CFG dropout: losses
        match the single-device trainer on the same keys."""
        devs = np.array(jax.devices()[:4]).reshape(2, 2)
        mesh = Mesh(devs, ("data", "pipe"))
        sched = _sched()
        embed = jnp.zeros((1, 7, 24))
        ref = LdmTrainer(_build(4, text=True), sched, lr=1e-3,
                         condition_config=TEXT_COND,
                         empty_text_embed=embed)
        pp = PPLdmTrainer(_build(4, text=True), sched, mesh,
                          n_microbatches=2, lr=1e-3, data_axis="data",
                          condition_config=TEXT_COND,
                          empty_text_embed=embed)
        cond = {"text": jax.random.normal(jax.random.PRNGKey(5),
                                          (8, 7, 24))}
        for i in range(2):
            k = jax.random.PRNGKey(200 + i)
            lat = _latents(seed=40 + i)
            l_ref = float(ref.train_step(lat, dict(cond), k)["loss"])
            l_pp = float(pp.train_step(lat, dict(cond), k)["loss"])
            np.testing.assert_allclose(l_pp, l_ref, rtol=2e-4)
