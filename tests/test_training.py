"""Trainer tests: LDM step (EMA, clip, non-finite skip, cond dropout) and the
VQVAE two-optimizer GAN step; sharded data-parallel execution on the 8-device
CPU mesh."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.models import Unet, VQVAE, Discriminator
from stablediffusion_pytorch_tpu.schedulers import make_compvis_linear_schedule
from stablediffusion_pytorch_tpu.training import LdmTrainer, VqvaeTrainer, ema_update
from stablediffusion_pytorch_tpu.training.ldm import PlateauController
from stablediffusion_pytorch_tpu.parallel import make_mesh, shard_batch
from tests.test_models import TINY_AE, TINY_UNET, COND_CFG


def make_trainer(cond=False, **kw):
    cfg = dict(TINY_UNET, condition_config=COND_CFG) if cond else TINY_UNET
    model = Unet(4, cfg, rngs=nnx.Rngs(0))
    sched = make_compvis_linear_schedule(100, 0.0015, 0.0195)
    cc = COND_CFG if cond else None
    empty = jnp.zeros((1, 7, 24)) if cond else None
    return LdmTrainer(model, sched, lr=1e-3, condition_config=cc,
                      empty_text_embed=empty, **kw)


class TestEma:
    def test_update_formula(self):
        ema = {"w": jnp.ones(3)}
        new = {"w": jnp.zeros(3)}
        out = ema_update(ema, new, 0.9)
        np.testing.assert_allclose(out["w"], 0.9 * np.ones(3), rtol=1e-6)

    def test_warmup_ramp(self):
        # step 0: effective decay 0.1 (EMA jumps 90% toward params); large
        # step: approaches the configured decay. Regression for the round-3
        # 256^2 run where flat 0.9999 left the EMA ckpt at its random init
        # after 3.3k steps.
        from stablediffusion_pytorch_tpu.training.ema import warmup_decay
        assert float(warmup_decay(0.9999, jnp.asarray(0))) == pytest.approx(0.1)
        assert float(warmup_decay(0.9999, jnp.asarray(90))) == pytest.approx(0.91)
        assert float(warmup_decay(0.9999, jnp.asarray(10**7))) == pytest.approx(0.9999)

    def test_warmup_ema_tracks_fast(self):
        # with warmup, a freshly-initialized EMA follows the live params
        # within a handful of steps even at decay 0.9999 (flat 0.9999
        # would leave it ~99.97% of the way back at init after 3 steps)
        tr = make_trainer(ema_decay=0.9999)  # warmup defaults ON
        from flax import nnx as _nnx
        init = jax.tree.map(np.asarray, tr.ema_params)
        latents = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
        for i in range(3):
            tr.train_step(latents, None, jax.random.PRNGKey(i))
        live = _nnx.state(tr.model, _nnx.Param)

        def sq(a, b):
            return sum(float(jnp.sum((x - y) ** 2)) for x, y in zip(
                jax.tree.leaves(a), jax.tree.leaves(b)))

        # EMA is far closer to the trained weights than the init is
        assert sq(tr.ema_params, live) < 0.25 * sq(init, live)
        assert int(tr.ema_step) == 3


class TestPlateau:
    def test_reduces_after_patience(self):
        pc = PlateauController(lr=1.0, factor=0.5, patience=1)
        assert pc.step(1.0) == 1.0   # best
        assert pc.step(2.0) == 1.0   # bad 1 (<= patience)
        assert pc.step(2.0) == 0.5   # bad 2 -> reduce
        assert pc.step(0.5) == 0.5   # new best


class TestLdmTrainer:
    def test_loss_decreases_unconditional(self):
        tr = make_trainer()
        latents = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4)) * 0.1
        losses = []
        for i in range(5):
            m = tr.train_step(latents, None, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
        assert all(np.isfinite(losses))

    @pytest.mark.slow
    def test_ema_tracks_params(self):
        tr = make_trainer(ema_decay=0.5)
        before = jax.tree.map(np.asarray, tr.ema_params)  # host copies (ema buffers are donated)
        latents = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
        tr.train_step(latents, None, jax.random.PRNGKey(1))
        diffs = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                             before, tr.ema_params)
        assert max(jax.tree.leaves(diffs)) > 0

    @pytest.mark.slow
    def test_conditional_step_with_dropout(self):
        tr = make_trainer(cond=True)
        latents = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
        cond = {
            "class": jax.nn.one_hot(jnp.array([1, 2]), 10),
            "text": jnp.ones((2, 7, 24)),
            "image": jnp.ones((2, 64, 64, 18)),
        }
        m = tr.train_step(latents, cond, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))

    @pytest.mark.slow
    def test_nonfinite_batch_skips_update(self):
        tr = make_trainer()
        params_before = jax.tree.map(lambda x: np.asarray(x),
                                     nnx.state(tr.model, nnx.Param))
        bad = jnp.full((2, 16, 16, 4), jnp.nan)
        m = tr.train_step(bad, None, jax.random.PRNGKey(0))
        assert not np.isfinite(float(m["loss"]))
        params_after = nnx.state(tr.model, nnx.Param)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                     params_before, params_after)

    @pytest.mark.slow
    def test_set_lr(self):
        tr = make_trainer()
        tr.train_step(jnp.ones((2, 16, 16, 4)), None, jax.random.PRNGKey(0))
        tr.set_lr(1e-6)
        tr.train_step(jnp.ones((2, 16, 16, 4)), None, jax.random.PRNGKey(1))


class TestVqvaeTrainer:
    def _make(self, disc_start=0):
        model = VQVAE(3, TINY_AE, rngs=nnx.Rngs(0))
        disc = Discriminator(3, rngs=nnx.Rngs(1))
        tc = {"disc_start": disc_start, "disc_weight": 0.5,
              "codebook_weight": 1.0, "commitment_beta": 0.2,
              "perceptual_weight": 0.0, "autoencoder_lr": 1e-3,
              "autoencoder_acc_steps": 1}
        return VqvaeTrainer(model, disc, None, tc)

    def test_gan_step_runs(self):
        tr = self._make(disc_start=0)
        im = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        m1 = tr.train_step(im, jax.random.PRNGKey(1))
        m2 = tr.train_step(im, jax.random.PRNGKey(2))
        for k in ["g_loss", "d_loss", "recon_loss", "codebook_loss"]:
            assert np.isfinite(float(m2[k])), k
        assert float(m2["d_loss"]) > 0  # disc active from step > 0

    def test_out_std_collapse_guard_metric(self):
        """out_std (the decode-std mean-collapse guard, VERDICT r3 #5) is
        reported, packed, and actually measures the decoder output: a
        healthy random-init decoder has std >> the 0.08 seen in the
        collapsed round-3 v1 GAN run, and the metric equals the std of the
        model's own reconstruction."""
        tr = self._make(disc_start=0)
        im = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        m = tr.train_step(im, jax.random.PRNGKey(1))
        assert "out_std" in tr.METRIC_KEYS
        packed = dict(zip(tr.METRIC_KEYS, np.asarray(m["packed"]).tolist()))
        assert packed["out_std"] == pytest.approx(float(m["out_std"]))
        out, _, _ = tr.model(im)
        # the step updates params before we can re-run the decoder, so
        # compare loosely — this pins that the metric tracks the decoder
        # output's scale, not some other tensor
        assert float(m["out_std"]) == pytest.approx(
            float(jnp.std(out.astype(jnp.float32))), rel=0.5)
        assert 0.05 < float(m["out_std"]) < 5.0
        # a constant (mean-collapsed) output would trip the 0.15 CLI guard
        assert float(jnp.std(jnp.zeros_like(out))) < 0.15

    @pytest.mark.slow
    def test_disc_gated_before_start(self):
        tr = self._make(disc_start=1000)
        im = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        disc_before = jax.tree.map(np.asarray,
                                   nnx.state(tr.discriminator, nnx.Param))
        m = tr.train_step(im, jax.random.PRNGKey(1))
        assert float(m["d_loss"]) == 0
        disc_after = nnx.state(tr.discriminator, nnx.Param)
        jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, np.asarray(b)),
                     disc_before, disc_after)

    @pytest.mark.slow
    def test_recon_improves(self):
        tr = self._make(disc_start=10_000)
        im = jnp.tile(jnp.linspace(-1, 1, 32)[None, :, None, None],
                      (2, 1, 32, 3))
        first = float(tr.train_step(im, jax.random.PRNGKey(0))["recon_loss"])
        for i in range(30):
            last = float(tr.train_step(im, jax.random.PRNGKey(i + 1))["recon_loss"])
        assert last < first


@pytest.mark.slow
class TestDataParallelStep:
    def test_sharded_train_step_on_mesh(self):
        """Batch sharded over the 8-device 'data' mesh; params replicated via
        jit's default; one step runs and returns finite loss."""
        tr = make_trainer()
        mesh = make_mesh()
        assert mesh.devices.size == 8
        latents = jax.random.normal(jax.random.PRNGKey(0), (16, 16, 16, 4))
        sharded = shard_batch(mesh, latents)
        assert len(sharded.sharding.device_set) == 8
        m = tr.train_step(sharded, None, jax.random.PRNGKey(1))
        assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
class TestMultiStepScan:
    """The multi-step scan program (model + optimizer in the carry)
    intermittently segfaults XLA:CPU when compiled late in a long-lived
    suite process (observed at backend_compile_and_load and in the
    persistent-cache serializer; standalone it always passes) — run the
    scenarios in a fresh interpreter via tests/_multistep_probe.py and
    assert on the child process."""

    def _probe(self, scenario):
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, JAX_PLATFORMS="cpu",
                   PYTHONPATH=repo + os.pathsep
                   + os.environ.get("PYTHONPATH", ""))
        res = subprocess.run(
            [sys.executable, os.path.join("tests", "_multistep_probe.py"),
             scenario],
            cwd=repo, env=env, capture_output=True, text=True, timeout=420)
        assert res.returncode == 0, res.stdout + res.stderr
        assert f"multistep-probe {scenario}: ok" in res.stdout

    def test_multi_step_trains_and_matches_api(self):
        """S steps in one jitted nnx.scan program (PERF.md dispatch
        amortization); on a fixed batch the loss must actually decrease
        across chunks (regression for the lost-update broadcast bug)."""
        self._probe("base")

    def test_multi_step_with_conditioning(self):
        self._probe("cond")
