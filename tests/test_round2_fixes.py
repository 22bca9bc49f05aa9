"""Regression tests for the round-1 VERDICT correctness findings:

  * W2 — LinearLsqAddaCim must derive its weight-noise key from the
    activations (per-step noise inside closure-captured sampler scans),
    matching the conv twin (reference: layers_utils_adda.py:100-116).
  * W3 — the per-column ADC gain/offset noise must work for layers whose
    padded column grid exceeds the old fixed 4096-entry buffer.
  * W4 — richzhang LPIPS checkpoints (``net.sliceK.N.*`` keys, where N is
    torchvision's absolute ``features`` index) must round-trip into the
    JAX LPIPS (reference: models/lpips.py:95-101).
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from stablediffusion_pytorch_tpu.cim.layers import (
    ConvLsqAddaCim,
    LinearLsqAddaCim,
)


def calib(layer, x):
    layer.calibrating = True
    layer(x)
    layer.calibrating = False


class TestLinearCimNoiseKey:
    def test_weight_noise_key_is_activation_derived(self):
        """The CIM linear must pass an input-derived key to _weight_q so
        weight noise re-rolls every denoise step of a scan (W2)."""
        lin = nnx.Linear(16, 16, rngs=nnx.Rngs(0))
        q = LinearLsqAddaCim(lin, weight_bit=8, input_bit=8, output_bit=8,
                             dac_bit=5, adc_bit=24, adc_k=1.0,
                             array_size=(8, 8), output_quant=False,
                             noise_scale=0.05)
        x1 = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
        x2 = jax.random.normal(jax.random.PRNGKey(1), (2, 16))
        calib(q, x1)

        seen = []
        orig = q._weight_q

        def spy(w, isint, noise_key=None):
            seen.append(noise_key)
            return orig(w, isint, noise_key=noise_key)

        q._weight_q = spy
        q(x1)
        q(x2)
        q._weight_q = orig
        assert seen[0] is not None, "noise_scale>0 must thread a key"
        assert seen[1] is not None
        assert not jnp.array_equal(seen[0], seen[1]), \
            "key must differ across different inputs (per-scan-step noise)"

    def test_noise_differs_across_scan_steps(self):
        """End-to-end: inside a jitted scan over changing inputs the weight
        perturbation must differ per step — outputs of the noisy layer must
        not be a fixed offset of the clean layer's."""
        lin = nnx.Linear(16, 16, rngs=nnx.Rngs(0))
        mk = lambda ns: LinearLsqAddaCim(  # noqa: E731
            lin, weight_bit=8, input_bit=8, output_bit=8, dac_bit=5,
            adc_bit=24, adc_k=1.0, array_size=(8, 8), output_quant=False,
            noise_scale=ns)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
        clean, noisy = mk(0.0), mk(0.2)
        calib(clean, x)
        noisy.step_size_input = clean.step_size_input
        noisy.step_size_weight = clean.step_size_weight

        def step(xt):
            return noisy(xt) - clean(xt)

        deltas = jax.lax.scan(
            lambda c, _: (c * 1.1, step(c)), x, None, length=4)[1]
        # identical-noise bug: delta_i/||x_i|| collapses to one pattern; with
        # per-step keys the normalized deltas decorrelate
        d = np.asarray(deltas).reshape(4, -1).copy()
        d /= np.linalg.norm(d, axis=1, keepdims=True) + 1e-9
        cos = abs(float(d[0] @ d[1]))
        assert cos < 0.99, f"weight noise frozen across scan steps (cos={cos})"


class TestAdcNoiseUnbounded:
    def test_wide_layer_forward_passes(self):
        """nc*ca > 4096 used to reshape-crash the fixed noise buffer (W3)."""
        lin = nnx.Linear(16, 5120, rngs=nnx.Rngs(0))
        q = LinearLsqAddaCim(lin, weight_bit=8, input_bit=8, output_bit=8,
                             dac_bit=5, adc_bit=8, adc_k=1.0,
                             array_size=(8, 128), output_quant=False)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
        calib(q, x)
        q.gain_noise_scale = 0.1
        q.offset_noise_scale = 0.1
        out = q(x)
        assert out.shape == (2, 5120)
        assert np.isfinite(np.asarray(out)).all()

    def test_noise_deterministic_per_layer_seed(self):
        conv = nnx.Conv(3, 8, kernel_size=(3, 3), padding="SAME",
                        rngs=nnx.Rngs(0))
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 3))
        outs = []
        for _ in range(2):
            q = ConvLsqAddaCim(conv, weight_bit=8, input_bit=8, output_bit=8,
                               dac_bit=5, adc_bit=8, adc_k=1.0,
                               array_size=(8, 8), output_quant=False)
            calib(q, x)
            q.gain_noise_scale = 0.3
            q.offset_noise_scale = 0.3
            outs.append(np.asarray(q(x)))
        np.testing.assert_array_equal(outs[0], outs[1])


# torchvision vgg16.features conv layer indices (absolute), grouped by the
# richzhang slice each lives in: slice1=[0,2] slice2=[5,7] slice3=[10,12,14]
# slice4=[17,19,21] slice5=[24,26,28]
_SLICES = {1: [0, 2], 2: [5, 7], 3: [10, 12, 14],
           4: [17, 19, 21], 5: [24, 26, 28]}
_VGG_CONV_SHAPES = [  # (out, in) per conv, torchvision vgg16 plan
    (64, 3), (64, 64), (128, 64), (128, 128), (256, 128), (256, 256),
    (256, 256), (512, 256), (512, 512), (512, 512), (512, 512), (512, 512),
    (512, 512)]
_STAGE_CH = [64, 128, 256, 512, 512]


def _fake_richzhang_state():
    import torch

    gen = torch.Generator().manual_seed(0)
    state, flat_idx = {}, 0
    for s, idxs in _SLICES.items():
        for ti in idxs:
            o, i = _VGG_CONV_SHAPES[flat_idx]
            state[f"net.slice{s}.{ti}.weight"] = torch.randn(
                (o, i, 3, 3), generator=gen)
            state[f"net.slice{s}.{ti}.bias"] = torch.randn((o,), generator=gen)
            flat_idx += 1
    for i, ch in enumerate(_STAGE_CH):
        state[f"lin{i}.model.1.weight"] = torch.rand(
            (1, ch, 1, 1), generator=gen)
    return state


class TestLpipsRichzhangRemap:
    def test_key_remap_drops_slice_keeps_abs_index(self):
        from stablediffusion_pytorch_tpu.models.lpips import (
            remap_richzhang_keys,
        )

        out = remap_richzhang_keys({
            "net.slice1.0.weight": 1, "net.slice1.2.bias": 2,
            "net.slice3.14.weight": 3, "lins.4.model.1.weight": 5,
            "lin0.model.1.weight": 4, "scaling_layer.shift": 6,
        })
        assert out["features.0.weight"] == 1
        assert out["features.2.bias"] == 2
        assert out["features.14.weight"] == 3
        assert out["lin0.model.1.weight"] == 4
        assert out["lin4.model.1.weight"] == 5
        assert out["scaling_layer.shift"] == 6

    def test_full_state_round_trips(self, tmp_path):
        import torch

        from stablediffusion_pytorch_tpu.models.lpips import load_lpips

        state = _fake_richzhang_state()
        path = tmp_path / "vgg.pth"
        torch.save(state, path)
        model = load_lpips(str(path), rngs=nnx.Rngs(0))
        assert model._pretrained, "synthetic richzhang ckpt must map cleanly"
        w0 = np.asarray(state["net.slice1.0.weight"])
        np.testing.assert_allclose(
            np.asarray(model.net.convs[0].kernel[...]),
            w0.transpose(2, 3, 1, 0), rtol=1e-6)
        w14 = np.asarray(state["net.slice3.14.weight"])
        np.testing.assert_allclose(
            np.asarray(model.net.convs[6].kernel[...]),
            w14.transpose(2, 3, 1, 0), rtol=1e-6)
        lw = np.asarray(state["lin2.model.1.weight"])
        np.testing.assert_allclose(
            np.asarray(model.lins[2].kernel[...]),
            lw.transpose(2, 3, 1, 0), rtol=1e-6)

    def test_lin_only_state_loads_heads_not_pretrained(self, tmp_path):
        import torch

        from stablediffusion_pytorch_tpu.models.lpips import load_lpips

        state = {k: v for k, v in _fake_richzhang_state().items()
                 if k.startswith("lin")}
        path = tmp_path / "vgg.pth"
        torch.save(state, path)
        model = load_lpips(str(path), rngs=nnx.Rngs(0))
        assert not model._pretrained  # VGG backbone still random
        lw = np.asarray(state["lin1.model.1.weight"])
        np.testing.assert_allclose(
            np.asarray(model.lins[1].kernel[...]),
            lw.transpose(2, 3, 1, 0), rtol=1e-6)
