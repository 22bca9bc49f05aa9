"""LPIPS perceptual loss: VGG16 feature slices + linear calibration heads.

Re-implements reference models/lpips.py:20-140 (richzhang LPIPS v0.1, VGG
variant) in flax.nnx:

  * ``Vgg16Features`` — the five conv stages of torchvision VGG16, cut after
    relu1_2 / relu2_2 / relu3_3 / relu4_3 / relu5_3 (reference: lpips.py:20-61)
  * ``ScalingLayer`` — ImageNet shift/scale constants (lpips.py, richzhang
    values: shift [-.030, -.088, -.188], scale [.458, .448, .450])
  * ``NetLinLayer`` — 1x1 conv head per stage, no bias activation weighting
  * forward: unit-normalize channel dim, squared diff, 1x1 head, spatial
    mean, sum over stages (lpips.py:110-140)

Pretrained weights: the reference auto-downloads ``weights/v0.1/vgg.pth``
(lpips.py:95-101). This environment has no network egress, so
``load_torch_lpips_weights`` converts a locally provided torch checkpoint
(torchvision VGG16 ``features`` + LPIPS ``lin*.model.1.weight``) into the
module; without one the loss runs with deterministic random features — still
a valid training signal, clearly weaker than calibrated LPIPS, and flagged
with a warning.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

log = logging.getLogger(__name__)

# torchvision vgg16.features conv channel plan; 'M' = 2x2 maxpool
_VGG_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
             512, 512, 512, "M", 512, 512, 512, "M"]
# feature-slice boundaries in conv-index space: after which conv (0-based,
# counting convs only) each LPIPS stage ends (== relu1_2, relu2_2, relu3_3,
# relu4_3, relu5_3 in torch layer indices 3/8/15/22/29, lpips.py:29-47)
_SLICE_END_CONV = [1, 3, 6, 9, 12]
_STAGE_CHANNELS = [64, 128, 256, 512, 512]


class Vgg16Features(nnx.Module):
    """VGG16 conv tower emitting the five LPIPS feature stages."""

    def __init__(self, *, rngs: nnx.Rngs, dtype=None):
        self.convs = nnx.List([])
        in_ch = 3
        for v in _VGG_PLAN:
            if v == "M":
                continue
            self.convs.append(nnx.Conv(in_ch, v, kernel_size=(3, 3),
                                       padding="SAME", dtype=dtype, rngs=rngs))
            in_ch = v
        # conv index -> whether a maxpool precedes it
        self._pool_before = []
        ci = 0
        prev_was_pool = False
        for v in _VGG_PLAN:
            if v == "M":
                prev_was_pool = True
            else:
                self._pool_before.append(prev_was_pool)
                prev_was_pool = False
                ci += 1

    def __call__(self, x: jax.Array):
        outs = []
        conv_i = 0
        for conv, pool_first in zip(self.convs, self._pool_before):
            if pool_first:
                x = nnx.max_pool(x, window_shape=(2, 2), strides=(2, 2))
            x = nnx.relu(conv(x))
            if conv_i in _SLICE_END_CONV:
                outs.append(x)
            conv_i += 1
        return outs


class ScalingLayer(nnx.Module):
    """ImageNet normalization on [-1, 1] inputs (richzhang constants)."""

    def __call__(self, x: jax.Array) -> jax.Array:
        shift = jnp.asarray([-0.030, -0.088, -0.188], x.dtype)
        scale = jnp.asarray([0.458, 0.448, 0.450], x.dtype)
        return (x - shift) / scale


def _normalize_tensor(x: jax.Array, eps: float = 1e-10) -> jax.Array:
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS(nnx.Module):
    """Learned perceptual distance; frozen by callers via stop_gradient."""

    def __init__(self, *, rngs: nnx.Rngs, dtype=None):
        self.scaling_layer = ScalingLayer()
        self.net = Vgg16Features(rngs=rngs, dtype=dtype)
        # 1x1 no-bias linear heads (NetLinLayer, lpips.py:51-61)
        self.lins = nnx.List([
            nnx.Conv(ch, 1, kernel_size=(1, 1), use_bias=False,
                     kernel_init=nnx.initializers.uniform(0.1),
                     dtype=dtype, rngs=rngs)
            for ch in _STAGE_CHANNELS
        ])
        self._pretrained = False

    def __call__(self, in0: jax.Array, in1: jax.Array) -> jax.Array:
        """Perceptual distance per sample, NHWC inputs in [-1, 1].
        Gradient flows to the inputs but the VGG/head params are frozen by
        the trainer (reference freezes all LPIPS params, lpips.py:78-84)."""
        f0 = self.net(self.scaling_layer(in0))
        f1 = self.net(self.scaling_layer(in1))
        total = 0.0
        for feat0, feat1, lin in zip(f0, f1, self.lins):
            d = (_normalize_tensor(feat0) - _normalize_tensor(feat1)) ** 2
            total = total + jnp.mean(lin(d), axis=(1, 2, 3))
        return total


def load_torch_lpips_weights(model: LPIPS, vgg_state: Optional[dict],
                             lpips_state: Optional[dict] = None) -> LPIPS:
    """Port torch weights: ``vgg_state`` = torchvision vgg16 state_dict
    (``features.N.weight/bias``), ``lpips_state`` = richzhang LPIPS v0.1
    state_dict (``lin{i}.model.1.weight``). Torch conv OIHW -> HWIO."""
    conv_torch_idx = [i for i, v in enumerate(
        _expanded_torch_layers()) if v == "conv"]
    if vgg_state is not None:
        for conv, ti in zip(model.net.convs, conv_torch_idx):
            w = np.asarray(vgg_state[f"features.{ti}.weight"])
            b = np.asarray(vgg_state[f"features.{ti}.bias"])
            conv.kernel.value = jnp.asarray(w.transpose(2, 3, 1, 0))
            conv.bias.value = jnp.asarray(b)
    if lpips_state is not None:
        for i, lin in enumerate(model.lins):
            w = np.asarray(lpips_state[f"lin{i}.model.1.weight"])  # (1,C,1,1)
            lin.kernel.value = jnp.asarray(w.transpose(2, 3, 1, 0))
    # only a real VGG backbone makes the perceptual distance calibrated;
    # lin heads alone still run over random features
    model._pretrained = vgg_state is not None
    return model


def _expanded_torch_layers():
    """torchvision vgg16.features layer sequence: conv,relu per conv + pool."""
    seq = []
    for v in _VGG_PLAN:
        if v == "M":
            seq.append("pool")
        else:
            seq.extend(["conv", "relu"])
    return seq


def remap_richzhang_keys(state: dict) -> dict:
    """Normalize a richzhang-LPIPS-style state dict to torchvision key space.

    The richzhang ``lpips.LPIPS`` module builds each ``net.sliceK`` Sequential
    by ``add_module(str(x), vgg_pretrained_features[x])`` — the inner index
    ``x`` is torchvision's ABSOLUTE ``features`` index, not a slice-local one.
    So ``net.slice2.5.weight`` maps to ``features.5.weight`` directly; the
    slice number is dropped (reference: models/lpips.py:29-47).

    Lin-head keys are normalized to ``lin{i}.model.1.weight`` (richzhang
    ships them as either that or ``lins.{i}.model.1.weight``).
    """
    import re

    out = {}
    for k, v in state.items():
        m = re.match(r"net\.slice\d+\.(\d+)\.(weight|bias)$", k)
        if m:
            out[f"features.{m.group(1)}.{m.group(2)}"] = v
            continue
        m = re.match(r"lins?\.?(\d+)\.model\.1\.weight$", k)
        if m:
            out[f"lin{m.group(1)}.model.1.weight"] = v
            continue
        out[k] = v
    return out


def load_lpips(weights_path: Optional[str] = None, *, rngs=None,
               vgg_path: Optional[str] = None) -> LPIPS:
    """Build LPIPS, loading torch weights if given.

    ``weights_path`` accepts any of: a full richzhang LPIPS state dict
    (``net.sliceK.N.*`` + lin heads), a torchvision vgg16 state dict
    (``features.N.*``), or the richzhang ``weights/v0.1/vgg.pth`` (lin heads
    only — pass the VGG backbone separately via ``vgg_path``)."""
    model = LPIPS(rngs=rngs or nnx.Rngs(0))
    if weights_path or vgg_path:
        import torch  # CPU torch is available in this image

        state = {}
        for path in filter(None, (vgg_path, weights_path)):
            raw = torch.load(path, map_location="cpu", weights_only=True)
            state.update({k: v.numpy() for k, v in raw.items()})
        state = remap_richzhang_keys(state)
        vgg_state = {k: v for k, v in state.items()
                     if k.startswith("features.")}
        lin_state = {k: v for k, v in state.items() if k.startswith("lin")}
        try:
            load_torch_lpips_weights(model, vgg_state or None,
                                     lin_state or None)
        except KeyError as e:
            log.warning("LPIPS: could not map %s (missing %s); "
                        "using random features", weights_path, e)
    else:
        log.warning(
            "LPIPS: no pretrained VGG16 weights available (zero-egress "
            "environment) — using deterministic random features. Provide a "
            "torch vgg.pth via load_lpips(weights_path=...) for calibrated "
            "perceptual loss.")
    return model
