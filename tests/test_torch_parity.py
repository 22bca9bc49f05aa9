"""Cross-framework numeric parity: our NHWC layers vs CPU torch on converted
weights — the independent cross-check the reference does for attention
(compare_attention.py:19-60), extended to conv / conv-transpose / norm /
full-model conversion."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax import nnx

torch = pytest.importorskip("torch")

from stablediffusion_pytorch_tpu.utils.torch_convert import (  # noqa: E402
    load_conv,
    load_conv_transpose,
    load_linear,
    load_norm,
    load_torch_mha,
    load_torch_vqvae,
)


def _np(x):
    return x.detach().numpy()


class TestPrimitiveParity:
    def test_conv2d(self):
        tconv = torch.nn.Conv2d(3, 8, 3, stride=1, padding=1)
        conv = nnx.Conv(3, 8, kernel_size=(3, 3), padding=[(1, 1), (1, 1)],
                        rngs=nnx.Rngs(0))
        load_conv(conv, {"c.weight": _np(tconv.weight),
                         "c.bias": _np(tconv.bias)}, "c")
        x = np.random.default_rng(0).normal(size=(2, 3, 8, 8)).astype(
            np.float32)
        ref = _np(tconv(torch.from_numpy(x)))
        got = np.asarray(conv(jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   rtol=1e-4, atol=1e-5)

    def test_strided_conv_4_2_1(self):
        tconv = torch.nn.Conv2d(4, 6, 4, stride=2, padding=1)
        conv = nnx.Conv(4, 6, kernel_size=(4, 4), strides=(2, 2),
                        padding=[(1, 1), (1, 1)], rngs=nnx.Rngs(0))
        load_conv(conv, {"c.weight": _np(tconv.weight),
                         "c.bias": _np(tconv.bias)}, "c")
        x = np.random.default_rng(1).normal(size=(1, 4, 16, 16)).astype(
            np.float32)
        ref = _np(tconv(torch.from_numpy(x)))
        got = np.asarray(conv(jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   rtol=1e-4, atol=1e-5)

    def test_conv_transpose_4_2_1(self):
        """torch ConvTranspose2d(4,2,1) == flax ConvTranspose(4, s2, SAME)
        after the converter's flip+transpose."""
        tconv = torch.nn.ConvTranspose2d(4, 4, 4, stride=2, padding=1)
        ct = nnx.ConvTranspose(4, 4, kernel_size=(4, 4), strides=(2, 2),
                               padding="SAME", rngs=nnx.Rngs(0))
        state = {"up.weight": _np(tconv.weight), "up.bias": _np(tconv.bias)}
        load_conv_transpose(ct, state, "up")
        x = np.random.default_rng(2).normal(size=(1, 4, 8, 8)).astype(
            np.float32)
        ref = _np(tconv(torch.from_numpy(x)))
        got = np.asarray(ct(jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   rtol=1e-3, atol=1e-4)

    def test_linear(self):
        tl = torch.nn.Linear(6, 10)
        lin = nnx.Linear(6, 10, rngs=nnx.Rngs(0))
        load_linear(lin, {"fc.weight": _np(tl.weight),
                          "fc.bias": _np(tl.bias)}, "fc")
        x = np.random.default_rng(3).normal(size=(4, 6)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(lin(jnp.asarray(x))),
                                   _np(tl(torch.from_numpy(x))),
                                   rtol=1e-4, atol=1e-5)

    def test_groupnorm(self):
        tn = torch.nn.GroupNorm(4, 8)
        with torch.no_grad():
            tn.weight.uniform_(0.5, 1.5)
            tn.bias.uniform_(-0.5, 0.5)
        gn = nnx.GroupNorm(8, num_groups=4, rngs=nnx.Rngs(0))
        load_norm(gn, {"n.weight": _np(tn.weight),
                       "n.bias": _np(tn.bias)}, "n")
        x = np.random.default_rng(4).normal(size=(2, 8, 4, 4)).astype(
            np.float32)
        ref = _np(tn(torch.from_numpy(x)))
        got = np.asarray(gn(jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(got.transpose(0, 3, 1, 2), ref,
                                   rtol=1e-4, atol=1e-5)

    def test_multihead_attention_self_and_cross(self):
        """The reference's compare_attention.py check, cross-framework."""
        from stablediffusion_pytorch_tpu.models.common import (
            MultiheadAttention,
        )

        tmha = torch.nn.MultiheadAttention(16, 4, batch_first=True)
        mha = MultiheadAttention(16, 4, rngs=nnx.Rngs(0))
        state = {f"a.{k}": _np(v) for k, v in tmha.state_dict().items()}
        load_torch_mha(mha, state, "a")

        rng = np.random.default_rng(5)
        q = rng.normal(size=(2, 10, 16)).astype(np.float32)
        kv = rng.normal(size=(2, 7, 16)).astype(np.float32)

        # self-attention
        ref, _ = tmha(torch.from_numpy(q), torch.from_numpy(q),
                      torch.from_numpy(q))
        got = mha(jnp.asarray(q), jnp.asarray(q), jnp.asarray(q))
        np.testing.assert_allclose(np.asarray(got), _np(ref), rtol=1e-3,
                                   atol=1e-5)

        # cross-attention
        ref, _ = tmha(torch.from_numpy(q), torch.from_numpy(kv),
                      torch.from_numpy(kv))
        got = mha(jnp.asarray(q), jnp.asarray(kv), jnp.asarray(kv))
        np.testing.assert_allclose(np.asarray(got), _np(ref), rtol=1e-3,
                                   atol=1e-5)


class TestEmbeddingGather:
    def test_codebook_matches_index_select(self):
        from stablediffusion_pytorch_tpu.utils.torch_convert import (
            load_embedding,
        )

        temb = torch.nn.Embedding(16, 4)
        emb = nnx.Embed(16, 4, rngs=nnx.Rngs(0))
        load_embedding(emb, {"e.weight": _np(temb.weight)}, "e")
        idx = np.array([1, 5, 3])
        np.testing.assert_allclose(np.asarray(emb(jnp.asarray(idx))),
                                   _np(temb(torch.from_numpy(idx))),
                                   rtol=1e-6)
