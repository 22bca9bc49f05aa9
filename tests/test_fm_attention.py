"""Feature-major attention paths (models/dit.Attention, ops/attention):
the SDTPU_FM_XLA=1 hybrid (feature-major q/k/v production + plain-XLA
attention core) must be numerically identical to the default token-major
path — it is a layout change, not a math change."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx


def test_xla_fm_matches_token_major_core():
    from stablediffusion_pytorch_tpu.ops.attention import (
        _xla_attention, _xla_attention_fm,
    )

    b, h, n, d = 2, 3, 16, 8
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, n, h, d))
    k = jax.random.normal(kk, (b, n, h, d))
    v = jax.random.normal(kv, (b, n, h, d))
    scale = d ** -0.5

    ref = _xla_attention(q, k, v, scale)                     # (b, n, h, d)
    fm = lambda x: jnp.transpose(x, (0, 2, 3, 1))            # -> (b,h,d,n)
    out_fm = _xla_attention_fm(fm(q), fm(k), fm(v), scale)   # (b, h, d, n)
    np.testing.assert_allclose(np.asarray(out_fm),
                               np.asarray(fm(ref)), atol=1e-5)


def test_dit_attention_fm_xla_branch_matches_default(monkeypatch):
    from stablediffusion_pytorch_tpu.models.dit import Attention

    cfg = {"num_heads": 3, "head_dim": 8, "hidden_size": 24}
    attn = Attention(cfg, rngs=nnx.Rngs(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 24))

    ref = np.asarray(attn(x))

    # route through the feature-major branch: backend gate patched to
    # "tpu" (the branch body is pure einsums — runs anywhere)
    monkeypatch.setenv("SDTPU_FM_XLA", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert attn._use_feature_major(16)
    out = np.asarray(attn(x))
    np.testing.assert_allclose(out, ref, atol=1e-5)
