"""DiT denoiser: patch embedding, adaLN transformer layers, unpatchify.

Re-implements the reference DiT stack in NHWC flax.nnx:
  * PatchEmbedding — einops-style patchify + Linear + on-the-fly 2-D
    sinusoidal position embedding (reference: models/patch_embed.py:5-96)
  * fused-QKV self-attention, att_dim = heads * head_dim
    (reference: models/attention.py:6-78)
  * TransformerLayer — adaLN: ReLU+Linear predicts 6*hidden modulation
    params (pre-attn shift/scale, post-attn gate, pre-mlp shift/scale,
    post-mlp gate) from the t-emb; affine-free LayerNorms; optional un-gated
    cross-attention sub-block (reference: models/transformer_layer.py:6-106)
  * DIT — optional mask conditioning (1x1 conv + channel concat before
    patchify), class-emb summed into t-emb, final adaLN (2*hidden) +
    zero-init proj_out + unpatchify (reference: models/transformer.py:43-213)

DiT zero/xavier init conventions are preserved (transformer_layer.py:68-78,
transformer.py:144-151) — they matter for training stability.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from stablediffusion_pytorch_tpu.models.common import (
    MultiheadAttention,
    get_time_embedding,
)
from stablediffusion_pytorch_tpu.ops.attention import scaled_dot_product_attention
from stablediffusion_pytorch_tpu.utils.config_utils import (
    get_config_value,
    validate_class_config,
    validate_class_conditional_input,
    validate_image_config,
    validate_image_conditional_input,
    validate_text_config,
)

_xavier = nnx.initializers.glorot_uniform()
_zeros = nnx.initializers.zeros
_normal02 = nnx.initializers.normal(stddev=0.02)


def _layer_fwd(layer, x, t_emb, context, mods):
    """Module-level thunk for nnx.remat (a lambda would re-trace per call)."""
    return layer(x, t_emb, context, mods=mods)


# Gradient checkpointing (jax.checkpoint / remat): recompute each
# transformer layer's activations in the backward pass instead of storing
# them — activation memory drops from O(num_layers) to O(1) layers at the
# cost of one extra forward. On TPU this converts HBM pressure into MXU
# FLOPs, the standard trade for training deeper configs / bigger batches
# per chip. Enabled per-model via ``gradient_checkpointing: true`` in the
# model config or ``model.remat = True`` (and ``--remat`` on the trainers).
_layer_fwd_remat = nnx.remat(_layer_fwd)


def get_patch_position_embedding(pos_emb_dim: int, grid_size) -> jax.Array:
    """2-D sinusoidal position embedding: (h-emb ‖ w-emb), each sin‖cos.

    Reference: models/patch_embed.py:5-34.
    """
    assert pos_emb_dim % 4 == 0, "Position embedding dimension must be divisible by 4"
    gh, gw = grid_size
    grid_h = jnp.repeat(jnp.arange(gh, dtype=jnp.float32), gw)
    grid_w = jnp.tile(jnp.arange(gw, dtype=jnp.float32), gh)
    factor = 10000 ** (
        jnp.arange(0, pos_emb_dim // 4, dtype=jnp.float32) / (pos_emb_dim // 4)
    )

    def emb(pos):
        ang = pos[:, None] / factor[None, :]
        return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)

    return jnp.concatenate([emb(grid_h), emb(grid_w)], axis=-1)


class PatchEmbedding(nnx.Module):
    """Patchify NHWC image to token sequence + position embedding.

    Reference: models/patch_embed.py:37-96 (torch rearrange
    'b c (nh ph) (nw pw) -> b (nh nw) (ph pw c)'; the (ph pw c) patch-dim
    ordering is preserved here for checkpoint-porting parity).
    """

    def __init__(self, im_channels: int, patch_height: int, patch_width: int,
                 hidden_size: int, *, rngs: nnx.Rngs, dtype=None):
        self.patch_height = patch_height
        self.patch_width = patch_width
        self.hidden_size = hidden_size
        patch_dim = im_channels * patch_height * patch_width
        self.patch_embed = nnx.Linear(patch_dim, hidden_size,
                                      kernel_init=_xavier, bias_init=_zeros,
                                      dtype=dtype, rngs=rngs)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        ph, pw = self.patch_height, self.patch_width
        assert h % ph == 0, "Input height must be divisible by patch height"
        assert w % pw == 0, "Input width must be divisible by patch width"
        nh, nw = h // ph, w // pw
        # b (nh ph) (nw pw) c -> b (nh nw) (ph pw c)
        out = x.reshape(b, nh, ph, nw, pw, c)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, nh * nw, ph * pw * c)
        out = self.patch_embed(out)
        pos = get_patch_position_embedding(self.hidden_size, (nh, nw))
        return out + pos.astype(out.dtype)


class Attention(nnx.Module):
    """DiT fused-QKV self-attention (reference: models/attention.py:6-78)."""

    def __init__(self, config: dict, *, rngs: nnx.Rngs, dtype=None):
        self.n_heads = config["num_heads"]
        self.head_dim = config["head_dim"]
        hidden = config["hidden_size"]
        att_dim = self.n_heads * self.head_dim
        self.qkv_proj = nnx.Linear(hidden, 3 * att_dim, kernel_init=_xavier,
                                   bias_init=_zeros, dtype=dtype, rngs=rngs)
        self.output_proj = nnx.Linear(att_dim, hidden, kernel_init=_xavier,
                                      bias_init=_zeros, dtype=dtype, rngs=rngs)

    def _use_feature_major(self, n: int) -> bool:
        # Opt-in: at the production DiT shape (d=32, N=256, b32) attention
        # is MXU-geometry-bound (K=32 scores contraction / M=32 AV output
        # rows both run the MXU at ~25%), and XLA already overlaps its
        # scores HBM round-trip under that floor — measured 350 fwd/s (XLA)
        # vs 319 (this path) on DiT-12L. Kept for long-sequence/narrow-head
        # regimes where the (N, N) probs traffic dominates instead.
        # SDTPU_FM_XLA=1 keeps the transpose-free feature-major PRODUCTION
        # of q/k/v (the layout ride on the projection GEMM) but runs the
        # attention core as plain XLA einsums instead of the Pallas kernel —
        # the round-3 hybrid of the two round-2 measurements.
        import os

        if (os.environ.get("SDTPU_HEAD_ATTN", "0") != "1"
                and os.environ.get("SDTPU_FM_XLA", "0") != "1"):
            return False
        return (jax.default_backend() == "tpu" and self.head_dim < 64
                and n <= 1024)

    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, _ = x.shape

        if self._use_feature_major(n):
            # Feature-major fast path (VERDICT W1): the head-packed Pallas
            # kernel wants (B, heads, D, N). Producing q/k/v ALREADY
            # transposed lets the layout change ride the projection GEMM
            # (einsum output dims — XLA picks the fused layout) instead of
            # 4 explicit (B,N,H,D)<->(B,H,D,N) copies, and the output
            # projection contracts the feature-major result directly (MXU
            # takes transposed operands natively). Net: the (B, heads, N, N)
            # probs HBM round-trip — the dominant non-GEMM cost at DiT
            # shapes — is eliminated with no layout copies added.
            import os

            from stablediffusion_pytorch_tpu.ops.attention import (
                _xla_attention_fm, feature_major_attention,
            )

            attn_fm = (_xla_attention_fm
                       if os.environ.get("SDTPU_FM_XLA", "0") == "1"
                       else feature_major_attention)
            w = self.qkv_proj.kernel[...]                 # (H, 3A)
            bias = self.qkv_proj.bias[...]                # (3A,)
            qkv_t = jnp.einsum("bnh,ha->ban", x, w) + bias[None, :, None]
            q_t, k_t, v_t = jnp.split(qkv_t, 3, axis=1)   # (B, A, N) each
            fm = (b, self.n_heads, self.head_dim, n)
            out_t = attn_fm(
                q_t.reshape(fm), k_t.reshape(fm), v_t.reshape(fm),
                self.head_dim ** -0.5)
            out_t = out_t.reshape(b, self.n_heads * self.head_dim, n)
            wo = self.output_proj.kernel[...]             # (A, H)
            return (jnp.einsum("ban,ah->bnh", out_t, wo)
                    + self.output_proj.bias[...])

        qkv = self.qkv_proj(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        shape = (b, n, self.n_heads, self.head_dim)
        out = scaled_dot_product_attention(q.reshape(shape), k.reshape(shape),
                                           v.reshape(shape))
        return self.output_proj(out.reshape(b, n, -1))


class TransformerLayer(nnx.Module):
    """adaLN DiT block (reference: models/transformer_layer.py:6-106)."""

    def __init__(self, config: dict, *, cross_attn: bool = False,
                 context_dim: Optional[int] = None, rngs: nnx.Rngs, dtype=None):
        self.hidden_size = config["hidden_size"]
        self.cross_attn = cross_attn
        self.context_dim = context_dim
        ff_hidden_dim = 4 * self.hidden_size
        kw = dict(dtype=dtype, rngs=rngs)

        self.att_norm = nnx.LayerNorm(self.hidden_size, use_scale=False,
                                      use_bias=False, epsilon=1e-6, **kw)
        self.attn_block = Attention(config, **kw)
        self.ff_norm = nnx.LayerNorm(self.hidden_size, use_scale=False,
                                     use_bias=False, epsilon=1e-6, **kw)
        self.mlp_in = nnx.Linear(self.hidden_size, ff_hidden_dim,
                                 kernel_init=_xavier, bias_init=_zeros, **kw)
        self.mlp_out = nnx.Linear(ff_hidden_dim, self.hidden_size,
                                  kernel_init=_xavier, bias_init=_zeros, **kw)

        if cross_attn:
            assert context_dim is not None, \
                "Context dimension must be provided for cross attention"
            self.cross_attn_norm = nnx.LayerNorm(self.hidden_size,
                                                 use_scale=False,
                                                 use_bias=False,
                                                 epsilon=1e-6, **kw)
            self.cross_attn_block = MultiheadAttention(
                self.hidden_size, config["num_heads"], rngs=rngs, dtype=dtype)
            self.context_proj = nnx.Linear(context_dim, self.hidden_size,
                                           kernel_init=_xavier,
                                           bias_init=_zeros, **kw)

        # zero-init so each block starts as identity (transformer_layer.py:73-74)
        self.adaptive_norm_layer = nnx.Linear(
            self.hidden_size, 6 * self.hidden_size, kernel_init=_zeros,
            bias_init=_zeros, **kw)

    def _use_fused_layer(self, x: jax.Array) -> bool:
        import os

        # Opt-in only: whole-layer fusion runs per-SAMPLE GEMMs that starve
        # the MXU vs XLA's whole-batch GEMMs — measured 234 vs 350 fwd/s on
        # DiT-12L b32. Kept for small-batch/latency-bound serving where the
        # batch dim cannot amortize the weight loads.
        if os.environ.get("SDTPU_FUSED_LAYER", "0") != "1":
            return False
        if self.cross_attn or jax.default_backend() != "tpu":
            return False
        n = x.shape[1]
        attn = self.attn_block
        # whole-layer VMEM residency only pays while the (N, N) scores and
        # the weight set fit comfortably; production DiT is N=256, H=288
        return n <= 1024 and attn.head_dim <= 64 and self.hidden_size <= 1536

    def __call__(self, x: jax.Array, condition: jax.Array,
                 context: Optional[jax.Array] = None,
                 mods: Optional[jax.Array] = None) -> jax.Array:
        if mods is None:
            mods = self.adaptive_norm_layer(nnx.relu(condition))

        if self._use_fused_layer(x):
            from stablediffusion_pytorch_tpu.ops.pallas.dit_layer import (
                fused_dit_layer,
            )

            attn = self.attn_block
            return fused_dit_layer(
                x, mods,
                attn.qkv_proj.kernel[...], attn.qkv_proj.bias[...],
                attn.output_proj.kernel[...], attn.output_proj.bias[...],
                self.mlp_in.kernel[...], self.mlp_in.bias[...],
                self.mlp_out.kernel[...], self.mlp_out.bias[...],
                attn.head_dim)

        (pre_attn_shift, pre_attn_scale, post_attn_scale,
         pre_mlp_shift, pre_mlp_scale, post_mlp_scale) = jnp.split(mods, 6, axis=-1)

        out = x
        attn_in = (self.att_norm(out) * (1 + pre_attn_scale[:, None])
                   + pre_attn_shift[:, None])
        out = out + post_attn_scale[:, None] * self.attn_block(attn_in)

        if self.cross_attn and context is not None:
            ctx = self.context_proj(context)
            cross_in = self.cross_attn_norm(out)
            out = out + self.cross_attn_block(cross_in, ctx, ctx)

        mlp_in = (self.ff_norm(out) * (1 + pre_mlp_scale[:, None])
                  + pre_mlp_shift[:, None])
        mlp_out = self.mlp_out(nnx.relu(self.mlp_in(mlp_in)))
        return out + post_mlp_scale[:, None] * mlp_out


class DIT(nnx.Module):
    """DiT denoiser (reference: models/transformer.py:43-213)."""

    def __init__(self, im_channels: int, model_config: dict,
                 image_size: Optional[int] = None, *, rngs: nnx.Rngs,
                 dtype=None):
        self.im_channels = im_channels
        self.hidden_size = model_config["hidden_size"]
        self.patch_height = model_config["patch_size"]
        self.patch_width = model_config["patch_size"]
        self.timestep_emb_dim = model_config["timestep_emb_dim"]
        num_layers = model_config["num_layers"]
        # gradient checkpointing: recompute layer activations in backward
        self.remat = bool(model_config.get("gradient_checkpointing", False))
        # sequence parallelism: parallel/sp.py apply_sp sets this to a
        # NamedSharding; the residual stream is then constrained to it at
        # every layer boundary (tokens sharded over the TP axis)
        self.sp_constraint = None

        # ----- conditioning config (reference: transformer.py:59-97) -----
        self.class_cond = False
        self.text_cond = False
        self.image_cond = False
        self.text_embed_dim = None
        condition_config = get_config_value(model_config, "condition_config", None)
        if condition_config is not None:
            assert "condition_types" in condition_config, \
                "Condition Type not provided in model config"
            condition_types = condition_config["condition_types"]
            if "class" in condition_types:
                validate_class_config(condition_config)
                self.class_cond = True
                self.num_classes = condition_config["class_condition_config"]["num_classes"]
            if "text" in condition_types:
                validate_text_config(condition_config)
                self.text_cond = True
                self.text_embed_dim = condition_config["text_condition_config"]["text_embed_dim"]
            if "image" in condition_types:
                validate_image_config(condition_config)
                self.image_cond = True
                image_cfg = condition_config["image_condition_config"]
                self.im_cond_input_ch = image_cfg["image_condition_input_channels"]
                self.im_cond_output_ch = image_cfg["image_condition_output_channels"]
        self.cond = self.text_cond or self.image_cond or self.class_cond

        kw = dict(dtype=dtype, rngs=rngs)

        if self.class_cond:
            self.class_emb = nnx.Embed(self.num_classes, self.timestep_emb_dim,
                                       rngs=rngs)
        if self.image_cond:
            self.cond_conv_in = nnx.Conv(self.im_cond_input_ch,
                                         self.im_cond_output_ch,
                                         kernel_size=(1, 1), use_bias=False, **kw)
            patch_in_channels = im_channels + self.im_cond_output_ch
        else:
            patch_in_channels = im_channels

        self.patch_embed_layer = PatchEmbedding(
            patch_in_channels, self.patch_height, self.patch_width,
            self.hidden_size, **kw)

        # t-emb MLP with ReLU + std-0.02 init (transformer.py:107-112,144-145)
        self.t_proj_1 = nnx.Linear(self.timestep_emb_dim, self.hidden_size,
                                   kernel_init=_normal02, **kw)
        self.t_proj_2 = nnx.Linear(self.hidden_size, self.hidden_size,
                                   kernel_init=_normal02, **kw)

        layer_config = {
            "hidden_size": self.hidden_size,
            "num_heads": model_config["num_heads"],
            "head_dim": model_config["head_dim"],
        }
        self.transformer_layers = nnx.List([
            TransformerLayer(layer_config, cross_attn=self.text_cond,
                             context_dim=self.text_embed_dim if self.text_cond else None,
                             **kw)
            for _ in range(num_layers)
        ])

        self.norm = nnx.LayerNorm(self.hidden_size, use_scale=False,
                                  use_bias=False, epsilon=1e-6, **kw)
        self.adaptive_norm_layer = nnx.Linear(self.hidden_size,
                                              2 * self.hidden_size,
                                              kernel_init=_zeros,
                                              bias_init=_zeros, **kw)
        self.proj_out = nnx.Linear(
            self.hidden_size,
            self.patch_height * self.patch_width * im_channels,
            kernel_init=_zeros, bias_init=_zeros, **kw)

    def prepare(self, x: jax.Array, t: jax.Array,
                cond_input: Optional[dict] = None):
        """Prologue shared by __call__ and the pipeline-parallel driver
        (parallel/pp.py): image-cond concat + patchify + t-emb (+ class
        add) + text context. Returns ``(tokens, t_emb, context)``; the
        transformer stack then runs between prepare() and finalize()."""
        if self.cond:
            assert cond_input is not None, \
                "Model initialized with conditioning so cond_input cannot be None"

        patch_source = x
        if self.image_cond:
            validate_image_conditional_input(cond_input, x)
            from stablediffusion_pytorch_tpu.utils.diffusion_utils import (
                nearest_resize,
            )

            im_cond = cond_input["image"].astype(x.dtype)
            im_cond = nearest_resize(im_cond, x.shape[1], x.shape[2])
            im_cond = self.cond_conv_in(im_cond)
            patch_source = jnp.concatenate([patch_source, im_cond], axis=-1)

        out = self.patch_embed_layer(patch_source)

        t = jnp.atleast_1d(jnp.asarray(t))
        t_emb = get_time_embedding(t, self.timestep_emb_dim)

        if self.class_cond:
            validate_class_conditional_input(cond_input, x, self.num_classes)
            class_embed = cond_input["class"].astype(t_emb.dtype) @ \
                self.class_emb.embedding[...].astype(t_emb.dtype)
            t_emb = t_emb + class_embed

        t_emb = self.t_proj_2(nnx.relu(self.t_proj_1(t_emb)))

        context = None
        if self.text_cond:
            assert "text" in cond_input, \
                "Model initialized with text conditioning but cond_input has no text information"
            context = cond_input["text"].astype(out.dtype)
        return out, t_emb, context

    def finalize(self, out: jax.Array, t_emb: jax.Array,
                 x_shape, shift_scale=None) -> jax.Array:
        """Epilogue shared by __call__ and parallel/pp.py: final adaLN
        (recomputed from t_emb unless __call__'s batched-GEMM columns are
        passed in — identical math either way) + norm + proj + unpatchify."""
        if shift_scale is None:
            shift, scale = jnp.split(
                self.adaptive_norm_layer(nnx.relu(t_emb)), 2, axis=-1)
        else:
            shift, scale = shift_scale
        out = self.norm(out) * (1 + scale[:, None]) + shift[:, None]
        out = self.proj_out(out)

        b, h, w, _ = x_shape
        ph, pw = self.patch_height, self.patch_width
        nh, nw = h // ph, w // pw
        # b (nh nw) (ph pw c) -> b (nh ph) (nw pw) c
        out = out.reshape(b, nh, nw, ph, pw, self.im_channels)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, self.im_channels)
        return out

    def __call__(self, x: jax.Array, t: jax.Array,
                 cond_input: Optional[dict] = None) -> jax.Array:
        out, t_emb, context = self.prepare(x, t, cond_input)

        # every layer's adaLN modulation is a small GEMM on the SAME
        # relu(t_emb) — batch all of them (plus the final adaLN) into one
        # (B, H) x (H, (6L+2)H) GEMM instead of 13 tiny per-layer ops
        # (measured 0.12 ms/fwd of small-GEMM overhead at DiT-12L b32);
        # numerically identical: the concatenated GEMM computes the same
        # per-layer columns
        t_relu = nnx.relu(t_emb)
        layers = list(self.transformer_layers)
        norm_layers = [l.adaptive_norm_layer for l in layers] + \
            [self.adaptive_norm_layer]
        if all(hasattr(n, "kernel") for n in norm_layers):
            kernels = jnp.concatenate([n.kernel[...] for n in norm_layers],
                                      axis=1)
            biases = jnp.concatenate([n.bias[...] for n in norm_layers])
            mods_all = t_relu @ kernels + biases
            h6 = 6 * self.hidden_size
            fwd = _layer_fwd_remat if self.remat else _layer_fwd
            for i, layer in enumerate(layers):
                if self.sp_constraint is not None:
                    # sequence parallel: the residual stream lives
                    # token-sharded over the TP axis between layers
                    # (parallel/sp.py); numerically a no-op
                    out = jax.lax.with_sharding_constraint(
                        out, self.sp_constraint)
                out = fwd(layer, out, t_emb, context,
                          mods_all[:, i * h6:(i + 1) * h6])
            shift_scale = jnp.split(mods_all[:, len(layers) * h6:], 2,
                                    axis=-1)
        else:
            # analysis shims (ops_analyzer recorders) or module surgery can
            # replace the modulation Linear with a kernel-less callable —
            # fall back to per-layer modulation
            fwd = _layer_fwd_remat if self.remat else _layer_fwd
            for layer in layers:
                out = fwd(layer, out, t_emb, context, None)
            shift_scale = None
        return self.finalize(out, t_emb, x.shape, shift_scale=shift_scale)
