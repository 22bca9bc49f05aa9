"""Torch-checkpoint converters: load reference .pth state_dicts into the
NHWC nnx models.

The migration layer covering the reference's checkpoint tools
(weight_convert.py:21-54 collapses per-group GroupedLinear params;
convert_attention_weights.py:5-51 splits fused nn.MultiheadAttention
in_proj into q/k/v) plus the cross-framework ports this build needs
(SURVEY.md §5 checkpoint: "PyTorch->JAX converters for LPIPS-VGG and CLIP",
extended to VQVAE/UNet/DiT so reference checkpoints can seed FID-parity
runs).

Layout rules (validated against CPU torch in tests/test_torch_parity.py):
  conv            torch (O, I, kh, kw)      -> HWIO (kh, kw, I, O)
  conv transpose  torch (I, O, kh, kw)      -> flax (kh, kw, O, I) with
                                               spatially flipped taps
                                               (transpose_kernel=True
                                               semantics)
  linear          torch (O, I)              -> (I, O)
  nn.MultiheadAttention in_proj (3E, E)     -> q/k/v kernels (E, E) each
  GroupNorm/LayerNorm weight/bias           -> scale/bias
  nn.Embedding    (N, D)                   -> embedding (N, D)
"""

from __future__ import annotations

import logging
from typing import Dict

import jax.numpy as jnp
import numpy as np
from flax import nnx

log = logging.getLogger("sdtpu")


def t2j_conv_kernel(w: np.ndarray) -> jnp.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return jnp.asarray(np.transpose(w, (2, 3, 1, 0)))


def t2j_conv_transpose_kernel(w: np.ndarray) -> jnp.ndarray:
    """torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose
    (kh, kw, I, O) with spatial flip (torch's convT cross-correlates with
    the flipped kernel relative to lax.conv_transpose)."""
    w = np.transpose(w, (2, 3, 0, 1))  # (kh, kw, I, O)
    return jnp.asarray(w[::-1, ::-1])


def t2j_linear_kernel(w: np.ndarray) -> jnp.ndarray:
    return jnp.asarray(np.transpose(w))


def load_conv(conv: nnx.Conv, state: Dict, prefix: str) -> None:
    conv.kernel.value = t2j_conv_kernel(np.asarray(state[prefix + ".weight"]))
    if conv.bias is not None and prefix + ".bias" in state:
        conv.bias.value = jnp.asarray(np.asarray(state[prefix + ".bias"]))


def load_conv_transpose(conv: nnx.ConvTranspose, state: Dict,
                        prefix: str) -> None:
    conv.kernel.value = t2j_conv_transpose_kernel(
        np.asarray(state[prefix + ".weight"]))
    if conv.bias is not None and prefix + ".bias" in state:
        conv.bias.value = jnp.asarray(np.asarray(state[prefix + ".bias"]))


def load_linear(linear: nnx.Linear, state: Dict, prefix: str) -> None:
    linear.kernel.value = t2j_linear_kernel(
        np.asarray(state[prefix + ".weight"]))
    if linear.bias is not None and prefix + ".bias" in state:
        linear.bias.value = jnp.asarray(np.asarray(state[prefix + ".bias"]))


def load_norm(norm, state: Dict, prefix: str) -> None:
    """GroupNorm / LayerNorm with affine params."""
    if prefix + ".weight" in state:
        norm.scale.value = jnp.asarray(np.asarray(state[prefix + ".weight"]))
    if prefix + ".bias" in state:
        norm.bias.value = jnp.asarray(np.asarray(state[prefix + ".bias"]))


def load_embedding(embed: nnx.Embed, state: Dict, prefix: str) -> None:
    embed.embedding.value = jnp.asarray(np.asarray(state[prefix + ".weight"]))


def load_torch_mha(mha, state: Dict, prefix: str) -> None:
    """nn.MultiheadAttention -> MultiheadAttention: split fused in_proj
    (reference migration: convert_attention_weights.py:5-51)."""
    if prefix + ".in_proj_weight" in state:
        w = np.asarray(state[prefix + ".in_proj_weight"])  # (3E, E)
        e = w.shape[1]
        qw, kw, vw = w[:e], w[e:2 * e], w[2 * e:]
        b = np.asarray(state.get(prefix + ".in_proj_bias",
                                 np.zeros(3 * e, w.dtype)))
        qb, kb, vb = b[:e], b[e:2 * e], b[2 * e:]
    else:  # already-split CustomMultiheadAttention checkpoint
        qw = np.asarray(state[prefix + ".q_proj.weight"])
        kw = np.asarray(state[prefix + ".k_proj.weight"])
        vw = np.asarray(state[prefix + ".v_proj.weight"])
        qb = np.asarray(state.get(prefix + ".q_proj.bias", 0))
        kb = np.asarray(state.get(prefix + ".k_proj.bias", 0))
        vb = np.asarray(state.get(prefix + ".v_proj.bias", 0))
    mha.q_proj.kernel.value = t2j_linear_kernel(qw)
    mha.k_proj.kernel.value = t2j_linear_kernel(kw)
    mha.v_proj.kernel.value = t2j_linear_kernel(vw)
    mha.q_proj.bias.value = jnp.asarray(qb)
    mha.k_proj.bias.value = jnp.asarray(kb)
    mha.v_proj.bias.value = jnp.asarray(vb)
    load_linear(mha.out_proj, state, prefix + ".out_proj")


# ---------------------------------------------------------------------------
# model-level converters
# ---------------------------------------------------------------------------

def _load_resnet(rb, state, p_first, p_second, p_res, p_temb=None):
    load_norm(rb.norm1, state, p_first + ".0")
    load_conv(rb.conv1, state, p_first + ".2")
    load_norm(rb.norm2, state, p_second + ".0")
    load_conv(rb.conv2, state, p_second + ".2")
    load_conv(rb.residual_conv, state, p_res)
    if p_temb and hasattr(rb, "t_emb_proj"):
        load_linear(rb.t_emb_proj, state, p_temb + ".1")


def _load_spatial_attn(attn, state, p_norm, p_mha):
    load_norm(attn.norm, state, p_norm)
    load_torch_mha(attn.attn, state, p_mha)


def _load_block(block, state, prefix, n_resnets, has_temb):
    for i, rb in enumerate(block.resnets):
        _load_resnet(rb, state,
                     f"{prefix}.resnet_conv_first.{i}",
                     f"{prefix}.resnet_conv_second.{i}",
                     f"{prefix}.residual_input_conv.{i}",
                     f"{prefix}.t_emb_layers.{i}" if has_temb else None)
    if getattr(block, "attn", True) and hasattr(block, "attentions"):
        for i, attn in enumerate(block.attentions):
            _load_spatial_attn(attn, state,
                               f"{prefix}.attention_norms.{i}",
                               f"{prefix}.attentions.{i}")
    if getattr(block, "cross_attn", False):
        for i, attn in enumerate(block.cross_attentions):
            load_norm(attn.norm, state, f"{prefix}.cross_attention_norms.{i}")
            load_torch_mha(attn.attn, state, f"{prefix}.cross_attentions.{i}")
            load_linear(attn.context_proj, state, f"{prefix}.context_proj.{i}")


def load_torch_vqvae(model, state: Dict) -> None:
    """Reference models/vqvae.py state_dict -> models.VQVAE."""
    state = {k: np.asarray(v) for k, v in state.items()}
    load_conv(model.encoder_conv_in, state, "encoder_conv_in")
    for i, blk in enumerate(model.encoder_layers):
        _load_block(blk, state, f"encoder_layers.{i}",
                    len(blk.resnets), has_temb=False)
        if blk.down_sample:
            load_conv(blk.down_sample_conv, state,
                      f"encoder_layers.{i}.down_sample_conv")
    for i, blk in enumerate(model.encoder_mids):
        _load_block(blk, state, f"encoder_mids.{i}", len(blk.resnets),
                    has_temb=False)
    load_norm(model.encoder_norm_out, state, "encoder_norm_out")
    load_conv(model.encoder_conv_out, state, "encoder_conv_out")
    load_conv(model.pre_quant_conv, state, "pre_quant_conv")
    load_embedding(model.embedding, state, "embedding")
    load_conv(model.post_quant_conv, state, "post_quant_conv")
    load_conv(model.decoder_conv_in, state, "decoder_conv_in")
    for i, blk in enumerate(model.decoder_mids):
        _load_block(blk, state, f"decoder_mids.{i}", len(blk.resnets),
                    has_temb=False)
    for i, blk in enumerate(model.decoder_layers):
        _load_block(blk, state, f"decoder_layers.{i}", len(blk.resnets),
                    has_temb=False)
        if blk.up_sample:
            load_conv_transpose(blk.up_sample_conv.conv, state,
                                f"decoder_layers.{i}.up_sample_conv")
    load_norm(model.decoder_norm_out, state, "decoder_norm_out")
    load_conv(model.decoder_conv_out, state, "decoder_conv_out")
    log.info("loaded torch VQVAE checkpoint (%d tensors)", len(state))


def load_torch_unet(model, state: Dict) -> None:
    """Reference models/unet_cond_base.py state_dict -> models.Unet."""
    state = {k: np.asarray(v) for k, v in state.items()}
    if model.image_cond:
        load_conv(model.cond_conv_in, state, "cond_conv_in")
        load_conv(model.conv_in_concat, state, "conv_in_concat")
    else:
        load_conv(model.conv_in, state, "conv_in")
    load_linear(model.t_proj_1, state, "t_proj.0")
    load_linear(model.t_proj_2, state, "t_proj.2")
    if model.class_cond:
        load_embedding(model.class_emb, state, "class_emb")
    for i, blk in enumerate(model.downs):
        _load_block(blk, state, f"downs.{i}", len(blk.resnets), True)
        if blk.down_sample:
            load_conv(blk.down_sample_conv, state,
                      f"downs.{i}.down_sample_conv")
    for i, blk in enumerate(model.mids):
        _load_block(blk, state, f"mids.{i}", len(blk.resnets), True)
    for i, blk in enumerate(model.ups):
        _load_block(blk, state, f"ups.{i}", len(blk.resnets), True)
        if blk.up_sample:
            load_conv_transpose(blk.up_sample_conv.conv, state,
                                f"ups.{i}.up_sample_conv")
    load_norm(model.norm_out, state, "norm_out")
    load_conv(model.conv_out, state, "conv_out")
    log.info("loaded torch UNet checkpoint (%d tensors)", len(state))


def load_torch_dit(model, state: Dict) -> None:
    """Reference models/transformer.py state_dict -> models.DIT."""
    state = {k: np.asarray(v) for k, v in state.items()}
    if model.image_cond:
        load_conv(model.cond_conv_in, state, "cond_conv_in")
    if model.class_cond:
        load_embedding(model.class_emb, state, "class_emb")
    load_linear(model.patch_embed_layer.patch_embed, state,
                "patch_embed_layer.patch_embed.0")
    load_linear(model.t_proj_1, state, "t_proj.0")
    load_linear(model.t_proj_2, state, "t_proj.2")
    for i, layer in enumerate(model.transformer_layers):
        p = f"transformer_layers.{i}"
        load_linear(layer.attn_block.qkv_proj, state,
                    f"{p}.attn_block.qkv_proj")
        load_linear(layer.attn_block.output_proj, state,
                    f"{p}.attn_block.output_proj.0")
        load_linear(layer.mlp_in, state, f"{p}.mlp_block.0")
        load_linear(layer.mlp_out, state, f"{p}.mlp_block.2")
        load_linear(layer.adaptive_norm_layer, state,
                    f"{p}.adaptive_norm_layer.1")
        if layer.cross_attn:
            load_torch_mha(layer.cross_attn_block, state,
                           f"{p}.cross_attn_block")
            load_linear(layer.context_proj, state, f"{p}.context_proj")
    load_linear(model.adaptive_norm_layer, state, "adaptive_norm_layer.1")
    load_linear(model.proj_out, state, "proj_out")
    log.info("loaded torch DiT checkpoint (%d tensors)", len(state))


def migrate_grouped_linear(state: Dict, prefix: str) -> jnp.ndarray:
    """Collapse per-group ``<prefix>.group_linears.N.weight`` params into
    the stacked (groups, in_g, out_g) tensor our GroupedLinear uses — the
    reference's checkpoint migration for its GroupedLinear fast path
    (weight_convert.py:21-54)."""
    idx = 0
    mats = []
    while f"{prefix}.group_linears.{idx}.weight" in state:
        w = np.asarray(state[f"{prefix}.group_linears.{idx}.weight"])
        mats.append(np.transpose(w))  # torch (out_g, in_g) -> (in_g, out_g)
        idx += 1
    if not mats:
        # already-stacked layout: torch GroupedLinear weight
        # (groups, out_g, in_g) -> (groups, in_g, out_g)
        w = np.asarray(state[f"{prefix}.weight"])
        return jnp.asarray(np.transpose(w, (0, 2, 1)))
    return jnp.asarray(np.stack(mats))


def load_torch_checkpoint(model, path: str) -> None:
    """Dispatch by model type; ``path`` is a torch .pth state_dict."""
    import torch

    from stablediffusion_pytorch_tpu.models import DIT, Unet, VQVAE

    state = torch.load(path, map_location="cpu", weights_only=True)
    state = {k.removeprefix("module."): v.numpy()
             for k, v in state.items()}  # DDP prefix normalization
    if isinstance(model, VQVAE):
        load_torch_vqvae(model, state)
    elif isinstance(model, Unet):
        load_torch_unet(model, state)
    elif isinstance(model, DIT):
        load_torch_dit(model, state)
    else:
        raise TypeError(f"no torch converter for {type(model).__name__}")
