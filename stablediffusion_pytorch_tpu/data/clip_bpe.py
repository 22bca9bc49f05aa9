"""CLIP byte-level BPE tokenizer (native implementation, no network).

Re-implements the tokenization contract of HF ``CLIPTokenizer`` as used by
the reference (utils/text_utils.py:12, 24-33: ``CLIPTokenizer.from_pretrained
(local dir)`` then ``tokenizer(text, truncation=True, padding='max_length',
max_length=77)``). The algorithm is the standard openai/CLIP byte-pair
encoding:

  1. clean text (html unescape, whitespace collapse, lowercase),
  2. split with the CLIP regex (contractions / letter runs / single digits /
     punctuation clusters),
  3. byte-encode each piece with the GPT-2 byte<->unicode table,
  4. greedily merge the lowest-rank pair per ``merges.txt`` with the CLIP
     ``</w>`` end-of-word marker,
  5. map merged symbols through ``vocab.json``.

Vocabulary and merge table are DATA, not code — they ship with any CLIP
checkpoint directory (``vocab.json`` + ``merges.txt``). This module loads
them from a local path; there is no downloading. Note: the reference's HF
stack additionally runs ftfy mojibake fixing when installed; that only
affects malformed unicode input and is out of scope here (plain-text prompts
tokenize identically).
"""

from __future__ import annotations

import functools
import html
import json
import logging
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

log = logging.getLogger(__name__)

try:  # `regex` supports \p{L}/\p{N}; stdlib `re` does not
    import regex as _re

    _PAT = _re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
        r"[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
        _re.IGNORECASE,
    )
except ImportError:  # pragma: no cover - regex is in the image
    import re as _re

    _PAT = _re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"
        r"[^\W\d_]+|\d|[^\s\w]+",
        _re.IGNORECASE | _re.UNICODE,
    )

_WS = __import__("re").compile(r"\s+")


@functools.lru_cache()
def bytes_to_unicode() -> Dict[int, str]:
    """GPT-2 reversible byte -> printable-unicode table: printable latin-1
    bytes map to themselves, the rest to codepoints 256+."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _get_pairs(word: Tuple[str, ...]):
    return {(a, b) for a, b in zip(word, word[1:])}


def clean_text(text: str) -> str:
    """CLIP's whitespace_clean(basic_clean(text)).lower() minus ftfy."""
    text = html.unescape(html.unescape(text))
    return _WS.sub(" ", text).strip().lower()


class ClipBpeTokenizer:
    """Byte-level BPE with CLIP's ``</w>`` end-of-word convention.

    ``vocab``: token string -> id. ``merges``: ordered (first, second) pairs,
    highest priority first. Special ids follow CLIP: BOS ``<|startoftext|>``,
    EOS = PAD ``<|endoftext|>``.
    """

    kind = "clip-bpe"

    def __init__(self, vocab: Dict[str, int],
                 merges: Sequence[Tuple[str, str]],
                 max_len: int = 77):
        self.vocab = dict(vocab)
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.max_len = max_len
        self.byte_encoder = bytes_to_unicode()
        self.bos_id = self.vocab.get("<|startoftext|>")
        self.eos_id = self.vocab.get("<|endoftext|>")
        if self.bos_id is None or self.eos_id is None:
            raise ValueError("vocab must define <|startoftext|>/<|endoftext|>")
        self.pad_id = self.eos_id  # HF CLIPTokenizer: pad_token == eos_token
        self._cache: Dict[str, List[str]] = {}

    # -- construction -----------------------------------------------------
    @classmethod
    def from_files(cls, vocab_json: str, merges_txt: str,
                   max_len: int = 77) -> "ClipBpeTokenizer":
        with open(vocab_json, encoding="utf-8") as f:
            vocab = json.load(f)
        with open(merges_txt, encoding="utf-8") as f:
            lines = f.read().split("\n")
        merges = []
        for line in lines:
            line = line.strip()
            if not line or line.startswith("#version"):
                continue
            parts = tuple(line.split())
            if len(parts) == 2:
                merges.append(parts)
        return cls(vocab, merges, max_len=max_len)

    @classmethod
    def from_pretrained(cls, directory: str,
                        max_len: int = 77) -> "ClipBpeTokenizer":
        return cls.from_files(os.path.join(directory, "vocab.json"),
                              os.path.join(directory, "merges.txt"),
                              max_len=max_len)

    # -- BPE core ----------------------------------------------------------
    def _bpe(self, token: str) -> List[str]:
        cached = self._cache.get(token)
        if cached is not None:
            return cached
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            self._cache[token] = [word[0]]
            return [word[0]]
        pairs = _get_pairs(word)
        while True:
            best = min(pairs, key=lambda p: self.ranks.get(p, float("inf")))
            if best not in self.ranks:
                break
            first, second = best
            merged: List[str] = []
            i = 0
            while i < len(word):
                if (word[i] == first and i < len(word) - 1
                        and word[i + 1] == second):
                    merged.append(first + second)
                    i += 2
                else:
                    merged.append(word[i])
                    i += 1
            word = tuple(merged)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = list(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        """Text -> BPE ids, no special tokens, no padding."""
        ids: List[int] = []
        unk = self.eos_id
        for piece in _PAT.findall(clean_text(text)):
            encoded = "".join(self.byte_encoder[b]
                              for b in piece.encode("utf-8"))
            ids.extend(self.vocab.get(sym, unk) for sym in self._bpe(encoded))
        return ids

    def decode(self, ids: Sequence[int]) -> str:
        inv_vocab = {v: k for k, v in self.vocab.items()}
        inv_bytes = {v: k for k, v in self.byte_encoder.items()}
        text = "".join(inv_vocab.get(int(i), "") for i in ids
                       if int(i) not in (self.bos_id, self.eos_id))
        text = text.replace("</w>", self.byte_encoder[ord(" ")])
        raw = bytes(inv_bytes[c] for c in text)
        return raw.decode("utf-8", errors="replace").strip()

    # -- batch API (reference padding semantics) ----------------------------
    def __call__(self, texts: Sequence[str], return_mask: bool = False):
        """Pad/truncate to max_len with BOS/EOS, PAD=EOS — matching the
        reference's tokenizer(text, truncation=True, padding='max_length',
        max_length=77) call (utils/text_utils.py:24-33)."""
        ids = np.full((len(texts), self.max_len), self.pad_id, np.int32)
        mask = np.zeros((len(texts), self.max_len), np.int32)
        for i, t in enumerate(texts):
            body = self.encode(t)[: self.max_len - 2]
            row = [self.bos_id] + body + [self.eos_id]
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        if return_mask:
            return ids, mask
        return ids


def find_clip_vocab(paths: Sequence[str] = ()) -> str | None:
    """Locate a CLIP vocab directory (vocab.json + merges.txt): explicit
    candidates, then $SDTPU_CLIP_TOKENIZER, then the reference's default
    layout ``models/clip-vit-b16`` under cwd."""
    candidates = list(paths)
    env = os.environ.get("SDTPU_CLIP_TOKENIZER")
    if env:
        candidates.append(env)
    candidates.append(os.path.join("models", "clip-vit-b16"))
    for c in candidates:
        if (c and os.path.isfile(os.path.join(c, "vocab.json"))
                and os.path.isfile(os.path.join(c, "merges.txt"))):
            return c
    return None
