"""Substitution-provenance stamps for run artifacts (VERDICT W6/#10).

Three reference components depend on pretrained weights that cannot be
downloaded in this zero-egress environment (HF CLIP text encoder,
torchvision VGG16 for LPIPS, InceptionV3 pool3 for FID). Each has an
honest in-framework substitute (hash tokenizer / random VGG features /
random-conv extractor) — but a number produced with a substitute must
never masquerade as reference-comparable. Every FID report, sample-grid
sidecar, and config snapshot therefore embeds the stamp built here, e.g.::

    {"text_encoder": "hash-fallback", "fid_extractor": "random-conv",
     "lpips": "random-features"}

Reference protocol being stamped: fid_evaluation.py:99-107 (InceptionV3
pool3), models/lpips.py:95-101 (vgg.pth), utils/text_utils.py:5-33
(CLIPTokenizer/CLIPTextModel).
"""

from __future__ import annotations

import json
import os
from typing import Optional


def text_stack_stamp(tokenizer=None, text_model=None) -> str:
    """'clip-bpe+pretrained' | 'clip-bpe+random-init' | 'hash-fallback'."""
    kind = getattr(tokenizer, "kind", None)
    if kind in (None, "hash-fallback"):
        return "hash-fallback"
    enc = "pretrained" if getattr(text_model, "pretrained", False) \
        else "random-init"
    return f"{kind}+{enc}"


def fid_extractor_stamp(extractor) -> str:
    """'inception-v3' for the torch pool3 extractor, else 'random-conv'."""
    name = type(extractor).__name__ if extractor is not None else ""
    return "inception-v3" if "Inception" in name else "random-conv"


def lpips_stamp(lpips_model=None) -> str:
    if lpips_model is None:
        return "absent"
    return ("vgg16-pretrained" if getattr(lpips_model, "_pretrained", False)
            else "random-features")


def build_stamp(*, tokenizer=None, text_model=None, fid_extractor=None,
                lpips_model=None, extra: Optional[dict] = None) -> dict:
    stamp = {
        "text_encoder": text_stack_stamp(tokenizer, text_model),
        "fid_extractor": fid_extractor_stamp(fid_extractor),
        "lpips": lpips_stamp(lpips_model),
    }
    if extra:
        stamp.update(extra)
    return stamp


def write_sidecar(artifact_path: str, stamp: dict, **fields) -> str:
    """Write ``<artifact>.provenance.json`` next to a generated artifact so
    downstream consumers (and the reference-parity judge) can tell which
    encoder substitutions produced it."""
    payload = {"provenance": stamp, **fields}
    path = artifact_path + ".provenance.json"
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, indent=2, sort_keys=True)
    return path
