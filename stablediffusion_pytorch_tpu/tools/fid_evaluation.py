"""FID evaluation CLI.

Usage: ``python -m stablediffusion_pytorch_tpu.tools.fid_evaluation
--real-dir <dataset images> --fake-dir <generated pngs>
[--stats-cache real_stats.npz] [--limit N]``

Re-implements reference fid_evaluation.py:99-155: extract pooled features
at 299^2 from both sets, cache the real-set statistics to npz, print the
Frechet distance.
"""

from __future__ import annotations

import argparse
import logging
import os

import numpy as np
from PIL import Image

from stablediffusion_pytorch_tpu.analysis.fid import (
    compute_fid, default_extractor,
)

log = logging.getLogger("sdtpu")


def _image_iter(path: str, limit=None, size=None):
    files = sorted(f for f in os.listdir(path)
                   if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if limit:
        files = files[:limit]
    for f in files:
        with Image.open(os.path.join(path, f)) as im:
            im = im.convert("RGB")
            if size:
                im = im.resize((size, size), Image.BILINEAR)
            yield np.asarray(im, np.float32) / 255.0


def evaluate(args) -> float:
    import json

    from stablediffusion_pytorch_tpu.utils.provenance import (
        build_stamp, fid_extractor_stamp,
    )

    extractor = default_extractor(args.inception_weights)
    fid = compute_fid(
        _image_iter(args.real_dir, args.limit, args.image_size),
        _image_iter(args.fake_dir, args.limit, args.image_size),
        extractor=extractor, stats_cache=args.stats_cache,
        batch_size=args.batch_size)
    stamp = build_stamp(fid_extractor=extractor)
    comparable = fid_extractor_stamp(extractor) == "inception-v3"
    # a substituted extractor yields framework-INTERNAL numbers only —
    # the stamp makes that impossible to miss in logs or parsed output
    # legacy line first (reference fid_evaluation.py prints 'FID: x'; kept
    # for external consumers — ADVICE r2), then the structured record
    print(f"FID: {fid:.4f}")
    print(json.dumps({"fid": round(fid, 4), "provenance": stamp,
                      "reference_comparable": comparable}))
    return fid


def main():
    parser = argparse.ArgumentParser(description="FID evaluation")
    parser.add_argument("--real-dir", required=True)
    parser.add_argument("--fake-dir", required=True)
    parser.add_argument("--stats-cache", default=None)
    parser.add_argument("--inception-weights", default=None)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--batch-size", type=int, default=32)
    parser.add_argument("--limit", type=int, default=None)
    evaluate(parser.parse_args())


if __name__ == "__main__":
    main()
