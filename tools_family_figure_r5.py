"""Regenerate the three-family FID-vs-epoch figure from the committed
round-5 evidence logs (VERDICT r4 #2: 'the figure regenerated per pass').

Scrapes runs_evidence_r5/family/<cfg>_fid_eNNN_sSEED.log for scored points,
aggregates mean +/- seed-std per (arm, epoch), writes
  runs_evidence_r5/family/fid_vs_epoch.json   (data + provenance)
  runs_evidence_r5/family/fid_vs_epoch.png    (figure)
Idempotent one-shot evidence script; not part of the package API.

Reference analogue: plot_fid_comparison.py:5-9 (UNet 14.77 / DiT-9L 12.64 /
DiT-12L 11.76 after ~200-epoch training) — NOT numerically comparable here
(framework random-conv extractor, reference_comparable: false).
"""
import glob
import json
import os
import re

import numpy as np

R = "runs_evidence_r5/family"
ARMS = {
    "synthface256_10k_text_image_cond": "UNet",
    "synthface256_dit9_10k": "DiT-9L",
    "synthface256_dit12_10k": "DiT-12L",
}

points = {}  # (arm, epoch) -> [fid, ...]
for path in sorted(glob.glob(os.path.join(R, "*_fid_e*_s*.log"))):
    m = re.match(r"(.+)_fid_e(\d+)_s(\d+)\.log$", os.path.basename(path))
    if not m or m.group(1) not in ARMS:
        continue
    txt = open(path).read()
    fm = re.search(r'\{"fid": ([0-9.]+)', txt)
    if not fm:
        continue
    points.setdefault((m.group(1), int(m.group(2))), []).append(
        float(fm.group(1)))

series = {}
for (arm, ep), vals in sorted(points.items()):
    series.setdefault(arm, []).append(
        dict(epoch=ep, n_seeds=len(vals), fid_mean=round(float(np.mean(vals)), 4),
             fid_std=round(float(np.std(vals)), 4), fids=vals))

out = dict(series=series,
           protocol=dict(images_per_set=256, ddim_steps=50, cfg=2.0,
                         extractor="random-conv (framework-internal)",
                         reference_comparable=False),
           reference_headline={"UNet": 14.77, "DiT-9L": 12.64,
                               "DiT-12L": 11.76,
                               "note": "plot_fid_comparison.py:5-9, ~200 ep; "
                                       "different extractor - ordering only"})
with open(os.path.join(R, "fid_vs_epoch.json"), "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps({k: [(p["epoch"], p["fid_mean"], p["n_seeds"]) for p in v]
                  for k, v in series.items()}))

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(6.4, 4.2), dpi=130)
    colors = {"UNet": "#4269d0", "DiT-9L": "#efb118", "DiT-12L": "#ff725c"}
    for cfg, label in ARMS.items():
        pts = series.get(cfg, [])
        if not pts:
            continue
        eps = [p["epoch"] for p in pts]
        mu = [p["fid_mean"] for p in pts]
        sd = [p["fid_std"] for p in pts]
        ax.errorbar(eps, mu, yerr=sd, marker="o", capsize=3,
                    label=label, color=colors[label])
    ax.set_xlabel("epoch (matched across arms)")
    ax.set_ylabel("framework-FID (256 imgs, mean ± seed std)")
    ax.set_title("Three-family comparison, 10k faces @256²\n"
                 "(framework extractor — ordering evidence only)")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(R, "fid_vs_epoch.png"))
    print("wrote", os.path.join(R, "fid_vs_epoch.png"))
except Exception as e:  # matplotlib may be absent; JSON is the artifact
    print("figure skipped:", e)
