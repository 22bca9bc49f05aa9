"""FID comparison plot across denoiser families and noise regimes.

Usage: ``python -m stablediffusion_pytorch_tpu.tools.plot_fid_comparison
[--out fid_comparison.png] [--extra name=ideal,noisy ...]``

Re-implements reference plot_fid_comparison.py:1-60. The reference's
published CelebHQ-256 FID numbers (its only quantitative results,
plot_fid_comparison.py:5-9 / BASELINE.md) ship as the default series;
``--extra`` appends this framework's measured numbers for side-by-side
comparison.
"""

from __future__ import annotations

import argparse

# reference-published results (plot_fid_comparison.py:8-9, BASELINE.md)
REFERENCE_FID = {
    "UNet": {"ideal": 14.7716, "noisy": 16.0348},
    "DiT-9L": {"ideal": 12.6431, "noisy": 12.4391},
    "DiT-12L": {"ideal": 11.7593, "noisy": 11.9823},
}


def plot(series: dict, out_path: str, ylabel: str | None = None) -> None:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    names = list(series)
    ideal = [series[n]["ideal"] for n in names]
    noisy = [series[n].get("noisy") for n in names]
    x = np.arange(len(names))
    width = 0.38

    fig, ax = plt.subplots(figsize=(7, 4))
    ax.bar(x - width / 2, ideal, width, label="ideal (FP / no analog noise)")
    if any(v is not None for v in noisy):
        ax.bar(x + width / 2, [v or 0 for v in noisy], width,
               label="with CIM noise")
    for xi, v in zip(x - width / 2, ideal):
        ax.text(xi, v, f"{v:.2f}", ha="center", va="bottom", fontsize=8)
    for xi, v in zip(x + width / 2, noisy):
        if v is not None:
            ax.text(xi, v, f"{v:.2f}", ha="center", va="bottom", fontsize=8)
    ax.set_xticks(x)
    ax.set_xticklabels(names)
    ax.set_ylabel(ylabel or "FID (CelebHQ-256)")
    ax.set_title("FID comparison: denoiser families / noise regimes")
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    print(f"wrote {out_path}")


def main():
    parser = argparse.ArgumentParser(description="FID comparison plot")
    parser.add_argument("--out", default="fid_comparison.png")
    parser.add_argument("--extra", nargs="*", default=[],
                        help="name=ideal[,noisy] additional series")
    parser.add_argument("--no-reference", action="store_true",
                        help="plot only --extra series (framework-FID is a "
                        "different extractor scale than the reference's "
                        "InceptionV3 numbers)")
    parser.add_argument("--ylabel", default=None,
                        help="override the y-axis label")
    args = parser.parse_args()
    series = ({} if args.no_reference
              else {k: dict(v) for k, v in REFERENCE_FID.items()})
    for spec in args.extra:
        name, vals = spec.split("=")
        parts = [float(v) for v in vals.split(",")]
        series[name] = {"ideal": parts[0]}
        if len(parts) > 1:
            series[name]["noisy"] = parts[1]
    if not series:
        parser.error("--no-reference requires at least one --extra series")
    plot(series, args.out, ylabel=args.ylabel)


if __name__ == "__main__":
    main()
