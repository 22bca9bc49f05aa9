"""Run-directory housekeeping: checkpoint cleanup and loss-CSV merging.

Usage:
  ``python -m stablediffusion_pytorch_tpu.tools.housekeeping
  delete-checkpoints --root runs [--keep-latest] [--apply]``
  ``python -m stablediffusion_pytorch_tpu.tools.housekeeping
  concat-csv --root runs/<run> --out global_losses.csv [--plot out.png]``

Re-implements the reference housekeeping scripts: runs_*/
delete_checkpoints.py (dry-run rm of checkpoint dirs) and
runs_*/.../concate_csv.py (496 LoC: merge per-noise-stage loss CSVs into a
global loss-vs-step plot with stage boundary markers).
"""

from __future__ import annotations

import argparse
import csv
import logging
import os
import shutil

log = logging.getLogger("sdtpu")


def find_checkpoint_dirs(root: str):
    hits = []
    for dirpath, dirnames, _ in os.walk(root):
        for d in dirnames:
            if d == "checkpoints" or d.startswith(("epoch_", "ema_epoch_")):
                hits.append(os.path.join(dirpath, d))
    return sorted(hits)


def delete_checkpoints(root: str, keep_latest: bool = True,
                       apply: bool = False):
    """Dry-run by default (the reference's delete_checkpoints behavior)."""
    targets = []
    for path in find_checkpoint_dirs(root):
        if keep_latest and "latest" in os.path.basename(path):
            continue
        targets.append(path)
    for t in targets:
        if apply:
            shutil.rmtree(t, ignore_errors=True)
            log.info("deleted %s", t)
        else:
            log.info("[dry-run] would delete %s", t)
    return targets


def concat_csv(root: str, out: str, plot: str | None = None):
    """Merge every losses.csv under root (sorted by path = stage order) into
    one global CSV; optional plot with stage-boundary markers."""
    stage_rows = []
    for dirpath, _, files in sorted(os.walk(root)):
        if "losses.csv" in files:
            with open(os.path.join(dirpath, "losses.csv")) as f:
                rows = [float(r["loss"]) for r in csv.DictReader(f)]
            stage_rows.append((os.path.relpath(dirpath, root), rows))
    merged, boundaries = [], []
    with open(out, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["global_step", "loss", "stage"])
        step = 0
        for stage, rows in stage_rows:
            for v in rows:
                w.writerow([step, v, stage])
                merged.append(v)
                step += 1
            boundaries.append(step)
    log.info("merged %d stages, %d steps -> %s", len(stage_rows),
             len(merged), out)
    if plot and merged:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(9, 4))
        ax.plot(merged, lw=0.7)
        for b in boundaries[:-1]:
            ax.axvline(b, color="red", lw=0.8, ls="--")
        ax.set_xlabel("global step")
        ax.set_ylabel("loss")
        ax.set_title("loss across stages")
        fig.tight_layout()
        fig.savefig(plot, dpi=100)
        plt.close(fig)
        log.info("wrote %s", plot)
    return stage_rows


def main():
    parser = argparse.ArgumentParser(description="Run housekeeping")
    sub = parser.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("delete-checkpoints")
    d.add_argument("--root", required=True)
    d.add_argument("--keep-latest", action="store_true", default=True)
    d.add_argument("--apply", action="store_true")
    c = sub.add_parser("concat-csv")
    c.add_argument("--root", required=True)
    c.add_argument("--out", default="global_losses.csv")
    c.add_argument("--plot", default=None)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)
    if args.cmd == "delete-checkpoints":
        delete_checkpoints(args.root, args.keep_latest, args.apply)
    else:
        concat_csv(args.root, args.out, args.plot)


if __name__ == "__main__":
    main()
