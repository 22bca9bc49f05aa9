"""Plot the full progressive-QAT trajectory (LSQ -> AnDi -> ADDA) from
qat_trajectory.csv: per-cycle mean loss with bit-width/noise-scale annealing
overlays — the committed visual evidence that quantized training tracks the
schedule (reference analogue: the per-stage loss curves of
Model_DiT_9L_train.py's 50-cycle pipeline).

Usage: python tools_qat_figure_r5.py [run_dir]
Writes <run_dir>/qat_trajectory.png + a stage-summary JSON line to stdout.
Idempotent one-shot evidence script; not part of the package API."""
import csv
import glob
import json
import os
import sys

ROOT = sys.argv[1] if len(sys.argv) > 1 else None
if ROOT is None:
    cands = sorted(glob.glob(
        "runs_evidence_r5/qat_full/full*/ddpm_*/mnist/qat_trajectory.csv"),
        key=os.path.getmtime)
    assert cands, "no qat_trajectory.csv found"
    ROOT = os.path.dirname(cands[-1])

rows = list(csv.DictReader(open(os.path.join(ROOT, "qat_trajectory.csv"))))
stages = []
for r in rows:
    if not stages or stages[-1]["stage"] != r["stage"]:
        stages.append(dict(stage=r["stage"], cycles=0, first_loss=None,
                           last_loss=None))
    s = stages[-1]
    s["cycles"] += 1
    loss = float(r["mean_loss"])
    s["first_loss"] = s["first_loss"] if s["first_loss"] is not None else loss
    s["last_loss"] = loss
print(json.dumps(dict(run=ROOT, stages=stages)))

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7.2, 4.4), dpi=130)
    ax2 = ax.twinx()
    x = list(range(len(rows)))
    loss = [float(r["mean_loss"]) for r in rows]
    noise = [float(r["noise_scale"]) for r in rows]
    wbit = [int(r["weight_bit"]) for r in rows]
    ax.plot(x, loss, color="#4269d0", lw=1.6, label="mean loss / cycle")
    ax2.plot(x, noise, color="#ff725c", lw=1.2, ls="--",
             label="noise_scale (annealed, zero-retrace)")
    ax2.plot(x, [b / 80 for b in wbit], color="#efb118", lw=1.2, ls=":",
             label="weight_bit / 80")
    # stage boundaries
    i = 0
    for s in stages:
        i += s["cycles"]
        ax.axvline(i - 0.5, color="gray", alpha=0.4, lw=0.8)
    pos = 0
    for s in stages:
        ax.text(pos + s["cycles"] / 2, ax.get_ylim()[1] * 0.95, s["stage"],
                ha="center", fontsize=8, color="gray")
        pos += s["cycles"]
    ax.set_xlabel("progressive cycle (all stages)")
    ax.set_ylabel("mean train loss")
    ax2.set_ylabel("annealed knobs")
    h1, l1 = ax.get_legend_handles_labels()
    h2, l2 = ax2.get_legend_handles_labels()
    ax.legend(h1 + h2, l1 + l2, fontsize=7, loc="center right")
    ax.set_title("Progressive QAT: LSQ→AnDi→ADDA full schedule (round 5)")
    fig.tight_layout()
    out = os.path.join(ROOT, "qat_trajectory.png")
    fig.savefig(out)
    print("wrote", out)
except Exception as e:
    print("figure skipped:", e)
