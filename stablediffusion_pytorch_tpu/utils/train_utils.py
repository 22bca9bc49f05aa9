"""Run artifacts: run directories, file+console logging, config snapshots,
loss history CSV + plots.

Re-implements reference utils/train_utils.py (SURVEY.md §2.4):
  * create_run_artifacts -> runs_root/ddpm_<timestamp>/<task>/{checkpoints,
    logs} + logger (reference: train_utils.py:24-58)
  * save_config_snapshot_json — serialize the whole config (61-111)
  * persist_loss_history — losses.csv + EMA-smoothed loss_curve.png (114-145)
  * plot_epoch_loss_curve — per-epoch step plots (147-177)
"""

from __future__ import annotations

import csv
import json
import logging
import os
import time
from typing import Dict, List, Optional, Sequence


def create_run_artifacts(runs_root: str, task_name: str,
                         run_id: Optional[str] = None) -> Dict[str, str]:
    """Create the run directory tree and attach a file+console logger.
    Returns {'run_dir', 'ckpt_dir', 'log_dir'}."""
    run_id = run_id or time.strftime("ddpm_%Y%m%d-%H%M%S")
    run_dir = os.path.join(runs_root, run_id, task_name)
    ckpt_dir = os.path.join(run_dir, "checkpoints")
    log_dir = os.path.join(run_dir, "logs")
    os.makedirs(ckpt_dir, exist_ok=True)
    os.makedirs(log_dir, exist_ok=True)

    logger = logging.getLogger("sdtpu")
    logger.setLevel(logging.INFO)
    if not any(isinstance(h, logging.FileHandler) and
               getattr(h, "_sdtpu_run", None) == run_dir
               for h in logger.handlers):
        fh = logging.FileHandler(os.path.join(log_dir, "train.log"))
        fh._sdtpu_run = run_dir
        fh.setFormatter(logging.Formatter(
            "%(asctime)s %(levelname)s %(message)s"))
        logger.addHandler(fh)
        if not any(isinstance(h, logging.StreamHandler) and not
                   isinstance(h, logging.FileHandler)
                   for h in logger.handlers):
            logger.addHandler(logging.StreamHandler())
    return {"run_dir": run_dir, "ckpt_dir": ckpt_dir, "log_dir": log_dir}


def save_config_snapshot_json(run_dir: str, config, **stamp_kwargs) -> str:
    """Serialize every JSON-able entry of the config into
    config_snapshot.json (reference: train_utils.py:61-111), plus a
    substitution-provenance stamp (which text/FID/LPIPS stacks are real vs
    fallback — VERDICT W6). Pass tokenizer=/text_model=/lpips_model= via
    ``stamp_kwargs`` when the trainer holds them."""
    from stablediffusion_pytorch_tpu.utils.provenance import build_stamp

    def _clean(obj):
        if isinstance(obj, dict):
            return {str(k): _clean(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [_clean(v) for v in obj]
        if isinstance(obj, (str, int, float, bool)) or obj is None:
            return obj
        return repr(obj)

    snapshot = _clean(dict(config))
    snapshot["provenance"] = build_stamp(**stamp_kwargs)
    path = os.path.join(run_dir, "config_snapshot.json")
    with open(path, "w") as f:
        json.dump(snapshot, f, indent=2)
    return path


def _ema_smooth(values: Sequence[float], alpha: float = 0.9) -> List[float]:
    out, acc = [], None
    for v in values:
        acc = v if acc is None else alpha * acc + (1 - alpha) * v
        out.append(acc)
    return out


def persist_loss_history(run_dir: str, losses: Sequence[float],
                         epoch_boundaries: Optional[Sequence[int]] = None
                         ) -> None:
    """losses.csv + EMA-smoothed loss_curve.png
    (reference: train_utils.py:114-145)."""
    csv_path = os.path.join(run_dir, "losses.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["step", "loss"])
        for i, v in enumerate(losses):
            w.writerow([i, v])
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 4))
        ax.plot(losses, alpha=0.3, label="loss")
        ax.plot(_ema_smooth(losses), label="EMA")
        if epoch_boundaries:
            for b in epoch_boundaries:
                ax.axvline(b, color="gray", lw=0.5, ls="--")
        ax.set_xlabel("step")
        ax.set_ylabel("loss")
        ax.legend()
        fig.tight_layout()
        fig.savefig(os.path.join(run_dir, "loss_curve.png"), dpi=100)
        plt.close(fig)
    except Exception as e:  # plotting is best-effort
        logging.getLogger("sdtpu").warning("loss plot failed: %s", e)


def plot_epoch_loss_curve(run_dir: str, epoch: int,
                          losses: Sequence[float]) -> None:
    """Per-epoch step plot (reference: train_utils.py:147-177)."""
    try:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        os.makedirs(os.path.join(run_dir, "epoch_plots"), exist_ok=True)
        fig, ax = plt.subplots(figsize=(6, 3))
        ax.plot(losses)
        ax.set_title(f"epoch {epoch}")
        fig.tight_layout()
        fig.savefig(os.path.join(run_dir, "epoch_plots",
                                 f"epoch_{epoch:03d}.png"), dpi=80)
        plt.close(fig)
    except Exception as e:
        logging.getLogger("sdtpu").warning("epoch plot failed: %s", e)
