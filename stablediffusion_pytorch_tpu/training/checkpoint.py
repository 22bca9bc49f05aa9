"""Orbax checkpointing of nnx module state (+ EMA variants, resume).

TPU-native replacement for the reference's torch.save/load checkpoint layer
(SURVEY.md §5 checkpoint/resume): per save-interval the reference writes
latest + epoch_NNN + ema_ state_dicts
(train_ddpm_cond_celebhq_multi_gpu.py:404-429) and normalizes DDP 'module.'
prefixes on load (cim_qn_train/progressive_qn_train.py:1377-1435) — prefix
games don't exist here because params are a pytree, not a flat name map.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp
from flax import nnx


def _ckptr() -> ocp.PyTreeCheckpointer:
    return ocp.PyTreeCheckpointer()


def save_state(path: str, state: Any) -> None:
    """Save a params/state pytree to ``path`` (overwrites).

    Crash-safe replace: orbax's ``force=True`` deletes the existing
    directory *before* writing the new one, so a kill mid-save destroys
    the previous checkpoint too (this lost a 'latest' checkpoint during
    the round-3 256^2 evidence run). Write to a ``.tmp`` sibling, then
    swap via two renames — the old checkpoint survives any crash except
    in the microseconds between the renames, and even then it remains on
    disk under ``.old``.
    """
    import shutil

    path = os.path.abspath(path)
    tmp, old = path + ".tmp", path + ".old"
    for leftover in (tmp, old):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)
    _ckptr().save(tmp, jax.tree.map(lambda x: x, state), force=True)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def load_state(path: str, like: Any) -> Any:
    """Restore a pytree with the structure of ``like``.

    Leaves come back as host numpy arrays (topology-independent — a
    checkpoint written on TPU restores on the CPU mesh and vice versa);
    device placement happens when the caller puts them into a module/jit.
    """
    import numpy as np

    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), like)
    return _ckptr().restore(os.path.abspath(path), item=like,
                            restore_args=restore_args)


def save_model(path: str, model: nnx.Module) -> None:
    save_state(path, nnx.state(model))


def load_model(path: str, model: nnx.Module) -> None:
    """In-place restore of a module's state from ``path``."""
    restored = load_state(path, nnx.state(model))
    nnx.update(model, restored)


def save_train_checkpoint(ckpt_dir: str, name: str, epoch: int,
                          model: nnx.Module,
                          ema_params: Optional[Any] = None) -> None:
    """latest + epoch_NNN + ema_ variants, like the reference
    (multi_gpu.py:404-429)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    save_model(os.path.join(ckpt_dir, f"{name}_latest"), model)
    save_model(os.path.join(ckpt_dir, f"epoch_{epoch:03d}_{name}"), model)
    if ema_params is not None:
        save_state(os.path.join(ckpt_dir, f"ema_{name}_latest"), ema_params)
        save_state(os.path.join(ckpt_dir, f"ema_epoch_{epoch:03d}_{name}"),
                   ema_params)


def infer_epoch_from_filename(path: str) -> Optional[int]:
    """'epoch_012_foo' -> 12 (reference: train_vqvae_celebhq.py:360-383)."""
    m = re.search(r"epoch_(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else None
