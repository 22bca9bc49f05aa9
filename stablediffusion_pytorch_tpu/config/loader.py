"""YAML config loading with attribute access and preset resolution.

Same section names and keys as the reference YAMLs
(config/celebhq.yaml, config/celebhq_text_image_cond.yaml); entry points take
``--config <path-or-preset-name>`` exactly like the reference's argparse
contract (tools/train_vqvae.py:199-204).
"""

from __future__ import annotations

import os
from typing import Any, Mapping

import yaml

_PRESET_DIR = os.path.join(os.path.dirname(__file__), "presets")


class Config(dict):
    """dict with attribute access; nested dicts wrapped on the fly."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return Config(v) if isinstance(v, Mapping) and not isinstance(v, Config) else v

    def get_section(self, name: str, default=None):
        v = self.get(name, default)
        return Config(v) if isinstance(v, Mapping) else v


def available_presets() -> list[str]:
    return sorted(
        f[:-5] for f in os.listdir(_PRESET_DIR) if f.endswith(".yaml")
    )


def load_config(path_or_name: str) -> Config:
    """Load a YAML config from a path, or by preset name (e.g. 'celebhq',
    'mnist', 'celebhq_text_image_cond')."""
    path = path_or_name
    if not os.path.exists(path):
        candidate = os.path.join(_PRESET_DIR, path_or_name + ".yaml")
        if os.path.exists(candidate):
            path = candidate
        else:
            raise FileNotFoundError(
                f"config {path_or_name!r} not found (presets: {available_presets()})"
            )
    with open(path) as f:
        cfg = yaml.safe_load(f)
    return Config(cfg)
