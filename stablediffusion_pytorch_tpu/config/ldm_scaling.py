"""Model-width auto-scaler: shrink the base UNet by a compression factor
with channel alignment and divisor-compatible head/group counts.

Same algorithm and defaults as reference config/ldm_scaling.py:37-86
(round-half-up channel scaling to channel_align, mid = [down[-1], down[-2]],
largest common divisor pick for num_heads / norm_channels). c_factor=2.58
reproduces the "tc05" model family (Model_DiT_12L_config.py:3).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, Iterable, List, Sequence, Tuple


@dataclass(frozen=True)
class LDMScalingBase:
    down_channels: Sequence[int] = (256, 384, 512, 768)
    mid_channels: Sequence[int] = (768, 512)
    time_emb_dim: int = 512
    conv_out_channels: int = 128
    num_heads: int = 16
    norm_channels: int = 32


def _round_to_multiple(value: float, multiple: int, *, min_value: int) -> int:
    if multiple <= 0:
        raise ValueError("multiple must be positive")
    if min_value <= 0:
        raise ValueError("min_value must be positive")
    scaled = max(value, float(min_value))
    rounded = int(math.floor((scaled + multiple / 2.0) / multiple)) * multiple
    return max(multiple, rounded)


def _pick_divisor(candidates: Iterable[int], values: Sequence[int], *, name: str) -> int:
    for candidate in sorted({int(c) for c in candidates if c > 0}, reverse=True):
        if candidate > min(values):
            continue
        if all(val % candidate == 0 for val in values):
            return candidate
    raise ValueError(f"Unable to pick {name} for values {values}")


def build_ldm_scaling(
    c_factor: float,
    *,
    channel_align: int = 16,
    min_channel: int = 32,
    time_align: int = 16,
    base: LDMScalingBase = LDMScalingBase(),
    head_candidates: Sequence[int] = (16, 12, 8, 6, 4, 2, 1),
    group_candidates: Sequence[int] = (32, 24, 16, 12, 8, 6, 4, 2, 1),
) -> Dict[str, object]:
    if c_factor <= 0:
        raise ValueError("c_factor must be > 0")
    if channel_align <= 0 or time_align <= 0:
        raise ValueError("Align values must be positive")

    def scale_channels(values: Sequence[int]) -> List[int]:
        return [
            _round_to_multiple(v / c_factor, channel_align, min_value=min_channel)
            for v in values
        ]

    down_channels = scale_channels(base.down_channels)
    mid_channels = [down_channels[-1], down_channels[-2]]

    conv_out_channels = _round_to_multiple(
        base.conv_out_channels / c_factor,
        channel_align,
        min_value=min_channel // 2 if min_channel > channel_align else channel_align,
    )

    time_emb_dim = _round_to_multiple(
        base.time_emb_dim / c_factor, time_align, min_value=time_align
    )
    if time_emb_dim % 2 != 0:
        time_emb_dim += time_align

    channels_for_heads: Tuple[int, ...] = tuple(down_channels + list(mid_channels))
    num_heads = _pick_divisor(head_candidates, channels_for_heads, name="num_heads")

    channels_for_groups = tuple(down_channels + list(mid_channels) + [conv_out_channels])
    norm_channels = _pick_divisor(group_candidates, channels_for_groups, name="norm_channels")

    return {
        "down_channels": down_channels,
        "mid_channels": mid_channels,
        "time_emb_dim": time_emb_dim,
        "conv_out_channels": conv_out_channels,
        "num_heads": num_heads,
        "norm_channels": norm_channels,
    }
