"""Model-width auto-scaler: shrink the base UNet by a compression factor.

Produces the same configs as reference config/ldm_scaling.py:37-86 — scaled
channels rounded half-up to ``channel_align`` with a floor, mids taken as
[down[-1], down[-2]], and head/group counts chosen as the largest candidate
divisor common to every scaled width. ``c_factor=2.58`` reproduces the
"tc05" model family (Model_DiT_12L_config.py:3). Behavior is pinned by
tests/test_config.py::TestLdmScaling.
"""

from __future__ import annotations

from typing import Dict, Sequence

# base CelebHQ UNet geometry (config/celebhq.yaml:12-23)
BASE_DOWN_CHANNELS = (256, 384, 512, 768)
BASE_TIME_EMB_DIM = 512
BASE_CONV_OUT_CHANNELS = 128

HEAD_CANDIDATES = (16, 12, 8, 6, 4, 2, 1)
GROUP_CANDIDATES = (32, 24, 16, 12, 8, 6, 4, 2, 1)


def _round_half_up(value: float, multiple: int, floor: int) -> int:
    """Round to the nearest multiple (ties up), at least ``floor`` before
    rounding and one multiple after."""
    if multiple <= 0 or floor <= 0:
        raise ValueError("alignment and floor must be positive")
    target = max(float(value), float(floor))
    snapped = int((target + multiple / 2.0) // multiple) * multiple
    return max(multiple, snapped)


def _largest_common_divisor(candidates: Sequence[int],
                            widths: Sequence[int], what: str) -> int:
    smallest = min(widths)
    for c in sorted({int(c) for c in candidates if c > 0}, reverse=True):
        if c <= smallest and all(w % c == 0 for w in widths):
            return c
    raise ValueError(f"no {what} candidate divides all of {widths}")


def build_ldm_scaling(c_factor: float, *, channel_align: int = 16,
                      min_channel: int = 32, time_align: int = 16,
                      base=None, head_candidates=HEAD_CANDIDATES,
                      group_candidates=GROUP_CANDIDATES) -> Dict[str, object]:
    """Scale the base UNet widths down by ``c_factor`` (>1 shrinks)."""
    if c_factor <= 0:
        raise ValueError("c_factor must be > 0")

    base_down = tuple(getattr(base, "down_channels", BASE_DOWN_CHANNELS)) \
        if base is not None else BASE_DOWN_CHANNELS
    base_temb = getattr(base, "time_emb_dim", BASE_TIME_EMB_DIM) \
        if base is not None else BASE_TIME_EMB_DIM
    base_cout = getattr(base, "conv_out_channels", BASE_CONV_OUT_CHANNELS) \
        if base is not None else BASE_CONV_OUT_CHANNELS

    down = [_round_half_up(c / c_factor, channel_align, min_channel)
            for c in base_down]
    mid = [down[-1], down[-2]]

    cout_floor = (min_channel // 2 if min_channel > channel_align
                  else channel_align)
    conv_out = _round_half_up(base_cout / c_factor, channel_align, cout_floor)

    temb = _round_half_up(base_temb / c_factor, time_align, time_align)
    if temb % 2:
        temb += time_align

    return {
        "down_channels": down,
        "mid_channels": mid,
        "time_emb_dim": temb,
        "conv_out_channels": conv_out,
        "num_heads": _largest_common_divisor(head_candidates, down + mid,
                                             "num_heads"),
        "norm_channels": _largest_common_divisor(
            group_candidates, down + mid + [conv_out], "norm_channels"),
    }
