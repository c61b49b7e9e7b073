"""Flat index codec shared by search / aggregation / tests.

The reference encodes a patch location ``(t, h, w)`` as
``idx = t * (c*h*w) + h * W + w`` — the temporal stride includes the color
planes while the spatial strides do not (reference:
lib/vnlb/utils/image_utils.py:7-25, agg/comp_agg.py:117-121).  We keep the
same codec so index buffers are interchangeable with the reference tooling.
"""

from __future__ import annotations

import jax.numpy as jnp


def check_codec_range(shape) -> None:
    """Fail loudly when flat indices would overflow int32.

    The index buffers are int32 (JAX's default; int64 needs jax_enable_x64),
    so ``t * (c*h*w)`` must stay below 2**31 — ~1746 frames at 480p, ~345 at
    1080p.  Longer volumes must go through the halo-tiled spatial sharding
    path (parallel/halo.py), whose per-tile local index space is small.
    The reference kept int64 index buffers (lib/vnlb/alloc.py:84) and so had
    no such limit — but also no loud check.
    """
    t_len, c, h, w = shape
    if t_len * c * h * w >= 2 ** 31:
        raise ValueError(
            f"video of shape {tuple(shape)} overflows the int32 flat-index "
            f"codec (t*c*h*w = {t_len * c * h * w} >= 2^31); denoise in "
            f"temporal chunks or use the halo-tiled sharded path")


def coords2idx(t, y, x, c: int, h: int, w: int):
    return t * (c * h * w) + y * w + x


def idx2coords(idx, c: int, h: int, w: int):
    chw = c * h * w
    hw = h * w
    t = idx // chw
    y = (idx % hw) // w
    x = idx % w
    return t, y, x


def idx2coords_full(idx, c: int, h: int, w: int):
    """Also recover the color plane (rarely needed; reference variant)."""
    chw = c * h * w
    hw = h * w
    t = idx // chw
    ci = (idx % chw) // hw
    y = (idx % hw) // w
    x = idx % w
    return t, ci, y, x
