"""Flat index codec shared by search / aggregation / tests.

The reference encodes a patch location ``(t, h, w)`` as
``idx = t * (c*h*w) + h * W + w`` — the temporal stride includes the color
planes while the spatial strides do not (reference:
lib/vnlb/utils/image_utils.py:7-25, agg/comp_agg.py:117-121).  We keep the
same codec so index buffers are interchangeable with the reference tooling.
"""

from __future__ import annotations

import jax.numpy as jnp


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
