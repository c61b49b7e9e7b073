"""Patch-group gather (reference: external ``vpss.fill_patches``, called at
lib/vnlb/search/search.py:91-98; contract in SURVEY.md §2.2 N2).

Given top-K flat indices, gather the (pt, c, ps, ps) patch starting at each
decoded (t, y, x) corner.  Invalid indices (-1) gather from a clamped corner
and are expected to be masked downstream (the pipeline's validity mask), which
avoids data-dependent branching under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("pt", "ps"))
def fill_patches(video: jnp.ndarray, inds: jnp.ndarray, pt: int, ps: int
                 ) -> jnp.ndarray:
    """(T,C,H,W) video + (B,K) flat inds -> (B,K,pt,C,ps,ps) patches."""
    t_len, c, h, w = video.shape
    chw = c * h * w
    hw = h * w
    safe = jnp.maximum(inds, 0)
    f = jnp.clip(safe // chw, 0, t_len - pt)
    y = jnp.clip((safe % hw) // w, 0, h - ps)
    x = jnp.clip(safe % w, 0, w - ps)

    def one(fi, yi, xi):
        return lax.dynamic_slice(video, (fi, 0, yi, xi), (pt, c, ps, ps))

    return jax.vmap(jax.vmap(one))(f, y, x)
