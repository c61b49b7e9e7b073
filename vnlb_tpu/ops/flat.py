"""Flat-area detection (reference: lib/vnlb/utils/flat_areas.py:8-35).

A patch group is "flat" when the mean (over channels) of the unbiased variance
of all its pixels falls below ``gamma * sigma^2``.  Flat groups are centered
on the *basic* estimate in step 2 (reference deno/bayes_est.py:97-99).
"""

from __future__ import annotations

import jax.numpy as jnp


def flat_areas(pnoisy: jnp.ndarray, gamma: float, sigma2: float) -> jnp.ndarray:
    """Noisy patches -> (B,) bool flat flags; accepts the public 6-D
    (B, K, pt, c, ps, ps) layout or c-major (B, K, c, p) rows.

    Accepts bf16 patches (the pipeline keeps gathered rows in the arena
    dtype); statistics accumulate in f32.  Per-channel sums need no data
    transpose — the channel axis is reduced around, not moved.
    """
    if pnoisy.ndim == 4:                       # c-major rows (B, K, c, p)
        b, k, c, p = pnoisy.shape
        x = pnoisy.astype(jnp.float32)
        z = k * p
    else:
        b, k, pt, c, ps, _ = pnoisy.shape
        x = pnoisy.reshape(b, k * pt, c, ps * ps).astype(jnp.float32)
        z = k * pt * ps * ps
    psum = jnp.sum(x, axis=(1, 3))                             # (B, c)
    psum2 = jnp.sum(x * x, axis=(1, 3))
    var = (psum2 - psum * psum / z) / (z - 1)
    var = jnp.mean(var, axis=1)
    return var < (gamma * sigma2)
