"""Flat-area detection (reference: lib/vnlb/utils/flat_areas.py:8-35).

A patch group is "flat" when the mean (over channels) of the unbiased variance
of all its pixels falls below ``gamma * sigma^2``.  Flat groups are centered
on the *basic* estimate in step 2 (reference deno/bayes_est.py:97-99).
"""

from __future__ import annotations

import jax.numpy as jnp


def flat_areas(pnoisy: jnp.ndarray, gamma: float, sigma2: float) -> jnp.ndarray:
    """(B, K, pt, c, ps, ps) noisy patches -> (B,) bool flat flags."""
    b, k, pt, c, ps, _ = pnoisy.shape
    x = jnp.transpose(pnoisy, (0, 3, 1, 2, 4, 5)).reshape(b, c, -1)
    z = x.shape[-1]
    psum = jnp.sum(x, axis=-1)
    psum2 = jnp.sum(x * x, axis=-1)
    var = (psum2 - psum * psum / z) / (z - 1)
    var = jnp.mean(var, axis=1)
    return var < (gamma * sigma2)
