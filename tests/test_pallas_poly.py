"""Parity of the fused Pallas poly-filter kernel (ops/pallas_poly.py) vs the
XLA implementation (ops/polyspec.py) — interpret mode on the CPU mesh.

The kernel re-implements the identical schedule (quintic+cubic sign gate,
per-group Chebyshev, bf16 storage points), so outputs must agree to bf16
rounding noise on both stage shapes (step0: K=100 > p=49, matrix-side Q;
step1: K=60 < p=98, left-side recurrence).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.pallas_poly import poly_filter_pallas
from vnlb_tpu.ops.polyspec import poly_filter


def _groups(rng, g, k, p, scale=30.0):
    base = rng.normal(0, scale, (g, 1, p))
    struct = rng.normal(0, scale / 2, (g, 3, p))
    coefs = rng.normal(0, 1, (g, k, 3))
    x = base + np.einsum("gkr,grp->gkp", coefs, struct) \
        + rng.normal(0, 18.0, (g, k, p))
    x = x - x.mean(axis=1, keepdims=True)
    return x.astype(np.float32)


@pytest.mark.parametrize("step,k,p", [(0, 100, 49), (1, 60, 98)])
def test_pallas_poly_matches_xla(step, k, p):
    rng = np.random.default_rng(7 + step)
    cfg = default_config(20.0).stage(step)
    xc = _groups(rng, 5, k, p)
    xn = xc if step == 0 else _groups(rng, 5, k, p)

    want = np.asarray(poly_filter(jnp.asarray(xc), jnp.asarray(xn), cfg))
    got = np.asarray(poly_filter_pallas(jnp.asarray(xc), jnp.asarray(xn),
                                        k, cfg, interpret=True))
    scale = np.abs(want).mean() + 1e-6
    rel = np.abs(got - want).mean() / scale
    assert rel < 0.02, rel
    # padded-lane/row correctness: no NaNs, right shape
    assert got.shape == want.shape
    assert np.all(np.isfinite(got))


def test_pallas_poly_odd_group_count():
    """G not a multiple of the block size exercises the zero-pad path."""
    rng = np.random.default_rng(11)
    cfg = default_config(20.0).stage(1)
    xc = _groups(rng, 3, 60, 98)
    xn = _groups(rng, 3, 60, 98)
    want = np.asarray(poly_filter(jnp.asarray(xc), jnp.asarray(xn), cfg))
    got = np.asarray(poly_filter_pallas(jnp.asarray(xc), jnp.asarray(xn),
                                        60, cfg, interpret=True))
    rel = np.abs(got - want).mean() / (np.abs(want).mean() + 1e-6)
    assert rel < 0.02, rel
