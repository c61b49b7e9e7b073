"""Tensor-parallel filter batch sharding (SURVEY §2.3 TP): exactness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.bayes import bayes_denoise
from vnlb_tpu.parallel.tp import bayes_denoise_tp
from vnlb_tpu.parallel.tiled import make_mesh


def _groups(rng, b, k=40, pt=1, c=3, ps=7, sigma=20.0):
    base = rng.normal(size=(b, 1, pt, c, ps, ps)) * 30 + 128
    pn = base + rng.normal(size=(b, k, pt, c, ps, ps)) * sigma
    pb = base + rng.normal(size=(b, k, pt, c, ps, ps)) * (sigma / 4)
    return pn.astype(np.float32), pb.astype(np.float32)


@pytest.mark.parametrize("step,b,eig", [(0, 24, "xla"), (1, 24, "xla"),
                                        (0, 21, "xla"), (0, 24, "poly")])
def test_tp_matches_unsharded(step, b, eig):
    """Sharded filter == unsharded filter, incl. a batch that needs padding
    (21 over 8 devices).

    With the exact eigh the decomposition is strictly per-group, so sharding
    cannot change values (tight pin).  The production poly path may evaluate
    a shard's odd-sized sub-batch UNPACKED where the full batch packs
    2-groups-per-matrix (ops/polyspec poly_pack2) — same math, different
    bf16 rounding order — so that pin is loose (<0.1 on the 0-255 scale)."""
    rng = np.random.default_rng(step * 10 + b)
    pn, pb = _groups(rng, b)
    flat = np.zeros((b,), bool)
    flat[::5] = step == 1
    cfg = default_config(20.0, eig_method=eig).stage(step)

    ref, rv_ref = bayes_denoise(
        jnp.asarray(pn), jnp.asarray(pb) if step == 1 else None,
        jnp.asarray(flat) if step == 1 else None, cfg)

    mesh = make_mesh(len(jax.devices()), axis="groups")
    out, rv = bayes_denoise_tp(pn, pb if step == 1 else None,
                               flat if step == 1 else None, cfg, mesh)

    assert out.shape == ref.shape
    tol = dict(rtol=2e-5, atol=2e-3) if eig == "xla" \
        else dict(rtol=1e-3, atol=0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **tol)
    np.testing.assert_allclose(np.asarray(rv), np.asarray(rv_ref),
                               rtol=2e-5, atol=2e-5)
