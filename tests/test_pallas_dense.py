"""Pallas dense-distance kernel parity vs the XLA scan path (interpret mode
on CPU; the same kernel compiles with Mosaic on TPU)."""

import numpy as np
import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.mask import interior_split, lattice_sites
from vnlb_tpu.ops.search_dense import exec_search_dense


def test_pallas_matches_xla_dense():
    rng = np.random.default_rng(11)
    video = rng.uniform(0, 255, (3, 3, 40, 44)).astype(np.float32)
    base = default_config(20.0, preset="iphone").stage(1).replace(
        nwt_b=1, nwt_f=1, npatches=12)
    sites = lattice_sites(video.shape, base)
    interior, _ = interior_split(sites, video.shape, base)
    si = jnp.asarray(interior)

    xv, xi = exec_search_dense(jnp.asarray(video), si,
                               base.replace(dense_impl="xla"))
    pv, pi = exec_search_dense(jnp.asarray(video), si,
                               base.replace(dense_impl="pallas"))
    xv, xi = np.asarray(xv), np.asarray(xi)
    pv, pi = np.asarray(pv), np.asarray(pi)
    np.testing.assert_allclose(pv, xv, rtol=1e-5, atol=1e-6)
    neq = np.where(pi != xi)
    if neq[0].size:  # tie tolerance
        assert np.abs(pv[neq] - xv[neq]).max() < 1e-6


def test_pallas_gather_rows_matches_take():
    from vnlb_tpu.ops.pallas_gather import gather_rows

    rng = np.random.default_rng(12)
    cols = rng.normal(0, 1, (500, 256)).astype(np.float32)
    rows = rng.integers(0, 500, (300,)).astype(np.int32)
    got = np.asarray(gather_rows(jnp.asarray(cols), jnp.asarray(rows),
                                 interpret=True))
    np.testing.assert_array_equal(got, cols[rows])


def test_pallas_gather_rows_padded_matches_take():
    """The 1024-element-stride padded-arena gather (the round-3 alignment
    workaround, ops/pallas_gather.gather_rows_padded) — interpret-mode
    correctness; the compiled-mode verdict lives in
    scripts/exp_pallas_gather2.py."""
    from vnlb_tpu.ops.pallas_gather import _ROWPAD, gather_rows_padded

    rng = np.random.default_rng(13)
    d = 147
    cols = rng.normal(0, 1, (400, d)).astype(np.float32)
    rows = rng.integers(0, 400, (300,)).astype(np.int32)
    colsp = np.zeros((400, _ROWPAD), np.float32)
    colsp[:, :d] = cols
    got = np.asarray(gather_rows_padded(jnp.asarray(colsp.reshape(-1)),
                                        jnp.asarray(rows), d,
                                        interpret=True))
    np.testing.assert_array_equal(got, cols[rows])


def test_pallas_gather_rows_tiled_matches_take():
    """The tile-shaped-arena gather (third attempt at the Mosaic blocker,
    ops/pallas_gather.gather_rows_tiled: rows ARE (8,128) tiles so every
    DMA is a leading-dim whole-tile slice) — interpret-mode correctness;
    the compiled-mode verdict (compiles, 0.92x take) lives in
    scripts/exp_pallas_gather3.py."""
    from vnlb_tpu.ops.pallas_gather import gather_rows_tiled

    rng = np.random.default_rng(14)
    d, sub = 147, 8
    cols = rng.normal(0, 1, (400, d)).astype(np.float32)
    rows = rng.integers(0, 400, (300,)).astype(np.int32)
    colsp = np.zeros((400, sub * 128), np.float32)
    colsp[:, :d] = cols
    got = np.asarray(gather_rows_tiled(
        jnp.asarray(colsp.reshape(400, sub, 128)), jnp.asarray(rows),
        interpret=True)).reshape(300, sub * 128)[:, :d]
    np.testing.assert_array_equal(got, cols[rows])
