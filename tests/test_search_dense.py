"""Dense zero-flow search parity: identical results to the gather path for
interior sites (values, indices, tie order)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.mask import interior_split, lattice_sites
from vnlb_tpu.ops.search import exec_search
from vnlb_tpu.ops.search_dense import exec_search_dense


def _mk(seed, t=4, h=48, w=52):
    rng = np.random.default_rng(seed)
    video = rng.uniform(0, 255, (t, 3, h, w)).astype(np.float32)
    zf = np.zeros((t, 2, h, w), np.float32)
    return video, zf


def _strict_interior(sites, shape, cfg):
    """Sites whose window never clamps at ANY pyramid level — the subset on
    which dense and gather results are bit-equal (coarse-clamped sites use
    the documented clamped-center approximation)."""
    t, c, h, w = shape
    half = (cfg.w_s - 1) // 2
    n_lvl = cfg.needle_scales if cfg.stype == "needle" else 1
    ok = np.ones(sites.shape[0], bool)
    lh, lw = h, w
    ys, xs = sites[:, 1], sites[:, 2]
    for lvl in range(n_lvl):
        if lvl:
            lh, lw = lh // 2, lw // 2
            if lh < cfg.w_s + cfg.ps - 1 or lw < cfg.w_s + cfg.ps - 1:
                break
            ys, xs = ys // 2, xs // 2
        ok &= (ys >= half) & (ys <= lh - cfg.ps - half)
        ok &= (xs >= half) & (xs <= lw - cfg.ps - half)
    return sites[ok]


@pytest.mark.parametrize("step,stype", [(0, "l2"), (1, "l2"), (0, "needle")])
def test_dense_matches_gather_interior(step, stype):
    video, zf = _mk(3 + step)
    shape = video.shape
    # search_bf16=False: this test pins the EXACT-math contract between the
    # dense and gather formulations; the production bf16-plane default
    # rounds dense distances ~0.4% (quality-gated in tests/test_knobs.py)
    cfg = default_config(20.0, preset="iphone").stage(step).replace(
        nwt_b=3, nwt_f=3, npatches=20, stype=stype, search_bf16=False)
    sites = lattice_sites(shape, cfg)
    _, border = interior_split(sites, shape, cfg)
    interior = _strict_interior(sites, shape, cfg)
    assert interior.shape[0] > 10
    assert border.shape[0] > 0

    si = jnp.asarray(interior)
    gv, gi = exec_search(jnp.asarray(video), si, jnp.asarray(zf),
                         jnp.asarray(zf), cfg)
    dv, di = exec_search_dense(jnp.asarray(video), si, cfg)

    gv, gi = np.asarray(gv), np.asarray(gi)
    dv, di = np.asarray(dv), np.asarray(di)
    np.testing.assert_allclose(dv, gv, rtol=2e-4, atol=1e-5)
    # index equality with tie tolerance (equal-distance swaps allowed)
    neq = np.where(gi != di)
    if neq[0].size:
        assert np.abs(gv[neq] - dv[neq]).max() < 1e-5


def test_interior_split_covers_all():
    shape = (3, 3, 48, 48)
    cfg = default_config(20.0, preset="iphone").stage(1)
    sites = lattice_sites(shape, cfg)
    interior, border = interior_split(sites, shape, cfg)
    assert interior.shape[0] + border.shape[0] == sites.shape[0]
    # interior windows never clamp
    half = (cfg.w_s - 1) // 2
    if interior.size:
        assert interior[:, 1].min() >= half
        assert interior[:, 1].max() <= shape[2] - cfg.ps - half


@pytest.mark.parametrize("step,stype", [(0, "needle"), (1, "l2")])
def test_stream_topk_bit_equal(step, stype):
    """topk='stream' (per-dt running merge) returns bit-identical (vals,
    inds) to the one-shot top_k, including tie order."""
    video, zf = _mk(11 + step)
    shape = video.shape
    cfg = default_config(20.0, preset="iphone").stage(step).replace(
        stype=stype, border_mode="mask")
    sites = jnp.asarray(lattice_sites(shape, cfg))

    v1, i1 = exec_search_dense(jnp.asarray(video), sites, cfg)
    v2, i2 = exec_search_dense(jnp.asarray(video), sites,
                               cfg.replace(topk="stream"))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
