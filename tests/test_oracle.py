"""C++ oracle parity tests (SURVEY.md §4: oracle tests of the production ops
vs an independent native implementation, mirroring the reference's
test_gpu_sim_search.py strategy of index-level comparison with a
tie-tolerance escape hatch)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vnlb_tpu.config import default_config
from vnlb_tpu.ops import color
from vnlb_tpu.ops.bayes import bayes_denoise
from vnlb_tpu.ops.flat import flat_areas
from vnlb_tpu.ops.gather import fill_patches
from vnlb_tpu.ops.mask import lattice_mask
from vnlb_tpu.ops.search import exec_search
from vnlb_tpu.pipeline import proc_nl
from vnlb_tpu.testing import oracle as orc
from vnlb_tpu.testing.data import add_noise, synthetic_video


@pytest.fixture(scope="module")
def built():
    orc.lib()
    return True


def assert_topk_match(py_vals, py_inds, or_vals, or_inds, tol=1e-5):
    """Index-exact comparison with tie tolerance (reference
    test_gpu_sim_search.py:94-103,423-429)."""
    py_vals, py_inds = np.asarray(py_vals), np.asarray(py_inds)
    neq = np.where(py_inds != or_inds)
    if neq[0].size:
        # mismatched entries must carry (near-)equal distances
        dv = np.abs(py_vals[neq] - or_vals[neq])
        assert dv.max() < tol, (neq, dv.max())
    np.testing.assert_allclose(py_vals, or_vals, rtol=1e-4, atol=1e-5)


def test_color_parity(built):
    rng = np.random.default_rng(0)
    v = rng.uniform(0, 255, (2, 3, 12, 12)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(color.rgb2yuv(v)),
                               orc.oracle_rgb2yuv(v), atol=1e-3)
    np.testing.assert_allclose(np.asarray(color.yuv2rgb(v)),
                               orc.oracle_yuv2rgb(v), atol=1e-3)


def test_lattice_parity(built):
    cfg = default_config(20.0, preset="iphone").stage(0)
    for shape in [(3, 3, 32, 32), (4, 3, 41, 37)]:
        np.testing.assert_array_equal(lattice_mask(shape, cfg),
                                      orc.oracle_lattice(shape, cfg))


def test_search_parity_l2(built):
    rng = np.random.default_rng(1)
    video = rng.uniform(0, 255, (4, 3, 40, 44)).astype(np.float32)
    fflow = rng.uniform(-2, 2, (4, 2, 40, 44)).astype(np.float32)
    bflow = rng.uniform(-2, 2, (4, 2, 40, 44)).astype(np.float32)
    cfg = default_config(20.0, preset="iphone").stage(1).replace(
        nwt_b=2, nwt_f=2, npatches=12)
    sites = np.array([[1, 4, 6], [2, 20, 30], [0, 0, 0], [2, 33, 37]],
                     np.int32)
    pv, pi = exec_search(jnp.asarray(video), jnp.asarray(sites),
                         jnp.asarray(fflow), jnp.asarray(bflow), cfg)
    ov, oi = orc.oracle_search(video, sites, fflow, bflow, cfg)
    assert_topk_match(pv, pi, ov, oi)


def test_search_parity_needle(built):
    rng = np.random.default_rng(2)
    video = rng.uniform(0, 255, (3, 3, 64, 64)).astype(np.float32)
    zf = np.zeros((3, 2, 64, 64), np.float32)
    cfg = default_config(20.0, preset="iphone").stage(0).replace(
        nwt_b=1, nwt_f=1, npatches=10, stype="needle")
    sites = np.array([[1, 10, 12], [0, 40, 40]], np.int32)
    pv, pi = exec_search(jnp.asarray(video), jnp.asarray(sites),
                         jnp.asarray(zf), jnp.asarray(zf), cfg)
    ov, oi = orc.oracle_search(video, sites, zf, zf, cfg)
    assert_topk_match(pv, pi, ov, oi)


def test_gather_parity(built):
    rng = np.random.default_rng(3)
    video = rng.uniform(0, 255, (3, 3, 24, 24)).astype(np.float32)
    chw = 3 * 24 * 24
    inds = (rng.integers(0, 2, (4, 5)) * chw
            + rng.integers(0, 18, (4, 5)) * 24
            + rng.integers(0, 18, (4, 5))).astype(np.int32)
    got = np.asarray(fill_patches(jnp.asarray(video), jnp.asarray(inds), 2, 7))
    want = orc.oracle_fill_patches(video, inds, 2, 7)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bayes_flat_parity(built):
    rng = np.random.default_rng(4)
    sigma = 10.0
    base = rng.normal(0, 30, (3, 1, 2, 3, 5, 5))
    pnoisy = (base + rng.normal(0, sigma, (3, 16, 2, 3, 5, 5))).astype(np.float32)
    pbasic = (base + rng.normal(0, 1, (3, 16, 2, 3, 5, 5))).astype(np.float32)
    # exact-eigh pin (the presets default to the poly production filter)
    cfg = default_config(sigma).stage(1).replace(ps=5, rank=10,
                                                 eig_method="jacobi")

    oflags = orc.oracle_flat(pnoisy, cfg.gamma, cfg.sigma2)
    jflags = np.asarray(flat_areas(jnp.asarray(pnoisy), cfg.gamma, cfg.sigma2))
    np.testing.assert_array_equal(jflags, oflags)

    got, _ = bayes_denoise(jnp.asarray(pnoisy), jnp.asarray(pbasic),
                           jnp.asarray(jflags), cfg)
    want = orc.oracle_bayes(pnoisy, pbasic, oflags.astype(np.uint8), cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-2)


def test_end_to_end_parity(built):
    """Full single-pass parity: jitted JAX pipeline vs composed C++ oracle."""
    clean = synthetic_video(3, 32, 32, seed=5)
    sigma = 20.0
    noisy = add_noise(clean, sigma, seed=6)
    zf = np.zeros((3, 2, 32, 32), np.float32)
    # reference-exact numerics: the preset's speed knobs (agg_k thinning,
    # bf16 patch columns, poly spectral filter) deliberately deviate from
    # the aggregate-all-K fp32 exact-eigh semantics the oracle implements
    cfg = default_config(sigma, preset="iphone").stage(0).replace(
        stype="l2", agg_k=0, cols_bf16=False, eig_method="jacobi")

    got = np.asarray(proc_nl(noisy, None, None, zf, zf, cfg))
    want = orc.oracle_proc_nl(noisy, None, zf, zf, cfg)
    err = np.abs(got - want)
    rel = err.mean() / (np.abs(want).mean() + 1e-8)
    assert rel < 2e-3, f"mean relative error {rel}"
    assert err.max() < 10.0, f"max abs error {err.max()}"
