"""Parity vs the reference-derived NumPy oracle (vnlb_tpu/testing/npref.py).

Round-1 verdict item #5: the in-repo C++ oracle shares authorship with the
production ops, so these tests pin the ops against a SECOND oracle whose
semantics were transliterated from the reference's own Python implementations
(bayes_est.py, comp_agg.py, mask.py, color.py, flat_areas.py).
"""

import numpy as np
import pytest

from vnlb_tpu.config import default_config
from vnlb_tpu.ops import agg, color, flat, gather
from vnlb_tpu.ops.bayes import bayes_denoise
from vnlb_tpu.ops.mask import lattice_mask
from vnlb_tpu.testing import npref

import jax.numpy as jnp


def _cfg(step, sigma=20.0, **kw):
    return default_config(sigma, preset="default", **kw).stage(step)


def test_color_roundtrip_matches_reference(rng):
    video = rng.uniform(0, 255, (3, 3, 16, 16)).astype(np.float32)
    got = np.asarray(color.rgb2yuv(jnp.asarray(video)))
    want = npref.rgb2yuv(video.astype(np.float64))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-3)

    back = np.asarray(color.yuv2rgb(jnp.asarray(got)))
    want_back = npref.yuv2rgb(want)
    np.testing.assert_allclose(back, want_back, rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(back, video, rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("shape,step_s", [((4, 3, 40, 52), 3),
                                          ((2, 3, 21, 33), 5),
                                          ((3, 3, 64, 64), 7)])
def test_lattice_mask_matches_reference(shape, step_s):
    for step in (0, 1):
        cfg = _cfg(step, step_s=step_s)
        got = lattice_mask(shape, cfg)
        want = npref.fill_mask(shape, cfg.ps, cfg.pt, cfg.w_s, cfg.n_dt,
                               cfg.step_s)
        np.testing.assert_array_equal(got, want)


def test_flat_areas_matches_reference(rng):
    cfg = _cfg(1)
    p = rng.normal(128, 4.0, (32, 60, cfg.pt, 3, cfg.ps, cfg.ps)) \
        .astype(np.float32)
    # make half the groups high-variance (non-flat)
    p[16:] += rng.normal(0, 40.0, p[16:].shape).astype(np.float32)
    got = np.asarray(flat.flat_areas(jnp.asarray(p), cfg.gamma, cfg.sigma2))
    want = npref.flat_areas(p.astype(np.float64), cfg.gamma, cfg.sigma2)
    np.testing.assert_array_equal(got, want)
    assert got[:16].all() and not got[16:].any()


@pytest.mark.parametrize("step", [0, 1])
def test_bayes_matches_reference(rng, step):
    cfg = _cfg(step, eig_method="xla")
    b, k = 6, cfg.npatches
    base = rng.normal(0, 12.0, (b, 1, cfg.pt, 3, cfg.ps, cfg.ps))
    pbasic = (base + rng.normal(0, 2.0, (b, k, cfg.pt, 3, cfg.ps, cfg.ps))) \
        .astype(np.float32) + 120.0
    pnoisy = (pbasic + rng.normal(0, cfg.sigma,
                                  pbasic.shape).astype(np.float32))
    if step == 1:
        fl = np.zeros((b,), bool)
        fl[:2] = True
        got, got_rv = bayes_denoise(jnp.asarray(pnoisy), jnp.asarray(pbasic),
                                    jnp.asarray(fl), cfg)
        want, want_rv = npref.bayes_denoise(
            pnoisy, pbasic, fl, step=1, sigma2=cfg.sigma2,
            sigmab2=cfg.sigmab2, rank=cfg.rank, thresh=cfg.thresh,
            cpatches=cfg.cpatches)
    else:
        got, got_rv = bayes_denoise(jnp.asarray(pnoisy), None, None, cfg)
        want, want_rv = npref.bayes_denoise(
            pnoisy, None, None, step=0, sigma2=cfg.sigma2,
            sigmab2=cfg.sigmab2, rank=cfg.rank, thresh=cfg.thresh)
    got = np.asarray(got)
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=2e-3 * scale)
    np.testing.assert_allclose(np.asarray(got_rv), want_rv, rtol=1e-3)


def test_agg_matches_reference(rng):
    shape = (3, 3, 24, 28)
    t_len, c, h, w = shape
    cfg = _cfg(0)
    ps, pt = cfg.ps, cfg.pt
    b, k = 8, 10
    chw, hw = c * h * w, h * w

    f = rng.integers(0, t_len - pt + 1, (b, k))
    y = rng.integers(0, h - ps + 1, (b, k))
    x = rng.integers(0, w - ps + 1, (b, k))
    inds = (f * chw + y * w + x).astype(np.int32)
    inds[0, :3] = -1                              # some invalid entries
    patches = rng.normal(0, 1, (b, k, pt, c, ps, ps)).astype(np.float32)

    # oracle
    deno_ref = np.zeros((t_len, c, h, w), np.float64)
    wts_ref = np.zeros((t_len, h, w), np.float64)
    npref.agg_patches(deno_ref, wts_ref, patches.astype(np.float64), inds,
                      ps, pt)

    # production pixel-scatter path
    deno0 = jnp.zeros((t_len * hw, c), jnp.float32)
    wts0 = jnp.zeros((t_len * hw,), jnp.float32)
    valid = np.ones((b, k), bool)
    deno1, wts1 = agg.agg_patches(deno0, wts0, jnp.asarray(patches),
                                  jnp.asarray(inds), jnp.asarray(valid),
                                  pt, ps, shape)
    got = np.asarray(deno1).reshape(t_len, h, w, c).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, deno_ref, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(wts1).reshape(t_len, h, w), wts_ref, atol=1e-5)

    # production row-scatter + fold path (the pipeline's fast path)
    hp, wp = h - ps + 1, w - ps + 1
    d = c * ps * ps
    rows = gather.inds_to_rows(jnp.asarray(inds), shape, ps, pt)
    acc0 = jnp.zeros((t_len * hp * wp, pt * d + 1), jnp.float32)
    acc = agg.agg_rows(acc0, jnp.asarray(patches), rows[:, :, 0],
                       jnp.asarray(valid & (inds >= 0)))
    deno2, wts2 = agg.fold(acc, pt, ps, shape)
    np.testing.assert_allclose(np.asarray(deno2), deno_ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(wts2), wts_ref, atol=1e-5)


def test_finalize_matches_reference(rng):
    shape = (2, 3, 8, 8)
    t_len, c, h, w = shape
    deno = rng.normal(0, 1, shape).astype(np.float32)
    wts = rng.integers(0, 3, (t_len, h, w)).astype(np.float32)
    fallback = rng.normal(0, 1, shape).astype(np.float32)
    got = np.asarray(agg.finalize_img(jnp.asarray(deno), jnp.asarray(wts),
                                      jnp.asarray(fallback)))
    want = npref.finalize(deno.astype(np.float64), wts.astype(np.float64),
                          fallback.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-5)
