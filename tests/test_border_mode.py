"""border_mode="mask": every site rides the dense fast path; out-of-bounds
candidates are masked +inf instead of sliding the window inward (a
documented delta vs the C++ slide semantics, default stays "slide")."""

import numpy as np
import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.mask import interior_split, lattice_sites
from vnlb_tpu.ops.search_dense import exec_search_dense
from vnlb_tpu.pipeline import proc_nl
from vnlb_tpu.testing.data import add_noise, synthetic_video
from vnlb_tpu.utils.metrics import compute_psnr


def _clip(t=3, h=48, w=48, sigma=20.0):
    clean = synthetic_video(t, h, w, seed=7)
    noisy = add_noise(clean, sigma, seed=8)
    zf = np.zeros((t, 2, h, w), np.float32)
    return clean, noisy, zf


def test_mask_mode_matches_slide_on_interior_sites():
    _, noisy, _ = _clip()
    shape = (3, 3, 48, 48)
    cfg = default_config(20.0, preset="iphone").stage(0).replace(stype="l2")
    sites = lattice_sites(shape, cfg)
    interior, border = interior_split(sites, shape, cfg)
    assert border.shape[0] > 0          # the clip actually has border sites
    video = jnp.asarray(noisy)
    v_s, i_s = exec_search_dense(video, jnp.asarray(interior), cfg)
    v_m, i_m = exec_search_dense(video, jnp.asarray(interior),
                                 cfg.replace(border_mode="mask"))
    np.testing.assert_array_equal(np.asarray(i_s), np.asarray(i_m))
    np.testing.assert_array_equal(np.asarray(v_s), np.asarray(v_m))


def test_mask_mode_border_candidates_in_bounds():
    _, noisy, _ = _clip()
    shape = (3, 3, 48, 48)
    t_len, c, h, w = shape
    cfg = default_config(20.0, preset="iphone").stage(0).replace(
        stype="l2", border_mode="mask")
    sites = lattice_sites(shape, cfg)
    _, border = interior_split(sites, shape, cfg)
    vals, inds = exec_search_dense(jnp.asarray(noisy),
                                   jnp.asarray(border), cfg)
    inds = np.asarray(inds)
    ok = inds >= 0
    assert ok.any()
    chw, hw = c * h * w, h * w
    f = inds[ok] // chw
    y = (inds[ok] % hw) // w
    x = inds[ok] % w
    assert ((f >= 0) & (f <= t_len - cfg.pt)).all()
    assert ((y >= 0) & (y <= h - cfg.ps)).all()
    assert ((x >= 0) & (x <= w - cfg.ps)).all()
    # the query site itself is always the first match
    np.testing.assert_array_equal(
        inds[:, 0],
        border[:, 0] * chw + border[:, 1] * w + border[:, 2])


def test_mask_mode_pipeline_quality_close_to_slide():
    clean, noisy, zf = _clip()
    cfg_s = default_config(20.0, preset="iphone").stage(0)
    cfg_m = cfg_s.replace(border_mode="mask")
    out_s = np.asarray(proc_nl(noisy, None, None, zf, zf, cfg_s))
    out_m = np.asarray(proc_nl(noisy, None, None, zf, zf, cfg_m))
    p_s = compute_psnr(out_s, clean)
    p_m = compute_psnr(out_m, clean)
    # only the border band (7 px on a 48x48 clip!) can differ; on 480p the
    # delta shrinks with the perimeter/area ratio
    assert abs(p_s - p_m) < 0.30, (p_s, p_m)
    assert p_m > compute_psnr(noisy, clean) + 2.0
