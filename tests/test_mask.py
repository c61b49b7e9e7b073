import numpy as np

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.mask import batched_sites, lattice_mask, lattice_sites


def scalar_lattice(shape, ps, pt, step):
    """Independent scalar re-statement of the strided phase-shifted coverage
    grid semantics (reference search_mask/mask.py:315-358) used as the oracle
    for the vectorized implementation."""
    t, c, h, w = shape
    end_t, end_h, end_w = t - pt + 1, h - ps + 1, w - ps + 1
    mask = np.zeros((t, h, w), dtype=bool)
    for ti in range(end_t):
        last_t = ti == end_t - 1
        phase_h = 0 if last_t else ti
        for hi in range(end_h):
            take_h = hi % step == phase_h % step
            first_h = hi == 0
            last_h = hi == end_h - 1
            if not (take_h or first_h or last_h):
                continue
            phase_w = 0 if last_h else phase_h + hi // step
            for wi in range(end_w):
                take_w = wi % step == phase_w % step
                if take_w or wi == 0 or wi == end_w - 1:
                    mask[ti, hi, wi] = True
    return mask


def test_lattice_matches_scalar_semantics():
    for shape in [(3, 3, 32, 32), (5, 3, 41, 37), (2, 3, 16, 24)]:
        cfg = default_config(20.0, preset="iphone").stage(0)
        got = lattice_mask(shape, cfg)
        want = scalar_lattice(shape, cfg.ps, cfg.pt, cfg.step_s)
        np.testing.assert_array_equal(got, want)


def test_sites_raster_order_and_batching():
    shape = (3, 3, 32, 32)
    cfg = default_config(20.0, preset="iphone").stage(0).replace(bsize=64)
    sites = lattice_sites(shape, cfg)
    flat = sites[:, 0] * (32 * 32) + sites[:, 1] * 32 + sites[:, 2]
    assert np.all(np.diff(flat) > 0)  # strict raster order

    sb, vb = batched_sites(shape, cfg, 64)
    assert sb.shape[1] == 64 and sb.shape[0] * 64 >= sites.shape[0]
    assert vb.sum() == sites.shape[0]
    np.testing.assert_array_equal(sb.reshape(-1, 3)[vb.reshape(-1)], sites)


def test_sites_fit_patches():
    shape = (4, 3, 33, 45)
    cfg = default_config(20.0, preset="iphone").stage(1)
    sites = lattice_sites(shape, cfg)
    assert sites[:, 0].max() <= shape[0] - cfg.pt
    assert sites[:, 1].max() <= shape[2] - cfg.ps
    assert sites[:, 2].max() <= shape[3] - cfg.ps
