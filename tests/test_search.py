import numpy as np
import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.search import exec_search, track_centers
from vnlb_tpu.utils.index import idx2coords


def brute_force_search(video, sites, cfg, fflow=None, bflow=None):
    """Scalar numpy oracle implementing the documented search semantics:
    sliding window, frame-ascending enumeration, tie -> earliest candidate."""
    t_len, c, h, w = video.shape
    ps, pt, c_d, w_s, k = cfg.ps, cfg.pt, cfg.dist_chnls, cfg.w_s, cfg.npatches
    half = (w_s - 1) // 2
    norm = pt * c_d * ps * ps * 255.0 ** 2
    all_vals, all_inds = [], []
    for (tq, yq, xq) in sites:
        q = video[tq:tq + pt, :c_d, yq:yq + ps, xq:xq + ps]
        cands = []
        # flow-tracked centers
        centers = {0: (float(yq), float(xq))}
        cy, cx = float(yq), float(xq)
        for i in range(cfg.nwt_f):
            fi = np.clip(tq + i, 0, t_len - 1)
            yi = int(np.clip(np.floor(cy + 0.5), 0, h - 1))
            xi = int(np.clip(np.floor(cx + 0.5), 0, w - 1))
            u = fflow[fi, 0, yi, xi] if fflow is not None else 0.0
            v = fflow[fi, 1, yi, xi] if fflow is not None else 0.0
            cy = np.clip(cy + v, 0, h - 1)
            cx = np.clip(cx + u, 0, w - 1)
            centers[i + 1] = (cy, cx)
        cy, cx = float(yq), float(xq)
        for i in range(cfg.nwt_b):
            fi = np.clip(tq - i, 0, t_len - 1)
            yi = int(np.clip(np.floor(cy + 0.5), 0, h - 1))
            xi = int(np.clip(np.floor(cx + 0.5), 0, w - 1))
            u = bflow[fi, 0, yi, xi] if bflow is not None else 0.0
            v = bflow[fi, 1, yi, xi] if bflow is not None else 0.0
            cy = np.clip(cy + v, 0, h - 1)
            cx = np.clip(cx + u, 0, w - 1)
            centers[-(i + 1)] = (cy, cx)

        for dt in range(-cfg.nwt_b, cfg.nwt_f + 1):
            f = tq + dt
            if f < 0 or f > t_len - pt:
                continue
            ccy, ccx = centers[dt]
            ccy = int(np.floor(ccy + 0.5))
            ccx = int(np.floor(ccx + 0.5))
            sy = int(np.clip(ccy - half, 0, max(h - ps - (w_s - 1), 0)))
            sx = int(np.clip(ccx - half, 0, max(w - ps - (w_s - 1), 0)))
            for dy in range(w_s):
                for dx in range(w_s):
                    y, x = sy + dy, sx + dx
                    p = video[f:f + pt, :c_d, y:y + ps, x:x + ps]
                    d = float(((q - p) ** 2).sum()) / norm - cfg.offset
                    cands.append((d, f * (c * h * w) + y * w + x))
        # stable sort by distance, preserving enumeration order on ties
        order = sorted(range(len(cands)), key=lambda i: (cands[i][0], i))
        vals = [cands[i][0] for i in order[:k]]
        inds = [cands[i][1] for i in order[:k]]
        all_vals.append(vals)
        all_inds.append(inds)
    return np.array(all_vals, np.float32), np.array(all_inds, np.int64)


def _mk_cfg(**kw):
    cfg = default_config(20.0, preset="iphone").stage(0)
    kw.setdefault("nwt_b", 2)
    kw.setdefault("nwt_f", 2)
    kw.setdefault("npatches", 8)
    kw.setdefault("stype", "l2")
    return cfg.replace(**kw)


def test_search_matches_bruteforce_zero_flow():
    rng = np.random.default_rng(7)
    video = rng.uniform(0, 255, (4, 3, 40, 40)).astype(np.float32)
    zf = np.zeros((4, 2, 40, 40), np.float32)
    cfg = _mk_cfg()
    sites = np.array([[1, 5, 7], [0, 0, 0], [2, 33, 33], [3, 16, 2]],
                     np.int32)
    vals, inds = exec_search(jnp.asarray(video), jnp.asarray(sites),
                             jnp.asarray(zf), jnp.asarray(zf), cfg)
    bvals, binds = brute_force_search(video, sites, cfg)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(inds), binds)


def test_search_matches_bruteforce_with_flow():
    rng = np.random.default_rng(8)
    video = rng.uniform(0, 255, (5, 3, 48, 40)).astype(np.float32)
    fflow = rng.uniform(-3, 3, (5, 2, 48, 40)).astype(np.float32)
    bflow = rng.uniform(-3, 3, (5, 2, 48, 40)).astype(np.float32)
    cfg = _mk_cfg(pt=2, dist_chnls=3)
    # contract: sites satisfy t <= T - pt (the lattice guarantees this)
    sites = np.array([[2, 10, 12], [1, 30, 20], [3, 41, 33]], np.int32)
    vals, inds = exec_search(jnp.asarray(video), jnp.asarray(sites),
                             jnp.asarray(fflow), jnp.asarray(bflow), cfg)
    bvals, binds = brute_force_search(video, sites, cfg, fflow, bflow)
    np.testing.assert_allclose(np.asarray(vals), bvals, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(inds), binds)


def test_self_patch_first_and_zero_distance():
    rng = np.random.default_rng(9)
    video = rng.uniform(0, 255, (3, 3, 40, 40)).astype(np.float32)
    zf = np.zeros((3, 2, 40, 40), np.float32)
    cfg = _mk_cfg(offset=0.0)
    sites = np.array([[1, 9, 11]], np.int32)
    vals, inds = exec_search(jnp.asarray(video), jnp.asarray(sites),
                             jnp.asarray(zf), jnp.asarray(zf), cfg)
    t, y, x = idx2coords(int(inds[0, 0]), 3, 40, 40)
    assert (t, y, x) == (1, 9, 11)
    assert abs(float(vals[0, 0])) < 1e-6
    assert np.all(np.diff(np.asarray(vals[0])) >= -1e-7)  # ascending


def test_track_centers_zero_flow_identity():
    zf = jnp.zeros((4, 2, 32, 32), jnp.float32)
    sites = jnp.asarray(np.array([[1, 5, 6], [2, 30, 31]], np.int32))
    cen = track_centers(sites, zf, zf, 2, 2, (4, 3, 32, 32))
    assert cen.shape == (2, 5, 2)
    for i in range(5):
        np.testing.assert_array_equal(np.asarray(cen[:, i]),
                                      np.asarray(sites[:, 1:]))


def test_needle_mode_runs_and_selects_self():
    rng = np.random.default_rng(10)
    video = rng.uniform(0, 255, (3, 3, 64, 64)).astype(np.float32)
    zf = np.zeros((3, 2, 64, 64), np.float32)
    cfg = _mk_cfg(stype="needle", offset=0.0)
    sites = np.array([[1, 20, 22]], np.int32)
    vals, inds = exec_search(jnp.asarray(video), jnp.asarray(sites),
                             jnp.asarray(zf), jnp.asarray(zf), cfg)
    t, y, x = idx2coords(int(inds[0, 0]), 3, 64, 64)
    assert (t, y, x) == (1, 20, 22)
    assert abs(float(vals[0, 0])) < 1e-5
