"""Flow estimators (TV-L1 + Lucas-Kanade): recover a known translation."""

import numpy as np

from vnlb_tpu.ops.flow import estimate_flows, lk_flow, tvl1_flow


def _shifted_pair(dx, dy, seed=0, n=96):
    rng = np.random.default_rng(seed)
    big = rng.uniform(0, 1, (3, n + 16, n + 16)).astype(np.float32)
    for _ in range(4):  # band-limit
        big = (np.roll(big, 1, -1) + big + np.roll(big, -1, -1)) / 3
        big = (np.roll(big, 1, -2) + big + np.roll(big, -2, -2)) / 3
    f0 = big[:, 8:8 + n, 8:8 + n] * 255
    f1 = big[:, 8 - dy:8 - dy + n, 8 - dx:8 - dx + n] * 255
    return f0, f1


def test_lk_recovers_translation():
    dx, dy = 2, -1
    f0, f1 = _shifted_pair(dx, dy)
    flow = np.asarray(lk_flow(f0, f1, levels=3, iters=5))
    inner = flow[:, 16:-16, 16:-16]
    assert abs(inner[0].mean() - dx) < 0.3, inner[0].mean()
    assert abs(inner[1].mean() - dy) < 0.3, inner[1].mean()


def test_tvl1_recovers_translation():
    # the reference's flow algorithm (svnlb's C++ TV-L1); the jittable
    # re-implementation must track a known shift at least as well as LK
    dx, dy = 2, -1
    f0, f1 = _shifted_pair(dx, dy)
    flow = np.asarray(tvl1_flow(f0, f1, levels=4, iters=15))
    inner = flow[:, 16:-16, 16:-16]
    assert abs(inner[0].mean() - dx) < 0.25, inner[0].mean()
    assert abs(inner[1].mean() - dy) < 0.25, inner[1].mean()
    epe = np.hypot(inner[0] - dx, inner[1] - dy).mean()
    assert epe < 0.5, epe


def test_estimate_flows_layout():
    rng = np.random.default_rng(1)
    video = rng.uniform(0, 255, (3, 3, 48, 48)).astype(np.float32)
    ff, bf = estimate_flows(video, levels=2, iters=1)
    assert ff.shape == (3, 2, 48, 48)
    assert bf.shape == (3, 2, 48, 48)
    np.testing.assert_array_equal(np.asarray(ff[-1]), np.asarray(ff[-2]))
    np.testing.assert_array_equal(np.asarray(bf[0]), np.asarray(bf[1]))
