"""Pipeline parallelism (SURVEY §2.3 PP): two passes on two devices,
overlapped over temporal chunks — output must equal denoise_streaming."""

import numpy as np

from vnlb_tpu.api import denoise_streaming
from vnlb_tpu.config import default_config
from vnlb_tpu.parallel.pipe import denoise_pipelined
from vnlb_tpu.testing.data import add_noise, synthetic_video


def _small_cfg(sigma):
    # tiny temporal window so ctx = 2*nwt+pt-1 stays small and a 12-frame
    # clip yields true sub-window chunks
    return default_config(sigma, preset="iphone",
                          nwt_b=[1, 1], nwt_f=[1, 1], npatches=[12, 10],
                          bsize=[64, 64], border_mode=["mask", "mask"])


def test_pipelined_equals_streaming():
    sigma = 20.0
    clean = synthetic_video(12, 36, 40, seed=0)
    noisy = add_noise(clean, sigma, seed=1)
    cfg = _small_cfg(sigma)

    d_s, b_s, _ = denoise_streaming(noisy, sigma, chunk=3, cfg=cfg)
    d_p, b_p, _ = denoise_pipelined(noisy, sigma, chunk=3, cfg=cfg)

    # same chunk windows, same finalized basic frames, same lattice
    # anchoring -> identical computations on identical devices
    np.testing.assert_array_equal(b_p, b_s)
    np.testing.assert_array_equal(d_p, d_s)


def test_pipelined_single_chunk():
    """Degenerate one-chunk video still works (lag > n_chunks)."""
    sigma = 20.0
    clean = synthetic_video(4, 36, 40, seed=2)
    noisy = add_noise(clean, sigma, seed=3)
    cfg = _small_cfg(sigma)

    d_s, b_s, _ = denoise_streaming(noisy, sigma, chunk=8, cfg=cfg)
    d_p, b_p, _ = denoise_pipelined(noisy, sigma, chunk=8, cfg=cfg)
    np.testing.assert_array_equal(b_p, b_s)
    np.testing.assert_array_equal(d_p, d_s)
