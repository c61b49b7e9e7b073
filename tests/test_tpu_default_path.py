"""End-to-end pin of the TPU-default production configuration on CPU.

The TPU bench runs: strided-query smat Pallas kernel (level 0) + dense
Pallas kernel (needle coarse levels) + gram/pack2 econ poly filter +
deferred one-shot scatter + masked borders.  CPU tests normally take the
XLA dense path (dense_impl auto), so this file forces dense_impl="pallas"
(interpret mode) to exercise the exact TPU code-path COMBINATION
end-to-end and pins its PSNR against the XLA-path result — de-risking
the bench configuration without TPU hardware.
"""

import numpy as np

from vnlb_tpu.api import denoise
from vnlb_tpu.config import default_config
from vnlb_tpu.testing.data import add_noise, synthetic_video
from vnlb_tpu.utils.metrics import compute_psnr


def test_production_tpu_path_end_to_end():
    sigma = 20.0
    clean = synthetic_video(3, 48, 52, seed=9)
    noisy = add_noise(clean, sigma, seed=10)

    kw = dict(preset="iphone", eig_method="poly", step_s=6,
              border_mode="mask")
    cfg_x = default_config(sigma, **kw, dense_impl="xla")
    cfg_p = default_config(sigma, **kw, dense_impl="pallas")

    d_x, b_x, _ = denoise(noisy, sigma, cfg=cfg_x)
    d_p, b_p, _ = denoise(noisy, sigma, cfg=cfg_p)

    p_dx = compute_psnr(np.asarray(d_x), clean)
    p_dp = compute_psnr(np.asarray(d_p), clean)
    p_bx = compute_psnr(np.asarray(b_x), clean)
    p_bp = compute_psnr(np.asarray(b_p), clean)

    # the smat kernel's fp noise only swaps near-tie candidates: the two
    # paths must agree well inside the 0.1 dB parity budget
    assert abs(p_dp - p_dx) < 0.10, (p_dp, p_dx)
    assert abs(p_bp - p_bx) < 0.10, (p_bp, p_bx)
    # and both must actually denoise
    assert p_dp > compute_psnr(noisy, clean) + 4.0
