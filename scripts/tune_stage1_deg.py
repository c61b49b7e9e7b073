"""Can stage 1 run a cheaper fused-series degree? (bayes = 29% of wall)

Stage 1 filters against the nearly-clean basic estimate with thresh=0.7 —
a much easier spectral gate than stage 0's (wide eigen-gap, small tau), so
the sigma-adaptive stage-0 degree may be overkill there.  Measure the
two-pass PSNR delta vs exact eigh for lower stage-1 degrees.
"""

import sys

sys.path.insert(0, ".")
import numpy as np

from vnlb_tpu.api import denoise
from vnlb_tpu.config import default_config
from vnlb_tpu.testing.data import add_noise, synthetic_video
from vnlb_tpu.utils.metrics import compute_psnr


def run(sigma, deg1):
    clean = synthetic_video(3, 40, 40, seed=5)
    noisy = add_noise(clean, sigma, seed=6)
    cfg_exact = default_config(sigma, preset="iphone", eig_method="jacobi")
    cfg = default_config(sigma, preset="iphone", eig_method="poly")
    if deg1 is not None:
        deg0 = cfg.stage(0).poly_deg_fused
        cfg = default_config(sigma, preset="iphone", eig_method="poly",
                             poly_deg_fused=[deg0, deg1])
    d_e, b_e, _ = denoise(noisy, sigma, cfg=cfg_exact)
    d_f, b_f, _ = denoise(noisy, sigma, cfg=cfg)
    p = lambda x: compute_psnr(np.asarray(x), clean)
    print(f"sigma={sigma} deg1={deg1}: basic d={abs(p(b_e)-p(b_f)):.3f} "
          f"deno d={abs(p(d_e)-p(d_f)):.3f}  (deno {p(d_f):.3f})", flush=True)


for sigma in [10.0, 20.0, 40.0]:
    for deg1 in [None, 12, 8]:
        run(sigma, deg1)
