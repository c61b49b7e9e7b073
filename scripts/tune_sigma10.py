"""Sweep poly_deg_fused at sigma=10/40 to restore the <=0.1 dB budget.

The fused econ gate's transition width is ~1.2*(pi/deg)*sqrt(tau*lub);
tau = thresh*sigma^2 shrinks 4x at sigma=10, so width/tau grows ~2x and the
sigma=20-tuned degree leaks noise eigenvalues (test_polyspec sigma-sweep
caught basic delta 0.136 dB).  Find the minimal degree restoring the budget.
"""

import sys

sys.path.insert(0, ".")
import numpy as np
import jax.numpy as jnp

from vnlb_tpu.api import denoise
from vnlb_tpu.config import default_config
from vnlb_tpu.testing.data import add_noise, synthetic_video
from vnlb_tpu.utils.metrics import compute_psnr


def run(sigma, deg):
    clean = synthetic_video(3, 40, 40, seed=5)
    noisy = add_noise(clean, sigma, seed=6)
    cfg_exact = default_config(sigma, preset="iphone", eig_method="jacobi")
    kw = {} if deg is None else dict(poly_deg_fused=[deg, deg])
    cfg_fast = default_config(sigma, preset="iphone", eig_method="poly", **kw)
    d_e, b_e, _ = denoise(noisy, sigma, cfg=cfg_exact)
    d_f, b_f, _ = denoise(noisy, sigma, cfg=cfg_fast)
    p = lambda x: compute_psnr(np.asarray(x), clean)
    print(f"sigma={sigma} deg={deg}: basic {p(b_e):.3f}/{p(b_f):.3f} "
          f"(d={abs(p(b_e)-p(b_f)):.3f})  deno {p(d_e):.3f}/{p(d_f):.3f} "
          f"(d={abs(p(d_e)-p(d_f)):.3f})", flush=True)


for deg in [None, 20, 24, 28, 32]:
    run(10.0, deg)
for deg in [None, 12, 16]:
    run(40.0, deg)
