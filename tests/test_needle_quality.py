"""Pin the needle-vs-l2 step-0 quality delta (docs/COMPARE.md "Needle mode").

The reference's step-0 needle distance lives in the unpublished vpss CUDA
package; this framework's pyramid needle is a re-derivation (ops/search.py).
This test bounds the impact of the step-0 distance choice: the two modes
must land within 0.2 dB of each other (measured -0.06 dB basic / -0.03 dB
deno on this clip), so any stand-in/vpss divergence is far inside the 0.1 dB
reference-parity budget attributed to the distance function.
"""

import numpy as np
import pytest

from vnlb_tpu.config import default_config
from vnlb_tpu.pipeline import proc_nl
from vnlb_tpu.testing.data import add_noise, synthetic_video
from vnlb_tpu.utils.metrics import compute_psnr


@pytest.mark.slow
def test_needle_vs_l2_quality_delta():
    t, h, w, sig = 3, 96, 96, 20.0
    clean = synthetic_video(t, h, w, seed=0)
    noisy = add_noise(clean, sig, seed=1)
    zf = np.zeros((t, 2, h, w), np.float32)

    psnr = {}
    for stype in ("needle", "l2"):
        cfg = default_config(sig, preset="iphone", stype=[stype, "l2"])
        basic = proc_nl(noisy, None, None, zf, zf, cfg.stage(0))
        deno = proc_nl(noisy, basic, None, zf, zf, cfg.stage(1))
        psnr[stype] = (compute_psnr(np.asarray(basic), clean),
                       compute_psnr(np.asarray(deno), clean))

    d_basic = psnr["needle"][0] - psnr["l2"][0]
    d_deno = psnr["needle"][1] - psnr["l2"][1]
    assert abs(d_basic) < 0.2, (psnr, d_basic)
    assert abs(d_deno) < 0.2, (psnr, d_deno)
    # both modes must actually denoise
    noisy_psnr = compute_psnr(noisy, clean)
    assert psnr["needle"][1] > noisy_psnr + 5.0
