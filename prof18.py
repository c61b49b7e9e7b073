import time
import jax.numpy as jnp
import numpy as np
from vnlb_tpu.config import default_config
from vnlb_tpu.api import denoise
from vnlb_tpu.testing.data import add_noise, synthetic_video
from vnlb_tpu.utils.metrics import compute_psnr

t, h, w = 5, 480, 854
sigma = 20.0
clean = synthetic_video(t, h, w, seed=0)
noisy = add_noise(clean, sigma, seed=1)

for ss in (6, 7):
    cfg = default_config(sigma, preset="iphone", eig_method="rational", step_s=[ss, ss])
    t0 = time.perf_counter()
    d, b, _ = denoise(noisy, sigma, cfg=cfg)
    _ = float(jnp.sum(d))
    print(f"step_s={ss} warmup {time.perf_counter()-t0:.0f}s", flush=True)
    ts = []
    for _ in range(2):
        t0 = time.perf_counter()
        d, b, _ = denoise(noisy, sigma, cfg=cfg)
        _ = float(jnp.sum(d)) + float(jnp.sum(b))
        ts.append(time.perf_counter()-t0)
    print(f"step_s={ss}: {min(ts):.2f}s ({t/min(ts):.3f} fps) deno={compute_psnr(np.asarray(d), clean):.3f}", flush=True)
