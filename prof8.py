import time, numpy as np, jax, jax.numpy as jnp
from vnlb_tpu.config import default_config
from vnlb_tpu.api import denoise
from vnlb_tpu.testing.data import add_noise, synthetic_video
from vnlb_tpu.utils.metrics import compute_psnr

clean = synthetic_video(3, 64, 64, seed=0)
sigma = 20.0
noisy = add_noise(clean, sigma, seed=1)
cfg = default_config(sigma, preset="iphone", eig_method="rational")
t0 = time.perf_counter()
d, b, dt1 = denoise(noisy, sigma, cfg=cfg)
print(f"compile+run: {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
d, b, dt2 = denoise(noisy, sigma, cfg=cfg)
print(f"steady: {time.perf_counter()-t0:.2f}s", flush=True)
print(f"psnr noisy={compute_psnr(noisy, clean):.2f} basic={compute_psnr(np.asarray(b), clean):.2f} deno={compute_psnr(np.asarray(d), clean):.2f}")
