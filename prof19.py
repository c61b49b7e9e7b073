import functools, time
import jax, jax.numpy as jnp
import numpy as np
from vnlb_tpu.config import default_config
from vnlb_tpu.ops import agg, bayes, color, flat, gather, search
from vnlb_tpu.pipeline import plan_sites, precompute_inds
from vnlb_tpu.testing.data import add_noise, synthetic_video

t, h, w = 5, 480, 854
sigma = 20.0
clean = synthetic_video(t, h, w, seed=0)
noisy = jnp.asarray(add_noise(clean, sigma, seed=1))
zf = jnp.zeros((t, 2, h, w), jnp.float32)
shape = (t, 3, h, w)
c = 3

@functools.partial(jax.jit, static_argnames=("cfg", "mode", "nd"))
def run(noisy, sb, vb, cfg, mode, nd):
    t_len = shape[0]
    hp, wp = h - cfg.ps + 1, w - cfg.ps + 1
    d = c * cfg.ps * cfg.ps
    yuv = color.rgb2yuv(noisy)
    inds_b = precompute_inds(yuv, zf, zf, sb, cfg, shape, nd)
    if mode == "searchonly":
        return jnp.sum(inds_b)
    cols, _ = gather.cols_rows(gather.im2col(yuv, cfg.ps))
    acc0 = jnp.zeros((t_len * hp * wp, d), jnp.float32)
    wacc0 = jnp.zeros((t_len * hp * wp,), jnp.float32)
    def body(carry, xs):
        acc, wacc = carry
        valid, inds = xs
        rows = gather.inds_to_rows(inds, shape, cfg.ps, cfg.pt)
        pn = gather.fill_patches_cols(cols, rows, cfg.pt, cfg.ps, c)
        if mode == "gather":
            return (acc + jnp.sum(pn), wacc), None
        if cfg.step == 1:
            flags = flat.flat_areas(pn, cfg.gamma, cfg.sigma2)
            pf, _ = bayes.bayes_denoise(pn, pn, flags, cfg)
        else:
            pf, _ = bayes.bayes_denoise(pn, None, None, cfg)
        if mode == "bayes":
            return (acc + jnp.sum(pf), wacc), None
        vk = valid[:, None] & (inds >= 0)
        acc, wacc = agg.agg_rows(acc, wacc, pf, rows, vk)
        return (acc, wacc), None
    (a, wts), _ = jax.lax.scan(body, (acc0, wacc0), (vb, inds_b))
    return jnp.sum(a) + jnp.sum(wts)

for step in (0, 1):
    cfg = default_config(sigma, preset="iphone", eig_method="rational",
                         step_s=[5,5]).stage(step)
    sb, vb, nd = plan_sites(shape, cfg, True)
    sbj, vbj = jnp.asarray(sb), jnp.asarray(vb)
    for mode in ("searchonly", "gather", "bayes", "agg"):
        _ = float(run(noisy, sbj, vbj, cfg, mode, nd))
        t0 = time.perf_counter()
        for _ in range(2):
            _ = float(run(noisy, sbj, vbj, cfg, mode, nd))
        dt = (time.perf_counter()-t0)/2
        print(f"step{step} upto={mode:10s}: {dt:.2f}s ({sb.shape[0]} batches)", flush=True)
