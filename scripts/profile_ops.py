#!/usr/bin/env python
"""Per-op TPU timing breakdown for the pipeline hot loop.

WARNING (axon tunnel): timings in this script rely on
jax.block_until_ready, which does NOT wait for device completion
on the tunneled backend — use the scalar-fetch protocol of
scripts/profile_marginal.py / bench_480p_sp.py instead; this
script is kept for its structure, not its absolute numbers.
"""

import _bootstrap  # noqa: F401
import time

import jax
import jax.numpy as jnp
import numpy as np

from vnlb_tpu.config import default_config
from vnlb_tpu.ops import agg, bayes, flat, gather, search
from vnlb_tpu.ops.mask import batched_sites
from vnlb_tpu.testing.data import add_noise, synthetic_video


def timeit(fn, *args, n=5, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    t, h, w = 3, 128, 128
    sigma = 20.0
    clean = synthetic_video(t, h, w, seed=0)
    noisy = jnp.asarray(add_noise(clean, sigma, seed=1))
    zf = jnp.zeros((t, 2, h, w), jnp.float32)
    shape = (t, 3, h, w)

    for step in (0, 1):
        cfg = default_config(sigma, preset="iphone").stage(step)
        sb, vb = batched_sites(shape, cfg)
        nb = sb.shape[0]
        sites = jnp.asarray(sb[0])
        valid = jnp.asarray(vb[0])
        print(f"\n== step {step}: {nb} batches of {cfg.bsize} "
              f"(stype={cfg.stype}, K={cfg.npatches}, pt={cfg.pt}, "
              f"c_d={cfg.dist_chnls})")

        t_search = timeit(search.exec_search, noisy, sites, zf, zf, cfg)
        print(f"search      : {t_search * 1e3:8.2f} ms/batch "
              f"-> {t_search * nb:6.2f} s/pass")

        vals, inds = search.exec_search(noisy, sites, zf, zf, cfg)
        t_gather = timeit(gather.fill_patches, noisy, inds, cfg.pt, cfg.ps)
        print(f"gather      : {t_gather * 1e3:8.2f} ms/batch "
              f"-> {t_gather * nb:6.2f} s/pass")

        pnoisy = gather.fill_patches(noisy, inds, cfg.pt, cfg.ps)
        if step == 1:
            flags = flat.flat_areas(pnoisy, cfg.gamma, cfg.sigma2)
            bfun = jax.jit(lambda a, b, f: bayes.bayes_denoise(a, b, f, cfg))
            t_bayes = timeit(bfun, pnoisy, pnoisy, flags)
        else:
            bfun = jax.jit(lambda a: bayes.bayes_denoise(a, None, None, cfg))
            t_bayes = timeit(bfun, pnoisy)
        print(f"bayes       : {t_bayes * 1e3:8.2f} ms/batch "
              f"-> {t_bayes * nb:6.2f} s/pass")

        deno0 = jnp.zeros((t * h * w, 3), jnp.float32)
        wts0 = jnp.zeros((t * h * w,), jnp.float32)
        t_agg = timeit(agg.agg_patches, deno0, wts0, pnoisy, inds, valid,
                       cfg.pt, cfg.ps, shape)
        print(f"agg         : {t_agg * 1e3:8.2f} ms/batch "
              f"-> {t_agg * nb:6.2f} s/pass")


if __name__ == "__main__":
    main()
