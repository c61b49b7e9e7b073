#!/usr/bin/env python
"""Phase-level wall breakdown of the production pipeline at bench shapes.

Times (per stage): dense search -> inds, im2col, the filter scan
(gather+bayes+scatter), fold, and the full jitted pass, so kernel work can be
aimed at the dominant phase (VERDICT round-1: filter phase ~70%).


WARNING (axon tunnel): timings in this script rely on
jax.block_until_ready, which does NOT wait for device completion
on the tunneled backend — use the scalar-fetch protocol of
scripts/profile_marginal.py / bench_480p_sp.py instead; this
script is kept for its structure, not its absolute numbers.
"""

import _bootstrap  # noqa: F401
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vnlb_tpu.config import default_config
from vnlb_tpu.ops import agg, bayes, color, flat, gather
from vnlb_tpu.ops.search_dense import exec_search_dense
from vnlb_tpu.pipeline import _proc_nl_jit, plan_sites, precompute_inds
from vnlb_tpu.testing.data import add_noise, synthetic_video


def timeit(fn, *args, n=3, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=5)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--step_s", type=int, default=3)
    ap.add_argument("--eig", default="rational")
    ap.add_argument("--preset", default="iphone")
    args = ap.parse_args()

    t, h, w = args.t, args.h, args.w
    clean = synthetic_video(t, h, w, seed=0)
    noisy = jnp.asarray(add_noise(clean, args.sigma, seed=1))
    shape = (t, 3, h, w)
    zf = jnp.zeros((t, 2, h, w), jnp.float32)
    vcfg = default_config(args.sigma, preset=args.preset,
                          eig_method=args.eig, step_s=args.step_s)

    for step in (0, 1):
        cfg = vcfg.stage(step)
        sb, vb, n_dense = plan_sites(shape, cfg, True)
        nb = sb.shape[0]
        nsites = int(vb.sum())
        print(f"\n== step {step}: {nb} batches x {cfg.bsize} "
              f"({nsites} sites, n_dense={n_dense}, K={cfg.npatches}, "
              f"pt={cfg.pt}, stype={cfg.stype})")
        sbj, vbj = jnp.asarray(sb), jnp.asarray(vb)
        yuv = color.rgb2yuv(noisy)

        # phase 1: search
        f_search = jax.jit(lambda v, s: precompute_inds(
            v, zf, zf, s, cfg, shape, n_dense)[1])
        t_search, inds_b = timeit(f_search, yuv, sbj)
        print(f"search (dense+border): {t_search:7.3f} s")

        # phase 2: im2col
        f_cols = jax.jit(lambda v: gather.cols_rows(
            gather.im2col(v, cfg.ps))[0])
        t_cols, cols = timeit(f_cols, yuv)
        print(f"im2col               : {t_cols:7.3f} s")

        # phase 3a: gather rows only
        rows_b = jax.jit(jax.vmap(
            lambda i: gather.inds_to_rows(i, shape, cfg.ps, cfg.pt)))(inds_b)

        def scan_gather(cols_flat, rows_all):
            def body(c, rows):
                p = gather.fill_patches_cols(cols_flat, rows, cfg.pt, cfg.ps, 3)
                return c, jnp.sum(p)
            _, s = jax.lax.scan(body, None, rows_all)
            return s
        t_gather, _ = timeit(jax.jit(scan_gather), cols, rows_b)
        print(f"gather (scan)        : {t_gather:7.3f} s")

        # phase 3b: bayes only (one representative batch, scaled)
        rows0 = rows_b[0]
        pn = gather.fill_patches_cols(cols, rows0, cfg.pt, cfg.ps, 3)
        if step == 1:
            flags = flat.flat_areas(pn, cfg.gamma, cfg.sigma2)
            f_bayes = jax.jit(lambda a: bayes.bayes_denoise(
                a, a, flags, cfg)[0])
        else:
            f_bayes = jax.jit(lambda a: bayes.bayes_denoise(
                a, None, None, cfg)[0])
        t_bayes1, _ = timeit(f_bayes, pn)
        print(f"bayes (x{nb} batches) : {t_bayes1 * nb:7.3f} s "
              f"({t_bayes1 * 1e3:.2f} ms/batch)")

        # phase 3c: scatter only
        hp, wp = h - cfg.ps + 1, w - cfg.ps + 1
        d = 3 * cfg.ps * cfg.ps
        acc0 = jnp.zeros((t * hp * wp, cfg.pt * d + 1), jnp.float32)

        def scan_scatter(acc, rows_all, vb_all, patch):
            def body(a, xs):
                rows, valid = xs
                return agg.agg_rows(a, patch, rows[:, :, 0], valid), None
            a, _ = jax.lax.scan(body, acc, (rows_all, vb_all))
            return a
        vk = vbj[:, :, None] & (inds_b >= 0)
        t_scatter, _ = timeit(jax.jit(scan_scatter), acc0, rows_b, vk, pn)
        print(f"scatter (scan)       : {t_scatter:7.3f} s")

        # phase 4: fold
        t_fold, _ = timeit(
            jax.jit(lambda a: agg.fold(a, cfg.pt, cfg.ps, shape)), acc0)
        print(f"fold                 : {t_fold:7.3f} s")

        # full pass
        t_full, _ = timeit(
            lambda: _proc_nl_jit(noisy, noisy, noisy, zf, zf, sbj, vbj,
                                 cfg, shape, n_dense_batches=n_dense))
        print(f"FULL pass            : {t_full:7.3f} s")


if __name__ == "__main__":
    main()
