#!/usr/bin/env python
"""Marginal in-jit phase costs: time jitted pipeline PREFIXES and difference.

profile_phases.py times each phase as a standalone jitted call, which on a
tunneled TPU is dominated by ~25 ms/dispatch — useless for in-scan phases.
Here each prefix (search | +gather | +bayes | full) runs inside ONE jit, so
the differences are the true marginal in-context costs (including fusion).
"""

import _bootstrap  # noqa: F401
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vnlb_tpu.config import default_config
from vnlb_tpu.ops import agg, bayes, color, flat, gather
from vnlb_tpu.pipeline import plan_sites, precompute_inds
from vnlb_tpu.testing.data import add_noise, synthetic_video


def timeit(fn, *args, n=3):
    # a scalar FETCH (not just block_until_ready) is required to force
    # execution on the tunneled axon platform (see bench.py)
    out = float(fn(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best, out


def make_prefix(cfg, shape, n_dense, upto: str, qrow0=None):
    t_len, c, h, w = shape
    hp, wp = h - cfg.ps + 1, w - cfg.ps + 1
    d = c * cfg.ps * cfg.ps

    def fn(noisy, sb, vb, zf):
        yuv = color.rgb2yuv(noisy)
        _, inds_b = precompute_inds(yuv, zf, zf, sb, cfg, shape, n_dense,
                                    qrow0=qrow0)
        if upto == "search":
            return jnp.sum(inds_b)
        cdty = jnp.bfloat16 if cfg.cols_bf16 else jnp.float32
        cols, _ = gather.cols_rows(gather.im2col(yuv, cfg.ps).astype(cdty))
        acc0 = jnp.zeros((t_len * hp * wp, cfg.pt * d + 1), jnp.float32)

        def body(acc, xs):
            valid, inds = xs
            rows = gather.inds_to_rows(inds, shape, cfg.ps, cfg.pt)
            pn = gather.fill_patches_cols(cols, rows, cfg.pt, cfg.ps, c)
            if upto == "gather":
                return acc, jnp.sum(pn)
            if cfg.step == 1:
                flags = (flat.flat_areas(pn, cfg.gamma, cfg.sigma2)
                         if cfg.flat_areas else
                         jnp.zeros((valid.shape[0],), bool))
                pf, _ = bayes.bayes_denoise(pn, pn, flags, cfg)
            else:
                pf, _ = bayes.bayes_denoise(pn, None, None, cfg)
            if upto == "bayes":
                return acc, jnp.sum(pf)
            vk = valid[:, None] & (inds >= 0)
            if cfg.agg_k and cfg.agg_k < cfg.npatches:
                ka = cfg.agg_k
                pf, vk, rows = pf[:, :ka], vk[:, :ka], rows[:, :ka]
            # mirror pipeline.accumulate's deferred global scatter
            b_, k_ = vk.shape
            vm = vk[:, :, None].astype(pf.dtype)
            upd = jnp.concatenate(
                [pf.reshape(b_, k_, cfg.pt * d) * vm, vm], axis=-1)
            return acc, (rows[:, :, 0], upd)

        acc, ys = jax.lax.scan(body, acc0, (vb, inds_b))
        if upto in ("gather", "bayes"):
            return jnp.sum(ys)
        rows_all, upd_all = ys
        if upto == "stack":
            return jnp.sum(rows_all) + jnp.sum(upd_all[:, :, -1])
        acc = acc.at[rows_all.reshape(-1)].add(
            upd_all.reshape(-1, cfg.pt * d + 1), mode="drop")
        if upto == "scatter":
            return jnp.sum(acc[::997])
        deno, wts = agg.fold(acc, cfg.pt, cfg.ps, shape)
        return jnp.sum(deno) + jnp.sum(wts)

    return jax.jit(fn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=5)
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--w", type=int, default=426)
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--step_s", type=int, default=3)
    ap.add_argument("--eig", default="poly")
    ap.add_argument("--preset", default="iphone")
    ap.add_argument("--border", default="mask")
    ap.add_argument("--steps", default="0,1")
    ap.add_argument("--bsize", type=int, default=0)
    ap.add_argument("--prefixes", default="search,gather,bayes,stack,scatter,full")
    args = ap.parse_args()

    t, h, w = args.t, args.h, args.w
    clean = synthetic_video(t, h, w, seed=0)
    noisy = jnp.asarray(add_noise(clean, args.sigma, seed=1))
    shape = (t, 3, h, w)
    zf = jnp.zeros((t, 2, h, w), jnp.float32)
    vcfg = default_config(args.sigma, preset=args.preset,
                         eig_method=args.eig, step_s=args.step_s,
                         border_mode=args.border)

    for step in [int(s) for s in args.steps.split(",")]:
        cfg = vcfg.stage(step)
        if args.bsize:
            cfg = cfg.replace(bsize=args.bsize)
        sb, vb, n_dense = plan_sites(shape, cfg, True)
        sbj, vbj = jnp.asarray(sb), jnp.asarray(vb)
        # production strided-query path (matches pipeline.proc_nl)
        end_t = shape[0] - cfg.pt + 1
        qrow0 = tuple((f % cfg.step_s) if f < end_t - 1 else 0
                      for f in range(end_t)) if n_dense else None
        print(f"\n== step {step}: {sb.shape[0]} batches x {cfg.bsize} "
              f"(n_dense={n_dense}, K={cfg.npatches}, pt={cfg.pt}, "
              f"stype={cfg.stype}, eig={cfg.eig_method})", flush=True)

        prev = 0.0
        for upto in args.prefixes.split(","):
            f = make_prefix(cfg, shape, n_dense, upto, qrow0)
            tt, _ = timeit(f, noisy, sbj, vbj, zf)
            print(f"  upto {upto:7s}: {tt:7.3f} s  (marginal "
                  f"{tt - prev:+7.3f} s)", flush=True)
            prev = tt


if __name__ == "__main__":
    main()
