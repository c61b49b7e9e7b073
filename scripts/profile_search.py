#!/usr/bin/env python
"""Sub-phase wall breakdown of the dense zero-flow search at bench shapes.

Times, per stage: the per-dt dense distance computation (Pallas kernel),
the site-row gather + normalization, and the final top-K — so kernel work
can be aimed at the dominant sub-phase (round-2: search is a top-3 phase).


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
from vnlb_tpu.ops import color
from vnlb_tpu.ops.mask import interior_split, lattice_sites
from vnlb_tpu.ops.search_dense import (_level_dense, _site_rows,
                                       exec_search_dense)
from vnlb_tpu.ops.search import _avg_pool2
from vnlb_tpu.testing.data import add_noise, synthetic_video


def timeit(f, *a, n=3):
    out = f(*a)
    jax.block_until_ready(out)
    # force with scalar fetch (tunneled platforms)
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*a)
        leaves = jax.tree_util.tree_leaves(out)
        _ = float(jnp.sum(leaves[0]))
        best = min(best, time.perf_counter() - t0)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=5)
    ap.add_argument("--h", type=int, default=240)
    ap.add_argument("--w", type=int, default=432)
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--step_s", type=int, default=3)
    ap.add_argument("--preset", default="iphone")
    args = ap.parse_args()

    t, h, w = args.t, args.h, args.w
    clean = synthetic_video(t, h, w, seed=0)
    noisy = jnp.asarray(add_noise(clean, args.sigma, seed=1))
    shape = (t, 3, h, w)
    vcfg = default_config(args.sigma, preset=args.preset, step_s=args.step_s)

    for step in (0, 1):
        cfg = vcfg.stage(step)
        sites_all = lattice_sites(shape, cfg)
        interior, _ = interior_split(sites_all, shape, cfg)
        sites = jnp.asarray(interior)
        yuv = color.rgb2yuv(noisy)
        s_cnt = sites.shape[0]
        w_s, ps, pt = cfg.w_s, cfg.ps, cfg.pt
        n_dt = cfg.n_dt
        print(f"\n== step {step}: {s_cnt} interior sites, K={cfg.npatches}, "
              f"w_s={w_s}, n_dt={n_dt}, pt={pt}, stype={cfg.stype}")

        # full dense search
        f_full = jax.jit(lambda v, s: exec_search_dense(v, s, cfg))
        t_full, _ = timeit(f_full, yuv, sites)
        print(f"exec_search_dense (full): {t_full:7.3f} s")

        # sub-phase: distances for ONE dt at level 0 (x n_dt x levels)
        def dist_one_dt(video):
            fn = _level_dense(video, cfg)
            return fn(0)
        f_d = jax.jit(dist_one_dt)
        t_d, d_all = timeit(f_d, yuv)
        print(f"dense distances 1 dt lvl0: {t_d:7.3f} s "
              f"(x{n_dt} = {t_d * n_dt:.3f} s) out {d_all.shape}")

        # sub-phase: all dts, level 0, no gather/topk (sum to force)
        def dist_all(video):
            fn = _level_dense(video, cfg)
            return sum(jnp.sum(fn(dt)) for dt in range(-cfg.nwt_b,
                                                       cfg.nwt_f + 1))
        t_da, _ = timeit(jax.jit(dist_all), yuv)
        print(f"dense distances all dts lvl0: {t_da:7.3f} s")

        # sub-phase: site-row gather of one dt plane
        lh, lw = yuv.shape[2], yuv.shape[3]
        hp, wp = lh - ps + 1, lw - ps + 1
        half = (w_s - 1) // 2
        rows = _site_rows(sites, 1, hp, wp, lh, lw, ps, half)

        def take_rows(d_all, rows):
            flat = jnp.transpose(d_all, (1, 2, 3, 0)).reshape(-1, w_s * w_s)
            return jnp.take(flat, rows, axis=0)
        f_t = jax.jit(take_rows)
        t_t, cand = timeit(f_t, d_all, rows)
        print(f"transpose+take 1 dt: {t_t:7.3f} s (x{n_dt} = "
              f"{t_t * n_dt:.3f} s) out {cand.shape}")

        # sub-phase: top_k over the full candidate axis
        mv = jnp.tile(cand, (1, n_dt))
        f_k = jax.jit(lambda m: jax.lax.top_k(-m, cfg.npatches))
        t_k, _ = timeit(f_k, mv)
        print(f"top_k (S, {mv.shape[1]}) -> {cfg.npatches}: {t_k:7.3f} s")

        f_ka = jax.jit(lambda m: jax.lax.approx_max_k(-m, cfg.npatches,
                                                      recall_target=0.98))
        t_ka, _ = timeit(f_ka, mv)
        print(f"approx_max_k:             {t_ka:7.3f} s")


if __name__ == "__main__":
    main()
