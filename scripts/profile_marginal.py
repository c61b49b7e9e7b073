#!/usr/bin/env python
"""Marginal in-jit phase costs: time jitted pipeline PREFIXES and difference.

profile_phases.py times each phase as a standalone jitted call, which on a
tunneled TPU is dominated by ~25 ms/dispatch — useless for in-scan phases.
Here each prefix runs the PRODUCTION proc_nl truncated after a phase (the
``prof_upto`` static arg of vnlb_tpu/pipeline.py), so the differences are
true marginal in-context costs (including fusion) on the exact graph the
bench runs — no re-implemented shadow pipeline to drift out of date.

Prefixes: search (topk incl.), arena (patch-column unfold + fuse + join),
gather (in-scan row gathers), bayes (filter chain), stack (scan update
stacking), scatter (the one-shot global scatter), full (fold + finalize).
"""

import _bootstrap  # noqa: F401
import argparse
import time

import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.pipeline import proc_nl
from vnlb_tpu.testing.data import add_noise, synthetic_video


def timeit(fn, n=3):
    # a scalar FETCH (not just block_until_ready) is required to force
    # execution on the tunneled axon platform (see bench.py)
    fn()
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=5)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--step_s", type=int, default=6)
    ap.add_argument("--eig", default="poly")
    ap.add_argument("--preset", default="iphone")
    ap.add_argument("--border", default="mask")
    ap.add_argument("--steps", default="0,1")
    ap.add_argument("--bsize", type=int, default=0)
    ap.add_argument("--prefixes",
                    default="search,arena,gather,bayes,stack,scatter,full")
    args = ap.parse_args()

    t, h, w = args.t, args.h, args.w
    clean = synthetic_video(t, h, w, seed=0)
    noisy = jnp.asarray(add_noise(clean, args.sigma, seed=1))
    zf = jnp.zeros((t, 2, h, w), jnp.float32)
    vcfg = default_config(args.sigma, preset=args.preset,
                          eig_method=args.eig, step_s=args.step_s,
                          border_mode=args.border)

    for step in [int(s) for s in args.steps.split(",")]:
        cfg = vcfg.stage(step)
        if args.bsize:
            cfg = cfg.replace(bsize=args.bsize)
        basic = noisy if step else None
        print(f"\n== step {step}: K={cfg.npatches}, pt={cfg.pt}, "
              f"stype={cfg.stype}, eig={cfg.eig_method}, "
              f"bsize={cfg.bsize}", flush=True)

        prev = 0.0
        for upto in args.prefixes.split(","):
            key = "" if upto == "full" else upto

            def run(key=key):
                out = proc_nl(noisy, basic, None, zf, zf, cfg,
                              zero_flow=True, prof_upto=key)
                return float(jnp.sum(out))

            tt = timeit(run)
            print(f"  upto {upto:7s}: {tt:7.3f} s  (marginal "
                  f"{tt - prev:+7.3f} s)", flush=True)
            prev = tt


if __name__ == "__main__":
    main()
