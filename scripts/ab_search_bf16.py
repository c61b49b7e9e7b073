#!/usr/bin/env python
"""Bench-scale A/B for cfg.search_bf16 (judge r3 #2 leftover lever).

Runs the production two-pass denoise at the bench shapes with the knob off
and on, reports wall per rep + PSNR pair for each.  Decides the config
default: flip to True iff it is faster AND |dPSNR| <= 0.02 dB on both
outputs.
"""

import _bootstrap  # noqa: F401
import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vnlb_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax.numpy as jnp

from vnlb_tpu import default_config, denoise
from vnlb_tpu.testing.data import add_noise, synthetic_video


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=5)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--step_s", type=int, default=6)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    clean = jnp.asarray(synthetic_video(args.t, args.h, args.w, seed=0))
    noisy = jnp.asarray(add_noise(
        synthetic_video(args.t, args.h, args.w, seed=0), args.sigma, seed=1))
    _ = float(jnp.sum(noisy))

    def psnr(x):
        mse = jnp.mean((jnp.asarray(x, jnp.float32) - clean) ** 2)
        return float(10.0 * jnp.log10(255.0 ** 2 / mse))

    for bf16 in (False, True):
        cfg = default_config(args.sigma, preset="iphone", eig_method="poly",
                             step_s=args.step_s, border_mode="mask",
                             search_bf16=[bf16, bf16])
        t0 = time.perf_counter()
        deno, basic, _ = denoise(noisy, args.sigma, cfg=cfg)
        pb, pd = psnr(basic), psnr(deno)
        print(f"search_bf16={bf16}: warmup {time.perf_counter()-t0:.1f}s "
              f"psnr basic={pb:.4f} deno={pd:.4f}", flush=True)
        best = float("inf")
        for i in range(args.reps):
            t0 = time.perf_counter()
            deno, basic, _ = denoise(noisy, args.sigma, cfg=cfg)
            _ = float(jnp.sum(deno)) + float(jnp.sum(basic))
            dt = time.perf_counter() - t0
            best = min(best, dt)
            print(f"  rep {i}: {dt:.3f}s", flush=True)
        print(f"search_bf16={bf16}: best {best:.3f}s "
              f"({args.t/best:.3f} fps)", flush=True)


if __name__ == "__main__":
    main()
