#!/usr/bin/env python
"""A/B one-pass wall time across config knob values on the live device.

Usage: python scripts/ab_pass.py --step 1 --knob bsize --values 256,512,1024
Times proc_nl (full pass) per value; scalar fetch forces remote execution.
"""

import _bootstrap  # noqa: F401
import argparse
import time

import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.pipeline import proc_nl
from vnlb_tpu.testing.data import add_noise, synthetic_video


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", type=int, default=1)
    ap.add_argument("--t", type=int, default=5)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--step_s", type=int, default=6)
    ap.add_argument("--preset", default="iphone")
    ap.add_argument("--knob", default="bsize")
    ap.add_argument("--values", default="256,512,1024")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    t, h, w = args.t, args.h, args.w
    clean = synthetic_video(t, h, w, seed=0)
    noisy = jnp.asarray(add_noise(clean, args.sigma, seed=1))
    zf = jnp.zeros((t, 2, h, w), jnp.float32)

    def cast(v):
        try:
            return int(v)
        except ValueError:
            try:
                return float(v)
            except ValueError:
                return v

    for val in [cast(v) for v in args.values.split(",")]:
        cfg = default_config(args.sigma, preset=args.preset,
                            step_s=args.step_s, border_mode="mask"
                            ).stage(args.step).replace(**{args.knob: val})
        basic = noisy if args.step else None

        def run():
            out = proc_nl(noisy, basic, None, zf, zf, cfg, zero_flow=True)
            return float(jnp.sum(out))

        run()  # compile
        best = min(
            (lambda t0: (run(), time.perf_counter() - t0)[1])(
                time.perf_counter())
            for _ in range(args.reps))
        print(f"step {args.step} {args.knob}={val}: {best:.3f}s", flush=True)


if __name__ == "__main__":
    main()
