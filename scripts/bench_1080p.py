#!/usr/bin/env python
"""1080p scale-out evidence on ONE real chip (BASELINE.md v5e-8 target).

The halo-SP path splits H across the mesh; under zero flow every strip's
work is independent except the ppermute halo exchange (2 x halo x W x C
floats per step — bandwidth-trivial on ICI).  So ONE chip running ONE
strip-sized clip measures the per-chip wall of the v5e-8 1080p config, and

    v5e-8 fps ~= frames / strip_wall

is an honest extrapolation (all strips run concurrently; the exchange is
overlapped/trivial).  The multi-strip seam CORRECTNESS is pinned separately
on the 8-device CPU mesh (tests/test_halo.py, incl. the 1080-row auto-pad).

Usage: python scripts/bench_1080p.py [--frames 5] [--ndev 8]
"""

import _bootstrap  # noqa: F401
import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--step_s", type=int, default=6)
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vnlb_tpu.config import default_config
    from vnlb_tpu.parallel.halo import _halo_rows
    from vnlb_tpu.api import denoise
    from vnlb_tpu.testing.data import add_noise, synthetic_video

    cfg = default_config(args.sigma, preset="iphone", eig_method="poly",
                         step_s=args.step_s, border_mode="mask")
    halo = max(_halo_rows(cfg.stage(0)), _halo_rows(cfg.stage(1)))
    h_pad = -(-1080 // (2 * args.ndev)) * 2 * args.ndev    # auto-pad rule
    strip_h = h_pad // args.ndev + 2 * halo
    log(f"[1080p] devices: {jax.devices()}")
    log(f"[1080p] strip: {args.frames}f x {strip_h}x1920 "
        f"(H {h_pad}/{args.ndev} + 2*{halo} halo), stride {args.step_s}")

    clean = synthetic_video(args.frames, strip_h, 1920, seed=0)
    noisy = add_noise(clean, args.sigma, seed=1)

    t0 = time.perf_counter()
    deno, basic, _ = denoise(noisy, args.sigma, cfg=cfg)
    _ = float(jnp.sum(deno))
    log(f"[1080p] warmup (incl. compile): {time.perf_counter() - t0:.1f}s")

    noisy_dev = jnp.asarray(noisy)
    _ = float(jnp.sum(noisy_dev))
    best = float("inf")
    for i in range(args.reps):
        t0 = time.perf_counter()
        deno, basic, _ = denoise(noisy_dev, args.sigma, cfg=cfg)
        _ = float(jnp.sum(deno)) + float(jnp.sum(basic))
        dt = time.perf_counter() - t0
        best = min(best, dt)
        log(f"[1080p] rep {i}: {dt:.3f}s")

    fps1 = args.frames / best
    log(f"[1080p] one-chip strip wall {best:.3f}s -> extrapolated "
        f"v5e-{args.ndev} 1080p two-pass: {fps1:.3f} fps "
        f"({best / args.frames:.3f} s/frame)")
    print(f'{{"metric": "v5e{args.ndev}_1080p_fps_extrapolated", '
          f'"value": {fps1:.4f}, "unit": "frames/sec", '
          f'"strip_wall_s": {best:.3f}, "strip_h": {strip_h}}}')


if __name__ == "__main__":
    main()
