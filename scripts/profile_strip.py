#!/usr/bin/env python
"""Phase split of the per-strip halo tile computation (jitted-prefix
marginal, the scripts/profile_marginal.py technique): times the full
_strip_tile_jit and the search-truncated prefix for one interior strip of
the 480p/8 halo-SP mesh, per stage — locates the per-strip overhead that
the shard_fn-direct 480p artifact exposed (BENCH_480P_SP.json: mesh wall
~10x the strip proxy)."""

import _bootstrap  # noqa: F401
import argparse
import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--ndev", type=int, default=8)
    ap.add_argument("--strip", type=int, default=3)
    ap.add_argument("--step_s", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vnlb_tpu.config import default_config
    from vnlb_tpu.ops import color
    from vnlb_tpu.ops.search_dense import exec_search_dense_tile
    from vnlb_tpu.parallel.halo import (_coarse_full_single,
                                        _plan_strip_sites, _strip_geometry)
    from vnlb_tpu.pipeline import accumulate, proc_nl
    from vnlb_tpu.testing.data import add_noise, synthetic_video

    cfg_all = default_config(20.0, preset="iphone", eig_method="poly",
                             step_s=args.step_s, border_mode="mask")
    clean = synthetic_video(args.frames, args.h, args.w, seed=0)
    noisy = add_noise(clean, 20.0, seed=1)
    zf = np.zeros((args.frames, 2, args.h, args.w), np.float32)
    basic = np.asarray(proc_nl(noisy, None, None, zf, zf, cfg_all.stage(0)))
    log("basic ready")

    t_len, c, h, w = noisy.shape
    for stage in (0, 1):
        cfg = cfg_all.stage(stage)
        halo, hs, h_run = _strip_geometry(noisy.shape, cfg, args.ndev)
        shape = (t_len, c, h_run, w)
        sb, vb, gy = _plan_strip_sites(shape, cfg, args.ndev, halo, 0)
        end_t = t_len - cfg.pt + 1
        qrow0 = tuple((f % cfg.step_s) if f < end_t - 1 else 0
                      for f in range(end_t))
        noisy_yuv = np.asarray(color.rgb2yuv(jnp.asarray(noisy)))
        basic_yuv = np.asarray(color.rgb2yuv(jnp.asarray(basic)))
        srch_full = basic_yuv if cfg.srch_img == "basic" else noisy_yuv
        i = args.strip

        def tile_of(img):
            t0 = i * hs - halo
            tile = np.zeros(img.shape[:2] + (hs + 2 * halo, w), np.float32)
            lo, hi = max(t0, 0), min(t0 + hs + 2 * halo, h_run)
            tile[:, :, lo - t0:hi - t0] = img[:, :, lo:hi]
            return tile

        n_tile = jnp.asarray(tile_of(noisy_yuv))
        b_tile = jnp.asarray(tile_of(basic_yuv))
        cfgm = cfg.replace(border_mode="mask")
        coarse = _coarse_full_single(jnp.asarray(srch_full), cfgm, hs)
        tile_shape = (t_len, c, hs + 2 * halo, w)
        hp_g = h_run - cfg.ps + 1
        sbj = jnp.asarray(sb[i])
        vbj = jnp.asarray(vb[i])
        gyj = jnp.asarray(gy[i])
        br = jnp.int32(i * hs - halo)

        @functools.partial(jax.jit, static_argnames=("prof_upto",))
        def run(n_t, b_t, sbx, vbx, gyx, brx, co, prof_upto=""):
            srch_tile = b_t if cfg.srch_img == "basic" else n_t

            def dense_fn(srch, dense_sites):
                return exec_search_dense_tile(
                    srch, dense_sites.reshape(-1, 3), gyx.reshape(-1),
                    cfgm, qrow0, brx, hp_g, co)

            out = accumulate(n_t, b_t, srch_tile, None, None, sbx, vbx,
                             cfgm, tile_shape, axis_name=None,
                             n_dense_batches=sbx.shape[0],
                             dense_search_fn=dense_fn,
                             prof_upto=prof_upto)
            if prof_upto:
                return out
            return jnp.sum(out[0]) + jnp.sum(out[1])

        # axon tunnel: block_until_ready does not wait — force with a
        # scalar read and subtract the measured round trip
        trivial = jax.jit(lambda x: jnp.sum(x))
        z8 = jnp.zeros((8, 8), jnp.float32)
        float(trivial(z8))
        def _timeone(fn):
            t0 = time.perf_counter()
            fn()
            return time.perf_counter() - t0

        rt = min(_timeone(lambda: float(trivial(z8))) for _ in range(8))
        for pu in ("search", ""):
            fn = lambda: float(run(n_tile, b_tile, sbj, vbj, gyj, br,
                                   coarse, prof_upto=pu))
            fn()
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                fn()
                best = min(best, time.perf_counter() - t0)
            best = max(best - rt, 0.0)
            print(f"stage {stage} strip {i} prof_upto={pu or 'FULL':7s}: "
                  f"{best:.3f}s  (rt {rt*1e3:.0f} ms subtracted)")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
