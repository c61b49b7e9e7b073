#!/usr/bin/env python
"""BASELINE scale-out config, measured: 1080p 100-frame STREAMING denoise,
halo-SP sharded (round-4 judge item #5a — no artifact had ever timed even
one streaming chunk of this config on the real chip).

Method (the BENCH_480P_SP.json method, applied to one streaming chunk):
`denoise_streaming` processes each pass in chunk windows of
``chunk + 2*ctx`` frames (ctx = 2*nwt + pt - 1 = 21 at the iphone preset's
nwt=10) and keeps ``chunk`` output frames; under ``mesh=`` every window is
one `proc_nl_halo` call.  So the per-chip cost of one chunk is the
per-strip tile wall of a window-sized video — measured here with
`strip_runner` (device-resident inputs, pre-supplied halos + coarse
pyramid; pinned == mesh by test_strip_single_matches_mesh) on the real
chip, worst strip over all 8.

    v5e-8 100-frame wall ~= n_chunks * (stage0_strip + stage1_strip)
    n_chunks = ceil(100 / chunk) per pass (passes stream sequentially)

Stage-1 strips are timed against a STAND-IN basic (= noisy): the wall is
shape-determined; basic content changes candidate choices but not the
graph.  Extrapolation assumes collectives free on ICI (see
BENCH_480P_SP.json) and ignores the host-side basic assembly between
passes (numpy slicing, ~ms/chunk).

Usage: python scripts/bench_1080p_stream.py [--chunk 12] [--ndev 8]
"""

import _bootstrap  # noqa: F401
import argparse
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _timeone(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=12)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--ndev", type=int, default=8,
                    help="number of STRIPS (sub-strips when > --chips)")
    ap.add_argument("--chips", type=int, default=None,
                    help="physical chips; each runs ndev/chips sub-strips "
                         "SEQUENTIALLY per chunk (the 54-frame exact-ctx "
                         "window OOMs 16 GB HBM at 8-strip tiles — "
                         "measured 33.25G program at 164-row tiles — so "
                         "v5e-8 runs narrower strips in sequence)")
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--step_s", type=int, default=6)
    ap.add_argument("--h", type=int, default=1080)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--strips", type=int, nargs="*", default=None,
                    help="strip indices to time (default: 0, mid, last)")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vnlb_tpu.config import default_config
    from vnlb_tpu.parallel.halo import _strip_geometry, strip_runner
    from vnlb_tpu.testing.data import add_noise, synthetic_video

    cfg = default_config(args.sigma, preset="iphone", eig_method="poly",
                         step_s=args.step_s, border_mode="mask")
    ctx = 2 * max(cfg.stage(0).nwt_b, cfg.stage(0).nwt_f) \
        + cfg.stage(1).pt - 1
    win = min(args.frames, args.chunk + 2 * ctx)
    n_chunks = -(-args.frames // args.chunk)
    halo, hs, h_run = _strip_geometry(
        (win, 3, args.h, args.w), cfg.stage(0), args.ndev)
    log(f"[1080p-stream] devices: {jax.devices()}")
    log(f"[1080p-stream] window {win}f (chunk {args.chunk} + 2*ctx {ctx}), "
        f"{n_chunks} chunks/pass, strips {hs}+2*{halo} rows x {args.w}")

    # host-side generation of a 54f 1080p clip costs many minutes of
    # numpy; cache it so reruns (tunnel stalls, compile-budget kills)
    # skip straight to the device work
    import os
    cache = (f"/tmp/vnlb_stream_noisy_{win}_{args.h}_{args.w}_"
             f"{args.sigma:g}.npy")
    if os.path.exists(cache):
        noisy = np.load(cache)
        log(f"[1080p-stream] loaded cached noisy {cache}")
    else:
        clean = synthetic_video(win, args.h, args.w, seed=0)
        noisy = add_noise(clean, args.sigma, seed=1)
        np.save(cache, noisy)
    basic_standin = noisy  # wall is shape-determined; see module docstring

    comb = jax.jit(lambda a, b: jnp.sum(a) + jnp.sum(b))

    def forced(run):
        return float(comb(*run()))

    trivial = jax.jit(lambda x: jnp.sum(x))
    z8 = jnp.zeros((8, 8), jnp.float32)
    float(trivial(z8))
    rt = min(_timeone(lambda: float(trivial(z8))) for _ in range(8))
    log(f"[1080p-stream] tunnel round-trip baseline {rt * 1e3:.1f} ms")

    strips = args.strips
    if not strips:
        strips = sorted({0, args.ndev // 2, args.ndev - 1})
    walls = {0: {}, 1: {}}
    for stage, b in ((0, None), (1, basic_standin)):
        scfg = cfg.stage(stage)
        for i in strips:
            run, _ = strip_runner(noisy, b, scfg, args.ndev, i)
            t0 = time.perf_counter()
            forced(run)                             # compile + warm
            log(f"[1080p-stream] stage {stage} strip {i} warm "
                f"{time.perf_counter() - t0:.1f}s")
            best = float("inf")
            for _ in range(args.reps):
                best = min(best, _timeone(lambda: forced(run)))
            best = max(best - rt, 0.0)
            walls[stage][i] = best
            log(f"[1080p-stream] stage {stage} strip {i}: {best:.3f}s")

    chips = args.chips or args.ndev
    seq = -(-args.ndev // chips)          # sub-strips per chip, sequential
    per_strip = {i: walls[0][i] + walls[1][i] for i in strips}
    chunk_wall = seq * max(per_strip.values())
    total = n_chunks * chunk_wall
    fps = args.frames / total
    log(f"[1080p-stream] worst strip {max(per_strip.values()):.3f}s x "
        f"{seq} sequential sub-strips/chip -> chunk wall {chunk_wall:.3f}s "
        f"-> {n_chunks} chunks -> {total:.1f}s for {args.frames}f 1080p "
        f"({fps:.2f} fps) extrapolated v5e-{chips}")

    rec = {
        "metric": f"v5e{chips}_1080p_{args.frames}f_stream_wall_s",
        "value": round(total, 2),
        "unit": "seconds",
        "fps": round(fps, 4),
        "chunk": args.chunk,
        "ctx": ctx,
        "window_frames": win,
        "n_chunks_per_pass": n_chunks,
        "n_strips": args.ndev,
        "substrips_per_chip_sequential": seq,
        "strip_rows": hs,
        "halo_rows": halo,
        "chunk_wall_s": round(chunk_wall, 4),
        "stage0_walls_s": {str(i): round(v, 4)
                           for i, v in walls[0].items()},
        "stage1_walls_s": {str(i): round(v, 4)
                           for i, v in walls[1].items()},
        "method": "strip_runner per chunk window (device-resident; "
                  "== mesh per test_strip_single_matches_mesh); stage-1 "
                  "timed with stand-in basic (shape-determined wall)",
        "assumption": "collectives free on ICI; host basic assembly "
                      "between passes excluded (~ms/chunk numpy); tunnel "
                      "round-trip (rt_ms) subtracted from every wall; "
                      "when n_strips > chips, each chip runs its "
                      "sub-strips SEQUENTIALLY per chunk (the exact-ctx "
                      "54f window needs 33.25G HBM at 164-row tiles — "
                      "measured OOM — so v5e-8 uses narrower strips)",
        "rt_ms": None,
        "date": time.strftime("%Y-%m-%d"),
    }
    rec["rt_ms"] = round(rt * 1e3, 2)
    line = json.dumps(rec)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
