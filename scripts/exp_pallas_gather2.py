#!/usr/bin/env python
"""Mosaic row-gather, round-2 attempt (round-4 judge item #4): pad the
ARENA row stride to 1024 elements so every per-row DMA source offset is
1024-aligned (the round-3 workaround suggestion), and measure against the
production jnp.take at the stage-1 480p call-site shape.

Shapes: the stage-1 joined arena is (T*H'*W', 2*pt*d) bf16 rows
(pipeline.accumulate join_arenas) — N ~ 2.0M rows of 588 bf16 at 480p;
the gather takes B*K = 256*60 = 15360 rows per batch, ~13 batches/pass.
Memory cost of the pad: 1024/588 = 1.74x the (already bf16) arena.

Run on the real chip; prints ns/row for jnp.take vs the padded-DMA kernel
(dispatch-amortized: ITERS dependent gathers inside one jit).

VERDICT (v5e-1, 2026-08-20): STILL BLOCKED.  jnp.take measures 283 ns/row
at the call-site shape; the 1024-stride padded kernel fails in the axon
remote Mosaic compiler with an opaque INTERNAL error (tpu_compile_helper
subprocess exit 1 — the helper crashes before emitting a diagnostic, so
the 1-D-HBM alignment workaround cannot even be evaluated through this
tunnel).  Third attempt: a TILE-SHAPED (N, sub, 128) arena whose per-row
DMA is a leading-dim (whole-tile) slice — scripts/exp_pallas_gather3.py.
"""

import _bootstrap  # noqa: F401
import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--d", type=int, default=588)
    ap.add_argument("--m", type=int, default=15360)
    ap.add_argument("--iters", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vnlb_tpu.ops.pallas_gather import _ROWPAD, gather_rows_padded

    n, d, m, iters = args.n, args.d, args.m, args.iters
    log(f"devices: {jax.devices()}  N={n} D={d} M={m}")

    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    rows0 = jnp.asarray(rng.integers(0, n, size=m).astype(np.int32))

    # padded flat arena (built once; the pipeline would build it in place
    # of the dense arena)
    colsp = jnp.pad(cols, ((0, 0), (0, _ROWPAD - d))).reshape(-1)

    def chain(gather_fn):
        @jax.jit
        def run(c, r0):
            r = r0
            acc = jnp.float32(0)
            for _ in range(iters):
                g = gather_fn(c, r)
                s = jnp.sum(g.astype(jnp.float32))
                acc = acc + s
                # next rows depend on the gather -> the chain serializes
                r = (r0 + jnp.int32(s) % 17) % n
            return acc

        return run

    take = chain(lambda c, r: jnp.take(c, r, axis=0))
    pall = chain(lambda c, r: gather_rows_padded(c, r, d))

    out_t = float(take(cols, rows0))
    best_t = None
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(take(cols, rows0))
        dt = time.perf_counter() - t0
        best_t = dt if best_t is None else min(best_t, dt)
    log(f"jnp.take        {best_t / iters * 1e3:8.3f} ms/gather "
        f"({best_t / iters / m * 1e9:.0f} ns/row)")

    try:
        out_p = float(pall(colsp, rows0))
    except Exception as e:  # noqa: BLE001 — record the blocker verbatim
        log(f"PADDED KERNEL FAILED TO COMPILE/RUN: {type(e).__name__}: "
            f"{str(e)[:800]}")
        print('{"verdict": "padded-row DMA gather still blocked", '
              f'"take_ns_per_row": {best_t / iters / m * 1e9:.0f}}}')
        return
    best_p = None
    for _ in range(3):
        t0 = time.perf_counter()
        _ = float(pall(colsp, rows0))
        dt = time.perf_counter() - t0
        best_p = dt if best_p is None else min(best_p, dt)
    log(f"padded DMA      {best_p / iters * 1e3:8.3f} ms/gather "
        f"({best_p / iters / m * 1e9:.0f} ns/row)")
    # sanity: same sums
    log(f"sums take={out_t:.1f} pallas={out_p:.1f}")
    print(f'{{"take_ns_per_row": {best_t / iters / m * 1e9:.0f}, '
          f'"padded_dma_ns_per_row": {best_p / iters / m * 1e9:.0f}, '
          f'"speedup": {best_t / best_p:.2f}}}')


if __name__ == "__main__":
    main()
