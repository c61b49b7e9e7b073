#!/usr/bin/env python
"""Mosaic row-gather, round-3 attempt (round-4 judge item #4, after the
1024-padded 1-D arena variant died in the remote compiler — see
exp_pallas_gather2.py): a TILE-SHAPED arena (N, sub, 128) whose rows ARE
hardware tiles, so the per-row DMA source ``cols3.at[r]`` is a leading-dim
slice — no 1-D alignment rule, no mid-tile sublane offset.

Memory cost at the stage-1 call site (d=588 bf16): sub*128/d = 2048/588 =
3.48x the arena (bf16 tile sub=16), or 1024/588 = 1.74x stored f32
(sub=8) at 2x the bytes moved.  The microbench uses a smaller N than the
2M-row production arena (cost is per-row; indices are uniform so there is
no reuse to hide).

Prints ns/row for jnp.take vs the tiled-DMA kernel, dispatch-amortized
(ITERS dependent gathers inside one jit), plus a correctness check.

VERDICT (v5e-1, 2026-08-21, N=300k f32): the tile-shaped arena RESOLVES
the Mosaic compile blocker (the first gather kernel variant that compiles
on this toolchain) but measures **0.92x jnp.take** — 541 ns/row vs take's
500 ns/row f32 — while moving 1.74x the bytes (whole 4 KB tiles vs 2.35 KB
payload).  Per BYTE the DMA path is ~1.6x more efficient than take, but
tile-alignment padding eats exactly that margin; at the production bf16
arena the waste is 3.48x, so the kernel loses outright.  Combined with
gather2's result (take = 283 ns/row bf16 — per-row cost scales with row
BYTES, so take is throughput-limited at ~4-8 GB/s effective on random
rows, not fixed-latency), the round-3 "~0.1 s row-gather lever" is a DEAD
END on this hardware: any aligned-DMA formulation must move >= tile-sized
rows, and the padding ratio at d=588 exceeds the per-byte advantage.
Round-4 judge item #4 closed with measurements on all three variants.
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
    ap.add_argument("--n", type=int, default=500_000)
    ap.add_argument("--d", type=int, default=588)
    ap.add_argument("--m", type=int, default=15360)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--dtype", default="f32", choices=("f32", "bf16"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vnlb_tpu.ops.pallas_gather import gather_rows_tiled

    n, d, m, iters = args.n, args.d, args.m, args.iters
    dty = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    sub = 8 if args.dtype == "f32" else 16
    log(f"devices: {jax.devices()}  N={n} D={d} M={m} dtype={args.dtype} "
        f"tile=({sub},128)")

    rng = np.random.default_rng(0)
    cols = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32)).astype(dty)
    rows0 = jnp.asarray(rng.integers(0, n, size=m).astype(np.int32))
    cols3 = jnp.pad(cols, ((0, 0), (0, sub * 128 - d))).reshape(n, sub, 128)

    def chain(gather_fn, carena):
        @jax.jit
        def run(c, r0):
            r = r0
            acc = jnp.float32(0)
            for _ in range(iters):
                g = gather_fn(c, r)
                s = jnp.sum(g.astype(jnp.float32))
                acc = acc + s
                r = (r0 + jnp.int32(s) % 17) % n
            return acc

        return lambda: float(run(carena, rows0))

    take = chain(lambda c, r: jnp.take(c, r, axis=0), cols)
    tile = chain(lambda c, r: gather_rows_tiled(c, r)[:, :, :]
                 .reshape(m, sub * 128)[:, :d], cols3)

    out_t = take()
    best_t = min(_timeone(take) for _ in range(3))
    log(f"jnp.take        {best_t / iters * 1e3:8.3f} ms/gather "
        f"({best_t / iters / m * 1e9:.0f} ns/row)")

    try:
        out_p = tile()
    except Exception as e:  # noqa: BLE001 — record the blocker verbatim
        log(f"TILED KERNEL FAILED TO COMPILE/RUN: {type(e).__name__}: "
            f"{str(e)[:800]}")
        print('{"verdict": "tiled-row DMA gather blocked", '
              f'"take_ns_per_row": {best_t / iters / m * 1e9:.0f}}}')
        return
    best_p = min(_timeone(tile) for _ in range(3))
    log(f"tiled DMA       {best_p / iters * 1e3:8.3f} ms/gather "
        f"({best_p / iters / m * 1e9:.0f} ns/row)")
    log(f"sums take={out_t:.1f} pallas={out_p:.1f} "
        f"(bf16 sums differ in rounding only)")
    print(f'{{"take_ns_per_row": {best_t / iters / m * 1e9:.0f}, '
          f'"tiled_dma_ns_per_row": {best_p / iters / m * 1e9:.0f}, '
          f'"speedup": {best_t / best_p:.2f}}}')


def _timeone(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
