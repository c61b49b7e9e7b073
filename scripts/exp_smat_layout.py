#!/usr/bin/env python
"""Search-phase layout-tax experiments (judge r3 #6), on the TPU.

All variants run ITERS dependent repetitions inside ONE jit so tunnel
dispatch (~10-25 ms/call) amortizes — the first version of this script
timed single calls and every strategy measured ~the dispatch floor.

1. Consumer strategies for the smat output buffer (F, ws2, RT, NC):
   A) production: transpose (0,2,3,1) -> reshape (pos, ws2) -> take rows
   B) col-take:   decode rows into (f, within) and take along the minor
      dims without the big transpose
   C) slice upper bound: sites pre-ordered so the row take is contiguous
      (what a site-reorder refactor could reach at best)
   plus pure-transpose and pure-take attributions.
2. VNLB_SMAT_V2 epilogue: kernel wall with the shared-matmul epilogue
   on vs off (decide the default by measurement or delete the knob).
"""

import _bootstrap  # noqa: F401
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

ITERS = 8


def chain(fn, *args, reps=4):
    """Best wall of ITERS dependent fn() evaluations inside one jit."""

    @jax.jit
    def run(*a):
        out = fn(*a)
        acc = jnp.sum(out) * 1e-30
        for _ in range(ITERS - 1):
            out = fn(a[0] + acc, *a[1:])
            acc = acc + jnp.sum(out) * 1e-30
        return acc

    _ = float(run(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    print(f"devices: {jax.devices()}")
    # production level-0 shapes at 480p stride 6
    f_cnt, ws2, rt, nc = 4, 225, 96, 256
    s_sites = 26000
    pos = f_cnt * rt * nc
    rng = np.random.default_rng(0)
    buf = jnp.asarray(rng.normal(size=(f_cnt, ws2, rt, nc)).astype(np.float32))
    rows = jnp.asarray(rng.integers(0, pos, size=(s_sites,)), jnp.int32)
    rows_sorted = jnp.asarray(np.arange(s_sites, dtype=np.int32))

    def strat_a(b, r):
        flat = jnp.transpose(b, (0, 2, 3, 1)).reshape(pos, ws2)
        return jnp.take(flat, r, axis=0)

    def strat_b(b, r):
        fidx = r // (rt * nc)
        within = r % (rt * nc)
        cols = jnp.take(b.reshape(f_cnt, ws2, rt * nc), within, axis=2)
        got = jnp.take_along_axis(
            cols, fidx[None, None, :].astype(jnp.int32), axis=0)[0]
        return jnp.transpose(got, (1, 0))                   # (S, ws2)

    def strat_c(b, r):
        flat = jnp.transpose(b, (0, 2, 3, 1)).reshape(pos, ws2)
        return jax.lax.dynamic_slice(flat, (0, 0), (s_sites, ws2))

    ta = chain(strat_a, buf, rows)
    tb = chain(strat_b, buf, rows)
    tc = chain(strat_c, buf, rows_sorted)
    print(f"[layout] A transpose+row-take: {ta*1e3:.2f} ms")
    print(f"[layout] B col-take+small-T  : {tb*1e3:.2f} ms")
    print(f"[layout] C transpose+slice   : {tc*1e3:.2f} ms "
          f"(site-reorder upper bound)")

    def pure_t(b):
        return jnp.transpose(b, (0, 2, 3, 1)).reshape(pos, ws2)

    tt = chain(pure_t, buf)
    flat0 = jax.jit(pure_t)(buf)

    def pure_take(b, r):
        return jnp.take(b, r, axis=0)

    tk = chain(pure_take, flat0, rows)
    print(f"[layout] pure transpose {tt*1e3:.2f} ms | pure row-take "
          f"{tk*1e3:.2f} ms (buffer {buf.nbytes/1e6:.0f} MB)")

    # ---- VNLB_SMAT_V2 kernel A/B (amortized) ----
    from vnlb_tpu.ops.pallas_smat import smat_distances_dt

    t5, c3, h, w = 4, 6, 480, 854
    vq = jnp.asarray(rng.normal(size=(t5, c3, h, w)).astype(np.float32))
    vd = jnp.asarray(rng.normal(size=(t5, c3, h, w)).astype(np.float32))
    qrow0 = (0, 1, 2, 0)

    for v2 in ("0", "1"):
        os.environ["VNLB_SMAT_V2"] = v2

        def run_kernel(q, d):
            return smat_distances_dt(q, d, qrow0, 7, 15, 6)

        t = chain(run_kernel, vq, vd, reps=3)
        print(f"[smat] VNLB_SMAT_V2={v2}: {t*1e3:.2f} ms/dt-call")


if __name__ == "__main__":
    main()
