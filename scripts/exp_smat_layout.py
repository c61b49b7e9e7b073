#!/usr/bin/env python
"""Search-phase layout-tax experiments (judge r3 #6), on the TPU.

1. Consumer strategies for the smat output buffer (F, ws2, RT, NC):
   A) production: transpose (0,2,3,1) -> reshape (pos, ws2) -> take rows
   B) col-take:   reshape (ws2, pos) -> take cols -> transpose the (small)
      (ws2, S) result
   C) slice upper bound: sites pre-ordered so the row take is contiguous
      (what a site-reorder refactor could reach at best)
2. VNLB_SMAT_V2 epilogue: kernel wall with the shared-matmul epilogue
   on vs off (decide the default by measurement or delete the knob).
"""

import _bootstrap  # noqa: F401
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, n=10):
    out = fn(*args)
    jax.block_until_ready(out)
    _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out))
        best = min(best, time.perf_counter() - t0)
    return best


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

    @jax.jit
    def strat_a(b, r):
        flat = jnp.transpose(b, (0, 2, 3, 1)).reshape(pos, ws2)
        return jnp.take(flat, r, axis=0)

    @jax.jit
    def strat_b(b, r):
        flat = b.reshape(f_cnt * ws2, rt * nc)
        # rows decode: f = r // (rt*nc), within = r % (rt*nc)
        fidx = r // (rt * nc)
        within = r % (rt * nc)
        cols = jnp.take(flat.reshape(f_cnt, ws2, rt * nc), within, axis=2)
        got = jnp.take_along_axis(
            cols, fidx[None, None, :].astype(jnp.int32), axis=0)[0]
        return jnp.transpose(got, (1, 0))                   # (S, ws2)

    @jax.jit
    def strat_c(b, r):
        flat = jnp.transpose(b, (0, 2, 3, 1)).reshape(pos, ws2)
        return jax.lax.dynamic_slice(flat, (0, 0), (s_sites, ws2))

    ta = timeit(strat_a, buf, rows)
    tb = timeit(strat_b, buf, rows)
    tc = timeit(strat_c, buf, rows_sorted)
    print(f"[layout] A transpose+row-take: {ta*1e3:.2f} ms")
    print(f"[layout] B col-take+small-T  : {tb*1e3:.2f} ms")
    print(f"[layout] C transpose+slice   : {tc*1e3:.2f} ms "
          f"(site-reorder upper bound)")

    # pure transpose cost for attribution
    @jax.jit
    def pure_t(b):
        return jnp.transpose(b, (0, 2, 3, 1)).reshape(pos, ws2)

    tt = timeit(pure_t, buf)
    @jax.jit
    def pure_take(b, r):
        return jnp.take(b, r, axis=0)
    flat0 = pure_t(buf)
    tk = timeit(pure_take, flat0, rows)
    print(f"[layout] pure transpose {tt*1e3:.2f} ms | pure row-take "
          f"{tk*1e3:.2f} ms (buffer {buf.nbytes/1e6:.0f} MB)")

    # ---- VNLB_SMAT_V2 kernel A/B ----
    from vnlb_tpu.ops.pallas_smat import smat_distances_dt

    t5, c3, h, w = 4, 6, 480, 854
    vq = jnp.asarray(rng.normal(size=(t5, c3, h, w)).astype(np.float32))
    vd = jnp.asarray(rng.normal(size=(t5, c3, h, w)).astype(np.float32))
    qrow0 = (0, 1, 2, 0)

    def run_kernel():
        return smat_distances_dt(vq, vd, qrow0, 7, 15, 6)

    for v2 in ("0", "1"):
        os.environ["VNLB_SMAT_V2"] = v2
        t = timeit(run_kernel, n=6)
        print(f"[smat] VNLB_SMAT_V2={v2}: {t*1e3:.2f} ms/dt-call")


if __name__ == "__main__":
    main()
