"""Standalone timing: smat strided-query vs dense Pallas distance kernel.

Isolates the round-3 selection-matmul kernel (ops/pallas_smat.py) from the
pipeline: compile time + steady-state per-call wall for one temporal offset
at the production 480p iphone-preset shapes, next to the all-rows dense
kernel it replaces.  Fetches a scalar (axon tunnel: block_until_ready does
not force remote execution).
"""

import sys
import time

sys.path.insert(0, ".")
import scripts._bootstrap  # noqa: F401  (compile cache env)

import jax
import jax.numpy as jnp
import numpy as np

from vnlb_tpu.ops.pallas_dense import dense_distances_dt
from vnlb_tpu.ops.pallas_smat import smat_distances_dt


def fetch(x):
    return float(jnp.sum(x[..., ::97, ::97]))


def main():
    t, h, w = 5, 480, 854
    ps, w_s, step = 7, 15, 6
    ptc, f_cnt = 3, t
    hp, wp = h - ps + 1, w - ps + 1
    rng = np.random.default_rng(0)

    vq = jnp.asarray(rng.normal(size=(f_cnt, ptc, h, w)).astype(np.float32))
    vd = vq
    qrow0 = tuple(int(f % step) for f in range(f_cnt))

    print(f"[shapes] f={f_cnt} h={h} w={w} ws={w_s} step={step}", flush=True)

    t0 = time.time()
    out = smat_distances_dt(vq, vd, qrow0, ps, w_s, step)
    s = fetch(out)
    print(f"[smat]  first call (compile+run): {time.time() - t0:.1f}s "
          f"sum={s:.3e}", flush=True)
    for i in range(3):
        t0 = time.time()
        s = fetch(smat_distances_dt(vq, vd, qrow0, ps, w_s, step))
        print(f"[smat]  rep {i}: {time.time() - t0:.3f}s", flush=True)

    v2 = jnp.sum(vq * vq, axis=1)
    q2 = jnp.cumsum(jnp.cumsum(v2, 1), 2)[:, ps - 1:, ps - 1:][:, :hp, :wp]
    b2 = q2
    t0 = time.time()
    out = dense_distances_dt(vq, vd, q2, b2, ps, w_s)
    s = fetch(out)
    print(f"[dense] first call (compile+run): {time.time() - t0:.1f}s "
          f"sum={s:.3e}", flush=True)
    for i in range(3):
        t0 = time.time()
        s = fetch(dense_distances_dt(vq, vd, q2, b2, ps, w_s))
        print(f"[dense] rep {i}: {time.time() - t0:.3f}s", flush=True)


if __name__ == "__main__":
    main()
