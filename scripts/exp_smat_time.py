#!/usr/bin/env python
"""Chain-amortized smat kernel wall per dt-call (stage-0/1 480p shapes)."""

import _bootstrap  # noqa: F401
import time

import numpy as np
import jax
import jax.numpy as jnp

from vnlb_tpu.ops.pallas_smat import smat_distances_dt

ITERS = 6


def chain(fn, *args, reps=3):
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
    rng = np.random.default_rng(0)
    qrow0 = (0, 1, 2, 0)
    for label, planes in (("stage0-like (1 plane)", 1),
                          ("stage1-like (6 planes)", 6)):
        vq = jnp.asarray(
            rng.normal(size=(4, planes, 480, 854)).astype(np.float32))
        vd = jnp.asarray(
            rng.normal(size=(4, planes, 480, 854)).astype(np.float32))

        def run(q, d):
            return smat_distances_dt(q, d, qrow0, 7, 15, 6)

        t = chain(run, vq, vd)
        print(f"[smat-time] {label}: {t*1e3:.2f} ms/dt-call")


if __name__ == "__main__":
    main()
