#!/usr/bin/env python
"""Is the smat kernel bound by the per-offset pltpu.roll?

The kernel rolls the (hdpad, wdpad) candidate planes by the row offset
``a`` once per grid step (75 steps x ptc planes per dt-call) — a sublane
relayout whose cost is hard to model.  This ablates it: monkeypatch
pltpu.roll to identity inside ops/pallas_smat (WRONG RESULTS, timing
only) and compare chain-amortized dt-call walls at stage-0 (1 plane) and
stage-1 (6 planes, 2 chunked calls) 480p shapes.

If roll dominates, the fix is an MXU-based row shift: vdr = R_a @ vd with
a static 0/1 banded shift matrix per offset (exact in f32 via bf16
splitting of the non-0/1 operand).
"""

import _bootstrap  # noqa: F401
import time
import types

import numpy as np
import jax
import jax.numpy as jnp

import vnlb_tpu.ops.pallas_smat as M

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


class _Shim(types.SimpleNamespace):
    def __getattr__(self, name):
        return getattr(self._real, name)


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    qrow0 = (0, 1, 2, 0)
    real_pltpu = M.pltpu

    for label, planes in (("stage0-like (1 plane)", 1),
                          ("stage1-like (6 planes)", 6)):
        vq = jnp.asarray(
            rng.normal(size=(4, planes, 480, 854)).astype(np.float32))
        vd = jnp.asarray(
            rng.normal(size=(4, planes, 480, 854)).astype(np.float32))

        def run(q, d):
            return M.smat_distances_dt(q, d, qrow0, 7, 15, 6)

        M.pltpu = real_pltpu
        t_on = chain(run, vq, vd)

        shim = _Shim(_real=real_pltpu)
        shim.roll = lambda x, s, axis=0: x          # ablation: no shift
        M.pltpu = shim
        M._smat_distances_jit.clear_cache()
        t_off = chain(run, vq, vd)
        M.pltpu = real_pltpu
        M._smat_distances_jit.clear_cache()

        print(f"[smat-roll] {label}: roll ON {t_on*1e3:.2f} ms/dt-call | "
              f"roll ABLATED {t_off*1e3:.2f} ms -> roll share "
              f"{(t_on-t_off)*1e3:.2f} ms")


if __name__ == "__main__":
    main()
