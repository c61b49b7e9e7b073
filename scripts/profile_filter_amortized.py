#!/usr/bin/env python
"""Dispatch-amortized filter A/B: XLA econ vs the fused Pallas kernel.

profile_pallas_filter.py's standalone timings were dominated by tunnel
dispatch (~10 ms per un-jitted einsum call): it showed 300 ms vs 30 ms
where the in-context pipeline difference is ~zero.  Here each variant runs
ITERS dependent batches inside ONE jit, so per-call dispatch amortizes and
the number is the true per-batch device cost (the chain trick of
scripts/bench_mxu_floor.py)."""

import _bootstrap  # noqa: F401
import time

import numpy as np
import jax
import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.pallas_filter import (poly_econ_gram_packed_pallas,
                                        poly_econ_packed_pallas)
from vnlb_tpu.ops.polyspec import poly_filter_econ

ITERS = 16


def bench(fn, xc, xn, reps=5):
    @jax.jit
    def run(a, b):
        y = b
        for _ in range(ITERS):
            y = fn(a, y)
            # renormalize so the chain stays bounded; negligible cost
            y = y * (1.0 / (1.0 + jnp.mean(jnp.abs(y)) * 1e-9))
        return jnp.sum(y)

    _ = float(run(xc, xn))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(xc, xn))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def main():
    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    for step, k, p in ((1, 60, 98), (0, 100, 49)):
        g = 256 * 3
        cfg = default_config(20.0, preset="iphone").stage(step)
        base = rng.normal(size=(g, 1, p)).astype(np.float32) * 30
        xc = jnp.asarray(base + rng.normal(
            size=(g, k, p)).astype(np.float32) * 20)
        xn = jnp.asarray(base + rng.normal(
            size=(g, k, p)).astype(np.float32) * 20)

        t_xla = bench(lambda a, b: poly_filter_econ(a, b, cfg), xc, xn)
        kern = (poly_econ_gram_packed_pallas if k < p
                else poly_econ_packed_pallas)
        t_pal = bench(lambda a, b: kern(a, b, cfg), xc, xn)
        per_pair_x = t_xla / (g / 2) * 1e9
        per_pair_p = t_pal / (g / 2) * 1e9
        print(f"stage {step} (K={k}, p={p}, G={g}): "
              f"xla {t_xla*1e3:.3f} ms/batch ({per_pair_x:.0f} ns/pair) | "
              f"fused {t_pal*1e3:.3f} ms/batch ({per_pair_p:.0f} ns/pair) "
              f"-> {t_xla/t_pal:.2f}x")


if __name__ == "__main__":
    main()
