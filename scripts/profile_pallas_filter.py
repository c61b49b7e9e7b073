#!/usr/bin/env python
"""A/B: XLA econ filter vs the multi-group VMEM-resident Pallas kernel
(ops/pallas_filter.py) at production shapes, on the TPU.

Production per-scan-step batches: stage 1 (K=60, p=98, gram route) and
stage 0 (K=100, p=49, matrix route), G = bsize * 3 channels."""

import _bootstrap  # noqa: F401
import time

import numpy as np
import jax
import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.pallas_filter import (poly_econ_gram_packed_pallas,
                                        poly_econ_packed_pallas)
from vnlb_tpu.ops.polyspec import poly_filter_econ


def timeit(fn, *args, n=8):
    _ = float(jnp.sum(fn(*args)[::7, ::7, ::7]))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _ = float(jnp.sum(fn(*args)[::7, ::7, ::7]))
        best = min(best, time.perf_counter() - t0)
    return best


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

        t_xla = timeit(lambda a, b: poly_filter_econ(a, b, cfg), xc, xn)
        kern = (poly_econ_gram_packed_pallas if k < p
                else poly_econ_packed_pallas)
        t_pal = timeit(lambda a, b: kern(a, b, cfg), xc, xn)
        # numeric sanity on-device
        w = poly_filter_econ(xc, xn, cfg)
        o = kern(xc, xn, cfg)
        rel = float(jnp.sqrt(jnp.mean((o - w) ** 2))
                    / (jnp.mean(jnp.abs(w)) + 1e-6))
        print(f"stage {step} (K={k}, p={p}, G={g}): "
              f"xla {t_xla*1e3:.2f} ms | fused-pallas {t_pal*1e3:.2f} ms "
              f"({t_xla/t_pal:.2f}x) | rel-rms {rel:.4f}")


if __name__ == "__main__":
    main()
