#!/usr/bin/env python
"""Micro A/B: stage-1 filter evaluators at production shapes (TPU).

Times poly_filter_econ with the GRAM-domain route vs the left-regime
route, plus the stage-0 matrix-regime path, at the per-scan-step group
batch (bsize sites x 3 channels).  Fetches a scalar to force remote
execution (axon tunnel).
"""

import _bootstrap  # noqa: F401
import time

import jax.numpy as jnp
import numpy as np

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.polyspec import poly_filter_econ


def timeit(fn, *args, n=5):
    out = float(jnp.sum(fn(*args)[::7, ::7, ::7]))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        out = float(jnp.sum(fn(*args)[::7, ::7, ::7]))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    for step, k, p in ((1, 60, 98), (0, 100, 49)):
        g = 256 * 3
        cfg = default_config(20.0, preset="iphone").stage(step)
        base = rng.normal(size=(g, 1, p)).astype(np.float32) * 30
        xc2 = jnp.asarray(base + rng.normal(size=(g, k, p)).astype(np.float32) * 20)
        xn2 = jnp.asarray(base + rng.normal(size=(g, k, p)).astype(np.float32) * 20)
        variants = [("econ(default)", cfg)]
        if k < p:
            variants.append(("econ(gram off)", cfg.replace(poly_gram=False)))
        else:
            variants.append(("econ(pack2 off)", cfg.replace(poly_pack2=False)))
        for name, c in variants:
            dt = timeit(poly_filter_econ, xc2, xn2, c)
            print(f"step {step} (G={g}, K={k}, p={p}) {name:16s}: "
                  f"{dt * 1e3:7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
