#!/usr/bin/env python
"""A/B: top-K selection strategies over the dense candidate matrix (TPU).

The one-shot lax.top_k over (S, n_dt*ws2) lowers to a full variadic bitonic
sort (traced 0.052 s step 0 at (58k, 4725) K=100; 0.034 s step 1 at
(46k, 1575) K=60).  Variants:
  exact      lax.top_k (the production default)
  approx98   lax.approx_max_k recall 0.98 (PartialReduce TPU custom call)
  approx95   recall 0.95
  twostage   exact per-chunk top_k then exact merge (values carry chunk-
             local positions; decoded to global)
"""

import _bootstrap  # noqa: F401
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--s", type=int, default=46080)
    ap.add_argument("--n", type=int, default=1575)
    ap.add_argument("--k", type=int, default=60)
    ap.add_argument("--chunks", type=int, default=5)
    args = ap.parse_args()
    s, n, k = args.s, args.n, args.k

    rng = np.random.default_rng(0)
    mv = jnp.asarray(rng.normal(0, 1, (s, n)).astype(np.float32))

    @jax.jit
    def exact(x):
        neg, sel = lax.top_k(-x, k)
        return jnp.sum(-neg) + jnp.sum(sel)

    @jax.jit
    def approx98(x):
        neg, sel = lax.approx_max_k(-x, k, recall_target=0.98)
        return jnp.sum(-neg) + jnp.sum(sel)

    @jax.jit
    def approx95(x):
        neg, sel = lax.approx_max_k(-x, k, recall_target=0.95)
        return jnp.sum(-neg) + jnp.sum(sel)

    cs = args.chunks
    cl = -(-n // cs)

    @jax.jit
    def twostage(x):
        xp = jnp.pad(x, ((0, 0), (0, cs * cl - n)),
                     constant_values=np.inf)
        xc = xp.reshape(s, cs, cl)
        negs, sels = lax.top_k(-xc, min(k, cl))      # (S, cs, k)
        gsel = sels + (jnp.arange(cs) * cl)[None, :, None]
        neg2, sel2 = lax.top_k(negs.reshape(s, -1), k)
        gsel2 = jnp.take_along_axis(gsel.reshape(s, -1), sel2, axis=1)
        return jnp.sum(-neg2) + jnp.sum(gsel2)

    for name, fn in [("exact", exact), ("approx98", approx98),
                     ("approx95", approx95), ("twostage", twostage)]:
        r = float(fn(mv))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = float(fn(mv))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:9s}: {best:7.4f} s   sum {r:.1f}", flush=True)


if __name__ == "__main__":
    main()
