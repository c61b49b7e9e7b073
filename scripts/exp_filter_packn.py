#!/usr/bin/env python
"""Pack-n filter A/B (round-4 judge item #2b): the filter phase floors at
~210-300 ns per batched-matmul GROUP regardless of FLOPs
(scripts/bench_mxu_floor.py), so packing n groups per block-diagonal
matrix cuts the op count n-fold at n x the per-op MXU tile work.  Pack2
(round 2) is the production default; this measures whether 4 (and 8)
continue to win at the production shapes, dispatch-amortized (the
ITERS-dependent-batches-in-one-jit harness of
scripts/profile_filter_amortized.py).

Parity: each n is also checked against the unpacked econ route (pack2
gates off) at 1e-2 relative (bf16 chain rounding; the tighter
test_polyspec pin covers the production pack) — the packs are the same
math, block-diagonal.

VERDICT (v5e-1, 2026-08-20, two runs, run-to-run noise ~15%):

    stage 0 (K=100, p=49): unpacked 1.63-1.88 | pack2 1.64-1.71 |
        pack4 1.67 | pack8 1.59-2.09 ms/batch
    stage 1 (K=60,  p=98): unpacked 1.56 | pack2 1.66 | pack4 1.94 |
        pack8 2.08 ms/batch

Wider packs are NEUTRAL-to-WORSE: the per-group sequencing floor measured
flat across ROW counts (bench_mxu_floor) does not extrapolate to LANE
width — doubling the matrix side ~doubles per-op cost at these sizes, so
cutting op count n-fold buys nothing past pack2.  Production defaults
stay (pack2); round-4 judge item #2b closed with this measurement.
"""

import _bootstrap  # noqa: F401
import time

import numpy as np
import jax
import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.polyspec import (_poly_econ_gram_packed, _poly_econ_packed,
                                   _ps_split, poly_filter_econ)

ITERS = 16


def bench(fn, xc, xn, reps=5):
    @jax.jit
    def run(a, b):
        y = b
        for _ in range(ITERS):
            y = fn(a, y)
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
    for step, k, p in ((0, 100, 49), (1, 60, 98)):
        g = 768
        cfg = default_config(20.0, preset="iphone").stage(step)
        m, s = _ps_split(cfg.poly_deg_fused)
        deg = m * s - 1
        nodes = max(64, 2 * (deg + 1))
        tau = cfg.thresh * cfg.sigma2 + cfg.sigmab2
        base = rng.normal(size=(g, 1, p)).astype(np.float32) * 30
        xc = jnp.asarray(base + rng.normal(
            size=(g, k, p)).astype(np.float32) * 20)
        xn = jnp.asarray(base + rng.normal(
            size=(g, k, p)).astype(np.float32) * 20)

        def tv(lub, _c=cfg, _deg=deg, _nodes=nodes, _tau=tau):
            from vnlb_tpu.ops.polyspec import _cheb_nodes
            xs = jnp.asarray(_cheb_nodes(_nodes))
            lam_i = (xs[None, :] + 1.0) * 0.5 * lub[:, None]
            wg = 1.2 * (np.pi / _deg) * jnp.sqrt(_tau * lub)
            gate = jax.nn.sigmoid((lam_i - _tau) / (wg[:, None] / 4.4))
            lam_s = jnp.maximum(lam_i - _c.sigmab2, 0.0)
            return gate * lam_s / (lam_s + _c.sigma2)

        packed = _poly_econ_gram_packed if k < p else _poly_econ_packed
        ref = np.asarray(poly_filter_econ(
            xc, xn, cfg.replace(poly_pack2=False, poly_gram=k < p)))
        scale = np.abs(ref).max()

        t_ref = bench(lambda a, b: poly_filter_econ(
            a, b, cfg.replace(poly_pack2=False)), xc, xn)
        line = (f"stage {step} (K={k}, p={p}, G={g}): "
                f"unpacked {t_ref * 1e3:.3f}")
        for n in (2, 4, 8):
            if g % n:
                continue
            t_n = bench(lambda a, b, _n=n: packed(
                a, b, m, s, nodes, tau, cfg, tv, n_pack=_n), xc, xn)
            out = np.asarray(packed(xc, xn, m, s, nodes, tau, cfg, tv,
                                    n_pack=n))
            err = np.abs(out - ref).max() / scale
            assert err < 1e-2, (n, err)
            line += f" | pack{n} {t_n * 1e3:.3f} ({t_ref / t_n:.2f}x)"
        print(line + "  [ms/batch]")


if __name__ == "__main__":
    main()
