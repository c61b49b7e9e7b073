#!/usr/bin/env python
"""Settle the filter-phase per-op floor: what actually bounds batched
small matmuls on this v5e chip?

STATUS.md's single-chip ceiling analysis asserts a ~128-200 cycle/op
"weight-load" floor for the Bayes filter's batched (G,120,120)@(G,120,120)
and (G,60,120)@(G,120,120) bf16 matmul chains (judge round-3 directive #1:
prove it or expose the headroom).  Three candidate models for the per-op
cost of one group's matmul inside a batched op:

  peak  : pure MXU FLOP time           2*M*K*N / 197e12 s
  wload : systolic weight load + rows  (128 + M) cycles  (no double buffer)
  hbm   : analytic HBM round trip      bytes(op) / 819e9 s
          chained y <- y @ B reads B (bf16) + y, writes y each step

The discriminating experiments:

  * shape sweep at fixed chain form    -> is cost flat in M (wload/dispatch)
                                          or ~linear in traffic (hbm)?
  * shared-weight variant (one B for   -> removes the per-group B read;
    all G)                                hbm predicts ~2x, wload predicts
                                          ~(128+M)/M-free reload win
  * f32 vs bf16 storage                -> hbm predicts ~2x slowdown for f32,
                                          wload/peak predict ~none
  * giant fused single matmul          -> the chip's actual MXU ceiling

Emits one human table + one JSON line (floor_verdict = the model whose
prediction is nearest the measurement, aggregated over configs).
"""

import _bootstrap  # noqa: F401

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

PEAK_TFLOPS = 197e12          # v5e bf16
HBM_GBS = 819e9               # v5e HBM bandwidth
CLOCK_HZ = 1.5e9              # implied MXU-domain clock (4 MXUs: 197e12 /
                              # (4 * 2 * 128^2) ~ 1.5 GHz)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def time_chain(g, m, k, dtype, iters=64, shared=False, reps=5):
    """Wall per op of a dependent chain y <- bmm(y, B) (Clenshaw form).

    y: (g, m, k) ; B: (g, k, k) (or (k, k) if shared).  The chain matches
    the production filter's data flow: B is re-used every step, y is the
    rolling state.  Returns best seconds per (group x step) "op".
    """
    rng = np.random.default_rng(0)
    y0 = jnp.asarray(rng.normal(size=(g, m, k)), dtype)
    b = jnp.asarray(rng.normal(size=(k, k) if shared else (g, k, k)), dtype)
    b = b / np.sqrt(k)  # keep the chain numerically bounded

    eq = "gmk,kq->gmq" if shared else "gmk,gkq->gmq"

    @jax.jit
    def run(y, bm):
        for _ in range(iters):
            y = jnp.einsum(eq, y, bm,
                           preferred_element_type=jnp.float32).astype(dtype)
        return jnp.sum(y.astype(jnp.float32))

    _ = float(run(y0, b))                     # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(y0, b))
        best = min(best, time.perf_counter() - t0)
    return best / (iters * g)


def models_ns(m, k, dtype, shared):
    bytes_el = 2 if dtype == jnp.bfloat16 else 4
    flops = 2 * m * k * k
    peak = flops / PEAK_TFLOPS * 1e9
    wload = (128 + m) / CLOCK_HZ * 1e9
    traffic = m * k * bytes_el * 2            # read y + write y
    if not shared:
        traffic += k * k * bytes_el           # per-group B read
    hbm = traffic / HBM_GBS * 1e9
    return peak, wload, hbm, traffic


def main():
    log(f"[mxu_floor] devices: {jax.devices()}")
    g = 2048
    cases = [
        # (label, M, K, dtype, shared)
        ("pack2 Clenshaw (120,120)@(120,120) bf16", 120, 120, jnp.bfloat16, False),
        ("left row chain  (60,120)@(120,120) bf16",  60, 120, jnp.bfloat16, False),
        ("full tile      (128,128)@(128,128) bf16", 128, 128, jnp.bfloat16, False),
        ("thin rows        (8,128)@(128,128) bf16",   8, 128, jnp.bfloat16, False),
        ("fat rows       (512,128)@(128,128) bf16", 512, 128, jnp.bfloat16, False),
        ("f32 storage    (120,120)@(120,120) f32 ", 120, 120, jnp.float32,  False),
        ("SHARED weight  (120,120)@(120,120) bf16", 120, 120, jnp.bfloat16, True),
        ("SHARED thin      (8,128)@(128,128) bf16",   8, 128, jnp.bfloat16, True),
    ]
    rows = []
    for label, m, k, dt, shared in cases:
        gg = max(256, g // (max(1, m // 128)))
        sec = time_chain(gg, m, k, dt, shared=shared)
        peak, wload, hbm, traffic = models_ns(m, k, dt, shared)
        ns = sec * 1e9
        tf = 2 * m * k * k / sec / 1e12
        gbs = traffic / sec / 1e9
        rows.append(dict(label=label, m=m, k=k, ns_per_op=round(ns, 1),
                         model_peak_ns=round(peak, 1),
                         model_wload_ns=round(wload, 1),
                         model_hbm_ns=round(hbm, 1),
                         achieved_tflops=round(tf, 2),
                         achieved_gbs=round(gbs, 1),
                         cycles_at_1p5ghz=round(ns * 1.5, 0)))
        log(f"[mxu_floor] {label}: {ns:7.1f} ns/op "
            f"(peak {peak:5.1f} | wload {wload:5.1f} | hbm {hbm:6.1f}) "
            f"{tf:6.2f} TF/s {gbs:6.1f} GB/s  ~{ns*1.5:.0f} cyc")

    # the chip's actual MXU ceiling: one giant matmul, same FLOP scale
    n_big = 8192
    a = jnp.asarray(np.random.default_rng(1).normal(size=(n_big, n_big)),
                    jnp.bfloat16)

    @jax.jit
    def big(x):
        return jnp.sum(jnp.einsum("ij,jk->ik", x, x,
                                  preferred_element_type=jnp.float32))

    _ = float(big(a))
    t0 = time.perf_counter()
    _ = float(big(a))
    big_s = time.perf_counter() - t0
    big_tf = 2 * n_big ** 3 / big_s / 1e12
    log(f"[mxu_floor] giant ({n_big}^3) matmul: {big_tf:.1f} TFLOP/s "
        f"({100 * big_tf / (PEAK_TFLOPS / 1e12):.0f}% of nominal peak)")

    # verdict: which model is nearest, on the production shapes?
    prod = rows[:2]
    errs = {mdl: float(np.mean([abs(r["ns_per_op"] - r[f"model_{mdl}_ns"])
                                / r["ns_per_op"] for r in prod]))
            for mdl in ("peak", "wload", "hbm")}
    verdict = min(errs, key=errs.get)
    shared_speedup = rows[0]["ns_per_op"] / rows[6]["ns_per_op"]
    log(f"[mxu_floor] model rel-errors on production shapes: {errs}")
    log(f"[mxu_floor] shared-weight speedup at (120,120): "
        f"{shared_speedup:.2f}x (hbm predicts "
        f"{rows[0]['model_hbm_ns']/rows[6]['model_hbm_ns']:.2f}x)")
    print(json.dumps({"metric": "mxu_floor", "verdict": verdict,
                      "model_rel_err": {k: round(v, 3)
                                        for k, v in errs.items()},
                      "giant_matmul_tflops": round(big_tf, 1),
                      "shared_weight_speedup": round(shared_speedup, 2),
                      "rows": rows}))


if __name__ == "__main__":
    main()
