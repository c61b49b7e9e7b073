"""Fused Pallas TPU kernel for the polynomial spectral filter.

Runs the ENTIRE matrix function per group — covariance, spectral bound,
quintic+cubic sign gate, per-group Chebyshev Wiener factor, and the patch
projection — inside VMEM: HBM traffic drops to one read of (xc2, xn2) and
one write of the filtered patches per group, every matmul bf16 on the MXU
with fp32 accumulation.

MEASURED OUTCOME (v5e-1, 768-group batches under a scan): this kernel runs
~1.1-1.8x SLOWER than the XLA path (ops/polyspec.py) — 3.8 vs 3.5 ms/batch
(step 1) and 4.8 vs 2.6 ms/batch (step 0).  The phase turns out to be MXU-
latency-bound, not HBM-bound, once the scan keeps XLA's buffers hot: XLA's
batched matmuls pipeline the group dimension through the MXU, while this
kernel's per-group (p,p) matmuls drain the systolic array between groups.
Kept as the ``poly_impl="pallas"`` option (and as the scaffold for a
future batched-in-kernel variant); the production default is "xla".

Semantics are IDENTICAL to polyspec.poly_filter (same schedule, same
Chebyshev projection, same bf16 storage rounding points); parity is pinned
by tests/test_pallas_poly.py in interpret mode and the production pipeline
re-uses the polyspec quality pins (tests/test_polyspec.py).

Shapes are padded OUTSIDE the kernel: K to a multiple of 8 (f32 sublane
tile) with zero patch rows, p to a multiple of 128 (lane tile) with zero
lanes.  Zero-padding is exact for every step: padded eigendirections carry
a_cov eigenvalue 0, the sign gate maps them to 0 (0 < tau), and the final
slice drops padded rows/lanes (see the derivation in this file's history
— the padded diagonal of `eye` is deliberately kept).

Reference semantics being accelerated: lib/vnlb/deno/bayes_est.py:129-151
("clipped" eigenvalue shrinkage + thresholded Wiener gate + projection).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .polyspec import _AGGR, _cheb_nodes, _dct_matrix, _sign_schedule


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _poly_kernel(xc_ref, xn_ref, dct_ref, nodes_ref, y_ref, *,
                 gb, k_real, p_pad, s2, sb2, tau, n_aggr, n_polish,
                 wdeg, n_nodes, left, bf16):
    cdt = jnp.bfloat16 if bf16 else jnp.float32

    def mx(a, b):
        return jnp.dot(a.astype(cdt), b.astype(cdt),
                       preferred_element_type=jnp.float32)

    ri = jax.lax.broadcasted_iota(jnp.int32, (p_pad, p_pad), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (p_pad, p_pad), 1)
    eye = (ri == ci).astype(jnp.float32)

    for g in range(gb):
        xc = xc_ref[g]                                     # (Kp, Pp)
        xn = xn_ref[g]

        # fp32 covariance (one K.p^2 matmul — cheap next to the ~20 p^3
        # iterations; polyspec uses HIGHEST here for the same reason)
        a_cov = jax.lax.dot_general(
            xc, xc,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (1.0 / k_real)

        tr = jnp.sum(a_cov * eye)
        rowsum = jnp.max(jnp.sum(jnp.abs(a_cov), axis=1))
        lub = jnp.maximum(jnp.minimum(tr, rowsum), 1.5 * tau) * 1.02

        # ---- sign gate (quintic aggressive + cubic polish) ----
        sc = jnp.maximum(lub - tau, tau)
        s_mat = (a_cov - tau * eye) * (1.0 / sc)
        a, b_, c_ = _AGGR
        for _ in range(n_aggr):
            s2m = mx(s_mat, s_mat)
            s3m = mx(s2m, s_mat)
            s5m = mx(s2m, s3m)
            s_mat = a * s_mat + b_ * s3m + c_ * s5m
        for _ in range(n_polish):
            s_mat = 1.5 * s_mat - 0.5 * mx(s_mat, mx(s_mat, s_mat))
        w_gate = 0.5 * (s_mat + eye)

        # ---- per-group Chebyshev coefficients of the Wiener factor ----
        xs = nodes_ref[0]                                  # (nodes,)
        lam_i = (xs + 1.0) * (0.5 * lub)
        lam_c = jnp.maximum(lam_i, 0.9 * tau)
        wv = (lam_c - sb2) / (lam_c - sb2 + s2)            # (nodes,)
        coef = jnp.dot(wv.reshape(1, n_nodes), dct_ref[...],
                       preferred_element_type=jnp.float32)  # (1, wdeg+1)

        ah = 2.0 * a_cov * (1.0 / lub) - eye

        if left:
            y0 = mx(xn, w_gate)                            # (Kp, Pp)
            z_prev = y0
            z_cur = mx(y0, ah)
            acc = coef[0, 0] * z_prev + coef[0, 1] * z_cur
            for j in range(2, wdeg + 1):
                z_nxt = 2.0 * mx(z_cur, ah) - z_prev
                acc = acc + coef[0, j] * z_nxt
                z_prev, z_cur = z_cur, z_nxt
            y_ref[g] = acc
        else:
            t_prev = eye
            t_cur = ah
            q = coef[0, 0] * t_prev + coef[0, 1] * t_cur
            for j in range(2, wdeg + 1):
                t_nxt = 2.0 * mx(ah, t_cur) - t_prev
                q = q + coef[0, j] * t_nxt
                t_prev, t_cur = t_cur, t_nxt
            f_mat = mx(w_gate, q)
            y_ref[g] = mx(xn, f_mat)


@functools.partial(jax.jit,
                   static_argnames=("k_real", "cfg", "interpret"))
def poly_filter_pallas(xc2: jnp.ndarray, xn2: jnp.ndarray, k_real: int,
                       cfg, interpret: bool = False) -> jnp.ndarray:
    """Drop-in poly_filter: (G, K, p) in -> (G, K, p) out."""
    g, k, p = xc2.shape
    kp = _round_up(k, 8)
    pp = _round_up(p, 128)
    # block size: 3 (Gb, Kp, Pp) fp32 blocks within a ~4 MB VMEM budget
    gb = max(1, min(8, (4 * 1024 * 1024) // (3 * kp * pp * 4)))
    gpad = _round_up(max(g, 1), gb)

    def pad3(x):
        return jnp.pad(x, ((0, gpad - g), (0, kp - k), (0, pp - p)))

    xcp, xnp_ = pad3(xc2), pad3(xn2)

    wdeg = cfg.poly_deg
    n_nodes = max(64, 2 * (wdeg + 1))
    n_aggr, n_polish = _sign_schedule(cfg.ns_iters)
    dct = jnp.asarray(_dct_matrix(wdeg, n_nodes))          # (nodes, wdeg+1)
    nodes = jnp.asarray(_cheb_nodes(n_nodes)).reshape(1, n_nodes)

    kern = functools.partial(
        _poly_kernel, gb=gb, k_real=float(k_real), p_pad=pp,
        s2=float(cfg.sigma2), sb2=float(cfg.sigmab2),
        tau=float(cfg.thresh * cfg.sigma2 + cfg.sigmab2),
        n_aggr=n_aggr, n_polish=n_polish, wdeg=wdeg, n_nodes=n_nodes,
        left=bool(k < p), bf16=bool(cfg.poly_bf16))

    out = pl.pallas_call(
        kern,
        grid=(gpad // gb,),
        in_specs=[
            pl.BlockSpec((gb, kp, pp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, kp, pp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_nodes, wdeg + 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_nodes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, kp, pp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((gpad, kp, pp), jnp.float32),
        interpret=interpret,
    )(xcp, xnp_, dct, nodes)
    return out[:g, :k, :p]
