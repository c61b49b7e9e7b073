#!/usr/bin/env python
"""Accuracy probe: int8-quantized matmuls inside the econ spectral filter.

v5e executes int8 MXU ops at 2x the bf16 rate (394 TOPS vs 197 TFLOPS) and
halves the weight-tile load bill — if the filter phase stays weight-load
bound after the round-3 kernels, int8 Clenshaw is the next 2x candidate.
This probe answers the PREREQUISITE question on CPU: how much patch / PSNR
error does per-matrix dynamic int8 quantization of the Clenshaw chain add?

Protocol: realistic patch groups, filter with (a) exact eigh, (b)
production econ poly, (c) econ poly with every matmul int8-quantized;
report patch rel-errors.

RESULT (2026-08-18, the reason int8 is NOT wired into production): the
Clenshaw recurrence needs per-ELEMENT dynamic range — bf16's floating
exponent — not per-row scales.  Measured on 256 realistic groups
(K=100, p=49, sigma=20): bf16 storage rms error 0.19% of scale; int8
with per-matrix scales 3.9%; int8 with per-row/per-column scales still
3.2% — ~17x worse than bf16, far outside the <=0.1 dB budget.  The
recurrence's 2*b_hi@B - b_lo cancellation amplifies any error that is
relative to a row max instead of to each element.
"""

import _bootstrap  # noqa: F401
import argparse

import numpy as np
import jax
import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.ops import polyspec


def _dot8(a, b, scale_axes_a=(2,), scale_axes_b=(1,)):
    """Batched a @ b with both operands dynamically int8-quantized.

    a: (G, M, K), b: (G, K, N) float32; per-ROW scales on a (axis 2
    reduced) and per-COLUMN scales on b (axis 1 reduced): the output
    (m, n) entry's quantization error is then relative to
    |a_row_m| * |b_col_n|, not to the matrix-wide max.
    """
    sa = jnp.max(jnp.abs(a), axis=scale_axes_a, keepdims=True) + 1e-30
    sb = jnp.max(jnp.abs(b), axis=scale_axes_b, keepdims=True) + 1e-30
    ai = jnp.clip(jnp.round(a / sa * 127.0), -127, 127).astype(jnp.int8)
    bi = jnp.clip(jnp.round(b / sb * 127.0), -127, 127).astype(jnp.int8)
    out = jax.lax.dot_general(ai, bi, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.int32)
    return out.astype(jnp.float32) * (sa * sb / (127.0 * 127.0))


def patch_int8(monkey=True):
    """Patch polyspec's einsum matmuls with int8 variants (probe only)."""
    orig = {}

    def lmm8(a, b):                                      # (G,K,p) @ (G,p,p)
        return _dot8(jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32))

    return lmm8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--groups", type=int, default=256)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    cfg0 = default_config(args.sigma, preset="iphone").stage(0)

    # realistic group statistics: smooth signal + noise, K=100, p=49
    g, k, p = args.groups, cfg0.npatches, cfg0.pt * 1 * cfg0.ps * cfg0.ps
    base = rng.normal(size=(g, 1, p)).astype(np.float32) * \
        rng.uniform(2, 60, size=(g, 1, 1)).astype(np.float32)
    wave = np.cumsum(rng.normal(size=(g, k, p)).astype(np.float32), axis=2)
    wave -= wave.mean(axis=2, keepdims=True)
    noise = rng.normal(size=(g, k, p)).astype(np.float32) * args.sigma
    xc2 = jnp.asarray(base + 0.2 * wave + noise)
    xn2 = xc2

    # exact reference: eigh clipped-Wiener (mirrors ops/bayes.py:129-160)
    from vnlb_tpu.ops import bayes as _bayes

    ecfg = cfg0.replace(eig_method="xla")
    lam, coeff, basis, domain = _bayes._spectral_filter(
        xc2, ecfg, min(ecfg.rank, p))
    if domain == "gram":
        rank = min(ecfg.rank, p)
        mu_r = jnp.maximum(lam[:, :rank], 0.0)
        wv = jnp.where(mu_r > 1e-8,
                       coeff / jnp.maximum(k * mu_r, 1e-10), 0.0)
        m = jnp.einsum("gkp,glp->gkl", xn2, xc2)
        t1 = jnp.einsum("gkl,glr->gkr", m, basis)
        t2 = jnp.einsum("gkr,glr->gkl", t1 * wv[:, None, :], basis)
        y_ex = jnp.einsum("gkl,glp->gkp", t2, xc2)
    else:
        z = jnp.einsum("gkp,gpr->gkr", xn2, basis)
        y_ex = jnp.einsum("gkr,gpr->gkp", z * coeff[:, None, :], basis)

    y_f32 = polyspec.poly_filter_econ(xc2, xn2, cfg0.replace(poly_bf16=False))
    y_bf16 = polyspec.poly_filter_econ(xc2, xn2, cfg0)

    # int8 variant: monkeypatch the einsum contractions
    lmm8 = patch_int8()
    orig_einsum = jnp.einsum

    def einsum8(spec, *ops, **kw):
        if spec in ("gkp,gpq->gkq", "gij,gjk->gik"):
            return lmm8(*ops)
        return orig_einsum(spec, *ops, **kw)

    polyspec.jnp.einsum = einsum8
    try:
        y_i8 = polyspec.poly_filter_econ(xc2, xn2,
                                         cfg0.replace(poly_bf16=False))
    finally:
        polyspec.jnp.einsum = orig_einsum

    scale = float(jnp.max(jnp.abs(y_f32)))

    def rel(a, b):
        return float(jnp.max(jnp.abs(a - b))) / scale, \
            float(jnp.sqrt(jnp.mean((a - b) ** 2))) / scale

    print(f"groups={g} K={k} p={p} sigma={args.sigma}")
    print(f"bf16 vs f32 : max {rel(y_bf16, y_f32)[0]:.5f} "
          f"rms {rel(y_bf16, y_f32)[1]:.6f}")
    print(f"int8 vs f32 : max {rel(y_i8, y_f32)[0]:.5f} "
          f"rms {rel(y_i8, y_f32)[1]:.6f}")
    if y_ex is not None:
        print(f"f32  vs eigh: max {rel(y_f32, y_ex)[0]:.5f} "
              f"rms {rel(y_f32, y_ex)[1]:.6f}")
        print(f"int8 vs eigh: max {rel(y_i8, y_ex)[0]:.5f} "
              f"rms {rel(y_i8, y_ex)[1]:.6f}")


if __name__ == "__main__":
    main()
