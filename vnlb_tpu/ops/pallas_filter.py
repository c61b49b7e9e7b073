"""Multi-group VMEM-resident Pallas kernel for the econ spectral filter.

Round-4 redesign of the fused filter kernel.  The microbench
(scripts/bench_mxu_floor.py) shows XLA's batched small matmuls cost a FLAT
~300 ns (~450 cycles) per group REGARDLESS of shape — (8,128), (120,120),
(128,128) — and dtype (f32 == bf16 time): not MXU weight load (~165 ns
model), not HBM (~105-210 ns model, f32 would be 2x bf16), but per-group
sequencing overhead in the batched-matmul lowering.  The production filter
chain is ~12-14 such ops per packed group pair, so the whole Bayes phase
sits on that overhead.

This kernel runs the ENTIRE economized chain (ops/polyspec.py
``_poly_econ_gram_packed`` for stage 1's K<p Gram route and
``_poly_econ_packed`` for stage 0's matrix route — the production
defaults) on a block of group pairs whose matrices stay RESIDENT IN VMEM:
HBM traffic is one read of (xc, xn) and one write of the filtered rows per
pair.

Why this succeeds where ops/pallas_poly.py measured slower than XLA: that
kernel looped ``for group: for chain-step:`` — consecutive matmuls are
DEPENDENT, so each (128,128) product pays the full MXU pipeline latency
("drains the systolic array between groups", its own post-mortem).  Here
the loops are swapped (STEP-major): at every chain step the ``gb`` pairs'
matmuls are mutually independent and issue back-to-back, keeping the
systolic array full; the dependency latency is paid once per step, not
once per (step x group).

TPU VERDICT (2026-08-19, dispatch-amortized A/B,
scripts/profile_filter_amortized.py — 16 dependent batches inside one jit
so tunnel dispatch amortizes): XLA WINS.  stage 1 (K=60, p=98): xla
1.645 ms/batch vs fused 1.964 (0.84x); stage 0 (K=100, p=49): 1.653 vs
1.855 (0.89x).  The earlier standalone "10x" (profile_pallas_filter.py)
was tunnel-dispatch artifact on the un-jitted XLA side.  The ~300 ns/group
batched-matmul floor is therefore NOT recoverable by VMEM residency at
these shapes — XLA's batched lowering already pipelines group-major;
``poly_impl='fused'`` stays available but the default remains 'xla'.

Semantics are the polyspec econ+pack2 routes verbatim — same masked
stacked products, same per-block lub bounds, same smoothed-gate transfer
values, same bf16 cast points (``st()``) — so the existing sigma-sweep
quality pins apply unchanged; bit-level parity with the XLA route is
pinned by tests/test_pallas_filter.py in interpret mode.

Reference semantics accelerated: lib/vnlb/deno/bayes_est.py:129-151
(clipped eigenvalue shrinkage + thresholded Wiener gate + projection),
evaluated as the fitted matrix polynomial of ops/polyspec.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .polyspec import _cheb_nodes, _gram_maps, _ps_basis_pinv, _ps_split


def _rup(x: int, m: int) -> int:
    return -(-x // m) * m


def _chain_steps(ghs, coef_fn, m, s, mx, eye):
    """T_s-substitution + Clenshaw chain, STEP-major over the pair list.

    ghs: list of (q, q) normalized operands (one per resident pair);
    coef_fn(g, i, r) -> (1, q) per-COLUMN coefficient lane vector.
    Mirrors polyspec._chain_mats exactly; every list comprehension is a
    burst of independent matmuls (the MXU pipelining point of this file).
    """
    a2 = [mx(gh, gh) for gh in ghs]
    if s == 4:
        a4 = [mx(a, a) for a in a2]
        b_mat = [8.0 * a4[g] - 8.0 * a2[g] + eye for g in range(len(ghs))]
        t3 = [mx(4.0 * a2[g] - 3.0 * eye, ghs[g]) for g in range(len(ghs))]
        t_mats = [[None, ghs[g], 2.0 * a2[g] - eye, t3[g]]
                  for g in range(len(ghs))]
    elif s == 3:
        b_mat = [mx(4.0 * a2[g] - 3.0 * eye, ghs[g])
                 for g in range(len(ghs))]
        t_mats = [[None, ghs[g], 2.0 * a2[g] - eye] for g in range(len(ghs))]
    elif s == 2:
        b_mat = [2.0 * a - eye for a in a2]
        t_mats = [[None, gh] for gh in ghs]
    else:
        raise NotImplementedError(f"ps split s={s}")

    def t_of(g, r):
        return eye if r == 0 else t_mats[g][r]

    v_mats = [[sum(coef_fn(g, i, r) * t_of(g, r) for r in range(s))
               for i in range(m)] for g in range(len(ghs))]
    b_hi = [jnp.zeros_like(gh) for gh in ghs]
    b_lo = [jnp.zeros_like(gh) for gh in ghs]
    for i in range(m - 1, 0, -1):
        b_new = [v_mats[g][i] + 2.0 * mx(b_hi[g], b_mat[g]) - b_lo[g]
                 for g in range(len(ghs))]
        b_lo, b_hi = b_hi, b_new
    return [v_mats[g][0] + mx(b_hi[g], b_mat[g]) - b_lo[g]
            for g in range(len(ghs))]


def _filter_kernel(xc_ref, xn_ref, xs_ref, gmap_ref, v0_ref, out_ref, *,
                   gb, q_real, half, k_real, m, s, deg, nodes, tau, s2, sb2,
                   bf16, gram):
    """One grid step = ``gb`` resident group pairs.

    gram=True : stage-1 Gram route — blocks along ROWS (2K rows of K each),
                chain on the (2K, 2K) packed Gram; final y = t @ xc.
    gram=False: stage-0 matrix route — blocks along LANES (2p lanes of p
                each), chain on the (2p, 2p) packed covariance;
                final y = xn @ f_mat.
    q_real = 2K (gram) or 2p (matrix); half = K or p.
    """
    cdt = jnp.bfloat16 if bf16 else jnp.float32

    def st(x):
        return x.astype(cdt)

    def mx(a, b):
        return jnp.dot(st(a), st(b), preferred_element_type=jnp.float32)

    qpad = out_ref.shape[1] if gram else xc_ref.shape[2]
    ri = jax.lax.broadcasted_iota(jnp.int32, (qpad, qpad), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (qpad, qpad), 1)
    eye = (ri == ci).astype(jnp.float32)
    # block-diagonal 0/1 mask (polyspec._blockdiag_mask2); padded rows/cols
    # beyond q_real are zero in the products anyway
    mask = (((ri < half) == (ci < half))
            & (ri < q_real) & (ci < q_real)).astype(jnp.float32)
    rhalf0 = (ri < half).astype(jnp.float32)        # (qpad, qpad) row sel
    col_lo = (jax.lax.broadcasted_iota(jnp.int32, (1, qpad), 1)
              < half).astype(jnp.float32)           # (1, qpad) lane sel
    row_lo = (jax.lax.broadcasted_iota(jnp.int32, (qpad, 1), 0)
              < half).astype(jnp.float32)           # (qpad, 1) sublane sel
    inv_k = 1.0 / k_real
    xs = xs_ref[0]                                  # (nodes,)

    # ---- per-pair packed second-moment matrices (one matmul each) ----
    grams, mhs = [], []
    for g in range(gb):
        xc = xc_ref[g]
        xn = xn_ref[g]
        if gram:
            gp = jax.lax.dot_general(
                st(xc), st(xc), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            mh = jax.lax.dot_general(
                st(xn), st(xc), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            mhs.append(mh * mask)
        else:
            gp = jax.lax.dot_general(
                st(xc), st(xc), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        grams.append(gp * (mask * inv_k))

    # ---- per-block spectral bounds + transfer coefficients (VPU) ----
    lubs, gams, f0s = [], [], []
    for g in range(gb):
        gp = grams[g]
        dvec = jnp.sum(gp * eye, axis=1, keepdims=True)     # (qpad, 1)
        tr0 = jnp.sum(dvec * row_lo)
        tr1 = jnp.sum(dvec) - tr0
        rsum = jnp.sum(jnp.abs(gp), axis=1, keepdims=True)  # (qpad, 1)
        rs0 = jnp.max(rsum * row_lo)
        rs1 = jnp.max(rsum * (1.0 - row_lo))
        lub0 = jnp.maximum(jnp.minimum(tr0, rs0), 1.5 * tau) * 1.02
        lub1 = jnp.maximum(jnp.minimum(tr1, rs1), 1.5 * tau) * 1.02
        lubs.append((lub0, lub1))

        gam_pair, f0_pair = [], []
        for lub in (lub0, lub1):
            lam_i = (xs + 1.0) * (0.5 * lub)                # (nodes,)
            wg = 1.2 * (np.pi / deg) * jnp.sqrt(tau * lub)
            gate = jax.nn.sigmoid((lam_i - tau) / (wg / 4.4))
            lam_s = jnp.maximum(lam_i - sb2, 0.0)
            fv = (gate * lam_s / (lam_s + s2)).reshape(1, nodes)
            gam_pair.append(jnp.dot(fv, gmap_ref[...],
                                    preferred_element_type=jnp.float32))
            if gram:
                f0_pair.append(jnp.dot(fv, v0_ref[...],
                               preferred_element_type=jnp.float32)[0, 0])
        gams.append(gam_pair)                               # 2 x (1, m*s)
        f0s.append(f0_pair)

    # ---- normalized operands + per-column coefficient vectors ----
    ghs, coefs = [], []
    for g in range(gb):
        lub0, lub1 = lubs[g]
        # per-block row scaling (gram route blocks are rows; matrix route
        # blocks are lanes but ah_p's scaling in polyspec is ALSO by the
        # row's block — rows and lanes tile identically on the diagonal
        # blocks, and off-diagonal entries are zero)
        rscale = row_lo * (2.0 / lub0) + (1.0 - row_lo) * (2.0 / lub1)
        ghs.append(grams[g] * rscale - eye)
        g0, g1 = gams[g]
        coefs.append((g0, g1))

    def coef_fn(g, i, r):
        g0, g1 = coefs[g]
        idx = i * s + r                                     # static
        c0 = g0[:, idx:idx + 1]                             # (1, 1)
        c1 = g1[:, idx:idx + 1]
        return col_lo * c0 + (1.0 - col_lo) * c1            # (1, qpad)

    fmats = _chain_steps(ghs, coef_fn, m, s, mx, eye)

    # ---- apply + write ----
    for g in range(gb):
        if gram:
            lub0, lub1 = lubs[g]
            t_p = mx(mhs[g], fmats[g])
            y = mx(t_p, xc_ref[g])                          # (qpad, ppad)
            f0r = row_lo * f0s[g][0] + (1.0 - row_lo) * f0s[g][1]
            ysc = row_lo * (2.0 / (k_real * lub0)) \
                + (1.0 - row_lo) * (2.0 / (k_real * lub1))
            out_ref[g] = f0r * xn_ref[g] + y * ysc
        else:
            out_ref[g] = mx(xn_ref[g], fmats[g])            # (kpad, qpad)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def poly_econ_gram_packed_pallas(xc2, xn2, cfg, interpret: bool = False):
    """Stage-1 (K < p) Gram-route filter, semantics of
    polyspec._poly_econ_gram_packed: (G, K, p) in -> (G, K, p) out.
    Requires G even and 2K <= 128 (same gates as the XLA packed route)."""
    g, k, p = xc2.shape
    assert g % 2 == 0 and 2 * k <= 128
    g2, k2 = g // 2, 2 * k
    m, s = _ps_split(cfg.poly_deg_fused)
    deg = m * s - 1
    nodes = max(64, 2 * (deg + 1))
    qpad = _rup(k2, 128)
    ppad = _rup(p, 128)

    gb = max(1, min(8, g2))
    g2p = _rup(g2, gb)

    def prep(x):
        x = x.reshape(g2, k2, p)
        return jnp.pad(x, ((0, g2p - g2), (0, qpad - k2), (0, ppad - p)))

    xcp, xnp_ = prep(xc2), prep(xn2)
    gmap, v0 = _gram_maps(m, s, nodes)
    gmap_j = jnp.asarray(gmap)                       # (nodes, m*s)
    v0_j = jnp.asarray(v0).reshape(nodes, 1)
    xs = jnp.asarray(_cheb_nodes(nodes)).reshape(1, nodes)

    kern = functools.partial(
        _filter_kernel, gb=gb, q_real=k2, half=k, k_real=float(k),
        m=m, s=s, deg=deg, nodes=nodes,
        tau=float(cfg.thresh * cfg.sigma2 + cfg.sigmab2),
        s2=float(cfg.sigma2), sb2=float(cfg.sigmab2),
        bf16=bool(cfg.poly_bf16), gram=True)

    out = pl.pallas_call(
        kern,
        grid=(g2p // gb,),
        in_specs=[
            pl.BlockSpec((gb, qpad, ppad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, qpad, ppad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nodes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nodes, m * s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nodes, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, qpad, ppad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g2p, qpad, ppad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(xcp, xnp_, xs, gmap_j, v0_j)
    return out[:g2, :k2, :p].reshape(g, k, p)


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def poly_econ_packed_pallas(xc2, xn2, cfg, interpret: bool = False):
    """Stage-0 (K >= p) matrix-route filter, semantics of
    polyspec._poly_econ_packed: (G, K, p) in -> (G, K, p) out.
    Requires G even and 2p <= 128."""
    g, k, p = xn2.shape
    assert g % 2 == 0 and 2 * p <= 128
    g2, p2 = g // 2, 2 * p
    m, s = _ps_split(cfg.poly_deg_fused)
    deg = m * s - 1
    nodes = max(64, 2 * (deg + 1))
    qpad = _rup(p2, 128)
    kpad = _rup(k, 16)

    gb = max(1, min(8, g2))
    g2p = _rup(g2, gb)

    def prep(x):
        # lane-stacked pairs: group 2g in lanes [:p], 2g+1 in lanes [p:]
        xp = jnp.transpose(x.reshape(g2, 2, k, p),
                           (0, 2, 1, 3)).reshape(g2, k, p2)
        return jnp.pad(xp, ((0, g2p - g2), (0, kpad - k), (0, qpad - p2)))

    xcp, xnp_ = prep(xc2), prep(xn2)
    gmap_j = jnp.asarray(_ps_basis_pinv(m, s, nodes))       # (nodes, m*s)
    v0_j = jnp.zeros((nodes, 1), jnp.float32)               # unused (matrix)
    xs = jnp.asarray(_cheb_nodes(nodes)).reshape(1, nodes)

    kern = functools.partial(
        _filter_kernel, gb=gb, q_real=p2, half=p, k_real=float(k),
        m=m, s=s, deg=deg, nodes=nodes,
        tau=float(cfg.thresh * cfg.sigma2 + cfg.sigmab2),
        s2=float(cfg.sigma2), sb2=float(cfg.sigmab2),
        bf16=bool(cfg.poly_bf16), gram=False)

    out = pl.pallas_call(
        kern,
        grid=(g2p // gb,),
        in_specs=[
            pl.BlockSpec((gb, kpad, qpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((gb, kpad, qpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nodes), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nodes, m * s), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nodes, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((gb, kpad, qpad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g2p, kpad, qpad), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
    )(xcp, xnp_, xs, gmap_j, v0_j)
    y = out[:g2, :k, :p2]
    return jnp.transpose(y.reshape(g2, k, 2, p), (0, 2, 1, 3)).reshape(
        g, k, p)
