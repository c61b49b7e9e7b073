"""Polynomial spectral Wiener filter — MXU-native fast path for the Bayes step.

Why (round-2 redesign of ops/spectral.py): the rational fast path evaluates
its spectral transfer function with batched Cholesky inverses whose
``fori_loop`` recurrences are *latency*-bound on TPU (~300 dependent
micro-steps per batch — the dominant pipeline phase in the round-1 profile),
and its softened gate runs the basic pass ~0.5 dB soft.  This module
evaluates the exact transfer function (reference
lib/vnlb/deno/bayes_est.py:129-144, "clipped" mode)

    f(lam) = [lam > tau] * (lam - sb2) / (lam - sb2 + s2),
    tau    = thresh * s2 + sb2

entirely with batched matrix products — the only TPU primitive that runs at
MXU speed and parallelizes freely over the ~10^5 patch groups per frame:

* the hard gate ``[lam > tau]`` is a **Newton-Schulz matrix sign** iteration
  on (C - tau I)/c:  S <- (3S - S^3)/2.  Every eigenvalue converges
  monotonically to sign(lam - tau); ``ns_iters`` controls the transition
  sharpness (width ~ c * 1.5^-iters around tau) with NO Gibbs oscillation
  (|s| <= 1 throughout, stable at MXU default precision).
* the smooth Wiener factor is a per-group **Chebyshev expansion** in
  C/lub (degree ``poly_deg``); the target is evaluated at Chebyshev nodes
  and projected with one constant DCT matrix, so per-group spectral-scale
  variation costs one tiny (G, nodes) @ (nodes, deg+1) matmul.
* ``lub`` (spectral upper bound) = min(trace, max row sum) — both valid
  bounds for SPD matrices; no power iteration, no failure mode.

Always the covariance (p x p) domain: the Gram-domain shared-SVD identity
needs f(lam)/lam, whose 1/lam re-amplifies the fit error by lam_max/tau
(measured 100x+ patch error on strong-signal groups) — the cov domain has
no pole.  ``cfg.rank`` is NOT applied (a spectral function has no order
statistic); eigenvalues ranked below ``rank`` are almost always below
``tau`` and killed by the gate — the same approximation the rational path
makes (docs/COMPARE.md).

Accuracy is pinned against the exact-eigh path by tests/test_polyspec.py.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _dct_matrix(deg: int, nodes: int):
    """Constant (nodes, deg+1) projection: node values -> Chebyshev coeffs."""
    jj = np.arange(deg + 1)
    m = np.cos(np.pi * jj[:, None] * (np.arange(nodes) + 0.5)[None, :]
               / nodes) * (2.0 / nodes)
    m[0] *= 0.5
    return m.T.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _cheb_nodes(nodes: int):
    return np.cos(np.pi * (np.arange(nodes) + 0.5) / nodes).astype(np.float32)


def poly_filter(xc2: jnp.ndarray, xn2: jnp.ndarray, cfg) -> jnp.ndarray:
    """Spectrally-filtered patches, (G, K, p) in -> (G, K, p) out.

    xc2: centered covariance-source patches; xn2: centered noisy patches.
    """
    g, k, p = xc2.shape
    s2, sb2 = cfg.sigma2, cfg.sigmab2
    tau = cfg.thresh * s2 + sb2
    ns_iters = cfg.ns_iters
    wdeg = cfg.poly_deg
    nodes = max(64, 2 * (wdeg + 1))

    def mm(a, b):
        return jnp.einsum("gij,gjk->gik", a, b,
                          preferred_element_type=jnp.float32)

    a_cov = jnp.einsum("gkp,gkq->gpq", xc2, xc2, precision=_HI,
                       preferred_element_type=jnp.float32) / k
    eye = jnp.eye(p, dtype=a_cov.dtype)

    tr = jnp.einsum("gii->g", a_cov)
    rowsum = jnp.max(jnp.sum(jnp.abs(a_cov), axis=2), axis=1)
    lub = jnp.maximum(jnp.minimum(tr, rowsum), 1.5 * tau) * 1.02

    # ---- Newton-Schulz sign gate: W ~ H(lam - tau) -----------------------
    sc = jnp.maximum(lub - tau, tau)
    s_mat = (a_cov - tau * eye) / sc[:, None, None]
    for _ in range(ns_iters):
        s_mat = 1.5 * s_mat - 0.5 * mm(s_mat, mm(s_mat, s_mat))
    w_gate = 0.5 * (s_mat + eye)

    # ---- smooth Wiener factor via per-group Chebyshev --------------------
    xs = jnp.asarray(_cheb_nodes(nodes))
    dct = jnp.asarray(_dct_matrix(wdeg, nodes))
    lam_i = (xs[None, :] + 1.0) * 0.5 * lub[:, None]          # (G, nodes)
    lam_c = jnp.maximum(lam_i, 0.9 * tau)                     # gated region
    wv = (lam_c - sb2) / (lam_c - sb2 + s2)
    coef = wv @ dct                                           # (G, wdeg+1)

    ah = 2.0 * a_cov / lub[:, None, None] - eye
    t_prev = jnp.broadcast_to(eye, a_cov.shape)
    t_cur = ah
    q = coef[:, 0, None, None] * t_prev + coef[:, 1, None, None] * t_cur
    for j in range(2, wdeg + 1):
        t_nxt = 2.0 * mm(ah, t_cur) - t_prev
        q = q + coef[:, j, None, None] * t_nxt
        t_prev, t_cur = t_cur, t_nxt

    f_mat = mm(w_gate, q)
    return jnp.einsum("gkp,gpq->gkq", xn2, f_mat,
                      preferred_element_type=jnp.float32)
