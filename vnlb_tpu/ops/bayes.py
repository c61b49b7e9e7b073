"""Empirical-Bayes (Wiener) patch-group filter.

Reference semantics (lib/vnlb/deno/bayes_est.py:17-151), re-expressed as one
fused XLA region over the ``(groups * channels)`` batch axis:

  1. reshape (B, K, pt, c, ps, ps) -> (B, c, K, p), p = pt*ps*ps;
  2. center: noisy groups by their own mean — except *flat* groups in step 2,
     which are centered on the basic mean (bayes_est.py:88-104);
  3. covariance of the ``cpatches`` source group: C = X^T X / K;
  4. batched symmetric eigendecomposition (jnp.linalg.eigh — the XLA
     counterpart of the reference's cuSOLVER syevd, SURVEY.md §2.2 N7),
     eigenvalues descending, top ``rank`` eigenvectors kept;
  5. "clipped" shrinkage: lam -= min(lam, sigma_basic^2) on the top-rank
     eigenvalues (bayes_est.py:129-138);
  6. Wiener coefficients: w = 1/(1 + sigma^2/lam) if lam > thresh*sigma^2
     else 0 (bayes_est.py:140-144);
  7. project: Xhat = (X U_r) (U_r * w)^T, re-add centers.

Returns the filtered noisy patches and ``rank_var`` (the pre-shrinkage
eigenvalue mass, reference bayes_est.py:39-40).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ..config import StageConfig


def _to_bcnp(p: jnp.ndarray) -> jnp.ndarray:
    """(B, K, pt, c, ps, ps) -> (B, c, K, pt*ps*ps)."""
    b, k, pt, c, ps, _ = p.shape
    return jnp.transpose(p, (0, 3, 1, 2, 4, 5)).reshape(b, c, k, pt * ps * ps)


def _from_bcnp(x: jnp.ndarray, pt: int, ps: int) -> jnp.ndarray:
    b, c, k, _ = x.shape
    x = x.reshape(b, c, k, pt, ps, ps)
    return jnp.transpose(x, (0, 2, 3, 1, 4, 5))


def bayes_denoise(pnoisy: jnp.ndarray, pbasic: Optional[jnp.ndarray],
                  flat: Optional[jnp.ndarray], cfg: StageConfig
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Filter noisy patch groups; returns (filtered, rank_var).

    pnoisy/pbasic: (B, K, pt, c, ps, ps); flat: (B,) bool or None.
    """
    b, k, pt, c, ps, _ = pnoisy.shape
    p = pt * ps * ps
    rank = min(cfg.rank, p)
    step2 = cfg.step == 1

    xn = _to_bcnp(pnoisy)                                   # (B, c, K, p)
    cnoisy = jnp.mean(xn, axis=2, keepdims=True)            # (B, c, 1, p)

    if step2:
        assert pbasic is not None and flat is not None
        xb = _to_bcnp(pbasic)
        cbasic = jnp.mean(xb, axis=2, keepdims=True)
        cnoisy = jnp.where(flat[:, None, None, None], cbasic, cnoisy)
        xb = xb - cbasic
    xn = xn - cnoisy

    if cfg.cpatches == "noisy":
        xc = xn
    elif cfg.cpatches == "basic":
        if not step2:
            raise ValueError("cpatches='basic' requires step 2")
        xc = xb
    else:
        raise ValueError(f"unknown cpatches [{cfg.cpatches}]")

    xc2 = xc.reshape(b * c, k, p)
    xn2 = xn.reshape(b * c, k, p)

    cov = jnp.einsum("gkp,gkq->gpq", xc2, xc2,
                     preferred_element_type=jnp.float32) / k
    evals, evecs = jnp.linalg.eigh(cov)                     # ascending
    evals = evals[:, ::-1]                                  # descending
    u = evecs[:, :, ::-1][:, :, :rank]                      # (g, p, rank)

    rank_var = jnp.sum(evals.reshape(b, c, p), axis=2).mean(axis=1)

    lam = evals[:, :rank]
    if cfg.mod_sel == "clipped":
        lam = lam - jnp.minimum(lam, cfg.sigmab2)
    elif cfg.mod_sel != "paul":
        raise ValueError(f"unknown eigen modifier [{cfg.mod_sel}]")

    gate = lam > (cfg.thresh * cfg.sigma2)
    coeff = jnp.where(gate, 1.0 / (1.0 + cfg.sigma2 / jnp.where(gate, lam, 1.0)),
                      0.0)                                  # (g, rank)

    z = jnp.einsum("gkp,gpr->gkr", xn2, u,
                   preferred_element_type=jnp.float32)
    xf = jnp.einsum("gkr,gpr->gkp", z * coeff[:, None, :], u,
                    preferred_element_type=jnp.float32)

    out = xf.reshape(b, c, k, p) + cnoisy
    return _from_bcnp(out, pt, ps), rank_var


def ave_denoise(pnoisy: jnp.ndarray) -> jnp.ndarray:
    """'ave' mode.

    The reference's deno dispatch computes the group mean but the caller
    discards the return value (deno/__init__.py:13-14 vs proc_nl.py:81), so
    the *effective* reference behavior — which ``denoise_mod`` relies on — is
    aggregation of the raw noisy patches.  We reproduce that behavior
    (identity) rather than the dead code path.
    """
    return pnoisy
