import numpy as np
import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.bayes import ave_denoise, bayes_denoise
from vnlb_tpu.ops.flat import flat_areas


def numpy_bayes(pnoisy, pbasic, flat, cfg):
    """Scalar numpy oracle of the Bayes filter semantics
    (reference deno/bayes_est.py:17-151)."""
    b, k, pt, c, ps, _ = pnoisy.shape
    p = pt * ps * ps
    rank = min(cfg.rank, p)
    xn = pnoisy.transpose(0, 3, 1, 2, 4, 5).reshape(b, c, k, p).astype(np.float64)
    if cfg.step == 1:
        xb = pbasic.transpose(0, 3, 1, 2, 4, 5).reshape(b, c, k, p).astype(np.float64)
        cb = xb.mean(axis=2, keepdims=True)
        cn = xn.mean(axis=2, keepdims=True)
        cn = np.where(flat[:, None, None, None], cb, cn)
        xb = xb - cb
    else:
        cn = xn.mean(axis=2, keepdims=True)
    xn = xn - cn
    xc = xn if cfg.cpatches == "noisy" else xb

    out = np.zeros_like(xn)
    for bi in range(b):
        for ci in range(c):
            X = xc[bi, ci]
            C = X.T @ X / k
            lam, U = np.linalg.eigh(C)
            lam = lam[::-1]
            U = U[:, ::-1][:, :rank]
            lr = lam[:rank].copy()
            lr -= np.minimum(lr, cfg.sigmab2)
            coeff = np.where(lr > cfg.thresh * cfg.sigma2,
                             1.0 / (1.0 + cfg.sigma2 / np.where(lr > 0, lr, 1)),
                             0.0)
            Z = xn[bi, ci] @ U
            out[bi, ci] = Z @ (U * coeff).T
    out = out + cn
    return out.reshape(b, c, k, pt, ps, ps).transpose(0, 2, 3, 1, 4, 5)


def _mk_patches(rng, b=3, k=12, pt=2, c=3, ps=5):
    # Low-rank structure plus *tiny* noise: the structural eigenvalues are
    # huge and the noise/null eigenvalues sit far below the Wiener gate, so
    # the filtered output is insensitive to LAPACK-vs-XLA eigenvector
    # ambiguity in (near-)degenerate subspaces.
    basis = rng.normal(0, 40, (b, 4, pt * c * ps * ps))
    coefs = rng.normal(0, 1, (b, k, 4))
    clean = np.einsum("bkr,brp->bkp", coefs, basis)
    noisy = clean + rng.normal(0, 0.5, clean.shape)
    return (noisy.reshape(b, k, pt, c, ps, ps).astype(np.float32),
            clean.reshape(b, k, pt, c, ps, ps).astype(np.float32))


def test_bayes_step0_matches_numpy():
    rng = np.random.default_rng(3)
    pnoisy, _ = _mk_patches(rng)
    cfg = default_config(5.0).stage(0).replace(ps=5, rank=20,
                                           eig_method="jacobi")
    got, rank_var = bayes_denoise(jnp.asarray(pnoisy), None, None, cfg)
    want = numpy_bayes(pnoisy, None, None, cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-2)
    assert rank_var.shape == (pnoisy.shape[0],)
    assert np.all(np.asarray(rank_var) > 0)


def test_bayes_step1_flat_centering_matches_numpy():
    rng = np.random.default_rng(4)
    pnoisy, pclean = _mk_patches(rng)
    cfg = default_config(5.0).stage(1).replace(ps=5, rank=20,
                                           eig_method="jacobi")
    flat = np.array([True, False, True])
    got, _ = bayes_denoise(jnp.asarray(pnoisy), jnp.asarray(pclean),
                           jnp.asarray(flat), cfg)
    want = numpy_bayes(pnoisy, pclean, flat, cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-2)


def test_bayes_shrinks_noise():
    # filtering pure-noise groups with a matching sigma should reduce energy
    rng = np.random.default_rng(5)
    sigma = 20.0
    pnoisy = rng.normal(0, sigma, (4, 30, 2, 3, 7, 7)).astype(np.float32)
    cfg = default_config(sigma).stage(0)
    got, _ = bayes_denoise(jnp.asarray(pnoisy), None, None, cfg)
    assert float(jnp.var(got)) < 0.6 * float(np.var(pnoisy))


def test_flat_areas():
    rng = np.random.default_rng(6)
    sigma2 = 400.0
    flat_grp = rng.normal(100, 5.0, (1, 10, 2, 3, 7, 7))
    tex_grp = rng.normal(100, 80.0, (1, 10, 2, 3, 7, 7))
    groups = np.concatenate([flat_grp, tex_grp]).astype(np.float32)
    flags = flat_areas(jnp.asarray(groups), 0.95, sigma2)
    assert bool(flags[0]) and not bool(flags[1])


def test_ave_mode_is_identity():
    x = jnp.ones((2, 3, 1, 3, 7, 7))
    np.testing.assert_array_equal(np.asarray(ave_denoise(x)), np.asarray(x))
