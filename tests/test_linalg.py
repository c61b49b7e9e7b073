import numpy as np
import jax.numpy as jnp

from vnlb_tpu.ops.linalg import chol_inverse


def test_chol_inverse_matches_numpy():
    rng = np.random.default_rng(0)
    for n in (7, 49, 60):
        x = rng.normal(0, 1, (4, n + 8, n)).astype(np.float32)
        mats = np.einsum("gkp,gkq->gpq", x, x) + 0.5 * np.eye(n)
        inv = np.asarray(chol_inverse(jnp.asarray(mats.astype(np.float32))))
        want = np.linalg.inv(mats)
        # relative to the inverse's own scale
        denom = np.abs(want).max(axis=(1, 2), keepdims=True)
        np.testing.assert_allclose(inv / denom, want / denom, atol=2e-3)


def test_chol_inverse_identity():
    eye = np.broadcast_to(np.eye(12, dtype=np.float32), (3, 12, 12))
    inv = np.asarray(chol_inverse(jnp.asarray(eye.copy())))
    np.testing.assert_allclose(inv, eye, atol=1e-5)
