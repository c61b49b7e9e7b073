import numpy as np
import jax.numpy as jnp
import pytest

from vnlb_tpu.ops.eigh import _round_robin_schedule, jacobi_eigh


def test_schedule_covers_all_pairs():
    for n in (4, 8, 60, 98):
        n_even = n + n % 2
        sched = _round_robin_schedule(n_even)
        seen = set()
        for r in range(sched.shape[0]):
            used = set()
            for i in range(sched.shape[2]):
                p, q = int(sched[r, 0, i]), int(sched[r, 1, i])
                assert p < q
                assert p not in used and q not in used  # disjoint in round
                used.update((p, q))
                seen.add((p, q))
        assert len(seen) == n_even * (n_even - 1) // 2


@pytest.mark.parametrize("n", [7, 12, 49, 60])
def test_jacobi_matches_numpy(n):
    rng = np.random.default_rng(n)
    g = 5
    x = rng.normal(0, 1, (g, n + 5, n)).astype(np.float32)
    mats = np.einsum("gkp,gkq->gpq", x, x) / (n + 5)
    w, v = jacobi_eigh(jnp.asarray(mats), sweeps=10)
    w, v = np.asarray(w), np.asarray(v)

    w_np = np.linalg.eigvalsh(mats.astype(np.float64))[:, ::-1]
    scale = np.abs(w_np).max()
    np.testing.assert_allclose(w, w_np, atol=2e-4 * scale, rtol=2e-3)

    # eigenvector residual: ||C v - w v|| small
    for gi in range(g):
        res = mats[gi] @ v[gi] - v[gi] * w[gi][None, :]
        assert np.abs(res).max() < 5e-3 * scale, np.abs(res).max()
    # orthonormality
    vtv = np.einsum("gij,gik->gjk", v, v)
    eye = np.broadcast_to(np.eye(n), (g, n, n))
    np.testing.assert_allclose(vtv, eye, atol=5e-4)


def test_jacobi_descending():
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (3, 30, 20)).astype(np.float32)
    mats = np.einsum("gkp,gkq->gpq", x, x)
    w, _ = jacobi_eigh(jnp.asarray(mats))
    w = np.asarray(w)
    assert np.all(np.diff(w, axis=1) <= 1e-3)
