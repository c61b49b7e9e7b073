#!/usr/bin/env python
"""Fold (col2im) cost breakdown at production shape, dispatch-amortized.

agg.fold is ~0.18 s combined across the two passes (in-jit marginals) —
the largest single block after search + bayes.  This script attributes it:
full fold vs the big (0,3,5,4,1,2) transpose alone vs the shifted-add
stages on pre-transposed input vs the weight-lane cumsum box, plus a
DENSE (non-grouped) one-hot conv variant (the GROUPED conv variant was
already measured 6.6x slower, scripts/exp_fold.py — XLA lowers grouped
convs poorly on TPU; the dense form burns pt*c more MXU FLOPs but stays
one fused op).

Each variant runs ITERS dependent iterations inside one jit (chain trick)
so the ~10-25 ms tunnel dispatch amortizes.
"""

import _bootstrap  # noqa: F401
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from vnlb_tpu.ops import agg

ITERS = 3


def chain(fn, x, reps=2):
    @jax.jit
    def run(a):
        acc = 0.0
        for _ in range(ITERS):
            outs = fn(a)
            s = sum(jnp.sum(o) for o in (outs if isinstance(outs, tuple)
                                         else (outs,)))
            acc = acc + s * 1e-30
            # dependency without a full copy: a scalar in-place update on
            # the (dead) previous value aliases in XLA
            a = a.at[0, 0].add(acc * 1e-38)
        return acc

    _ = float(run(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _ = float(run(x))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS


def fold_conv_dense(acc_arr, pt, ps, shape):
    """Dense one-hot transposed-im2col conv: (N, pt*d+1) -> deno, weights.

    All pt*c output channels from ONE VALID conv on the (ps-1)-padded
    column grid; kernel one-hot (flipped); HIGHEST precision keeps the 0/1
    products exact (im2col_conv's argument, ops/gather.py)."""
    t_len, c, h, w = shape
    hp, wp = h - ps + 1, w - ps + 1
    d = c * ps * ps

    k = np.zeros((ps, ps, pt * d, pt * c), np.float32)
    for j in range(pt):
        for ci in range(c):
            for dy in range(ps):
                for dx in range(ps):
                    k[ps - 1 - dy, ps - 1 - dx,
                      j * d + ci * ps * ps + dy * ps + dx, j * c + ci] = 1.0
    x = acc_arr[:, :pt * d].reshape(t_len, hp, wp, pt * d)
    out = lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), [(ps - 1, ps - 1), (ps - 1, ps - 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)            # (T, H, W, pt*c)

    wv = acc_arr[:, -1].reshape(t_len, hp, wp)
    wfull = agg._box_full(wv, ps)
    deno = jnp.zeros((t_len, c, h, w), jnp.float32)
    weights = wfull
    for j in range(1, pt):
        weights = weights + jnp.concatenate(
            [jnp.zeros((j, h, w), jnp.float32), wfull[:t_len - j]], axis=0)
    for j in range(pt):
        pj = jnp.transpose(out[..., j * c:(j + 1) * c], (0, 3, 1, 2))
        tl = t_len - j
        deno = deno + jnp.concatenate(
            [jnp.zeros((j, c, h, w), jnp.float32), pj[:tl]], axis=0)
    return deno, weights


def main():
    print(f"devices: {jax.devices()}")
    t_len, c, h, w = 5, 3, 480, 854
    ps, pt = 7, 2
    hp, wp = h - ps + 1, w - ps + 1
    d = c * ps * ps
    shape = (t_len, c, h, w)
    rng = np.random.default_rng(0)
    n = t_len * hp * wp
    acc_arr = jnp.asarray(
        rng.normal(size=(n, pt * d + 1)).astype(np.float32))
    print(f"acc: {acc_arr.nbytes / 1e9:.2f} GB ({n} rows x {pt * d + 1})")

    # (conv-dense correctness vs the production fold was verified on CPU:
    # max abs err 9.5e-06 deno / 0.0 weights — fp add-order only)

    t_full = chain(lambda a: agg.fold(a, pt, ps, shape), acc_arr)
    print(f"[fold] production separable fold: {t_full * 1e3:.1f} ms")

    def transpose_only(a):
        outs = []
        for j in range(pt):
            x = a[:, j * d:(j + 1) * d].reshape(t_len, hp, wp, c, ps, ps)
            outs.append(jnp.transpose(x, (0, 3, 5, 4, 1, 2)))
        return tuple(outs)

    t_t = chain(transpose_only, acc_arr)
    print(f"[fold] (0,3,5,4,1,2) transposes only: {t_t * 1e3:.1f} ms")

    def weights_only(a):
        wv = a[:, -1].reshape(t_len, hp, wp)
        return agg._box_full(wv, ps)

    t_w = chain(weights_only, acc_arr)
    print(f"[fold] weight-lane cumsum box only: {t_w * 1e3:.1f} ms")

    t_c = chain(lambda a: fold_conv_dense(a, pt, ps, shape), acc_arr)
    print(f"[fold] dense one-hot conv variant: {t_c * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
