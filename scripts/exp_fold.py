#!/usr/bin/env python
"""A/B: column-space fold (col2im) variants (TPU).

The production agg.fold lowers to pt*ps*ps strided .at[].add slabs
(~0.06 s/pass at 480p traced).  Candidate: ONE grouped one-hot conv with
full padding — col2im is exactly the transposed im2col conv; each 49-lane
group (plane j, channel ci) folds to one output channel, the weight lane
folds with an all-ones (ps, ps, 1, 1) conv.
"""

import _bootstrap  # noqa: F401
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vnlb_tpu.ops import agg


def fold_conv(acc, pt, ps, shape):
    t_len, c, h, w = shape
    hp, wp = h - ps + 1, w - ps + 1
    d = c * ps * ps

    k = np.zeros((ps, ps, ps * ps, pt * c), np.float32)
    for g in range(pt * c):
        for dy in range(ps):
            for dx in range(ps):
                k[ps - 1 - dy, ps - 1 - dx, dy * ps + dx, g] = 1.0
    x = acc[:, :pt * d].reshape(t_len, hp, wp, pt * d)
    out = lax.conv_general_dilated(
        x, jnp.asarray(k), (1, 1), [(ps - 1, ps - 1), (ps - 1, ps - 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=pt * c,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)            # (T, H, W, pt*c)

    kw = np.ones((ps, ps, 1, 1), np.float32)
    wv = acc[:, -1:].reshape(t_len, hp, wp, 1)
    wout = lax.conv_general_dilated(
        wv, jnp.asarray(kw), (1, 1), [(ps - 1, ps - 1), (ps - 1, ps - 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)[..., 0]    # (T, H, W)

    deno = jnp.zeros((t_len, c, h, w), jnp.float32)
    weights = jnp.zeros((t_len, h, w), jnp.float32)
    for j in range(pt):
        pj = jnp.transpose(out[..., j * c:(j + 1) * c], (0, 3, 1, 2))
        tl = t_len - j
        deno = deno.at[j:].add(pj[:tl])
        weights = weights.at[j:].add(wout[:tl])
    return deno, weights


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=5)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--pt", type=int, default=2)
    args = ap.parse_args()

    t, h, w, pt = args.t, args.h, args.w, args.pt
    ps, c = 7, 3
    hp, wp = h - ps + 1, w - ps + 1
    d = c * ps * ps
    shape = (t, c, h, w)

    rng = np.random.default_rng(0)
    acc = jnp.asarray(rng.normal(0, 1, (t * hp * wp, pt * d + 1))
                      .astype(np.float32))

    f_ref = jax.jit(lambda a: agg.fold(a, pt, ps, shape))
    f_new = jax.jit(lambda a: fold_conv(a, pt, ps, shape))

    outs = {}
    for name, fn in [("prod", f_ref), ("conv", f_new)]:
        dn, wt = fn(acc)
        outs[name] = (dn, wt)
        _ = float(jnp.sum(dn))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            dn, wt = fn(acc)
            _ = float(jnp.sum(dn)) + float(jnp.sum(wt))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:5s}: {best:7.4f} s", flush=True)

    dmax = float(jnp.max(jnp.abs(outs["prod"][0] - outs["conv"][0])))
    wmax = float(jnp.max(jnp.abs(outs["prod"][1] - outs["conv"][1])))
    print(f"max |deno diff| = {dmax:.3e}   max |wts diff| = {wmax:.3e}")


if __name__ == "__main__":
    main()
