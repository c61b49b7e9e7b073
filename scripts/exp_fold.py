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


def _box_full(x, ps):
    """FULL-padding ps x ps box sum over the last two dims:
    out[Y, X] = sum_{dy, dx} x[Y-dy, X-dx] (zero outside)."""
    t, hp, wp = x.shape
    h, w = hp + ps - 1, wp + ps - 1
    xr = jnp.pad(x, ((0, 0), (0, ps - 1), (0, ps - 1)))
    cr = jnp.cumsum(xr, axis=-1)
    cr = jnp.concatenate([cr[..., :ps], cr[..., ps:] - cr[..., :-ps]],
                         axis=-1)
    cc = jnp.cumsum(cr, axis=-2)
    cc = jnp.concatenate([cc[..., :ps, :], cc[..., ps:, :]
                          - cc[..., :-ps, :]], axis=-2)
    return cc


def fold_twostage(acc, pt, ps, shape):
    t_len, c, h, w = shape
    hp, wp = h - ps + 1, w - ps + 1
    d = c * ps * ps
    wv = acc[:, -1].reshape(t_len, hp, wp)

    wfull = _box_full(wv, ps)
    deno = jnp.zeros((t_len, c, h, w), acc.dtype)
    weights = jnp.zeros((t_len, h, w), wv.dtype)
    for j in range(pt):
        tl = t_len - j
        weights = weights.at[j:].add(wfull[:tl])
        a = acc[:, j * d:(j + 1) * d].reshape(t_len, hp, wp, c, ps, ps)
        a = jnp.transpose(a, (0, 3, 5, 4, 1, 2))   # (T, C, dx, dy, H', W')
        accx = jnp.zeros((t_len, c, ps, h, wp), acc.dtype)
        for dy in range(ps):
            accx = accx.at[:, :, :, dy:dy + hp, :].add(a[:, :, :, dy])
        for dx in range(ps):
            deno = deno.at[j:, :, :, dx:dx + wp].add(
                accx[:t_len - j, :, dx])
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
    f_two = jax.jit(lambda a: fold_twostage(a, pt, ps, shape))

    outs = {}
    for name, fn in [("prod", f_ref), ("two", f_two), ("conv", f_new)]:
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

    for nm in ("two", "conv"):
        dmax = float(jnp.max(jnp.abs(outs["prod"][0] - outs[nm][0])))
        wmax = float(jnp.max(jnp.abs(outs["prod"][1] - outs[nm][1])))
        print(f"{nm}: max |deno diff| = {dmax:.3e}   "
              f"max |wts diff| = {wmax:.3e}")


if __name__ == "__main__":
    main()
