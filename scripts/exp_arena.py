#!/usr/bin/env python
"""A/B: step-1 patch-arena construction variants (TPU).

Trace attribution (scripts/trace_attr.py, 480p stride-6 step 1) shows the
production arena build — im2col_conv -> cols_fuse_pt(c-major roll+concat)
-> join concat — lowers the roll/concat graph to ~1470 per-(frame, lane)
dynamic-update-slices (~0.12 s) plus a 0.017 s join concat, while the conv
itself is ~0.019 s.  Candidate fix: fold the pt-fusion and the noisy/basic
join INTO the one-hot conv kernel so the arena comes out of ONE MXU op in
its final lane order (more MXU FLOPs, zero relayout).

Variants (all produce the (N, 2*pt*D) c-major joint arena, bitwise equal):
  prod   im2col_conv x2 -> cols_fuse_pt(c) x2 -> concat
  conv1  ONE conv, input channels (img, f_off, ci) = 12, kernel
         (ps, ps, 12, 588)
  conv2  per-image direct-fused convs (ps, ps, 6, 294) -> join concat
Each timed as arena-build + one production joint take (256x60 rows), so
layout effects on the consumer are included.
"""

import _bootstrap  # noqa: F401
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from vnlb_tpu.config import default_config
from vnlb_tpu.ops import color, gather
from vnlb_tpu.testing.data import add_noise, synthetic_video


def onehot_kernel(ps, c, pt, nimg):
    """(ps, ps, nimg*pt*c, nimg*c*pt*ps*ps) one-hot: input channel
    (img, f_off, ci) -> output lane img*(c*pt*ps*ps) + ci*(pt*ps*ps)
    + f_off*(ps*ps) + dy*ps + dx (the c-major pt-fused joint order)."""
    d = c * ps * ps
    k = np.zeros((ps, ps, nimg * pt * c, nimg * pt * d), np.float32)
    for img in range(nimg):
        for f in range(pt):
            for ci in range(c):
                cin = img * pt * c + f * c + ci
                for dy in range(ps):
                    for dx in range(ps):
                        cout = (img * pt * d + ci * pt * ps * ps
                                + f * ps * ps + dy * ps + dx)
                        k[dy, dx, cin, cout] = 1.0
    return k


def arena_conv_direct(imgs, ps, pt, bf16=True):
    """imgs: list of (T, C, H, W) -> (T*H'*W', nimg*pt*C*ps*ps) c-major
    pt-fused joint arena via ONE one-hot conv."""
    nimg = len(imgs)
    t, c, h, w = imgs[0].shape
    dty = jnp.bfloat16 if bf16 else jnp.float32
    planes = []
    for im in imgs:
        for f in range(pt):
            planes.append(im if f == 0 else jnp.roll(im, -f, axis=0))
    x = jnp.concatenate(planes, axis=1)                  # (T, nimg*pt*C, H, W)
    x = jnp.transpose(x, (0, 2, 3, 1)).astype(dty)
    k = jnp.asarray(onehot_kernel(ps, c, pt, nimg), dty)
    out = lax.conv_general_dilated(
        x, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=dty)
    hp, wp = h - ps + 1, w - ps + 1
    return out.reshape(t * hp * wp, nimg * pt * c * ps * ps)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=5)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    args = ap.parse_args()

    t, h, w = args.t, args.h, args.w
    cfg = default_config(20.0).stage(1)
    ps, pt, c = cfg.ps, cfg.pt, 3
    d = c * ps * ps
    hp, wp = h - ps + 1, w - ps + 1
    n = t * hp * wp

    clean = synthetic_video(t, h, w, seed=0)
    noisy = color.rgb2yuv(jnp.asarray(add_noise(clean, 20.0, seed=1)))
    basic = color.rgb2yuv(jnp.asarray(add_noise(clean, 10.0, seed=2)))

    rng = np.random.default_rng(0)
    # rows clipped so the pt-fused row never wraps (inds_to_rows semantics)
    rows = jnp.asarray(rng.integers(0, (t - pt + 1) * hp * wp,
                                    size=(180, 256, 60)), jnp.int32)

    def take_all(arena):
        def body(_, r):
            got = jnp.take(arena, r.reshape(-1), axis=0)
            return None, jnp.sum(got.astype(jnp.float32))
        _, s = lax.scan(body, None, rows)
        return jnp.sum(s)

    @jax.jit
    def prod(nz, bs):
        def build(img):
            cols = gather.im2col_conv(img, ps, bf16=True)
            cols = cols.reshape(n, d)
            return gather.cols_fuse_pt(cols, pt, hp * wp, c=c)
        arena = jnp.concatenate([build(nz), build(bs)], axis=1)
        return take_all(arena), jnp.sum(arena.astype(jnp.float32)[::1009])

    @jax.jit
    def conv1(nz, bs):
        arena = arena_conv_direct([nz, bs], ps, pt)
        return take_all(arena), jnp.sum(arena.astype(jnp.float32)[::1009])

    @jax.jit
    def conv2(nz, bs):
        a = arena_conv_direct([nz], ps, pt)
        b = arena_conv_direct([bs], ps, pt)
        arena = jnp.concatenate([a, b], axis=1)
        return take_all(arena), jnp.sum(arena.astype(jnp.float32)[::1009])

    outs = {}
    for name, fn in [("prod", prod), ("conv1", conv1), ("conv2", conv2)]:
        r = fn(noisy, basic)
        outs[name] = (float(r[0]), float(r[1]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            r = fn(noisy, basic)
            _ = float(r[0]) + float(r[1])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:6s}: {best:7.4f} s   take+arena sums "
              f"{outs[name][0]:.1f} {outs[name][1]:.1f}", flush=True)

    # bitwise identity of the take results across variants
    ref = outs["prod"]
    for nm, v in outs.items():
        ok = (v[0] == ref[0]) and (v[1] == ref[1])
        print(f"  {nm}: {'BITWISE EQUAL' if ok else 'MISMATCH ' + str(v)}")


if __name__ == "__main__":
    main()
