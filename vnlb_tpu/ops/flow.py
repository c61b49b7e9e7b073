"""Pyramidal Lucas-Kanade optical flow (jittable, TPU-friendly).

The reference obtained TV-L1 flow from the external SWIG C++ package
(``svnlb.swig.runPyFlow``, reference tests/test_gpu_sim_search.py:125-128)
and only *plumbed* flows through the pipeline.  This module closes that gap
with an in-repo estimator so ``denoise(noisy, sigma, flows=estimate_flows(
noisy))`` is self-contained.

Dense iterative Lucas-Kanade on an average-pooled pyramid: at each level the
flow is upsampled, the moving frame warped (bilinear), and a few Gauss-
Newton steps solve the 2x2 normal equations per pixel over a box window.
Everything is convs + elementwise math — jit/TPU friendly, no data-dependent
shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _avg_pool(x):
    h2, w2 = x.shape[-2] // 2, x.shape[-1] // 2
    v = x[..., :h2 * 2, :w2 * 2]
    v = v.reshape(x.shape[:-2] + (h2, 2, w2, 2))
    return v.mean(axis=(-3, -1))


def _box(x, r):
    """(H, W) box mean of radius r via cumsum (same-size, edge-padded)."""
    k = 2 * r + 1
    xp = jnp.pad(x, r, mode="edge")
    c = jnp.cumsum(xp, axis=0)
    c = jnp.concatenate([c[k - 1:k], c[k:] - c[:-k]], axis=0)
    c2 = jnp.cumsum(c, axis=1)
    c2 = jnp.concatenate([c2[:, k - 1:k], c2[:, k:] - c2[:, :-k]], axis=1)
    return c2 / (k * k)


def _warp(img, u, v):
    """Bilinear warp: sample img at (y + v, x + u)."""
    h, w = img.shape
    yy = jnp.arange(h, dtype=jnp.float32)[:, None] + v
    xx = jnp.arange(w, dtype=jnp.float32)[None, :] + u
    y0 = jnp.clip(jnp.floor(yy), 0, h - 2)
    x0 = jnp.clip(jnp.floor(xx), 0, w - 2)
    fy = jnp.clip(yy - y0, 0.0, 1.0)
    fx = jnp.clip(xx - x0, 0.0, 1.0)
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    g = img[y0, x0] * (1 - fy) * (1 - fx) + img[y0, x0 + 1] * (1 - fy) * fx \
        + img[y0 + 1, x0] * fy * (1 - fx) + img[y0 + 1, x0 + 1] * fy * fx
    return g


def _lk_level(i0, i1, u, v, radius, iters, eps):
    gy, gx = jnp.gradient(i0)
    gxx = _box(gx * gx, radius) + eps
    gyy = _box(gy * gy, radius) + eps
    gxy = _box(gx * gy, radius)
    det = gxx * gyy - gxy * gxy

    def step(_, uv):
        u, v = uv
        it = _warp(i1, u, v) - i0
        bx = _box(gx * it, radius)
        by = _box(gy * it, radius)
        du = (gyy * bx - gxy * by) / det
        dv = (gxx * by - gxy * bx) / det
        return (u - du, v - dv)

    u, v = jax.lax.fori_loop(0, iters, step, (u, v))
    return u, v


@functools.partial(jax.jit, static_argnames=("levels", "radius", "iters"))
def lk_flow(frame0: jnp.ndarray, frame1: jnp.ndarray, levels: int = 3,
            radius: int = 4, iters: int = 3) -> jnp.ndarray:
    """Flow from frame0 to frame1; (c, h, w) frames -> (2, h, w) (u, v)."""
    g0 = jnp.mean(jnp.asarray(frame0, jnp.float32), axis=0) / 255.0
    g1 = jnp.mean(jnp.asarray(frame1, jnp.float32), axis=0) / 255.0
    pyr = [(g0, g1)]
    for _ in range(1, levels):
        if min(pyr[-1][0].shape) < 2 * (2 * radius + 1):
            break
        pyr.append((_avg_pool(pyr[-1][0]), _avg_pool(pyr[-1][1])))

    u = jnp.zeros_like(pyr[-1][0])
    v = jnp.zeros_like(pyr[-1][0])
    for lvl in range(len(pyr) - 1, -1, -1):
        a, b = pyr[lvl]
        if u.shape != a.shape:
            u = 2.0 * jax.image.resize(u, a.shape, "bilinear")
            v = 2.0 * jax.image.resize(v, a.shape, "bilinear")
        u, v = _lk_level(a, b, u, v, radius, iters, 1e-4)
    return jnp.stack([u, v])


def estimate_flows(video, levels: int = 3, radius: int = 4, iters: int = 3):
    """(T, c, h, w) video -> (fflow, bflow) each (T, 2, h, w).

    fflow[i] maps frame i -> i+1 (last repeated); bflow[i] maps i -> i-1
    (first repeated) — the layout ``denoise(..., flows=)`` expects.
    """
    video = jnp.asarray(video, jnp.float32)
    t = video.shape[0]
    f = functools.partial(lk_flow, levels=levels, radius=radius, iters=iters)
    fwd = [f(video[i], video[i + 1]) for i in range(t - 1)]
    bwd = [f(video[i + 1], video[i]) for i in range(t - 1)]
    fflow = jnp.stack(fwd + [fwd[-1]]) if fwd else jnp.zeros((1, 2) + video.shape[2:])
    bflow = jnp.stack([bwd[0]] + bwd) if bwd else jnp.zeros((1, 2) + video.shape[2:])
    return fflow, bflow
