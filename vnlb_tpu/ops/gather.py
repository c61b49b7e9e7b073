"""Patch-group gather (reference: external ``vpss.fill_patches``, called at
lib/vnlb/search/search.py:91-98; contract in SURVEY.md §2.2 N2).

Given top-K flat indices, gather the (pt, c, ps, ps) patch starting at each
decoded (t, y, x) corner.  Invalid indices (-1) gather from a clamped corner
and are expected to be masked downstream (the pipeline's validity mask), which
avoids data-dependent branching under jit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("pt", "ps"))
def fill_patches(video: jnp.ndarray, inds: jnp.ndarray, pt: int, ps: int
                 ) -> jnp.ndarray:
    """(T,C,H,W) video + (B,K) flat inds -> (B,K,pt,C,ps,ps) patches."""
    t_len, c, h, w = video.shape
    chw = c * h * w
    hw = h * w
    safe = jnp.maximum(inds, 0)
    f = jnp.clip(safe // chw, 0, t_len - pt)
    y = jnp.clip((safe % hw) // w, 0, h - ps)
    x = jnp.clip(safe % w, 0, w - ps)

    def one(fi, yi, xi):
        return lax.dynamic_slice(video, (fi, 0, yi, xi), (pt, c, ps, ps))

    return jax.vmap(jax.vmap(one))(f, y, x)


# ---------------------------------------------------------------------------
# im2col ("patch-column") fast path
#
# TPU gathers of tiny (ps-wide) slices are slow; instead the video is
# unfolded ONCE per pass into (T, H', W', C*ps*ps) patch columns, and patch
# groups become contiguous row gathers (aggregation scatters rows back into
# the same space — see ops/agg.py).  H' = H-ps+1, W' = W-ps+1: exactly the
# valid patch-corner grid the search produces.
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("ps",))
def im2col(video: jnp.ndarray, ps: int) -> jnp.ndarray:
    """(T, C, H, W) -> (T, H', W', C*ps*ps) patch columns."""
    t, c, h, w = video.shape
    hp, wp = h - ps + 1, w - ps + 1
    cols = [video[:, :, dy:dy + hp, dx:dx + wp]
            for dy in range(ps) for dx in range(ps)]
    cols = jnp.stack(cols, axis=-1)                     # (T, C, H', W', ps*ps)
    return jnp.transpose(cols, (0, 2, 3, 1, 4)).reshape(t, hp, wp, c * ps * ps)


def cols_rows(cols: jnp.ndarray):
    """Flatten (T, H', W', D) -> ((T*H'*W', D), (H', W'))."""
    t, hp, wp, d = cols.shape
    return cols.reshape(t * hp * wp, d), (hp, wp)


def inds_to_rows(inds: jnp.ndarray, shape, ps: int, pt: int) -> jnp.ndarray:
    """Decode flat image indices -> (B, K, pt) row indices into the
    flattened column space (frame f+dt, same corner)."""
    t_len, c, h, w = shape
    hp, wp = h - ps + 1, w - ps + 1
    chw = c * h * w
    hw = h * w
    safe = jnp.maximum(inds, 0)
    f = jnp.clip(safe // chw, 0, t_len - pt)
    y = jnp.clip((safe % hw) // w, 0, hp - 1)
    x = jnp.clip(safe % w, 0, wp - 1)
    base = f * (hp * wp) + y * wp + x                   # (B, K)
    dt = jnp.arange(pt, dtype=inds.dtype) * (hp * wp)
    return base[:, :, None] + dt[None, None, :]         # (B, K, pt)


@functools.partial(jax.jit, static_argnames=("pt", "ps", "c", "use_pallas"))
def fill_patches_cols(cols_flat: jnp.ndarray, rows: jnp.ndarray,
                      pt: int, ps: int, c: int,
                      use_pallas: bool = False) -> jnp.ndarray:
    """Row-gather patches: (N, C*ps*ps) cols + (B, K, pt) rows ->
    (B, K, pt, C, ps, ps) float32 (cols may be stored bf16 to halve
    gather traffic — upcast after the gather).

    ``use_pallas`` routes through the async-DMA gather kernel
    (ops/pallas_gather.py) — XLA's TPU gather is ~serial per row."""
    b, k, _ = rows.shape
    d = c * ps * ps
    if use_pallas:
        from .pallas_gather import gather_rows

        # cols must be lane-padded (width % 128 == 0) by the caller
        out = gather_rows(cols_flat, rows.reshape(-1))[:, :d]
    else:
        out = jnp.take(cols_flat, rows.reshape(-1), axis=0)[:, :d]
    return out.reshape(b, k, pt, c, ps, ps).astype(jnp.float32)


def cols_fuse_pt(cols_flat: jnp.ndarray, pt: int, hpwp: int) -> jnp.ndarray:
    """(N, D) -> (N, pt*D): row r additionally carries rows r + j*hpwp
    (the SAME patch corner in the next pt-1 frames), so a pt-frame patch
    becomes ONE row gather instead of pt — XLA's TPU take is ~per-row
    cost, so halving the row count (pt=2) halves the gather bill for the
    price of a pt x larger (dense-built) arena.  Rows whose shifted source
    runs past the last frame are never addressed (inds_to_rows clips the
    base frame to T-pt)."""
    if pt == 1:
        return cols_flat
    parts = [cols_flat]
    for j in range(1, pt):
        parts.append(jnp.roll(cols_flat, -j * hpwp, axis=0))
    return jnp.concatenate(parts, axis=1)


@functools.partial(jax.jit, static_argnames=("pt", "ps", "c"))
def fill_patches_cols_fused(cols_pt: jnp.ndarray, rows_base: jnp.ndarray,
                            pt: int, ps: int, c: int) -> jnp.ndarray:
    """fill_patches_cols on a pt-fused arena: rows_base (B, K) plane-0 row
    indices -> (B, K, pt, C, ps, ps) float32."""
    b, k = rows_base.shape
    d = c * ps * ps
    out = jnp.take(cols_pt, rows_base.reshape(-1), axis=0)[:, :pt * d]
    return out.reshape(b, k, pt, c, ps, ps).astype(jnp.float32)


@functools.partial(jax.jit, static_argnames=("pt", "ps", "c"))
def fill_patches_cols_joint(cols_join: jnp.ndarray, rows_base: jnp.ndarray,
                            pt: int, ps: int, c: int):
    """One take over a lane-JOINED pair of pt-fused arenas (noisy ++ basic):
    XLA's TPU take is ~per-row cost, so gathering both step-2 arenas from a
    (N, 2*pt*D) concat at the same rows halves the gather bill vs two takes.
    Returns (pnoisy, pbasic), each (B, K, pt, C, ps, ps) float32."""
    b, k = rows_base.shape
    d = c * ps * ps
    out = jnp.take(cols_join, rows_base.reshape(-1), axis=0)

    def part(j):
        block = out[:, j * pt * d:(j + 1) * pt * d]
        return block.reshape(b, k, pt, c, ps, ps).astype(jnp.float32)

    return part(0), part(1)
