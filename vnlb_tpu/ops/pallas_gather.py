"""Pallas TPU kernel: latency-hidden dynamic row gather (EXPERIMENTAL).

XLA's gather lowering on TPU issues row copies ~serially (~220 ns/row
measured through the filter phase), making the patch-column gathers the
largest filter-phase cost at 480p.  This kernel keeps the row indices in
SMEM (scalar prefetch) and launches a window of row DMAs asynchronously
before waiting, so per-row HBM latency overlaps.

STATUS: correct in interpret mode (tests/test_pallas_dense.py) but NOT yet
usable compiled — Mosaic requires DMA slices of 1-D HBM buffers to be
1024-element aligned, and 2-D (8,128)-tiled memrefs cannot be row-sliced at
arbitrary (mid-tile) dynamic offsets.  An arbitrary-row gather therefore
needs either 1024-element row padding (7x memory for 147-float rows) or a
Mosaic-level indirect-DMA primitive.  The pipeline keeps jnp.take until
one of those lands; this kernel documents the working DMA structure.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 128  # rows per program (also the DMA in-flight window)


def _make_kernel(d):
    def _kernel(rows_ref, cols_hbm, out_ref, sems):
        i = pl.program_id(0)
        copies = []
        for j in range(_BM):
            r = rows_ref[i * _BM + j]
            cp = pltpu.make_async_copy(
                cols_hbm.at[pl.ds(r * d, d)],
                out_ref.at[j],
                sems.at[j])
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

    return _kernel


_ROWPAD = 1024  # Mosaic 1-D HBM DMA slices must be 1024-element aligned


def _make_kernel_padded(d):
    def _kernel(rows_ref, cols_hbm, out_ref, sems):
        i = pl.program_id(0)
        copies = []
        for j in range(_BM):
            r = rows_ref[i * _BM + j]
            cp = pltpu.make_async_copy(
                cols_hbm.at[pl.ds(r * _ROWPAD, d)],
                out_ref.at[j],
                sems.at[j])
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

    return _kernel


@functools.partial(jax.jit, static_argnames=("d", "interpret"))
def gather_rows_padded(cols_padded: jnp.ndarray, rows: jnp.ndarray,
                       d: int, interpret: bool = False) -> jnp.ndarray:
    """Row gather from a 1024-element-STRIDE arena (round-3 workaround for
    the alignment blocker: pad the ARENA rows, keep the payload width d).

    cols_padded: (N * 1024,) flat arena, row i at [i*1024, i*1024+d);
    rows (M,) int32 -> (M, d).  Every DMA source offset r*1024 is
    1024-aligned, so Mosaic's 1-D slice rule is satisfied; only d elements
    per row move (the pad is never read).  Memory cost: 1024/d x the
    arena — the evaluation in scripts/exp_pallas_gather2.py decides
    whether any call site can afford that.
    """
    m = rows.shape[0]
    mp = -(-m // _BM) * _BM
    rows_p = jnp.pad(rows, (0, mp - m))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // _BM,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_BM, d), lambda i, rows_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_BM,))],
    )
    out = pl.pallas_call(
        _make_kernel_padded(d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, d), cols_padded.dtype),
        interpret=interpret,
    )(rows_p, cols_padded)
    return out[:m]


def _make_kernel_tiled(sub, lanes):
    def _kernel(rows_ref, cols_hbm, out_ref, sems):
        i = pl.program_id(0)
        copies = []
        for j in range(_BM):
            r = rows_ref[i * _BM + j]
            cp = pltpu.make_async_copy(
                cols_hbm.at[r],
                out_ref.at[j],
                sems.at[j])
            cp.start()
            copies.append(cp)
        for cp in copies:
            cp.wait()

    return _kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows_tiled(cols3: jnp.ndarray, rows: jnp.ndarray,
                      interpret: bool = False) -> jnp.ndarray:
    """Row gather from a TILE-SHAPED arena: cols3 is (N, sub, 128) with
    sub = one hardware tile of sublanes (8 for f32, 16 for bf16), so each
    row IS one (sub, 128) tile and ``cols3.at[r]`` is a leading-dim slice
    — tile-aligned by construction, no 1-D alignment rule in play (the
    third attempt at the Mosaic blocker; see module docstring).

    rows (M,) int32 -> (M, sub, 128); the caller reshapes to (M, sub*128)
    and slices its payload width d.  Memory cost: sub*128/d x the arena."""
    m = rows.shape[0]
    n, sub, lanes = cols3.shape
    mp = -(-m // _BM) * _BM
    rows_p = jnp.pad(rows, (0, mp - m))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // _BM,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_BM, sub, lanes),
                               lambda i, rows_ref: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_BM,))],
    )
    out = pl.pallas_call(
        _make_kernel_tiled(sub, lanes),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, sub, lanes), cols3.dtype),
        interpret=interpret,
    )(rows_p, cols3)
    return out[:m]


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(cols: jnp.ndarray, rows: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """cols (N, D) + rows (M,) int32 -> (M, D).

    D must be a multiple of 128; M is padded to 128 internally.
    """
    m = rows.shape[0]
    n, d = cols.shape
    assert d % 128 == 0, f"lane-pad cols first (D={d})"
    mp = -(-m // _BM) * _BM
    rows_p = jnp.pad(rows, (0, mp - m))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(mp // _BM,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((_BM, d), lambda i, rows_ref: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA((_BM,))],
    )
    out = pl.pallas_call(
        _make_kernel(d),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, d), cols.dtype),
        interpret=interpret,
    )(rows_p, cols.reshape(-1))
    return out[:m]
