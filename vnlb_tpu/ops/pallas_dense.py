"""Pallas TPU kernel: fused dense candidate-distance computation.

This is the hot inner stage of the zero-flow search (ops/search_dense.py):
for one temporal offset dt, compute

    D(x, delta) = q2(x) + b2[t+dt](x+delta) - 2 * box_ps( vq(x) . vd(x+delta) )

for every pixel x and every spatial offset delta in a w_s x w_s grid.  The
XLA fallback materializes ~3 full-resolution HBM temporaries per delta
(~100+ GB of traffic per 480p pass); this kernel keeps a row-band of the
frame in VMEM and loops the 225 offsets on the VPU, so HBM sees only the
input band reads and one output write.

TPU/Mosaic constraints shaping the code:
* grid = (F, row_tiles); output block (1, w_s^2, TILE_H, W') in VMEM.
* inputs stay in HBM and are DMA'd per (frame, channel) plane as contiguous
  row bands; every DMA slice length/offset is padded to the (8, 128) tile
  (the caller pads rows to multiples of 8 and columns to multiples of 128 —
  misaligned DMA slices fail to lower).
* both offset loops are statically unrolled (dynamic sublane-offset vector
  loads do not lower); the separable ps x ps box filter is 2 x ps shifted
  register adds.

Equivalence with the XLA path is pinned by tests/test_pallas_dense.py (the
kernel runs in interpret mode on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rup(x, m):
    return -(-x // m) * m


def _kernel(vq_hbm, vd_hbm, q2_hbm, b2_hbm, out_ref, *, ps, w_s, tile_h,
            w, wpad, ptc, in_h, vd_h, b2_h):
    f = pl.program_id(0)
    i = pl.program_id(1)
    r0 = i * tile_h

    def body(vq_s, vd_s, q2_s, b2_s, sems):
        # one 2-D DMA per (frame, channel) plane — contiguous, tile-aligned
        copies = []
        for p in range(ptc):
            copies.append(pltpu.make_async_copy(
                vq_hbm.at[f, p, pl.ds(r0, in_h), :], vq_s.at[p],
                sems.at[p]))
            copies.append(pltpu.make_async_copy(
                vd_hbm.at[f, p, pl.ds(r0, vd_h), :], vd_s.at[p],
                sems.at[ptc + p]))
        copies.append(pltpu.make_async_copy(
            q2_hbm.at[f, pl.ds(r0, tile_h), :], q2_s, sems.at[2 * ptc]))
        copies.append(pltpu.make_async_copy(
            b2_hbm.at[f, pl.ds(r0, b2_h), :], b2_s, sems.at[2 * ptc + 1]))
        for cp in copies:
            cp.start()
        for cp in copies:
            cp.wait()

        n_rows = tile_h + ps - 1
        for a in range(w_s):                                  # sublane shift
            for b in range(w_s):                              # lane shift
                prod = vq_s[0, 0:n_rows, 0:wpad] \
                    * vd_s[0, a:a + n_rows, b:b + wpad]
                for p in range(1, ptc):
                    prod = prod + (vq_s[p, 0:n_rows, 0:wpad]
                                   * vd_s[p, a:a + n_rows, b:b + wpad])
                # separable box: x then y, via shifted register adds
                bx = prod[:, 0:wpad - ps + 1]
                for j in range(1, ps):
                    bx = bx + prod[:, j:j + wpad - ps + 1]
                by = bx[0:tile_h, :]
                for j in range(1, ps):
                    by = by + bx[j:j + tile_h, :]             # (tile_h, .)
                d = (q2_s[:, 0:wpad - ps + 1]
                     + b2_s[a:a + tile_h, b:b + wpad - ps + 1]
                     - 2.0 * by)
                out_ref[0, a * w_s + b, :, :] = d

    pl.run_scoped(
        body,
        vq_s=pltpu.VMEM((ptc, in_h, vq_hbm.shape[3]), jnp.float32),
        vd_s=pltpu.VMEM((ptc, vd_h, vd_hbm.shape[3]), jnp.float32),
        q2_s=pltpu.VMEM((tile_h, q2_hbm.shape[2]), jnp.float32),
        b2_s=pltpu.VMEM((b2_h, b2_hbm.shape[2]), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2 * ptc + 2,)),
    )


@functools.partial(jax.jit, static_argnames=("ps", "w_s", "interpret"))
def dense_distances_dt(vq, vd, q2, b2, ps: int, w_s: int,
                       interpret: bool = False):
    """D for all pixels and all w_s^2 offsets of ONE temporal offset.

    Args (unpadded logical shapes; this wrapper does all tile padding):
      vq: (F, ptc, H, W) query stacks (frames f..f+pt-1 fused into ptc).
      vd: (F, ptc, H, W) candidate stacks (frame f+dt content).
      q2: (F, H', W') patch energies at query positions (H'=H-ps+1).
      b2: (F, H', W') candidate patch energies.
    Returns:
      (F, w_s*w_s, H'8, W') float32 distances, rows padded to a multiple of
      8 (padded rows are garbage; callers only read interior sites).
    """
    f_cnt, ptc, h, w = vq.shape
    half = (w_s - 1) // 2
    wp = w - ps + 1
    hp = h - ps + 1
    tile_h = 8
    hp8 = _rup(hp, tile_h)
    in_h = _rup(tile_h + ps - 1, 8)
    vd_h = _rup(tile_h + ps - 1 + 2 * half, 8)
    b2_h = _rup(tile_h + 2 * half, 8)
    # row padding: last tile reads rows up to (hp8 - tile_h) + max_len
    vq_rows = hp8 - tile_h + in_h
    vd_rows = hp8 - tile_h + vd_h
    b2_rows = hp8 - tile_h + b2_h
    wpad = _rup(w, 128)
    # kernel reads vd cols [b, b+wpad), b2 cols [b, b+wpad-ps+1), b<=2*half
    vd_cols = _rup(wpad + 2 * half, 128)
    q2_cols = _rup(wpad - ps + 1, 128)
    b2_cols = _rup(wpad - ps + 1 + 2 * half, 128)

    vq_p = jnp.pad(vq, ((0, 0), (0, 0), (0, vq_rows - h), (0, wpad - w)))
    vd_p = jnp.pad(vd, ((0, 0), (0, 0), (half, vd_rows - h - half),
                        (half, vd_cols - w - half)))
    q2_p = jnp.pad(q2, ((0, 0), (0, hp8 - hp), (0, q2_cols - wp)))
    b2_p = jnp.pad(b2, ((0, 0), (half, b2_rows - hp - half),
                        (half, b2_cols - wp - half)))

    grid = (f_cnt, hp8 // tile_h)
    kernel = functools.partial(_kernel, ps=ps, w_s=w_s, tile_h=tile_h,
                               w=w, wpad=wpad, ptc=ptc, in_h=in_h,
                               vd_h=vd_h, b2_h=b2_h)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4,
        out_specs=pl.BlockSpec(
            (1, w_s * w_s, tile_h, wpad - ps + 1),
            lambda f, i: (f, 0, i, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((f_cnt, w_s * w_s, hp8, wpad - ps + 1),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(vq_p, vd_p, q2_p, b2_p)
    return out[:, :, :, :wp]
