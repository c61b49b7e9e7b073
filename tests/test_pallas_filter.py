"""Parity pins for the multi-group VMEM-resident filter kernel
(ops/pallas_filter.py) against the production XLA econ routes
(ops/polyspec.py packed gram / packed matrix) in interpret mode.

The kernel re-implements the SAME math with the same bf16 cast points;
differences are reduction-order fp noise, so the pin is a tight relative
tolerance on patch-scale values (patches are O(10-100) gray levels).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.ops.pallas_filter import (poly_econ_gram_packed_pallas,
                                        poly_econ_packed_pallas)
from vnlb_tpu.ops.polyspec import poly_filter_econ


def _mkdata(g, k, p, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.normal(size=(g, 1, p)).astype(np.float32) * 30
    xc = jnp.asarray(base + rng.normal(size=(g, k, p)).astype(np.float32) * 20)
    xn = jnp.asarray(base + rng.normal(size=(g, k, p)).astype(np.float32) * 20)
    return xc, xn


@pytest.mark.parametrize("stage,g,k,p", [
    (1, 8, 60, 98),      # stage-1 gram route (2K = 120 <= 128)
    (0, 8, 100, 49),     # stage-0 matrix route (2p = 98 <= 128)
])
@pytest.mark.parametrize("bf16", [False, True])
def test_kernel_matches_xla_econ(stage, g, k, p, bf16):
    cfg = default_config(20.0, preset="iphone").stage(stage)
    assert cfg.poly_gram and cfg.poly_pack2      # production defaults
    cfg = cfg.replace(poly_bf16=bf16)
    xc, xn = _mkdata(g, k, p, seed=stage)

    want = np.asarray(poly_filter_econ(xc, xn, cfg))
    if stage == 1:
        got = np.asarray(poly_econ_gram_packed_pallas(xc, xn, cfg,
                                                      interpret=True))
    else:
        got = np.asarray(poly_econ_packed_pallas(xc, xn, cfg,
                                                 interpret=True))

    scale = np.abs(want).mean() + 1e-6
    rms = np.sqrt(np.mean((got - want) ** 2)) / scale
    if bf16:
        # both routes run bf16 chains; they differ only in reduction order
        # of already-bf16-rounded terms (measured f32 parity: ~4e-6)
        assert rms < 5e-2, rms
    else:
        assert rms < 1e-4, rms
        assert np.abs(got - want).max() / scale < 1e-3


def test_kernel_odd_block_tail():
    """g2 not divisible by the block size exercises the pad/slice path."""
    cfg = default_config(20.0, preset="iphone").stage(1)
    xc, xn = _mkdata(6, 60, 98, seed=7)          # g2 = 3, gb = 3
    want = np.asarray(poly_filter_econ(xc, xn, cfg))
    got = np.asarray(poly_econ_gram_packed_pallas(xc, xn, cfg,
                                                  interpret=True))
    scale = np.abs(want).mean() + 1e-6
    assert np.sqrt(np.mean((got - want) ** 2)) / scale < 5e-2
