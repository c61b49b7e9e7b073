"""Multi-chip sharding tests on a virtual 8-device CPU mesh
(SURVEY.md §4d: 1-chip vs n-chip parity)."""

import jax
import numpy as np
import pytest

from vnlb_tpu.config import default_config
from vnlb_tpu.parallel.tiled import denoise_sharded, make_mesh, proc_nl_sharded
from vnlb_tpu.pipeline import proc_nl
from vnlb_tpu.testing.data import add_noise, synthetic_video


@pytest.fixture(scope="module")
def clip():
    clean = synthetic_video(2, 32, 32, seed=2)
    noisy = add_noise(clean, 20.0, seed=3)
    zf = np.zeros((2, 2, 32, 32), np.float32)
    return noisy, zf


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("ndev", [2, 8])
def test_sharded_matches_single_device(clip, ndev):
    noisy, zf = clip
    cfg = default_config(20.0, preset="iphone").stage(0).replace(bsize=8 * ndev)
    mesh = make_mesh(ndev)
    got = np.asarray(proc_nl_sharded(noisy, None, None, zf, zf, cfg, mesh))
    want = np.asarray(proc_nl(noisy, None, None, zf, zf, cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_denoise_sharded_two_pass(clip):
    noisy, zf = clip
    cfg = default_config(20.0, preset="iphone", bsize=[16, 16])
    mesh = make_mesh(8)
    deno, basic = denoise_sharded(noisy, 20.0, mesh=mesh, cfg=cfg)
    assert np.asarray(deno).shape == noisy.shape
    assert np.all(np.isfinite(np.asarray(deno)))


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, ".")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[0].shape
    ge.dryrun_multichip(8)
