"""API-surface tests: denoise_mod variant pipeline, proc_nn/proc_nl_cache
interop readers, presets."""

import numpy as np
import pytest

from vnlb_tpu import default_config, denoise, denoise_mod, proc_nl_cache, proc_nn
from vnlb_tpu.testing.data import add_noise, synthetic_video
from vnlb_tpu.utils.metrics import compute_psnr


def test_denoise_mod_runs_and_denoises():
    clean = synthetic_video(3, 40, 40, seed=7)
    sigma = 20.0
    noisy = add_noise(clean, sigma, seed=8)
    deno, basic, dtime = denoise_mod(noisy, sigma)
    deno = np.asarray(deno)
    assert deno.shape == noisy.shape
    assert compute_psnr(deno, clean) > compute_psnr(noisy, clean) + 2.0
    assert dtime > 0


@pytest.mark.parametrize("preset", ["default", "sss", "sss_v2", "iphone"])
def test_presets_build(preset):
    cfg = default_config(20.0, preset=preset)
    assert cfg.stage(0).step == 0 and cfg.stage(1).step == 1
    if preset == "iphone":
        assert cfg.stage(0).stype == "needle"
        assert cfg.stage(0).pt == 1 and cfg.stage(1).pt == 2
    if preset == "default":
        assert cfg.stage(0).w_s == 27 and cfg.stage(0).nwt_f == 6


def test_per_stage_overrides():
    cfg = default_config(20.0, npatches=[10, 5], bsize=64)
    assert cfg.stage(0).npatches == 10 and cfg.stage(1).npatches == 5
    assert cfg.stage(0).bsize == 64 and cfg.stage(1).bsize == 64


def test_nn_interop_cache_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("VNLB_TPU_CACHE", str(tmp_path))
    from vnlb_tpu.utils.video_io import save_result_sequence

    seq = synthetic_video(2, 32, 32, seed=9)
    save_result_sequence(seq, "udvd", "set8", "clipA", 20)
    out = proc_nn("udvd", "set8", "clipA", 20)
    np.testing.assert_allclose(out, seq, atol=1e-5)
    assert proc_nn("pacnet", "set8", "clipA", 20) is None
    assert proc_nl_cache("set8", "clipA", 20) is None

    save_result_sequence(seq, "vnlb", "set8", "clipA", 20)
    np.testing.assert_allclose(proc_nl_cache("set8", "clipA", 20), seq,
                               atol=1e-5)

    with pytest.raises(ValueError):
        proc_nn("nope", "set8", "clipA", 20)


def test_flow_io_roundtrip(tmp_path):
    from vnlb_tpu.utils.flow_io import (expand_flows, flow_to_image, read_flo,
                                        write_flo)

    rng = np.random.default_rng(0)
    flow = rng.normal(0, 3, (2, 12, 16)).astype(np.float32)
    p = tmp_path / "t.flo"
    write_flo(p, flow)
    back = read_flo(p)
    np.testing.assert_allclose(back, flow, atol=1e-6)

    f = rng.normal(0, 1, (3, 2, 8, 8)).astype(np.float32)
    b = rng.normal(0, 1, (3, 2, 8, 8)).astype(np.float32)
    fe, be = expand_flows(f, b)
    assert fe.shape[0] == 4 and be.shape[0] == 4
    np.testing.assert_array_equal(fe[-1], f[-1])
    np.testing.assert_array_equal(be[0], b[0])

    img = flow_to_image(flow)
    assert img.shape == (12, 16, 3) and img.dtype == np.uint8
