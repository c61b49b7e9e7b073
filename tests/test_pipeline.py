import numpy as np
import pytest

from vnlb_tpu import default_config, denoise
from vnlb_tpu.pipeline import proc_nl
from vnlb_tpu.testing.data import add_noise, synthetic_video
from vnlb_tpu.utils.metrics import compute_psnr


@pytest.fixture(scope="module")
def clip():
    clean = synthetic_video(3, 48, 48, seed=0)
    sigma = 20.0
    noisy = add_noise(clean, sigma, seed=42)
    return clean, noisy, sigma


def test_denoise_improves_psnr(clip):
    clean, noisy, sigma = clip
    deno, basic, dtime = denoise(noisy, sigma, preset="iphone", verbose=False)
    psnr_noisy = compute_psnr(noisy, clean)
    psnr_basic = compute_psnr(np.asarray(basic), clean)
    psnr_deno = compute_psnr(np.asarray(deno), clean)
    assert psnr_basic > psnr_noisy + 3.0, (psnr_noisy, psnr_basic)
    assert psnr_deno > psnr_noisy + 3.0, (psnr_noisy, psnr_deno)
    assert dtime > 0
    assert np.asarray(deno).shape == noisy.shape


def test_denoise_deterministic(clip):
    clean, noisy, sigma = clip
    d1, b1, _ = denoise(noisy, sigma, preset="iphone")
    d2, b2, _ = denoise(noisy, sigma, preset="iphone")
    assert np.array_equal(np.asarray(d1), np.asarray(d2))
    assert np.array_equal(np.asarray(b1), np.asarray(b2))


def test_single_pass_shapes(clip):
    clean, noisy, sigma = clip
    cfg = default_config(sigma, preset="iphone")
    zf = np.zeros((noisy.shape[0], 2) + noisy.shape[2:], np.float32)
    basic = proc_nl(noisy, None, None, zf, zf, cfg.stage(0))
    assert basic.shape == noisy.shape
    assert np.all(np.isfinite(np.asarray(basic)))


def test_flows_kwarg_accepted(clip):
    clean, noisy, sigma = clip
    t, _, h, w = noisy.shape
    fflow = np.zeros((t - 1, 2, h, w), np.float32)  # t-1 flows get expanded
    bflow = np.zeros((t - 1, 2, h, w), np.float32)
    deno, basic, _ = denoise(noisy, sigma, flows=(fflow, bflow))
    assert np.asarray(deno).shape == noisy.shape
