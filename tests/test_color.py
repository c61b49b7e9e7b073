import numpy as np

from vnlb_tpu.ops import color


def test_roundtrip():
    rng = np.random.default_rng(0)
    v = rng.uniform(0, 255, (2, 3, 8, 8)).astype(np.float32)
    yuv = np.asarray(color.rgb2yuv(v))
    rgb = np.asarray(color.yuv2rgb(yuv))
    np.testing.assert_allclose(rgb, v, atol=1e-3)


def test_orthonormal_rows():
    # The forward transform keeps white noise white with the same sigma.
    m = color.RGB2YUV
    gram = m @ m.T
    np.testing.assert_allclose(gram, np.eye(3), atol=1e-6)


def test_exact_cpp_weights():
    # weights from the C++ repo (reference lib/vnlb/utils/color.py:66-71)
    w0, w1, w2 = 1 / np.sqrt(3), 1 / np.sqrt(2), np.sqrt(2) * 2 / np.sqrt(3)
    r, g, b = 10.0, 120.0, 240.0
    img = np.zeros((1, 3, 1, 1), np.float32)
    img[0, :, 0, 0] = [r, g, b]
    yuv = np.asarray(color.rgb2yuv(img))[0, :, 0, 0]
    np.testing.assert_allclose(yuv[0], w0 * (r + g + b), rtol=1e-6)
    np.testing.assert_allclose(yuv[1], w1 * (r - b), rtol=1e-6)
    np.testing.assert_allclose(yuv[2], w2 * (0.25 * r - 0.5 * g + 0.25 * b),
                               rtol=1e-5)
