"""RGB <-> opponent-YUV color transform.

The VNLB algorithm operates in the orthonormal "opponent" color basis of the
original C++ implementation.  The exact forward/inverse weights are those of
the reference (lib/vnlb/utils/color.py:52-77 forward, :31-50 inverse); both
directions are expressed here as a single 3x3 matmul over the channel axis so
XLA can fuse them with neighbouring elementwise work.

Forward (rgb -> yuv):
    y = (r + g + b) / sqrt(3)
    u = (r - b) / sqrt(2)
    v = (r - 2g + b) * sqrt(2) / (2 sqrt(3))
The transform is orthonormal, so white noise of std sigma stays white with the
same sigma per channel.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

_S3 = 1.0 / np.sqrt(3.0)
_S2 = 1.0 / np.sqrt(2.0)
_S6 = np.sqrt(2.0) * 2.0 / np.sqrt(3.0)  # == 2/sqrt(6) * 2 = sqrt(2/3)*2

# rows: output channel, cols: input channel
RGB2YUV = np.array(
    [[_S3, _S3, _S3],
     [_S2, 0.0, -_S2],
     [0.25 * _S6, -0.5 * _S6, 0.25 * _S6]], dtype=np.float32)

_SI = np.sqrt(2.0) / np.sqrt(3.0)
YUV2RGB = np.array(
    [[_S3, _S2, 0.5 * _SI],
     [_S3, 0.0, -_SI],
     [_S3, -_S2, 0.5 * _SI]], dtype=np.float32)


def rgb2yuv(video: jnp.ndarray) -> jnp.ndarray:
    """(..., c, h, w) RGB -> opponent YUV."""
    m = jnp.asarray(RGB2YUV, dtype=video.dtype)
    return jnp.einsum("dc,...chw->...dhw", m, video,
                      precision=jax.lax.Precision.HIGHEST)


def yuv2rgb(video: jnp.ndarray) -> jnp.ndarray:
    """(..., c, h, w) opponent YUV -> RGB."""
    m = jnp.asarray(YUV2RGB, dtype=video.dtype)
    return jnp.einsum("dc,...chw->...dhw", m, video,
                      precision=jax.lax.Precision.HIGHEST)
