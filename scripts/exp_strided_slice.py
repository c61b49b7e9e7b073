#!/usr/bin/env python
"""Does Mosaic compile a static strided LANE slice (x[:, g::step])?

If yes, the smat column selection could skip the MXU (0/1 selection
matmuls stream full K*N cycles); if it errors, the batched-epilogue
matmul stays.  Timing is secondary — existence first.
"""

import _bootstrap  # noqa: F401
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    print(f"devices: {jax.devices()}")

    def kernel(x_ref, o_ref):
        x = x_ref[...]
        xb = x
        for dx in range(1, 7):
            xb = xb + x[:, dx:dx + 896]
        o_ref[...] = jax.lax.slice(xb, (0, 0), (96, 864), (1, 6))

    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(96, 904)).astype(np.float32))
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((96, 144), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        ref = np.asarray(x)
        xb = sum(ref[:, dx:dx + 896] for dx in range(7))
        np.testing.assert_allclose(np.asarray(out), xb[:, 0:864:6], rtol=0)
        print("[strided-slice] SUPPORTED and correct")
    except Exception as e:  # noqa: BLE001
        print(f"[strided-slice] UNSUPPORTED: {type(e).__name__}: "
              f"{str(e)[:300]}")


if __name__ == "__main__":
    main()
