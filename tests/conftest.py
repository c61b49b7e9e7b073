"""Test harness config: run everything on a virtual 8-device CPU mesh.

SURVEY.md §4: sharding tests compare 1-chip vs n-chip execution on CPU
meshes via --xla_force_host_platform_device_count; no TPU needed in CI.

Note: this environment ships an 'axon' TPU plugin that re-prepends itself to
JAX_PLATFORMS at import time, so the env var alone is not enough — we must
also call jax.config.update after importing jax.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
# The persistent compilation cache is DISABLED for the CPU suite: this
# host's XLA:CPU AOT serialize/deserialize is unreliable (cpu_aot_loader
# logs a machine-feature mismatch and warns of SIGILL; observed segfaults
# in BOTH get_executable_and_time and put_executable_and_time on the
# 8-device sharded executables).  The TPU-side cache (scripts/_bootstrap,
# bench.py, vnlb_tpu/__init__) is unaffected — TPU executables serialize
# fine and that cache is what saves the multi-minute Mosaic compiles.
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)
os.environ["VNLB_TPU_NO_CACHE"] = "1"     # vnlb_tpu/__init__ honors this

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Release compiled executables after each test module.

    The XLA:CPU backend on this host segfaults compiling the 8-device
    shard_map module late in a long suite run (same test passes solo, and
    passes in-suite once earlier modules' executables are released) —
    hundreds of live compiled modules appear to poison a later large
    compile.  Cross-module jit reuse is minimal (modules compile distinct
    shapes), so this costs little.
    """
    yield
    jax.clear_caches()
