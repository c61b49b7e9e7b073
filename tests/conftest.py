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
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vnlb_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
