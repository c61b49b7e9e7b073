"""Make the repo root importable when scripts run from anywhere, and turn
on the persistent JAX compilation cache (first compiles of the jitted
two-pass pipeline take minutes; cached re-runs take seconds)."""

import os
import sys
from pathlib import Path

_root = str(Path(__file__).resolve().parent.parent)
if _root not in sys.path:
    sys.path.insert(0, _root)

# CPU-forced runs skip the cache: this host's XLA:CPU AOT executable
# serialize/deserialize is unreliable (machine-feature mismatch; observed
# segfaults — see tests/conftest.py).  TPU executables cache fine, and
# that is where the multi-minute compiles live.
if (os.environ.get("JAX_PLATFORMS", "").strip() == "cpu"
        or os.environ.get("VNLB_FORCE_CPU")):
    os.environ.setdefault("VNLB_TPU_NO_CACHE", "1")
    # The env's TPU plugin re-prepends itself to JAX_PLATFORMS at jax import
    # time, so the env var alone does NOT force CPU — config.update does
    # (same workaround as tests/conftest.py).  Without this, a CPU-forced
    # script still initializes the remote TPU and can stall for minutes
    # when the tunnel is degraded.
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                          "/tmp/vnlb_tpu_jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
