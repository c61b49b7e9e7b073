"""Make the repo root importable when scripts run from anywhere, and turn
on the persistent JAX compilation cache (first compiles of the jitted
two-pass pipeline take minutes; cached re-runs take seconds)."""

import os
import sys
from pathlib import Path

_root = str(Path(__file__).resolve().parent.parent)
if _root not in sys.path:
    sys.path.insert(0, _root)

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/vnlb_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
