"""Wall-clock timing + optional jax profiler hooks.

Parity: reference lib/vnlb/utils/timer.py:9-42 (tic/toc Timer).  Extended with
a ``trace`` context manager that wraps ``jax.profiler`` behind a debug flag —
the reference has no profiler integration (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import os
import time


class Timer:
    def __init__(self):
        self._start = None
        self.elapsed = 0.0

    def tic(self):
        self._start = time.perf_counter()
        return self

    def toc(self) -> float:
        if self._start is None:
            raise RuntimeError("Timer.toc() before tic()")
        self.elapsed = time.perf_counter() - self._start
        return self.elapsed

    def __enter__(self):
        return self.tic()

    def __exit__(self, *exc):
        self.toc()
        return False


@contextlib.contextmanager
def trace(name: str, logdir: str | None = None):
    """Profile a region with jax.profiler when VNLB_TPU_PROFILE is set."""
    logdir = logdir or os.environ.get("VNLB_TPU_PROFILE", "")
    if not logdir:
        yield
        return
    import jax

    with jax.profiler.trace(logdir):
        with jax.profiler.TraceAnnotation(name):
            yield


def sync(tree):
    """Block until every array in a pytree is ready (fence for timing)."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree
