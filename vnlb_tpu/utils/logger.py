"""Logging helpers (parity: reference lib/vnlb/utils/logger.py:4-19).

``vprint`` is runtime-switchable (the reference hard-disables it at module
load); ``Logger`` tees stdout to a file for sweep scripts.
"""

from __future__ import annotations

import os
import sys

VERBOSE = bool(int(os.environ.get("VNLB_TPU_VERBOSE", "0")))


def vprint(*args, **kwargs):
    if VERBOSE:
        print(*args, **kwargs)


class Logger:
    """Tee stdout to a log file: ``sys.stdout = Logger(path)``."""

    def __init__(self, fname: str):
        self.terminal = sys.stdout
        self.log = open(fname, "a")

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)

    def flush(self):
        self.terminal.flush()
        self.log.flush()

    def close(self):
        self.log.close()
