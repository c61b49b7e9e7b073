"""Dataset loading and synthetic fixtures for tests/benchmarks.

The reference auto-downloads GitHub fixtures (lib/vnlb/testing/file_io.py:
73-129: davis_64x64 / davis / gmobile / ...).  This environment has no
network egress, so the registry resolves, in order:

  1. a local dataset root (VNLB_TPU_DATA env var or ``~/.cache/vnlb_tpu``),
     with the reference's on-disk layout (frame sequences + sigma.txt);
  2. a deterministic synthetic generator producing DAVIS-like moving-texture
     clips, so every test and benchmark runs hermetically.

Golden-file loading (noisy/basic/deno tif + tvl1 .flo, reference
testing/data_loader.py:44-60) is supported when such files exist locally.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

DATASETS = {
    # name: (t, h, w) of the synthetic stand-in clip
    "davis_64x64": (5, 64, 64),
    "davis": (5, 480, 854),
    "gmobile": (5, 480, 854),
    "set8": (5, 480, 854),
    "cup_crop": (5, 256, 256),
}


def data_root() -> Path:
    return Path(os.environ.get("VNLB_TPU_DATA",
                               Path.home() / ".cache/vnlb_tpu/data"))


def synthetic_video(t: int, h: int, w: int, seed: int = 0,
                    motion: float = 1.5) -> np.ndarray:
    """Deterministic moving-texture clip, (t, 3, h, w) float32 in [0, 255].

    Band-limited random texture translated by a constant sub-pixel motion per
    frame plus a moving bright square — enough spatial structure for the
    non-local search to find real matches, and known ground-truth motion for
    flow-aware tests.
    """
    rng = np.random.default_rng(seed)
    pad = int(np.ceil(motion * t)) + 8
    base = rng.uniform(0, 1, (3, h + 2 * pad, w + 2 * pad)).astype(np.float32)
    # band-limit via separable box blurs
    for _ in range(3):
        base = (np.roll(base, 1, -1) + base + np.roll(base, -1, -1)) / 3.0
        base = (np.roll(base, 1, -2) + base + np.roll(base, -2, -2)) / 3.0
    base = (base - base.min()) / (np.ptp(base) + 1e-8)

    frames = []
    for ti in range(t):
        dy = int(round(motion * ti))
        dx = int(round(0.5 * motion * ti))
        crop = base[:, pad + dy:pad + dy + h, pad + dx:pad + dx + w].copy()
        # moving square
        sy = (10 + 3 * ti) % max(h - 12, 1)
        sx = (14 + 2 * ti) % max(w - 12, 1)
        crop[:, sy:sy + 10, sx:sx + 10] = np.array([0.9, 0.7, 0.2])[:, None, None]
        frames.append(crop * 255.0)
    return np.stack(frames).astype(np.float32)


def add_noise(clean: np.ndarray, sigma: float, seed: int = 123) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (clean + rng.normal(0.0, sigma, clean.shape)).astype(np.float32)


def load_dataset(name: str, sigma: float = 20.0, seed: int = 0):
    """Returns dict(clean, noisy, std, fflow, bflow).

    Uses on-disk frames when available under ``data_root()/name``; otherwise
    generates the synthetic stand-in of the registered size.
    """
    root = data_root() / name
    if root.exists():
        from ..utils.video_io import read_video_sequence

        clean = read_video_sequence(root)
        std_file = root / "sigma.txt"
        std = float(std_file.read_text()) if std_file.exists() else sigma
    else:
        if name not in DATASETS:
            raise KeyError(f"unknown dataset [{name}]; "
                           f"registered: {sorted(DATASETS)}")
        t, h, w = DATASETS[name]
        clean = synthetic_video(t, h, w, seed=seed)
        std = sigma

    noisy = add_noise(clean, std, seed=seed + 1)
    t = clean.shape[0]
    fflow = np.zeros((t, 2) + clean.shape[2:], np.float32)
    bflow = np.zeros_like(fflow)
    return dict(clean=clean, noisy=noisy, std=std, fflow=fflow, bflow=bflow)


def load_golden(name: str):
    """Load C++ golden outputs when present on disk (reference
    testing/data_loader.py:44-60 layout); returns None when absent."""
    root = data_root() / name
    f = root / "deno.npy"
    if not f.exists():
        return None
    out = {"deno": np.load(f)}
    b = root / "basic.npy"
    if b.exists():
        out["basic"] = np.load(b)
    return out
