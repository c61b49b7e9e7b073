#!/usr/bin/env python
"""Analyze where pass 2 helps over pass 1 (parity: reference
scripts/deno_v_basic.py): per-region PSNR deltas between basic and final,
split by edge strength (sobel magnitude)."""

import _bootstrap  # noqa: F401
import argparse

import numpy as np

from vnlb_tpu import denoise
from vnlb_tpu.testing.data import load_dataset
from vnlb_tpu.utils.metrics import compute_psnr


def sobel_mag(img):
    """(c, h, w) -> (h, w) edge magnitude (reference utils/sobel.py:16-34)."""
    g = img.mean(axis=0)
    kx = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], np.float32)
    ky = kx.T
    pad = np.pad(g, 1, mode="edge")
    gx = sum(kx[i, j] * pad[i:i + g.shape[0], j:j + g.shape[1]]
             for i in range(3) for j in range(3))
    gy = sum(ky[i, j] * pad[i:i + g.shape[0], j:j + g.shape[1]]
             for i in range(3) for j in range(3))
    return np.sqrt(gx ** 2 + gy ** 2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="davis_64x64")
    ap.add_argument("--sigma", type=float, default=20.0)
    args = ap.parse_args()

    data = load_dataset(args.dataset, sigma=args.sigma)
    clean, noisy = data["clean"], data["noisy"]
    deno, basic, _ = denoise(noisy, args.sigma)
    deno, basic = np.asarray(deno), np.asarray(basic)

    print(f"basic: {compute_psnr(basic, clean):.3f} dB   "
          f"deno: {compute_psnr(deno, clean):.3f} dB")

    for ti in range(clean.shape[0]):
        mag = sobel_mag(clean[ti])
        edges = mag > np.percentile(mag, 80)
        for name, mask in [("edge", edges), ("flat", ~edges)]:
            eb = ((basic[ti, :, mask] - clean[ti, :, mask]) ** 2).mean()
            ed = ((deno[ti, :, mask] - clean[ti, :, mask]) ** 2).mean()
            pb = -10 * np.log10(eb / 255 ** 2)
            pd = -10 * np.log10(ed / 255 ** 2)
            print(f"frame {ti} {name}: basic {pb:.2f}  deno {pd:.2f}  "
                  f"delta {pd - pb:+.3f} dB")


if __name__ == "__main__":
    main()
