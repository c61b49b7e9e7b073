#!/usr/bin/env python
"""Quickstart (parity: reference scripts/example.py): denoise a clip and
report PSNRs."""

import _bootstrap  # noqa: F401
import argparse

import numpy as np

from vnlb_tpu import denoise
from vnlb_tpu.testing.data import load_dataset
from vnlb_tpu.utils.metrics import compute_psnr, compute_ssim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="davis_64x64")
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--preset", default="iphone")
    ap.add_argument("--save", default="")
    args = ap.parse_args()

    data = load_dataset(args.dataset, sigma=args.sigma)
    clean, noisy = data["clean"], data["noisy"]

    deno, basic, dtime = denoise(noisy, args.sigma, preset=args.preset,
                                 verbose=True)
    deno, basic = np.asarray(deno), np.asarray(basic)

    print(f"time: {dtime:.2f}s ({clean.shape[0] / dtime:.2f} fps)")
    print(f"psnr  noisy: {compute_psnr(noisy, clean):.3f} dB")
    print(f"psnr  basic: {compute_psnr(basic, clean):.3f} dB")
    print(f"psnr   deno: {compute_psnr(deno, clean):.3f} dB")
    print(f"ssim   deno: {compute_ssim(deno, clean):.4f}")

    if args.save:
        from vnlb_tpu.utils.video_io import save_burst

        save_burst(deno, args.save, "deno")
        save_burst(basic, args.save, "basic")
        print(f"saved to {args.save}")


if __name__ == "__main__":
    main()
