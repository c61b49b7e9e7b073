#!/usr/bin/env python
"""Denoise a single video sequence (parity: reference
scripts/process_video_sequence.py, minus its bit-rot — SURVEY.md §2 notes it
imports the stale ``pyvnlb`` name).

Reads frames from a directory (or a registered dataset), denoises at the
given sigma, saves outputs + metrics into the result cache.
"""

import _bootstrap  # noqa: F401
import argparse
import json

import numpy as np

from vnlb_tpu import denoise
from vnlb_tpu.testing.data import add_noise, load_dataset
from vnlb_tpu.utils.metrics import compute_psnr
from vnlb_tpu.utils.video_io import read_video_sequence, save_result_sequence


def run_sequence(name_or_path, sigma, preset="iphone", nframes=-1,
                 vid_set="custom", seed=123):
    try:
        clean = read_video_sequence(name_or_path, nframes)
        vid_name = str(name_or_path).rstrip("/").split("/")[-1]
    except (FileNotFoundError, OSError):
        data = load_dataset(str(name_or_path), sigma=sigma)
        clean = data["clean"]
        vid_name = str(name_or_path)
    if nframes > 0:
        clean = clean[:nframes]
    noisy = add_noise(clean, sigma, seed=seed)

    deno, basic, dtime = denoise(noisy, sigma, preset=preset)
    deno, basic = np.asarray(deno), np.asarray(basic)

    res = {
        "video": vid_name, "sigma": sigma, "time_s": dtime,
        "fps": clean.shape[0] / dtime,
        "psnr_noisy": compute_psnr(noisy, clean),
        "psnr_basic": compute_psnr(basic, clean),
        "psnr_deno": compute_psnr(deno, clean),
    }
    out_dir = save_result_sequence(deno, "vnlb", vid_set, vid_name, sigma)
    (out_dir / "metrics.json").write_text(json.dumps(res, indent=2))
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("video", help="frame directory or dataset name")
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--preset", default="iphone")
    ap.add_argument("--nframes", type=int, default=-1)
    ap.add_argument("--vid-set", default="custom")
    args = ap.parse_args()
    res = run_sequence(args.video, args.sigma, args.preset, args.nframes,
                       args.vid_set)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    main()
