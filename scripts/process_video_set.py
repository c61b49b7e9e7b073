#!/usr/bin/env python
"""Sweep a video set (parity: reference scripts/process_video_set.py, without
its bit-rotted imports — SURVEY.md §2).

Runs the denoiser over every sequence of a set (set8/DAVIS layout: one frame
directory per video under the set root, or the registered synthetic sets),
with per-sequence output caching, skip-on-cache, and retry-on-failure
(SURVEY.md §5 failure handling).  Writes a markdown summary table.
"""

import _bootstrap  # noqa: F401
import argparse
import json
import traceback
import zlib
from pathlib import Path

from vnlb_tpu.testing.data import data_root
from vnlb_tpu.utils.logger import Logger
from vnlb_tpu.utils.video_io import read_result_sequence

from process_video_sequence import run_sequence


def list_videos(vid_set: str):
    root = data_root() / vid_set
    if root.exists():
        return sorted(p.name for p in root.iterdir() if p.is_dir()), root
    # synthetic fallback: a small fixed roster
    return [f"synth_{i:02d}" for i in range(4)], None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vid-set", default="set8")
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--preset", default="iphone")
    ap.add_argument("--nframes", type=int, default=10)
    ap.add_argument("--retries", type=int, default=1)
    ap.add_argument("--log", default="")
    ap.add_argument("--overwrite", action="store_true")
    args = ap.parse_args()

    if args.log:
        import sys

        sys.stdout = Logger(args.log)

    videos, root = list_videos(args.vid_set)
    results = []
    for i, vid in enumerate(videos):
        if not args.overwrite and \
                read_result_sequence("vnlb", args.vid_set, vid, args.sigma) \
                is not None:
            print(f"[{i + 1}/{len(videos)}] {vid}: cached, skipping")
            continue
        src = (root / vid) if root else "davis_64x64"
        for attempt in range(args.retries + 1):
            try:
                # stable across processes (Python's str hash is randomized)
                seed = zlib.crc32(vid.encode()) % 2 ** 31
                res = run_sequence(src, args.sigma, args.preset, args.nframes,
                                   args.vid_set, seed=seed)
                res["video"] = vid
                results.append(res)
                print(f"[{i + 1}/{len(videos)}] {vid}: "
                      f"deno {res['psnr_deno']:.2f} dB  {res['fps']:.2f} fps")
                break
            except Exception:
                print(f"[{i + 1}/{len(videos)}] {vid}: attempt {attempt} "
                      f"failed\n{traceback.format_exc()}")
        else:
            print(f"[{i + 1}/{len(videos)}] {vid}: giving up")

    if results:
        print("\n| video | psnr_noisy | psnr_basic | psnr_deno | fps |")
        print("|---|---|---|---|---|")
        for r in results:
            print(f"| {r['video']} | {r['psnr_noisy']:.2f} | "
                  f"{r['psnr_basic']:.2f} | {r['psnr_deno']:.2f} | "
                  f"{r['fps']:.2f} |")
        out = Path(f"output/{args.vid_set}_s{int(args.sigma)}_summary.json")
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
