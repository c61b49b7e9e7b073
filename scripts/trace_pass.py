#!/usr/bin/env python
"""Capture a jax.profiler trace of ONE denoising pass and print the top HLO
ops by self time (parsed from the perfetto trace the profiler emits), so
optimization targets are op-level facts instead of prefix-marginal guesses.

Usage: python scripts/trace_pass.py [--step 1] [--h 480] [--w 854] ...
"""

import _bootstrap  # noqa: F401
import argparse
import glob
import gzip
import json
import os
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.pipeline import proc_nl
from vnlb_tpu.testing.data import add_noise, synthetic_video


def run(step, t, h, w, sigma, step_s, preset, outdir):
    clean = synthetic_video(t, h, w, seed=0)
    noisy = jnp.asarray(add_noise(clean, sigma, seed=1))
    cfg = default_config(sigma, preset=preset, step_s=step_s,
                         border_mode="mask").stage(step)
    zf = jnp.zeros((t, 2, h, w), jnp.float32)
    basic = noisy if step else None

    # warm (compile)
    out = proc_nl(noisy, basic, None, zf, zf, cfg)
    _ = float(jnp.sum(out))

    with jax.profiler.trace(outdir, create_perfetto_trace=True):
        t0 = time.perf_counter()
        out = proc_nl(noisy, basic, None, zf, zf, cfg)
        _ = float(jnp.sum(out))
        wall = time.perf_counter() - t0
    print(f"[trace] step {step}: {wall:.3f}s wall")
    return wall


def parse(outdir, top=40):
    files = sorted(glob.glob(os.path.join(outdir, "**", "*.json.gz"),
                             recursive=True), key=os.path.getmtime)
    if not files:
        print("[trace] no perfetto trace found under", outdir)
        return
    with gzip.open(files[-1], "rt") as f:
        data = json.load(f)
    events = data["traceEvents"] if isinstance(data, dict) else data
    # device-track complete events: aggregate duration by op name
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    agg = defaultdict(float)
    cnt = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0) / 1e6  # us -> s
        agg[name] += dur
        cnt[name] += 1
        total += dur
    print(f"[trace] device total {total:.3f}s across {len(agg)} op names")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur:8.4f}s  x{cnt[name]:<6d} {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", type=int, default=1)
    ap.add_argument("--t", type=int, default=5)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--step_s", type=int, default=6)
    ap.add_argument("--preset", default="iphone")
    ap.add_argument("--outdir", default="/tmp/vnlb_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    run(args.step, args.t, args.h, args.w, args.sigma, args.step_s,
        args.preset, args.outdir)
    parse(args.outdir, args.top)


if __name__ == "__main__":
    main()
