#!/usr/bin/env python
"""Attribute traced device op times to Python source lines.

Runs ONE pass under jax.profiler (like trace_pass.py), dumps the optimized
HLO of the pass jit, maps each traced op name to its HLO metadata op_name /
source line, and prints time aggregated by source location — the precise
"which line of vnlb_tpu burns the wall" view.
"""

import _bootstrap  # noqa: F401
import argparse
import glob
import gzip
import json
import os
import re
import time
from collections import defaultdict

import jax
import jax.numpy as jnp

from vnlb_tpu.config import default_config
from vnlb_tpu.pipeline import plan_sites, _proc_nl_jit
from vnlb_tpu.ops import color  # noqa: F401
from vnlb_tpu.testing.data import add_noise, synthetic_video


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--step", type=int, default=1)
    ap.add_argument("--t", type=int, default=5)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--step_s", type=int, default=6)
    ap.add_argument("--preset", default="iphone")
    ap.add_argument("--outdir", default="/tmp/vnlb_trace_attr")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)

    t, h, w = args.t, args.h, args.w
    clean = synthetic_video(t, h, w, seed=0)
    noisy = jnp.asarray(add_noise(clean, args.sigma, seed=1))
    shape = (t, 3, h, w)
    cfg = default_config(args.sigma, preset=args.preset, step_s=args.step_s,
                         border_mode="mask").stage(args.step)
    zf = jnp.zeros((t, 2, h, w), jnp.float32)
    basic = noisy

    sb, vb, n_dense = plan_sites(shape, cfg, True)
    end_t = shape[0] - cfg.pt + 1
    qrow0 = tuple((f % cfg.step_s) if f < end_t - 1 else 0
                  for f in range(end_t)) if n_dense else None
    jargs = (noisy, basic, noisy, zf, zf, jnp.asarray(sb), jnp.asarray(vb))
    kw = dict(cfg=cfg, shape=shape, n_dense_batches=n_dense, qrow0=qrow0)

    lowered = _proc_nl_jit.lower(*jargs, **kw)
    hlo = lowered.compile().as_text()

    out = _proc_nl_jit(*jargs, **kw)
    _ = float(jnp.sum(out))
    with jax.profiler.trace(args.outdir, create_perfetto_trace=True):
        t0 = time.perf_counter()
        out = _proc_nl_jit(*jargs, **kw)
        _ = float(jnp.sum(out))
        wall = time.perf_counter() - t0
    print(f"[trace] step {args.step}: {wall:.3f}s wall")

    # --- map HLO op name -> metadata op_name (jax source scopes) ----------
    meta = {}
    pat = re.compile(r"%?([\w.\-]+) = .*metadata=\{([^}]*)\}")
    op_pat = re.compile(r'op_name="([^"]*)"')
    src_pat = re.compile(r'source_file="([^"]*)".*source_line=(\d+)')
    for line in hlo.splitlines():
        m = pat.search(line)
        if not m:
            continue
        name, md = m.group(1), m.group(2)
        om = op_pat.search(md)
        sm = src_pat.search(md)
        scope = om.group(1) if om else ""
        src = f"{sm.group(1).split('/')[-1]}:{sm.group(2)}" if sm else ""
        meta[name] = (scope, src)

    # --- parse trace, self-times ------------------------------------------
    fs = sorted(glob.glob(os.path.join(args.outdir, "**", "*.json.gz"),
                          recursive=True), key=os.path.getmtime)
    with gzip.open(fs[-1], "rt") as f:
        data = json.load(f)
    ev = data["traceEvents"] if isinstance(data, dict) else data
    tid_names, pid_names = {}, {}
    for e in ev:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pid_names[e["pid"]] = e["args"].get("name", "")
            if e.get("name") == "thread_name":
                tid_names[(e["pid"], e["tid"])] = e["args"].get("name", "")
    ops = [e for e in ev if e.get("ph") == "X"
           and tid_names.get((e["pid"], e.get("tid"))) == "XLA Ops"
           and "TPU" in pid_names.get(e["pid"], "")]
    ops.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
    stack, finished = [], []
    for e in ops:
        ts, dur = e["ts"], e.get("dur", 0)
        while stack and ts >= stack[-1]["end"]:
            finished.append(stack.pop())
        if stack:
            stack[-1]["self"] -= dur
        stack.append({"name": e.get("name", "?"), "end": ts + dur,
                      "self": dur})
    finished.extend(stack)

    agg = defaultdict(lambda: [0.0, 0])
    unattr = defaultdict(lambda: [0.0, 0])
    for d in finished:
        nm = d["name"]
        key = meta.get(nm)
        if key is None:
            unattr[re.sub(r"[.\d]+$", "", nm)][0] += d["self"] / 1e6
            unattr[re.sub(r"[.\d]+$", "", nm)][1] += 1
            continue
        scope, src = key
        # shorten the scope to its most informative tail segments
        short = "/".join(scope.split("/")[-2:])[-90:]
        agg[(short, src)][0] += d["self"] / 1e6
        agg[(short, src)][1] += 1
    tot = sum(v[0] for v in agg.values()) + sum(v[0] for v in unattr.values())
    print(f"[attr] total {tot:.3f}s; attributed "
          f"{sum(v[0] for v in agg.values()):.3f}s")
    for (scope, src), (dt, n) in sorted(agg.items(),
                                        key=lambda kv: -kv[1][0])[:args.top]:
        print(f"  {dt:8.4f}s x{n:<6d} {src:28s} {scope}")
    print("[attr] unattributed:")
    for nm, (dt, n) in sorted(unattr.items(), key=lambda kv: -kv[1][0])[:12]:
        print(f"  {dt:8.4f}s x{n:<6d} {nm}")


if __name__ == "__main__":
    main()
