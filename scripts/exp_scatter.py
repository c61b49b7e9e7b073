"""Scatter-add lowering experiments at production shapes (judge r2 item #3).

The aggregation scatter is ~34% of pass wall (scripts/profile_marginal.py,
480p stride 6): ~1.8M rows x 149 lanes into a (T*H'*W', 149) accumulator at
~140-260 ns/row — XLA's TPU scatter serializes row RMWs.  Candidates:

  base      : .at[rows].add(upd) — the production lowering (ops/agg.agg_rows)
  sorted    : argsort(rows) + payload gather + .at[].add(indices_are_sorted)
  sorted0   : like sorted but WITHOUT the sort cost (pre-sorted input) —
              isolates the lowering gain from the sort overhead
  seg+set   : sorted + in-register segmented log-shift reduce + scatter-SET
              of unique run heads (non-heads aimed at a trash row)

Run on TPU: python scripts/exp_scatter.py
"""

import sys
import time

sys.path.insert(0, ".")
import scripts._bootstrap  # noqa: F401

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def fetch(x):
    return float(jnp.sum(x[::4097]))


@partial(jax.jit, static_argnames=("n_acc",))
def base(rows, upd, n_acc):
    acc = jnp.zeros((n_acc, upd.shape[1]), jnp.float32)
    return acc.at[rows].add(upd, mode="drop")


@partial(jax.jit, static_argnames=("n_acc",))
def sorted_add(rows, upd, n_acc):
    order = jnp.argsort(rows)
    rs = rows[order]
    us = jnp.take(upd, order, axis=0)
    acc = jnp.zeros((n_acc, upd.shape[1]), jnp.float32)
    return acc.at[rs].add(us, mode="drop", indices_are_sorted=True)


@partial(jax.jit, static_argnames=("n_acc",))
def sorted0_add(rs, us, n_acc):
    acc = jnp.zeros((n_acc, us.shape[1]), jnp.float32)
    return acc.at[rs].add(us, mode="drop", indices_are_sorted=True)


@partial(jax.jit, static_argnames=("n_acc",))
def seg_set(rows, upd, n_acc):
    n = rows.shape[0]
    order = jnp.argsort(rows)
    rs = rows[order]
    us = jnp.take(upd, order, axis=0)
    # backward-inclusive segmented sum: element i accumulates the suffix of
    # its equal-target run; after log2 steps the run HEAD holds the total
    k = 1
    while k < n:
        same = jnp.concatenate(
            [rs[:-k] == rs[k:], jnp.zeros((min(k, n),), bool)])[:n]
        shifted = jnp.concatenate(
            [us[k:], jnp.zeros((min(k, n), us.shape[1]), us.dtype)])[:n]
        us = us + jnp.where(same[:, None], shifted, 0.0)
        k *= 2
        if k > 512:                      # max plausible run length
            break
    is_head = jnp.concatenate(
        [jnp.ones((1,), bool), rs[1:] != rs[:-1]])
    tgt = jnp.where(is_head, rs, n_acc)  # trash row for non-heads
    acc = jnp.zeros((n_acc + 1, us.shape[1]), jnp.float32)
    return acc.at[tgt].set(us, mode="drop")[:n_acc]


def main():
    rng = np.random.default_rng(0)
    import os
    n_rows = int(os.environ.get("EXP_ROWS", "1800000"))
    n_acc = int(os.environ.get("EXP_ACC", "2000000"))
    lanes = int(os.environ.get("EXP_LANES", "149"))
    print(f"rows={n_rows} acc={n_acc} lanes={lanes}", flush=True)
    # clustered targets like real aggregation (matches cluster near sites)
    base_t = rng.integers(0, n_acc - 600, size=(n_rows // 32,))
    rows = (base_t[:, None] + rng.integers(0, 600, size=(n_rows // 32, 32))
            ).reshape(-1).astype(np.int32)
    upd = rng.normal(size=(rows.shape[0], lanes)).astype(np.float32)
    rows_j = jnp.asarray(rows)
    upd_j = jnp.asarray(upd)
    rs0 = jnp.sort(rows_j)
    us0 = jnp.take(upd_j, jnp.argsort(rows_j), axis=0)
    us0 = jax.block_until_ready(us0)

    for name, fn, args in [
        ("base", base, (rows_j, upd_j)),
        ("sorted", sorted_add, (rows_j, upd_j)),
        ("sorted0", sorted0_add, (rs0, us0)),
        ("seg+set", seg_set, (rows_j, upd_j)),
    ]:
        try:
            t0 = time.time()
            out = fn(*args, n_acc=n_acc)
            s = fetch(out)
            compile_t = time.time() - t0
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                fetch(fn(*args, n_acc=n_acc))
                best = min(best, time.time() - t0)
            print(f"{name:8s}: {best:6.3f}s/call (first {compile_t:.1f}s) "
                  f"sum={s:.3e} -> {best / n_rows * 1e9:.0f} ns/row",
                  flush=True)
        except Exception as e:
            print(f"{name:8s}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
