#!/usr/bin/env python
"""Spectral early-out feasibility measurement (round-4 judge item #2a).

The filter phase floors at ~210-300 ns/GROUP of batched-matmul sequencing
(scripts/bench_mxu_floor.py), so the remaining lever is group COUNT.
Candidate cut: groups whose spectral upper bound lub = min(trace, max row
sum) satisfies lub <= tau have gate(lam) = 0 for every eigenvalue ->
transfer = 0 -> filtered output = re-added center, a closed form with no
matmul chain.  Before building the partition machinery, this measures on
the bench-scale clip at sigma in {10, 20, 40}:

  * the fraction of groups with BOUND <= tau (harvestable by the cheap
    bound) per stage,
  * the fraction with EXACT lam_max <= tau (the ceiling any spectral
    early-out could reach; eigh on a subsample),
  * the bound's looseness (bound / lam_max quantiles).

VERDICT (v5e-1 TPU search + host eigh, 2026-08-20, 480x854 five-frame
clip, stride 6, 4096-group eigh subsample):

    sigma stage  bound<=tau  lamax<=tau med bound/lam p1 lam/tau med lam/tau
       10     0      0.0000      0.0000          1.85       4.91       17.78
       10     1      0.0000      0.0000          1.61      34.64      120.03
       20     0      0.0000      0.0001          1.95       1.53        4.81
       20     1      0.0000      0.0000          1.62       6.25       26.34
       40     0      0.0000      0.1358          2.25       0.73        1.62
       40     1      0.0099      0.0495          1.69       0.54        3.88

The early-out is a DEAD END: the cheap bound harvests 0% of groups at
sigma in {10, 20} and <=1% at sigma=40, and even an exact-lam_max oracle
would cut at most 14% (sigma=40 stage 0 only).  Root cause: a K-patch
group's TOP eigenvalue carries the DC-free noise mass — for pure noise
lam_max ~ sigma^2 (1 + sqrt(p/K))^2 (the Marchenko-Pastur edge, ~2.0
sigma^2 at p=49, K=100) plus any patch content on top, while
tau = thresh sigma^2 + sb2 sits at or below that edge (p1 of lam_max =
1.5 tau at the benchmark sigma=20).  Flatness kills TRAILING eigenvalues
(already zeroed inside the polynomial's gate), never the leading one, so
a gate on lam_max cannot fire at the reference's thresholds.  Round-4
judge item #2a closed with this measurement.
"""

import _bootstrap  # noqa: F401
import argparse
import sys

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=5)
    ap.add_argument("--h", type=int, default=480)
    ap.add_argument("--w", type=int, default=854)
    ap.add_argument("--step_s", type=int, default=6)
    ap.add_argument("--eig_sample", type=int, default=4096)
    args = ap.parse_args()

    import jax.numpy as jnp

    from vnlb_tpu.config import default_config
    from vnlb_tpu.ops import color, gather
    from vnlb_tpu.ops.mask import lattice_sites
    from vnlb_tpu.ops.search_dense import exec_search_dense
    from vnlb_tpu.pipeline import proc_nl
    from vnlb_tpu.testing.data import add_noise, synthetic_video

    clean = synthetic_video(args.frames, args.h, args.w, seed=0)

    print(f"{'sigma':>5} {'stage':>5} {'bound<=tau':>11} "
          f"{'lamax<=tau':>11} {'med bound/lam':>13} "
          f"{'p1 lam/tau':>10} {'med lam/tau':>11}")
    for sigma in (10.0, 20.0, 40.0):
        noisy = add_noise(clean, sigma, seed=1)
        cfg_all = default_config(sigma, preset="iphone", eig_method="poly",
                                 step_s=args.step_s, border_mode="mask")
        zf = np.zeros((args.frames, 2, args.h, args.w), np.float32)
        basic = np.asarray(proc_nl(noisy, None, None, zf, zf,
                                   cfg_all.stage(0)))
        for stage in (0, 1):
            cfg = cfg_all.stage(stage)
            shape = noisy.shape
            srch = basic if cfg.srch_img == "basic" else noisy
            srch_yuv = color.rgb2yuv(jnp.asarray(srch))
            noisy_yuv = color.rgb2yuv(jnp.asarray(noisy))
            basic_yuv = color.rgb2yuv(jnp.asarray(basic))
            sites = lattice_sites(shape, cfg)
            end_t = shape[0] - cfg.pt + 1
            qrow0 = tuple((f % cfg.step_s) if f < end_t - 1 else 0
                          for f in range(end_t))
            vals, inds = exec_search_dense(srch_yuv, jnp.asarray(sites),
                                           cfg, qrow0=qrow0)
            inds = np.asarray(inds)

            # gather groups (host-side, exact fill_patches semantics)
            k = cfg.npatches
            sub = np.random.default_rng(0).permutation(
                inds.shape[0])[:args.eig_sample]
            pn = gather.fill_patches(noisy_yuv, jnp.asarray(inds[sub]),
                                     cfg.pt, cfg.ps)
            pb = (gather.fill_patches(basic_yuv, jnp.asarray(inds[sub]),
                                      cfg.pt, cfg.ps)
                  if stage == 1 else None)

            # center exactly as ops/bayes.py (flat handling skipped: flat
            # groups only swap WHICH center is subtracted)
            b, kk, pt, c, ps, _ = pn.shape
            p = pt * ps * ps
            xn = jnp.transpose(pn, (0, 3, 1, 2, 4, 5)).reshape(
                b, c, kk, p).astype(jnp.float32)
            xn = xn - jnp.mean(xn, axis=2, keepdims=True)
            if cfg.cpatches == "basic":
                xb = jnp.transpose(pb, (0, 3, 1, 2, 4, 5)).reshape(
                    b, c, kk, p).astype(jnp.float32)
                xc = xb - jnp.mean(xb, axis=2, keepdims=True)
            else:
                xc = xn
            xc2 = np.asarray(xc.reshape(b * c, kk, p))

            tau = cfg.thresh * cfg.sigma2 + cfg.sigmab2
            gram = np.einsum("gkp,glp->gkl", xc2, xc2) / k
            tr = np.trace(gram, axis1=1, axis2=2)
            rowsum = np.abs(gram).sum(axis=2).max(axis=1)
            bound = np.minimum(tr, rowsum)
            lam_max = np.linalg.eigvalsh(gram)[:, -1]

            fb = float((bound <= tau).mean())
            fl = float((lam_max <= tau).mean())
            loose = float(np.median(bound / np.maximum(lam_max, 1e-9)))
            q = np.quantile(lam_max / tau, [0.01, 0.5])
            print(f"{sigma:5.0f} {stage:5d} {fb:11.4f} {fl:11.4f} "
                  f"{loose:13.2f} {q[0]:10.2f} {q[1]:11.2f}")
            sys.stdout.flush()


if __name__ == "__main__":
    main()
