"""Public API: ``denoise`` and ``denoise_mod``.

Parity: reference lib/vnlb/impl.py:24-132.  Differences by design:

* ``flows=`` is a real keyword argument — the reference's README documents a
  flow input that ``denoise()`` silently drops (impl.py:45 always allocates
  zeros; SURVEY.md §3.1).  Here user flows are honored; the default is zero
  flow, matching the reference's effective behavior.
* The preset is an explicit argument (default "iphone" = the reference's
  hardcoded choice, params.py:58).
* Everything runs on whatever device JAX is configured for (TPU); there is no
  ``gpuid`` plumbing.  A ``gpuid`` kwarg is accepted and ignored for
  drop-in compatibility.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from .config import VnlbConfig, default_config
from .pipeline import proc_nl
from .utils.flow_io import zero_flows
from .utils.timer import Timer


def _prep_flows(noisy_shape, flows):
    if flows is None:
        return zero_flows(noisy_shape)
    if isinstance(flows, dict):
        fflow, bflow = flows["fflow"], flows["bflow"]
    else:
        fflow, bflow = flows
    fflow = np.asarray(fflow, np.float32)
    bflow = np.asarray(bflow, np.float32)
    t = noisy_shape[0]
    if fflow.shape[0] == t - 1:  # expand t-1 -> t (reference utils.py:136-183)
        from .utils.flow_io import expand_flows
        fflow, bflow = expand_flows(fflow, bflow)
    assert fflow.shape[0] == t and bflow.shape[0] == t, \
        f"flows must have {t} or {t - 1} frames"
    return fflow, bflow


def denoise(noisy, sigma: float, flows=None, clean=None,
            preset: str = "iphone", cfg: Optional[VnlbConfig] = None,
            verbose: bool = False, gpuid: int = 0
            ) -> Tuple[jnp.ndarray, jnp.ndarray, float]:
    """Video Non-Local Bayes denoising (two passes).

    Args:
      noisy: (T, C, H, W) RGB video, [0, 255] float.
      sigma: noise standard deviation on the [0, 255] scale.
      flows: optional (fflow, bflow) pair or dict, each (T, 2, H, W) or
             (T-1, 2, H, W).  Defaults to zero flow.
      clean: optional clean video for oracle experiments.
      preset/cfg: named preset or a fully custom ``VnlbConfig``.

    Returns (deno, basic, seconds) — parity with reference impl.py:24-62.
    """
    clock = Timer().tic()
    noisy = np.asarray(noisy, np.float32) if not hasattr(noisy, "shape") \
        else noisy
    cfg = cfg or default_config(sigma, preset=preset, verbose=verbose)
    fflow, bflow = _prep_flows(noisy.shape, flows)

    if verbose:
        print(f"[vnlb_tpu] preset={cfg.preset} sigma={sigma}")

    basic = proc_nl(noisy, None, clean, fflow, bflow, cfg.stage(0))
    deno = proc_nl(noisy, basic, clean, fflow, bflow, cfg.stage(1))
    deno.block_until_ready()
    return deno, basic, clock.toc()


def denoise_mod(noisy, sigma: float, flows=None, clean=None,
                verbose: bool = False, gpuid: int = 0
                ) -> Tuple[jnp.ndarray, jnp.ndarray, float]:
    """Experimental variant pipeline (reference impl.py:64-132):

    1. averaging warm start (K=10, search on noisy, 'ave' mode);
    2. three damped 'ave' iterations (alpha=0.75, K=2, search on basic);
    3. a Bayes pass with K=100 searching on basic;
    4. the final step-2 pass (K=60, gamma=0.2, cpatches=basic).
    """
    clock = Timer().tic()
    noisy = jnp.asarray(noisy, jnp.float32)
    cfg = default_config(sigma, preset="iphone", verbose=verbose)
    fflow, bflow = _prep_flows(noisy.shape, flows)

    s0 = cfg.stage(0)
    basic = proc_nl(noisy, None, clean, fflow, bflow,
                    s0.replace(npatches=10, srch_img="noisy",
                               cpatches="noisy", deno="ave"))

    alpha = 0.75
    for _ in range(3):
        basic = alpha * basic + (1 - alpha) * noisy
        basic = proc_nl(noisy, basic, clean, fflow, bflow,
                        s0.replace(npatches=2, srch_img="basic",
                                   cpatches="noisy", deno="ave"))

    basic = proc_nl(noisy, basic, clean, fflow, bflow,
                    s0.replace(npatches=100, srch_img="basic",
                               cpatches="noisy", deno="bayes"))

    s1 = cfg.stage(1).replace(npatches=60, gamma=0.2, cpatches="basic")
    deno = proc_nl(noisy, basic, clean, fflow, bflow, s1)
    deno.block_until_ready()
    return deno, basic, clock.toc()


def proc_nl_cache(vid_set, vid_name, sigma):
    """Read a previously cached denoised sequence (reference
    proc_nl.py:179-180)."""
    from .utils.video_io import read_nl_sequence

    return read_nl_sequence(vid_set, vid_name, sigma)


def proc_nn(model: str, vid_set, vid_name, sigma):
    """Read cached NN-denoiser outputs (PaCNet/UDVD interop; reference
    proc_nn.py:5-14)."""
    from .utils import video_io

    readers = {"udvd": video_io.read_udvd_sequence,
               "pacnet": video_io.read_pacnet_sequence,
               "vnlb": video_io.read_nl_sequence}
    if model not in readers:
        raise ValueError(f"unknown nn model [{model}]")
    return readers[model](vid_set, vid_name, sigma)
