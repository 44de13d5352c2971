#!/usr/bin/env python
"""Benchmark: EDVR_NoUp (RealVSR flagship config) full-res inference on TPU.

Resolution 1024x512 — the native RealVSR clip size that the reference's
own latency metric (test_RealVSR_wo_GT) measures.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference repo publishes no numbers (BASELINE.md); its measurement is
"Average inference time" from test_RealVSR_wo_GT.py on one GPU.  We use a
documented reference point of 2.0 frames/s — an estimate of the reference
PyTorch EDVR_NoUp (woTSA, 3-frame, nf=64, x1) at 1024x512 (RealVSR full resolution) on an A100 —
so vs_baseline > 1.0 means faster than the CUDA stack per chip.
"""
from __future__ import annotations

import json
import sys
import time

BASELINE_FPS_A100 = 8.0  # documented estimate, see module docstring

H, W = 512, 1024
NFRAMES = 3
WARMUP = 2
ITERS = 8


def main():
    import jax
    import jax.numpy as jnp

    from realvsr_tpu.models.edvr import EDVRNoUp

    dtype = jnp.bfloat16
    model = EDVRNoUp(nf=64, nc=3, nframes=NFRAMES, groups=8, front_RBs=5,
                     back_RBs=10, predeblur=False, HR_in=False, w_TSA=False,
                     dtype=dtype)

    # pad H to a multiple of 4 for the 3-level pyramid (1080 = 4*270, ok)
    x = jnp.zeros((1, NFRAMES, H, W, 3), dtype)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, NFRAMES, 64, 64, 3), jnp.float32))["params"]

    @jax.jit
    def forward(p, inp):
        return model.apply({"params": p}, inp)

    out = forward(params, x)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        jax.block_until_ready(forward(params, x))

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = forward(params, x)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / ITERS

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "edvr_noup_1024x512_inference_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS_A100, 4),
    }))


if __name__ == "__main__":
    main()
