#!/usr/bin/env python
"""Benchmark: EDVR_NoUp (RealVSR flagship config) full-resolution inference.

Resolution 1024x512 — the native RealVSR clip size, matching the
reference's own latency metric (test_RealVSR_wo_GT.py "Average inference
time").  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline uses a documented reference point of 8.0 frames/s — an estimate
of the reference PyTorch EDVR_NoUp (woTSA, 3-frame, nf=64, x1) at 1024x512
on an A100 (the repo publishes no numbers; see BASELINE.md).

Timing note: through the axon TPU tunnel ``block_until_ready`` acks early,
so timing forces a scalar readback (float()) per measurement; the ~40 ms
tunnel roundtrip is negligible at this workload size.
"""
from __future__ import annotations

import json
import time

BASELINE_FPS_A100 = 8.0  # documented estimate, see module docstring

H, W = 512, 1024
NFRAMES = 3
ITERS = 2


def main():
    import jax
    import jax.numpy as jnp

    from realvsr_tpu.models.edvr import EDVRNoUp
    from realvsr_tpu.ops.deform_conv import set_default_impl

    # fast DCN path for inference: shift-window MXU formulation with
    # offsets clamped to ±8 px (see ops/deform_conv_block.py, PERF_NOTES.md)
    set_default_impl("block", block_max_offset=8, block_chunk=128)

    dtype = jnp.bfloat16
    model = EDVRNoUp(nf=64, nc=3, nframes=NFRAMES, groups=8, front_RBs=5,
                     back_RBs=10, predeblur=False, HR_in=False, w_TSA=False,
                     dtype=dtype)

    x = jnp.zeros((1, NFRAMES, H, W, 3), dtype)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, NFRAMES, 64, 64, 3), jnp.float32))["params"]

    @jax.jit
    def forward_sum(p, inp):
        out = model.apply({"params": p}, inp)
        return jnp.sum(out.astype(jnp.float32))

    float(forward_sum(params, x))  # compile + first run
    times = []
    for _ in range(ITERS):
        t0 = time.perf_counter()
        float(forward_sum(params, x))  # scalar readback forces completion
        times.append(time.perf_counter() - t0)
    dt = min(times)

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "edvr_noup_1024x512_inference_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS_A100, 4),
    }))


if __name__ == "__main__":
    main()
