#!/usr/bin/env python
"""Benchmark: EDVR_NoUp (RealVSR flagship config) full-resolution inference.

Primary metric: 1024x512 — the native RealVSR clip size, matching the
reference's own latency metric (test_RealVSR_wo_GT.py "Average inference
time").  A 1920x1080 measurement (the north-star shape) is printed as a
secondary line to stderr.  Prints ONE JSON line on stdout:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline uses a documented reference point of 8.0 frames/s — an estimate
of the reference PyTorch EDVR_NoUp (woTSA, 3-frame, nf=64, x1) at 1024x512
on an A100 (the repo publishes no numbers; see BASELINE.md).

Timing methodology (PERF_NOTES.md): through the axon TPU tunnel,
``block_until_ready`` acks early and single-call timing adds a ~25-40 ms
roundtrip, so we run ITERS forward passes inside ONE jit via lax.fori_loop
with a non-foldable inter-iteration dependence and a full-output reduction,
and use differential ((ITERS) vs (1)) timing with forced scalar readback.
"""
from __future__ import annotations

import json
import os
import sys
import time

# Persistent compilation cache: the Mosaic/XLA compiles for the bench shapes
# take minutes through the remote-compile tunnel; cache them across runs so
# repeated bench invocations time execution, not compilation.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

BASELINE_FPS_A100 = 8.0  # documented estimate, see module docstring

NFRAMES = 3
ITERS = 10
REPS = 3


def _measure(model, params, h, w, batch=1, compile_only=False):
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((batch, NFRAMES, h, w, 3), jnp.bfloat16)

    def make(n):
        @jax.jit
        def run(p, inp):
            def body(_, carry):
                acc, inp = carry
                out = model.apply({"params": p}, inp)
                s = jnp.sum(out.astype(jnp.float32))
                # non-foldable dependence: next input nudged by the result
                inp = inp * (1 + s * 1e-30).astype(inp.dtype)
                return acc + s, inp

            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), inp))
            return acc

        return run

    run_n = make(ITERS)
    run_1 = make(1)
    if compile_only:
        # chipless AOT compile (the axon helper compiles without the
        # chip) — populates the persistent cache so a later timed run
        # pays execution only; see tools/warm_bench_cache.py
        run_n.lower(params, x).compile()
        run_1.lower(params, x).compile()
        return float("nan")
    float(run_n(params, x))  # compile
    float(run_1(params, x))
    times_n, times_1 = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(run_n(params, x))
        times_n.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(run_1(params, x))
        times_1.append(time.perf_counter() - t0)
    dt = (min(times_n) - min(times_1)) / (ITERS - 1)
    return batch / dt


def main():
    import jax
    import jax.numpy as jnp

    from realvsr_tpu.models.edvr import EDVRNoUp
    from realvsr_tpu.ops.deform_conv import set_default_impl

    # fast DCN path for inference: fused Pallas frame-DMA kernel with
    # offsets clamped to ±4 px (ops/pallas/dcn_frame_kernel.py).  Validated
    # on a trained model: 99.4% of PCD offsets are within ±4 and the output
    # agrees with the exact gather op to 67.9 dB (PERF_NOTES.md round-2,
    # tools/validate_dcn_clamp.py)
    set_default_impl("frame", block_max_offset=4, block_chunk=128)
    # pair-packed Pallas conv3x3 on the front/recon ResBlock chains
    # (3.34 vs 4.45 ms/conv at the bench shape, PERF_NOTES round-3)
    from realvsr_tpu.models.common import set_conv3x3_impl
    set_conv3x3_impl("pallas")

    model = EDVRNoUp(nf=64, nc=3, nframes=NFRAMES, groups=8, front_RBs=5,
                     back_RBs=10, predeblur=False, HR_in=False, w_TSA=False,
                     dtype=jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, NFRAMES, 64, 64, 3), jnp.float32))["params"]
    # deployment form: pre-cast weights to bf16 once instead of paying the
    # f32->bf16 cast fusion + double-width weight DMA on every call (the
    # model computes in bf16 either way — outputs are identical)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    fps = _measure(model, params, 512, 1024)
    try:
        fps_1080 = _measure(model, params, 1088, 1920)  # 1080 rounded to /32
        print(f"secondary: 1920x1088 inference {fps_1080:.4f} frames/s",
              file=sys.stderr)
    except Exception:  # full-frame 1080p needs >16 GB HBM on one v5e —
        # fall back to the overlap-stitched spatial tiling path
        try:
            fps_1080 = _measure_tiled_1080(model, params)
            print(f"secondary: 1920x1088 inference {fps_1080:.4f} frames/s "
                  "(tiled 576x1024+32, incl. host stitching)",
                  file=sys.stderr)
        except Exception as e:  # pragma: no cover
            print(f"secondary 1080p measurement failed: {e}", file=sys.stderr)

    # batched multi-clip throughput (BASELINE.json config #5): frames/s/chip
    # is a throughput metric — B>1 amortizes per-call glue and fills the MXU
    for b in (2, 4):
        try:
            fps_b = _measure(model, params, 512, 1024, batch=b)
            print(f"secondary: 1024x512 BATCHED B={b} inference "
                  f"{fps_b:.4f} frames/s/chip", file=sys.stderr)
        except Exception as e:  # pragma: no cover — OOM at large batch
            print(f"secondary B={b} measurement failed: {e}",
                  file=sys.stderr)
            break

    try:
        fps_stream = _measure_streaming(model, params)
        print(f"secondary: 1024x512 STREAMING video inference "
              f"{fps_stream:.4f} frames/s (per-frame pyramid cache, "
              "identical outputs; eval/streaming.py)", file=sys.stderr)
        fps_sc = _measure_streaming(model, params, clips=2)
        print(f"secondary: 1024x512 STREAMING 2-clip batched "
              f"{fps_sc:.4f} frames/s/chip (run_scan_clips — "
              "BASELINE config #5)", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"streaming measurement failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "edvr_noup_1024x512_inference_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS_A100, 4),
    }), flush=True)


def _measure_streaming(model, params, t_total=12, clips=1):
    import jax
    import jax.numpy as jnp

    from realvsr_tpu.eval.streaming import StreamingRunner

    runner = StreamingRunner(model, params, padding="replicate")
    # block_until_ready acks EARLY through the axon tunnel (PERF_NOTES
    # methodology) — force a full-output reduction readback instead, with
    # the reduction pre-compiled so the timed calls are execution-only
    red = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))
    if clips > 1:
        frames = jnp.zeros((clips, t_total, 512, 1024, 3), jnp.bfloat16)
        run = runner.run_scan_clips
    else:
        frames = jnp.zeros((t_total, 512, 1024, 3), jnp.bfloat16)
        run = runner.run_scan
    float(red(run(frames)))  # compile both
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(red(run(frames)))
        times.append(time.perf_counter() - t0)
    return clips * t_total / min(times)


def _measure_tiled_1080(model, params):
    """1080p via spatial tiling.  Preferred path: the single-jit batched
    tiler (eval/tiled.make_batched_tiled_forward) — one dispatch and a
    B=4 tile batch per frame instead of four tunnel roundtrips — timed
    with the standard in-jit fori differential methodology.  Falls back
    to the per-tile loop tiler (host-dispatch timed) if the batched
    program fails (e.g. OOM at B=4)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from realvsr_tpu.eval.tiled import (batched_tiled_apply,
                                        make_tiled_forward)

    window = jnp.zeros((NFRAMES, 1088, 1920, 3), jnp.bfloat16)
    try:
        # variables must be a jit ARGUMENT — closed over they inline the
        # weights as MLIR constants (4.7 MB payload) and crash the
        # remote compile helper
        apply = batched_tiled_apply(model, tile_hw=(576, 1024), overlap=32)
        variables = {"params": params}

        def make(n):
            @jax.jit
            def run(v, w_):
                def body(_, carry):
                    acc, w_ = carry
                    s = jnp.sum(apply(v, w_).astype(jnp.float32))
                    w_ = w_ * (1 + s * 1e-30).astype(w_.dtype)
                    return acc + s, w_

                acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), w_))
                return acc

            return run

        run_n, run_1 = make(ITERS), make(1)
        float(run_n(variables, window))
        float(run_1(variables, window))
        tn, t1 = [], []
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(run_n(variables, window))
            tn.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run_1(variables, window))
            t1.append(time.perf_counter() - t0)
        return (ITERS - 1) / (min(tn) - min(t1))
    except Exception as e:
        print(f"batched tiler failed ({type(e).__name__}); falling back to "
              "loop tiler", file=sys.stderr)
        fwd = make_tiled_forward(model, params, tile_hw=(576, 1024),
                                 overlap=32)
        np.asarray(fwd(window))  # compile all tile shapes
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(fwd(window))
            times.append(time.perf_counter() - t0)
        return 1.0 / min(times)


if __name__ == "__main__":
    main()
