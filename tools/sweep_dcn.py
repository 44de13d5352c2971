#!/usr/bin/env python
"""Sweep DCN frame-kernel variants (fold strategy x block geometry) on TPU.

Measures the full modulated_deform_conv_block call at the L1 bench shape
(1024x512x64, B*T=3, dg=8, R=4, bf16) with the in-jit fori differential
methodology (PERF_NOTES.md) — single-dispatch timings through the axon
tunnel carry a ~25-35 ms roundtrip and are not comparable.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 8
REPS = 3


def measure(fn, *args):
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(x, *rest):
            def body(_, carry):
                acc, x = carry
                out = fn(x, *rest)
                s = jnp.sum(out.astype(jnp.float32))
                x = x * (1 + s * 1e-30).astype(x.dtype)
                return acc + s, x

            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), x))
            return acc

        return run

    rn, r1 = make(ITERS), make(1)
    float(rn(*args))
    float(r1(*args))
    tn, t1 = [], []
    for _ in range(REPS):
        t0 = time.perf_counter()
        float(rn(*args))
        tn.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        float(r1(*args))
        t1.append(time.perf_counter() - t0)
    return (min(tn) - min(t1)) / (ITERS - 1)


def main():
    import jax.numpy as jnp
    import numpy as np

    from realvsr_tpu.ops.deform_conv_block import modulated_deform_conv_block

    rng = np.random.default_rng(0)
    b, h, w, cin, dg, r = 3, 512, 1024, 64, 8, 4
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.bfloat16)
    off = jnp.asarray(rng.normal(size=(b, h, w, dg * 18)) * 2, jnp.bfloat16)
    m = jnp.asarray(rng.uniform(size=(b, h, w, dg * 9)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(size=(3, 3, cin, 64)) * 0.1, jnp.bfloat16)

    # (geom, fold, gemm) — fold='band' folds only the ph-2 strips tap tr
    # can ever sample (Mosaic-validated round 5; a 64-lane panel-window
    # variant was interpret-exact but the toolchain rejects any non-128
    # minor dim in kernel DMAs — removed, see deform_conv_block._frame_prep)
    cfgs = [
        ((4, 64), "slices", "big"),   # round-4 default
        ((4, 64), "band", "big"),
        ((4, 32), "band", "big"),
        ((4, 64), "band", "taps"),
        ((4, 64), "slices", "taps"),
    ]
    for geom, fold, gemm in cfgs:
        # off/m/wgt must be jit ARGUMENTS — closed-over they become HLO
        # constants and blow past the remote-compile payload limit
        def fn(x_, off_, m_, wgt_, geom=geom, fold=fold, gemm=gemm):
            return modulated_deform_conv_block(
                x_, off_, m_, wgt_, None, padding=1,
                deformable_groups=dg,
                max_offset=r, block=geom, use_pallas="frame",
                frame_fold=fold, frame_gemm=gemm,
                compute_dtype=jnp.bfloat16)

        tag = f"geom={geom} fold={fold} gemm={gemm}"
        try:
            t0 = time.perf_counter()
            dt = measure(fn, x, off, m, wgt)
            ct = time.perf_counter() - t0
            print(f"{tag}: {dt * 1e3:8.2f} ms/call "
                  f"(compile+measure {ct:.0f}s)", flush=True)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
