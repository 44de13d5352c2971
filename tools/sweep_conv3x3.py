#!/usr/bin/env python
"""Sweep packed-conv kernel variants (staging strategy x mrows) on TPU.

The recon-trunk packed convs run at ~16% MXU utilization (2.38 ms/conv at
B=1 512x1024 vs ~0.5 ms speed-of-light, round-5 trace) — suspects are the
a_ref staging scratch serializing consecutive blocks (the DCN kernel's
recorded ref-reuse hazard) and the m<=2048 block size.  Measures the full
conv3x3_packed call at the two hot shapes with the fori differential
methodology (PERF_NOTES.md).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 30
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

    from realvsr_tpu.ops.pallas.conv3x3_kernel import (
        _packed_pallas, pack_pairs)

    rng = np.random.default_rng(0)
    shapes = [("front b3", (3, 512, 1024, 64)), ("recon b1", (1, 512, 1024, 64))]
    for tag, (b, h, w, c) in shapes:
        x = pack_pairs(jnp.asarray(rng.normal(size=(b, h, w, c)),
                                   jnp.bfloat16))
        res = pack_pairs(jnp.asarray(rng.normal(size=(b, h, w, c)),
                                     jnp.bfloat16))
        wgt = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.1, jnp.bfloat16)
        bi = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.bfloat16)
        for variant in ("scratch", "dbuf", "ssa"):
            for mrows in (2, 4, 8):
                def fn(x_, res_, wgt_, bi_, v=variant, mr=mrows):
                    return _packed_pallas(x_, wgt_, bi_, h=h, act="relu",
                                          residual=res_, mrows=mr,
                                          variant=v)

                lab = f"{tag} variant={variant} mrows={mrows}"
                try:
                    dt = measure(fn, x, res, wgt, bi)
                    print(f"{lab}: {dt*1e3:7.3f} ms/call", flush=True)
                except Exception as e:
                    print(f"{lab}: FAILED {type(e).__name__}: "
                          f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
