#!/usr/bin/env python
"""Measure DCN frame-prep relayout variants on the TPU (fori differential).

Prep-only: builds (xp, lyx, m_q) and fully reduces them — no Mosaic kernel,
so compiles are fast.  Compares the round-3 single-8D-transpose relayout
against the round-4 two_stage (block-gather + batched minor-2D transpose).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from realvsr_tpu.ops.deform_conv_block import _frame_prep

B, H, W, CIN, DG, R = 3, 512, 1024, 64, 8, 4
BH, BW = 4, 64
ITERS = 10


def make(relayout):
    statics = dict(dg=DG, cpg=CIN // DG, r=R, bh=BH, bw=BW, k=9, kw=3,
                   dt=jnp.bfloat16, relayout=relayout)

    @jax.jit
    def run(x, off, m, wgt):
        def body(_, carry):
            acc, x_ = carry
            xp, lyx, m_q, wt_g, g, _ = _frame_prep(x_, off, m, wgt, **statics)
            s = (jnp.sum(xp.astype(jnp.float32))
                 + jnp.sum(lyx.astype(jnp.float32))
                 + jnp.sum(m_q.astype(jnp.float32)))
            x_ = x_ * (1 + s * 1e-30).astype(x_.dtype)
            return acc + s, x_

        acc, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0), x))
        return acc

    @jax.jit
    def run1(x, off, m, wgt):
        def body(_, carry):
            acc, x_ = carry
            xp, lyx, m_q, wt_g, g, _ = _frame_prep(x_, off, m, wgt, **statics)
            s = (jnp.sum(xp.astype(jnp.float32))
                 + jnp.sum(lyx.astype(jnp.float32))
                 + jnp.sum(m_q.astype(jnp.float32)))
            x_ = x_ * (1 + s * 1e-30).astype(x_.dtype)
            return acc + s, x_

        acc, _ = jax.lax.fori_loop(0, 1, body, (jnp.float32(0), x))
        return acc

    return run, run1


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, CIN)), jnp.bfloat16)
    off = jnp.asarray(rng.normal(size=(B, H, W, DG * 18)) * 2, jnp.bfloat16)
    m = jnp.asarray(rng.uniform(size=(B, H, W, DG * 9)), jnp.bfloat16)
    wgt = jnp.asarray(rng.normal(size=(3, 3, CIN, CIN)) * 0.1, jnp.bfloat16)

    # (round-5 chip record, encode barrier now unconditional: one_shot
    # 15.19 -> 6.87 ms/call with the barrier, two_stage 10.96 -> 9.54;
    # barriered one_shot is the production default)
    for relayout in ("one_shot", "two_stage"):
        run, run1 = make(relayout)
        float(run(x, off, m, wgt))
        float(run1(x, off, m, wgt))
        tn, t1 = [], []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(x, off, m, wgt))
            tn.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            float(run1(x, off, m, wgt))
            t1.append(time.perf_counter() - t0)
        dt = (min(tn) - min(t1)) / (ITERS - 1)
        print(f"prep[{relayout}]: {dt*1000:.2f} ms/call", flush=True)


if __name__ == "__main__":
    main()
