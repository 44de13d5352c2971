"""Fused Pallas TPU kernel for the block shift-window DCN (v6,
horizontal-first).

Fuses the heavy middle of ``ops/deform_conv_block.py`` — interpolation
construction, bilinear sampling, modulation, and the tap-weight GEMM —
into one kernel, so neither the large sampled intermediate (~127 GB of
HBM traffic per full-res call in the XLA version) nor the interpolation
matrices (~14 GB) ever touch HBM.

Design (per grid step = one (bh x bw) pixel block; q = k*bh*bw, tap-major):
  * the Wx/Wy interpolation vectors are built IN-KERNEL from a small
    (ly, lx, mask) coordinate tensor with broadcasted_iota comparisons,
  * horizontal-first, everything lane-oriented with q in lanes:
      wx_t (PW, q)      iota-compare(lx) * mask            VPU
      h (PH*cpg, q)   = pg @ wx_t                          MXU, K = PW
      s_g (cpg, q)    = sum_P wy[P] * h[P-th cpg-slab]     VPU, PH static
                        contiguous FMAs (the vertical lerp has 2 nonzeros
                        per q, but a dense PH fold on the VPU beats every
                        M/N-starved matmul formulation we measured)
      S (dg*k*cpg, p) rows (g, tap, c)  ← per-tap lane slices of s_g
      out (p, cout)   = S^T @ W3                           MXU, K = dg*k*cpg
  * the single K=576 tap GEMM replaces v1's nine Q-repeated K=280 GEMMs
    (2.5x the vertical MACs — the reason v1 measured 45 us/step) and v3's
    72 K=8 dots.

Measured (TPU v5e, full-res 1024x512x64, dg=8, bf16): 86 ms/call at R=4,
95 ms at R=8 for the kernel body vs 167/209 ms for the XLA block path —
before the XLA-side patch-layout prep is accounted; see
deform_conv_block.py for the remaining prep costs.

Replaces the im2col+GEMM strategy of the reference CUDA op
(deform_conv_cuda.cpp:539-556, deform_conv_cuda_kernel.cu:571-634) with a
dense-window formulation that maps onto the MXU.  Forward only (inference
fast path); training uses the differentiable XLA formulation.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(coords_ref, pg_ref, wt_ref, out_ref, s_ref, *, p, k, dg, cpg,
            ph, pw):
    dt = pg_ref.dtype
    io_p = jax.lax.broadcasted_iota(jnp.int32, (ph, 1), 0)
    io_q = jax.lax.broadcasted_iota(jnp.int32, (pw, 1), 0)
    for g in range(dg):
        c = coords_ref[0, g]          # (3, q) f32: ly, lx, mask
        ly = c[0:1, :]
        lx = c[1:2, :]
        mask = c[2:3, :]
        y0 = jnp.floor(ly)
        ty = (ly - y0).astype(dt)
        y0i = y0.astype(jnp.int32)
        x0 = jnp.floor(lx)
        tx = (lx - x0).astype(dt)
        x0i = x0.astype(jnp.int32)
        wy_t = ((io_p == y0i).astype(dt) * (1 - ty)
                + (io_p == y0i + 1).astype(dt) * ty)
        wx_t = (((io_q == x0i).astype(dt) * (1 - tx)
                 + (io_q == x0i + 1).astype(dt) * tx) * mask.astype(dt))
        # horizontal-first: (PH*cpg, q) = pg @ wx_t — MXU, K = PW
        h = jnp.dot(pg_ref[0, g], wx_t,
                    preferred_element_type=jnp.float32).astype(dt)
        # vertical lerp fold: PH static contiguous (cpg, q) FMAs — VPU
        s = h[0:cpg, :] * wy_t[0:1, :]
        for pp in range(1, ph):
            s = s + h[pp * cpg:(pp + 1) * cpg, :] * wy_t[pp:pp + 1, :]
        # scatter taps into rows so ONE K = dg*k*cpg GEMM finishes the op
        for kk in range(k):
            row = (g * k + kk) * cpg
            s_ref[row:row + cpg, :] = s[:, kk * p:(kk + 1) * p]
    out_ref[0] = jax.lax.dot_general(
        s_ref[:, :], wt_ref[:, :], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)


def dcn_block_fused(patches_m: jax.Array, coords: jax.Array, wt: jax.Array,
                    *, cpg: int, k: int = 9,
                    interpret: bool = False) -> jax.Array:
    """Run the fused kernel.

    Args:
      patches_m: (n_all, dg, PH*cpg, PW) halo'd block patches, rows
        (P, c)-major.
      coords: (n_all, dg, 3, q) f32 — rows (ly, lx, mask), q tap-major
        (q = tap*p + pixel).
      wt: (dg*k*cpg, cout) tap weights, rows ordered (g, tap, c).
    Returns:
      (n_all, p, cout) with p = q // k.
    """
    n_all, dg, phc, pw = patches_m.shape
    cout = wt.shape[-1]
    ph = phc // cpg
    q = coords.shape[-1]
    p = q // k
    dt = patches_m.dtype

    kern = functools.partial(_kernel, p=p, k=k, dg=dg, cpg=cpg, ph=ph, pw=pw)
    flops = 2 * n_all * dg * (q * pw * phc) + 2 * n_all * p * wt.size
    out = pl.pallas_call(
        kern,
        grid=(n_all,),
        in_specs=[
            pl.BlockSpec((1, dg, 3, q), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, phc, pw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dg * k * cpg, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_all, p, cout), dt),
        scratch_shapes=[pltpu.VMEM((dg * k * cpg, p), dt)],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=(patches_m.size + coords.size * 2) * 2,
            transcendentals=0),
        interpret=interpret,
    )(coords, patches_m, wt)
    return out
