"""Fused Pallas TPU kernel for the block shift-window DCN.

Fuses the per-block chain of ``ops/deform_conv_block.py`` — interpolation
matrix construction, vertical MXU contraction, horizontal VPU reduce, and
the tap-weight GEMM — into one kernel, so the large ``v`` intermediate
(~127 GB of HBM traffic per full-res call in the XLA version) never leaves
VMEM.

Mosaic constraints shape the design: no in-kernel shape casts that change
the minor-dims tiling, so all operands arrive pre-flattened from XLA:
  * ``ly/lx/msk``: (n, dg, q, 1) with q ordered (tap, pixel),
  * ``pg``:        (n, dg, PH, PW*cpg) halo'd patches,
  * ``wt``:        (dg, k, cpg, cout),
and the final GEMM is unrolled per tap over static row slices of the
sampled matrix.

Forward only (inference fast path); training uses the differentiable XLA
formulations.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G_PER_STEP = 1  # pixel blocks per grid step (kernel body size vs grid overhead)


def _kernel(ly_ref, lx_ref, msk_ref, pg_ref, wt_ref, out_ref, *, p, k, dg,
            cpg, ph, pw, dt):
    q = p * k
    iota_ph = jax.lax.broadcasted_iota(jnp.int32, (1, ph), 1)
    iota_pw = jax.lax.broadcasted_iota(jnp.int32, (1, pw), 1)

    for n in range(ly_ref.shape[0]):
        acc = jnp.zeros((p, out_ref.shape[-1]), jnp.float32)
        for g in range(dg):
            ly = ly_ref[n, g]  # (q, 1) f32
            lx = lx_ref[n, g]
            y0 = jnp.floor(ly)
            ty = (ly - y0).astype(dt)
            x0 = jnp.floor(lx)
            tx = (lx - x0).astype(dt)
            y0i = y0.astype(jnp.int32)
            x0i = x0.astype(jnp.int32)

            wy = ((iota_ph == y0i).astype(dt) * (1 - ty)
                  + (iota_ph == y0i + 1).astype(dt) * ty)  # (q, PH)
            wx = ((iota_pw == x0i).astype(dt) * (1 - tx)
                  + (iota_pw == x0i + 1).astype(dt) * tx)
            wx = wx * msk_ref[n, g].astype(dt)  # (q, PW)

            # vertical: (q, PH) @ (PH, PW*cpg) — MXU
            v = jnp.dot(wy, pg_ref[n, g], preferred_element_type=jnp.float32)

            # horizontal: sum_Q wx[:, Q] * v[:, Q*cpg:(Q+1)*cpg] — VPU
            sampled = jnp.zeros((q, cpg), jnp.float32)
            for qq in range(pw):
                sampled = sampled + wx[:, qq:qq + 1].astype(jnp.float32) * \
                    v[:, qq * cpg:(qq + 1) * cpg]
            sampled = sampled.astype(dt)

            # per-tap GEMMs over static row slices (q ordered tap-major)
            for kk in range(k):
                acc = acc + jnp.dot(sampled[kk * p:(kk + 1) * p, :],
                                    wt_ref[g, kk],
                                    preferred_element_type=jnp.float32)
        out_ref[n] = acc.astype(out_ref.dtype)


def dcn_block_fused(patches_m: jax.Array, ly: jax.Array, lx: jax.Array,
                    mask: jax.Array, weight: jax.Array, *,
                    interpret: bool = False) -> jax.Array:
    """Run the fused kernel.

    Args:
      patches_m: (n_all, dg, PH, PW*cpg) halo'd block patches.
      ly, lx: (n_all, dg, q, 1) absolute local sample coords (f32),
        q ordered (tap, pixel).
      mask: (n_all, dg, q, 1) modulation.
      weight: (dg, k, cpg, cout).
    Returns:
      (n_all, p, cout) with p = q // k.
    """
    n_all, dg, ph, pwc = patches_m.shape
    _, k_, cpg, cout = weight.shape[0], weight.shape[1], weight.shape[2], \
        weight.shape[3]
    k = weight.shape[1]
    pw = pwc // cpg
    q = ly.shape[2]
    p = q // k
    dt = patches_m.dtype

    g = G_PER_STEP
    n_pad = (-n_all) % g
    if n_pad:
        pad = lambda a: jnp.pad(a, ((0, n_pad),) + ((0, 0),) * (a.ndim - 1))
        patches_m, ly, lx, mask = (pad(patches_m), pad(ly), pad(lx),
                                   pad(mask))
    n_tot = n_all + n_pad

    kern = functools.partial(_kernel, p=p, k=k, dg=dg, cpg=cpg, ph=ph,
                             pw=pw, dt=dt)
    out = pl.pallas_call(
        kern,
        grid=(n_tot // g,),
        in_specs=[
            pl.BlockSpec((g, dg, q, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, dg, q, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, dg, q, 1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, dg, ph, pwc), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dg, k, cpg, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, p, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tot, p, cout), dt),
        interpret=interpret,
    )(ly, lx, mask, patches_m, weight)
    return out[:n_all]
