"""Fused Pallas TPU kernel for the block shift-window DCN.

Fuses the heavy middle of ``ops/deform_conv_block.py`` — the vertical MXU
contraction, horizontal modulation, and tap-weight GEMM — into one kernel,
so the large ``v`` intermediate (~127 GB of HBM traffic per full-res call
in the XLA version) never leaves VMEM.

Mosaic-driven design constraints:
  * no in-kernel shape casts → all operands pre-flattened in XLA; the
    patch feature axis is ordered m = (cpg, PW) so the horizontal weights
    expand with a tiled ``pltpu.repeat`` (no interleaving reshape);
  * no (x, 1)-shaped operands (the lane dim would pad 128x);
  * the horizontal reduction is folded into the tap GEMM: with
    wtbig[k, (c, Q), cout] = wt[k, c, cout] repeated over Q, the per-tap
    dot over m = cpg*PW performs the Q-sum and the channel contraction in
    one MXU pass (K = 280 — a good MXU shape);
  * groups iterate under lax.fori_loop so temporaries are reused.

Forward only (inference fast path); training uses the differentiable XLA
formulations.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(wy_ref, wx_ref, pg_ref, wtbig_ref, out_ref, *, p, k, dg, cpg,
            pw):
    q = p * k
    cout = out_ref.shape[-1]

    def group_body(g, acc):
        wy = wy_ref[0, g]  # (q, PH)
        wx = wx_ref[0, g]  # (q, PW), modulation folded in
        pg = pg_ref[0, g]  # (PH, cpg*PW)
        # vertical: (q, PH) @ (PH, cpg*PW) — MXU
        v = jnp.dot(wy, pg, preferred_element_type=jnp.float32)
        # horizontal weights tiled over the channel blocks: (q, cpg*PW)
        vw = (v * pltpu.repeat(wx, cpg, axis=1).astype(jnp.float32)).astype(
            wy.dtype)
        # per-tap GEMM also performs the Q reduction (wtbig repeats over Q)
        for kk in range(k):
            acc = acc + jnp.dot(vw[kk * p:(kk + 1) * p, :],
                                wtbig_ref[g, kk],
                                preferred_element_type=jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, dg, group_body, jnp.zeros((p, cout),
                                                         jnp.float32))
    out_ref[0] = acc.astype(out_ref.dtype)


def dcn_block_fused(patches_m: jax.Array, wy: jax.Array, wx: jax.Array,
                    wtbig: jax.Array, *, cpg: int,
                    interpret: bool = False) -> jax.Array:
    """Run the fused kernel.

    Args:
      patches_m: (n_all, dg, PH, cpg*PW) halo'd block patches, feature axis
        ordered (channel, column).
      wy: (n_all, dg, q, PH) vertical interpolation matrices, q ordered
        (tap, pixel).
      wx: (n_all, dg, q, PW) horizontal matrices with modulation folded in.
      wtbig: (dg, k, cpg*PW, cout) per-group tap weights repeated over the
        PW columns.
    Returns:
      (n_all, p, cout) with p = q // k.
    """
    n_all, dg, ph, m = patches_m.shape
    k = wtbig.shape[1]
    cout = wtbig.shape[-1]
    pw = m // cpg
    q = wy.shape[2]
    p = q // k
    dt = patches_m.dtype

    kern = functools.partial(_kernel, p=p, k=k, dg=dg, cpg=cpg, pw=pw)
    out = pl.pallas_call(
        kern,
        grid=(n_all,),
        in_specs=[
            pl.BlockSpec((1, dg, q, ph), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, q, pw), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, ph, m), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dg, k, m, cout), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, p, cout), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_all, p, cout), dt),
        interpret=interpret,
    )(wy, wx, patches_m, wtbig)
    return out
