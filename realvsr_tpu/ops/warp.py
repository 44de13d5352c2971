"""Flow warping (grid_sample equivalent) as a gather-based JAX op.

Reproduces the reference's ``flow_warp`` (``codes/models/archs/arch_util.py:
47-80``): bilinear sampling at ``grid + flow`` with **align_corners=True**
normalization and selectable padding ('zeros' or 'border').

TPU formulation: channels-last row gathers on the flattened spatial axis —
four gathers of C-contiguous rows plus a weighted sum, which XLA vectorizes
along the lane (channel) dimension.  Differentiable w.r.t. both inputs
(autodiff of gather → scatter-add, the analog of the CUDA col2im atomics).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_bilinear(x: jax.Array, coords: jax.Array,
                         padding_mode: str = "zeros") -> jax.Array:
    """Sample NHWC ``x`` at absolute pixel coordinates.

    Args:
      x: (B, H, W, C) features.
      coords: (B, Ho, Wo, 2) absolute (x, y) pixel positions (unnormalized),
        align_corners=True convention: coord 0 is the center of pixel 0 and
        coord H-1 the center of the last pixel.
      padding_mode: 'zeros' (out-of-range reads contribute 0) or 'border'.

    Returns:
      (B, Ho, Wo, C) sampled features.
    """
    b, h, w, c = x.shape
    cx = coords[..., 0].astype(jnp.float32)
    cy = coords[..., 1].astype(jnp.float32)

    x0 = jnp.floor(cx)
    y0 = jnp.floor(cy)
    tx = cx - x0
    ty = cy - y0

    def corner_weight_and_index(yi, xi, wgt):
        if padding_mode == "zeros":
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            wgt = jnp.where(valid, wgt, 0.0)
        xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        return yi * w + xi, wgt

    i00, w00 = corner_weight_and_index(y0, x0, (1 - ty) * (1 - tx))
    i01, w01 = corner_weight_and_index(y0, x0 + 1, (1 - ty) * tx)
    i10, w10 = corner_weight_and_index(y0 + 1, x0, ty * (1 - tx))
    i11, w11 = corner_weight_and_index(y0 + 1, x0 + 1, ty * tx)

    flat = x.reshape(b, h * w, c)

    def gather_rows(xi_flat, idx):
        # idx: (Ho, Wo) int32 → rows (Ho, Wo, C)
        return jnp.take(xi_flat, idx.reshape(-1), axis=0).reshape(
            idx.shape + (c,)
        )

    vg = jax.vmap(gather_rows)
    out = (
        vg(flat, i00) * w00[..., None]
        + vg(flat, i01) * w01[..., None]
        + vg(flat, i10) * w10[..., None]
        + vg(flat, i11) * w11[..., None]
    )
    return out.astype(x.dtype)


def flow_warp(x: jax.Array, flow: jax.Array, padding_mode: str = "zeros") -> jax.Array:
    """Warp NHWC ``x`` by per-pixel flow (B, H, W, 2), (dx, dy) order.

    Matches reference arch_util.flow_warp: vgrid = base_grid + flow, bilinear,
    align_corners=True.
    """
    b, h, w, _ = x.shape
    gy, gx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    base = jnp.stack([gx, gy], axis=-1)  # (H, W, 2) in (x, y) order
    coords = base[None] + flow.astype(jnp.float32)
    return grid_sample_bilinear(x, coords, padding_mode=padding_mode)
