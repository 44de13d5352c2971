"""Spatially tiled full-frame inference.

Bounds device memory for large frames (1080p+) by running the model over
overlapping spatial tiles and stitching the centers — the TPU analog of the
reference's implicit single-GPU-must-fit assumption (SURVEY §5 long-context
row).  One jit compile per tile shape; edge tiles are padded to the tile
shape so every tile reuses the same executable.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np


def tiled_forward(forward: Callable, window, tile_hw: tuple[int, int] = (256, 512),
                  overlap: int = 32, scale: int = 1):
    """Apply ``forward`` over overlapping tiles of a (T, H, W, C) window.

    Args:
      forward: jitted fn (T, th, tw, C) → (th*scale, tw*scale, C).
      window: (T, H, W, C) array.
      tile_hw: tile size (must be ≤ frame size after padding).
      overlap: halo pixels on each side, discarded at stitch time.
      scale: model upscale factor.
    Returns:
      (H*scale, W*scale, C) numpy array.
    """
    t, h, w, c = window.shape
    th, tw = tile_hw
    th = min(th, h)
    tw = min(tw, w)
    step_h = th - 2 * overlap
    step_w = tw - 2 * overlap
    assert step_h > 0 and step_w > 0, "tile too small for overlap"

    out = np.zeros((h * scale, w * scale, c), np.float32)
    window = jnp.asarray(window, jnp.float32)

    ys = list(range(0, max(h - 2 * overlap, 1), step_h))
    xs = list(range(0, max(w - 2 * overlap, 1), step_w))

    for y0 in ys:
        for x0 in xs:
            # clamp tile to the frame, keeping the full tile shape
            ty = min(y0, h - th)
            tx = min(x0, w - tw)
            tile = jax.lax.dynamic_slice(window, (0, ty, tx, 0), (t, th, tw, c))
            pred = np.asarray(forward(tile), np.float32)
            # valid (non-halo) region of this tile in frame coords
            vy0 = ty + (overlap if ty > 0 else 0)
            vx0 = tx + (overlap if tx > 0 else 0)
            vy1 = ty + th - (overlap if ty + th < h else 0)
            vx1 = tx + tw - (overlap if tx + tw < w else 0)
            out[vy0 * scale:vy1 * scale, vx0 * scale:vx1 * scale] = pred[
                (vy0 - ty) * scale:(vy1 - ty) * scale,
                (vx0 - tx) * scale:(vx1 - tx) * scale]
    return out


def make_tiled_forward(model, params, tile_hw=(256, 512), overlap: int = 32,
                       scale: int = 1) -> Callable:
    """Sliding-window-compatible forward that tiles internally."""

    variables = params if "params" in params else {"params": params}

    @jax.jit
    def tile_fwd(v, tile):
        return model.apply(v, tile[None])[0]

    def forward(window):
        return tiled_forward(lambda tile: tile_fwd(variables, tile), window,
                             tile_hw=tile_hw, overlap=overlap, scale=scale)

    return forward


def make_batched_tiled_forward(model, params, tile_hw=(576, 1024),
                               overlap: int = 32, scale: int = 1) -> Callable:
    """Single-jit tiled forward: slice, batch, and stitch ON DEVICE.

    The per-tile loop in :func:`tiled_forward` pays one dispatch + one
    host->device tile transfer + one device->host pred transfer per tile
    — through the axon tunnel that is ~25-40 ms of roundtrip per tile on
    top of the compute (4 tiles/frame at 1080p).  Here the whole frame
    is one jit: the tile grid is computed at trace time (shapes are
    static under jit), tiles are gathered with dynamic_slice into one
    batched model call (B = n_tiles fills the MXU better than B=1, see
    the batched bench secondaries), and the valid tile centers are
    stitched with dynamic_update_slice — one dispatch, one transfer.

    Returns a jitted ``window (T, H, W, C) -> (H*scale, W*scale, C)``.
    Output matches :func:`tiled_forward` exactly (same grid, same valid
    regions, same clamped edge tiles).
    """
    variables = params if "params" in params else {"params": params}
    apply = batched_tiled_apply(model, tile_hw=tile_hw, overlap=overlap,
                                scale=scale)
    jitted = jax.jit(apply)
    return lambda window: jitted(variables, window)


def batched_tiled_apply(model, tile_hw=(576, 1024), overlap: int = 32,
                        scale: int = 1) -> Callable:
    """Pure ``(variables, window) -> stitched frame`` for the batched
    tiler — variables stay a function ARGUMENT so enclosing jits (e.g.
    the bench's fori-loop timing wrapper) don't inline the weights as
    constants; a closed-over param tree bloats the lowered MLIR by the
    full weight bytes and overloads the remote compile helper."""
    th0, tw0 = tile_hw

    def forward(variables, window):
        t, h, w, c = window.shape
        th, tw = min(th0, h), min(tw0, w)
        step_h, step_w = th - 2 * overlap, tw - 2 * overlap
        assert step_h > 0 and step_w > 0, "tile too small for overlap"
        ys = list(range(0, max(h - 2 * overlap, 1), step_h))
        xs = list(range(0, max(w - 2 * overlap, 1), step_w))
        origins = [(min(y0, h - th), min(x0, w - tw))
                   for y0 in ys for x0 in xs]
        tiles = jnp.stack([
            jax.lax.dynamic_slice(window, (0, ty, tx, 0), (t, th, tw, c))
            for ty, tx in origins])
        preds = model.apply(variables, tiles)  # (n, th*s, tw*s, c)
        out = jnp.zeros((h * scale, w * scale, c), preds.dtype)
        for i, (ty, tx) in enumerate(origins):
            vy0 = ty + (overlap if ty > 0 else 0)
            vx0 = tx + (overlap if tx > 0 else 0)
            vy1 = ty + th - (overlap if ty + th < h else 0)
            vx1 = tx + tw - (overlap if tx + tw < w else 0)
            out = jax.lax.dynamic_update_slice(
                out,
                preds[i, (vy0 - ty) * scale:(vy1 - ty) * scale,
                      (vx0 - tx) * scale:(vx1 - tx) * scale],
                (vy0 * scale, vx0 * scale, 0))
        return out

    return forward
