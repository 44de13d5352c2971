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
