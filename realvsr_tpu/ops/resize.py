"""Resizing ops: torch-convention bilinear and MATLAB-exact bicubic.

TPU-first design: MATLAB ``imresize`` (reference ``codes/data/util.py:510-710``)
is reformulated as two dense separable weight matrices — (out_H, in_H) and
(out_W, in_W) — built host-side at trace time with the symmetric boundary
extension *folded into the matrix*.  The resize itself is then two plain
matmuls that run on the MXU, instead of the reference's per-row gather loops.

``resize_bilinear`` reproduces ``F.interpolate(mode='bilinear',
align_corners=False)`` used throughout EDVR (half-pixel centers, edge clamp),
which is exactly the convention of ``jax.image.resize(method='linear')``.
"""
from __future__ import annotations

import math
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _cubic(x: np.ndarray) -> np.ndarray:
    """MATLAB bicubic kernel, a = -0.5 (data/util.py:511-516)."""
    ax = np.abs(x)
    ax2, ax3 = ax**2, ax**3
    return (1.5 * ax3 - 2.5 * ax2 + 1.0) * (ax <= 1) + (
        -0.5 * ax3 + 2.5 * ax2 - 4.0 * ax + 2.0
    ) * ((ax > 1) & (ax <= 2))


@lru_cache(maxsize=64)
def _matlab_resize_matrix(in_length: int, out_length: int, scale: float,
                          antialiasing: bool = True) -> np.ndarray:
    """Dense (out_length, in_length) MATLAB-bicubic resize matrix.

    Equivalent to the reference's calculate_weights_indices
    (data/util.py:519-571) + symmetric padding, with boundary taps folded
    onto their mirrored source pixels.
    """
    kernel_width = 4.0
    if scale < 1 and antialiasing:
        kernel_width = kernel_width / scale

    x = np.arange(1, out_length + 1, dtype=np.float64)
    u = x / scale + 0.5 * (1 - 1 / scale)
    left = np.floor(u - kernel_width / 2)
    p = int(math.ceil(kernel_width)) + 2

    indices = left[:, None] + np.arange(p, dtype=np.float64)[None, :]
    dist = u[:, None] - indices
    if scale < 1 and antialiasing:
        weights = scale * _cubic(dist * scale)
    else:
        weights = _cubic(dist)
    weights = weights / weights.sum(axis=1, keepdims=True)

    # Trim all-zero edge columns (same rule as the reference).
    zero_cols = (weights == 0).sum(axis=0)
    if not math.isclose(zero_cols[0], 0, rel_tol=1e-6):
        indices, weights = indices[:, 1:], weights[:, 1:]
    if not math.isclose(zero_cols[-1], 0, rel_tol=1e-6):
        indices, weights = indices[:, :-1], weights[:, :-1]

    # Fold symmetric boundary extension into a dense matrix: MATLAB indexes a
    # symmetrically mirrored signal; map each (possibly out-of-range) 1-based
    # tap index to its mirrored in-range 0-based source pixel.
    idx0 = indices.astype(np.int64) - 1  # 0-based, may be <0 or >=in_length
    mirrored = np.where(idx0 < 0, -idx0 - 1, idx0)
    mirrored = np.where(mirrored >= in_length, 2 * in_length - 1 - mirrored, mirrored)
    mat = np.zeros((out_length, in_length), dtype=np.float64)
    rows = np.repeat(np.arange(out_length), weights.shape[1])
    np.add.at(mat, (rows, mirrored.reshape(-1)), weights.reshape(-1))
    return mat.astype(np.float32)


def matlab_imresize(img: jax.Array, scale: float, antialiasing: bool = True) -> jax.Array:
    """MATLAB-exact bicubic imresize on (..., H, W, C) images (MXU matmuls)."""
    h, w = img.shape[-3], img.shape[-2]
    out_h, out_w = math.ceil(h * scale), math.ceil(w * scale)
    mh = jnp.asarray(_matlab_resize_matrix(h, out_h, float(scale), antialiasing))
    mw = jnp.asarray(_matlab_resize_matrix(w, out_w, float(scale), antialiasing))
    dtype = img.dtype
    x = img.astype(jnp.float32)
    x = jnp.einsum("oh,...hwc->...owc", mh, x)
    x = jnp.einsum("ow,...hwc->...hoc", mw, x)
    return x.astype(dtype)


def matlab_imresize_np(img: np.ndarray, scale: float, antialiasing: bool = True) -> np.ndarray:
    """Host-side (numpy) twin of :func:`matlab_imresize`, HWC input."""
    h, w = img.shape[0], img.shape[1]
    out_h, out_w = math.ceil(h * scale), math.ceil(w * scale)
    mh = _matlab_resize_matrix(h, out_h, float(scale), antialiasing)
    mw = _matlab_resize_matrix(w, out_w, float(scale), antialiasing)
    x = img.astype(np.float64)
    x = np.einsum("oh,hwc->owc", mh, x)
    x = np.einsum("ow,hwc->hoc", mw, x)
    return x.astype(img.dtype if img.dtype != np.uint8 else np.float64)


def resize_bilinear(x: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize with half-pixel centers (torch align_corners=False).

    x: (..., H, W, C) → (..., out_h, out_w, C).
    """
    out_shape = x.shape[:-3] + (out_hw[0], out_hw[1]) + x.shape[-1:]
    return jax.image.resize(x, out_shape, method="linear")


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """2x bilinear upsample, torch align_corners=False convention."""
    return resize_bilinear(x, (x.shape[-3] * 2, x.shape[-2] * 2))


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """PixelShuffle with torch channel ordering on NHWC input.

    torch PixelShuffle on NCHW views channels as (C_out, r, r); in NHWC that
    is a reshape to (..., H, W, C_out, r, r) followed by interleaving.
    """
    *lead, h, w, c = x.shape
    c_out = c // (r * r)
    x = x.reshape(*lead, h, w, c_out, r, r)
    # current trailing axes: (H, W, C_out, r_h, r_w) → want (H, r_h, W, r_w, C_out)
    nl = len(lead)
    perm = tuple(range(nl)) + (nl + 0, nl + 3, nl + 1, nl + 4, nl + 2)
    x = jnp.transpose(x, perm)
    return x.reshape(*lead, h * r, w * r, c_out)
