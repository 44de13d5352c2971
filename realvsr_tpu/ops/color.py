"""MATLAB-compatible color-space transforms (JAX + NumPy twins).

Reproduces the numerics of the reference's ``codes/data/util.py:326-416``
(rgb2ycbcr / bgr2ycbcr / ycbcr2rgb / ycbcr2bgr, MATLAB coefficient
conventions) as pure functions over channels-last images.

Float inputs are in [0, 1]; uint8 inputs are in [0, 255] and are rounded on
output, exactly matching the reference's behavior.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# MATLAB ITU-R BT.601 coefficients for the [0,255] range.
_RGB2YCBCR_MAT = np.array(
    [
        [65.481, -37.797, 112.0],
        [128.553, -74.203, -93.786],
        [24.966, 112.0, -18.214],
    ],
    dtype=np.float64,
)
_YCBCR_OFFSET = np.array([16.0, 128.0, 128.0], dtype=np.float64)

# Inverse transform, in MATLAB's ycbcr2rgb parameterization
# (reference data/util.py:388-389).
_YCBCR2RGB_MAT = np.array(
    [
        [0.00456621, 0.00456621, 0.00456621],
        [0.0, -0.00153632, 0.00791071],
        [0.00625893, -0.00318811, 0.0],
    ],
    dtype=np.float64,
)
_YCBCR2RGB_OFFSET = np.array([-222.921, 135.576, -276.836], dtype=np.float64)


def _apply(img, mat, offset, xp):
    """y = img @ mat + offset on the trailing channel axis, 255-range math."""
    in_dtype = img.dtype
    is_uint8 = np.dtype(in_dtype) == np.uint8
    x = img.astype(xp.float32)
    if not is_uint8:
        x = x * 255.0
    y = x @ mat.astype(xp.float32) + offset.astype(xp.float32)
    if is_uint8:
        return xp.clip(xp.round(y), 0, 255).astype(in_dtype)
    return (y / 255.0).astype(in_dtype)


def rgb2ycbcr(img, only_y: bool = False):
    """MATLAB rgb2ycbcr on an (..., 3) RGB image (jnp)."""
    xp = jnp
    if only_y:
        in_dtype = img.dtype
        is_uint8 = np.dtype(in_dtype) == np.uint8
        x = img.astype(xp.float32)
        if not is_uint8:
            x = x * 255.0
        y = x @ jnp.asarray(_RGB2YCBCR_MAT[:, 0] / 255.0, dtype=jnp.float32) + 16.0
        if is_uint8:
            return xp.clip(xp.round(y), 0, 255).astype(in_dtype)
        return (y / 255.0).astype(in_dtype)
    # reference: rlt = matmul(img255, M) / 255 + offset  (data/util.py:342-343)
    return _apply(img, jnp.asarray(_RGB2YCBCR_MAT / 255.0), jnp.asarray(_YCBCR_OFFSET), xp)


def bgr2ycbcr(img, only_y: bool = False):
    """MATLAB-compatible bgr→ycbcr (channel-flipped input)."""
    return rgb2ycbcr(img[..., ::-1], only_y=only_y)


def ycbcr2rgb(img):
    """MATLAB ycbcr2rgb on an (..., 3) YCbCr image (jnp)."""
    return _apply(
        img, jnp.asarray(_YCBCR2RGB_MAT * 255.0), jnp.asarray(_YCBCR2RGB_OFFSET), jnp
    )


def ycbcr2bgr(img):
    return ycbcr2rgb(img)[..., ::-1]


# ---------------------------------------------------------------------------
# NumPy twins (host-side data prep; identical math, no device transfer).
# ---------------------------------------------------------------------------


def rgb2ycbcr_np(img: np.ndarray, only_y: bool = False) -> np.ndarray:
    in_dtype = img.dtype
    x = img.astype(np.float64)
    if in_dtype != np.uint8:
        x = x * 255.0
    if only_y:
        y = x @ (_RGB2YCBCR_MAT[:, 0] / 255.0) + 16.0
    else:
        y = x @ (_RGB2YCBCR_MAT / 255.0) + _YCBCR_OFFSET
    if in_dtype == np.uint8:
        return np.clip(np.round(y), 0, 255).astype(in_dtype)
    return (y / 255.0).astype(in_dtype)


def bgr2ycbcr_np(img: np.ndarray, only_y: bool = False) -> np.ndarray:
    return rgb2ycbcr_np(img[..., ::-1], only_y=only_y)


def ycbcr2rgb_np(img: np.ndarray) -> np.ndarray:
    in_dtype = img.dtype
    x = img.astype(np.float64)
    if in_dtype != np.uint8:
        x = x * 255.0
    y = x @ (_YCBCR2RGB_MAT * 255.0) + _YCBCR2RGB_OFFSET
    if in_dtype == np.uint8:
        return np.clip(np.round(y), 0, 255).astype(in_dtype)
    return (y / 255.0).astype(in_dtype)


def ycbcr2bgr_np(img: np.ndarray) -> np.ndarray:
    return ycbcr2rgb_np(img)[..., ::-1]
