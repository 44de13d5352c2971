"""Gaussian / Laplacian image pyramids (NHWC, jit-friendly).

Numerics mirror the reference's decomposition toolkit
(``codes/utils/util.py:491-554``): fixed 5x5 binomial kernel /256, reflect
padding, decimation by ``x[:, ::2, ::2]``, and zero-stuffed upsampling
filtered with a 4x kernel.  Layout is NHWC (TPU-native); the depthwise blur
is a feature-group ``lax.conv_general_dilated``, which XLA fuses well.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_BINOMIAL_5 = np.array(
    [
        [1.0, 4.0, 6.0, 4.0, 1.0],
        [4.0, 16.0, 24.0, 16.0, 4.0],
        [6.0, 24.0, 36.0, 24.0, 6.0],
        [4.0, 16.0, 24.0, 16.0, 4.0],
        [1.0, 4.0, 6.0, 4.0, 1.0],
    ],
    dtype=np.float64,
) / 256.0


def gauss_kernel(dtype=jnp.float32) -> jax.Array:
    """The fixed 5x5 binomial kernel (utils/util.py:491-500), shape (5, 5)."""
    return jnp.asarray(_BINOMIAL_5, dtype=dtype)


def conv_gauss(x: jax.Array, kernel: jax.Array | None = None) -> jax.Array:
    """Depthwise 5x5 blur with reflect padding on NHWC input.

    Matches reference ``conv_gauss`` (utils/util.py:503-506): F.pad(reflect)
    followed by a grouped conv with groups == channels.
    """
    if kernel is None:
        kernel = gauss_kernel(x.dtype)
    c = x.shape[-1]
    x_pad = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)), mode="reflect")
    # depthwise: rhs (H, W, 1, C) with feature_group_count=C
    rhs = jnp.broadcast_to(kernel[:, :, None, None], (5, 5, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x_pad,
        rhs,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def downsample(x: jax.Array) -> jax.Array:
    """Decimate by 2 (utils/util.py:509-510)."""
    return x[:, ::2, ::2, :]


def upsample(x: jax.Array) -> jax.Array:
    """Zero-stuff 2x then blur with 4x kernel (utils/util.py:513-516)."""
    b, h, w, c = x.shape
    x_up = jnp.zeros((b, h * 2, w * 2, c), dtype=x.dtype)
    x_up = x_up.at[:, ::2, ::2, :].set(x)
    return conv_gauss(x_up, 4.0 * gauss_kernel(x.dtype))


def lap_pyramid(img: jax.Array, max_levels: int = 3) -> list[jax.Array]:
    """Laplacian pyramid, high-freq residuals only (utils/util.py:519-529)."""
    current = img
    pyr = []
    for _ in range(max_levels):
        filtered = conv_gauss(current)
        down = downsample(filtered)
        up = upsample(down)
        pyr.append(current - up)
        current = down
    return pyr


def gau_pyramid(img: jax.Array, max_levels: int = 3) -> list[jax.Array]:
    """Gaussian pyramid incl. the input itself (utils/util.py:532-539)."""
    current = img
    pyr = [current]
    for _ in range(max_levels - 1):
        current = downsample(conv_gauss(current))
        pyr.append(current)
    return pyr


def laplacian_pyramid(img: jax.Array, max_levels: int = 3) -> list[jax.Array]:
    """Laplacian pyramid whose last level is the low-frequency base
    (utils/util.py:542-554) — the decomposition used by LapPyrLoss and the
    pyramid GAN discriminators."""
    assert max_levels > 1
    current = img
    pyr = []
    for _ in range(max_levels - 1):
        filtered = conv_gauss(current)
        down = downsample(filtered)
        up = upsample(down)
        pyr.append(current - up)
        current = down
    pyr.append(current)
    return pyr
