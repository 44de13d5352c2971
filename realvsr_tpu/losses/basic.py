"""Pixel losses (pure jnp functions over NHWC tensors).

Numerics mirror the reference ``codes/models/loss.py``: Charbonnier with
eps=1e-6 *inside* the sqrt (loss.py:17-23), Huber with delta=1e-2
(loss.py:26-41), Sobel gradient-weighted L1 (loss.py:54-80), TV (loss.py:
44-51).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _reduce(x, reduction: str):
    return jnp.mean(x) if reduction == "mean" else jnp.sum(x)


def l1_loss(x, y, reduction="mean"):
    return _reduce(jnp.abs(x - y), reduction)


def l2_loss(x, y, reduction="mean"):
    return _reduce((x - y) ** 2, reduction)


def charbonnier_loss(x, y, eps: float = 1e-6, reduction="mean"):
    diff = x - y
    return _reduce(jnp.sqrt(diff * diff + eps), reduction)


def huber_loss(x, y, delta: float = 1e-2, reduction="mean"):
    abs_diff = jnp.abs(x - y)
    q = jnp.minimum(abs_diff, delta)
    l = abs_diff - q
    return _reduce(0.5 * q**2 + delta * l, reduction)


def tv_loss(x):
    """Total variation on NHWC (loss.py:44-51)."""
    return jnp.sum(jnp.abs(x[:, :, :-1, :] - x[:, :, 1:, :])) + jnp.sum(
        jnp.abs(x[:, :-1, :, :] - x[:, 1:, :, :])
    )


_SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
_SOBEL_Y = np.array([[-1, -2, -1], [0, 0, 0], [1, 2, 1]], dtype=np.float32)


def _sobel(x, kernel):
    c = x.shape[-1]
    rhs = jnp.broadcast_to(
        jnp.asarray(kernel, x.dtype)[:, :, None, None], (3, 3, 1, c))
    return jax.lax.conv_general_dilated(
        x, rhs, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def style_loss(x, target):
    """Gram-matrix MSE (loss.py:83-99); target is stop-gradient'd."""
    def gram(v):
        b, h, w_, c = v.shape
        feats = v.transpose(0, 3, 1, 2).reshape(b * c, h * w_)
        return (feats @ feats.T) / (b * c * h * w_)

    return jnp.mean((gram(x) - jax.lax.stop_gradient(gram(target))) ** 2)


def gw_loss(x1, x2, w: float = 4.0, reduction="mean"):
    """Gradient-weighted L1 (loss.py:54-80): (1+w|dIx|)(1+w|dIy|)|x1-x2|."""
    dx = jnp.abs(_sobel(x1, _SOBEL_X) - _sobel(x2, _SOBEL_X))
    dy = jnp.abs(_sobel(x1, _SOBEL_Y) - _sobel(x2, _SOBEL_Y))
    loss = (1 + w * dx) * (1 + w * dy) * jnp.abs(x1 - x2)
    return _reduce(loss, reduction)
