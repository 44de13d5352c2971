"""Differentiable SSIM / MS-SSIM losses (IQA_pytorch-compatible numerics).

The reference's LapPyrLoss and GAN structure loss use ``IQA_pytorch.SSIM``
(loss.py:7, 202-209): gaussian window 11/sigma1.5, VALID filtering, unit
data range (C1=0.01^2, C2=0.03^2), MATLAB-style automatic average-pool
downsampling ``f = max(1, round(min(H, W)/256))``, and ``as_loss=True``
returning ``1 - mean(ssim)``.  Shapes are static under jit, so ``f`` is a
trace-time constant.
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=4)
def _fspecial_gauss(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g = np.outer(g, g)
    return (g / g.sum()).astype(np.float32)


def _gaussian_filter_valid(x, win):
    c = x.shape[-1]
    rhs = jnp.broadcast_to(jnp.asarray(win, x.dtype)[:, :, None, None],
                           (win.shape[0], win.shape[1], 1, c))
    return jax.lax.conv_general_dilated(
        x, rhs, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)


def _avg_pool(x, f: int):
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, f, f, 1), (1, f, f, 1), "VALID") / (f * f)


def ssim_value(x, y, win_size: int = 11, win_sigma: float = 1.5,
               downsample: bool = True):
    """Per-image SSIM scores, NHWC in [0, 1] → (B,)."""
    if downsample:
        f = max(1, round(min(x.shape[1], x.shape[2]) / 256))
        if f > 1:
            x = _avg_pool(x, f)
            y = _avg_pool(y, f)
    if x.shape[1] < win_size or x.shape[2] < win_size:
        raise ValueError(
            f"ssim: input {x.shape[1]}x{x.shape[2]} smaller than the "
            f"{win_size}-tap window (VALID filtering would be empty; with "
            "the lappyr criterion this needs crops >= 4*11 px)")
    c1 = 0.01**2
    c2 = 0.03**2
    win = _fspecial_gauss(win_size, win_sigma)
    mu1 = _gaussian_filter_valid(x, win)
    mu2 = _gaussian_filter_valid(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1**2, mu2**2, mu1 * mu2
    sigma1_sq = _gaussian_filter_valid(x * x, win) - mu1_sq
    sigma2_sq = _gaussian_filter_valid(y * y, win) - mu2_sq
    sigma12 = _gaussian_filter_valid(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def ssim_loss(x, y, **kwargs):
    """1 - mean SSIM (IQA_pytorch SSIM.forward(as_loss=True))."""
    return 1.0 - jnp.mean(ssim_value(x, y, **kwargs))


_MSSSIM_WEIGHTS = np.array([0.0448, 0.2856, 0.3001, 0.2363, 0.1333],
                           dtype=np.float32)


def ms_ssim_value(x, y, win_size: int = 11, win_sigma: float = 1.5):
    """Multi-scale SSIM (5 scales, standard weights), NHWC in [0, 1]."""
    c2 = 0.03**2
    win = _fspecial_gauss(win_size, win_sigma)
    levels = len(_MSSSIM_WEIGHTS)
    mcs = []
    for i in range(levels):
        if i > 0:
            x = _avg_pool(x, 2)
            y = _avg_pool(y, 2)
        mu1 = _gaussian_filter_valid(x, win)
        mu2 = _gaussian_filter_valid(y, win)
        sigma1_sq = _gaussian_filter_valid(x * x, win) - mu1**2
        sigma2_sq = _gaussian_filter_valid(y * y, win) - mu2**2
        sigma12 = _gaussian_filter_valid(x * y, win) - mu1 * mu2
        cs = jnp.mean((2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2),
                      axis=(1, 2, 3))
        if i == levels - 1:
            c1 = 0.01**2
            lum = jnp.mean((2 * mu1 * mu2 + c1) / (mu1**2 + mu2**2 + c1),
                           axis=(1, 2, 3))
            mcs.append(jnp.maximum(lum * cs, 0.0))
        else:
            mcs.append(jnp.maximum(cs, 0.0))
    mcs_stack = jnp.stack(mcs, axis=0)  # (levels, B)
    w = jnp.asarray(_MSSSIM_WEIGHTS)[:, None]
    return jnp.prod(mcs_stack**w, axis=0)


def ms_ssim_loss(x, y, **kwargs):
    return 1.0 - jnp.mean(ms_ssim_value(x, y, **kwargs))
