"""Pyramid decomposition losses (reference loss.py:160-224)."""
from __future__ import annotations

import jax.numpy as jnp

from realvsr_tpu.losses.basic import charbonnier_loss, huber_loss, l1_loss, l2_loss
from realvsr_tpu.losses.ssim import ssim_loss
from realvsr_tpu.ops.pyramid import gau_pyramid, lap_pyramid, laplacian_pyramid

_BASE = {
    "l1": l1_loss,
    "l2": l2_loss,
    "hb": huber_loss,
    "cb": charbonnier_loss,
}


def pyramid_loss(x, y, num_levels: int = 3, pyr_mode: str = "gau",
                 loss_mode: str = "l1", reduction: str = "mean"):
    """Sum of a base loss over pyramid levels (loss.py:160-192), NHWC."""
    assert pyr_mode in ("gau", "lap")
    base = _BASE[loss_mode]
    pyr = gau_pyramid if pyr_mode == "gau" else lap_pyramid
    px = pyr(x, max_levels=num_levels)
    py = pyr(y, max_levels=num_levels)
    loss = 0.0
    for a, b in zip(px, py):
        loss = loss + base(a, b, reduction=reduction)
    return loss


def lap_pyr_loss(x, y, num_levels: int = 3, lf_mode: str = "ssim",
                 hf_mode: str = "cb", reduction: str = "mean"):
    """LF loss on the pyramid base + HF loss on residual levels
    (loss.py:195-224).  The paper's default Y-channel criterion."""

    def pick(mode):
        if mode == "ssim":
            return lambda a, b, reduction=None: ssim_loss(a, b)
        return lambda a, b, reduction=reduction: _BASE[mode](a, b, reduction=reduction)

    lf = pick(lf_mode)
    hf = pick(hf_mode)
    px = laplacian_pyramid(x, max_levels=num_levels)
    py = laplacian_pyramid(y, max_levels=num_levels)
    loss = lf(px[-1], py[-1])
    for i in range(num_levels - 1):
        loss = loss + hf(px[i], py[i], reduction=reduction)
    return loss
