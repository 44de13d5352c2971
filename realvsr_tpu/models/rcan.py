"""RCAN adapted to video by flattening T x C into channels (rebuild of
``codes/models/archs/RCAN_arch.py``)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from realvsr_tpu.models.common import Blocks, Conv2d
from realvsr_tpu.ops.resize import pixel_shuffle

Dtype = Any


class ChannelAttention(nn.Module):
    """Squeeze-excite channel attention (RCAN_arch.py:30-48)."""

    num_feat: int
    squeeze_factor: int = 16
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = jnp.mean(x, axis=(1, 2), keepdims=True)
        y = Conv2d(self.num_feat // self.squeeze_factor, 1, padding=0,
                   dtype=self.dtype, name="conv1")(y)
        y = nn.relu(y)
        y = Conv2d(self.num_feat, 1, padding=0, dtype=self.dtype,
                   name="conv2")(y)
        return x * nn.sigmoid(y)


class RCAB(nn.Module):
    """Residual channel attention block (RCAN_arch.py:51-70)."""

    num_feat: int
    squeeze_factor: int = 16
    res_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv1")(x)
        res = nn.relu(res)
        res = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv2")(res)
        res = ChannelAttention(self.num_feat, self.squeeze_factor,
                               dtype=self.dtype, name="attention")(res)
        return x + res * self.res_scale


class ResidualGroup(nn.Module):
    num_feat: int
    num_block: int
    squeeze_factor: int = 16
    res_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        res = Blocks(RCAB, self.num_block,
                     dict(num_feat=self.num_feat,
                          squeeze_factor=self.squeeze_factor,
                          res_scale=self.res_scale, dtype=self.dtype),
                     name="residual_group")(x)
        res = Conv2d(self.num_feat, 3, dtype=self.dtype, name="conv")(res)
        return x + res


class RCAN(nn.Module):
    num_in_ch: int = 3
    num_out_ch: int = 3
    num_frames: int = 5
    num_feat: int = 64
    num_group: int = 10
    num_block: int = 16
    squeeze_factor: int = 16
    upscale: int = 4
    res_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        if x.ndim == 5:  # (B, T, H, W, C) → (B, H, W, T*C)
            b, t, h, w, c = x.shape
            x = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
        x = Conv2d(self.num_feat, 3, dtype=dt, name="conv_first")(x)
        res = Blocks(ResidualGroup, self.num_group,
                     dict(num_feat=self.num_feat, num_block=self.num_block,
                          squeeze_factor=self.squeeze_factor,
                          res_scale=self.res_scale, dtype=dt),
                     name="body")(x)
        res = Conv2d(self.num_feat, 3, dtype=dt, name="conv_after_body")(res)
        x = x + res
        # Upsample (RCAN_arch.py:8-27)
        s = self.upscale
        if (s & (s - 1)) == 0:
            i = 0
            while s > 1:
                x = Conv2d(4 * self.num_feat, 3, dtype=dt,
                           name=f"upsample_conv{i}")(x)
                x = pixel_shuffle(x, 2)
                s //= 2
                i += 1
        elif s == 3:
            x = Conv2d(9 * self.num_feat, 3, dtype=dt,
                       name="upsample_conv0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise ValueError(f"scale {s} is not supported.")
        return Conv2d(self.num_out_ch, 3, dtype=dt, name="conv_last")(x)
