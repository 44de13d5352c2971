"""FSTRN — Fast Spatio-Temporal Residual Network (rebuild of
``codes/models/archs/FSTRN_arch.py``): factorized 3D convolutions over
(T, H, W) video volumes, NDHWC layout."""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from realvsr_tpu.models.common import PReLU, torch_default_init

Dtype = Any


class Conv3d(nn.Module):
    """3D conv over (B, T, H, W, C) with torch-default init."""

    features: int
    kernel_size: tuple[int, int, int]
    padding: tuple[int, int, int]
    strides: tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kt, kh, kw = self.kernel_size
        fan_in = kt * kh * kw * cin
        bound = 1.0 / math.sqrt(fan_in)

        def kinit(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=tuple((p, p) for p in self.padding),
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=kinit,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class FRB(nn.Module):
    """Fast residual block: PReLU → (1,k,k) conv → (k,1,1) conv + skip
    (FSTRN_arch.py:11-22)."""

    k: int = 3
    nf: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = PReLU(name="prelu")(x)
        out = Conv3d(self.nf, (1, self.k, self.k), (0, 1, 1),
                     dtype=self.dtype, name="conv3d_1")(out)
        out = Conv3d(self.nf, (self.k, 1, 1), (1, 0, 0),
                     dtype=self.dtype, name="conv3d_2")(out)
        return x + out


class FSTRN(nn.Module):
    """LFENet → 5 FRBs → LSRNet with ConvTranspose3d upscale + trilinear
    cross-space residual; returns the center frame (FSTRN_arch.py:25-69)."""

    k: int = 3
    nf: int = 64
    scale: int = 4
    nframes: int = 5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, T, H, W, C)
        b, t, h, w, c = x.shape
        dt = self.dtype
        center = self.nframes // 2
        cs_res = x

        out = Conv3d(self.nf, (self.k,) * 3, (1, 1, 1), dtype=dt,
                     name="conv3d_fe")(x)
        lr_res = out
        for i in range(1, 6):
            out = FRB(k=self.k, nf=self.nf, dtype=dt, name=f"frb_{i}")(out)
        out = lr_res + out

        out = PReLU(name="prelu")(out)
        out = nn.Dropout(rate=0.3, deterministic=not train)(out)
        out = Conv3d(self.nf, (self.k,) * 3, (1, 1, 1), dtype=dt,
                     name="conv3d_1")(out)
        # ConvTranspose3d(nf, nf, (1, s, s), stride (1, s, s))
        s = self.scale
        cin = out.shape[-1]
        fan_in = 1 * s * s * cin  # torch convT fan_in uses in_channels * k
        bound = 1.0 / math.sqrt(fan_in)
        out = nn.ConvTranspose(
            features=self.nf, kernel_size=(1, s, s), strides=(1, s, s),
            padding="VALID",
            kernel_init=lambda k_, sh, d=jnp.float32: jax.random.uniform(
                k_, sh, d, -bound, bound),
            bias_init=lambda k_, sh, d=jnp.float32: jax.random.uniform(
                k_, sh, d, -bound, bound),
            dtype=dt, param_dtype=jnp.float32, name="upsample")(out)
        out = Conv3d(3, (self.k,) * 3, (1, 1, 1), dtype=dt,
                     name="conv3d_2")(out)

        # trilinear cross-space residual: scale (1, s, s), align_corners=False
        cs_out = jax.image.resize(
            cs_res, (b, t, h * s, w * s, c), method="linear")
        out = cs_out + out
        return out[:, center]
