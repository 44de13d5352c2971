"""Discriminator zoo (rebuild of ``codes/models/archs/discriminator_arch.py``).

All multiscale variants return a *list* of patch logits; v3/v4 and the
pyramid discriminators consume (or build) pyramid-level lists — the shape
used by the GAN-Split training step.

Parity notes: norm layers are batch-stat BatchNorm (see common.BatchNorm2d);
the reference's GaussianPyramidDiscriminator / ImageGradientPyramid_v1 call
a non-existent ``util.gaussian_pyramid`` (a latent reference bug) — here
they use the actual gaussian pyramid.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from realvsr_tpu.models.common import BatchNorm2d, Conv2d, orthogonal_hwio
from realvsr_tpu.ops.pyramid import gau_pyramid, laplacian_pyramid

Dtype = Any


def _lrelu2(x):
    return nn.leaky_relu(x, negative_slope=0.2)


class SimpleBlock(nn.Module):
    """conv-lrelu (+ conv-BN-lrelu)* + conv, orthogonal init
    (discriminator_arch.py:13-40)."""

    depth: int = 3
    n_channels: int = 64
    out_nc: int = 64
    kernel_size: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        conv = lambda cout, name: Conv2d(
            cout, self.kernel_size, kernel_init=orthogonal_hwio,
            bias_init=nn.initializers.zeros, dtype=self.dtype, name=name)
        x = _lrelu2(conv(self.n_channels, "conv0")(x))
        for i in range(self.depth - 2):
            x = conv(self.n_channels, f"conv{i + 1}")(x)
            x = BatchNorm2d(dtype=self.dtype, name=f"bn{i + 1}")(x, train=train)
            x = _lrelu2(x)
        return conv(self.out_nc, f"conv{self.depth - 1}")(x)


class PatchDiscriminator(nn.Module):
    """5x5 PatchGAN with stride-2 downsampling blocks
    (discriminator_arch.py:43-92)."""

    input_nc: int = 3
    ndf: int = 64
    n_block: int = 2
    kw: int = 5
    padw: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        conv = lambda cout, stride, name: Conv2d(
            cout, self.kw, stride, self.padw, dtype=dt, name=name)
        bn = lambda name: BatchNorm2d(dtype=dt, name=name)
        x = _lrelu2(conv(self.ndf, 1, "conv0")(x))
        nf_mult = 1
        li = 1
        for n in range(self.n_block):
            nf_mult = min(2**n, 8)
            x = _lrelu2(bn(f"bn{li}")(conv(self.ndf * nf_mult, 2,
                                           f"conv{li}")(x), train=train)); li += 1
            x = _lrelu2(bn(f"bn{li}")(conv(self.ndf * nf_mult, 1,
                                           f"conv{li}")(x), train=train)); li += 1
        nf_mult = min(2**self.n_block, 8)
        x = _lrelu2(bn(f"bn{li}")(conv(self.ndf * nf_mult, 1,
                                       f"conv{li}")(x), train=train)); li += 1
        x = _lrelu2(bn(f"bn{li}")(conv(self.ndf * nf_mult, 1,
                                       f"conv{li}")(x), train=train)); li += 1
        return Conv2d(1, self.kw, 1, self.padw, dtype=dt, name="conv_out")(x)


class PixelDiscriminator(nn.Module):
    """Stride-1 variant (discriminator_arch.py:95-144)."""

    input_nc: int = 3
    ndf: int = 64
    n_block: int = 2
    kw: int = 5
    padw: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        conv = lambda cout, name: Conv2d(cout, self.kw, 1, self.padw,
                                         dtype=dt, name=name)
        bn = lambda name: BatchNorm2d(dtype=dt, name=name)
        x = _lrelu2(conv(self.ndf, "conv0")(x))
        li = 1
        nf_mult = 1
        for n in range(self.n_block):
            nf_mult = min(2**n, 8)
            x = _lrelu2(bn(f"bn{li}")(conv(self.ndf * nf_mult,
                                           f"conv{li}")(x), train=train)); li += 1
            x = _lrelu2(bn(f"bn{li}")(conv(self.ndf * nf_mult,
                                           f"conv{li}")(x), train=train)); li += 1
        nf_mult = min(2**self.n_block, 8)
        x = _lrelu2(bn(f"bn{li}")(conv(self.ndf * nf_mult,
                                       f"conv{li}")(x), train=train)); li += 1
        x = _lrelu2(bn(f"bn{li}")(conv(self.ndf * nf_mult,
                                       f"conv{li}")(x), train=train)); li += 1
        return Conv2d(1, self.kw, 1, self.padw, dtype=dt, name="conv_out")(x)


class UNetDiscriminator(nn.Module):
    """U-Net discriminator (discriminator_arch.py:147-192)."""

    in_nc: int = 3
    nf: int = 64
    depth: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        nf = self.nf
        sb = lambda ch, out, name: SimpleBlock(depth=self.depth, n_channels=ch,
                                               out_nc=out, dtype=dt, name=name)
        x_s1 = sb(nf, nf, "conv_block_s1")(x, train=train)
        x_s2 = Conv2d(2 * nf, 3, 2, dtype=dt, name="pool1")(x_s1)
        x_s2 = sb(2 * nf, 2 * nf, "conv_block_s2")(x_s2, train=train)
        x_s3 = Conv2d(4 * nf, 3, 2, dtype=dt, name="pool2")(x_s2)
        x_s3 = sb(4 * nf, 4 * nf, "conv_block_s3")(x_s3, train=train)

        out = nn.ConvTranspose(2 * nf, (2, 2), (2, 2), padding="VALID",
                               dtype=dt, param_dtype=jnp.float32,
                               name="up1")(x_s3)
        out = jnp.concatenate([out, x_s2], axis=-1)
        out = sb(2 * nf, 2 * nf, "conv_block_s4")(out, train=train)
        out = nn.ConvTranspose(nf, (2, 2), (2, 2), padding="VALID", dtype=dt,
                               param_dtype=jnp.float32, name="up2")(out)
        out = jnp.concatenate([out, x_s1], axis=-1)
        return sb(nf, 1, "conv_block_s5")(out, train=train)


def _avg_pool_3x3_s2_nopad_count(x):
    """AvgPool2d(3, 2, padding=1, count_include_pad=False)."""
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    n = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 2, 2, 1),
                              [(0, 0), (1, 1), (1, 1), (0, 0)])
    return s / n


class _MultiscaleBase(nn.Module):
    input_nc: int = 3
    ndf: int = 64
    n_block: int = 3
    num_D: int = 3
    gan_type: str = "patch"
    dtype: Dtype = jnp.float32

    def _make_d(self, n_block, name):
        cls = PatchDiscriminator if self.gan_type == "patch" else PixelDiscriminator
        return cls(input_nc=self.input_nc, ndf=self.ndf, n_block=n_block,
                   dtype=self.dtype, name=name)


class MultiscaleDiscriminatorV1(_MultiscaleBase):
    """Different-arch Ds, all on the same input (arch:195-219)."""

    @nn.compact
    def __call__(self, x, train: bool = True):
        outs = []
        for i in range(self.num_D):
            d_idx = self.num_D - 1 - i
            d = self._make_d(self.n_block - d_idx, f"D_{d_idx}")
            outs.append(d(x, train=train))
        return outs


class MultiscaleDiscriminatorV2(_MultiscaleBase):
    """Same-arch Ds on a downsampling cascade (arch:222-250)."""

    n_block: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        outs = []
        cur = x
        for i in range(self.num_D):
            d = self._make_d(self.n_block, f"D_{self.num_D - 1 - i}")
            outs.append(d(cur, train=train))
            if i != self.num_D - 1:
                cur = _avg_pool_3x3_s2_nopad_count(cur)
        return outs


class MultiscaleDiscriminatorV3(_MultiscaleBase):
    """Different-arch Ds over a provided list of pyramid levels (arch:253-278)."""

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        assert len(inputs) == self.num_D
        outs = []
        for i in range(self.num_D):
            d_idx = self.num_D - 1 - i
            d = self._make_d(self.n_block - d_idx, f"D_{d_idx}")
            outs.append(d(inputs[i], train=train))
        return outs


class MultiscaleDiscriminatorV4(_MultiscaleBase):
    """Same-arch Ds over a provided list of pyramid levels (arch:281-305)."""

    n_block: int = 2

    @nn.compact
    def __call__(self, inputs, train: bool = True):
        assert len(inputs) == self.num_D
        outs = []
        for i in range(self.num_D):
            d = self._make_d(self.n_block, f"D_{self.num_D - 1 - i}")
            outs.append(d(inputs[i], train=train))
        return outs


class LaplacePyramidDiscriminator(_MultiscaleBase):
    """Builds the laplacian pyramid internally (arch:308-339)."""

    n_block: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        pyr = laplacian_pyramid(x, max_levels=self.num_D)
        outs = []
        for i in range(self.num_D):
            d = self._make_d(self.n_block, f"D_{self.num_D - 1 - i}")
            outs.append(d(pyr[i], train=train))
        return outs


class GaussianPyramidDiscriminator(_MultiscaleBase):
    """Gaussian-pyramid variant (arch:342-373)."""

    n_block: int = 2

    @nn.compact
    def __call__(self, x, train: bool = True):
        pyr = gau_pyramid(x, max_levels=self.num_D)
        outs = []
        for i in range(self.num_D):
            d = self._make_d(self.n_block, f"D_{self.num_D - 1 - i}")
            outs.append(d(pyr[i], train=train))
        return outs


class ImageGradientPyramidDiscriminatorV1(_MultiscaleBase):
    """cat(gaussian, laplacian) per level (arch:376-412); Ds take 2x channels."""

    n_block: int = 2

    def _make_d(self, n_block, name):
        cls = PatchDiscriminator if self.gan_type == "patch" else PixelDiscriminator
        return cls(input_nc=self.input_nc * 2, ndf=self.ndf, n_block=n_block,
                   dtype=self.dtype, name=name)

    @nn.compact
    def __call__(self, x, train: bool = True):
        gau = gau_pyramid(x, max_levels=self.num_D)
        lap = laplacian_pyramid(x, max_levels=self.num_D)
        outs = []
        for i in range(self.num_D):
            d = self._make_d(self.n_block, f"D_{self.num_D - 1 - i}")
            outs.append(d(jnp.concatenate([gau[i], lap[i]], axis=-1),
                          train=train))
        return outs


class ImageGradientPyramidDiscriminatorV2(ImageGradientPyramidDiscriminatorV1):
    """Takes precomputed (gau_pyr, lap_pyr) lists (arch:415-438)."""

    @nn.compact
    def __call__(self, gau_pyr, lap_pyr, train: bool = True):
        assert len(gau_pyr) == self.num_D and len(lap_pyr) == self.num_D
        outs = []
        for i in range(self.num_D):
            d = self._make_d(self.n_block, f"D_{self.num_D - 1 - i}")
            outs.append(d(jnp.concatenate([gau_pyr[i], lap_pyr[i]], axis=-1),
                          train=train))
        return outs
