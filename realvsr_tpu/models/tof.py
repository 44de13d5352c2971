"""TOF (TOFlow-style) VSR: SpyNet optical-flow alignment + MSRResNet trunk
(rebuild of ``codes/models/archs/TOF_arch.py``)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from realvsr_tpu.models.common import (BatchNorm2d, Conv2d,
                                       scaled_kaiming_normal)
from realvsr_tpu.models.srresnet import MSRResNet
from realvsr_tpu.ops.warp import flow_warp

Dtype = Any


def _avg_pool2(x):
    """AvgPool2d(2, 2, count_include_pad=False) on even sizes == plain 2x2."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID") / 4.0


def _resize_align_corners_2x(x):
    """Bilinear 2x upsample with align_corners=True (torch convention)."""
    b, h, w, c = x.shape
    oh, ow = h * 2, w * 2

    def axis_weights(n_in, n_out):
        if n_in == 1:
            idx0 = jnp.zeros(n_out, jnp.int32)
            return idx0, idx0, jnp.zeros(n_out, x.dtype)
        pos = jnp.arange(n_out, dtype=jnp.float32) * (n_in - 1) / (n_out - 1)
        i0 = jnp.floor(pos).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, n_in - 1)
        t = (pos - i0).astype(x.dtype)
        return i0, i1, t

    y0, y1, ty = axis_weights(h, oh)
    x0, x1, tx = axis_weights(w, ow)
    top = x[:, y0][:, :, x0] * (1 - ty)[None, :, None, None] * \
        (1 - tx)[None, None, :, None]
    top = top + x[:, y0][:, :, x1] * (1 - ty)[None, :, None, None] * \
        tx[None, None, :, None]
    bot = x[:, y1][:, :, x0] * ty[None, :, None, None] * \
        (1 - tx)[None, None, :, None]
    bot = bot + x[:, y1][:, :, x1] * ty[None, :, None, None] * \
        tx[None, None, :, None]
    return top + bot


class SpyNetBlock(nn.Module):
    """7x7 conv + BN stack predicting a flow refinement (TOF_arch.py:10-37)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        widths = [32, 64, 32, 16]
        init = dict(kernel_init=scaled_kaiming_normal(0.1),
                    bias_init=nn.initializers.zeros)
        for i, wdt in enumerate(widths):
            x = Conv2d(wdt, 7, padding=3, dtype=dt, name=f"conv{i}", **init)(x)
            x = BatchNorm2d(dtype=dt, name=f"bn{i}")(x, train=train)
            x = nn.relu(x)
        return Conv2d(2, 7, padding=3, dtype=dt, name="conv4", **init)(x)


class SpyNet(nn.Module):
    """K-level coarse-to-fine optical flow (TOF_arch.py:40-88).

    Input sizes must be divisible by 2^K.
    """

    K: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, ref, nbr, train: bool = False):
        refs, nbrs = [ref], [nbr]
        for _ in range(self.K):
            refs.insert(0, _avg_pool2(refs[0]))
            nbrs.insert(0, _avg_pool2(nbrs[0]))

        flow = SpyNetBlock(dtype=self.dtype, name="block0")(
            jnp.concatenate([refs[0], nbrs[0]], axis=-1), train=train)

        for i in range(self.K):
            flow_up = _resize_align_corners_2x(flow) * 2.0
            warped = flow_warp(nbrs[i + 1], flow_up)
            refine = SpyNetBlock(dtype=self.dtype, name=f"block{i + 1}")(
                jnp.concatenate([refs[i + 1], warped, flow_up], axis=-1),
                train=train)
            flow = flow_up + refine

        output = flow_warp(nbrs[-1], flow)
        return output, flow


class TOF(nn.Module):
    """SpyNet alignment of each neighbor to the center frame + concat →
    MSRResNet SR trunk (TOF_arch.py:148-189)."""

    nframes: int = 3
    K: int = 3
    in_nc: int = 3
    out_nc: int = 3
    nf: int = 32
    nb: int = 12
    upscale: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, c = x.shape
        assert t == self.nframes
        ref_index = t // 2
        ref = x[:, ref_index]
        spynet = SpyNet(K=self.K, dtype=self.dtype, name="align_arch")
        aligned = []
        for i in range(t):
            if i == ref_index:
                aligned.append(ref)
            else:
                warped, _ = spynet(ref, x[:, i], train=train)
                aligned.append(warped)
        y = jnp.concatenate(aligned, axis=-1)
        return MSRResNet(in_nc=self.nframes * self.in_nc, out_nc=self.out_nc,
                         nf=self.nf, nb=self.nb, upscale=self.upscale,
                         dtype=self.dtype, name="sr_arch")(y, train=train)
