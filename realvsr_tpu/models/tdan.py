"""TDAN — Temporally Deformable Alignment Network (rebuild of
``codes/models/archs/TDAN_arch.py``).

The per-neighbor alignment loop is batched over frames like EDVR's PCD:
the reference frame is broadcast and all T frames run through the chained
DCNs in one shot.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from realvsr_tpu.models.common import (Blocks, Conv2d, DCNPack,
                                       ResidualBlockNoBN, Upsampler)

Dtype = Any


class Align(nn.Module):
    """4 chained DCNs per neighbor frame → aligned image (TDAN_arch.py:17-72)."""

    channel: int = 3
    nf: int = 64
    nb: int = 5
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, t, h, w, c = x.shape
        dt = self.dtype
        y = x.reshape(b * t, h, w, c)
        out = nn.relu(Conv2d(self.nf, 3, dtype=dt, name="initial_conv")(y))
        # reference quirk: make_layer(ResidualBlock_noBN, nb) uses the
        # default nf=64 regardless of Align's nf (TDAN_arch.py:23) — the
        # reference model only runs with nf=64; reproduced for parity.
        out = Blocks(ResidualBlockNoBN, self.nb, dict(nf=64, dtype=dt),
                     name="residual_layers")(out)
        out = out.reshape(b, t, h, w, self.nf)

        ref_index = t // 2
        ref = out[:, ref_index]
        # batch the per-frame loop (TDAN_arch.py:57-70)
        nbr = out.reshape(b * t, h, w, self.nf)
        ref_b = jnp.broadcast_to(ref[:, None], out.shape).reshape(
            b * t, h, w, self.nf)
        fea = jnp.concatenate([ref_b, nbr], axis=-1)
        fea = Conv2d(self.nf, 3, dtype=dt, name="bottle_neck")(fea)

        dcn = lambda name: DCNPack(self.nf, 3, padding=1,
                                   deformable_groups=self.groups,
                                   extra_offset_mask=True, dtype=dt, name=name)
        off1 = Conv2d(self.nf, 3, dtype=dt, name="offset_conv_1")(fea)
        fea = dcn("deform_conv_1")(fea, off1)
        off2 = Conv2d(self.nf, 3, dtype=dt, name="offset_conv_2")(fea)
        fea = dcn("deform_conv_2")(fea, off2)
        off3 = Conv2d(self.nf, 3, dtype=dt, name="offset_conv_3")(fea)
        fea = dcn("deform_conv_3")(nbr, off3)
        off = Conv2d(self.nf, 3, dtype=dt, name="offset_conv")(fea)
        aligned_fea = dcn("deform_conv")(fea, off)
        im = Conv2d(self.channel, 3, dtype=dt, name="reconstruction")(aligned_fea)
        # concat aligned images over frames into channels (TDAN_arch.py:71)
        return im.reshape(b, t, h, w, self.channel).transpose(
            0, 2, 3, 1, 4).reshape(b, h, w, t * self.channel)


class Trunk(nn.Module):
    """concat aligned frames → resblocks → Upsampler (TDAN_arch.py:75-93)."""

    channel: int = 3
    nframes: int = 5
    scale: int = 4
    nf: int = 64
    nb: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        out = nn.relu(Conv2d(64, 3, dtype=dt, name="feature_extractor")(x))
        out = Blocks(ResidualBlockNoBN, self.nb, dict(nf=64, dtype=dt),
                     name="residual_layers")(out)
        out = Upsampler(self.scale, 64, dtype=dt, name="upsampler")(out)
        return Conv2d(3, 3, use_bias=False, dtype=dt, name="final_conv")(out)


class TDAN(nn.Module):
    channel: int = 3
    nframes: int = 5
    scale: int = 4
    nf: int = 64
    nb_f: int = 5
    nb_b: int = 10
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        aligned = Align(channel=self.channel, nf=self.nf, nb=self.nb_f,
                        groups=self.groups, dtype=self.dtype,
                        name="align")(x, train=train)
        return Trunk(channel=self.channel, nframes=self.nframes,
                     scale=self.scale, nf=self.nf, nb=self.nb_b,
                     dtype=self.dtype, name="trunk")(aligned, train=train)
