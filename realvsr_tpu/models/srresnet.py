"""MSRResNet (rebuild of ``codes/models/archs/SRResNet_arch.py`` and the
multi-frame variant in ``TOF_arch.py:91-145``)."""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from realvsr_tpu.models.common import (Blocks, Conv2d, ResidualBlockNoBN,
                                       lrelu, scaled_kaiming_normal)
from realvsr_tpu.ops.resize import pixel_shuffle, resize_bilinear

Dtype = Any


class MSRResNet(nn.Module):
    """conv_first → residual trunk → pixel-shuffle ×scale → + bilinear base.

    For multi-frame input (C > 3 after frame-flattening) the bilinear base
    is the center frame's 3 channels (TOF_arch.py:126-131).
    """

    in_nc: int = 3
    out_nc: int = 3
    nf: int = 64
    nb: int = 16
    upscale: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        dt = self.dtype
        c = x.shape[-1]
        if c > 3:
            x_base = x[..., c // 2 - 1: c // 2 + 2]
        else:
            x_base = x

        # 0.1-scaled init only applies for upscale 2/3/4 (TOF_arch.py:119-124);
        # the x1 restoration variant keeps torch-default init
        if self.upscale in (2, 3, 4):
            init01 = dict(kernel_init=scaled_kaiming_normal(0.1),
                          bias_init=nn.initializers.zeros)
        else:
            init01 = {}
        fea = lrelu(Conv2d(self.nf, 3, dtype=dt, name="conv_first", **init01)(x))
        out = Blocks(ResidualBlockNoBN, self.nb, dict(nf=self.nf, dtype=dt),
                     name="recon_trunk")(fea)

        if self.upscale == 4:
            out = lrelu(pixel_shuffle(
                Conv2d(self.nf * 4, 3, dtype=dt, name="upconv1", **init01)(out), 2))
            out = lrelu(pixel_shuffle(
                Conv2d(self.nf * 4, 3, dtype=dt, name="upconv2", **init01)(out), 2))
        elif self.upscale in (2, 3):
            r = self.upscale
            out = lrelu(pixel_shuffle(
                Conv2d(self.nf * r * r, 3, dtype=dt, name="upconv1", **init01)(out), r))

        out = lrelu(Conv2d(self.nf, 3, dtype=dt, name="HRconv", **init01)(out))
        out = Conv2d(self.out_nc, 3, dtype=dt, name="conv_last", **init01)(out)
        base = resize_bilinear(x_base, (x_base.shape[-3] * self.upscale,
                                        x_base.shape[-2] * self.upscale))
        return out + base
