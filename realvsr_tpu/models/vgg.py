"""VGG-style discriminators + VGG19 feature extractor (rebuild of
``codes/models/archs/VGG_arch.py``).

The feature extractor reproduces the torchvision VGG19 ``features`` layer
sequence up to the requested index (34 → conv before relu5_4, matching
``define_F``); ImageNet weights are not bundled in this image — load them
with ``load_vgg19_weights`` from a torch state_dict file when a perceptual
loss needs the pretrained network (otherwise the architecture still runs
with random init, which is sufficient for wiring tests).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from realvsr_tpu.models.common import BatchNorm2d, Conv2d

Dtype = Any

# torchvision VGG19 conv plan: (out_channels per conv, 'M' = maxpool)
_VGG19_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512, "M", 512, 512, 512, 512, "M"]

_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _max_pool2(x):
    import jax

    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


class VGGFeatureExtractor(nn.Module):
    """VGG19 ``features[:feature_layer+1]`` slice, ImageNet-normalized input,
    frozen (VGG_arch.py:120-146)."""

    feature_layer: int = 34
    use_bn: bool = False
    use_input_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_input_norm:
            x = (x - _IMAGENET_MEAN.reshape(1, 1, 1, 3)) / _IMAGENET_STD.reshape(
                1, 1, 1, 3)
        # emulate the torchvision features indexing: conv, (bn), relu, pool
        idx = 0
        conv_i = 0
        for item in _VGG19_PLAN:
            if item == "M":
                if idx > self.feature_layer:
                    break
                x = _max_pool2(x)
                idx += 1
                continue
            if idx > self.feature_layer:
                break
            x = Conv2d(item, 3, dtype=self.dtype, name=f"conv{conv_i}")(x)
            conv_i += 1
            idx += 1
            if self.use_bn:
                if idx > self.feature_layer:
                    break
                x = BatchNorm2d(dtype=self.dtype, name=f"bn{conv_i - 1}")(
                    x, train=False)
                idx += 1
            if idx > self.feature_layer:
                break
            x = nn.relu(x)
            idx += 1
        return x


def load_vgg19_weights(params, torch_path: str):
    """Fill VGGFeatureExtractor params from a torchvision vgg19 state_dict
    saved to disk (features.N.weight/bias)."""
    import torch

    sd = torch.load(torch_path, map_location="cpu", weights_only=False)
    # torchvision indices of conv layers in `features`
    tv_idx = []
    i = 0
    for item in _VGG19_PLAN:
        if item == "M":
            i += 1
        else:
            tv_idx.append(i)
            i += 2
    new = dict(params)
    for ci, t_i in enumerate(tv_idx):
        key = f"conv{ci}"
        if key not in new:
            break
        w = sd[f"features.{t_i}.weight"].numpy().transpose(2, 3, 1, 0)
        b = sd[f"features.{t_i}.bias"].numpy()
        new[key] = {"Conv_0": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}
    return new


class Vgg19(nn.Module):
    """3-slice VGG19 feature pyramid (relu1_2, relu2_2, relu3_2) —
    VGG_arch.py:149-184."""

    use_input_norm: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_input_norm:
            x = (x - _IMAGENET_MEAN.reshape(1, 1, 1, 3)) / _IMAGENET_STD.reshape(
                1, 1, 1, 3)
        conv = lambda cout, name: Conv2d(cout, 3, dtype=self.dtype, name=name)
        h = nn.relu(conv(64, "conv0")(x))
        h = nn.relu(conv(64, "conv1")(h))
        h_relu1_2 = h
        h = _max_pool2(h)
        h = nn.relu(conv(128, "conv2")(h))
        h = nn.relu(conv(128, "conv3")(h))
        h_relu2_2 = h
        h = _max_pool2(h)
        h = nn.relu(conv(256, "conv4")(h))
        h = nn.relu(conv(256, "conv5")(h))
        h_relu3_2 = h
        return h_relu1_2, h_relu2_2, h_relu3_2


class _DiscriminatorVGG(nn.Module):
    """Shared body of Discriminator_VGG_128/192 (VGG_arch.py:8-117)."""

    in_nc: int = 3
    nf: int = 64
    feat_hw: int = 4  # 4 for 128-input, 6 for 192-input
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        dt = self.dtype
        lrelu = lambda v: nn.leaky_relu(v, negative_slope=0.2)
        conv3 = lambda cout, bias, name: Conv2d(cout, 3, 1, 1, use_bias=bias,
                                                dtype=dt, name=name)
        conv4 = lambda cout, name: Conv2d(cout, 4, 2, 1, use_bias=False,
                                          dtype=dt, name=name)
        bn = lambda name: BatchNorm2d(dtype=dt, name=name)
        nf = self.nf

        fea = lrelu(conv3(nf, True, "conv0_0")(x))
        fea = lrelu(bn("bn0_1")(conv4(nf, "conv0_1")(fea), train=train))
        for i, mult in enumerate([2, 4, 8, 8], start=1):
            fea = lrelu(bn(f"bn{i}_0")(conv3(nf * mult, False,
                                             f"conv{i}_0")(fea), train=train))
            fea = lrelu(bn(f"bn{i}_1")(conv4(nf * mult,
                                             f"conv{i}_1")(fea), train=train))
        b = fea.shape[0]
        # torch flattens NCHW (C major); transpose to match weight layout
        fea = fea.transpose(0, 3, 1, 2).reshape(b, -1)
        fea = lrelu(nn.Dense(100, dtype=dt, param_dtype=jnp.float32,
                             name="linear1")(fea))
        return nn.Dense(1, dtype=dt, param_dtype=jnp.float32,
                        name="linear2")(fea)


class DiscriminatorVGG128(_DiscriminatorVGG):
    feat_hw: int = 4


class DiscriminatorVGG192(_DiscriminatorVGG):
    feat_hw: int = 6
