"""Shared architecture blocks (flax.linen, NHWC).

Rebuilds the reference's ``codes/models/archs/arch_util.py`` building blocks
and the DCN "Pack" module wrappers (``dcn/deform_conv.py:160-292``) as pure
functional flax modules.  Initializers reproduce torch semantics so that
training dynamics match:

  * torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))
    for both kernel and bias,
  * reference residual blocks: kaiming_normal(fan_in) scaled by 0.1, zero
    bias (arch_util.py:8-25),
  * DCN offset/mask convs: zero-init (deform_conv.py:270-272).
"""
from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from realvsr_tpu.ops.deform_conv import deform_conv, modulated_deform_conv

Dtype = Any


def torch_default_init(key, shape, dtype=jnp.float32):
    """U(±1/sqrt(fan_in)) for HWIO kernels — torch Conv2d default."""
    fan_in = shape[0] * shape[1] * shape[2]
    bound = 1.0 / math.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def scaled_kaiming_normal(scale: float = 1.0):
    """kaiming_normal(a=0, fan_in) * scale (arch_util.initialize_weights)."""

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] * shape[1] * shape[2]
        std = math.sqrt(2.0 / fan_in)
        return jax.random.normal(key, shape, dtype) * std * scale

    return init


# --- optional Pallas fast path for the hot 3x3 convs -----------------
# set_conv3x3_impl("pallas") routes packed-chain Conv2d calls through
# ops/pallas/conv3x3_kernel.conv3x3_packed (inference fast path); "xla"
# (default) keeps the stock lax.conv emitter everywhere.
_CONV3X3_IMPL = {"mode": "xla"}


def set_conv3x3_impl(mode: str) -> None:
    assert mode in ("xla", "pallas", "pallas_interpret")
    _CONV3X3_IMPL["mode"] = mode


def conv3x3_fast_enabled() -> bool:
    return _CONV3X3_IMPL["mode"].startswith("pallas")


# --- DCN rematerialization default -----------------------------------
# DCNPack.remat=None reads this process-wide default.  True recomputes
# the DCN forward inside its backward (smallest memory; matches the
# reference CUDA backward's im2col recompute).  False saves the custom-
# VJP residuals instead — at 192^2-crop training shapes this removes the
# L1 forward-recompute kernels from the backward (PERF_NOTES round 5).
_DCN_REMAT = {"default": True}


def set_dcn_remat(value: bool) -> None:
    _DCN_REMAT["default"] = bool(value)


def dcn_remat_default() -> bool:
    return _DCN_REMAT["default"]


class _ConvParams(nn.Module):
    """Declares kernel/bias with nn.Conv's exact names/shapes/inits so the
    Pallas path shares one param tree (and checkpoints) with the XLA path."""

    kshape: tuple
    features: int
    use_bias: bool
    kernel_init: Callable
    bias_init: Callable

    @nn.compact
    def __call__(self):
        k = self.param("kernel", self.kernel_init, self.kshape, jnp.float32)
        b = (self.param("bias", self.bias_init, (self.features,),
                        jnp.float32) if self.use_bias else None)
        return k, b


class Conv2d(nn.Module):
    """Conv with torch-default init and explicit symmetric padding.

    Mirrors nn.Conv2d(cin, cout, k, stride, padding) in NHWC.

    packed_io=True runs the Pallas pair-packed 3x3 kernel
    (ops/pallas/conv3x3_kernel.py) on (B, H, W/2, 2cin) inputs with
    optionally fused activation (`fused_act`) and residual add (the
    ``residual`` call argument) — only valid when the caller packed the
    chain and set_conv3x3_impl("pallas") is active.
    """

    features: int
    kernel_size: int | tuple[int, int] = 3
    stride: int = 1
    padding: int | None = None  # None → same as k//2 when odd
    use_bias: bool = True
    kernel_init: Callable = torch_default_init
    bias_init: Callable | None = None
    feature_group_count: int = 1
    dtype: Dtype = jnp.float32
    packed_io: bool = False
    fused_act: str | None = None
    # input is a channel-concat of separately pair-packed tensors with
    # these channel counts (PCD offset chains); None = standard packed
    packed_splits: tuple[int, ...] | None = None

    @nn.compact
    def __call__(self, x, residual=None):
        k = (self.kernel_size, self.kernel_size) if isinstance(
            self.kernel_size, int) else self.kernel_size
        pad = self.padding if self.padding is not None else k[0] // 2
        if self.packed_io:
            from realvsr_tpu.ops.pallas.conv3x3_kernel import conv3x3_packed

            assert k == (3, 3) and self.stride == 1 and pad == 1
            assert self.feature_group_count == 1
            cin = x.shape[-1] // 2
            fan_in = 9 * cin
            kernel, bias = _ConvParams(
                (3, 3, cin, self.features), self.features, self.use_bias,
                self.kernel_init, self.bias_init or torch_bias_init(fan_in),
                name="Conv_0")()
            return conv3x3_packed(
                x, kernel.astype(self.dtype),
                None if bias is None else bias.astype(self.dtype),
                h=x.shape[1], act=self.fused_act, residual=residual,
                splits=self.packed_splits,
                interpret=_CONV3X3_IMPL["mode"] == "pallas_interpret")
        cin = x.shape[-1]
        fan_in = k[0] * k[1] * (cin // self.feature_group_count)
        bias_init = self.bias_init or torch_bias_init(fan_in)
        out = nn.Conv(
            features=self.features,
            kernel_size=k,
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.use_bias,
            kernel_init=self.kernel_init,
            bias_init=bias_init,
            feature_group_count=self.feature_group_count,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)
        if self.fused_act == "relu":
            out = nn.relu(out)
        elif self.fused_act == "lrelu":
            out = lrelu(out)
        if residual is not None:
            out = out + residual
        return out


def lrelu(x, slope: float = 0.1):
    """LeakyReLU(0.1) — the activation used across the reference archs."""
    return nn.leaky_relu(x, negative_slope=slope)


class FrameSumConv1x1(nn.Module):
    """1x1 conv over frame-concatenated channels, computed as a sum of
    per-frame matmuls: out = sum_n x[:, n] @ W_n + b.

    Mathematically identical to transpose(B,N,H,W,C)->(B,H,W,N*C) +
    Conv2d(features, 1) (the EDVR woTSA fusion, EDVR_arch.py:344-353) and
    shares that conv's exact param tree (Conv_0/kernel (1,1,N*C,features)),
    but skips the N->lanes relayout the transpose costs on TPU (a
    profiler-attributed ~1.7 ms copy + ~3.7 ms conv fusion per 1024x512
    frame vs ~1 ms of plain MXU matmuls, PERF_NOTES round 5)."""

    features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, h, w, c = x.shape
        fan_in = n * c
        kernel, bias = _ConvParams(
            (1, 1, n * c, self.features), self.features, True,
            torch_default_init, torch_bias_init(fan_in), name="Conv_0")()
        k = kernel.reshape(n, c, self.features).astype(self.dtype)
        acc = None
        for i in range(n):
            t = jax.lax.dot_general(
                x[:, i].reshape(b * h * w, c), k[i],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = t if acc is None else acc + t
        out = acc.astype(self.dtype) + bias.astype(self.dtype)
        return out.reshape(b, h, w, self.features)


class ResidualBlockNoBN(nn.Module):
    """Conv-ReLU-Conv + identity (arch_util.py:121-139), 0.1-scaled init.

    With packed_io=True the block operates on the pair-packed layout and
    fuses relu + the identity add into the Pallas conv epilogues."""

    nf: int = 64
    dtype: Dtype = jnp.float32
    packed_io: bool = False

    @nn.compact
    def __call__(self, x):
        out = Conv2d(self.nf, 3, kernel_init=scaled_kaiming_normal(0.1),
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     packed_io=self.packed_io,
                     fused_act="relu" if self.packed_io else None,
                     name="conv1")(x)
        if not self.packed_io:
            out = nn.relu(out)
        out = Conv2d(self.nf, 3, kernel_init=scaled_kaiming_normal(0.1),
                     bias_init=nn.initializers.zeros, dtype=self.dtype,
                     packed_io=self.packed_io,
                     name="conv2")(out, residual=x if self.packed_io else None)
        if self.packed_io:
            return out
        return x + out


class ResBlock(nn.Module):
    """EDSR-style residual block (arch_util.py:97-118), default torch init."""

    n_feats: int
    kernel_size: int = 3
    res_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out = Conv2d(self.n_feats, self.kernel_size, dtype=self.dtype)(x)
        out = nn.relu(out)
        out = Conv2d(self.n_feats, self.kernel_size, dtype=self.dtype)(out)
        return x + out * self.res_scale


def make_layer(block_cls, n: int, **kwargs) -> Sequence[nn.Module]:
    """Stack n identical blocks (arch_util.py:28-39)."""
    return [block_cls(**kwargs, name=f"block{i}") for i in range(n)]


class Blocks(nn.Module):
    """Sequential stack of residual blocks.

    ``final_kwargs`` overrides block kwargs for the LAST block only (used
    to make a packed chain's final conv emit plain NHWC)."""

    block: Callable[..., nn.Module]
    num: int
    block_kwargs: dict
    final_kwargs: dict | None = None

    @nn.compact
    def __call__(self, x):
        for i in range(self.num):
            kw = dict(self.block_kwargs)
            if self.final_kwargs and i == self.num - 1:
                kw.update(self.final_kwargs)
            x = self.block(**kw, name=f"block{i}")(x)
        return x


class DCNPack(nn.Module):
    """ModulatedDeformConvPack (dcn/deform_conv.py:257-292), NHWC.

    ``extra_offset_mask=True`` predicts offsets/masks from a separate
    feature tensor (call with (x, offset_features)) — the PCD-align mode.
    The offset/mask conv is zero-initialized; the main kernel uses
    U(±1/sqrt(cin*kh*kw)) with zero bias, matching reset_parameters.
    """

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 1
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 8
    extra_offset_mask: bool = True
    remat: bool | None = None  # recompute the DCN in backward (its
    # internals — im2col columns / per-tap gathers — dominate training
    # memory otherwise; the reference CUDA backward also recomputes
    # im2col).  None reads the process default (set_dcn_remat).
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset_feat=None):
        if self.extra_offset_mask:
            assert offset_feat is not None
            src = offset_feat
        else:
            src = x
        k2 = self.kernel_size * self.kernel_size
        out = Conv2d(
            self.deformable_groups * 3 * k2, self.kernel_size, self.stride,
            self.padding, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, dtype=self.dtype,
            name="conv_offset_mask")(src)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(mask)
        # observability for the ±R block-path clamp validation: collect with
        # apply(..., capture_intermediates) / mutable=["intermediates"]
        self.sow("intermediates", "dcn_offset", offset)

        cin = x.shape[-1]
        weight = self.param(
            "weight",
            lambda key, shape: torch_default_init(key, shape),
            (self.kernel_size, self.kernel_size, cin // self.groups, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))

        def dcn(x_, offset_, mask_, weight_, bias_):
            return modulated_deform_conv(
                x_, offset_, mask_, weight_, bias_, self.stride, self.padding,
                self.dilation, self.groups, self.deformable_groups,
                compute_dtype=self.dtype,
            )

        remat = (_DCN_REMAT["default"] if self.remat is None
                 else self.remat)
        if remat:
            dcn = jax.checkpoint(dcn)
        return dcn(x, offset, mask, weight, bias)


class DeformConvModule(nn.Module):
    """Unmodulated DeformConv (dcn/deform_conv.py:160-196): external offsets."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    padding: int = 0
    dilation: int = 1
    groups: int = 1
    deformable_groups: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, offset):
        cin = x.shape[-1]
        weight = self.param(
            "weight",
            lambda key, shape: torch_default_init(key, shape),
            (self.kernel_size, self.kernel_size, cin // self.groups, self.features),
        )
        return deform_conv(
            x, offset, weight, self.stride, self.padding, self.dilation,
            self.groups, self.deformable_groups,
        )


def orthogonal_hwio(key, shape, dtype=jnp.float32):
    """torch init.orthogonal_ on an OIHW view, returned as HWIO
    (discriminator SimpleBlock init, discriminator_arch.py:33-37)."""
    kh, kw, cin, cout = shape
    flat = jax.nn.initializers.orthogonal()(key, (cout, cin * kh * kw), dtype)
    return flat.reshape(cout, cin, kh, kw).transpose(2, 3, 1, 0)


class BatchNorm2d(nn.Module):
    """torch-semantics BatchNorm2d with running statistics.

    Train mode normalizes with the current batch's (biased) statistics and
    updates the ``batch_stats`` collection with torch's rule
    ``running = (1 - momentum) * running + momentum * batch`` using the
    *unbiased* variance (torch nn.BatchNorm2d default momentum=0.1); eval
    mode (``train=False``) normalizes with the running averages — so
    reference-trained SpyNet/discriminator weights reproduce eval behavior
    (TOF_arch.py:18-27, discriminator_arch.py:13-40).

    Running stats are written only when the ``batch_stats`` collection is
    mutable (i.e. ``apply(..., mutable=["batch_stats"])``); plain applies
    in train mode still normalize with batch statistics.
    """

    eps: float = 1e-5
    momentum: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if train:
            xf = x.astype(jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.var(xf, axis=(0, 1, 2))
            if not self.is_initializing() and \
                    self.is_mutable_collection("batch_stats"):
                n = x.shape[0] * x.shape[1] * x.shape[2]
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean
                ra_var.value = (1 - m) * ra_var.value + m * unbiased
        else:
            mean, var = ra_mean.value, ra_var.value
        mean = mean.astype(x.dtype)[None, None, None, :]
        inv = jax.lax.rsqrt(var + self.eps).astype(x.dtype)[None, None, None, :]
        return (x - mean) * inv * scale.astype(x.dtype) + bias.astype(x.dtype)


class PReLU(nn.Module):
    """torch nn.PReLU() — single learned negative slope, init 0.25."""

    @nn.compact
    def __call__(self, x):
        a = self.param("alpha", nn.initializers.constant(0.25), (1,))
        return jnp.where(x >= 0, x, a.astype(x.dtype) * x)


class Upsampler(nn.Module):
    """Pixel-shuffle upsampler (arch_util.py:142-165); scale 2^n or 3."""

    scale: int
    n_feat: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from realvsr_tpu.ops.resize import pixel_shuffle

        s = self.scale
        if (s & (s - 1)) == 0:
            for i in range(int(math.log2(s))):
                x = Conv2d(4 * self.n_feat, 3, dtype=self.dtype,
                           name=f"conv{i}")(x)
                x = pixel_shuffle(x, 2)
        elif s == 3:
            x = Conv2d(9 * self.n_feat, 3, dtype=self.dtype, name="conv0")(x)
            x = pixel_shuffle(x, 3)
        else:
            raise NotImplementedError(f"scale {s}")
        return x


def max_pool_3x3_s2(x):
    """torch MaxPool2d(3, stride=2, padding=1): -inf padding."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


def avg_pool_3x3_s2(x):
    """torch AvgPool2d(3, stride=2, padding=1), count_include_pad=True."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / 9.0
