"""Modulated deformable convolution (DCNv2) — TPU-native.

Replaces the reference's CUDA extension (``codes/models/archs/dcn/src/
deform_conv_cuda.cpp`` + ``deform_conv_cuda_kernel.cu``).  Rather than
translating the im2col CUDA kernels, the op is formulated TPU-first:

  1. per-tap bilinear *row gathers* on the flattened spatial axis of a
     channels-last feature map (4 gathers + weighted sum, vectorized along
     the lane/channel dimension),
  2. modulation masks applied elementwise (VPU), and
  3. one large column x weight GEMM on the MXU (the im2col contraction).

Gradients come from JAX autodiff: the gather transposes to a scatter-add,
which is exactly the reference's atomicAdd col2im (kernel.cu:636-694), and
the bilinear-weight derivative w.r.t. offsets matches the analytic
get_coordinate_weight (kernel.cu:145-188).

Layout conventions follow the CUDA op so that reference-trained weights can
be imported:
  * offset channels = (deformable_groups, K, 2) with (dh, dw) pairs,
  * mask channels   = (deformable_groups, K),
  * taps ordered row-major over the kernel window (i * kw + j),
  * out-of-image bilinear samples contribute zero (zeros padding).

A fused Pallas kernel for the forward path lives in
``realvsr_tpu.ops.pallas.dcn`` and is used when enabled; this module is the
always-available XLA path and the correctness oracle.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _out_size(n: int, k: int, stride: int, pad: int, dil: int) -> int:
    return (n + 2 * pad - (dil * (k - 1) + 1)) // stride + 1


def _bilinear_gather(x_flat: jax.Array, h: jax.Array, w: jax.Array,
                     height: int, width: int) -> jax.Array:
    """Bilinear sample rows from a flattened spatial axis, zero outside.

    x_flat: (B, H*W, C); h, w: (B, ...) float sample positions.
    Returns (B, ..., C).
    """
    c = x_flat.shape[-1]
    h0 = jnp.floor(h)
    w0 = jnp.floor(w)
    th = h - h0
    tw = w - w0

    def corner(hi, wi, wgt):
        valid = (hi >= 0) & (hi <= height - 1) & (wi >= 0) & (wi <= width - 1)
        wgt = jnp.where(valid, wgt, 0.0)
        hi = jnp.clip(hi, 0, height - 1).astype(jnp.int32)
        wi = jnp.clip(wi, 0, width - 1).astype(jnp.int32)
        return hi * width + wi, wgt

    i00, w00 = corner(h0, w0, (1 - th) * (1 - tw))
    i01, w01 = corner(h0, w0 + 1, (1 - th) * tw)
    i10, w10 = corner(h0 + 1, w0, th * (1 - tw))
    i11, w11 = corner(h0 + 1, w0 + 1, th * tw)

    def gather(xb, idxb):
        return jnp.take(xb, idxb.reshape(-1), axis=0).reshape(idxb.shape + (c,))

    vg = jax.vmap(gather)
    # weights are computed in >=f32 but applied in the feature dtype so the
    # big (.., K, C) intermediates stay bf16 on the bf16 inference path
    wt_t = x_flat.dtype if x_flat.dtype in (jnp.bfloat16, jnp.float16,
                                            jnp.float32) else w00.dtype
    return (
        vg(x_flat, i00) * w00[..., None].astype(wt_t)
        + vg(x_flat, i01) * w01[..., None].astype(wt_t)
        + vg(x_flat, i10) * w10[..., None].astype(wt_t)
        + vg(x_flat, i11) * w11[..., None].astype(wt_t)
    )


def deform_conv_columns(x: jax.Array, offset: jax.Array,
                        mask: jax.Array | None,
                        kernel_size: tuple[int, int],
                        stride=1, padding=0, dilation=1,
                        deformable_groups: int = 1) -> jax.Array:
    """Deformable im2col: sampled, modulated columns.

    Args:
      x: (B, H, W, Cin).
      offset: (B, Ho, Wo, dg*K*2), channel layout (dg, K, (dh, dw)).
      mask: (B, Ho, Wo, dg*K) with layout (dg, K), or None (DCNv1).
    Returns:
      (B, Ho, Wo, Cin * K) columns; channel-major then tap, matching the
      torch weight layout (Cout, Cin, kh, kw) flattened as (Cin*K).
    """
    b, h, w, cin = x.shape
    kh, kw = kernel_size
    k = kh * kw
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    dg = deformable_groups
    cpg = cin // dg
    ho = _out_size(h, kh, sh, ph, dh)
    wo = _out_size(w, kw, sw, pw, dw)

    # positions at least f32 (bilinear weights must not be computed in bf16)
    pos_t = jnp.promote_types(offset.dtype, jnp.float32)
    off = offset.reshape(b, ho, wo, dg, k, 2).astype(pos_t)

    # Base sampling grid: (Ho, Wo, K)
    oy = jnp.arange(ho, dtype=pos_t) * sh - ph
    ox = jnp.arange(wo, dtype=pos_t) * sw - pw
    ky, kx = jnp.meshgrid(
        jnp.arange(kh, dtype=pos_t) * dh,
        jnp.arange(kw, dtype=pos_t) * dw,
        indexing="ij",
    )
    base_h = oy[:, None, None] + ky.reshape(-1)[None, None, :]  # (Ho, 1, K)
    base_w = ox[None, :, None] + kx.reshape(-1)[None, None, :]  # (1, Wo, K)

    # (B, Ho, Wo, dg, K)
    pos_h = base_h[None, :, :, None, :] + off[..., 0]
    pos_w = base_w[None, :, :, None, :] + off[..., 1]

    # Gather per deformable group: (dg, B, H*W, cpg)
    xg = x.reshape(b, h * w, dg, cpg).transpose(2, 0, 1, 3)
    ph_ = pos_h.transpose(3, 0, 1, 2, 4)  # (dg, B, Ho, Wo, K)
    pw_ = pos_w.transpose(3, 0, 1, 2, 4)
    sampled = jax.vmap(_bilinear_gather, in_axes=(0, 0, 0, None, None))(
        xg, ph_, pw_, h, w
    )  # (dg, B, Ho, Wo, K, cpg)

    if mask is not None:
        m = mask.reshape(b, ho, wo, dg, k).transpose(3, 0, 1, 2, 4)
        sampled = sampled * m[..., None].astype(sampled.dtype)

    # → (B, Ho, Wo, dg, cpg, K) → (B, Ho, Wo, Cin*K)
    cols = sampled.transpose(1, 2, 3, 0, 5, 4)
    return cols.reshape(b, ho, wo, cin * k)


def modulated_deform_conv(x: jax.Array, offset: jax.Array, mask: jax.Array,
                          weight: jax.Array, bias: jax.Array | None = None,
                          stride=1, padding=0, dilation=1, groups: int = 1,
                          deformable_groups: int = 1,
                          compute_dtype=None) -> jax.Array:
    """DCNv2 forward (reference deform_conv.py:97-119 semantics, NHWC).

    Args:
      x: (B, H, W, Cin).
      offset / mask: see :func:`deform_conv_columns`.
      weight: (kh, kw, Cin // groups, Cout) — HWIO, flax convention.
      bias: (Cout,) or None.
    Returns:
      (B, Ho, Wo, Cout).
    """
    kh, kw, cin_g, cout = weight.shape
    k = kh * kw
    cols = deform_conv_columns(
        x, offset, mask, (kh, kw), stride, padding, dilation, deformable_groups
    )
    b, ho, wo, _ = cols.shape
    dt = compute_dtype or x.dtype
    # accumulate in f32 on the MXU for low-precision inputs, else natively
    acc_t = jnp.float32 if dt in (jnp.bfloat16, jnp.float16, jnp.float32) else dt
    # weight (kh, kw, cin_g, cout) → (groups, cin_g*K, cout_g) with the
    # column layout (cin-major, tap-minor): w[ci, k] index = ci * K + k.
    wt = weight.astype(dt).transpose(2, 0, 1, 3).reshape(cin_g * k, cout)
    if groups == 1:
        out = jnp.einsum(
            "bhwi,io->bhwo", cols.astype(dt), wt,
            preferred_element_type=acc_t,
        )
    else:
        cols_g = cols.astype(dt).reshape(b, ho, wo, groups, cin_g * k)
        wt_g = wt.reshape(cin_g * k, groups, cout // groups)
        # group g of cols pairs with group g of output channels
        out = jnp.einsum(
            "bhwgi,gio->bhwgo", cols_g, wt_g.transpose(1, 0, 2),
            preferred_element_type=acc_t,
        ).reshape(b, ho, wo, cout)
    out = out.astype(dt)
    if bias is not None:
        out = out + bias.astype(dt)
    return out


def deform_conv(x: jax.Array, offset: jax.Array, weight: jax.Array,
                stride=1, padding=0, dilation=1, groups: int = 1,
                deformable_groups: int = 1) -> jax.Array:
    """DCNv1 (unmodulated) forward (reference deform_conv.py:15-94)."""
    return modulated_deform_conv(
        x, offset, None, weight, None, stride, padding, dilation, groups,
        deformable_groups,
    )


# ---------------------------------------------------------------------------
# Naive numpy oracle (used by tests only; mirrors the CUDA kernel's math
# loop-for-loop so the XLA formulation can be validated independently).
# ---------------------------------------------------------------------------


def modulated_deform_conv_np(x, offset, mask, weight, bias=None, stride=1,
                             padding=0, dilation=1, groups=1,
                             deformable_groups=1):
    """Reference loop implementation. x (B,H,W,Cin) float64; tiny inputs only."""
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    dg = deformable_groups
    cpg = cin // dg
    k = kh * kw
    ho = _out_size(h, kh, sh, ph, dh)
    wo = _out_size(w, kw, sw, pw, dw)
    off = offset.reshape(b, ho, wo, dg, k, 2)
    msk = None if mask is None else mask.reshape(b, ho, wo, dg, k)
    out = np.zeros((b, ho, wo, cout), dtype=np.float64)

    def sample(img2d, y, x_):
        hh, ww = img2d.shape
        if y <= -1 or y >= hh or x_ <= -1 or x_ >= ww:
            return 0.0
        y0, x0 = int(np.floor(y)), int(np.floor(x_))
        ty, tx = y - y0, x_ - x0
        v = 0.0
        for (yy, wy) in ((y0, 1 - ty), (y0 + 1, ty)):
            for (xx, wx) in ((x0, 1 - tx), (x0 + 1, tx)):
                if 0 <= yy < hh and 0 <= xx < ww:
                    v += wy * wx * img2d[yy, xx]
        return v

    og = cout // groups
    for bi in range(b):
        for yo in range(ho):
            for xo in range(wo):
                for g in range(groups):
                    for co in range(og):
                        acc = 0.0
                        for ci in range(cin_g):
                            cin_abs = g * cin_g + ci
                            dgi = cin_abs // cpg
                            for i in range(kh):
                                for j in range(kw):
                                    kk = i * kw + j
                                    y = yo * sh - ph + i * dh + off[bi, yo, xo, dgi, kk, 0]
                                    x_ = xo * sw - pw + j * dw + off[bi, yo, xo, dgi, kk, 1]
                                    v = sample(x[bi, :, :, cin_abs], y, x_)
                                    if msk is not None:
                                        v *= msk[bi, yo, xo, dgi, kk]
                                    acc += v * weight[i, j, ci, g * og + co]
                        out[bi, yo, xo, g * og + co] = acc
    if bias is not None:
        out += bias
    return out
