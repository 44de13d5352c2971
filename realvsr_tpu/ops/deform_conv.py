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


# Above this many output positions (B*Ho*Wo) the one-shot im2col columns
# would blow past HBM (TPU lane-padding inflates the (..., K, cpg)-minor
# intermediates ~16-28x); switch to the tap-loop formulation instead.
_TAP_LOOP_THRESHOLD = 96 * 96 * 16

# Global implementation override (see set_default_impl): None → size-based
# choice between 'columns' and 'tap_loop'.  'block' selects the clamped
# shift-window MXU formulation (ops/deform_conv_block.py) — much faster on
# TPU for large inputs, with offsets clamped to ±_BLOCK_MAX_OFFSET.
_DEFAULT_IMPL: str | None = None
_BLOCK_MAX_OFFSET: int = 8
# 32 keeps the backward's per-chunk v buffers small (training memory);
# inference-only callers (bench/eval) may raise it to 128 for ~5% speed.
_BLOCK_CHUNK: int = 32


_PALLAS_INTERPRET: bool = False


def set_default_impl(impl: str | None, block_max_offset: int | None = None,
                     block_chunk: int | None = None,
                     pallas_interpret: bool | None = None):
    """Select the DCN implementation globally.

    impl: None (auto exact), 'columns', 'tap_loop', 'block' (clamped
    shift-window, XLA), or 'frame' (clamped, fused Pallas kernel with
    in-kernel frame DMA — forward-only fast path).  pallas_interpret runs
    the Pallas kernels in interpreter mode (CPU tests).  Returns the
    previous setting.
    """
    global _DEFAULT_IMPL, _BLOCK_MAX_OFFSET, _BLOCK_CHUNK, \
        _PALLAS_INTERPRET
    prev = (_DEFAULT_IMPL, _BLOCK_MAX_OFFSET, _BLOCK_CHUNK)
    _DEFAULT_IMPL = impl
    if block_max_offset is not None:
        _BLOCK_MAX_OFFSET = int(block_max_offset)
    if block_chunk is not None:
        _BLOCK_CHUNK = int(block_chunk)
    if pallas_interpret is not None:
        _PALLAS_INTERPRET = bool(pallas_interpret)
    return prev


def _modulated_deform_conv_tap_loop(x, offset, mask, weight, bias, stride,
                                    padding, dilation, groups,
                                    deformable_groups, compute_dtype=None):
    """Memory-bounded DCNv2: lax.fori over the K taps, per-tap row gathers
    and a per-tap GEMM accumulation.  Peak memory is one tap's working set
    instead of the full im2col columns (needed for full-frame inference and
    large training batches on TPU)."""
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    assert groups == 1, "tap-loop path currently supports groups=1"
    k = kh * kw
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    dh, dw = _pair(dilation)
    dg = deformable_groups
    cpg = cin // dg
    ho = _out_size(h, kh, sh, ph, dh)
    wo = _out_size(w, kw, sw, pw, dw)
    dt = compute_dtype or x.dtype

    pos_t = jnp.promote_types(offset.dtype, jnp.float32)
    # (k, dg, B, Ho*Wo, [2]) layouts so tap slices are contiguous
    off = offset.reshape(b, ho, wo, dg, k, 2).astype(pos_t)
    off = off.transpose(4, 3, 0, 1, 2, 5).reshape(k, dg, b, ho * wo, 2)
    msk = None
    if mask is not None:
        msk = mask.reshape(b, ho, wo, dg, k).transpose(4, 3, 0, 1, 2)
        msk = msk.reshape(k, dg, b, ho * wo)
    oy = (jnp.arange(ho, dtype=pos_t) * sh - ph)
    ox = (jnp.arange(wo, dtype=pos_t) * sw - pw)
    base = (oy[:, None] * 0 + ox[None, :] * 0)  # (Ho, Wo) zeros for broadcast
    base_y = (oy[:, None] + base).reshape(ho * wo)
    base_x = (ox[None, :] + base).reshape(ho * wo)
    xg = x.reshape(b, h * w, dg, cpg).transpose(2, 0, 1, 3)  # (dg,B,HW,cpg)
    wt = weight.astype(dt).reshape(k, dg, cpg, cout)

    def gather_rows(xb, idxb):
        return jnp.take(xb, idxb, axis=0)

    vg = jax.vmap(jax.vmap(gather_rows))  # over (dg, B)

    def tap(ki, out):
        i = (ki // kw).astype(pos_t)
        j = (ki % kw).astype(pos_t)
        py = base_y[None, None] + i * dh + off[ki, ..., 0]  # (dg,B,P)
        px = base_x[None, None] + j * dw + off[ki, ..., 1]
        y0 = jnp.floor(py)
        x0 = jnp.floor(px)
        ty = py - y0
        tx = px - x0

        def corner(yi, xi, wgt):
            valid = (yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1)
            wgt = jnp.where(valid, wgt, 0.0).astype(dt)
            yi = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            xi = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            return yi * w + xi, wgt

        acc = None
        for idx, wgt in (corner(y0, x0, (1 - ty) * (1 - tx)),
                         corner(y0, x0 + 1, (1 - ty) * tx),
                         corner(y0 + 1, x0, ty * (1 - tx)),
                         corner(y0 + 1, x0 + 1, ty * tx)):
            term = vg(xg, idx) * wgt[..., None]
            acc = term if acc is None else acc + term
        if msk is not None:
            acc = acc * msk[ki][..., None].astype(dt)
        return out + jnp.einsum("gbpc,gco->bpo", acc.astype(dt), wt[ki],
                                preferred_element_type=acc_t)

    acc_t = jnp.float32 if dt in (jnp.bfloat16, jnp.float16, jnp.float32) else dt
    out = jax.lax.fori_loop(0, k, tap,
                            jnp.zeros((b, ho * wo, cout), acc_t))
    out = out.reshape(b, ho, wo, cout).astype(dt)
    if bias is not None:
        out = out + bias.astype(dt)
    return out


def modulated_deform_conv(x: jax.Array, offset: jax.Array, mask: jax.Array,
                          weight: jax.Array, bias: jax.Array | None = None,
                          stride=1, padding=0, dilation=1, groups: int = 1,
                          deformable_groups: int = 1,
                          compute_dtype=None, impl: str | None = None) -> jax.Array:
    """DCNv2 forward (reference deform_conv.py:97-119 semantics, NHWC).

    Args:
      x: (B, H, W, Cin).
      offset / mask: see :func:`deform_conv_columns`.
      weight: (kh, kw, Cin // groups, Cout) — HWIO, flax convention.
      bias: (Cout,) or None.
      impl: 'columns' (one-shot im2col GEMM, fastest for small inputs),
        'tap_loop' (memory-bounded), or None to pick by size.
    Returns:
      (B, Ho, Wo, Cout).
    """
    kh, kw, cin_g, cout = weight.shape
    if impl is None:
        impl = _DEFAULT_IMPL
    if impl in ("block", "frame") and not (
            (kh, kw) == (3, 3) and _pair(stride) == (1, 1)
            and _pair(padding) == (1, 1) and _pair(dilation) == (1, 1)
            and groups == 1):
        impl = None  # block path only supports the 3x3/s1/p1 configuration
    if impl is None:
        n_pos = x.shape[0] * x.shape[1] * x.shape[2]
        impl = ("tap_loop" if (n_pos > _TAP_LOOP_THRESHOLD and groups == 1)
                else "columns")
    if impl in ("block", "frame"):
        from realvsr_tpu.ops.deform_conv_block import modulated_deform_conv_block

        return modulated_deform_conv_block(
            x, offset, mask, weight, bias, padding=_pair(padding)[0],
            deformable_groups=deformable_groups,
            max_offset=_BLOCK_MAX_OFFSET, chunk_blocks=_BLOCK_CHUNK,
            compute_dtype=compute_dtype,
            # 'frame' = fused Pallas kernel with in-kernel frame DMA
            # (forward-only; see ops/pallas/dcn_frame_kernel.py)
            use_pallas="frame" if impl == "frame" else False,
            pallas_interpret=_PALLAS_INTERPRET)
    if impl == "tap_loop":
        return _modulated_deform_conv_tap_loop(
            x, offset, mask, weight, bias, stride, padding, dilation, groups,
            deformable_groups, compute_dtype)
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
