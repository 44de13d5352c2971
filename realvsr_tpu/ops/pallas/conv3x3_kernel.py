"""Fused 3x3 conv Pallas kernel for the EDVR conv pool.

XLA's TPU conv emitter runs the bench's 64-channel 3x3 convs at ~13-26
TMAC/s while the same chip sustains 174 TFLOP/s on large matmuls
(PERF_NOTES.md round-1 microbench table) — the conv pool is ~120 ms of
the 357 ms EDVR frame.  This kernel reformulates NHWC 3x3/s1/p1 conv as
nine accumulating MXU matmuls over a flattened pixel-row layout:

  out[p, co] = sum_{dy,dx} x[p + dy*W + dx, ci] @ W[dy,dx][ci, co]

* pixels are processed in whole-image-row groups (M = mrows*W), so the
  dy=+-1 operands are slab row-slices at offsets dy*W + dx; W % 8 == 0
  keeps the dy offsets sublane-aligned, and the dx=+-1 misalignment is a
  cheap in-VMEM rotate.
* the halo'd slab ((mrows+2)*W + 16 rows) is DMA'd from HBM with the
  same double-buffered manual-DMA pattern as the DCN frame kernel; the
  window start is clamped at the array ends and re-based in-kernel.
* x-wrap columns (p % W at the row ends) and y image boundaries are
  zeroed with iota-comparison masks on the per-tap partial products, so
  zero "SAME" padding needs no padded copy of x in HBM.
* bias add, ReLU/LeakyReLU, and the residual skip-add fuse into the
  epilogue, replacing the separate XLA fusions around each conv.

Replaces lax.conv_general_dilated for the hot 64-in convs
(models/common.py ResidualBlockNoBN, EDVR front-end / PCD offset convs —
reference: codes/models/archs/EDVR_arch.py:262-283, arch_util.py:121-139).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wt_ref, b_ref, res_ref, out_ref, slab_ref, sem_ref, *,
            mrows, w, h, cin, cout, act, alpha, has_res, n_rows, dt):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    m = mrows * w
    halo = w + 8
    rows = m + 2 * halo

    def slab_dma(slot, blk):
        # three windows: top halo strip, main block, bottom halo strip.
        # At the array ends a strip's source start clamps in-range; the
        # rows it then holds are garbage, but they correspond exactly to
        # out-of-image taps, which the y/x masks below zero.
        # clip() hides 8-divisibility from Mosaic's affine prover —
        # reassert it (all operands are multiples of 8 by construction)
        top = pl.multiple_of(jnp.clip(blk * m - halo, 0, n_rows - halo), 8)
        bot = pl.multiple_of(jnp.clip(blk * m + m, 0, n_rows - halo), 8)
        return [
            pltpu.make_async_copy(x_ref.at[pl.ds(top, halo), :],
                                  slab_ref.at[slot, pl.ds(0, halo)],
                                  sem_ref.at[slot, 0]),
            pltpu.make_async_copy(x_ref.at[pl.ds(blk * m, m), :],
                                  slab_ref.at[slot, pl.ds(halo, m)],
                                  sem_ref.at[slot, 1]),
            pltpu.make_async_copy(x_ref.at[pl.ds(bot, halo), :],
                                  slab_ref.at[slot, pl.ds(halo + m, halo)],
                                  sem_ref.at[slot, 2]),
        ]

    @pl.when(i == 0)
    def _():
        for cp in slab_dma(0, i):
            cp.start()

    @pl.when(i + 1 < n)
    def _():
        for cp in slab_dma((i + 1) % 2, i + 1):
            cp.start()

    for cp in slab_dma(i % 2, i):
        cp.wait()
    slot = i % 2
    delta = 0

    # global pixel index of out row 0 for masks
    p0 = i * m
    io = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)
    xpos = (p0 + io) % w
    ypos = ((p0 + io) // w) % h

    acc = jnp.zeros((m, cout), jnp.float32)
    for dy in (-1, 0, 1):
        # arithmetic 0/1 masks — i1 compare masks cannot relayout into
        # bf16 multiplies on this Mosaic (see the DCN kernel's parity note)
        ymask = None
        if dy == -1:
            ymask = jnp.clip(ypos, 0, 1)
        elif dy == 1:
            ymask = jnp.clip(h - 1 - ypos, 0, 1)
        for dx in (-1, 0, 1):
            off = delta + halo + dy * w + dx
            src = slab_ref[slot, pl.ds(off, m), :]
            if dx == -1:
                mask = jnp.clip(xpos, 0, 1)
            elif dx == 1:
                mask = jnp.clip(w - 1 - xpos, 0, 1)
            else:
                mask = None
            if ymask is not None:
                mask = ymask if mask is None else (mask * ymask)
            if mask is not None:
                src = src * mask.astype(dt)
            acc += jax.lax.dot_general(
                src, wt_ref[(dy + 1) * 3 + dx + 1],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc += b_ref[0:1, :].astype(jnp.float32)
    if act == "relu":
        acc = jnp.maximum(acc, 0)
    elif act == "lrelu":
        acc = jnp.where(acc >= 0, acc, acc * alpha)
    out = acc.astype(dt)
    if has_res:
        out = out + res_ref[...].reshape(m, cout)
    out_ref[...] = out.reshape(out_ref.shape)


def conv3x3_fused(x: jax.Array, weight: jax.Array,
                  bias: jax.Array | None = None, *,
                  act: str | None = None, alpha: float = 0.1,
                  residual: jax.Array | None = None,
                  mrows: int = 8,
                  interpret: bool = False) -> jax.Array:
    """NHWC 3x3 stride-1 SAME conv with fused bias/activation/residual.

    x: (B, H, W, cin); weight: (3, 3, cin, cout); residual: (B, H, W, cout)
    added AFTER activation (ResidualBlock_noBN semantics: identity + conv2
    (relu(conv1 x)), arch_util.py:135-139).
    """
    b, h, w, cin = x.shape
    kh, kw, cin_w, cout = weight.shape
    assert (kh, kw) == (3, 3) and cin_w == cin
    assert w % 8 == 0, "row-major sublane alignment needs W % 8 == 0"
    while h % mrows:
        mrows //= 2
    n_rows = b * h * w
    m = mrows * w
    halo = w + 8
    rows = m + 2 * halo
    dt = x.dtype
    grid = n_rows // m

    xf = x.reshape(n_rows, cin)
    wt = weight.astype(dt).reshape(9, cin, cout)
    bi = (bias if bias is not None else jnp.zeros((cout,), dt))
    bi = bi.astype(dt).reshape(1, cout)
    has_res = residual is not None
    res = (residual.reshape(n_rows, cout) if has_res
           else jnp.zeros((1, cout), dt))

    kern = functools.partial(_kernel, mrows=mrows, w=w, h=h, cin=cin,
                             cout=cout, act=act, alpha=alpha,
                             has_res=has_res, n_rows=n_rows, dt=dt)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((9, cin, cout), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
        (pl.BlockSpec((m, cout), lambda i: (i, 0), memory_space=pltpu.VMEM)
         if has_res else
         pl.BlockSpec((1, cout), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)),
    ]
    out = pl.pallas_call(
        kern,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((m, cout), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, cout), dt),
        scratch_shapes=[
            pltpu.VMEM((2, rows, cin), dt),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * 9 * cin * cout,
            bytes_accessed=n_rows * cin * 2 * 2 + n_rows * cout * 2,
            transcendentals=0),
        interpret=interpret,
    )(xf, wt, bi, res)
    return out.reshape(b, h, w, cout)


# ---------------------------------------------------------------- packed
#
# Pair-packed variant: two W-adjacent pixels share one 128-lane vector
# ((B, H, W/2, 2*cin) flattened to (rows, 2*cin)), which satisfies the
# TPU DMA rule that HBM slices span whole 128-lane tiles (the plain
# (rows, 64) layout above cannot be manually DMA'd at all — Mosaic
# rejects 64-wide slices).  The dx=+-1 taps fold into the packed weight
# blocks: contribution (input parity q -> output parity r) at packed
# column offset pdx carries original tap dx = 2*pdx + q - r, giving nine
# (2cin, 2cout) matmuls per block — all full K>=128 MXU passes, with the
# two remaining half-zero blocks costing nothing extra.


def pack_pairs(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H, W//2, 2C) pair-packed layout."""
    b, h, w, c = x.shape
    return x.reshape(b, h, w // 2, 2 * c)


def unpack_pairs(x: jax.Array) -> jax.Array:
    b, h, wp, c2 = x.shape
    return x.reshape(b, h, wp * 2, c2 // 2)


def pack_weights(weight: jax.Array, dt,
                 splits: tuple[int, ...] | None = None) -> jax.Array:
    """(3, 3, cin, cout) -> (9, 2cin, 2cout) packed blocks.

    Block (dy, pdx)[q*cin + c, r*cout + o] = W[dy, 2*pdx + q - r + 1, c, o]
    when that dx is a valid tap, else 0.

    ``splits``: the input is a channel-concatenation of separately
    pair-packed tensors with these channel counts (sum == cin), i.e. its
    lane layout is [g0·q0, g0·q1, g1·q0, g1·q1, ...] instead of the
    standard [q0·all, q1·all].  Handled entirely here by permuting the
    K rows of the packed blocks to match — the kernel is unchanged, so
    PCD's concat(packed, packed) inputs need no physical re-interleave
    copy (the round-4 "consumers read packed directly" boundary fix).
    """
    kh, kw, cin, cout = weight.shape
    out = jnp.zeros((3, 3, 2 * cin, 2 * cout), jnp.float32)
    wf = weight.astype(jnp.float32)
    for pdx in (-1, 0, 1):
        for q in (0, 1):
            for r in (0, 1):
                dx = 2 * pdx + q - r
                if -1 <= dx <= 1:
                    out = out.at[:, pdx + 1,
                                 q * cin:(q + 1) * cin,
                                 r * cout:(r + 1) * cout].set(wf[:, dx + 1])
    if splits is not None:
        assert sum(splits) == cin, (splits, cin)
        perm, off = [], 0
        for cg in splits:
            for q in (0, 1):
                perm.extend(range(q * cin + off, q * cin + off + cg))
            off += cg
        out = out[:, :, perm, :]
    return out.reshape(9, 2 * cin, 2 * cout).astype(dt)


def unpack_grouped(x: jax.Array, splits: tuple[int, ...]) -> jax.Array:
    """Inverse layout map for a concat-of-packed tensor: (B, H, W/2,
    2*sum(splits)) with [g0·q0, g0·q1, ...] lanes -> plain (B, H, W, sum)."""
    outs, off = [], 0
    for cg in splits:
        outs.append(unpack_pairs(x[..., 2 * off:2 * (off + cg)]))
        off += cg
    return jnp.concatenate(outs, axis=-1) if len(outs) > 1 else outs[0]


def _packed_kernel(x_ref, wt_ref, b_ref, res_ref, out_ref, slab_ref,
                   a_ref, sem_ref, *, mrows, wp, h, cin2, cout2, act,
                   alpha, has_res, n_rows, dt, variant="scratch"):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    m = mrows * wp
    halo = wp + 8
    rows = m + 2 * halo

    def slab_dma(slot, blk):
        top = pl.multiple_of(
            jnp.clip(blk * m - halo, 0, n_rows - halo), 8)
        bot = pl.multiple_of(
            jnp.clip(blk * m + m, 0, n_rows - halo), 8)
        return [
            pltpu.make_async_copy(x_ref.at[pl.ds(top, halo), :],
                                  slab_ref.at[slot, pl.ds(0, halo)],
                                  sem_ref.at[slot, 0]),
            pltpu.make_async_copy(x_ref.at[pl.ds(blk * m, m), :],
                                  slab_ref.at[slot, pl.ds(halo, m)],
                                  sem_ref.at[slot, 1]),
            pltpu.make_async_copy(x_ref.at[pl.ds(bot, halo), :],
                                  slab_ref.at[slot, pl.ds(halo + m, halo)],
                                  sem_ref.at[slot, 2]),
        ]

    @pl.when(i == 0)
    def _():
        for cp in slab_dma(0, i):
            cp.start()

    @pl.when(i + 1 < n)
    def _():
        for cp in slab_dma((i + 1) % 2, i + 1):
            cp.start()

    for cp in slab_dma(i % 2, i):
        cp.wait()
    slot = i % 2

    p0 = i * m
    me = m + 2
    ioe = jax.lax.broadcasted_iota(jnp.int32, (me, 1), 0) - 1
    jpos_e = (p0 + ioe) % wp
    ypos_e = ((p0 + ioe) // wp) % h

    # dy-stacked staging: A = (m+2, 3*cin2) built from THREE row-aligned
    # VMEM copies (lane offsets are cin2-multiples — the packing's whole
    # point; the unpacked 64-ch layout would need 64-lane writes Mosaic
    # can't tile).  The pdx=+-1 taps then ride three K=3*cin2 dots whose
    # f32 outputs are shifted one row before accumulating — 3 accumulator
    # round-trips instead of 9 (nine K=cin2 dots measured 2x slower), and
    # no sublane-misaligned bf16 copies (a full 9*cin2 im2col needs 6,
    # measured slower still).
    # variant="ssa" (default): staging built as an SSA concat value, no
    # scratch — Mosaic schedules it freely across blocks.  Chip sweep at
    # mrows=4 (tools/sweep_conv3x3.py, round 5): front-shape 2.96 ms/call
    # vs 3.32 dbuf / ~3.34 scratch; recon-shape 0.845 vs 0.944/0.946.
    # variant="dbuf": staging scratch double-buffered by block parity so
    # block i+1's VPU staging writes don't wait on block i's MXU reads
    # (the DCN kernel's recorded ref-reuse pipelining hazard).
    # variant="scratch": the round-3 single staging scratch.
    srcs = []
    for t, dy in enumerate((-1, 0, 1)):
        src = slab_ref[slot, pl.ds(halo - 1 + dy * wp, me), :]
        if dy == -1:
            src = src * jnp.clip(ypos_e, 0, 1).astype(dt)
        elif dy == 1:
            src = src * jnp.clip(h - 1 - ypos_e, 0, 1).astype(dt)
        if variant == "ssa":
            srcs.append(src)
        elif variant == "dbuf":
            a_ref[slot, :, t * cin2:(t + 1) * cin2] = src
        else:
            a_ref[:, t * cin2:(t + 1) * cin2] = src
    if variant == "ssa":
        a_val = jnp.concatenate(srcs, axis=1)
    elif variant == "dbuf":
        a_val = a_ref[slot, :, :]
    else:
        a_val = a_ref[:, :]
    jm = jpos_e[1:1 + m]  # packed col of each OUT row
    acc = None
    for pdx in (-1, 0, 1):
        t = jax.lax.dot_general(
            a_val, wt_ref[pdx + 1], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ts = t[1 + pdx:1 + pdx + m]
        if pdx == -1:  # reading col j-1: invalid at j == 0
            ts = ts * jnp.clip(jm, 0, 1).astype(jnp.float32)
        elif pdx == 1:  # reading col j+1: invalid at j == wp-1
            ts = ts * jnp.clip(wp - 1 - jm, 0, 1).astype(jnp.float32)
        acc = ts if acc is None else acc + ts
    acc += b_ref[0:1, :].astype(jnp.float32)
    if act == "relu":
        acc = jnp.maximum(acc, 0)
    elif act == "lrelu":
        acc = jnp.where(acc >= 0, acc, acc * alpha)
    out = acc.astype(dt)
    if has_res:
        out = out + res_ref[...].reshape(m, cout2)
    out_ref[...] = out.reshape(out_ref.shape)


def conv3x3_packed(xp: jax.Array, weight: jax.Array,
                   bias: jax.Array | None = None, *,
                   h: int, act: str | None = None, alpha: float = 0.1,
                   residual: jax.Array | None = None,
                   mrows: int | None = None,
                   splits: tuple[int, ...] | None = None,
                   interpret: bool = False) -> jax.Array:
    """Differentiable 3x3/s1/SAME conv on the pair-packed layout.

    Forward runs the Pallas kernel; the backward (custom VJP) autodiffs
    an equivalent stock-XLA expression (unpack -> conv -> act -> pack
    [-> +residual]) — same pattern as :func:`conv3x3` below, so enabling
    ``set_conv3x3_impl('pallas')`` during training is safe.

    xp: (B, H, W/2, 2*cin) from :func:`pack_pairs`; weight (3, 3, cin,
    cout); returns (B, H, W/2, 2*cout) packed.  h is the image height
    (for the dy boundary masks).
    """
    cout = weight.shape[3]
    has_bias = bias is not None
    has_res = residual is not None
    bi = bias if has_bias else jnp.zeros((cout,), xp.dtype)
    res = residual if has_res else jnp.zeros((1, 1, 1, 2 * cout), xp.dtype)
    return _packed_core(xp, weight, bi, res, h, act, alpha, mrows,
                        interpret, has_res, splits)


def _packed_ref_xla(xp, weight, bias, res, h, act, alpha, has_res,
                    splits=None):
    """Stock-XLA equivalent of the packed kernel (backward path)."""
    x = unpack_pairs(xp) if splits is None else unpack_grouped(xp, splits)
    # No preferred_element_type widening: the transpose of a widened conv
    # pairs the f32 cotangent with the bf16 kernel and fails dtype checks.
    # A same-dtype conv transposes cleanly and matches the nn.Conv XLA
    # training path (bf16 conv, f32 params cast at the call site) — the
    # semantics the training tests pin down.  TPU accumulates bf16 convs
    # in f32 internally either way.
    y = jax.lax.conv_general_dilated(
        x, weight.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(y.dtype)
    if act == "relu":
        y = jnp.maximum(y, 0)
    elif act == "lrelu":
        y = jnp.where(y >= 0, y, y * alpha)
    y = pack_pairs(y.astype(xp.dtype))
    if has_res:
        y = y + res
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8, 9, 10))
def _packed_core(xp, weight, bias, res, h, act, alpha, mrows, interpret,
                 has_res, splits):
    return _packed_pallas(xp, weight, bias,
                          residual=res if has_res else None,
                          h=h, act=act, alpha=alpha, mrows=mrows,
                          interpret=interpret,
                          splits=splits)


def _packed_core_fwd(xp, weight, bias, res, h, act, alpha, mrows,
                     interpret, has_res, splits):
    out = _packed_core(xp, weight, bias, res, h, act, alpha, mrows,
                       interpret, has_res, splits)
    return out, (xp, weight, bias, res)


def _packed_core_bwd(h, act, alpha, mrows, interpret, has_res,
                     splits, saved, g):
    xp, weight, bias, res = saved
    _, vjp = jax.vjp(
        lambda a, w, b, r: _packed_ref_xla(a, w, b, r, h, act, alpha,
                                           has_res, splits),
        xp, weight, bias, res)
    return vjp(g)


_packed_core.defvjp(_packed_core_fwd, _packed_core_bwd)


def _packed_pallas(xp: jax.Array, weight: jax.Array,
                   bias: jax.Array | None = None, *,
                   h: int, act: str | None = None, alpha: float = 0.1,
                   residual: jax.Array | None = None,
                   mrows: int | None = None,
                   splits: tuple[int, ...] | None = None,
                   variant: str = "ssa",
                   interpret: bool = False) -> jax.Array:
    """Pallas forward of the pair-packed conv.

    The per-step VMEM working set (slab + A staging + three f32 dot
    outputs + pipelined out/res blocks) scales with m = mrows*wp, so the
    default picks the largest power-of-2 mrows with m <= 2048 packed
    pixels — the measured v5e ceiling (mrows=4 at wp=512; mrows=8 blows
    the 16 MB scoped limit, and wp=960 needs mrows=2).
    """
    b, hh, wp, cin2 = xp.shape
    assert hh == h
    _, _, cin, cout = weight.shape
    assert cin2 == 2 * cin and wp % 8 == 0
    if mrows is None:
        mrows = 1
        while mrows * 2 * wp <= 2048:
            mrows *= 2
    while h % mrows:
        mrows //= 2
    cout2 = 2 * cout
    n_rows = b * h * wp
    m = mrows * wp
    halo = wp + 8
    rows = m + 2 * halo
    dt = xp.dtype

    xf = xp.reshape(n_rows, cin2)
    # (3dy, 3pdx, cin2, cout2) -> per-pdx dy-stacked (3, 3*cin2, cout2)
    wt = pack_weights(weight, dt, splits).reshape(
        3, 3, cin2, cout2).transpose(1, 0, 2, 3).reshape(
        3, 3 * cin2, cout2)
    bi = (bias if bias is not None else jnp.zeros((cout,), dt))
    bi = jnp.tile(bi.astype(dt), 2).reshape(1, cout2)
    has_res = residual is not None
    res = (residual.reshape(n_rows, cout2) if has_res
           else jnp.zeros((1, cout2), dt))

    kern = functools.partial(_packed_kernel, mrows=mrows, wp=wp, h=h,
                             cin2=cin2, cout2=cout2, act=act, alpha=alpha,
                             has_res=has_res, n_rows=n_rows, dt=dt,
                             variant=variant)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.ANY),
        pl.BlockSpec((3, 3 * cin2, cout2), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, cout2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        (pl.BlockSpec((m, cout2), lambda i: (i, 0), memory_space=pltpu.VMEM)
         if has_res else
         pl.BlockSpec((1, cout2), lambda i: (0, 0),
                      memory_space=pltpu.VMEM)),
    ]
    out_specs = pl.BlockSpec((m, cout2), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_rows, cout2), dt)
    out = pl.pallas_call(
        kern,
        grid=(n_rows // m,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, rows, cin2), dt),
            (pltpu.VMEM((2, m + 2, 3 * cin2), dt) if variant == "dbuf"
             else pltpu.VMEM((8, 128), dt) if variant == "ssa"
             else pltpu.VMEM((m + 2, 3 * cin2), dt)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_rows * 9 * cin2 * cout2,
            bytes_accessed=n_rows * cin2 * 2 * 2 + n_rows * cout2 * 2,
            transcendentals=0),
        interpret=interpret,
    )(xf, wt, bi, res)
    return out.reshape(b, h, wp, cout2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def conv3x3(x, weight, interpret=False):
    """Differentiable plain 3x3/s1/SAME conv on the Pallas forward.

    The backward runs on stock XLA convs (dx = correlate with the spatially
    flipped kernel, dW = patch correlation) — the Pallas kernel accelerates
    the inference-heavy forward while training numerics stay on the XLA
    path the tests pin down.
    """
    return conv3x3_fused(x, weight, None, interpret=interpret)


def _conv3x3_fwd(x, weight, interpret):
    return conv3x3(x, weight, interpret), (x, weight)


def _conv3x3_bwd(interpret, res, g):
    x, weight = res
    gdt = g.astype(x.dtype)
    wflip = jnp.flip(weight, axis=(0, 1)).swapaxes(2, 3)
    dx = jax.lax.conv_general_dilated(
        gdt, wflip.astype(gdt.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    dw = jax.lax.conv_general_dilated(
        x.transpose(3, 1, 2, 0), gdt.transpose(1, 2, 0, 3), (1, 1),
        ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    dw = dw.transpose(1, 2, 0, 3).astype(weight.dtype)
    return dx, dw


conv3x3.defvjp(_conv3x3_fwd, _conv3x3_bwd)
