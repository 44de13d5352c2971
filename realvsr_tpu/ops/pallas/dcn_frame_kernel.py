"""Fused DCN kernel v8: frame-DMA sampling with fixed-point coordinates.

Same compute structure as v7 (horizontal-first MXU sampling from 128-wide
column panels, in-kernel double-buffered DMA), with the round-3 changes
that attack the two measured cost centers (PERF_NOTES round-2 map; trace
attribution in tools/profile_inference.py):

1. **Fixed-point int16 coordinates.**  The v7 (n, dg, 3, q) f32 coords
   tensor cost ~1.36 GB of HBM per full-res call and ~40 ms of XLA-side
   f32 fusions/copies to build (profiler-attributed).  v8 takes
   (n, dg*2, q) int16 positions (ly, lx interleaved per group, scaled by
   static powers of two) plus a (n, dg, q) bf16 mask — 2.9x less traffic —
   and recovers floor/fraction with exact integer shift/mask ops on the
   VPU.  The scales are chosen per call so positions fit int16
   (ly <= ph*fy, lx <= pw*fx < 32768) with at least 1/256-px resolution.

2. **Full-tile vertical fold.**  v7 folded the vertical lerp with PH
   strided (cpg, q) FMAs; cpg=8-row slices of a bf16 array are half a
   (16, 128) sublane tile, so each FMA pays full-tile cost (a reassociated
   tree measured identical — same half-tile slices).  v8 expands the
   (phr, q) hat weights to (phr*cpg, q) rows with an iota//cpg comparison
   build, multiplies once at full tile utilization, and reduces with
   log2(phr) contiguous tile-aligned halving adds.

Inputs:
  xp:  (B, dg, nbx, Hp*cpg, 128) column panels, HBM-resident (pl.ANY),
       rows (H, c)-major per group; panels overlap at stride bw so the
       in-kernel DMA lane window is always exactly 128.
  lyx: (n_all, dg*2, q) int16 — rows (2g, 2g+1) = (ly*fy, lx*fx) for
       group g, q tap-major (q = kk*p + pixel).
  m:   (n_all, dg, q) bf16 modulation mask (sigmoid already applied).
  wt:  (dg*k*cpg, cout) tap-GEMM weights, rows (g, tap, c).

Replaces the reference CUDA sampling/im2col kernels
(codes/models/archs/dcn/src/deform_conv_cuda_kernel.cu:571-634).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return -(-x // m) * m


def fx_scales(ph: int, pw: int) -> tuple[int, int]:
    """Largest power-of-two fixed-point scales s.t. (dim+1)*scale < 2**15."""
    def pick(n):
        s = 1
        while (n + 1) * (s * 2) < 32768:
            s *= 2
        return s
    return pick(ph), pick(pw)


def _decode_all(lyx_block, ly2, lx2, dt):
    """Fixed-point decode for ALL groups at once: (2*dg, q) int16 ->
    (floors int32, fractions dt).  Row-interleaved shifts (y rows use ly2,
    x rows lx2) via a per-row constant vector — one set of (16, q) ops
    instead of per-group (1, q) ops."""
    rows = lyx_block.shape[0]
    li = lyx_block[:, :].astype(jnp.int32)
    # row parity as int arithmetic (a (rows, 1) bool broadcast trips a
    # Mosaic relayout bug: "Non-singleton logical dimension is replicated")
    par = jax.lax.broadcasted_iota(jnp.int32, (rows, 1), 0) % 2
    sh = jnp.int32(ly2) + (jnp.int32(lx2) - jnp.int32(ly2)) * par
    q0 = jax.lax.shift_right_logical(li, sh)
    frac = (li - jax.lax.shift_left(q0, sh)).astype(dt)
    sy, sx = 2.0 ** -ly2, 2.0 ** -lx2
    scale = (jnp.asarray(sy, dt)
             + jnp.asarray(sx - sy, dt) * par.astype(dt))
    return q0, frac * scale


def _hats(q0, frac, g, io_q, io_p, ph, pw, phr, dt, use_roll):
    """One-hot lerp hats for group g as SSA VALUES (no scratch refs — ref
    reuse across the group loop serializes VPU builds against the previous
    group's MXU reads and blocks software pipelining).  Select-form build:
    2 int compares + 2 selects per matrix; wx is built on pw_built rows
    and zero-extended to the 128-lane contraction depth (K <= 128 costs
    the same MXU time, and zero rows keep the matmul exact)."""
    y0i = q0[2 * g:2 * g + 1, :]
    ty = frac[2 * g:2 * g + 1, :]
    x0i = q0[2 * g + 1:2 * g + 2, :]
    tx = frac[2 * g + 1:2 * g + 2, :]
    # tent form: hat(j) = relu(1 - |(j - floor) - frac|).  The integer
    # row distance converts to the feature dtype exactly (small ints), and
    # the only rows where bf16 rounding could matter (|d - t| < 1, i.e.
    # d in {0, 1}) are exact because fractions are multiples of 2^-8.
    # One int sub + convert + 3 bf16 ops vs 2 int32 compares + 2 converts
    # + lerp (this VPU has no 16-bit compares and its i1 masks cannot
    # relayout into bf16 selects — both Mosaic-verified).
    one = jnp.asarray(1.0, dt)
    dyf = (io_p - y0i).astype(dt)
    wy = jnp.maximum(one - jnp.abs(dyf - ty), 0)
    dxf = (io_q - x0i).astype(dt)
    wx = jnp.maximum(one - jnp.abs(dxf - tx), 0)
    pw_built = io_q.shape[0]
    if pw_built < 128:
        wx = jnp.concatenate(
            [wx, jnp.zeros((128 - pw_built, wx.shape[1]), dt)], axis=0)
    return wy, wx


def _kernel(lyx_ref, m_ref, xp_ref, wt_ref, out_ref, slab_ref, s_ref,
            sem_ref, *, p, k, kw, dg, cpg, ph, pw, bh, nby, nbx,
            ly2, lx2, fold, use_roll, gemm):
    dt = out_ref.dtype
    i = pl.program_id(0)
    n = pl.num_programs(0)
    phr = slab_ref.shape[2] // cpg

    def slab_dma(slot, blk):
        b = blk // (nby * nbx)
        r = blk % (nby * nbx)
        by = r // nbx
        bx = r % nbx
        return pltpu.make_async_copy(
            xp_ref.at[b, :, bx, pl.ds(by * bh * cpg, phr * cpg), :],
            slab_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(i == 0)
    def _():
        slab_dma(0, i).start()

    @pl.when(i + 1 < n)
    def _():
        slab_dma((i + 1) % 2, i + 1).start()

    slab_dma(i % 2, i).wait()
    slot = i % 2

    pw_built = _round_up(pw, 16)
    io_q = jax.lax.broadcasted_iota(jnp.int32, (pw_built, 1), 0)
    io_p = jax.lax.broadcasted_iota(jnp.int32, (phr, 1), 0)
    q0, frac = _decode_all(lyx_ref[0], ly2, lx2, dt)
    for g in range(dg):
        wy, wx = _hats(q0, frac, g, io_q, io_p, ph, pw, phr, dt,
                       use_roll)
        mask = m_ref[0, g:g + 1, :].astype(dt)
        pg = slab_ref[slot, g].reshape(phr * cpg, 128)
        h = jnp.dot(pg, wx,
                    preferred_element_type=jnp.float32).astype(dt)
        if fold == "band":
            # per-tap banded vertical fold: tap-row tr columns only ever
            # sample strips [tr, tr + ph - 3] (ly = y%bh + r + tr +
            # clip(dy, -r, r) with ph = bh + 2r + 3, and prep clamps the
            # offsets), so each tap folds ph - 2 strips instead of phr.
            # Requires p % 128 == 0 so the per-tap column windows are
            # lane-tile aligned.
            nstr = ph - 2
            for kk in range(k):
                tr = kk // kw
                cols = slice(kk * p, (kk + 1) * p)
                hk_0 = h[tr * cpg:(tr + 1) * cpg, cols]
                sk = hk_0 * wy[tr:tr + 1, cols]
                for pp in range(tr + 1, min(tr + nstr, phr)):
                    sk = sk + (h[pp * cpg:(pp + 1) * cpg, cols]
                               * wy[pp:pp + 1, cols])
                sk = sk * mask[:, cols]
                if gemm == "taps":
                    s_ref[g * cpg:(g + 1) * cpg, cols] = sk
                else:
                    row = (g * k + kk) * cpg
                    s_ref[row:row + cpg, :] = sk
            s = None
        elif fold == "tree":
            # expanded tent at (phr*cpg, q) + contiguous halving adds
            # (measured SLOWER than the strided slices fold: the (phr*cpg,
            # q) build+multiply outweighs the half-tile FMA penalty)
            ty = frac[2 * g:2 * g + 1, :]
            io_pe = jax.lax.broadcasted_iota(
                jnp.int32, (phr * cpg, 1), 0) // cpg
            dyf = (io_pe - q0[2 * g:2 * g + 1, :]).astype(dt)
            wye = jnp.maximum(1 - jnp.abs(dyf - ty), 0)
            x = h * wye
            rows = phr * cpg
            while rows > cpg and rows % (2 * cpg) == 0:
                rows //= 2
                x = x[0:rows, :] + x[rows:2 * rows, :]
            s = x[0:cpg, :]
            for pp in range(1, rows // cpg):
                s = s + x[pp * cpg:(pp + 1) * cpg, :]
        else:
            s = h[0:cpg, :] * wy[0:1, :]
            for pp in range(1, phr):
                s = s + h[pp * cpg:(pp + 1) * cpg, :] * wy[pp:pp + 1, :]
        if fold != "band":
            s = s * mask
            if gemm == "taps":
                # one (cpg, q) store per group; the tap reindex moves into
                # k accumulating K=dg*cpg GEMMs below (72 strided half-tile
                # stores -> dg wide ones)
                s_ref[g * cpg:(g + 1) * cpg, :] = s
            else:
                for kk in range(k):
                    row = (g * k + kk) * cpg
                    s_ref[row:row + cpg, :] = s[:, kk * p:(kk + 1) * p]
    if gemm == "taps":
        acc32 = jax.lax.dot_general(
            s_ref[:, 0:p], wt_ref[0], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        for kk in range(1, k):
            acc32 += jax.lax.dot_general(
                s_ref[:, kk * p:(kk + 1) * p], wt_ref[kk],
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        acc = acc32.astype(dt)
    else:
        acc = jax.lax.dot_general(
            s_ref[:, :], wt_ref[:, :], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt)
    # write straight into the (B, H', W', cout) frame layout — saves the
    # block→frame transpose XLA would otherwise do
    out_ref[0] = acc.reshape(out_ref.shape[1:])


def dcn_frame_fused(xp: jax.Array, lyx: jax.Array, m: jax.Array,
                    wt: jax.Array, *,
                    cpg: int, bh: int, bw: int, ph: int, pw: int,
                    nby: int, nbx: int, k: int = 9, kw: int = 3,
                    fold: str = "slices", gemm: str = "big",
                    interpret: bool = False) -> jax.Array:
    b_, dg, nbx_, hpc, lanes = xp.shape
    assert nbx_ == nbx and lanes == 128 and pw <= 128
    cout = wt.shape[-1]
    n_all, dg2, q = lyx.shape
    assert dg2 == dg * 2 and lyx.dtype == jnp.int16
    p = q // k
    assert p == bh * bw and n_all == b_ * nby * nbx
    assert (bh * cpg) % 16 == 0, "row-slice alignment needs bh*cpg % 16 == 0"
    if fold == "band":
        assert p % 128 == 0, "band fold needs lane-aligned tap columns"
    fy, fx = fx_scales(ph, pw)
    ly2, lx2 = fy.bit_length() - 1, fx.bit_length() - 1
    # slab row-count padded so phr*cpg is a 16-multiple (sublane tiling);
    # the extra hat row gets zero weight (clamped ly never reaches it)
    phr = _round_up(ph * cpg, 16) // cpg
    dt = xp.dtype

    kern = functools.partial(_kernel, p=p, k=k, kw=kw, dg=dg, cpg=cpg,
                             ph=ph, pw=pw, bh=bh, nby=nby, nbx=nbx,
                             ly2=ly2, lx2=lx2, fold=fold,
                             use_roll=False, gemm=gemm)  # Mosaic: no bf16 rotate
    flops = 2 * n_all * dg * (q * 128 * phr * cpg) + 2 * n_all * p * wt.size
    nbyx = nby * nbx

    if gemm == "taps":
        # rows (g, c) per tap: (k, dg*cpg, cout)
        wt_in = wt.reshape(dg, k, cpg, cout).transpose(1, 0, 2, 3).reshape(
            k, dg * cpg, cout)
        wt_spec = pl.BlockSpec((k, dg * cpg, cout), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)
        s_scratch = pltpu.VMEM((dg * cpg, q), dt)
    else:
        wt_in = wt
        wt_spec = pl.BlockSpec((dg * k * cpg, cout), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)
        s_scratch = pltpu.VMEM((dg * k * cpg, p), dt)

    def out_index(i):
        return (i // nbyx, (i % nbyx) // nbx, i % nbx, 0)

    out = pl.pallas_call(
        kern,
        grid=(n_all,),
        in_specs=[
            pl.BlockSpec((1, dg * 2, q), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, q), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            wt_spec,
        ],
        out_specs=pl.BlockSpec((1, bh, bw, cout), out_index,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_, nby * bh, nbx * bw, cout), dt),
        scratch_shapes=[
            pltpu.VMEM((2, dg, phr * cpg, 128), dt),
            s_scratch,
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n_all * (dg * phr * cpg * 128 * 2
                                    + dg * 2 * q * 2 + dg * q * 2),
            transcendentals=0),
        interpret=interpret,
    )(lyx.reshape(n_all, dg * 2, q), m, xp, wt_in)
    return out


# --------------------------------------------------------------- backward
#
# Training backward for the frame kernel (replaces the reference's
# atomicAdd col2im / col2im_coord CUDA kernels,
# deform_conv_cuda_kernel.cu:636-773, with a transposed formulation that
# chooses its own residual layouts): per block, recompute the forward
# sampling (cheaper than saving the 4-8x-padded intermediates that made
# the XLA block path OOM at batch 8, PERF_NOTES round-2), then
#
#   dS  = W @ G^T                      (tap-GEMM transpose, MXU)
#   dW += S @ G                        (accumulated across the whole grid)
#   dh  = (dS*m) (x) wy               (outer expansion on the VPU)
#   dpg = dh @ wx^T                    (sampling-matmul transpose, MXU)
#   dty = sum_c (dS*m) * fold(h, wy')  (derivative vertical hat)
#   dtx = sum_c (dS*m) * fold(pg@wx', wy)
#   dm  = sum_c  dS    * fold(h, wy)   (unmasked samples)
#
# dpg leaves the kernel in non-overlapping block-strided form; the XLA
# epilogue overlap-adds the halo windows back into the frame (the
# scatter-free equivalent of the CUDA atomicAdd loop).


def _bwd_kernel(lyx_ref, m_ref, xp_ref, wt_ref, g_ref, dpg_ref, dcrd_ref,
                dw_ref, slab_ref, wx_ref, wy_ref, h_ref, s_ref,
                sem_ref, *, p, k, kw, dg, cpg, ph, pw, bh, nby, nbx,
                ly2, lx2, fold_mode):
    dt = slab_ref.dtype
    i = pl.program_id(0)
    n = pl.num_programs(0)
    phr = slab_ref.shape[2] // cpg
    pw_built = _round_up(pw, 16)

    def slab_dma(slot, blk):
        b = blk // (nby * nbx)
        r = blk % (nby * nbx)
        by = r // nbx
        bx = r % nbx
        return pltpu.make_async_copy(
            xp_ref.at[b, :, bx, pl.ds(by * bh * cpg, phr * cpg), :],
            slab_ref.at[slot],
            sem_ref.at[slot],
        )

    @pl.when(i == 0)
    def _():
        wx_ref[:, :] = jnp.zeros_like(wx_ref)
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        if fold_mode == "band":
            # dh scratch: per-tap band writes below never touch cells
            # outside [tr, tr+ph-3] x tap-cols; zero once so the dpg
            # matmul sees exact zeros there (wy is 0 outside the band)
            h_ref[:, :] = jnp.zeros_like(h_ref)
        slab_dma(0, i).start()

    @pl.when(i + 1 < n)
    def _():
        slab_dma((i + 1) % 2, i + 1).start()

    slab_dma(i % 2, i).wait()
    slot = i % 2

    io_q = jax.lax.broadcasted_iota(jnp.int32, (pw_built, 1), 0)
    io_p = jax.lax.broadcasted_iota(jnp.int32, (phr, 1), 0)
    gout = g_ref[0].reshape(p, g_ref.shape[-1])
    # dS = W @ G^T: (K, p)
    dS = jax.lax.dot_general(
        wt_ref[:, :], gout, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dt)

    def fold(hm, w):
        s = hm[0:cpg, :] * w[0:1, :]
        for pp in range(1, phr):
            s = s + hm[pp * cpg:(pp + 1) * cpg, :] * w[pp:pp + 1, :]
        return s

    def csum(v):
        # sum over the cpg sublane rows -> (1, q)
        rows = cpg
        while rows > 1:
            rows //= 2
            v = v[0:rows, :] + v[rows:2 * rows, :]
        return v

    for g in range(dg):
        lyi = lyx_ref[0, 2 * g:2 * g + 1, :].astype(jnp.int32)
        y2c = jnp.int32(ly2)
        y0i = jax.lax.shift_right_logical(lyi, y2c)
        ty = (lyi - jax.lax.shift_left(y0i, y2c)).astype(dt) * (2.0 ** -ly2)
        mask = m_ref[0, g:g + 1, :].astype(dt)
        e0y = (io_p == y0i).astype(dt)
        e1y = (io_p == y0i + 1).astype(dt)
        wy_ref[:, :] = e0y * (1 - ty) + e1y * ty
        lxi = lyx_ref[0, 2 * g + 1:2 * g + 2, :].astype(jnp.int32)
        x2c = jnp.int32(lx2)
        x0i = jax.lax.shift_right_logical(lxi, x2c)
        tx = (lxi - jax.lax.shift_left(x0i, x2c)).astype(dt) \
            * (2.0 ** -lx2)
        wx_ref[0:pw_built, :] = ((io_q == x0i).astype(dt) * (1 - tx)
                                 + (io_q == x0i + 1).astype(dt) * tx)
        wx_cur = wx_ref[:, :]
        pg = slab_ref[slot, g].reshape(phr * cpg, 128)
        if fold_mode == "band":
            # Banded variant (Mosaic-validated, mirrors the fwd kernel's
            # fold='band'): per tap, only strips [tr, tr+ph-3] carry
            # nonzero wy, so the three folds, the csum stores, and the
            # dh expansion all run the band on that tap's lane-aligned
            # column window.  h stays an SSA value; h_ref holds dh only
            # (zeroed once at i==0, non-band cells never written).
            h = jnp.dot(pg, wx_cur,
                        preferred_element_type=jnp.float32).astype(dt)
            wx_ref[0:pw_built, :] = ((io_q == x0i + 1).astype(dt)
                                     - (io_q == x0i).astype(dt))
            hx = jnp.dot(pg, wx_ref[:, :],
                         preferred_element_type=jnp.float32).astype(dt)
            eyd = e1y - e0y
            nstr = ph - 2
            for kk in range(k):
                tr = kk // kw
                hi = min(tr + nstr, phr)
                cols = slice(kk * p, (kk + 1) * p)
                row = (g * k + kk) * cpg

                def bfold(src, wt2d):
                    sb = (src[tr * cpg:(tr + 1) * cpg, cols]
                          * wt2d[tr:tr + 1, cols])
                    for pp in range(tr + 1, hi):
                        sb = sb + (src[pp * cpg:(pp + 1) * cpg, cols]
                                   * wt2d[pp:pp + 1, cols])
                    return sb

                ds_k = dS[row:row + cpg, :]          # (cpg, p), no concat
                mask_k = mask[:, cols]
                dsm_k = ds_k * mask_k
                s_nm_k = bfold(h, wy_ref)
                sy_k = bfold(h, eyd)
                sx_k = bfold(hx, wy_ref)
                dcrd_ref[0, 3 * g:3 * g + 1, cols] = csum(
                    dsm_k * sy_k).astype(jnp.float32)
                dcrd_ref[0, 3 * g + 1:3 * g + 2, cols] = csum(
                    dsm_k * sx_k).astype(jnp.float32)
                dcrd_ref[0, 3 * g + 2:3 * g + 3, cols] = csum(
                    ds_k * s_nm_k).astype(jnp.float32)
                s_ref[row:row + cpg, :] = s_nm_k * mask_k
                for pp in range(tr, hi):
                    h_ref[pp * cpg:(pp + 1) * cpg, cols] = (
                        dsm_k * wy_ref[pp:pp + 1, cols])
            dpg_ref[0, g] = jax.lax.dot_general(
                h_ref[:, :], wx_cur, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dt).reshape(
                    dpg_ref.shape[2:])
            # (wx_ref rows above pw_built stay 0 for the next group)
            continue
        h_ref[:, :] = jnp.dot(pg, wx_cur,
                              preferred_element_type=jnp.float32).astype(dt)
        h = h_ref[:, :]
        s_nm = fold(h, wy_ref[:, :])          # unmasked samples (cpg, q)
        sy = fold(h, e1y - e0y)               # d/d ty samples

        # ds rows for this group: (cpg, q) from the (K, p) tap-GEMM grad
        ds_cols = []
        for kk in range(k):
            row = (g * k + kk) * cpg
            ds_cols.append(dS[row:row + cpg, :])
        ds = jnp.concatenate(ds_cols, axis=1)  # (cpg, q) q tap-major
        dsm = ds * mask

        dcrd_ref[0, 3 * g:3 * g + 1, :] = csum(dsm * sy).astype(jnp.float32)
        dcrd_ref[0, 3 * g + 2:3 * g + 3, :] = csum(
            ds * s_nm).astype(jnp.float32)

        # masked samples into s_ref for the dW GEMM
        s_m = s_nm * mask
        for kk in range(k):
            row = (g * k + kk) * cpg
            s_ref[row:row + cpg, :] = s_m[:, kk * p:(kk + 1) * p]

        # dh = dsm (x) wy, overwriting h (no longer needed)
        for pp in range(phr):
            h_ref[pp * cpg:(pp + 1) * cpg, :] = dsm * wy_ref[pp:pp + 1, :]
        dpg_ref[0, g] = jax.lax.dot_general(
            h_ref[:, :], wx_cur, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dt).reshape(
                dpg_ref.shape[2:])

        # d/d tx: horizontal derivative hat
        wx_ref[0:pw_built, :] = ((io_q == x0i + 1).astype(dt)
                                 - (io_q == x0i).astype(dt))
        exd_cur = wx_ref[:, :]
        hx = jnp.dot(pg, exd_cur,
                     preferred_element_type=jnp.float32).astype(dt)
        sx = fold(hx, wy_ref[:, :])
        dcrd_ref[0, 3 * g + 1:3 * g + 2, :] = csum(dsm * sx).astype(
            jnp.float32)
        # restore the plain hat for the next group's zero tail (tail rows
        # were zeroed once at i==0 and never written above pw_built)

    dw_ref[:, :] += jax.lax.dot_general(
        s_ref[:, :], gout, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def dcn_frame_fused_bwd(xp, lyx, m, wt, gout, *, cpg, bh, bw, ph, pw,
                        nby, nbx, k=9, kw=3, fold="slices",
                        interpret=False):
    """Backward pass: returns (dpg_blocks, dcoord, dW).

    dpg_blocks (n, dg, phr*cpg, 128): per-block halo-window cotangents in
    the slab layout (fold back with the XLA overlap-add epilogue).
    dcoord (n, dg*3, q) f32: rows (3g, 3g+1, 3g+2) = (d ty, d tx, d mask).
    dW (dg*k*cpg, cout) f32 in the tap-GEMM layout.
    """
    b_, dg, nbx_, hpc, lanes = xp.shape
    assert nbx_ == nbx and lanes == 128
    cout = wt.shape[-1]
    n_all, dg2, q = lyx.shape
    p = q // k
    fy, fx = fx_scales(ph, pw)
    ly2, lx2 = fy.bit_length() - 1, fx.bit_length() - 1
    phr = _round_up(ph * cpg, 16) // cpg
    dt = xp.dtype
    nbyx = nby * nbx

    def blk_index(i):
        return (i // nbyx, (i % nbyx) // nbx, i % nbx, 0)

    if fold == "band":
        assert p % 128 == 0, "band fold needs lane-aligned tap columns"
    kern = functools.partial(_bwd_kernel, p=p, k=k, kw=kw, dg=dg, cpg=cpg,
                             ph=ph, pw=pw, bh=bh, nby=nby, nbx=nbx,
                             ly2=ly2, lx2=lx2, fold_mode=fold)
    dpg, dcrd, dw = pl.pallas_call(
        kern,
        grid=(n_all,),
        in_specs=[
            pl.BlockSpec((1, dg * 2, q), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg, q), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((dg * k * cpg, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bh, bw, cout), blk_index,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, dg, phr * cpg, 128), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, dg * 3, q), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dg * k * cpg, cout), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n_all, dg, phr * cpg, 128), dt),
            jax.ShapeDtypeStruct((n_all, dg * 3, q), jnp.float32),
            jax.ShapeDtypeStruct((dg * k * cpg, cout), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, dg, phr * cpg, 128), dt),
            pltpu.VMEM((128, q), dt),
            pltpu.VMEM((phr, q), dt),
            pltpu.VMEM((phr * cpg, q), dt),
            pltpu.VMEM((dg * k * cpg, p), dt),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * n_all * dg * (q * 128 * phr * cpg),
            bytes_accessed=n_all * dg * phr * cpg * 128 * 4,
            transcendentals=0),
        interpret=interpret,
    )(lyx.reshape(n_all, dg * 2, q), m, xp, wt, gout)
    return dpg, dcrd, dw
