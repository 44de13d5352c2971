"""Block-wise MXU formulation of DCNv2 — the TPU fast path.

Motivation (measured on TPU v5e): per-position XLA gathers run at ~210M
rows/s regardless of width, so the exact gather-based DCN is *count-bound*
(~450M gathers per full-res call → seconds per layer).  This formulation
eliminates per-position gathers entirely:

  1. the frame is cut into (bh x bw) pixel blocks, and one dense strided
     patch extraction materializes each block's (bh+2R+3, bw+2R+3) halo
     neighborhood (R = max offset magnitude),
  2. offsets are clamped to [-R, R] (the reference itself contemplated a
     +/-32 Hardtanh clamp, dcn/deform_conv.py:268),
  3. bilinear sampling becomes interpolation-matrix contractions: a
     vertical (q x PH) @ (PH x PW*cpg) einsum on the MXU followed by a
     horizontal weighted reduce on the VPU, then the usual column-weight
     GEMM.  The interpolation matrices are built with iota comparisons
     (2 nonzeros per row) — no gathers anywhere.

Within the clamp the result matches the exact op bit-for-bit in f32
(zero padding outside the image included), and the whole thing is
differentiable (the matrices depend smoothly on the offsets, exactly like
the gather formulation's bilinear weights).

Constraints: stride=1, dilation=1, 3x3 kernel, groups=1 — the only DCN
configuration the RealVSR model zoo uses.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def modulated_deform_conv_block(x: jax.Array, offset: jax.Array,
                                mask: jax.Array | None, weight: jax.Array,
                                bias: jax.Array | None = None,
                                padding: int = 1,
                                deformable_groups: int = 8,
                                max_offset: int = 8,
                                block: tuple[int, int] = (8, 16),
                                chunk_blocks: int = 128,
                                compute_dtype=None,
                                use_pallas: bool = False,
                                pallas_interpret: bool = False,
                                frame_fold: str = "band",
                                frame_gemm: str = "big") -> jax.Array:
    """DCNv2 with offsets clamped to [-max_offset, max_offset], NHWC.

    Semantics otherwise match
    :func:`realvsr_tpu.ops.deform_conv.modulated_deform_conv`
    (stride=1, dilation=1, 3x3 kernel, groups=1, with bilinear zero padding
    outside the image).
    """
    b, h, w, cin = x.shape
    kh, kw, cin_g, cout = weight.shape
    assert (kh, kw) == (3, 3) and padding == 1, "block path: 3x3/s1/p1 only"
    if use_pallas == "frame" and block == (8, 16):
        block = (4, 64)  # measured fastest (round-3 geometry sweep,
        # PERF_NOTES.md); bw=64 halves the panel duplication and DMA
    k = kh * kw
    dg = deformable_groups
    cpg = cin // dg
    r = int(max_offset)
    bh, bw = block
    dt = compute_dtype or x.dtype
    acc_t = jnp.float32 if dt in (jnp.bfloat16, jnp.float16, jnp.float32) else dt

    h_pad = (-h) % bh
    w_pad = (-w) % bw
    nby = (h + h_pad) // bh
    nbx = (w + w_pad) // bw
    ph = bh + 2 * r + 3
    pw = bw + 2 * r + 3

    if use_pallas == "frame":
        # v7 fast path: fused Pallas kernel with in-kernel frame DMA —
        # exits before the patch-extraction machinery below is traced.
        # fold='band' is the measured default (70.6 vs 74.4 ms/L1 call,
        # round-5 sweep) but needs lane-aligned tap columns; Mosaic also
        # rejects it at bw=32, so any non-default geometry falls back.
        if frame_fold == "band" and ((bh * bw) % 128 != 0 or bw < 64):
            frame_fold = "slices"
        return _frame_path(x, offset, mask, weight, bias, dg=dg, cpg=cpg,
                           r=r, bh=bh, bw=bw, k=k, kw=kw, dt=dt,
                           interpret=pallas_interpret, fold=frame_fold,
                           gemm=frame_gemm)

    # zero-pad: r+1 before (tap -1 plus max negative offset), r+2+align
    # after, plus one extra block so partial q-group slices stay full-stride
    x_pad = jnp.pad(
        x.astype(dt),
        ((0, 0), (r + 1, r + 2 + h_pad + bh), (r + 1, r + 2 + w_pad + bw),
         (0, 0)))

    # halo'd block patches via two-stage strided slice-stacks (pure copies;
    # conv_general_dilated_patches lowers as a real PH*PW-tap conv — ~700
    # GMAC of hidden work at full-res, measured 10x the rest of the op).
    # A custom VJP folds patch gradients back with two-stage scatter-adds:
    # the autodiff transpose of the slice-stack materializes a 128x-padded
    # per-slice cotangent (measured 1.4 GB per slice on TPU).
    wp = x_pad.shape[2]
    hp = x_pad.shape[1]
    n_all = b * nby * nbx

    # Patch extraction via the stride/width factorization: writing the patch
    # row index as dy = qy*bh + sy (qy < ceil(ph/bh)), the qy-th group of
    # patch rows for ALL blocks is one contiguous reshape of x_pad rows
    # [qy*bh : qy*bh + nby*bh] — so the whole extraction is ~ceil(ph/bh) +
    # ceil(pw/bw) slices/reshapes with healthy layouts (jnp.stack-per-offset
    # variants materialize singleton-minor slices that TPU lane-pads 128x;
    # conv_general_dilated_patches lowers as a real PH*PW-tap conv).
    nqy = -(-ph // bh)
    nqx = -(-pw // bw)

    @jax.custom_vjp
    def extract_patches(xp):
        row_groups = []
        for qy in range(nqy):
            sh_ = min(bh, ph - qy * bh)
            sl = jax.lax.slice(xp, (0, qy * bh, 0, 0),
                               (b, qy * bh + nby * bh, wp, cin))
            sl = sl.reshape(b, nby, bh, wp, cin)[:, :, :sh_]
            row_groups.append(sl)
        rows = jnp.concatenate(row_groups, axis=2)  # (B, nby, PH, Wp, C)
        col_groups = []
        for qx in range(nqx):
            sw_ = min(bw, pw - qx * bw)
            sl = jax.lax.slice(rows, (0, 0, 0, qx * bw, 0),
                               (b, nby, ph, qx * bw + nbx * bw, cin))
            sl = sl.reshape(b, nby, ph, nbx, bw, cin)[:, :, :, :, :sw_]
            col_groups.append(sl)
        pats = jnp.concatenate(col_groups, axis=4)  # (B, nby, PH, nbx, PW, C)
        return pats.transpose(0, 1, 3, 2, 4, 5).reshape(
            n_all, ph, pw, dg, cpg)

    def _ep_fwd(xp):
        return extract_patches(xp), None

    def _ep_bwd(_, g):
        g6 = g.reshape(b, nby, nbx, ph, pw, cin).transpose(0, 1, 3, 2, 4, 5)
        # fold dx groups back into rows cotangent
        d_rows = jnp.zeros((b, nby, ph, wp, cin), g.dtype)
        for qx in range(nqx):
            sw_ = min(bw, pw - qx * bw)
            gslice = g6[:, :, :, :, qx * bw:qx * bw + sw_]  # (B,nby,PH,nbx,sw,C)
            if sw_ < bw:
                gslice = jnp.pad(gslice,
                                 ((0, 0),) * 4 + ((0, bw - sw_), (0, 0)))
            flat = gslice.reshape(b, nby, ph, nbx * bw, cin)
            cur = jax.lax.slice(
                d_rows, (0, 0, 0, qx * bw, 0),
                (b, nby, ph, qx * bw + nbx * bw, cin))
            d_rows = jax.lax.dynamic_update_slice(
                d_rows, cur + flat, (0, 0, 0, qx * bw, 0))
        # fold dy groups back into the padded-frame cotangent
        dxp = jnp.zeros(x_pad.shape, g.dtype)
        for qy in range(nqy):
            sh_ = min(bh, ph - qy * bh)
            gslice = d_rows[:, :, qy * bh:qy * bh + sh_]  # (B, nby, sh, Wp, C)
            if sh_ < bh:
                gslice = jnp.pad(gslice,
                                 ((0, 0), (0, 0), (0, bh - sh_), (0, 0),
                                  (0, 0)))
            flat = gslice.reshape(b, nby * bh, wp, cin)
            cur = jax.lax.slice(dxp, (0, qy * bh, 0, 0),
                                (b, qy * bh + nby * bh, wp, cin))
            dxp = jax.lax.dynamic_update_slice(dxp, cur + flat,
                                               (0, qy * bh, 0, 0))
        return (dxp,)

    extract_patches.defvjp(_ep_fwd, _ep_bwd)
    patches = extract_patches(x_pad)

    # offsets / mask on the block grid, minor dims kept flattened so TPU
    # lane padding stays ~2x instead of 14-64x (these tensors are saved for
    # the backward pass at training time)
    off = offset.reshape(b, h, w, dg * k * 2).astype(jnp.float32)
    off = jnp.clip(off, -float(r), float(r))
    off = jnp.pad(off, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
    off = off.reshape(b, nby, bh, nbx, bw, dg * k * 2).transpose(
        0, 1, 3, 2, 4, 5).reshape(n_all, bh, bw, dg * k * 2)
    if mask is not None:
        msk = mask.reshape(b, h, w, dg * k).astype(dt)
        msk = jnp.pad(msk, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
        msk = msk.reshape(b, nby, bh, nbx, bw, dg * k).transpose(
            0, 1, 3, 2, 4, 5).reshape(n_all, bh, bw, dg * k)
    else:
        msk = None

    # local coordinate helpers (applied per chunk; see _coords)
    pyl = jnp.arange(bh, dtype=jnp.float32)[None, :, None, None, None]
    pxl = jnp.arange(bw, dtype=jnp.float32)[None, None, :, None, None]
    ki = (jnp.arange(k, dtype=jnp.float32) // kw)[None, None, None, None, :]
    kj = (jnp.arange(k, dtype=jnp.float32) % kw)[None, None, None, None, :]

    def _coords(off_c):
        """(ch, bh, bw, dg*k*2) → ly, lx of shape (ch, bh, bw, dg, k)."""
        oc = off_c.reshape(off_c.shape[0], bh, bw, dg, k, 2)
        ly_c = pyl + r + ki + oc[..., 0]
        lx_c = pxl + r + kj + oc[..., 1]
        return ly_c, lx_c

    # weight per tap/group: (k, dg, cpg, cout) → used in the final einsum
    wt = weight.astype(dt).reshape(k, dg, cpg, cout)

    if use_pallas:
        from realvsr_tpu.ops.pallas.dcn_block_kernel import dcn_block_fused

        qn = bh * bw * k
        # patch rows (P, c)-major with PW minor: (n, dg, PH*cpg, PW)
        pg_m = patches.transpose(0, 3, 1, 4, 2).reshape(
            n_all, dg, ph * cpg, pw)
        # coordinate tensor (n, dg, 3, q) f32: ly, lx, mask — q tap-major;
        # the Wy/Wx matrices are built in-kernel from these (building them
        # here costs ~14 GB of HBM traffic per full-res call)
        ly_c, lx_c = _coords(off)       # (n, bh, bw, dg, k)
        to_q = lambda a: a.transpose(0, 3, 4, 1, 2).reshape(n_all, dg, qn)
        m_full = (jnp.ones((n_all, bh, bw, dg, k), jnp.float32)
                  if msk is None else
                  msk.reshape(n_all, bh, bw, dg, k).astype(jnp.float32))
        coords = jnp.stack(
            [to_q(ly_c), to_q(lx_c), to_q(m_full)], axis=2)
        # tap-GEMM weights, rows (g, tap, c): (dg*k*cpg, cout)
        wt_g = weight.astype(dt).reshape(k, dg, cpg, cout).transpose(
            1, 0, 2, 3).reshape(dg * k * cpg, cout)
        out = dcn_block_fused(pg_m, coords, wt_g, cpg=cpg, k=k,
                              interpret=pallas_interpret)
        out = out.reshape(b, nby, nbx, bh, bw, cout).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, nby * bh, nbx * bw, cout)[:, :h, :w]
        if bias is not None:
            out = out + bias.astype(dt)
        return out

    q = bh * bw * k
    iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, 1, ph), 5)
    iota_q = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, 1, 1, pw), 5)

    # pad n_all to a multiple of chunk
    ch = chunk_blocks
    n_pad = (-n_all) % ch
    if n_pad:
        patches = jnp.pad(patches, ((0, n_pad),) + ((0, 0),) * 4)
        off = jnp.pad(off, ((0, n_pad),) + ((0, 0),) * 3)
        if msk is not None:
            msk = jnp.pad(msk, ((0, n_pad),) + ((0, 0),) * 3)
    n_chunks = (n_all + n_pad) // ch

    def process(chunk_idx):
        s = chunk_idx * ch
        pg = jax.lax.dynamic_slice_in_dim(patches, s, ch, 0)
        off_c = jax.lax.dynamic_slice_in_dim(off, s, ch, 0)
        ly_c, lx_c = _coords(off_c)
        m_c = None if msk is None else jax.lax.dynamic_slice_in_dim(
            msk, s, ch, 0).reshape(ch, bh, bw, dg, k)

        y0 = jnp.floor(ly_c)
        ty = (ly_c - y0).astype(dt)
        x0 = jnp.floor(lx_c)
        tx = (lx_c - x0).astype(dt)
        y0i = y0.astype(jnp.int32)[..., None]
        x0i = x0.astype(jnp.int32)[..., None]

        # Wy: (ch, bh, bw, dg, k, PH); Wx: (ch, bh, bw, dg, k, PW)
        wy = ((iota_p == y0i).astype(dt) * (1 - ty)[..., None]
              + (iota_p == y0i + 1).astype(dt) * ty[..., None])
        wx = ((iota_q == x0i).astype(dt) * (1 - tx)[..., None]
              + (iota_q == x0i + 1).astype(dt) * tx[..., None])
        if m_c is not None:
            wx = wx * m_c[..., None]

        # q = (bh, bw, k) flattened per group
        wy_q = wy.transpose(0, 3, 1, 2, 4, 5).reshape(ch, dg, q, ph)
        wx_q = wx.transpose(0, 3, 1, 2, 4, 5).reshape(ch, dg, q, pw)

        # vertical contraction over PH (MXU); pg is (ch, PH, PW, dg, cpg)
        v = jnp.einsum("ngqP,nPQgc->ngqQc", wy_q, pg,
                       preferred_element_type=dt)
        # horizontal: weighted reduce over PW — VPU
        sampled = jnp.einsum("ngqQ,ngqQc->ngqc", wx_q, v,
                             preferred_element_type=dt)
        # final GEMM with the conv weights: q = (p, k)
        sampled = sampled.reshape(ch, dg, bh * bw, k, cpg)
        out = jnp.einsum("ngpkc,kgco->npo", sampled, wt,
                         preferred_element_type=acc_t)
        return out.astype(dt)  # (ch, bh*bw, cout)

    # remat: without this, lax.map's backward saves every chunk's v
    # intermediate (~80 GB at training shapes); recompute it instead
    out = jax.lax.map(jax.checkpoint(process), jnp.arange(n_chunks))
    out = out.reshape(n_chunks * ch, bh * bw, cout)[:n_all]
    out = out.reshape(b, nby, nbx, bh, bw, cout).transpose(0, 1, 3, 2, 4, 5)
    out = out.reshape(b, nby * bh, nbx * bw, cout)[:, :h, :w]
    if bias is not None:
        out = out + bias.astype(dt)
    return out


# _frame_prep pins the fixed-point encode to the flat (b, hh, ww, dk2)
# int16 layout with an optimization_barrier, unconditionally.  Without it
# XLA's reshape-mover sinks the block reshape ABOVE the encode arithmetic,
# materializing f32 6-D temps: at 1088x1920 L1 shapes that is a 7.17G
# allocation that OOMs the full-frame 1080p compile, and at the 1024x512
# bench shape it costs two extra f32 materializations (chip-measured
# round 5: one_shot 15.19 -> 6.87 ms/call with the barrier, two_stage
# 10.96 -> 9.54; the barriered one_shot single transpose is the fastest
# variant and is the default).


def _frame_geom(h, w, cpg, r, bh, bw):
    h_pad = (-h) % bh
    w_pad = (-w) % bw
    return dict(
        h_pad=h_pad, w_pad=w_pad,
        nby=(h + h_pad) // bh, nbx=(w + w_pad) // bw,
        ph=bh + 2 * r + 3, pw=bw + 2 * r + 3,
        phr=-(-(bh + 2 * r + 3) * cpg // 16) * 16 // cpg)


def _frame_prep(x, offset, mask, weight, *, dg, cpg, r, bh, bw, k, kw, dt,
                relayout: str = "one_shot"):
    """Kernel-input prep shared by forward and backward: halo column
    panels, fixed-point int16 positions (one fused elementwise transform +
    one relayout — the v7 f32 coords stack profiler-attributed at
    ~40 ms/full-res call), bf16 mask in q-order, tap-GEMM weights."""
    from realvsr_tpu.ops.pallas.dcn_frame_kernel import fx_scales

    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    g = _frame_geom(h, w, cpg, r, bh, bw)
    h_pad, w_pad, nby, nbx = g["h_pad"], g["w_pad"], g["nby"], g["nbx"]
    ph, pw, phr = g["ph"], g["pw"], g["phr"]
    n_all = b * nby * nbx
    p = bh * bw
    qn = p * k
    # padded frame with the halo origin and enough rows for phr slabs
    xg = jnp.pad(
        x.astype(dt),
        ((0, 0), (r + 1, r + 2 + h_pad + (phr - ph)),
         (r + 1, r + 2 + w_pad), (0, 0)))
    hp2, wp2 = xg.shape[1], xg.shape[2]
    # (B, dg, Hp*cpg, Wp) rows (H, c)-major per group, via a minor-dim swap
    # then a major-block move (the direct 5D transpose drags cpg=8 through
    # the lane dimension)
    xr = jnp.swapaxes(xg, 2, 3)                      # (B, Hp, C, Wp)
    xr = xr.reshape(b, hp2, dg, cpg, wp2).transpose(0, 2, 1, 3, 4)
    xr = xr.reshape(b, dg, hp2 * cpg, wp2)
    # overlapping column panels: stride bw, width 128 (lane-aligned DMA).
    # A 64-lane window (halving panel HBM traffic, the slab DMA, and the
    # sampling matmul's K depth) was built and interpret-verified in round
    # 5 but the REAL Mosaic toolchain rejects ANY non-128 minor dim in
    # kernel DMAs/outputs (minimal probe: a bare (16, 64) VMEM scratch +
    # async_copy fails tpu_compile_helper) -- structurally dead on v5e,
    # removed per the round-4 interpret-only lesson.
    wfull = (nbx - 1) * bw + 128
    if wp2 < wfull:
        xr = jnp.pad(xr, ((0, 0),) * 3 + ((0, wfull - wp2),))
    xp = jnp.stack(
        [jax.lax.slice_in_dim(xr, bx * bw, bx * bw + 128, axis=3)
         for bx in range(nbx)], axis=2)  # (B, dg, nbx, Hp*cpg, 128)

    # fixed-point block-local positions, one fused elementwise transform:
    # ly = (y % bh) + r + tap_row + clip(dy), scaled by a static power of
    # two and rounded to int16 (<= 1/256-px quantization)
    fy, fx = fx_scales(ph, pw)
    hh, ww = h + h_pad, w + w_pad
    dk2 = dg * k * 2
    if relayout == "two_stage":
        # channel order (dg, comp, k): the encode's input gather pulls the
        # (dg, k, 2) offset channels into comp-major order so the q-major
        # emit below is [block-gather with intact minor dims] + [one clean
        # batched (p, c) -> (c, p) minor-2D transpose] instead of the 8D
        # transpose XLA lowered as 3 copy stages (~7.6 ms/full-res call,
        # PERF_NOTES round-3 trace)
        ci = jnp.arange(dk2)
        gix = ci // (2 * k)
        comp = (ci // k) % 2
        tap = ci % k
        src = gix * (2 * k) + tap * 2 + comp
        base_t = jnp.where(comp == 0, tap // kw, tap % kw).astype(
            jnp.float32) + r
        scale = jnp.where(comp == 0, float(fy), float(fx))
        py = (jnp.arange(hh) % bh).astype(jnp.float32)[:, None, None]
        px = (jnp.arange(ww) % bw).astype(jnp.float32)[None, :, None]
        pos = jnp.where(comp == 0, py, px) + base_t      # (hh, ww, dk2)
        offp = jnp.pad(offset.reshape(b, h, w, dk2),
                       ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))[..., src]
        val = (jnp.clip(offp.astype(jnp.float32), -float(r), float(r))
               + pos)
        fxp = jnp.round(val * scale).astype(jnp.int16)   # (b,hh,ww,(g,c,k))
        # pin the encode to the flat int16 layout (see module comment: the
        # unbarriered fusion OOMs 1080p compiles and is slower at bench)
        fxp = jax.lax.optimization_barrier(fxp)
        t1 = fxp.reshape(b, nby, bh, nbx, bw, dk2).transpose(
            0, 1, 3, 2, 4, 5)                            # minor dims intact
        lyx = t1.reshape(n_all, p, dk2).transpose(0, 2, 1).reshape(
            n_all, dg * 2, qn)                           # q = (k, p) free
        if mask is None:
            m_q = jnp.ones((n_all, dg, qn), dt)
        else:
            mp = jnp.pad(mask.reshape(b, h, w, dg * k).astype(dt),
                         ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
            m1 = mp.reshape(b, nby, bh, nbx, bw, dg * k).transpose(
                0, 1, 3, 2, 4, 5)
            m_q = m1.reshape(n_all, p, dg * k).transpose(0, 2, 1).reshape(
                n_all, dg, qn)
    else:
        ci = jnp.arange(dk2)
        tap = (ci // 2) % k
        is_y = (ci % 2) == 0
        base_t = jnp.where(is_y, tap // kw, tap % kw).astype(
            jnp.float32) + r
        scale = jnp.where(is_y, float(fy), float(fx))
        py = (jnp.arange(hh) % bh).astype(jnp.float32)[:, None, None]
        px = (jnp.arange(ww) % bw).astype(jnp.float32)[None, :, None]
        pos = jnp.where(is_y, py, px) + base_t           # (hh, ww, dk2)
        offp = jnp.pad(offset.reshape(b, h, w, dk2),
                       ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
        val = (jnp.clip(offp.astype(jnp.float32), -float(r), float(r))
               + pos)
        fxp = jnp.round(val * scale).astype(jnp.int16)   # (b, hh, ww, dk2)
        # pin the encode to the flat int16 layout (see module comment)
        fxp = jax.lax.optimization_barrier(fxp)
        # one relayout -> rows (g, comp) with q = (tap, y, x) tap-major
        lyx = fxp.reshape(b, nby, bh, nbx, bw, dg, k, 2).transpose(
            0, 1, 3, 5, 7, 6, 2, 4).reshape(n_all, dg * 2, qn)
        if mask is None:
            m_q = jnp.ones((n_all, dg, qn), dt)
        else:
            mp = jnp.pad(mask.reshape(b, h, w, dg * k).astype(dt),
                         ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
            m_q = mp.reshape(b, nby, bh, nbx, bw, dg, k).transpose(
                0, 1, 3, 5, 6, 2, 4).reshape(n_all, dg, qn)
    wt_g = weight.astype(dt).reshape(k, dg, cpg, cout).transpose(
        1, 0, 2, 3).reshape(dg * k * cpg, cout)
    return xp, lyx, m_q, wt_g, g, (hp2, wp2, wfull)


def _fold_dpg(dpg, *, b, dg, cpg, bh, bw, r, h, w, geom, hp2, wp2, wfull,
              out_dtype):
    """Overlap-add the per-block halo-window cotangents back into dx —
    the scatter-free equivalent of the reference's atomicAdd col2im
    (deform_conv_cuda_kernel.cu:636-694)."""
    nby, nbx, phr = geom["nby"], geom["nbx"], geom["phr"]
    pc = phr * cpg
    bc = bh * cpg
    d6 = dpg.reshape(b, nby, nbx, dg, pc, 128).astype(jnp.float32)
    d6 = d6.transpose(0, 1, 3, 4, 2, 5)  # (b, nby, dg, pc, nbx, 128)
    # columns: panel bx covers absolute cols [bx*bw, bx*bw + 128)
    acc = jnp.zeros((b, nby, dg, pc, wfull), jnp.float32)
    for bx in range(nbx):
        acc = jax.lax.dynamic_update_slice_in_dim(
            acc,
            jax.lax.dynamic_slice_in_dim(acc, bx * bw, 128, axis=4)
            + d6[:, :, :, :, bx], bx * bw, axis=4)
    # rows: block by covers absolute rows [by*bc, by*bc + pc)
    hfull = (nby - 1) * bc + pc
    nqy = -(-pc // bc)
    # allocate (nby + nqy - 1)*bc rows: when pc % bc != 0 the last chunk's
    # update spans rows [(nqy-1)*bc, (nqy-1)*bc + nby*bc) > hfull, and
    # dynamic_update_slice would CLAMP the start, misplacing that chunk's
    # gradient by bc - pc%bc rows (advisor round-3 high finding)
    halloc = (nby + nqy - 1) * bc
    dxr = jnp.zeros((b, dg, halloc, wfull), jnp.float32)
    for qy in range(nqy):
        sh_ = min(bc, pc - qy * bc)
        sl = acc[:, :, :, qy * bc:qy * bc + sh_]      # (b, nby, dg, sh, W)
        if sh_ < bc:
            sl = jnp.pad(sl, ((0, 0),) * 3 + ((0, bc - sh_), (0, 0)))
        sl = sl.transpose(0, 2, 1, 3, 4).reshape(b, dg, nby * bc, wfull)
        cur = jax.lax.dynamic_slice_in_dim(dxr, qy * bc, nby * bc, axis=2)
        dxr = jax.lax.dynamic_update_slice_in_dim(dxr, cur + sl,
                                                  qy * bc, axis=2)
    dxr = dxr[:, :, :hfull]
    # back through the panel/row layout to the padded frame, then unpad
    dxr = jnp.pad(dxr, ((0, 0), (0, 0), (0, hp2 * cpg - hfull), (0, 0)))
    dxr = dxr[:, :, :, :wp2]
    dxg = dxr.reshape(b, dg, hp2, cpg, wp2).transpose(0, 2, 1, 3, 4)
    dxg = dxg.reshape(b, hp2, dg * cpg, wp2)
    dxg = jnp.swapaxes(dxg, 2, 3)                    # (b, hp2, wp2, cin)
    return dxg[:, r + 1:r + 1 + h, r + 1:r + 1 + w].astype(out_dtype)


def _fold_dcoord(dcrd, offset, mask, *, b, dg, k, kw, r, bh, bw, h, w, geom):
    """dcrd (n, dg*3, q) f32 -> (doffset, dmask) in the input layouts.
    Position quantization is straight-through; the clip gates the offset
    gradient exactly like jnp.clip's VJP (pass on [-r, r] inclusive)."""
    nby, nbx = geom["nby"], geom["nbx"]
    hh, ww = nby * bh, nbx * bw
    n_all = b * nby * nbx
    dk2 = dg * k * 2
    d8 = dcrd.reshape(b, nby, nbx, dg, 3, k, bh, bw)
    dyx = d8[:, :, :, :, 0:2]
    # inverse of the forward (0,1,3,5,7,6,2,4) relayout
    dyx = dyx.transpose(0, 1, 6, 2, 7, 3, 5, 4).reshape(b, hh, ww, dk2)
    dyx = dyx[:, :h, :w]
    off_b = offset.reshape(b, h, w, dk2).astype(jnp.float32)
    gate = (off_b >= -float(r)) & (off_b <= float(r))
    doff = jnp.where(gate, dyx, 0.0).astype(offset.dtype).reshape(
        offset.shape)
    dm8 = d8[:, :, :, :, 2:3]
    dm = dm8.transpose(0, 1, 6, 2, 7, 3, 5, 4).reshape(b, hh, ww, dg * k)
    dm = dm[:, :h, :w]
    dmask = None if mask is None else dm.astype(mask.dtype).reshape(
        mask.shape)
    return doff, dmask


def _frame_path(x, offset, mask, weight, bias, *, dg, cpg, r, bh, bw, k, kw,
                dt, interpret, fold="slices", gemm="big"):
    """v8 fused Pallas frame-DMA DCN with a custom VJP: the backward is a
    transposed Pallas kernel (ops/pallas/dcn_frame_kernel.py
    dcn_frame_fused_bwd) that recomputes the sampling per block instead of
    saving padded intermediates — this is what lets 192^2 batch-8 training
    fit (the XLA block path's saved residuals lane-pad 4-8x,
    PERF_NOTES.md round-2)."""
    from realvsr_tpu.ops.pallas.dcn_frame_kernel import (
        dcn_frame_fused, dcn_frame_fused_bwd)

    b, h, w, cin = x.shape
    cout = weight.shape[-1]
    qn = bh * bw * k
    geom = _frame_geom(h, w, cpg, r, bh, bw)
    statics = dict(dg=dg, cpg=cpg, r=r, bh=bh, bw=bw, k=k, kw=kw, dt=dt)

    @jax.custom_vjp
    def core(x_, off_, m_, w_):
        xp, lyx, m_q, wt_g, g, _ = _frame_prep(x_, off_, m_, w_, **statics)
        return dcn_frame_fused(
            xp, lyx, m_q, wt_g, cpg=cpg, bh=bh, bw=bw, ph=g["ph"],
            pw=g["pw"], nby=g["nby"], nbx=g["nbx"], k=k, kw=kw, fold=fold,
            gemm=gemm, interpret=interpret)

    def core_fwd(x_, off_, m_, w_):
        return core(x_, off_, m_, w_), (x_, off_, m_, w_)

    def core_bwd(res, gout):
        x_, off_, m_, w_ = res
        xp, lyx, m_q, wt_g, g, (hp2, wp2, wfull) = _frame_prep(
            x_, off_, m_, w_, **statics)
        dpg, dcrd, dw = dcn_frame_fused_bwd(
            xp, lyx, m_q, wt_g, gout.astype(dt), cpg=cpg, bh=bh, bw=bw,
            ph=g["ph"], pw=g["pw"], nby=g["nby"], nbx=g["nbx"], k=k,
            kw=kw, fold=fold, interpret=interpret)
        dx = _fold_dpg(dpg, b=b, dg=dg, cpg=cpg, bh=bh, bw=bw, r=r, h=h,
                       w=w, geom=g, hp2=hp2, wp2=wp2, wfull=wfull,
                       out_dtype=x_.dtype)
        doff, dmask = _fold_dcoord(dcrd, off_, m_, b=b, dg=dg, k=k, kw=kw,
                                   r=r, bh=bh, bw=bw, h=h, w=w, geom=g)
        dweight = dw.reshape(dg, k, cpg, cout).transpose(1, 0, 2, 3) \
            .reshape(w_.shape).astype(w_.dtype)
        if dmask is None:
            dmask = jnp.zeros_like(m_)
        return dx, doff, dmask, dweight

    core.defvjp(core_fwd, core_bwd)
    mask_in = (mask if mask is not None
               else jnp.ones((b, h, w, dg * k), x.dtype))
    out = core(x, offset, mask_in, weight)
    out = out[:, :h, :w]
    if bias is not None:
        out = out + bias.astype(dt)
    return out
