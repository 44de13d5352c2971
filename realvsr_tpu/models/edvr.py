"""EDVR / EDVR_NoUp — flagship VSR architecture (flax, NHWC, TPU-first).

Rebuilds the reference ``codes/models/archs/EDVR_arch.py`` with one key
TPU-side restructuring: the per-neighbor-frame PCD alignment loop
(EDVR_arch.py:297-303) is **batched over frames** — neighbor features are
folded into the batch axis and the reference frame is broadcast, so one
PCD application aligns all N frames (larger GEMMs, one trace).  Everything
else (pyramid construction, offset fusion with x2-scaled coarser offsets,
TSA attention, reconstruction + residual) matches the reference layer for
layer, including module names for checkpoint mapping.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from realvsr_tpu.models.common import (
    Blocks, Conv2d, DCNPack, FrameSumConv1x1, ResidualBlockNoBN,
    avg_pool_3x3_s2, conv3x3_fast_enabled, lrelu, max_pool_3x3_s2,
)
from realvsr_tpu.ops.pallas.conv3x3_kernel import pack_pairs, unpack_pairs
from realvsr_tpu.ops.resize import pixel_shuffle, resize_bilinear, upsample2x_bilinear

Dtype = Any


class PCDAlign(nn.Module):
    """Pyramid-Cascading-Deformable alignment (EDVR_arch.py:62-132)."""

    nf: int = 64
    groups: int = 8
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, nbr_fea_l, ref_fea_l, l1_packed=None):
        """nbr_fea_l / ref_fea_l: [L1, L2, L3] NHWC feature pyramids.

        ``l1_packed``: optional (nbr_p, ref_p) pair-packed views of the
        L1 operands, handed straight from the front chain's packed exit
        (models/edvr.py front_pyramid) so the packed offset chains skip
        the full-resolution re-pack retiles.  Ignored on the plain path.
        """
        nf, dt = self.nf, self.dtype
        conv = lambda name, cout=nf: Conv2d(cout, 3, dtype=dt, name=name)
        dcn = lambda name: DCNPack(nf, 3, padding=1, deformable_groups=self.groups,
                                   extra_offset_mask=True, dtype=dt, name=name)

        # Pair-packed offset-conv chains (ops/pallas/conv3x3_kernel.py):
        # concat inputs stay in their separately-packed lane layout and the
        # packed-weight K rows are permuted to match (packed_splits), so
        # the chains read packed directly and unpack only at the DCN
        # boundaries — no physical re-interleave copies.  Parameter names/
        # shapes are identical to the plain branch (checkpoint-compatible).
        if conv3x3_fast_enabled() and nbr_fea_l[0].shape[-2] % 64 == 0:
            return self._packed_chains(nbr_fea_l, ref_fea_l, conv, dcn,
                                       l1_packed)

        # L3
        l3_off = jnp.concatenate([nbr_fea_l[2], ref_fea_l[2]], axis=-1)
        l3_off = lrelu(conv("L3_offset_conv1")(l3_off))
        l3_off = lrelu(conv("L3_offset_conv2")(l3_off))
        l3_fea = lrelu(dcn("L3_dcnpack")(nbr_fea_l[2], l3_off))
        # L2
        l2_off = jnp.concatenate([nbr_fea_l[1], ref_fea_l[1]], axis=-1)
        l2_off = lrelu(conv("L2_offset_conv1")(l2_off))
        l3_off_up = upsample2x_bilinear(l3_off)
        l2_off = lrelu(conv("L2_offset_conv2")(
            jnp.concatenate([l2_off, l3_off_up * 2], axis=-1)))
        l2_off = lrelu(conv("L2_offset_conv3")(l2_off))
        l2_fea = dcn("L2_dcnpack")(nbr_fea_l[1], l2_off)
        l3_fea_up = upsample2x_bilinear(l3_fea)
        l2_fea = lrelu(conv("L2_fea_conv")(
            jnp.concatenate([l2_fea, l3_fea_up], axis=-1)))
        # L1
        l1_off = jnp.concatenate([nbr_fea_l[0], ref_fea_l[0]], axis=-1)
        l1_off = lrelu(conv("L1_offset_conv1")(l1_off))
        l2_off_up = upsample2x_bilinear(l2_off)
        l1_off = lrelu(conv("L1_offset_conv2")(
            jnp.concatenate([l1_off, l2_off_up * 2], axis=-1)))
        l1_off = lrelu(conv("L1_offset_conv3")(l1_off))
        l1_fea = dcn("L1_dcnpack")(nbr_fea_l[0], l1_off)
        l2_fea_up = upsample2x_bilinear(l2_fea)
        l1_fea = conv("L1_fea_conv")(jnp.concatenate([l1_fea, l2_fea_up], axis=-1))
        # Cascading
        off = jnp.concatenate([l1_fea, ref_fea_l[0]], axis=-1)
        off = lrelu(conv("cas_offset_conv1")(off))
        off = lrelu(conv("cas_offset_conv2")(off))
        l1_fea = lrelu(dcn("cas_dcnpack")(l1_fea, off))
        return l1_fea

    def _packed_chains(self, nbr_fea_l, ref_fea_l, conv, dcn,
                       l1_packed=None):
        """Offset-conv chains on the pair-packed layout (same math/params
        as the plain branch; lrelu fuses into the kernel epilogue)."""
        nf, dt = self.nf, self.dtype
        P, U = pack_pairs, unpack_pairs
        s2 = (nf, nf)
        if l1_packed is not None:
            nbr1_p, ref1_p = l1_packed
        else:
            nbr1_p, ref1_p = P(nbr_fea_l[0]), P(ref_fea_l[0])
        convp = lambda name, splits=None: Conv2d(
            nf, 3, dtype=dt, name=name, packed_io=True, fused_act="lrelu",
            packed_splits=splits)
        # L3
        l3_off_p = convp("L3_offset_conv1", s2)(
            jnp.concatenate([P(nbr_fea_l[2]), P(ref_fea_l[2])], axis=-1))
        l3_off = U(convp("L3_offset_conv2")(l3_off_p))
        l3_fea = lrelu(dcn("L3_dcnpack")(nbr_fea_l[2], l3_off))
        # L2
        l2_off_p = convp("L2_offset_conv1", s2)(
            jnp.concatenate([P(nbr_fea_l[1]), P(ref_fea_l[1])], axis=-1))
        l2_off_p = convp("L2_offset_conv2", s2)(jnp.concatenate(
            [l2_off_p, P(upsample2x_bilinear(l3_off)) * 2], axis=-1))
        l2_off = U(convp("L2_offset_conv3")(l2_off_p))
        l2_fea = dcn("L2_dcnpack")(nbr_fea_l[1], l2_off)
        l3_fea_up = upsample2x_bilinear(l3_fea)
        l2_fea = lrelu(conv("L2_fea_conv")(
            jnp.concatenate([l2_fea, l3_fea_up], axis=-1)))
        # L1
        l1_off_p = convp("L1_offset_conv1", s2)(
            jnp.concatenate([nbr1_p, ref1_p], axis=-1))
        l1_off_p = convp("L1_offset_conv2", s2)(jnp.concatenate(
            [l1_off_p, P(upsample2x_bilinear(l2_off)) * 2], axis=-1))
        l1_off = U(convp("L1_offset_conv3")(l1_off_p))
        l1_fea = dcn("L1_dcnpack")(nbr_fea_l[0], l1_off)
        l2_fea_up = upsample2x_bilinear(l2_fea)
        l1_fea = conv("L1_fea_conv")(
            jnp.concatenate([l1_fea, l2_fea_up], axis=-1))
        # Cascading
        off_p = convp("cas_offset_conv1", s2)(
            jnp.concatenate([P(l1_fea), ref1_p], axis=-1))
        off = U(convp("cas_offset_conv2")(off_p))
        l1_fea = lrelu(dcn("cas_dcnpack")(l1_fea, off))
        return l1_fea


class TSAFusion(nn.Module):
    """Temporal-Spatial Attention fusion (EDVR_arch.py:135-208)."""

    nf: int = 64
    nframes: int = 5
    center: int = 2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, aligned_fea):
        """aligned_fea: (B, N, H, W, C) → (B, H, W, C)."""
        b, n, h, w, c = aligned_fea.shape
        nf, dt = self.nf, self.dtype
        conv1 = lambda name, cout=nf: Conv2d(cout, 1, padding=0, dtype=dt, name=name)
        conv3 = lambda name, cout=nf: Conv2d(cout, 3, dtype=dt, name=name)

        # temporal attention: frame-vs-center embedding correlation
        emb_ref = conv3("tAtt_2")(aligned_fea[:, self.center])
        emb = conv3("tAtt_1")(aligned_fea.reshape(b * n, h, w, c))
        emb = emb.reshape(b, n, h, w, -1)
        cor = jnp.sum(emb * emb_ref[:, None], axis=-1)  # (B, N, H, W)
        cor_prob = jax.nn.sigmoid(cor)[..., None]  # (B, N, H, W, 1)
        fea_w = (aligned_fea * cor_prob).transpose(0, 2, 3, 1, 4).reshape(b, h, w, n * c)

        fea = lrelu(conv1("fea_fusion")(fea_w))

        # spatial attention pyramid
        att = lrelu(conv1("sAtt_1")(fea_w))
        att_max = max_pool_3x3_s2(att)
        att_avg = avg_pool_3x3_s2(att)
        att = lrelu(conv1("sAtt_2")(jnp.concatenate([att_max, att_avg], axis=-1)))
        att_l = lrelu(conv1("sAtt_L1")(att))
        att_max = max_pool_3x3_s2(att_l)
        att_avg = avg_pool_3x3_s2(att_l)
        att_l = lrelu(conv3("sAtt_L2")(jnp.concatenate([att_max, att_avg], axis=-1)))
        att_l = lrelu(conv3("sAtt_L3")(att_l))
        att_l = upsample2x_bilinear(att_l)

        att = lrelu(conv3("sAtt_3")(att))
        att = att + att_l
        att = lrelu(conv1("sAtt_4")(att))
        att = upsample2x_bilinear(att)
        att = conv3("sAtt_5")(att)
        att_add = conv1("sAtt_add_2")(lrelu(conv1("sAtt_add_1")(att)))
        att = jax.nn.sigmoid(att)

        return fea * att * 2 + att_add


class PredeblurResNetPyramid(nn.Module):
    """Pre-deblur front-end (EDVR_arch.py:15-59)."""

    nf: int = 128
    hr_in: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        nf, dt = self.nf, self.dtype
        rb = lambda name: ResidualBlockNoBN(nf, dtype=dt, name=name)
        if self.hr_in:
            fea = lrelu(Conv2d(nf, 3, dtype=dt, name="conv_first_1")(x))
            fea = lrelu(Conv2d(nf, 3, 2, dtype=dt, name="conv_first_2")(fea))
            l1 = lrelu(Conv2d(nf, 3, 2, dtype=dt, name="conv_first_3")(fea))
        else:
            l1 = lrelu(Conv2d(nf, 3, dtype=dt, name="conv_first")(x))
        l2 = lrelu(Conv2d(nf, 3, 2, dtype=dt, name="deblur_L2_conv")(l1))
        l3 = lrelu(Conv2d(nf, 3, 2, dtype=dt, name="deblur_L3_conv")(l2))
        l3 = upsample2x_bilinear(rb("RB_L3_1")(l3))
        l2 = rb("RB_L2_1")(l2) + l3
        l2 = upsample2x_bilinear(rb("RB_L2_2")(l2))
        l1 = rb("RB_L1_2")(rb("RB_L1_1")(l1)) + l2
        return rb("RB_L1_5")(rb("RB_L1_4")(rb("RB_L1_3")(l1)))


class _EDVRBase(nn.Module):
    """Shared feature-extraction + PCD + fusion pipeline."""

    nf: int = 64
    nc: int = 3
    nframes: int = 5
    groups: int = 8
    front_RBs: int = 5
    back_RBs: int = 10
    center: int | None = None
    predeblur: bool = False
    HR_in: bool = False
    w_TSA: bool = True
    dtype: Dtype = jnp.float32
    remat: bool = False  # checkpoint PCD + trunks (training memory)

    @property
    def center_idx(self) -> int:
        return self.nframes // 2 if self.center is None else self.center

    def front_pyramid(self, x_flat, return_packed: bool = False):
        """Per-frame 3-level feature pyramid (frames folded into batch).

        Split out from :meth:`extract_and_align` so streaming video
        inference (eval/streaming.py) can run it once per NEW frame and
        reuse the result across the N sliding windows that contain the
        frame — outputs are bitwise the recomputation the reference's
        per-window loop performs (test_RealVSR_wi_GT.py:116-119).
        """
        nf, dt = self.nf, self.dtype
        if self.predeblur:
            l1 = PredeblurResNetPyramid(nf=nf, hr_in=self.HR_in, dtype=dt,
                                        name="pre_deblur")(x_flat)
            l1 = Conv2d(nf, 1, padding=0, dtype=dt, name="conv_1x1")(l1)
        elif self.HR_in:
            l1 = lrelu(Conv2d(nf, 3, dtype=dt, name="conv_first_1")(x_flat))
            l1 = lrelu(Conv2d(nf, 3, 2, dtype=dt, name="conv_first_2")(l1))
            l1 = lrelu(Conv2d(nf, 3, 2, dtype=dt, name="conv_first_3")(l1))
        else:
            l1 = lrelu(Conv2d(nf, 3, dtype=dt, name="conv_first")(x_flat))
        BlocksT = nn.checkpoint(Blocks) if self.remat else Blocks
        packed = (conv3x3_fast_enabled() and l1.shape[-2] % 16 == 0
                  and not self.remat)
        if packed:
            l1 = pack_pairs(l1)
        l1 = BlocksT(ResidualBlockNoBN, self.front_RBs,
                     dict(nf=nf, dtype=dt, packed_io=packed),
                     name="feature_extraction")(l1)
        if packed:
            l1p = l1
            l1 = unpack_pairs(l1)
        else:
            l1p = None
        l2 = lrelu(Conv2d(nf, 3, 2, dtype=dt, name="fea_L2_conv1")(l1))
        l2 = lrelu(Conv2d(nf, 3, dtype=dt, name="fea_L2_conv2")(l2))
        l3 = lrelu(Conv2d(nf, 3, 2, dtype=dt, name="fea_L3_conv1")(l2))
        l3 = lrelu(Conv2d(nf, 3, dtype=dt, name="fea_L3_conv2")(l3))
        if return_packed:
            return l1, l2, l3, l1p
        return l1, l2, l3

    def extract_and_align(self, x):
        """x: (B, N, H, W, C) → fused features (B, H', W', nf)."""
        b, n, h, w, c = x.shape
        nf, dt = self.nf, self.dtype
        x_flat = x.reshape(b * n, h, w, c)

        l1, l2, l3, l1p = self.front_pyramid(x_flat, return_packed=True)
        if self.HR_in:
            h, w = h // 4, w // 4

        # PCD align, batched over the N frames (replaces the reference's
        # per-frame Python loop, EDVR_arch.py:297-303).
        ctr = self.center_idx

        def levels(t, hh, ww):
            return t.reshape(b, n, hh, ww, nf)

        l1v, l2v, l3v = (levels(l1, h, w), levels(l2, h // 2, w // 2),
                         levels(l3, h // 4, w // 4))
        l1p_v = (None if l1p is None
                 else l1p.reshape(b, n, h, w // 2, 2 * nf))
        return self.align_fuse(l1v, l2v, l3v, l1p_v)

    def align_fuse(self, l1v, l2v, l3v, l1p_v=None):
        """PCD alignment + fusion from stacked pyramids (B, N, h, w, nf).

        ``l1p_v``: optional pair-packed view of l1v handed from the front
        chain's packed exit — PCD's packed offset chains then read it
        directly instead of re-packing the L1 operands (full-res retiles).
        """
        b, n, h, w, nf = l1v.shape
        dt = self.dtype
        ctr = self.center_idx
        nbr = [l1v.reshape(b * n, h, w, nf),
               l2v.reshape(b * n, h // 2, w // 2, nf),
               l3v.reshape(b * n, h // 4, w // 4, nf)]
        ref = [
            jnp.broadcast_to(lv[:, ctr][:, None], lv.shape).reshape(nbr_i.shape)
            for lv, nbr_i in zip((l1v, l2v, l3v), nbr)
        ]
        l1_packed = None
        if l1p_v is not None:
            nbr1_p = l1p_v.reshape(b * n, h, w // 2, 2 * nf)
            ref1_p = jnp.broadcast_to(
                l1p_v[:, ctr][:, None], l1p_v.shape).reshape(nbr1_p.shape)
            l1_packed = (nbr1_p, ref1_p)
        PCDT = nn.checkpoint(PCDAlign) if self.remat else PCDAlign
        aligned = PCDT(nf=nf, groups=self.groups, dtype=dt,
                       name="pcd_align")(nbr, ref, l1_packed)
        aligned = aligned.reshape(b, n, h, w, nf)

        if self.w_TSA:
            fea = TSAFusion(nf=nf, nframes=self.nframes, center=ctr, dtype=dt,
                            name="tsa_fusion")(aligned)
        else:
            # per-frame matmul sum — same params/math as the reference's
            # transpose + 1x1 conv (EDVR_arch.py:344-353) without the
            # N->lanes relayout copy (PERF_NOTES round 5)
            fea = FrameSumConv1x1(nf, dtype=dt, name="tsa_fusion")(aligned)
        return fea


class EDVR(_EDVRBase):
    """EDVR with x4 pixel-shuffle upsampling (EDVR_arch.py:211-320)."""

    @nn.compact
    def __call__(self, x, train: bool = False, mode: str = "full"):
        """mode: same contract as :class:`EDVRNoUp` — "full" / "pyramid" /
        "fuse" (the split modes power eval/streaming.py)."""
        dt = self.dtype
        if mode == "pyramid":
            return self.front_pyramid(x)
        if mode == "fuse":
            l1v, l2v, l3v, x_center = x
            fea = self.align_fuse(l1v, l2v, l3v)
        else:
            x_center = x[:, self.center_idx]
            fea = self.extract_and_align(x)
        out = Blocks(ResidualBlockNoBN, self.back_RBs, dict(nf=self.nf, dtype=dt),
                     name="recon_trunk")(fea)
        out = lrelu(pixel_shuffle(
            Conv2d(self.nf * 4, 3, dtype=dt, name="upconv1")(out), 2))
        out = lrelu(pixel_shuffle(
            Conv2d(64 * 4, 3, dtype=dt, name="upconv2")(out), 2))
        out = lrelu(Conv2d(64, 3, dtype=dt, name="HRconv")(out))
        out = Conv2d(self.nc, 3, dtype=dt, name="conv_last")(out)
        if self.HR_in:
            base = x_center
        else:
            base = resize_bilinear(
                x_center, (x_center.shape[-3] * 4, x_center.shape[-2] * 4))
        return out + base


class EDVRNoUp(_EDVRBase):
    """x1 restoration variant, no upsampling (EDVR_arch.py:323-404).

    The model used for all RealVSR experiments
    (train_EDVR_woTSA_RealVSR_YCbCr_Split.yml:42).
    """

    @nn.compact
    def __call__(self, x, train: bool = False, mode: str = "full"):
        """mode: "full" — (B, N, H, W, C) window → frame;
        "pyramid" — (B, H, W, C) frames → per-frame feature pyramid;
        "fuse" — (l1v, l2v, l3v, x_center) cached pyramids → frame.
        The split modes power streaming video inference
        (eval/streaming.py) with outputs identical to "full"."""
        dt = self.dtype
        if mode == "pyramid":
            return self.front_pyramid(x)
        if mode == "fuse":
            l1v, l2v, l3v, x_center = x
            fea = self.align_fuse(l1v, l2v, l3v)
        else:
            x_center = x[:, self.center_idx]
            fea = self.extract_and_align(x)
        BlocksT = nn.checkpoint(Blocks) if self.remat else Blocks
        packed = (conv3x3_fast_enabled() and fea.shape[-2] % 16 == 0
                  and not self.remat)
        if packed:
            fea = pack_pairs(fea)
        out = BlocksT(ResidualBlockNoBN, self.back_RBs,
                      dict(nf=self.nf, dtype=dt, packed_io=packed),
                      name="recon_trunk")(fea)
        out = Conv2d(64, 3, dtype=dt, packed_io=packed,
                     fused_act="lrelu", name="HRconv")(out)
        if packed:
            out = unpack_pairs(out)
        out = Conv2d(self.nc, 3, dtype=dt, name="conv_last")(out)
        return out + x_center
