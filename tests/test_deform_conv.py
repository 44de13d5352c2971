"""Deformable conv: XLA formulation vs. naive oracle + gradient checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realvsr_tpu.ops import deform_conv as dc


def make_inputs(b=2, h=8, w=7, cin=4, cout=6, kh=3, kw=3, dg=2, groups=1,
                stride=1, padding=1, dilation=1, seed=0, mask=True):
    rng = np.random.default_rng(seed)
    k = kh * kw
    ho = dc._out_size(h, kh, stride if isinstance(stride, int) else stride[0],
                      padding if isinstance(padding, int) else padding[0],
                      dilation if isinstance(dilation, int) else dilation[0])
    wo = dc._out_size(w, kw, stride if isinstance(stride, int) else stride[0],
                      padding if isinstance(padding, int) else padding[0],
                      dilation if isinstance(dilation, int) else dilation[0])
    x = rng.normal(size=(b, h, w, cin)).astype(np.float64)
    offset = (rng.normal(size=(b, ho, wo, dg * k * 2)) * 1.5).astype(np.float64)
    m = rng.uniform(0.0, 1.0, size=(b, ho, wo, dg * k)).astype(np.float64) if mask else None
    weight = rng.normal(size=(kh, kw, cin // groups, cout)).astype(np.float64) * 0.3
    bias = rng.normal(size=(cout,)).astype(np.float64) * 0.1
    return x, offset, m, weight, bias


class TestForward:
    @pytest.mark.parametrize(
        "kwargs",
        [
            dict(),
            dict(dg=1),
            dict(dg=4, cin=8),
            dict(stride=2),
            dict(padding=0),
            dict(dilation=2, h=12, w=12),
            dict(groups=2, cin=4, cout=6),
            dict(mask=False),
        ],
    )
    def test_vs_oracle(self, kwargs):
        mask = kwargs.pop("mask", True)
        stride = kwargs.pop("stride", 1)
        padding = kwargs.pop("padding", 1)
        dilation = kwargs.pop("dilation", 1)
        groups = kwargs.pop("groups", 1)
        dg = kwargs.pop("dg", 2)
        x, off, m, wgt, b = make_inputs(dg=dg, groups=groups, stride=stride,
                                        padding=padding, dilation=dilation,
                                        mask=mask, **kwargs)
        ref = dc.modulated_deform_conv_np(
            x, off, m, wgt, b, stride, padding, dilation, groups, dg)
        ours = dc.modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(off),
            None if m is None else jnp.asarray(m),
            jnp.asarray(wgt), jnp.asarray(b), stride, padding, dilation,
            groups, dg)
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-10)

    def test_zero_offset_equals_conv(self):
        """With zero offsets and unit mask, DCN == plain conv (sanity)."""
        rng = np.random.default_rng(3)
        x = rng.normal(size=(1, 8, 8, 4)).astype(np.float32)
        wgt = rng.normal(size=(3, 3, 4, 5)).astype(np.float32)
        off = np.zeros((1, 8, 8, 2 * 9 * 2), dtype=np.float32)
        m = np.ones((1, 8, 8, 2 * 9), dtype=np.float32)
        ours = dc.modulated_deform_conv(
            jnp.asarray(x), jnp.asarray(off), jnp.asarray(m), jnp.asarray(wgt),
            None, 1, 1, 1, 1, 2)
        ref = jax.lax.conv_general_dilated(
            x, wgt, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-4)


@pytest.mark.slow
class TestGrad:
    def test_grads_vs_finite_difference(self):
        x, off, m, wgt, b = make_inputs(b=1, h=5, w=5, cin=2, cout=2, dg=1, seed=7)

        def f(x_, off_, m_, w_, b_):
            return jnp.sum(
                jnp.sin(dc.modulated_deform_conv(x_, off_, m_, w_, b_, 1, 1, 1, 1, 1))
            )

        args = tuple(map(jnp.asarray, (x, off, m, wgt, b)))
        grads = jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)
        eps = 1e-6
        rng = np.random.default_rng(11)
        for ai, a in enumerate(args):
            g = np.asarray(grads[ai])
            flat = np.asarray(a).reshape(-1)
            # probe a few random coordinates
            for idx in rng.choice(flat.size, size=min(8, flat.size), replace=False):
                ap = flat.copy(); ap[idx] += eps
                am = flat.copy(); am[idx] -= eps
                args_p = list(args); args_p[ai] = jnp.asarray(ap.reshape(a.shape))
                args_m = list(args); args_m[ai] = jnp.asarray(am.reshape(a.shape))
                fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
                assert abs(fd - g.reshape(-1)[idx]) < 1e-4, (ai, idx, fd, g.reshape(-1)[idx])

    def test_grad_jit_compiles(self):
        x, off, m, wgt, b = make_inputs(b=2, h=8, w=8, cin=8, cout=8, dg=2, seed=9)

        @jax.jit
        def g(x_, off_, m_, w_, b_):
            return jax.grad(
                lambda *a: jnp.sum(dc.modulated_deform_conv(*a, 1, 1, 1, 1, 2))
            )(x_, off_, m_, w_, b_)

        out = g(*map(lambda a: jnp.asarray(a, jnp.float32), (x, off, m, wgt, b)))
        assert out.shape == x.shape


@pytest.mark.slow
class TestTapLoopImpl:
    def test_tap_loop_matches_columns(self):
        x, off, m, wgt, b = make_inputs(b=2, h=10, w=9, cin=8, cout=6, dg=4,
                                        seed=13)
        args = tuple(map(jnp.asarray, (x, off, m, wgt, b)))
        a = dc.modulated_deform_conv(*args, 1, 1, 1, 1, 4, impl="columns")
        t = dc.modulated_deform_conv(*args, 1, 1, 1, 1, 4, impl="tap_loop")
        np.testing.assert_allclose(np.asarray(a), np.asarray(t), atol=1e-10)

    def test_tap_loop_grads_match(self):
        x, off, m, wgt, b = make_inputs(b=1, h=6, w=6, cin=4, cout=4, dg=2,
                                        seed=14)
        args = tuple(map(jnp.asarray, (x, off, m, wgt, b)))

        def loss(impl):
            def f(*a):
                return jnp.sum(
                    dc.modulated_deform_conv(*a, 1, 1, 1, 1, 2, impl=impl) ** 2)
            return jax.grad(f, argnums=(0, 1, 2, 3))(*args)

        ga = loss("columns")
        gt = loss("tap_loop")
        for a_, t_ in zip(ga, gt):
            np.testing.assert_allclose(np.asarray(a_), np.asarray(t_),
                                       atol=1e-8)


class TestBlockImpl:
    def test_block_matches_exact_within_clamp(self):
        rng = np.random.default_rng(21)
        b, h, w, cin, dgq, r = 2, 24, 40, 16, 4, 8
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)))
        off = jnp.asarray(np.clip(rng.normal(size=(b, h, w, dgq * 9 * 2)) * 2,
                                  -r + 0.5, r - 0.5))
        m = jnp.asarray(rng.uniform(size=(b, h, w, dgq * 9)))
        wgt = jnp.asarray(rng.normal(size=(3, 3, cin, 8)) * 0.2)
        bias = jnp.asarray(rng.normal(size=(8,)) * 0.1)
        exact = dc.modulated_deform_conv(x, off, m, wgt, bias, 1, 1, 1, 1,
                                         dgq, impl="columns")
        prev = dc.set_default_impl("block", block_max_offset=r)
        try:
            blk = dc.modulated_deform_conv(x, off, m, wgt, bias, 1, 1, 1, 1,
                                           dgq)
        finally:
            dc.set_default_impl(*prev)
        np.testing.assert_allclose(np.asarray(blk), np.asarray(exact),
                                   atol=1e-5)

    def test_block_falls_back_for_unsupported_configs(self):
        """5x5 kernel → block impl silently falls back to the exact path."""
        rng = np.random.default_rng(22)
        x = jnp.asarray(rng.normal(size=(1, 12, 12, 8)), jnp.float32)
        off = jnp.asarray(rng.normal(size=(1, 12, 12, 2 * 25 * 2)), jnp.float32)
        m = jnp.asarray(rng.uniform(size=(1, 12, 12, 2 * 25)), jnp.float32)
        wgt = jnp.asarray(rng.normal(size=(5, 5, 8, 4)) * 0.1, jnp.float32)
        prev = dc.set_default_impl("block")
        try:
            out = dc.modulated_deform_conv(x, off, m, wgt, None, 1, 2, 1, 1, 2)
        finally:
            dc.set_default_impl(*prev)
        assert out.shape == (1, 12, 12, 4)


@pytest.mark.slow
class TestPallasFusedKernel:
    def test_interpret_matches_xla_block(self):
        from realvsr_tpu.ops.deform_conv_block import modulated_deform_conv_block

        rng = np.random.default_rng(31)
        b, h, w, cin, dgq, r = 1, 16, 32, 16, 4, 3
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
        off = jnp.asarray(
            np.clip(rng.normal(size=(b, h, w, dgq * 9 * 2)) * 2, -r + .2, r - .2),
            jnp.float32)
        m = jnp.asarray(rng.uniform(size=(b, h, w, dgq * 9)), jnp.float32)
        wgt = jnp.asarray(rng.normal(size=(3, 3, cin, 8)) * 0.2, jnp.float32)
        ref = modulated_deform_conv_block(x, off, m, wgt, None, 1, dgq,
                                          max_offset=r)
        pal = modulated_deform_conv_block(x, off, m, wgt, None, 1, dgq,
                                          max_offset=r, use_pallas=True,
                                          pallas_interpret=True)
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=5e-6)

    def test_frame_dma_kernel_matches_xla_block(self):
        """v7: in-kernel double-buffered DMA from the frame tensor."""
        from realvsr_tpu.ops.deform_conv_block import modulated_deform_conv_block

        rng = np.random.default_rng(32)
        b, h, w, cin, dgq, r = 2, 24, 40, 16, 4, 3
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
        off = jnp.asarray(
            np.clip(rng.normal(size=(b, h, w, dgq * 9 * 2)) * 2, -r + .2, r - .2),
            jnp.float32)
        m = jnp.asarray(rng.uniform(size=(b, h, w, dgq * 9)), jnp.float32)
        wgt = jnp.asarray(rng.normal(size=(3, 3, cin, 8)) * 0.2, jnp.float32)
        bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
        ref = modulated_deform_conv_block(x, off, m, wgt, bias, 1, dgq,
                                          max_offset=r)
        pal = modulated_deform_conv_block(x, off, m, wgt, bias, 1, dgq,
                                          max_offset=r, use_pallas="frame",
                                          pallas_interpret=True)
        # v8 ships fixed-point int16 coordinates (>=1/256-px resolution) —
        # position quantization bounds the sampled-value error at ~5e-3
        np.testing.assert_allclose(np.asarray(pal), np.asarray(ref), atol=8e-3)

    def test_band_fold_matches_slices_fold(self):
        """fold='band' (per-tap banded vertical fold over the ph-2 strips
        tap row tr can ever sample — Mosaic-validated round 5) must agree
        with the dense 'slices' fold at the same geometry to float
        round-off, for both gemm modes."""
        from realvsr_tpu.ops.deform_conv_block import modulated_deform_conv_block

        rng = np.random.default_rng(33)
        b, h, w, cin, dgq, r = 1, 16, 128, 32, 4, 4
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
        off = jnp.asarray(rng.normal(size=(b, h, w, dgq * 18)) * 3,
                          jnp.float32)
        m = jnp.asarray(rng.uniform(size=(b, h, w, dgq * 9)), jnp.float32)
        wgt = jnp.asarray(rng.normal(size=(3, 3, cin, 16)) * 0.2,
                          jnp.float32)

        def run(**kw):
            return modulated_deform_conv_block(
                x, off, m, wgt, None, 1, dgq, max_offset=r,
                use_pallas="frame", pallas_interpret=True,
                compute_dtype=jnp.float32, **kw)

        ref = run()
        for kw in (dict(frame_fold="band"),
                   dict(frame_fold="band", frame_gemm="taps"),
                   dict(frame_fold="band", block=(4, 32))):
            base = run(block=kw["block"]) if "block" in kw else ref
            got = run(**kw)
            np.testing.assert_allclose(np.asarray(got), np.asarray(base),
                                       atol=1e-5, err_msg=str(kw))

    def test_band_fold_bwd_matches_slices_bwd(self):
        """The banded backward (per-tap folds + band-limited dh writes
        into a zeroed scratch) must produce bit-identical gradients to
        the dense backward."""
        from realvsr_tpu.ops.deform_conv_block import modulated_deform_conv_block

        rng = np.random.default_rng(7)
        b, h, w, cin, dgq, r = 1, 4, 128, 16, 2, 4
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
        off = jnp.asarray(rng.normal(size=(b, h, w, dgq * 18)) * 3,
                          jnp.float32)
        m = jnp.asarray(rng.uniform(size=(b, h, w, dgq * 9)), jnp.float32)
        wgt = jnp.asarray(rng.normal(size=(3, 3, cin, 16)) * 0.1,
                          jnp.float32)

        def grads(fold):
            def f(x_, o_, m_, w_):
                out = modulated_deform_conv_block(
                    x_, o_, m_, w_, None, 1, dgq, max_offset=r,
                    use_pallas="frame", pallas_interpret=True,
                    compute_dtype=jnp.float32, block=(4, 64),
                    frame_fold=fold)
                return jnp.sum(out * out)
            return jax.grad(f, argnums=(0, 1, 2, 3))(x, off, m, wgt)

        for a, c in zip(grads("slices"), grads("band")):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


@pytest.mark.slow
class TestFrameKernelVJP:
    def test_frame_vjp_matches_block_autodiff(self):
        """Custom-VJP Pallas backward (dcn_frame_fused_bwd) vs autodiff of
        the XLA block path.  Offsets quantized to 1/256 px so the kernel's
        int16 fixed-point positions are exact and gradients comparable to
        f32 round-off (replaces deform_conv_cuda_kernel.cu:636-773)."""
        from realvsr_tpu.ops.deform_conv_block import modulated_deform_conv_block

        rng = np.random.default_rng(5)
        b, h, w, cin, dgq, r = 1, 12, 20, 16, 2, 3
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
        off = jnp.asarray(
            np.round(np.clip(rng.normal(size=(b, h, w, dgq * 18)) * 2,
                             -r + .2, r - .2) * 256) / 256, jnp.float32)
        m = jnp.asarray(rng.uniform(size=(b, h, w, dgq * 9)), jnp.float32)
        wgt = jnp.asarray(rng.normal(size=(3, 3, cin, 8)) * 0.2, jnp.float32)
        bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
        gseed = jnp.asarray(rng.normal(size=(b, h, w, 8)), jnp.float32)

        def loss(use_frame):
            def f(x, off, m, wgt, bias):
                o = modulated_deform_conv_block(
                    x, off, m, wgt, bias, 1, dgq, max_offset=r,
                    use_pallas="frame" if use_frame else False,
                    pallas_interpret=use_frame)
                return jnp.sum(o * gseed)
            return f

        gb = jax.grad(loss(False), argnums=(0, 1, 2, 3, 4))(
            x, off, m, wgt, bias)
        gf = jax.grad(loss(True), argnums=(0, 1, 2, 3, 4))(
            x, off, m, wgt, bias)
        for name, a, b_ in zip(["dx", "doff", "dmask", "dw", "dbias"],
                               gb, gf):
            sc = max(1e-6, float(np.abs(np.asarray(a)).max()))
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), atol=5e-6 * sc,
                err_msg=name)

    def test_frame_vjp_clip_gate(self):
        """Offsets beyond the clamp get zero gradient (jnp.clip VJP)."""
        from realvsr_tpu.ops.deform_conv_block import modulated_deform_conv_block

        rng = np.random.default_rng(6)
        b, h, w, cin, dgq, r = 1, 8, 8, 8, 1, 2
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
        off = jnp.full((b, h, w, dgq * 18), 5.0, jnp.float32)  # all clamped
        m = jnp.asarray(rng.uniform(size=(b, h, w, dgq * 9)), jnp.float32)
        wgt = jnp.asarray(rng.normal(size=(3, 3, cin, 8)) * 0.2, jnp.float32)

        def f(off):
            o = modulated_deform_conv_block(
                x, off, m, wgt, None, 1, dgq, max_offset=r,
                use_pallas="frame", pallas_interpret=True)
            return jnp.sum(o ** 2)

        doff = jax.grad(f)(off)
        np.testing.assert_array_equal(np.asarray(doff), 0.0)


class TestFoldDpgOverlapAdd:
    """_fold_dpg vs a numpy overlap-add reference (advisor round-3 high:
    when pc % bc != 0 the last row chunk's dynamic_update_slice start used
    to clamp, misplacing that chunk's dx gradient by bc - pc%bc rows)."""

    @pytest.mark.parametrize("bh,cpg,r,h,w", [
        (4, 8, 3, 12, 20),    # pc=112, bc=32, pc%bc=16 (frame default geom)
        (8, 8, 3, 24, 40),    # pc=144, bc=64, pc%bc=16
        (4, 16, 3, 12, 20),   # pc=208, bc=64, pc%bc=16
        (8, 16, 3, 16, 24),   # pc%bc == 0 control
    ])
    def test_matches_numpy_reference(self, bh, cpg, r, h, w):
        from realvsr_tpu.ops.deform_conv_block import _fold_dpg, _frame_geom

        b, dg, bw = 1, 2, 64
        g = _frame_geom(h, w, cpg, r, bh, bw)
        nby, nbx, phr = g["nby"], g["nbx"], g["phr"]
        pc, bc = phr * cpg, bh * cpg
        ph = g["ph"]
        hp2 = h + g["h_pad"] + 2 * r + 3 + (phr - ph)
        wp2 = w + g["w_pad"] + 2 * r + 3
        wfull = (nbx - 1) * bw + 128
        rng = np.random.default_rng(bh * 100 + cpg)
        # random content everywhere, INCLUDING the last row chunk
        dpg = rng.normal(size=(b * nby * nbx, dg, pc, 128)).astype(np.float32)

        got = np.asarray(_fold_dpg(
            jnp.asarray(dpg), b=b, dg=dg, cpg=cpg, bh=bh, bw=bw, r=r,
            h=h, w=w, geom=g, hp2=hp2, wp2=wp2, wfull=wfull,
            out_dtype=jnp.float32))

        # reference: plain += overlap-add of each block's halo window
        d = dpg.reshape(b, nby, nbx, dg, pc, 128)
        hfull = (nby - 1) * bc + pc
        acc = np.zeros((b, dg, hfull, wfull), np.float32)
        for by in range(nby):
            for bx in range(nbx):
                acc[:, :, by * bc:by * bc + pc,
                    bx * bw:bx * bw + 128] += d[:, by, bx]
        acc = np.pad(acc, ((0, 0), (0, 0), (0, hp2 * cpg - hfull), (0, 0)))
        acc = acc[:, :, :, :wp2]
        acc = acc.reshape(b, dg, hp2, cpg, wp2).transpose(0, 2, 1, 3, 4)
        acc = acc.reshape(b, hp2, dg * cpg, wp2).transpose(0, 1, 3, 2)
        want = acc[:, r + 1:r + 1 + h, r + 1:r + 1 + w]
        np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
class TestFrameVJPBoundaryOffsets:
    def test_frame_vjp_offsets_at_clamp(self):
        """Offsets pinned to exactly +/-r (quantized): boundary hat rows
        carry gradient, exercising the last _fold_dpg row chunk that the
        clipped-offset VJP test never reaches (advisor round-3 medium)."""
        from realvsr_tpu.ops.deform_conv_block import modulated_deform_conv_block

        rng = np.random.default_rng(7)
        b, h, w, cin, dgq, r = 1, 12, 20, 16, 2, 3
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
        sign = rng.integers(0, 2, size=(b, h, w, dgq * 18)) * 2 - 1
        off = jnp.asarray(sign * float(r), jnp.float32)
        m = jnp.asarray(rng.uniform(size=(b, h, w, dgq * 9)), jnp.float32)
        wgt = jnp.asarray(rng.normal(size=(3, 3, cin, 8)) * 0.2, jnp.float32)
        bias = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
        gseed = jnp.asarray(rng.normal(size=(b, h, w, 8)), jnp.float32)

        def loss(use_frame):
            def f(x, off, m, wgt, bias):
                o = modulated_deform_conv_block(
                    x, off, m, wgt, bias, 1, dgq, max_offset=r,
                    use_pallas="frame" if use_frame else False,
                    pallas_interpret=use_frame)
                return jnp.sum(o * gseed)
            return f

        gb = jax.grad(loss(False), argnums=(0, 2, 3, 4))(x, off, m, wgt, bias)
        gf = jax.grad(loss(True), argnums=(0, 2, 3, 4))(x, off, m, wgt, bias)
        # doff is excluded: at exactly integer sampling positions the
        # bilinear-weight derivative is a subgradient choice that may
        # legitimately differ between the two implementations
        for name, a, b_ in zip(["dx", "dmask", "dw", "dbias"], gb, gf):
            sc = max(1e-6, float(np.abs(np.asarray(a)).max()))
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), atol=5e-6 * sc, err_msg=name)


class TestFramePrepRelayouts:
    """The round-4 'two_stage' prep relayout (block-gather + batched
    minor-2D transpose) must produce bit-identical kernel inputs to the
    round-3 single-8D-transpose path — same q = (tap, y, x) layout for
    positions and mask, same panels and weights."""

    @pytest.mark.parametrize("h,w,maskless", [(12, 20, False), (24, 40, True)])
    def test_two_stage_matches_one_shot(self, h, w, maskless):
        from realvsr_tpu.ops.deform_conv_block import _frame_prep

        rng = np.random.default_rng(77)
        b, cin, dg, r, bh, bw = 2, 16, 4, 3, 4, 64
        x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
        off = jnp.asarray(rng.normal(size=(b, h, w, dg * 18)) * 2,
                          jnp.float32)
        m = (None if maskless else
             jnp.asarray(rng.uniform(size=(b, h, w, dg * 9)), jnp.float32))
        wgt = jnp.asarray(rng.normal(size=(3, 3, cin, 8)) * 0.2, jnp.float32)
        statics = dict(dg=dg, cpg=cin // dg, r=r, bh=bh, bw=bw, k=9, kw=3,
                       dt=jnp.float32)
        a = _frame_prep(x, off, m, wgt, relayout="two_stage", **statics)
        b_ = _frame_prep(x, off, m, wgt, relayout="one_shot", **statics)
        for name, ta, tb in zip(("xp", "lyx", "m_q", "wt_g"), a, b_):
            np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb),
                                          err_msg=name)

    # The optimization_barrier on the fixed-point encode is unconditional
    # as of round 5 (chip-measured faster at every shape AND required for
    # the 1080p full-frame compile), so every prep test above exercises
    # the barriered encode; the dedicated gate-forcing test is gone with
    # the gate.

