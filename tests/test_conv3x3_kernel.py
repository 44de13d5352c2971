"""Pallas pair-packed 3x3 conv kernel vs lax.conv (interpret mode).

The packed layout (two W-adjacent pixels -> 128 lanes) is what makes the
kernel's manual HBM DMA legal on TPU (64-wide slices are rejected); the
dx taps ride packed weight blocks (ops/pallas/conv3x3_kernel.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realvsr_tpu.ops.pallas.conv3x3_kernel import (
    conv3x3, conv3x3_fused, conv3x3_packed, pack_pairs, unpack_pairs,
)


def _ref(x, w, bias=None):
    o = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        o = o + bias
    return o


@pytest.mark.parametrize("cin,cout,mrows", [(64, 64, 4), (128, 64, 8),
                                            (64, 216, 4)])
def test_packed_matches_lax_conv(cin, cout, mrows):
    rng = np.random.default_rng(0)
    b, h, w = 2, 16, 64
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)), jnp.float32)
    wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    ref = _ref(x, wgt, bias)
    out = unpack_pairs(conv3x3_packed(
        pack_pairs(x), wgt, bias, h=h, mrows=mrows, interpret=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_fused_act_residual():
    rng = np.random.default_rng(1)
    b, h, w, c = 1, 8, 32, 64
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    wgt = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.1, jnp.float32)
    res = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    ref = jnp.maximum(_ref(x, wgt), 0) + res
    out = unpack_pairs(conv3x3_packed(
        pack_pairs(x), wgt, None, h=h, act="relu",
        residual=pack_pairs(res), mrows=4, interpret=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_unpacked_kernel_and_custom_vjp():
    rng = np.random.default_rng(2)
    b, h, w, c = 2, 8, 16, 8
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    wgt = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.3, jnp.float32)
    ref = _ref(x, wgt)
    out = conv3x3_fused(x, wgt, None, mrows=4, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def lp(x, w):
        return jnp.sum(jnp.sin(conv3x3(x, w, True)))

    def lr(x, w):
        return jnp.sum(jnp.sin(_ref(x, w)))

    gp = jax.grad(lp, argnums=(0, 1))(x, wgt)
    gr = jax.grad(lr, argnums=(0, 1))(x, wgt)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               atol=2e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               atol=1e-4)


def test_model_packed_chain_parity():
    """EDVRNoUp with the packed conv chains enabled matches the XLA path."""
    from realvsr_tpu.models.common import set_conv3x3_impl
    from realvsr_tpu.models.edvr import EDVRNoUp

    model = EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=2,
                     back_RBs=2, predeblur=False, HR_in=False, w_TSA=False)
    x = jnp.asarray(np.random.default_rng(3).uniform(size=(1, 3, 16, 32, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ref = model.apply({"params": params}, x)
    set_conv3x3_impl("pallas_interpret")
    try:
        out = model.apply({"params": params}, x)
    finally:
        set_conv3x3_impl("xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_packed_custom_vjp_matches_xla_grad():
    """conv3x3_packed's custom VJP (act + residual + bias) vs autodiff of
    the plain XLA expression — packed_io is now training-safe (advisor
    round-3 low finding)."""
    rng = np.random.default_rng(3)
    b, h, w, c = 1, 8, 32, 64
    x = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
    wgt = jnp.asarray(rng.normal(size=(3, 3, c, c)) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(c,)), jnp.float32)
    res = jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)

    def lp(x, w, bi, r):
        o = unpack_pairs(conv3x3_packed(
            pack_pairs(x), w, bi, h=h, act="lrelu",
            residual=pack_pairs(r), mrows=4, interpret=True))
        return jnp.sum(jnp.sin(o))

    def lr(x, w, bi, r):
        o = _ref(x, w, bi)
        o = jnp.where(o >= 0, o, o * 0.1) + r
        return jnp.sum(jnp.sin(o))

    gp = jax.grad(lp, argnums=(0, 1, 2, 3))(x, wgt, bias, res)
    gr = jax.grad(lr, argnums=(0, 1, 2, 3))(x, wgt, bias, res)
    for name, a, b_ in zip(["dx", "dw", "dbias", "dres"], gr, gp):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a),
                                   atol=2e-4, err_msg=name)


def test_packed_splits_matches_concat_conv():
    """splits: a channel-concat of two separately pair-packed tensors is
    convolved via the permuted packed-weight K rows — forward and grads
    must match the plain conv on the unpacked concat (the PCD offset
    chains' "consumers read packed directly" boundary,
    models/edvr.py PCDAlign._packed_chains)."""
    from realvsr_tpu.ops.pallas.conv3x3_kernel import unpack_grouped

    rng = np.random.default_rng(7)
    b, h, w, ca, cb, cout = 2, 8, 32, 16, 8, 24
    xa = jnp.asarray(rng.normal(size=(b, h, w, ca)), jnp.float32)
    xb = jnp.asarray(rng.normal(size=(b, h, w, cb)), jnp.float32)
    wgt = jnp.asarray(rng.normal(size=(3, 3, ca + cb, cout)) * 0.1,
                      jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)), jnp.float32)
    xg = jnp.concatenate([pack_pairs(xa), pack_pairs(xb)], axis=-1)
    assert np.allclose(
        np.asarray(unpack_grouped(xg, (ca, cb))),
        np.asarray(jnp.concatenate([xa, xb], axis=-1)))

    ref = _ref(jnp.concatenate([xa, xb], axis=-1), wgt, bias)
    ref = jnp.where(ref >= 0, ref, ref * 0.1)
    out = unpack_pairs(conv3x3_packed(
        xg, wgt, bias, h=h, act="lrelu", splits=(ca, cb), mrows=2,
        interpret=True))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def lp(a, b_, wg):
        o = conv3x3_packed(
            jnp.concatenate([pack_pairs(a), pack_pairs(b_)], axis=-1),
            wg, bias, h=h, act="lrelu", splits=(ca, cb), mrows=2,
            interpret=True)
        return jnp.sum(jnp.sin(o))

    def lr(a, b_, wg):
        o = _ref(jnp.concatenate([a, b_], axis=-1), wg, bias)
        o = jnp.where(o >= 0, o, o * 0.1)
        return jnp.sum(jnp.sin(o))

    gp = jax.grad(lp, argnums=(0, 1, 2))(xa, xb, wgt)
    gr = jax.grad(lr, argnums=(0, 1, 2))(xa, xb, wgt)
    for name, p_, r_ in zip(["dxa", "dxb", "dw"], gp, gr):
        np.testing.assert_allclose(np.asarray(p_), np.asarray(r_),
                                   atol=2e-4, err_msg=name)


def test_pcd_packed_chains_parity():
    """EDVRNoUp at a width divisible by 64 routes PCD's offset-conv chains
    through the packed layout (PCDAlign._packed_chains) — outputs must
    match the plain XLA branch with the same params."""
    from realvsr_tpu.models.common import set_conv3x3_impl
    from realvsr_tpu.models.edvr import EDVRNoUp

    model = EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=2,
                     back_RBs=2, predeblur=False, HR_in=False, w_TSA=False)
    x = jnp.asarray(np.random.default_rng(9).uniform(size=(1, 3, 16, 64, 3)),
                    jnp.float32)
    params = model.init(jax.random.PRNGKey(1), x)["params"]
    ref = model.apply({"params": params}, x)
    set_conv3x3_impl("pallas_interpret")
    try:
        out = model.apply({"params": params}, x)
    finally:
        set_conv3x3_impl("xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_packed_custom_vjp_bf16_mixed_precision():
    """bf16 packed conv must be differentiable (mixed-precision training
    routes bf16 activations through the packed chains; the widened-conv
    transpose used to fail with a bf16/f32 dtype mismatch) and its grads
    must track an f32 conv oracle at bf16 rounding scale."""
    from realvsr_tpu.ops.pallas.conv3x3_kernel import unpack_pairs

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 16, 32, 64)), jnp.bfloat16)
    xp = pack_pairs(x)
    wgt = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.bfloat16)
    res = pack_pairs(
        jnp.asarray(rng.normal(size=(2, 16, 32, 64)), jnp.bfloat16))

    def loss(w, b, xp_):
        out = conv3x3_packed(xp_, w, b, h=16, act="lrelu", residual=res,
                             interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    gw, gb, gx = jax.grad(loss, argnums=(0, 1, 2))(wgt, bias, xp)

    def loss_ref(w, b, xp_):
        xx = unpack_pairs(xp_).astype(jnp.float32)
        y = jax.lax.conv_general_dilated(
            xx, w.astype(jnp.float32), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = jnp.where(y + b >= 0, y + b, (y + b) * 0.1)
        y = pack_pairs(y).astype(jnp.float32) + res.astype(jnp.float32)
        return jnp.sum(y ** 2)

    rw, rb, rx = jax.grad(loss_ref, argnums=(0, 1, 2))(wgt, bias, xp)
    for got, ref, name in ((gw, rw, "dw"), (gb, rb, "db"), (gx, rx, "dx")):
        rel = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        assert rel < 0.05, f"{name} rel err {rel}"  # bf16 rounding scale
