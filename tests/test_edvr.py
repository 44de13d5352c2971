"""EDVR parity: our flax model vs. the reference torch model (CPU oracle).

Reference torch modules run with a grid_sample-based DCN substitute
(torch_dcn_oracle); weights transfer through the production .pth importer.
"""
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch-oracle / large-compile
import torch

from reference_loader import load_ref_module, _ensure_stubs

from realvsr_tpu.models.edvr import EDVR, EDVRNoUp
from realvsr_tpu.train.torch_import import import_torch_state_dict
import torch_dcn_oracle


def _load_ref_edvr():
    from reference_loader import import_ref_package

    ref_dcn = import_ref_package("models.archs.dcn.deform_conv")
    torch_dcn_oracle.install(ref_dcn)
    return import_ref_package("models.archs.EDVR_arch")


@pytest.fixture(scope="module")
def ref_edvr():
    return _load_ref_edvr()


def test_torch_dcn_oracle_vs_our_oracle():
    """The torch grid_sample DCN must agree with our numpy loop oracle."""
    from realvsr_tpu.ops.deform_conv import modulated_deform_conv_np

    rng = np.random.default_rng(0)
    b, h, w, cin, cout, dg = 1, 6, 5, 4, 4, 2
    x = rng.normal(size=(b, h, w, cin))
    off = rng.normal(size=(b, h, w, dg * 9 * 2)) * 1.3
    m = rng.uniform(size=(b, h, w, dg * 9))
    wgt = rng.normal(size=(3, 3, cin, cout)) * 0.2
    ours = modulated_deform_conv_np(x, off, m, wgt, None, 1, 1, 1, 1, dg)
    ref = torch_dcn_oracle.torch_modulated_deform_conv(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(off.transpose(0, 3, 1, 2)),
        torch.from_numpy(m.transpose(0, 3, 1, 2)),
        torch.from_numpy(wgt.transpose(3, 2, 0, 1)), None, 1, 1, 1, 1, dg,
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=1e-10)


# nf must be 64: the reference hardcodes HRconv/conv_last at 64 channels
CFG = dict(nf=64, nc=3, nframes=3, groups=8, front_RBs=2, back_RBs=2,
           center=None, predeblur=False, HR_in=False)


@pytest.mark.parametrize("w_tsa", [False, True])
def test_edvr_noup_forward_parity(ref_edvr, w_tsa):
    torch.manual_seed(0)
    tmodel = ref_edvr.EDVR_NoUp(w_TSA=w_tsa, **CFG).eval()
    model = EDVRNoUp(w_TSA=w_tsa, **CFG)

    rng = np.random.default_rng(1)
    x = rng.random((2, 3, 16, 16, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = import_torch_state_dict(params, tmodel.state_dict(), strict=True)

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_edvr_x4_forward_parity(ref_edvr):
    torch.manual_seed(1)
    tmodel = ref_edvr.EDVR(w_TSA=True, **CFG).eval()
    model = EDVR(w_TSA=True, **CFG)

    rng = np.random.default_rng(2)
    x = rng.random((1, 3, 12, 12, 3)).astype(np.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    params = import_torch_state_dict(params, tmodel.state_dict(), strict=True)

    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x.transpose(0, 1, 4, 2, 3)))
    ref = ref.numpy().transpose(0, 2, 3, 1)
    assert ours.shape == ref.shape == (1, 48, 48, 3)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_edvr_param_count_matches_reference(ref_edvr):
    """EDVR-M config of the reference smoke block (EDVR_arch.py:407-411)."""
    tmodel = ref_edvr.EDVR(nf=64, nc=1, nframes=7, groups=8, front_RBs=5,
                           back_RBs=10, center=None, predeblur=False,
                           HR_in=False, w_TSA=False)
    ref_count = sum(p.numel() for p in tmodel.parameters() if p.requires_grad)

    model = EDVR(nf=64, nc=1, nframes=7, groups=8, front_RBs=5, back_RBs=10,
                 center=None, predeblur=False, HR_in=False, w_TSA=False)
    x = jnp.zeros((1, 7, 8, 8, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    ours_count = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))
    assert ours_count == ref_count


def test_edvr_block_dcn_matches_exact_at_init():
    """With zero-init offset convs, block-impl EDVR must equal the exact
    path bit-for-bit-ish (offsets are exactly 0 → no clamping)."""
    from realvsr_tpu.ops import deform_conv as dc

    model = EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=1,
                     back_RBs=1, w_TSA=False)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 3, 32, 48, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    exact = np.asarray(model.apply({"params": params}, x))
    prev = dc.set_default_impl("block")
    try:
        blk = np.asarray(model.apply({"params": params}, x))
    finally:
        dc.set_default_impl(*prev)
    np.testing.assert_allclose(blk, exact, atol=2e-5)


def test_edvr_frame_kernel_matches_exact_at_init():
    """Model-level coverage of the fused frame-DMA Pallas path (interpret
    mode on CPU), including the small L2/L3 pyramid shapes and panel
    padding for widths below one block."""
    from realvsr_tpu.ops import deform_conv as dc

    model = EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=1,
                     back_RBs=1, w_TSA=False)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.random((1, 3, 32, 48, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    exact = np.asarray(model.apply({"params": params}, x))
    prev = dc.set_default_impl("frame", pallas_interpret=True)
    try:
        frm = np.asarray(model.apply({"params": params}, x))
    finally:
        dc.set_default_impl(*prev, pallas_interpret=False)
    np.testing.assert_allclose(frm, exact, atol=2e-5)


def test_wi_gt_end_to_end_from_synthetic_pth(ref_edvr, tmp_path):
    """Keep the pretrained-parity path warm (the released reference .pth
    models aren't in this image): a torch-side EDVR_NoUp random init is
    torch.save'd as a state_dict, imported through the production
    checkpoint.load_network shim, evaluated end-to-end by evaluate_wi_gt
    (the test_RealVSR_wi_GT.py:207-216 pipeline), and the forward is
    asserted equal to the torch model on the same pipeline window."""
    import cv2

    from realvsr_tpu.data.imageio import read_img_seq
    from realvsr_tpu.eval.sliding_window import make_forward
    from realvsr_tpu.eval.test_wi_gt import evaluate_wi_gt
    from realvsr_tpu.train import checkpoint as ckpt

    torch.manual_seed(7)
    tmodel = ref_edvr.EDVR_NoUp(w_TSA=False, **CFG).eval()
    pth = str(tmp_path / "synthetic_G.pth")
    torch.save(tmodel.state_dict(), pth)

    # tiny test set: one sequence, 4 frames, 32x48 (pyramid needs %4==0)
    rng = np.random.default_rng(11)
    lq_root, gt_root = tmp_path / "LQ", tmp_path / "GT"
    for root in (lq_root, gt_root):
        (root / "001").mkdir(parents=True)
    for t in range(4):
        frame = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
        cv2.imwrite(str(lq_root / "001" / f"{t:05d}.png"), frame)
        cv2.imwrite(str(gt_root / "001" / f"{t:05d}.png"), frame)

    model = EDVRNoUp(w_TSA=False, **CFG)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 16, 16, 3)))["params"]
    params = ckpt.load_network(pth, params)

    out_dir = str(tmp_path / "results")
    summary = evaluate_wi_gt(model, params, str(lq_root), str(gt_root),
                             n_frames=3, color="YCbCr",
                             save_folder=out_dir)
    assert np.isfinite(summary["psnr"]) and np.isfinite(summary["ssim"])
    import glob as _glob

    assert len(_glob.glob(os.path.join(out_dir, "001", "*.png"))) == 4

    # the forward that produced those outputs == torch forward, same window
    imgs = read_img_seq(str(lq_root / "001"), color="YCbCr")
    window = imgs[0:3]
    ours = np.asarray(make_forward(model, params)(jnp.asarray(window)))
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(
            window.transpose(0, 3, 1, 2)[None].copy()))
    np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1)[0],
                               atol=2e-5)
