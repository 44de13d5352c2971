"""Eval library: sliding window, flipx4 ensemble, evaluate_wi_gt tables."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # torch-oracle / large-compile

from realvsr_tpu.eval.sliding_window import (flipx4_forward, make_forward,
                                             sliding_window_infer)
from realvsr_tpu.models.edvr import EDVRNoUp


@pytest.fixture(scope="module")
def small_model():
    model = EDVRNoUp(nf=8, nc=3, nframes=3, groups=2, front_RBs=1, back_RBs=1,
                     w_TSA=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 16, 16, 3)))["params"]
    return model, params


def test_sliding_window_covers_all_frames(small_model):
    model, params = small_model
    fwd = make_forward(model, params)
    frames = np.random.default_rng(0).random((5, 16, 16, 3)).astype(np.float32)
    outs = dict(sliding_window_infer(fwd, frames, 3, padding="replicate"))
    assert sorted(outs) == [0, 1, 2, 3, 4]
    assert outs[0].shape == (16, 16, 3)


def test_flipx4_is_flip_equivariant_average(small_model):
    model, params = small_model
    fwd = make_forward(model, params)
    w = jnp.asarray(np.random.default_rng(1).random((3, 16, 16, 3)),
                    jnp.float32)
    out = flipx4_forward(fwd, w)
    # flipping the input flips the ensemble output (by construction)
    out_f = flipx4_forward(fwd, jnp.flip(w, axis=-2))
    np.testing.assert_allclose(np.asarray(jnp.flip(out_f, axis=-2)),
                               np.asarray(out), atol=1e-5)


def test_evaluate_wi_gt_emits_summary(small_model, tmp_path):
    import cv2

    from realvsr_tpu.eval.test_wi_gt import evaluate_wi_gt

    model, params = small_model
    rng = np.random.default_rng(2)
    for seq in ["000", "001"]:
        for t in range(4):
            img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
            for kind in ["LQ", "GT"]:
                d = tmp_path / kind / seq
                os.makedirs(d, exist_ok=True)
                cv2.imwrite(str(d / f"{t:05d}.png"), img)
    summary = evaluate_wi_gt(
        model, params, str(tmp_path / "LQ"), str(tmp_path / "GT"),
        n_frames=3, color=None, padding="replicate",
        save_folder=str(tmp_path / "out"))
    assert summary["n_clips"] == 2
    assert np.isfinite(summary["psnr"]) and 0 <= summary["ssim"] <= 1
    assert os.path.exists(tmp_path / "out" / "000" / "00000.png")
