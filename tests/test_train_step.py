"""End-to-end train-step tests: Split/Combine wrappers on an 8-device mesh,
augments, checkpoint round-trip."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realvsr_tpu.data.augments import apply_augment
from realvsr_tpu.models.edvr import EDVRNoUp
from realvsr_tpu.parallel.mesh import create_mesh, shard_batch
from realvsr_tpu.train.state import create_train_state
from realvsr_tpu.train.wrappers import make_split_train_step, make_combine_train_step

TRAIN_OPT = {
    "lr_G": 1e-4, "lr_scheme": "CosineAnnealingLR_Restart", "beta1": 0.9,
    "beta2": 0.99, "niter": 100, "warmup_iter": -1,
    "T_period": [100, 100], "restarts": [100], "restart_weights": [1],
    "eta_min": 1e-7,
    "pixel_criterion_y": "lappyr", "pixel_weight_y": 1.0,
    "pixel_criterion_c": "gw", "pixel_weight_c": 1.0,
    "pixel_criterion": "cb", "pixel_weight": 1.0,
}

OPT = {
    "model": "VideoSR_AllPair_YCbCr_Split",
    "train": TRAIN_OPT,
    "augment": {"augs": ["none", "cutblur"], "probs": [1.0, 1.0],
                "mix_p": [0.5, 0.5], "alphas": [1.0, 0.7]},
}


def tiny_model():
    return EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=1, back_RBs=1,
                    w_TSA=False)


def tiny_batch(b=8, t=3, hw=48):
    rng = np.random.default_rng(0)
    return {
        "LQs": jnp.asarray(rng.random((b, t, hw, hw, 3)), jnp.float32),
        "GT": jnp.asarray(rng.random((b, t, hw, hw, 3)), jnp.float32),
    }


@pytest.mark.slow
class TestSplitTrainStep:
    def test_loss_decreases_and_runs_sharded(self):
        # no augmentation: fixed batch → loss must decrease deterministically
        opt = dict(OPT, augment=None)
        model = tiny_model()
        batch = tiny_batch()
        state = create_train_state(model, opt, batch["LQs"][:1],
                                   jax.random.PRNGKey(0))
        mesh = create_mesh()
        assert mesh.devices.size == 8
        batch = shard_batch(batch, mesh)
        step_fn = jax.jit(make_split_train_step(model, opt), donate_argnums=0)

        losses = []
        rng = jax.random.PRNGKey(1)
        for i in range(8):
            rng, sub = jax.random.split(rng)
            state, logs = step_fn(state, batch, sub)
            losses.append(float(logs["l_pix"]))
        assert losses[-1] < losses[0], losses
        assert int(state.step) == 8
        assert np.isfinite(losses).all()

    def test_augmented_step_finite(self):
        model = tiny_model()
        batch = tiny_batch(b=4)
        state = create_train_state(model, OPT, batch["LQs"][:1],
                                   jax.random.PRNGKey(0))
        step_fn = jax.jit(make_split_train_step(model, OPT))
        for i in range(3):
            state, logs = step_fn(state, batch, jax.random.PRNGKey(i))
            assert np.isfinite(float(logs["l_pix"]))

    def test_combine_step(self):
        opt = dict(OPT, model="VideoSR_AllPair_YCbCr_Combine")
        model = tiny_model()
        batch = tiny_batch(b=4)
        state = create_train_state(model, opt, batch["LQs"][:1],
                                   jax.random.PRNGKey(0))
        step_fn = jax.jit(make_combine_train_step(model, opt))
        state, logs = step_fn(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(logs["l_tot"]))


class TestAugments:
    def test_cutblur_swaps_box(self):
        rng = np.random.default_rng(1)
        gt = jnp.asarray(rng.random((2, 3, 24, 24, 3)), jnp.float32)
        lq = jnp.zeros_like(gt)
        out_gt, out_lq = apply_augment(
            jax.random.PRNGKey(5), gt, lq, ["cutblur"], [1.0], [0.7], [1.0])
        np.testing.assert_array_equal(np.asarray(out_gt), np.asarray(gt))
        changed = np.mean(np.asarray(out_lq) != 0)
        assert 0.0 < changed < 1.0  # a box got swapped in, not everything

    def test_none_identity(self):
        gt = jnp.ones((1, 3, 8, 8, 3))
        lq = jnp.zeros((1, 3, 8, 8, 3))
        g, l = apply_augment(jax.random.PRNGKey(0), gt, lq, ["none"], [1.0],
                             [1.0], [1.0])
        np.testing.assert_array_equal(np.asarray(g), 1.0)
        np.testing.assert_array_equal(np.asarray(l), 0.0)

    def test_rgb_permutes_both(self):
        rng = np.random.default_rng(2)
        gt = jnp.asarray(rng.random((1, 2, 8, 8, 3)), jnp.float32)
        lq = jnp.asarray(rng.random((1, 2, 8, 8, 3)), jnp.float32)
        g, l = apply_augment(jax.random.PRNGKey(123), gt, lq, ["rgb"], [1.0],
                             [1.0], [1.0])
        assert sorted(np.asarray(g).sum(axis=(0, 1, 2, 3)).tolist()) == \
            pytest.approx(sorted(np.asarray(gt).sum(axis=(0, 1, 2, 3)).tolist()))

    def test_blend(self):
        rng = np.random.default_rng(3)
        gt = jnp.asarray(rng.random((1, 2, 8, 8, 3)), jnp.float32)
        lq = jnp.asarray(rng.random((1, 2, 8, 8, 3)), jnp.float32)
        g, l = apply_augment(jax.random.PRNGKey(7), gt, lq, ["blend"], [1.0],
                             [0.6], [1.0])
        assert not np.allclose(np.asarray(g), np.asarray(gt))


class TestCheckpoint:
    def test_roundtrip(self):
        from realvsr_tpu.train import checkpoint as ckpt

        model = tiny_model()
        batch = tiny_batch(b=2)
        state = create_train_state(model, OPT, batch["LQs"][:1],
                                   jax.random.PRNGKey(0))
        with tempfile.TemporaryDirectory() as d:
            ckpt.save_network(d, "G", 100, state.params)
            restored = ckpt.load_network(os.path.join(d, "100_G"), state.params)
            jax.tree_util.tree_map(
                lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                           np.asarray(b)),
                state.params, restored)
            ckpt.save_training_state(d, 100, 3, state.opt_state)
            step, epoch, opt_state = ckpt.load_training_state(
                os.path.join(d, "100.state"), state.opt_state)
            assert step == 100 and epoch == 3


@pytest.mark.slow
class TestFtTsaOnly:
    def test_non_tsa_params_frozen_before_threshold(self):
        """ft_tsa_only freezes non-tsa_fusion params for the first N steps
        (reference sets group-0 LR to zero, VideoSR_..._Split.py:160-165)."""
        opt = dict(OPT, augment=None)
        opt["train"] = dict(TRAIN_OPT, ft_tsa_only=2,
                            pixel_criterion_y="cb", pixel_criterion_c="cb")
        model = EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=1,
                         back_RBs=1, w_TSA=True)
        batch = tiny_batch(b=2)
        state = create_train_state(model, opt, batch["LQs"][:1],
                                   jax.random.PRNGKey(0))
        step_fn = jax.jit(make_split_train_step(model, opt))

        def split_leaves(params):
            tsa, other = [], []
            def walk(path, leaf):
                (tsa if any("tsa_fusion" in p.key for p in path) else
                 other).append(np.asarray(leaf))
                return leaf
            jax.tree_util.tree_map_with_path(walk, params)
            return tsa, other

        tsa0, other0 = split_leaves(state.params)
        state, _ = step_fn(state, batch, jax.random.PRNGKey(1))
        tsa1, other1 = split_leaves(state.params)
        # step 1 (< 2): only TSA params moved
        assert any(np.abs(a - b).max() > 0 for a, b in zip(tsa0, tsa1))
        assert all(np.array_equal(a, b) for a, b in zip(other0, other1))
        state, _ = step_fn(state, batch, jax.random.PRNGKey(2))
        state, _ = step_fn(state, batch, jax.random.PRNGKey(3))
        _, other3 = split_leaves(state.params)
        # past the threshold: non-TSA params move too
        assert any(np.abs(a - b).max() > 0 for a, b in zip(other1, other3))


class TestMixedPrecision:
    def test_bf16_model_train_step_finite(self):
        """train.mixed_precision: bf16 activations, f32 params."""
        from realvsr_tpu.models.edvr import EDVRNoUp as E

        model = E(nf=16, nc=3, nframes=3, groups=4, front_RBs=1, back_RBs=1,
                  w_TSA=False, dtype=jnp.bfloat16)
        batch = tiny_batch(b=2, hw=48)
        state = create_train_state(model, OPT, batch["LQs"][:1],
                                   jax.random.PRNGKey(0))
        # params stay full-precision even with bf16 compute (f64 here
        # because the test conftest enables x64)
        assert all(p.dtype != jnp.bfloat16
                   for p in jax.tree_util.tree_leaves(state.params))
        step = jax.jit(make_split_train_step(model, OPT))
        state, logs = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(logs["l_pix"]))
        assert int(state.step) == 1
