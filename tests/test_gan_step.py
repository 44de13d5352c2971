"""GAN-Split training step: end-to-end smoke on the 8-device mesh."""
import pytest

pytestmark = pytest.mark.slow  # torch-oracle / large-compile
import jax
import jax.numpy as jnp
import numpy as np

from realvsr_tpu.models.discriminators import MultiscaleDiscriminatorV4
from realvsr_tpu.models.edvr import EDVRNoUp
from realvsr_tpu.train.gan import (create_gan_train_state,
                                   make_gan_split_train_step)

OPT = {
    "model": "VideoSRGAN_AllPair_YCbCr_Split",
    "train": {
        "lr_G": 5e-5, "lr_D": 5e-5, "beta1_G": 0.9, "beta2_G": 0.99,
        "beta1_D": 0.9, "beta2_D": 0.99, "weight_decay_G": 0,
        "weight_decay_D": 0, "lr_scheme": "CosineAnnealingLR_Restart",
        "niter": 100, "warmup_iter": -1, "T_period": [100, 100],
        "restarts": [100], "restart_weights": [1], "eta_min": 1e-7,
        "pixel_criterion_s": "ssim", "pixel_weight_s": 1.0,
        "pixel_criterion_d": "cb", "pixel_weight_d": 1.0,
        "pixel_criterion_c": "gw", "pixel_weight_c": 1.0,
        "feature_criterion": "cb", "feature_weight": 0.0,
        "gan_type": "ragan", "gan_weight": 1e-4,
    },
    "augment": None,
}


def test_gan_train_step_runs_and_is_finite():
    model_g = EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=1,
                       back_RBs=1, w_TSA=False)
    model_d = MultiscaleDiscriminatorV4(input_nc=1, ndf=8, num_D=2,
                                        gan_type="patch")
    rng = np.random.default_rng(0)
    hw = 48
    batch = {
        "LQs": jnp.asarray(rng.random((2, 3, hw, hw, 3)), jnp.float32),
        "GT": jnp.asarray(rng.random((2, 3, hw, hw, 3)), jnp.float32),
    }
    state = create_gan_train_state(model_g, model_d, OPT, batch["LQs"],
                                   jax.random.PRNGKey(0))
    step_fn = jax.jit(make_gan_split_train_step(model_g, OPT),
                      donate_argnums=0)
    for i in range(3):
        state, logs = step_fn(state, batch, jax.random.PRNGKey(i))
        vals = {k: float(v) for k, v in logs.items()}
        assert np.isfinite(list(vals.values())).all(), vals
    assert int(state.step) == 3
    assert "l_d_real" in vals and "l_g_gan" in vals


def test_gan_type_vanilla():
    opt = dict(OPT)
    opt["train"] = dict(OPT["train"], gan_type="gan", D_update_ratio=2,
                        D_init_iters=1)
    model_g = EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=1,
                       back_RBs=1, w_TSA=False)
    model_d = MultiscaleDiscriminatorV4(input_nc=1, ndf=8, num_D=2,
                                        gan_type="patch")
    rng = np.random.default_rng(1)
    batch = {
        "LQs": jnp.asarray(rng.random((2, 3, 48, 48, 3)), jnp.float32),
        "GT": jnp.asarray(rng.random((2, 3, 48, 48, 3)), jnp.float32),
    }
    state = create_gan_train_state(model_g, model_d, opt, batch["LQs"],
                                   jax.random.PRNGKey(0))
    step_fn = jax.jit(make_gan_split_train_step(model_g, opt))
    g0 = state.params_g
    state, logs = step_fn(state, batch, jax.random.PRNGKey(0))
    # step 1: 1 % 2 != 0 → G gated off; params_g unchanged
    assert float(logs["g_active"]) == 0.0
    diff = sum(
        float(jnp.abs(a - b).sum())
        for a, b in zip(jax.tree_util.tree_leaves(g0),
                        jax.tree_util.tree_leaves(state.params_g)))
    assert diff == 0.0
    state, logs = step_fn(state, batch, jax.random.PRNGKey(1))
    # step 2: 2 % 2 == 0 and 2 > 1 → G active
    assert float(logs["g_active"]) == 1.0
