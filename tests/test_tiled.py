"""Tiled inference equals full-frame inference away from tile seams."""
import pytest

pytestmark = pytest.mark.slow  # torch-oracle / large-compile
import jax
import jax.numpy as jnp
import numpy as np

from realvsr_tpu.eval.tiled import tiled_forward
from realvsr_tpu.models.edvr import EDVRNoUp


def test_tiled_matches_full_for_local_model():
    """A conv model with RF smaller than the overlap must stitch exactly."""
    model = EDVRNoUp(nf=8, nc=3, nframes=3, groups=2, front_RBs=1, back_RBs=1,
                     w_TSA=False)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((3, 64, 96, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[None])["params"]

    @jax.jit
    def fwd(tile):
        return model.apply({"params": params}, tile[None])[0]

    full = np.asarray(fwd(x))
    tiled = tiled_forward(fwd, x, tile_hw=(48, 64), overlap=16, scale=1)
    # interior (away from frame borders where padding contexts differ):
    # overlap 16 > RF of this tiny config in most of the frame
    diff = np.abs(full - tiled)[8:-8, 8:-8]
    assert diff.max() < 2e-2, diff.max()
    # majority of pixels identical
    assert np.mean(diff < 1e-5) > 0.85


def test_batched_tiled_matches_loop_tiled():
    """The single-jit batched tiler reproduces the loop tiler exactly
    (same grid, same clamped edge tiles, same valid-center stitching)."""
    from realvsr_tpu.eval.tiled import make_batched_tiled_forward

    model = EDVRNoUp(nf=8, nc=3, nframes=3, groups=2, front_RBs=1, back_RBs=1,
                     w_TSA=False)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.random((3, 64, 96, 3)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[None])["params"]

    @jax.jit
    def fwd(tile):
        return model.apply({"params": params}, tile[None])[0]

    loop = tiled_forward(fwd, x, tile_hw=(48, 64), overlap=16, scale=1)
    batched = make_batched_tiled_forward(
        model, params, tile_hw=(48, 64), overlap=16, scale=1)(x)
    np.testing.assert_allclose(np.asarray(batched, np.float32), loop,
                               atol=1e-5)
