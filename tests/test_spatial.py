"""Spatially sharded inference (eval/spatial.py): the H-sharded forward
over the ``model`` mesh axis must match the unsharded model on every
kept (center) row to float reassociation noise — zero-pad fringe corruption stays inside the
halo (SURVEY §2.7/§5 long-context analog)."""
import os

import numpy as np
import pytest

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax
import jax.numpy as jnp

from realvsr_tpu.eval.spatial import (make_spatial_sharded_forward,
                                      receptive_field_rows)
from realvsr_tpu.models.edvr import EDVRNoUp
from realvsr_tpu.parallel.mesh import create_mesh


@pytest.mark.slow
def test_sharded_matches_unsharded_2way():
    model = EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=2,
                     back_RBs=2, predeblur=False, HR_in=False, w_TSA=False)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 32, 32, 3)))["params"]
    # nudge the zero-init offset convs so the DCN actually samples at
    # (small) nonzero offsets — exactness must not rely on offsets == 0
    params = jax.tree_util.tree_map_with_path(
        lambda path, a: a + 0.001 if "conv_offset_mask" in str(path) else a,
        params)

    mesh = create_mesh(data_axis=4, model_axis=2)
    rng = np.random.default_rng(0)
    window = jnp.asarray(rng.uniform(size=(1, 3, 288, 48, 3)), jnp.float32)

    fwd = make_spatial_sharded_forward(model, params, mesh, halo=68)
    sharded = np.asarray(fwd(params, window))

    full = np.asarray(jax.jit(
        lambda p, x: model.apply({"params": p}, x))(params, window))
    assert sharded.shape == full.shape
    # not bitwise: the clamped per-shard window shapes give XLA different
    # reduction tilings (observed max |diff| ~6e-8 = 1 ulp)
    np.testing.assert_allclose(sharded, full, atol=1e-6)


def test_receptive_field_rows_flagship():
    # flagship halo must stay well under half of a 2-way 1088-row shard
    rf = receptive_field_rows(front_RBs=5, back_RBs=10, max_offset=4)
    assert rf % 4 == 0 and 64 <= rf <= 192
