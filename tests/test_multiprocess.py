"""Real multi-process data parallelism (VERDICT round-2 item 5).

The reference's distributed layer is multi-process DDP over NCCL
(``/root/reference/codes/train.py:19-26``); the TPU-native equivalent is
``jax.distributed.initialize`` + one global Mesh.  This test launches TWO
OS processes, each owning 4 virtual CPU devices, joins them through the
coordinator service, runs the Split train step on the 8-device global mesh
with process-local batch shards, and asserts:

  * both processes converge to identical (bit-for-bit) replicated params,
  * the result matches a single-process 8-device run of the same problem,
  * the process-strided ``IterationSampler`` shards indices disjointly
    (``data_sampler.py:46-59`` semantics).
"""
from __future__ import annotations

import os
import pickle
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, pickle, sys
sys.path.insert(0, os.environ["REPO"])
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(os.environ["PROC_ID"])
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"], num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())
assert len(jax.local_devices()) == 4

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from realvsr_tpu.models.edvr import EDVRNoUp
from realvsr_tpu.parallel.mesh import create_mesh, batch_sharding, replicated
from realvsr_tpu.train.state import create_train_state
from realvsr_tpu.train.wrappers import make_split_train_step

OPT = {
    "model": "VideoSR_AllPair_YCbCr_Split",
    "train": {
        "lr_G": 1e-4, "lr_scheme": "CosineAnnealingLR_Restart", "beta1": 0.9,
        "beta2": 0.99, "niter": 100, "warmup_iter": -1,
        "T_period": [100, 100], "restarts": [100], "restart_weights": [1],
        "eta_min": 1e-7,
        "pixel_criterion_y": "lappyr", "pixel_weight_y": 1.0,
        "pixel_criterion_c": "gw", "pixel_weight_c": 1.0,
    },
    "augment": None,
}

model = EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=1, back_RBs=1,
                 w_TSA=False)
rng = np.random.default_rng(0)
batch_np = {
    "LQs": rng.random((8, 3, 3, 48, 48, 3)).astype(np.float32),
    "GT": rng.random((8, 3, 3, 48, 48, 3)).astype(np.float32),
}
# steps use batch axis 0 of shape 8 (global); each process contributes the
# rows its 4 local devices own — process-strided contiguous blocks
mesh = create_mesh()
bsh = batch_sharding(mesh)
rsh = replicated(mesh)

state = create_train_state(model, OPT, jnp.zeros((1, 3, 48, 48, 3)),
                           jax.random.PRNGKey(0))
# every array leaf of the state is identical on both hosts (same init seed)
# -> place as fully-replicated global arrays on the 8-device mesh
state = jax.tree_util.tree_map(
    lambda x: jax.make_array_from_process_local_data(rsh, np.asarray(x)),
    state)

step_fn = jax.jit(make_split_train_step(model, OPT))
for it in range(3):
    gb = {k: v[:, it] for k, v in batch_np.items()}  # (8, T, H, W, C)
    lo = pid * 4
    batch = {
        k: jax.make_array_from_process_local_data(bsh, v[lo:lo + 4])
        for k, v in gb.items()
    }
    state, metrics = step_fn(state, batch, jax.random.PRNGKey(100 + it))

leaves = jax.tree_util.tree_leaves(state.params)
flat = np.concatenate([np.asarray(l.addressable_data(0)).ravel()
                       for l in leaves])
with open(os.environ["OUT"], "wb") as f:
    pickle.dump({"params": flat,
                 "loss": float(np.asarray(
                     metrics["l_pix"].addressable_data(0)))}, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_split_step_matches_single_process(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    outs = [tmp_path / f"out{i}.pkl" for i in range(2)]
    procs = []
    for i in range(2):
        env = dict(
            os.environ, REPO=REPO, PROC_ID=str(i),
            COORD=f"127.0.0.1:{port}", OUT=str(outs[i]),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    res = [pickle.loads(o.read_bytes()) for o in outs]
    # both processes hold the same replicated params — bit for bit
    np.testing.assert_array_equal(res[0]["params"], res[1]["params"])
    assert res[0]["loss"] == res[1]["loss"]

    # single-process 8-device run of the identical problem (this pytest
    # process already has 8 virtual devices via conftest)
    import jax
    import jax.numpy as jnp

    from realvsr_tpu.models.edvr import EDVRNoUp
    from realvsr_tpu.parallel.mesh import create_mesh, shard_batch
    from realvsr_tpu.train.state import create_train_state
    from realvsr_tpu.train.wrappers import make_split_train_step

    OPT = {
        "model": "VideoSR_AllPair_YCbCr_Split",
        "train": {
            "lr_G": 1e-4, "lr_scheme": "CosineAnnealingLR_Restart",
            "beta1": 0.9, "beta2": 0.99, "niter": 100, "warmup_iter": -1,
            "T_period": [100, 100], "restarts": [100], "restart_weights": [1],
            "eta_min": 1e-7,
            "pixel_criterion_y": "lappyr", "pixel_weight_y": 1.0,
            "pixel_criterion_c": "gw", "pixel_weight_c": 1.0,
        },
        "augment": None,
    }
    model = EDVRNoUp(nf=16, nc=3, nframes=3, groups=4, front_RBs=1,
                     back_RBs=1, w_TSA=False)
    rng = np.random.default_rng(0)
    batch_np = {
        "LQs": rng.random((8, 3, 3, 48, 48, 3)).astype(np.float32),
        "GT": rng.random((8, 3, 3, 48, 48, 3)).astype(np.float32),
    }
    mesh = create_mesh()
    state = create_train_state(model, OPT, jnp.zeros((1, 3, 48, 48, 3)),
                               jax.random.PRNGKey(0))
    step_fn = jax.jit(make_split_train_step(model, OPT))
    for it in range(3):
        batch = shard_batch({k: jnp.asarray(v[:, it])
                             for k, v in batch_np.items()}, mesh)
        state, metrics = step_fn(state, batch, jax.random.PRNGKey(100 + it))
    leaves = jax.tree_util.tree_leaves(state.params)
    flat = np.concatenate([np.asarray(l).ravel() for l in leaves])
    # cross-host collectives may reduce in a different association order
    np.testing.assert_allclose(res[0]["params"], flat, rtol=0, atol=1e-5)


def test_iteration_sampler_process_disjoint():
    """Ranks take disjoint strided positions of one epoch permutation and
    together cover it exactly (data_sampler.py:46-59 semantics)."""
    from realvsr_tpu.data.loader import IterationSampler

    n, world, ratio, epoch = 37, 4, 3, 5
    samplers = [IterationSampler(n, num_replicas=world, rank=r, ratio=ratio)
                for r in range(world)]
    streams = [s.indices(epoch) for s in samplers]
    total = samplers[0].total_size
    full = np.random.default_rng(epoch).permutation(total) % n
    for r, st in enumerate(streams):
        np.testing.assert_array_equal(st, full[r:total:world])
    assert sum(len(st) for st in streams) == total


def test_maybe_initialize_distributed_single_process_noop(monkeypatch):
    """No cluster environment -> no jax.distributed.initialize() call;
    any detected cluster env (or JAX_COORDINATOR_ADDRESS) -> exactly one.
    Ref: the reference only bootstraps when --launcher is passed
    (train.py:19-26); real TPU pods want unconditional auto-detection."""
    import realvsr_tpu.parallel.mesh as mesh_mod

    calls = []
    monkeypatch.setattr(mesh_mod.jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    # this CI process is not a Slurm/MPI/TPU-pod member: must be a no-op
    mesh_mod.maybe_initialize_distributed()
    assert calls == []

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:9999")
    mesh_mod.maybe_initialize_distributed()
    assert calls == [1]

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS")
    monkeypatch.setattr(mesh_mod, "_cluster_env_detected", lambda: True)
    mesh_mod.maybe_initialize_distributed()
    assert calls == [1, 1]
