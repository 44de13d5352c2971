"""Device mesh + sharding helpers (replaces the reference's NCCL/DDP layer).

The reference initializes an NCCL process group and wraps the net in
DistributedDataParallel (``train.py:19-26``, ``VideoSR_..._Split.py:33-36``).
TPU-native equivalent: one ``jax.sharding.Mesh`` over all chips with a
``data`` axis (and a reserved ``model`` axis for spatial/tensor sharding of
1080p inference); the train step is jitted with the batch sharded on
``data`` and params replicated — XLA inserts the gradient all-reduce over
ICI.  ``jax.process_index() == 0`` gates logging/checkpointing like the
reference's ``rank <= 0``.
"""
from __future__ import annotations

import os
from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _cluster_env_detected() -> bool:
    """True when JAX's standard cluster auto-detection applies — explicit
    coordinator env vars, or any registered cluster environment (TPU
    pod/GKE metadata, Slurm, OpenMPI, k8s...)."""
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        return True
    try:
        from jax._src import clusters

        return any(c.is_env_present() for c in clusters.ClusterEnv._cluster_types)
    except Exception:
        return False


def maybe_initialize_distributed() -> None:
    """Multi-process bootstrap (replaces the reference's NCCL init_dist,
    train.py:19-26): call ``jax.distributed.initialize()`` whenever JAX's
    standard cluster auto-detection applies — real multi-host TPU pods
    auto-detect coordinator/rank from platform metadata, not just from
    JAX_COORDINATOR_ADDRESS.  Single-process (no cluster environment, or
    already initialized) remains a no-op."""
    if not _cluster_env_detected():
        return
    try:
        from jax._src.distributed import global_state

        if getattr(global_state, "client", None) is not None:
            return  # already initialized
    except Exception:
        pass
    jax.distributed.initialize()


def create_mesh(data_axis: int | None = None, model_axis: int = 1,
                devices=None) -> Mesh:
    """1-D (or 2-D) mesh over all devices: ('data',) or ('data', 'model')."""
    devices = np.array(jax.devices() if devices is None else devices)
    n = len(devices)
    if data_axis is None:
        data_axis = n // model_axis
    assert data_axis * model_axis == n, (data_axis, model_axis, n)
    if model_axis == 1:
        return Mesh(devices.reshape(data_axis), ("data",))
    return Mesh(devices.reshape(data_axis, model_axis), ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Mapping[str, Any], mesh: Mesh):
    """Place a host batch on the mesh, sharded along the batch axis."""
    sh = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def is_main_process() -> bool:
    return jax.process_index() == 0
