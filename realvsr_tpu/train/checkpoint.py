"""Checkpoint / resume (Orbax), keeping the reference's two-file scheme.

Reference (``codes/models/base_model.py:77-141``): network weights saved as
``<iter>_G.pth`` and trainer state (epoch, iter, scheduler, optimizer) as
``<iter>.state``.  Here: Orbax directories ``<iter>_G`` (params only) and
``<iter>.state`` (step/epoch/opt_state); ``latest`` symlink names are kept.
A ``.pth`` path is transparently imported through the torch-import shim so
reference-trained checkpoints load directly.
"""
from __future__ import annotations

import os
import os.path as osp
import pickle
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.PyTreeCheckpointer()


def save_pytree(path: str, tree: Any) -> None:
    path = osp.abspath(path)
    _checkpointer().save(path, tree, force=True)


def restore_pytree(path: str, template: Any | None = None) -> Any:
    path = osp.abspath(path)
    if template is not None:
        return _checkpointer().restore(path, item=template)
    return _checkpointer().restore(path)


def save_network(models_dir: str, label: str, step: int | str, params) -> None:
    """Save params as <models_dir>/<step>_<label> (e.g. 10000_G)."""
    save_pytree(osp.join(models_dir, f"{step}_{label}"), params)


def load_network(path: str, params_template):
    """Load params from an Orbax dir or a torch .pth file."""
    if path.endswith(".pth") or path.endswith(".pt"):
        import torch

        from realvsr_tpu.train.torch_import import import_torch_state_dict

        sd = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return import_torch_state_dict(params_template, sd, strict=True)
    return restore_pytree(path, params_template)


def load_network_separately(path_a: str, path_b: str, name_a: str,
                            name_b: str, params_template):
    """Two-checkpoint merge (base_model.py:99-119): take submodules whose
    top-level name contains name_a from checkpoint A, name_b from B."""
    pa = load_network(path_a, params_template)
    pb = load_network(path_b, params_template)
    merged = {}
    for key in params_template:
        if name_a in key:
            merged[key] = pa[key]
        elif name_b in key:
            merged[key] = pb[key]
        else:
            merged[key] = pa[key]
    return merged


def save_training_state(state_dir: str, step: int, epoch: int, opt_state) -> None:
    """Trainer-state checkpoint (base_model.py:121-130)."""
    tree = {"step": np.asarray(step), "epoch": np.asarray(epoch),
            "opt_state": jax.device_get(opt_state)}
    save_pytree(osp.join(state_dir, f"{step}.state"), tree)


def load_training_state(path: str, opt_state_template):
    template = {"step": np.asarray(0), "epoch": np.asarray(0),
                "opt_state": opt_state_template}
    tree = restore_pytree(path, template)
    return int(tree["step"]), int(tree["epoch"]), tree["opt_state"]
