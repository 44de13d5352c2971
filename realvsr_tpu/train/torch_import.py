"""Import reference PyTorch checkpoints (.pth state_dicts) into flax params.

Enables parity validation against reference-trained weights and lets users
of the reference framework migrate: ``load_network`` in the reference
(``codes/models/base_model.py:86-97``) loads an OrderedDict of
``module.``-prefixed tensors; this maps those names onto our flax tree.

Mapping rules (flax path → torch key):
  * drop ``Conv_N`` wrapper segments introduced by our Conv2d module,
  * ``blockN`` (Blocks container) → ``N`` (torch nn.Sequential index),
  * leaf ``kernel`` → ``weight`` with OIHW→HWIO transpose,
  * 4-D ``weight`` leaves (DCN main kernels) transposed the same way,
  * BatchNorm: leaf ``scale`` → ``weight``; running stats ``mean``/``var``
    (batch_stats collection) → ``running_mean``/``running_var``
    (torch buffers),
  * everything else keeps its name.

``import_torch_state_dict`` accepts either a bare param tree or a full
flax variables dict (``{'params': ..., 'batch_stats': ...}``) — the latter
also fills BN running statistics so reference-trained SpyNet /
discriminator weights reproduce eval behavior.
"""
from __future__ import annotations

import re
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np


_LEAF_MAP = {"kernel": "weight", "scale": "weight",
             "mean": "running_mean", "var": "running_var"}


def flax_path_to_torch_key(path: tuple[str, ...]) -> str:
    parts = []
    for p in path[:-1]:
        if re.fullmatch(r"Conv_\d+", p):
            continue
        m = re.fullmatch(r"block(\d+)", p)
        parts.append(m.group(1) if m else p)
    leaf = path[-1]
    parts.append(_LEAF_MAP.get(leaf, leaf))
    return ".".join(parts)


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def import_torch_state_dict(params: Mapping[str, Any],
                            state_dict: Mapping[str, Any],
                            strict: bool = True,
                            key_map: list[tuple[str, str]] | None = None):
    """Fill a flax param tree with tensors from a torch state_dict.

    Args:
      params: flax params pytree OR a full variables dict with
        ``params`` / ``batch_stats`` collections (the template, e.g. from
        model.init).
      state_dict: torch name → tensor mapping; ``module.`` prefixes from
        DataParallel wrapping are stripped (base_model.py:90-95).
      strict: raise if any template leaf has no matching torch tensor.
    Returns:
      A new pytree (same structure as ``params``) with imported values
      (float32).
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        sd[k] = v

    is_variables = isinstance(params, Mapping) and "params" in params
    used = set()

    def fill(path, leaf):
        names = tuple(p.key for p in path)
        if is_variables:
            names = names[1:]  # drop the collection name
        tk = flax_path_to_torch_key(names)
        for pat, repl in (key_map or []):
            tk = re.sub(pat, repl, tk)
        if tk not in sd:
            if strict:
                raise KeyError(
                    f"flax param {'/'.join(names)} → torch key '{tk}' not in "
                    f"state_dict")
            return leaf
        used.add(tk)
        t = _to_numpy(sd[tk]).astype(np.float32)
        if t.ndim == 4 and leaf.ndim == 4:
            t = t.transpose(2, 3, 1, 0)  # OIHW → HWIO
        if t.shape != leaf.shape:
            raise ValueError(
                f"shape mismatch for {tk}: torch {t.shape} vs flax {leaf.shape}")
        return jnp.asarray(t)

    new_params = jax.tree_util.tree_map_with_path(fill, params)
    if strict:
        unused = set(sd) - used
        if unused:
            raise KeyError(f"unused torch tensors: {sorted(unused)[:8]}...")
    return new_params


def export_to_torch_state_dict(params: Mapping[str, Any]) -> dict[str, np.ndarray]:
    """Inverse mapping: flax params → torch-style state_dict (numpy)."""
    out = {}

    def dump(path, leaf):
        names = tuple(p.key for p in path)
        tk = flax_path_to_torch_key(names)
        t = np.asarray(leaf)
        if t.ndim == 4:
            t = t.transpose(3, 2, 0, 1)  # HWIO → OIHW
        out[tk] = t
        return leaf

    jax.tree_util.tree_map_with_path(dump, params)
    return out
