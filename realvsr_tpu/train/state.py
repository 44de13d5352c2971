"""Train state + optimizer construction.

Replaces the reference's BaseModel optimizer/scheduler plumbing
(``codes/models/base_model.py``, ``VideoSR_..._Split.py:89-151``) with one
optax chain: Adam(beta1, beta2, weight_decay) driven by the closed-form LR
schedule; ``ft_tsa_only`` is an update mask that freezes non-TSA params
before the given step (the reference zeroes group-0's LR instead,
VideoSR_..._Split.py:160-165).
"""
from __future__ import annotations

from typing import Any, Callable

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from realvsr_tpu.schedules import build_lr_schedule


class TrainState(train_state.TrainState):
    """Adds the mutable BatchNorm running-statistics collection (empty dict
    for the BN-free architectures — EDVR/TDAN/FSTRN/RCAN)."""

    batch_stats: Any = flax.core.FrozenDict()


def _tsa_only_mask_wrapper(tx: optax.GradientTransformation,
                           ft_tsa_only: int) -> optax.GradientTransformation:
    """Zero non-tsa_fusion updates while step < ft_tsa_only."""

    def init(params):
        return tx.init(params)

    def update(updates, state, params=None):
        updates, state = tx.update(updates, state, params)
        step = _opt_step(state)

        def mask(path, u):
            is_tsa = any("tsa_fusion" in p.key for p in path)
            if is_tsa:
                return u
            return jnp.where(step < ft_tsa_only, jnp.zeros_like(u), u)

        updates = jax.tree_util.tree_map_with_path(mask, updates)
        return updates, state

    return optax.GradientTransformation(init, update)


def _opt_step(opt_state):
    for s in jax.tree_util.tree_leaves(
            opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)):
        if isinstance(s, optax.ScaleByAdamState):
            return s.count
    return 0


def build_optimizer(train_opt: dict) -> optax.GradientTransformation:
    """Adam + schedule from a reference-format train config."""
    lr_fn = build_lr_schedule(train_opt)
    # reference steps the scheduler before each iteration: LR at optax update
    # `count` (0-based) equals the torch scheduler at last_epoch = count + 1.
    schedule = lambda count: lr_fn(count + 1)
    beta1 = float(train_opt.get("beta1") or 0.9)
    beta2 = float(train_opt.get("beta2") or 0.99)
    wd = float(train_opt.get("weight_decay_G") or 0.0)
    if wd:
        tx = optax.adamw(schedule, b1=beta1, b2=beta2, weight_decay=wd)
    else:
        tx = optax.adam(schedule, b1=beta1, b2=beta2)
    ft_tsa_only = int(train_opt.get("ft_tsa_only") or 0)
    if ft_tsa_only:
        tx = _tsa_only_mask_wrapper(tx, ft_tsa_only)
    return tx


def create_train_state(model, opt: dict, sample_input, rng) -> TrainState:
    variables = model.init(rng, sample_input)
    tx = build_optimizer(opt["train"])
    return TrainState.create(
        apply_fn=model.apply, params=variables["params"], tx=tx,
        batch_stats=variables.get("batch_stats", flax.core.FrozenDict()))
