"""LR schedules as pure step→lr functions (optax-compatible).

Reproduces the reference's stateful torch schedulers
(``codes/models/lr_scheduler.py``) in closed form, including the off-by-one
conventions: the reference steps the scheduler *before* each iteration
(``base_model.py:52-64``), so the LR used at training step k (1-based)
equals the torch scheduler value at ``last_epoch = k``; restarts fire at
``restart_iter + 1`` (lr_scheduler.py:15, 41).  Linear warmup then
overwrites the LR for ``step < warmup_iter`` (base_model.py:56-63).
"""
from __future__ import annotations

import math
from bisect import bisect_right
from collections import Counter

import jax.numpy as jnp
import numpy as np


def cosine_annealing_restart(base_lr: float, t_period, restarts=None,
                             weights=None, eta_min: float = 0.0):
    """CosineAnnealingLR_Restart (lr_scheduler.py:35-64) closed form."""
    restarts = [v + 1 for v in (restarts or [])]
    weights = list(weights or [])
    assert len(restarts) == len(weights), "restarts and weights must match"
    bounds = np.array(restarts, dtype=np.int64)
    seg_start = np.array([0] + restarts, dtype=np.float32)
    seg_weight = np.array([1.0] + weights, dtype=np.float32)
    seg_period = np.array(t_period[: len(restarts) + 1], dtype=np.float32)

    def lr_fn(step):
        step = jnp.asarray(step, jnp.float32)
        seg = jnp.sum(step >= jnp.asarray(bounds, jnp.float32)) if len(
            restarts) else 0
        start = jnp.asarray(seg_start)[seg]
        w = jnp.asarray(seg_weight)[seg]
        t_max = jnp.asarray(seg_period)[seg]
        return eta_min + (base_lr * w - eta_min) * (
            1 + jnp.cos(jnp.pi * (step - start) / t_max)) / 2.0

    return lr_fn


def multistep_restart(base_lr: float, milestones, restarts=None, weights=None,
                      gamma: float = 0.1):
    """MultiStepLR_Restart (lr_scheduler.py:8-32) closed form.

    LR at step t = base * weight(segment of t) * gamma^(#milestones in
    (segment_start, t]).
    """
    restarts = [v + 1 for v in (restarts or [])]
    weights = list(weights or [])
    if restarts == [1]:  # reference default restarts=[0] → shifted [1]
        restarts, weights = [], []
    assert len(restarts) == len(weights)
    ms = Counter(milestones)
    ms_sorted = sorted(ms.items())
    ms_steps = np.array([m for m, _ in ms_sorted], dtype=np.int64)
    ms_counts = np.cumsum([c for _, c in ms_sorted]).astype(np.int64)
    seg_bounds = list(restarts)

    def decay_count_upto(t: np.ndarray, lo):
        """#milestones m with lo < m <= t (vector-friendly)."""
        hi_idx = np.searchsorted(ms_steps, t, side="right")
        lo_idx = np.searchsorted(ms_steps, lo, side="right")
        hi_c = np.where(hi_idx > 0, ms_counts[np.maximum(hi_idx - 1, 0)], 0)
        lo_c = np.where(lo_idx > 0, ms_counts[np.maximum(lo_idx - 1, 0)], 0)
        return hi_c - lo_c

    def lr_fn(step):
        # host-side closed form; jit users should precompute a table
        t = int(step)
        seg = bisect_right(seg_bounds, t)
        start = 0 if seg == 0 else seg_bounds[seg - 1]
        w = 1.0 if seg == 0 else weights[seg - 1]
        n = int(decay_count_upto(np.asarray(t), start))
        return base_lr * w * (gamma**n)

    return lr_fn


def tabulate_schedule(lr_fn, niter: int) -> jnp.ndarray:
    """Precompute lr for steps 0..niter as a device array (for jit lookup)."""
    return jnp.asarray([float(lr_fn(t)) for t in range(niter + 1)],
                       dtype=jnp.float32)


def with_warmup(lr_fn, base_lr: float, warmup_iter: int = -1):
    """Linear warmup override for step < warmup_iter (base_model.py:52-64)."""
    if warmup_iter <= 0:
        return lr_fn

    def fn(step):
        lr = lr_fn(step)
        warm = base_lr * jnp.asarray(step, jnp.float32) / warmup_iter
        return jnp.where(jnp.asarray(step) < warmup_iter, warm, lr)

    return fn


def build_lr_schedule(train_opt: dict):
    """Build the step→lr function from a reference-format train config."""
    base_lr = float(train_opt["lr_G"])
    scheme = train_opt.get("lr_scheme", "MultiStepLR")
    if scheme == "CosineAnnealingLR_Restart":
        fn = cosine_annealing_restart(
            base_lr,
            train_opt["T_period"],
            train_opt.get("restarts") or [],
            train_opt.get("restart_weights") or [],
            float(train_opt.get("eta_min") or 0.0),
        )
    elif scheme in ("MultiStepLR", "MultiStepLR_Restart"):
        raw = multistep_restart(
            base_lr,
            train_opt.get("lr_steps") or [],
            train_opt.get("restarts") or [],
            train_opt.get("restart_weights") or [],
            float(train_opt.get("lr_gamma") or 0.1),
        )
        niter = int(train_opt["niter"])
        table = tabulate_schedule(raw, niter)

        def fn(step):
            idx = jnp.clip(jnp.asarray(step, jnp.int32), 0, niter)
            return table[idx]

    else:
        raise NotImplementedError(f"lr scheme {scheme} not supported")
    warmup = int(train_opt.get("warmup_iter") or -1)
    return with_warmup(fn, base_lr, warmup)
