"""Device-side batch augmentations (jit-friendly rebuild of
``codes/data/augments_video_allpair.py``).

The reference applies these on-GPU inside optimize_parameters with host
numpy RNG; here they are pure jnp functions over (B, T, H, W, C) video
batches driven by explicit jax.random keys, selected with ``lax.switch`` so
only the sampled branch executes.  CutBlur's dynamic crop becomes a
broadcasted-iota box mask (no dynamic shapes under jit).
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _blend(key, gt, lq, prob: float, alpha: float):
    """Blend with a random solid color (augments_video_allpair.py:38-50)."""
    k_gate, k_c, k_v = jax.random.split(key, 3)
    b, t = gt.shape[0], gt.shape[1]
    c = jax.random.uniform(k_c, (b, t, 1, 1, gt.shape[-1]), gt.dtype)
    v = jax.random.uniform(k_v, (), gt.dtype, alpha, 1.0)
    gt_a = v * gt + (1 - v) * c
    lq_a = v * lq + (1 - v) * c
    gate = (jax.random.uniform(k_gate, ()) < prob) & (alpha > 0)
    return (jnp.where(gate, gt_a, gt), jnp.where(gate, lq_a, lq))


def _cutblur(key, gt, lq, prob: float, alpha: float):
    """LQ↔GT patch swap (augments_video_allpair.py:53-75); x1 scale only."""
    k_gate, k_ratio, k_y, k_x, k_side = jax.random.split(key, 5)
    h, w = gt.shape[-3], gt.shape[-2]
    ratio = jax.random.normal(k_ratio, ()) * 0.01 + alpha
    ratio = jnp.clip(ratio, 0.0, 1.0)
    ch = jnp.floor(h * ratio).astype(jnp.int32)
    cw = jnp.floor(w * ratio).astype(jnp.int32)
    cy = jnp.floor(jax.random.uniform(k_y, ()) * (h - ch + 1)).astype(jnp.int32)
    cx = jnp.floor(jax.random.uniform(k_x, ()) * (w - cw + 1)).astype(jnp.int32)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    box = ((iy >= cy) & (iy < cy + ch) & (ix >= cx) & (ix < cx + cw))
    box = box[None, None, :, :, None]
    inside = jax.random.uniform(k_side, ()) > 0.5
    # inside: paste GT patch into LQ; outside: keep LQ patch, GT elsewhere
    lq_in = jnp.where(box, gt, lq)
    lq_out = jnp.where(box, lq, gt)
    lq_a = jnp.where(inside, lq_in, lq_out)
    gate = (jax.random.uniform(k_gate, ()) < prob) & (alpha > 0)
    return gt, jnp.where(gate, lq_a, lq)


def _rgb(key, gt, lq, prob: float):
    """Random channel permutation (augments_video_allpair.py:78-86)."""
    k_gate, k_perm = jax.random.split(key)
    perm = jax.random.permutation(k_perm, gt.shape[-1])
    gt_a = jnp.take(gt, perm, axis=-1)
    lq_a = jnp.take(lq, perm, axis=-1)
    gate = jax.random.uniform(k_gate, ()) < prob
    return (jnp.where(gate, gt_a, gt), jnp.where(gate, lq_a, lq))


def apply_augment(key, gt, lq, augs: Sequence[str], probs: Sequence[float],
                  alphas: Sequence[float], mix_p: Sequence[float] | None = None):
    """Pick one augmentation by mixing probability and apply it.

    Args:
      gt, lq: (B, T, H, W, C) video batches (GT first — reference passes
        im1=GT, im2=LQ).
    Returns:
      (gt_aug, lq_aug).
    """
    k_pick, k_aug = jax.random.split(key)
    p = None if mix_p is None else jnp.asarray(np.asarray(mix_p, np.float32))
    idx = jax.random.choice(k_pick, len(augs), p=p)

    branches = []
    for name, prob, alpha in zip(augs, probs, alphas):
        prob, alpha = float(prob), float(alpha)
        if name == "none":
            branches.append(lambda k, g, l: (g, l))
        elif name == "blend":
            branches.append(partial(_blend, prob=prob, alpha=alpha))
        elif name == "cutblur":
            branches.append(partial(_cutblur, prob=prob, alpha=alpha))
        elif name == "rgb":
            branches.append(partial(_rgb, prob=prob))
        else:
            raise ValueError(f"{name} is not a valid augmentation.")

    return jax.lax.switch(idx, branches, k_aug, gt, lq)
