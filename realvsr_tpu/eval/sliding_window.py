"""Sliding-window full-sequence inference helpers.

Rebuilds ``utils/util.py:222-261`` (single_forward / flipx4_forward self-
ensemble) and the per-frame windowing of the eval scripts
(``test_RealVSR_wi_GT.py:113-119``) on top of one jitted forward.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from realvsr_tpu.utils.indexing import index_generation


def make_forward(model, params, donate: bool = False) -> Callable:
    """Jitted (T, H, W, C)-window → (H, W, C) forward with batch dim 1.

    ``params`` may be a bare param tree or a full variables dict (with a
    ``batch_stats`` collection for BN models — eval uses running stats).
    """
    variables = params if "params" in params else {"params": params}

    @jax.jit
    def fwd(v, window):
        return model.apply(v, window[None])[0]

    return lambda window: fwd(variables, window)


def flipx4_forward(forward: Callable, window: jnp.ndarray) -> jnp.ndarray:
    """Self-ensemble: average over H/W/HW flips (utils/util.py:240-261)."""
    acc = forward(window)
    acc = acc + jnp.flip(forward(jnp.flip(window, axis=-2)), axis=-2)
    acc = acc + jnp.flip(forward(jnp.flip(window, axis=-3)), axis=-3)
    acc = acc + jnp.flip(forward(jnp.flip(window, axis=(-3, -2))), axis=(-3, -2))
    return acc / 4.0


def sliding_window_infer(forward: Callable, frames: np.ndarray, n_frames: int,
                         padding: str = "replicate",
                         flip_test: bool = False):
    """Yield (frame_idx, output) over a full (T, H, W, C) sequence."""
    max_idx = frames.shape[0]
    frames_j = jnp.asarray(frames, jnp.float32)
    for idx in range(max_idx):
        select = index_generation(idx, max_idx, n_frames, padding=padding)
        window = frames_j[jnp.asarray(select)]
        if flip_test:
            out = flipx4_forward(forward, window)
        else:
            out = forward(window)
        yield idx, np.asarray(out, np.float32)
