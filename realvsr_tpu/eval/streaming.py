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
        self._scan_all = None

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

    def run_scan(self, frames):
        """Whole streaming loop inside ONE jit via lax.scan (TPU-native:
        no per-frame dispatch/tunnel overhead).  N=3 windows only; border
        frames use replicate padding like the reference's
        index_generation (data/util.py:169-214).

        The carry holds the previous two frames' pyramids; each scan step
        ingests one new frame, computes its pyramid, and reconstructs the
        window centered on the middle cached frame.
        """
        assert self.n == 3 and self.padding == "replicate"
        frames = jnp.asarray(frames)
        if self._scan_all is None:
            self._scan_all = self._build_scan()
        return self._scan_all(self.params, frames[:, None])[:, 0]

    def run_scan_clips(self, clips):
        """Batched-clip variant of :meth:`run_scan`: clips (B, T, H, W, C)
        restored as one lax.scan over time with the B clips stacked in the
        model batch axis (device-side multi-clip video throughput —
        BASELINE config #5).  Outputs equal per-clip :meth:`run_scan`."""
        assert self.n == 3 and self.padding == "replicate"
        clips = jnp.asarray(clips)
        if self._scan_all is None:
            self._scan_all = self._build_scan()
        out = self._scan_all(self.params, jnp.moveaxis(clips, 0, 1))
        return jnp.moveaxis(out, 0, 1)

    def _build_scan(self):
        """Build the jitted scan once per runner — a fresh ``@jax.jit``
        closure per call would recompile the whole scan graph (minutes
        with Mosaic kernels) on every invocation.  Operates on
        (T, B, H, W, C); run_scan passes B=1."""
        model = self.model

        @jax.jit
        def scan_all(p, fr):
            def pyr(frame):
                return model.apply({"params": p}, frame, mode="pyramid")

            def fuse(p3, center):
                stacked = tuple(
                    jnp.stack([p3[0][li], p3[1][li], p3[2][li]], axis=1)
                    for li in range(3))
                return model.apply({"params": p}, (*stacked, center),
                                   mode="fuse")

            p0 = pyr(fr[0])
            # first output: window (0, 0, 1) — replicate left border
            out0 = fuse((p0, p0, pyr(fr[1])), fr[0])

            # interior: center frames 1..T-2, new frame = t+1
            def step2(carry, xs):
                pm1, pm0, center = carry
                frame = xs
                pnew = pyr(frame)
                out = fuse((pm1, pm0, pnew), center)
                return (pm0, pnew, frame), out

            carry = (p0, pyr(fr[1]), fr[1])
            carry, outs = jax.lax.scan(step2, carry, fr[2:])
            pm1, pm0, center = carry
            # last output: window (T-2, T-1, T-1) — replicate right border
            outl = fuse((pm1, pm0, pm0), center)
            return jnp.concatenate([out0[None], outs, outl[None]], axis=0)

        return scan_all

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
