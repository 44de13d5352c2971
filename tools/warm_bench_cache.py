#!/usr/bin/env python
"""Pre-compile bench.py's measurement programs into the persistent
compilation cache via the CHIPLESS axon AOT compiler.

The bench's Mosaic/XLA compiles take minutes each through the
remote-compile tunnel; this tool compiles the exact same jit programs
(same model, params dtypes, fori-loop structure) without executing
anything on the chip, so it can run while the chip is busy (e.g. during
a training run) and a subsequent `python bench.py` pays execution only.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (sets the cache env vars at import)


def main():
    import jax
    import jax.numpy as jnp

    from realvsr_tpu.models.common import set_conv3x3_impl
    from realvsr_tpu.models.edvr import EDVRNoUp
    from realvsr_tpu.ops.deform_conv import set_default_impl

    set_default_impl("frame", block_max_offset=4, block_chunk=128)
    set_conv3x3_impl("pallas")
    model = EDVRNoUp(nf=64, nc=3, nframes=bench.NFRAMES, groups=8,
                     front_RBs=5, back_RBs=10, predeblur=False, HR_in=False,
                     w_TSA=False, dtype=jnp.bfloat16)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, bench.NFRAMES, 64, 64, 3), jnp.float32))["params"]
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)

    shapes = [
        (512, 1024, 1),   # primary
        (512, 1024, 2),   # batched secondaries
        (512, 1024, 4),
        (1088, 1920, 1),  # north-star full frame
    ]
    for h, w, b in shapes:
        t0 = time.perf_counter()
        try:
            bench._measure(model, params, h, w, batch=b, compile_only=True)
            print(f"{w}x{h} B={b}: compiled "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{w}x{h} B={b}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    # the 1080p tiled path (bench._measure_tiled_1080): the batched
    # single-jit tiler's run_n / run_1 programs at 1920x1088
    from realvsr_tpu.eval.tiled import batched_tiled_apply

    apply = batched_tiled_apply(model, tile_hw=(576, 1024), overlap=32)
    variables = {"params": params}
    window = jnp.zeros((bench.NFRAMES, 1088, 1920, 3), jnp.bfloat16)

    def make(n):
        @jax.jit
        def run(v, w_):
            def body(_, carry):
                acc, w_ = carry
                s = jnp.sum(apply(v, w_).astype(jnp.float32))
                w_ = w_ * (1 + s * 1e-30).astype(w_.dtype)
                return acc + s, w_

            acc, _ = jax.lax.fori_loop(0, n, body, (jnp.float32(0), w_))
            return acc

        return run

    for n in (bench.ITERS, 1):
        t0 = time.perf_counter()
        try:
            make(n).lower(variables, window).compile()
            print(f"batched-tiled 1080p n={n}: compiled "
                  f"({time.perf_counter() - t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"batched-tiled 1080p n={n}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)

    # loop-tiler fallback jit (same as eval/tiled.make_tiled_forward)
    t0 = time.perf_counter()
    try:
        variables = {"params": params}

        @jax.jit
        def tile_fwd(v, tile):
            return model.apply(v, tile[None])[0]

        tile = jnp.zeros((bench.NFRAMES, 576, 1024, 3), jnp.float32)
        tile_fwd.lower(variables, tile).compile()
        print(f"tiled 576x1024 f32: compiled "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    except Exception as e:
        print(f"tiled 576x1024: FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)


if __name__ == "__main__":
    main()
