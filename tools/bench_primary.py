#!/usr/bin/env python
"""Primary-shape-only bench (1024x512 B=1) — bench.py minus the secondary
shapes, for fast iteration when each new shape costs Mosaic compiles
through the remote-compile tunnel."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse

import bench


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

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
    fps = bench._measure(model, params, args.h, args.w, batch=args.batch)
    print(f"primary: {args.w}x{args.h} B={args.batch} "
          f"inference {fps:.4f} frames/s", flush=True)


if __name__ == "__main__":
    main()
