#!/usr/bin/env python
"""Chip inference bench lines for the non-flagship archs (VERDICT
round-4 items 6 + 7): TDAN (4 chained DCNs per neighbor frame,
reference codes/models/archs/TDAN_arch.py:42-72), EDVR with TSA fusion,
and EDVR x4 (pixel-shuffle upsampling, EDVR_arch.py:310-319).

Uses bench.py's in-jit fori differential methodology (PERF_NOTES.md) so
numbers are comparable with the primary EDVR_NoUp line.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def build(arch, dcn_impl="frame", conv3x3="pallas"):
    import jax
    import jax.numpy as jnp

    from realvsr_tpu.models.common import set_conv3x3_impl
    from realvsr_tpu.ops.deform_conv import set_default_impl

    set_default_impl(dcn_impl, block_max_offset=4, block_chunk=128)
    set_conv3x3_impl(conv3x3)
    dt = jnp.bfloat16
    if arch == "tdan":
        from realvsr_tpu.models.tdan import TDAN

        model = TDAN(nf=64, channel=3, nframes=bench.NFRAMES, nb_f=5,
                     nb_b=10, groups=8, scale=1, dtype=dt)
    elif arch == "edvr_tsa":
        from realvsr_tpu.models.edvr import EDVRNoUp

        model = EDVRNoUp(nf=64, nc=3, nframes=bench.NFRAMES, groups=8,
                         front_RBs=5, back_RBs=10, predeblur=False,
                         HR_in=False, w_TSA=True, dtype=dt)
    elif arch == "edvr_x4":
        from realvsr_tpu.models.edvr import EDVR

        model = EDVR(nf=64, nc=3, nframes=bench.NFRAMES, groups=8,
                     front_RBs=5, back_RBs=10, predeblur=False,
                     HR_in=False, w_TSA=False, dtype=dt)
    else:
        raise SystemExit(f"unknown arch {arch}")
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, bench.NFRAMES, 64, 64, 3), jnp.float32))["params"]
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)
    return model, params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", required=True,
                    choices=["tdan", "edvr_tsa", "edvr_x4"])
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()
    model, params = build(args.arch)
    fps = bench._measure(model, params, args.h, args.w, batch=args.batch)
    print(f"{args.arch}: {args.w}x{args.h} B={args.batch} "
          f"inference {fps:.4f} frames/s", flush=True)


if __name__ == "__main__":
    main()
