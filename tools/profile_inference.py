#!/usr/bin/env python
"""Capture and summarize a TPU profiler trace of the EDVR inference path.

Attributes per-op time on the flagship bench configuration so the PCD
"glue" (everything that is neither a DCN kernel nor a conv) can be named
op by op (VERDICT round-2 item 3).  Writes a perfetto trace and prints the
top ops grouped by HLO category.

Usage: python tools/profile_inference.py [--h 512] [--w 1024] [--iters 3]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=512)
    ap.add_argument("--w", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--impl", default="frame")
    ap.add_argument("--conv3x3", default="pallas",
                    help="conv3x3 impl (pallas matches bench.py; xla)")
    ap.add_argument("--outdir", default="/tmp/edvr_trace")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from realvsr_tpu.models.edvr import EDVRNoUp
    from realvsr_tpu.ops.deform_conv import set_default_impl

    set_default_impl(args.impl, block_max_offset=4, block_chunk=128)
    if args.conv3x3 != "xla":
        from realvsr_tpu.models.common import set_conv3x3_impl

        set_conv3x3_impl(args.conv3x3)
    model = EDVRNoUp(nf=64, nc=3, nframes=3, groups=8, front_RBs=5,
                     back_RBs=10, predeblur=False, HR_in=False, w_TSA=False,
                     dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3, 64, 64, 3), jnp.float32))["params"]
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        params)  # deployment form, matches bench.py
    x = jnp.zeros((1, 3, args.h, args.w, 3), jnp.bfloat16)

    @jax.jit
    def fwd(p, inp):
        return jnp.sum(model.apply({"params": p}, inp).astype(jnp.float32))

    float(fwd(params, x))  # compile outside the trace
    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir, create_perfetto_trace=True):
        for _ in range(args.iters):
            float(fwd(params, x))

    paths = sorted(glob.glob(os.path.join(
        args.outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if not paths:
        print("no perfetto trace produced", file=sys.stderr)
        return 1
    summarize(paths[-1], args.iters, args.top)
    return 0


def summarize(path, iters, top):
    with gzip.open(path, "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # find TPU device-op track pids (XLA ops run on "/device:TPU:x" threads)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n and "XLA" not in n} or set(pid_names)
    durs = collections.Counter()
    counts = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        durs[name] += e.get("dur", 0)
        counts[name] += 1
    total = sum(durs.values())
    print(f"trace: {path}")
    print(f"total device op time: {total / 1e3 / iters:.2f} ms/iter "
          f"over {iters} iters\n")
    print(f"{'ms/iter':>9}  {'count':>5}  op")
    for name, d in durs.most_common(top):
        print(f"{d / 1e3 / iters:9.3f}  {counts[name] // iters:5d}  {name[:110]}")
    # rough grouping
    groups = collections.Counter()
    for name, d in durs.items():
        n = name.lower()
        if "custom-call" in n or "dcn" in n or "pallas" in n:
            g = "pallas/custom-call"
        elif n.startswith(("convolution", "conv")) or "conv" in n.split(".")[0]:
            g = "convolution"
        elif any(k in n for k in ("fusion", "loop_")):
            g = "fusion"
        elif any(k in n for k in ("copy", "transpose", "bitcast")):
            g = "copy/transpose"
        else:
            g = "other"
        groups[g] += d
    print("\nby category (ms/iter):")
    for g, d in groups.most_common():
        print(f"  {g:20s} {d / 1e3 / iters:9.2f}")


if __name__ == "__main__":
    sys.exit(main())
