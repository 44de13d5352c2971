#!/usr/bin/env python
"""Trace one flagship training step (Split, frame-DCN) on the TPU.

VERDICT round-3 item 7: attribute where the 192^2/batch-8 training step
spends its time (custom-VJP DCN backward vs fold epilogues vs conv
backward vs loss pyramids) the same way tools/profile_inference.py does
for inference.

    python tools/profile_train_step.py [--size 192] [--batch 8] [--iters 2]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from profile_inference import summarize  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=192)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--outdir", default="/tmp/edvr_train_trace")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--compile_only", action="store_true",
                    help="chipless AOT compile into the persistent cache "
                         "(runs while the chip is busy); no execution")
    # remat/conv configuration sweep (PERF_NOTES round 5): the trainer
    # itself runs model_remat=0 (define_g never sets it); dcn_remat=1 and
    # conv=xla are the historical defaults being challenged
    ap.add_argument("--model_remat", type=int, default=1,
                    help="nn.checkpoint PCD + trunks (1=yes)")
    ap.add_argument("--dcn_remat", type=int, default=1,
                    help="jax.checkpoint around each DCN (1=yes)")
    ap.add_argument("--conv", choices=["xla", "pallas"], default="xla",
                    help="3x3 conv impl for the packed ResBlock chains "
                         "(pallas requires model_remat=0)")
    ap.add_argument("--skip_trace", action="store_true")
    args = ap.parse_args()
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from realvsr_tpu.models.edvr import EDVRNoUp
    from realvsr_tpu.ops.deform_conv import set_default_impl
    from realvsr_tpu.train.state import create_train_state
    from realvsr_tpu.train.wrappers import make_train_step

    set_default_impl("frame", block_max_offset=4)
    from realvsr_tpu.models.common import set_conv3x3_impl, set_dcn_remat
    set_dcn_remat(bool(args.dcn_remat))
    if args.conv == "pallas":
        set_conv3x3_impl("pallas")
    opt = {
        "model": "VideoSR_AllPair_YCbCr_Split",
        "train": {
            "lr_G": 2e-4, "lr_scheme": "CosineAnnealingLR_Restart",
            "beta1": 0.9, "beta2": 0.99, "niter": 1000, "warmup_iter": -1,
            "T_period": [1000], "restarts": [], "restart_weights": [],
            "eta_min": 1e-7, "pixel_criterion_y": "lappyr",
            "pixel_weight_y": 1.0, "pixel_criterion_c": "gw",
            "pixel_weight_c": 1.0, "manual_seed": 0,
            "mixed_precision": True,
        },
        "augment": None,
    }
    model = EDVRNoUp(nf=64, nc=3, nframes=3, groups=8, front_RBs=5,
                     back_RBs=10, predeblur=False, HR_in=False, w_TSA=False,
                     dtype=jnp.bfloat16, remat=bool(args.model_remat))
    s = args.size
    sample = jnp.zeros((1, 3, s, s, 3), jnp.float32)
    state = create_train_state(model, opt, sample, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(model, opt), donate_argnums=0)

    rng = np.random.default_rng(0)
    batch = {
        "LQs": jnp.asarray(rng.uniform(size=(args.batch, 3, s, s, 3)),
                           jnp.float32),
        "GT": jnp.asarray(rng.uniform(size=(args.batch, 3, s, s, 3)),
                          jnp.float32),
    }
    import time
    if args.compile_only:
        t0 = time.time()
        step.lower(state, batch, jax.random.PRNGKey(1)).compile()
        print(f"AOT compiled train step ({args.size}^2/batch {args.batch}) "
              f"in {time.time() - t0:.0f}s", flush=True)
        return 0
    t0 = time.time()
    state, logs = step(state, batch, jax.random.PRNGKey(1))
    print(f"compile+first step {time.time() - t0:.1f}s "
          f"l_pix={float(logs['l_pix']):.4f}", flush=True)
    ts = time.time()
    for _ in range(3):
        state, logs = step(state, batch, jax.random.PRNGKey(2))
    float(logs["l_pix"])
    print(f"~{3 / (time.time() - ts):.2f} it/s (dispatch-timed; fori "
          "methodology not applicable to donated state)", flush=True)
    if args.skip_trace:
        return 0

    os.makedirs(args.outdir, exist_ok=True)
    with jax.profiler.trace(args.outdir, create_perfetto_trace=True):
        for _ in range(args.iters):
            state, logs = step(state, batch, jax.random.PRNGKey(3))
        float(logs["l_pix"])
    import glob
    paths = sorted(glob.glob(os.path.join(
        args.outdir, "**", "*.trace.json.gz"), recursive=True),
        key=os.path.getmtime)
    if paths:
        summarize(paths[-1], args.iters, args.top)
    return 0


if __name__ == "__main__":
    sys.exit(main())
