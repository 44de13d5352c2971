#!/usr/bin/env python
"""Compile-check every Pallas kernel configuration against the REAL
Mosaic toolchain — without touching (or needing) the chip.

Round-4 lesson (PERF_NOTES): interpret-mode parity is necessary but NOT
sufficient — two interpret-verified round-4 kernel variants (an in-kernel
unpack epilogue and all-group hat builds, both deleted in round 5) were
rejected by infer-vector-layout / gather lowering on the v5e toolchain.  The
axon compile helper is a *chipless* AOT service, so ``jit(f).lower(x)
.compile()`` validates Mosaic lowering even while the chip is busy (or
absent).  Run this after ANY kernel change:

    python tools/mosaic_check.py

Exit code 1 if a configuration expected to work on hardware fails.
Known-interpret-only configurations are listed and reported but do not
fail the check.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "10")


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    if jax.default_backend() not in ("tpu", "axon"):
        print(f"backend is {jax.default_backend()!r} — this check needs the "
              "TPU AOT compiler; rerun without JAX_PLATFORMS=cpu")
        return 2

    rng = np.random.default_rng(0)
    checks = []  # (name, fn, args, hardware_expected)

    # --- pair-packed conv3x3 (models/common.py packed_io path) ---------
    from realvsr_tpu.ops.pallas.conv3x3_kernel import (
        conv3x3, conv3x3_packed, pack_pairs)

    x = jnp.asarray(rng.normal(size=(1, 64, 128, 64)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.1, jnp.bfloat16)
    xp = pack_pairs(x)
    checks.append(("conv3x3_packed",
                   lambda a, b: conv3x3_packed(a, b, h=64), (xp, w), True))
    # concat-of-packed input (PCD offset chains): K-row permutation only —
    # kernel body identical, but check the 256-lane K shapes anyway
    xg = jnp.concatenate([xp, xp], axis=-1)
    w2 = jnp.asarray(rng.normal(size=(3, 3, 128, 64)) * 0.1, jnp.bfloat16)
    checks.append(("conv3x3_packed splits=(64,64) lrelu",
                   lambda a, b: conv3x3_packed(a, b, h=64, act="lrelu",
                                               splits=(64, 64)),
                   (xg, w2), True))
    # plain (non-packed) conv3x3 is NOT reachable from model hardware
    # paths (set_conv3x3_impl('pallas') routes only packed_io chains,
    # models/common.py:130) and its 64-lane NHWC layout is rejected by
    # Mosaic at every shape probed — interpret/test surface only.
    checks.append(("conv3x3 plain  [interpret-only]", conv3x3, (x, w),
                   False))

    # --- DCN frame kernel (ops/pallas/dcn_frame_kernel) ----------------
    from realvsr_tpu.ops.deform_conv_block import modulated_deform_conv_block

    dg, r = 8, 4
    xd = jnp.asarray(rng.normal(size=(1, 64, 128, 64)), jnp.bfloat16)
    off = jnp.asarray(rng.normal(size=(1, 64, 128, dg * 18)), jnp.bfloat16)
    m = jnp.asarray(rng.uniform(size=(1, 64, 128, dg * 9)), jnp.bfloat16)
    wd = jnp.asarray(rng.normal(size=(3, 3, 64, 64)) * 0.1, jnp.bfloat16)

    def dcn_fn(x_, o_, m_, w_):
        return modulated_deform_conv_block(
            x_, o_, m_, w_, None, padding=1, deformable_groups=dg,
            max_offset=r, use_pallas="frame",
            compute_dtype=jnp.bfloat16)

    checks.append(("dcn_frame", dcn_fn, (xd, off, m, wd), True))

    # --- DCN frame backward (custom VJP through the fused kernel) ------
    def dcn_grad(x_, o_, m_, w_):
        return jax.grad(lambda *a: jnp.sum(dcn_fn(*a).astype(jnp.float32)),
                        argnums=(0, 1, 2, 3))(x_, o_, m_, w_)

    checks.append(("dcn_frame bwd (custom VJP)", dcn_grad,
                   (xd, off, m, wd), True))

    # --- round-5 kernel variants (a 64-lane panel-window variant was
    # interpret-exact but Mosaic rejects ANY non-128 minor dim in kernel
    # DMAs/scratch — minimal probe in PERF_NOTES round 5; deleted) -------
    def dcn_var(block, fold="slices", gemm="big", grad=False):
        def f(x_, o_, m_, w_):
            out = modulated_deform_conv_block(
                x_, o_, m_, w_, None, padding=1, deformable_groups=dg,
                max_offset=r, use_pallas="frame",
                compute_dtype=jnp.bfloat16, block=block,
                frame_fold=fold, frame_gemm=gemm)
            return jnp.sum(out.astype(jnp.float32))
        if grad:
            return lambda *a: jax.grad(f, argnums=(0, 1, 2, 3))(*a)
        return f

    checks.append(("dcn_frame 4x64 fold=band",
                   dcn_var((4, 64), "band"), (xd, off, m, wd), True))
    checks.append(("dcn_frame 4x64 fold=band gemm=taps",
                   dcn_var((4, 64), "band", "taps"), (xd, off, m, wd), True))
    checks.append(("dcn_frame bwd 4x64 fold=band",
                   dcn_var((4, 64), "band", grad=True),
                   (xd, off, m, wd), True))

    failures = 0
    for name, fn, args, hw_expected in checks:
        try:
            jax.jit(fn).lower(*args).compile()
            status = "OK"
        except Exception as e:
            first = str(e).splitlines()[0][:110] if str(e) else ""
            status = f"FAIL ({type(e).__name__}: {first})"
            if hw_expected:
                failures += 1
        print(f"{name:45s} {status}", flush=True)

    if failures:
        print(f"\n{failures} hardware-expected configuration(s) failed "
              "Mosaic compilation")
        return 1
    print("\nall hardware-expected configurations compile")
    return 0


if __name__ == "__main__":
    sys.exit(main())
