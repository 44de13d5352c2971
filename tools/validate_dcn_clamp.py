#!/usr/bin/env python
"""Validate the block-DCN offset clamp (PERF_NOTES.md / VERDICT item 3).

Reports (a) the distribution of PCD offset magnitudes of a model, and
(b) the PSNR delta between exact-DCN output and the ±R block path, on
given or synthetic input frames.

    python tools/validate_dcn_clamp.py [--ckpt <orbax dir | .pth>] \
        [--frames d1.png d2.png d3.png] [--hw 256 512] [--radii 4 8]

Without --ckpt this measures a randomly initialized model (zero-init
offset conv → near-zero offsets: a smoke run, not evidence); pass a
trained checkpoint for the real validation.
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ckpt", default=None)
    parser.add_argument("--frames", nargs="*", default=None)
    parser.add_argument("--motion_seq", type=int, default=None,
                        help="Use 3 consecutive LQ frames of a held-out "
                             "motion-rich synthetic sequence (seq ids >= "
                             "100 are disjoint from every training "
                             "config) instead of --frames")
    parser.add_argument("--hw", nargs=2, type=int, default=[256, 512])
    parser.add_argument("--radii", nargs="+", type=int, default=[4, 8])
    parser.add_argument("--nf", type=int, default=64)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from realvsr_tpu.models.edvr import EDVRNoUp
    from realvsr_tpu.ops import deform_conv as dc
    from realvsr_tpu.train import checkpoint as ckpt_mod

    h, w = args.hw
    model = EDVRNoUp(nf=args.nf, nc=3, nframes=3, groups=8, front_RBs=5,
                     back_RBs=10, predeblur=False, HR_in=False, w_TSA=False)
    if args.motion_seq is not None:
        from realvsr_tpu.data.synthetic import (_degrade_realistic,
                                                _motion_frame)

        s = args.motion_seq
        gts = [_motion_frame(s, t, h, w) for t in range(1, 4)]
        lqs = [_degrade_realistic(g, np.random.default_rng(s * 1000 + t))
               for g, t in zip(gts, range(1, 4))]
        x = jnp.asarray(np.stack(lqs)[None])
    elif args.frames:
        import cv2

        imgs = [cv2.imread(p).astype(np.float32)[..., ::-1] / 255.0
                for p in args.frames]
        x = jnp.asarray(np.stack(imgs)[None, :, :h, :w])
    else:
        rng = np.random.default_rng(0)
        base = rng.random((1, h // 8, w // 8, 3)).astype(np.float32)
        frames = []
        for t in range(3):
            shifted = np.roll(base, t * 2, axis=2)
            up = jax.image.resize(jnp.asarray(shifted), (1, h, w, 3),
                                  "cubic")
            frames.append(np.asarray(up))
        x = jnp.asarray(np.stack(frames, axis=1))
    params = model.init(jax.random.PRNGKey(0), x[:, :, :64, :64])["params"]
    if args.ckpt:
        params = ckpt_mod.load_network(args.ckpt, params)

    # ---- (a) offset magnitude distribution via sown intermediates
    # collect under the widest clamp being validated so upstream PCD
    # levels see unclamped-enough features (matters for R=16-trained runs)
    dc.set_default_impl("block", block_max_offset=max(max(args.radii), 8))
    out_exact_like, inter = model.apply(
        {"params": params}, x, mutable=["intermediates"])
    offs = [np.abs(np.asarray(v, np.float32)).ravel()
            for path, vs in _flatten(inter["intermediates"]) for v in vs]
    mags = np.concatenate(offs)
    print(f"offsets collected: {mags.size:,d}")
    for pct in (50, 90, 99, 99.9, 100):
        print(f"  |offset| p{pct}: {np.percentile(mags, pct):.3f} px")
    for r in args.radii:
        frac = float((mags <= r).mean())
        print(f"  fraction within ±{r}: {frac:.6f}")

    # ---- (b) PSNR of block-path output vs the exact gather op
    dc.set_default_impl("tap_loop")
    ref = np.asarray(model.apply({"params": params}, x), np.float32)
    for r in args.radii:
        dc.set_default_impl("block", block_max_offset=r)
        got = np.asarray(model.apply({"params": params}, x), np.float32)
        mse = float(np.mean((ref - got) ** 2))
        psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
        print(f"block R={r} vs exact: PSNR {psnr:.2f} dB, "
              f"max|Δ| {np.max(np.abs(ref - got)):.2e}")


def _flatten(tree, path=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, path + (k,))
    else:
        yield path, tree


if __name__ == "__main__":
    main()
