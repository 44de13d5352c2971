#!/usr/bin/env python
"""Dump held-out synthetic-motion sequences to GT/LQ PNG folders.

Materializes the SyntheticMotionVideoTestDataset generator (seq_base 100,
disjoint from the training ids 0..num_seqs-1) as the folder layout
``tools/test_wi_gt.py`` consumes — the same per-sequence-subfolder layout
as the reference's RealVSR test split (test_RealVSR_wi_GT.py:86-107).

PNG planes are written reversed (cv2 BGR order) so ``read_img_seq``'s
RGB flip reconstructs the generator's (Y, Cb, Cr)-role channels exactly
as the training loader emitted them.

    python tools/dump_synthetic_testset.py --out datasets/synthetic_motion_test \
        --num_seqs 4 --frames 20 --height 256 --width 256
"""
import argparse
import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--seq_base", type=int, default=100)
    ap.add_argument("--num_seqs", type=int, default=4)
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--width", type=int, default=256)
    args = ap.parse_args()

    from realvsr_tpu.data.synthetic import _degrade_realistic, _motion_frame

    for s0 in range(args.num_seqs):
        s = args.seq_base + s0
        name = f"{s:03d}"
        gt_dir = osp.join(args.out, "GT", name)
        lq_dir = osp.join(args.out, "LQ", name)
        os.makedirs(gt_dir, exist_ok=True)
        os.makedirs(lq_dir, exist_ok=True)
        for t in range(args.frames):
            gt = _motion_frame(s, t, args.height, args.width)
            lq = _degrade_realistic(gt, np.random.default_rng(s * 1000 + t))
            for arr, d in ((gt, gt_dir), (lq, lq_dir)):
                u8 = (np.clip(arr, 0.0, 1.0) * 255.0).round().astype(np.uint8)
                cv2.imwrite(osp.join(d, f"{t:05d}.png"), u8[:, :, ::-1])
        print(f"dumped {name}: {args.frames} frames "
              f"({args.height}x{args.width})", flush=True)


if __name__ == "__main__":
    main()
