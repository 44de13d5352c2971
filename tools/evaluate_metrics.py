#!/usr/bin/env python
"""Full-reference metric tables over result folders (rebuild of
``codes/metrics/evaluate_realvsr_full_reference_metrics.py``).

    python tools/evaluate_metrics.py --results <results_root> --gt <gt_root> \
        [--metrics psnr ssim lpips dists] [--y-only] \
        [--vgg16-weights vgg16.pth] [--lpips-weights LPIPSvgg.pt] \
        [--dists-weights DISTS.pt]

Per-sequence and total PSNR / SSIM (MATLAB-equivalent) plus LPIPS / DISTS
(JAX reimplementations of the IQA_pytorch metrics, see
realvsr_tpu/eval/perceptual.py).  LPIPS / DISTS need pretrained weights:
pass --vgg16-weights (torchvision vgg16 state_dict) plus --lpips-weights /
--dists-weights (metric-head checkpoints); a single combined dump in
--vgg16-weights also works.
"""
import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2
import numpy as np


def _build_perceptual(args):
    """Returns jitted scorers {'lpips': fn, 'dists': fn} for the requested
    metrics; fn maps (res_rgb01, gt_rgb01) NHWC → per-image score."""
    import jax

    from realvsr_tpu.eval import perceptual as P

    out = {}
    if "lpips" in args.metrics:
        if args.vgg16_weights:
            params = P.load_lpips_weights(args.vgg16_weights,
                                          args.lpips_weights)
        else:
            print("WARNING: --vgg16-weights not given; LPIPS uses random "
                  "init (wiring test only, scores are meaningless)")
            params = P.init_lpips_params()
        out["lpips"] = jax.jit(lambda x, y: P.lpips(params, x, y))
    if "dists" in args.metrics:
        if args.vgg16_weights:
            params = P.load_dists_weights(args.vgg16_weights,
                                          args.dists_weights)
        else:
            print("WARNING: --vgg16-weights not given; DISTS uses random "
                  "init (wiring test only, scores are meaningless)")
            params = P.init_lpips_params(with_dists=True)
        out["dists"] = jax.jit(lambda x, y: P.dists(params, x, y))
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--results", required=True)
    parser.add_argument("--gt", required=True)
    parser.add_argument("--metrics", nargs="+", default=["psnr", "ssim"],
                        choices=["psnr", "ssim", "lpips", "dists"])
    parser.add_argument("--y-only", action="store_true",
                        help="evaluate PSNR/SSIM on the Y channel of YCbCr")
    parser.add_argument("--vgg16-weights", default=None,
                        help="torchvision vgg16 state_dict .pth")
    parser.add_argument("--lpips-weights", default=None,
                        help="LPIPS linear-head checkpoint (official or "
                             "IQA_pytorch format)")
    parser.add_argument("--dists-weights", default=None,
                        help="DISTS alpha/beta checkpoint")
    args = parser.parse_args()

    from realvsr_tpu.ops.color import bgr2ycbcr_np
    from realvsr_tpu.ops.metrics import calculate_psnr_np, calculate_ssim_np

    perceptual = _build_perceptual(args)

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
            for m, fn in perceptual.items():
                # BGR uint8 → RGB [0,1] NHWC, like prepare_image (ToTensor
                # on a PIL RGB image)
                r = (res[..., ::-1] / 255.0).astype(np.float32)[None]
                g = (gt[..., ::-1] / 255.0).astype(np.float32)[None]
                vals[m].append(float(fn(r, g)[0]))
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
