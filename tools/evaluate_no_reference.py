#!/usr/bin/env python
"""No-reference metric tables (rebuild of
``codes/metrics/evaluate_realvsr_no_reference_metrics.m`` +
``evaluate_niqe_brisque.m``): per-sequence NIQE / BRISQUE.

    python tools/evaluate_no_reference.py --results <root> \
        [--metrics niqe brisque] \
        [--niqe-model model.npz | matlab_model.mat] \
        [--brisque-model allmodel --brisque-range allrange]

NIQE models: either an .npz from realvsr_tpu.eval.niqe.fit_niqe_model or a
MATLAB fitniqe .mat (e.g. the reference's niqe_model_realvsr_all.mat —
decoded directly).  BRISQUE needs the original release's libsvm model
files, or fit one with realvsr_tpu.eval.brisque.fit_brisque_model.
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
    parser.add_argument("--metrics", nargs="+", default=["niqe"],
                        choices=["niqe", "brisque"])
    parser.add_argument("--niqe-model", default=None)
    parser.add_argument("--brisque-model", default=None)
    parser.add_argument("--brisque-range", default=None)
    args = parser.parse_args()

    from realvsr_tpu.eval import brisque as B
    from realvsr_tpu.eval import niqe as N

    niqe_model = None
    if "niqe" in args.metrics:
        assert args.niqe_model, "--niqe-model required for NIQE"
        if args.niqe_model.endswith(".mat"):
            niqe_model = N.load_matlab_niqe_model(args.niqe_model)
        else:
            niqe_model = dict(np.load(args.niqe_model))
    br_model = None
    if "brisque" in args.metrics:
        assert args.brisque_model and args.brisque_range, \
            "--brisque-model/--brisque-range required for BRISQUE"
        br_model = B.load_libsvm_model(args.brisque_model, args.brisque_range)

    seq_dirs = [d for d in sorted(glob.glob(osp.join(args.results, "*")))
                if osp.isdir(d)]
    totals = {m: [] for m in args.metrics}
    for seq_dir in seq_dirs:
        vals = {m: [] for m in args.metrics}
        for p in sorted(glob.glob(osp.join(seq_dir, "*.png"))):
            img = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float64)
            if niqe_model is not None:
                vals["niqe"].append(N.niqe_score(img, niqe_model))
            if br_model is not None:
                vals["brisque"].append(B.brisque_score(img, br_model))
        line = f"{osp.basename(seq_dir)}: " + "  ".join(
            f"{m}={np.mean(vals[m]):.4f}" for m in args.metrics)
        print(line)
        for m in args.metrics:
            totals[m].append(np.mean(vals[m]))
    print("==== total ====")
    for m in args.metrics:
        print(f"{m}: {np.mean(totals[m]):.4f} over {len(totals[m])} sequences")


if __name__ == "__main__":
    main()
