#!/usr/bin/env python
"""Offline data preparation (rebuild of ``codes/scripts/prepare_data.py``):
RGB→YCbCr conversion of RealVSR / Vimeo90K trees, key-pickle generation.

    python tools/prepare_data.py realvsr-ycbcr  <src_root> <dst_root> [--only-y]
    python tools/prepare_data.py vimeo90k-ycbcr <src_root> <dst_root>
    python tools/prepare_data.py realvsr-keys   <save_path.pkl>
    python tools/prepare_data.py vimeo90k-lr    <src_root> <dst_root> --scale 2
        (MATLAB-bicubic down-up LR generation, replacing
         generate_LR_BI_Vimeo90K.m)
    python tools/prepare_data.py create-lmdb    <png_root> <dst.lmdb> \
        [--sharpen-gt] — pack a seq/frame PNG tree into an LMDB of raw
        uint8 buffers keyed SSS_FFFFF (RealVSR_dataset.py's primary
        training I/O path), optionally with GT UnsharpMask sharpening
"""
import argparse
import glob
import os
import os.path as osp
import pickle
import sys
import zlib

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import cv2
import numpy as np


def _convert_img(src_path, dst_path, only_y):
    from realvsr_tpu.ops.color import bgr2ycbcr_np

    src = cv2.imread(src_path)
    dst = bgr2ycbcr_np(src, only_y=only_y)
    os.makedirs(osp.dirname(dst_path), exist_ok=True)
    # channel-reverse on write so cv2's BGR storage round-trips (Y,Cb,Cr)
    cv2.imwrite(dst_path, dst[:, :, ::-1] if dst.ndim == 3 else dst)


def realvsr_ycbcr(src_root, dst_root, only_y=False):
    for seq_path in sorted(glob.glob(osp.join(src_root, "*"))):
        seq = osp.basename(seq_path)
        print(f"Processing {seq}")
        for p in sorted(glob.glob(osp.join(seq_path, "*.png"))):
            _convert_img(p, osp.join(dst_root, seq, osp.basename(p)), only_y)


def vimeo90k_ycbcr(src_root, dst_root):
    for p in sorted(glob.glob(osp.join(src_root, "*", "*", "*.png"))):
        parts = p.split(os.sep)
        a, b, name = parts[-3], parts[-2], parts[-1]
        _convert_img(p, osp.join(dst_root, a, b, name), only_y=False)


def realvsr_keys(save_path, num_seqs=500, frames=50):
    keys = [f"{s:03d}_{f:05d}" for s in range(num_seqs) for f in range(frames)]
    with open(save_path, "wb") as f:
        pickle.dump({"keys": keys}, f)
    print(f"wrote {len(keys)} keys to {save_path}")


def vimeo90k_lr(src_root, dst_root, scale=2):
    """Bicubic down-up LR generation (generate_LR_BI_Vimeo90K.m): downscale
    by 1/scale then upscale back, MATLAB-exact bicubic."""
    from realvsr_tpu.ops.resize import matlab_imresize_np

    for p in sorted(glob.glob(osp.join(src_root, "*", "*", "*.png"))):
        parts = p.split(os.sep)
        a, b, name = parts[-3], parts[-2], parts[-1]
        img = cv2.imread(p).astype(np.float64) / 255.0
        lr = matlab_imresize_np(img, 1.0 / scale)
        lr_up = matlab_imresize_np(lr, float(scale))
        out = np.clip(lr_up * 255.0, 0, 255).round().astype(np.uint8)
        dst = osp.join(dst_root, a, b, name)
        os.makedirs(osp.dirname(dst), exist_ok=True)
        cv2.imwrite(dst, out)


def create_lmdb(png_root, dst_path, sharpen=False, seed=0):
    """Pack <png_root>/<seq>/<frame>.png into an LMDB of raw uint8 HWC
    buffers keyed ``SSS_FFFFF`` (the reference's lmdb layout,
    data/util.py:76-84).  ``sharpen`` applies the GT UnsharpMask pipeline
    (data/util.py:435-480) with a per-key deterministic rng."""
    from realvsr_tpu.data.lmdb_lite import write_lmdb
    from realvsr_tpu.data.sharpen import sharpen_gt

    def items():
        for seq_path in sorted(glob.glob(osp.join(png_root, "*"))):
            seq = osp.basename(seq_path)
            if not osp.isdir(seq_path):
                continue
            print(f"Packing {seq}")
            for p in sorted(glob.glob(osp.join(seq_path, "*.png"))):
                frame = int(osp.splitext(osp.basename(p))[0])
                key = f"{seq}_{frame:05d}"
                img = cv2.imread(p, cv2.IMREAD_UNCHANGED)
                if sharpen:
                    # stable per-key digest — Python's hash() is salted per
                    # process (PYTHONHASHSEED) and would break repeatability
                    rng = np.random.default_rng(
                        (zlib.crc32(key.encode("ascii")) ^ seed) & 0x7FFFFFFF)
                    img = sharpen_gt(img, rng)
                yield key.encode("ascii"), np.ascontiguousarray(img).tobytes()

    write_lmdb(dst_path, items())
    print(f"wrote {dst_path}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("cmd", choices=["realvsr-ycbcr", "vimeo90k-ycbcr",
                                        "realvsr-keys", "vimeo90k-lr",
                                        "create-lmdb"])
    parser.add_argument("paths", nargs="+")
    parser.add_argument("--only-y", action="store_true")
    parser.add_argument("--scale", type=int, default=2)
    parser.add_argument("--sharpen-gt", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    if args.cmd == "realvsr-ycbcr":
        realvsr_ycbcr(args.paths[0], args.paths[1], args.only_y)
    elif args.cmd == "vimeo90k-ycbcr":
        vimeo90k_ycbcr(args.paths[0], args.paths[1])
    elif args.cmd == "realvsr-keys":
        realvsr_keys(args.paths[0])
    elif args.cmd == "vimeo90k-lr":
        vimeo90k_lr(args.paths[0], args.paths[1], args.scale)
    elif args.cmd == "create-lmdb":
        create_lmdb(args.paths[0], args.paths[1], args.sharpen_gt, args.seed)


if __name__ == "__main__":
    main()
