"""Sliding-window evaluation dataset (rebuild of ``codes/data/
VideoTestDataset.py``): caches full sequences in RAM, serves one center
frame per index with an index_generation window."""
from __future__ import annotations

import glob
import os.path as osp

import numpy as np

from realvsr_tpu.data.imageio import read_img_seq
from realvsr_tpu.utils.indexing import index_generation


class VideoTestDataset:
    """Supports Vid4 / REDS4 / RealVSR-style test folders.

    Returns per item: LQs (T, H, W, C), GT (H, W, C), folder, idx string
    'i/max', border flag (VideoTestDataset.py:60-81).
    """

    def __init__(self, opt: dict):
        self.opt = opt
        self.n_frames = opt["N_frames"]
        self.padding = opt.get("padding") or "replicate"
        self.cache_data = bool(opt.get("cache_data", True))
        self.gt_root, self.lq_root = opt["dataroot_GT"], opt["dataroot_LQ"]
        self.color = opt.get("color")
        if not self.cache_data:
            raise ValueError("Currently only support cache_data=True.")

        self.data_info = {"path_LQ": [], "path_GT": [], "folder": [],
                          "idx": [], "border": []}
        self.imgs_lq, self.imgs_gt = {}, {}

        subfolders_lq = sorted(glob.glob(osp.join(self.lq_root, "*")))
        subfolders_gt = sorted(glob.glob(osp.join(self.gt_root, "*")))
        for sub_lq, sub_gt in zip(subfolders_lq, subfolders_gt):
            name = osp.basename(sub_lq)
            img_paths_lq = sorted(glob.glob(osp.join(sub_lq, "*")))
            max_idx = len(img_paths_lq)
            self.data_info["folder"].extend([name] * max_idx)
            for i in range(max_idx):
                self.data_info["idx"].append(f"{i}/{max_idx}")
            border_l = [0] * max_idx
            for i in range(self.n_frames // 2):
                border_l[i] = 1
                border_l[max_idx - i - 1] = 1
            self.data_info["border"].extend(border_l)
            self.imgs_lq[name] = read_img_seq(sub_lq, color=self.color)
            self.imgs_gt[name] = read_img_seq(sub_gt, color=self.color)

    def __len__(self) -> int:
        return len(self.data_info["folder"])

    def __getitem__(self, index: int) -> dict:
        folder = self.data_info["folder"][index]
        idx, max_idx = map(int, self.data_info["idx"][index].split("/"))
        border = self.data_info["border"][index]
        select_idx = index_generation(idx, max_idx, self.n_frames,
                                      padding=self.padding)
        imgs_lq = self.imgs_lq[folder][select_idx]
        img_gt = self.imgs_gt[folder][idx]
        return {
            "LQs": imgs_lq,
            "GT": img_gt,
            "folder": folder,
            "idx": self.data_info["idx"][index],
            "border": border,
        }
