"""Vimeo90K septuplet datasets (rebuild of ``codes/data/Vimeo90K_dataset.py``).

Keys ``00001_0001``; files ``<root>/<a>/<b>/im{1..7}.png``; the LQ frame
window is centered on im4 (frame_list = i + (9-N)//2), GT is im4 (or all
window frames for the AllPair variant).  LR-input mode supports x``scale``
precomputed LQ.
"""
from __future__ import annotations

import os.path as osp
import pickle

import numpy as np

from realvsr_tpu.data.imageio import channel_convert, read_img
from realvsr_tpu.data.realvsr import _augment_images


class Vimeo90KDataset:
    all_pair = False

    def __init__(self, opt: dict):
        self.opt = opt
        self.random_reverse = bool(opt["random_reverse"])
        self.gt_root, self.lq_root = opt["dataroot_GT"], opt["dataroot_LQ"]
        self.gt_size = opt["GT_size"]
        self.lq_size = opt.get("LQ_size") or self.gt_size
        self.lr_input = self.gt_size != self.lq_size
        self.scale = opt.get("scale") or 1
        self.color = opt.get("color")
        self.is_train = opt.get("phase") == "train"
        self.n_frames = opt["N_frames"]
        self.center = self.n_frames // 2
        self.frame_list = [i + (9 - self.n_frames) // 2
                           for i in range(self.n_frames)]
        if opt.get("cache_keys"):
            with open(opt["cache_keys"], "rb") as f:
                self.keys = pickle.load(f)["keys"]
        else:
            raise ValueError("cache_keys pickle is required for Vimeo90K data")
        assert self.keys, "Error: GT path is empty."

    def __len__(self):
        return len(self.keys)

    def _read(self, root: str, name_a: str, name_b: str, v: int) -> np.ndarray:
        img = read_img(osp.join(root, name_a, name_b, f"im{v}.png"))
        if self.color:
            img = channel_convert(img.shape[2], self.color, [img])[0]
        return img

    def get(self, index: int, rng: np.random.Generator) -> dict:
        key = self.keys[index]
        name_a, name_b = key.split("_")
        frames = list(self.frame_list)
        if self.random_reverse and rng.random() < 0.5:
            frames.reverse()

        lqs = [self._read(self.lq_root, name_a, name_b, v) for v in frames]
        if self.all_pair:
            gts = [self._read(self.gt_root, name_a, name_b, v) for v in frames]
        else:
            gts = [self._read(self.gt_root, name_a, name_b, 4)]

        if self.is_train:
            h, w = lqs[0].shape[:2]
            if self.lr_input:
                lq_size = self.gt_size // self.scale
                rh = int(rng.integers(0, max(0, h - lq_size) + 1))
                rw = int(rng.integers(0, max(0, w - lq_size) + 1))
                lqs = [v[rh:rh + lq_size, rw:rw + lq_size] for v in lqs]
                rh_hr, rw_hr = rh * self.scale, rw * self.scale
                gts = [v[rh_hr:rh_hr + self.gt_size, rw_hr:rw_hr + self.gt_size]
                       for v in gts]
            else:
                rh = int(rng.integers(0, max(0, h - self.gt_size) + 1))
                rw = int(rng.integers(0, max(0, w - self.gt_size) + 1))
                lqs = [v[rh:rh + self.gt_size, rw:rw + self.gt_size] for v in lqs]
                gts = [v[rh:rh + self.gt_size, rw:rw + self.gt_size] for v in gts]
            hflip = bool(self.opt.get("use_flip")) and rng.random() < 0.5
            vflip = bool(self.opt.get("use_rot")) and rng.random() < 0.5
            rot90 = bool(self.opt.get("use_rot")) and rng.random() < 0.5
            both = _augment_images(lqs + gts, hflip, vflip, rot90)
            lqs, gts = both[: len(lqs)], both[len(lqs):]

        lq_stack = np.stack(lqs, axis=0)
        gt_stack = np.stack(gts, axis=0)
        if lq_stack.shape[-1] == 3:
            lq_stack = lq_stack[..., ::-1]
            gt_stack = gt_stack[..., ::-1]
        return {
            "LQs": np.ascontiguousarray(lq_stack, dtype=np.float32),
            "GT": np.ascontiguousarray(
                gt_stack if self.all_pair else gt_stack[0], dtype=np.float32),
            "key": key,
        }

    def __getitem__(self, index: int) -> dict:
        return self.get(index, np.random.default_rng(index))


class Vimeo90KAllPairDataset(Vimeo90KDataset):
    all_pair = True
