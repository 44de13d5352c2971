"""Synthetic video datasets for tests, debug configs, and benchmarks.

Procedurally generated clips: the GT is a smooth moving pattern, the LQ is
a blurred + noisy copy (deterministic in (sequence, frame)).  Serves the
same item schema as the RealVSR datasets so the full train/eval stack runs
without the 28 GB dataset present.  No reference equivalent (the reference
has no test fixtures at all — SURVEY §4).
"""
from __future__ import annotations

import functools

import numpy as np


def _frame(seq: int, t: int, h: int, w: int) -> np.ndarray:
    """Deterministic clean frame: drifting sinusoid mixture, (H, W, 3)."""
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    phase = 0.13 * t + seq
    img = np.stack(
        [
            0.5 + 0.5 * np.sin(0.07 * xx + 0.05 * yy + phase),
            0.5 + 0.5 * np.sin(0.05 * xx - 0.06 * yy + 1.7 * phase),
            0.5 + 0.5 * np.sin(0.045 * (xx + yy) + 0.5 + phase),
        ],
        axis=-1,
    )
    return img.astype(np.float32)


def _degrade(img: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Box blur + mild gaussian noise as the 'real-world' LQ."""
    k = 3
    pad = np.pad(img, ((1, 1), (1, 1), (0, 0)), mode="edge")
    blur = sum(
        pad[dy:dy + img.shape[0], dx:dx + img.shape[1]]
        for dy in range(k) for dx in range(k)
    ) / (k * k)
    noisy = blur + rng.normal(0, 0.01, img.shape).astype(np.float32)
    return np.clip(noisy, 0.0, 1.0).astype(np.float32)


class SyntheticVSRDataset:
    """Training dataset, AllPair schema (LQs (T,H,W,C), GT (T,H,W,C))."""

    all_pair = True

    def __init__(self, opt: dict):
        self.n_frames = opt.get("N_frames") or 3
        self.gt_size = opt.get("GT_size") or 64
        self.scale = opt.get("scale") or 1
        self.num_seqs = opt.get("num_seqs") or 8
        self.frames_per_seq = opt.get("frames_per_seq") or 10
        self.frame_h = opt.get("frame_h") or max(self.gt_size, 96)
        self.frame_w = opt.get("frame_w") or max(self.gt_size, 96)
        self.keys = [
            f"{s:03d}_{f:05d}" for s in range(self.num_seqs)
            for f in range(self.frames_per_seq)
        ]

    def __len__(self):
        return len(self.keys)

    def get(self, index: int, rng: np.random.Generator) -> dict:
        key = self.keys[index]
        seq, frame = (int(v) for v in key.split("_"))
        half = self.n_frames // 2
        neighbors = [
            int(np.clip(frame + d, 0, self.frames_per_seq - 1))
            for d in range(-half, half + 1)
        ]
        gts = [_frame(seq, t, self.frame_h, self.frame_w) for t in neighbors]
        deg_rng = np.random.default_rng(seq * 1000)
        lqs = [_degrade(g, np.random.default_rng(seq * 1000 + t))
               for g, t in zip(gts, neighbors)]
        # random crop
        rh = int(rng.integers(0, self.frame_h - self.gt_size + 1))
        rw = int(rng.integers(0, self.frame_w - self.gt_size + 1))
        gts = [v[rh:rh + self.gt_size, rw:rw + self.gt_size] for v in gts]
        lqs = [v[rh:rh + self.gt_size, rw:rw + self.gt_size] for v in lqs]
        return {
            "LQs": np.stack(lqs).astype(np.float32),
            "GT": np.stack(gts).astype(np.float32),
            "key": key,
        }

    def __getitem__(self, index: int) -> dict:
        return self.get(index, np.random.default_rng(index))


class SyntheticVideoTestDataset:
    """Eval dataset with the VideoTestDataset item schema."""

    def __init__(self, opt: dict):
        from realvsr_tpu.utils.indexing import index_generation

        self._index_generation = index_generation
        self.n_frames = opt.get("N_frames") or 3
        self.padding = opt.get("padding") or "replicate"
        self.num_seqs = opt.get("num_seqs") or 2
        self.frames_per_seq = opt.get("frames_per_seq") or 6
        h = opt.get("frame_h") or 64
        w = opt.get("frame_w") or 64
        self.imgs_gt, self.imgs_lq = {}, {}
        self.entries = []
        for s in range(self.num_seqs):
            name = f"{s:03d}"
            gts = np.stack([_frame(s, t, h, w)
                            for t in range(self.frames_per_seq)])
            lqs = np.stack([
                _degrade(gts[t], np.random.default_rng(s * 1000 + t))
                for t in range(self.frames_per_seq)
            ])
            self.imgs_gt[name] = gts
            self.imgs_lq[name] = lqs
            for i in range(self.frames_per_seq):
                border = int(i < self.n_frames // 2 or
                             i >= self.frames_per_seq - self.n_frames // 2)
                self.entries.append((name, i, border))

    def __len__(self):
        return len(self.entries)

    def __getitem__(self, index: int) -> dict:
        folder, idx, border = self.entries[index]
        select = self._index_generation(idx, self.frames_per_seq,
                                        self.n_frames, padding=self.padding)
        return {
            "LQs": self.imgs_lq[folder][select],
            "GT": self.imgs_gt[folder][idx],
            "folder": folder,
            "idx": f"{idx}/{self.frames_per_seq}",
            "border": border,
        }


# ------------------------------------------------------------- motion-rich
#
# The round-2 clamp validation trained on the drifting-sinusoid clips
# above, whose inter-frame motion is a fraction of a pixel — so the PCD
# offset statistics it produced could not stress the ±R clamp (VERDICT
# round-2 weak #3).  This generator produces clips with real-video-like
# motion statistics: textured layers translating at per-sequence random
# velocities up to ±6 px/frame, a rotating/zooming foreground patch with
# an occlusion boundary, and a camera pan — then a realistic degradation
# (anisotropic blur via subsampled box chain + noise + quantization).


def _texture(seed: int, h: int, w: int) -> np.ndarray:
    """Band-limited random RGB texture with multi-scale detail."""
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w, 3), np.float32)
    for scale in (4, 8, 16, 32):
        low = rng.random((h // scale + 2, w // scale + 2, 3)).astype(np.float32)
        yy = np.linspace(0, low.shape[0] - 1.001, h, dtype=np.float32)
        xx = np.linspace(0, low.shape[1] - 1.001, w, dtype=np.float32)
        y0 = yy.astype(np.int32)
        x0 = xx.astype(np.int32)
        ty = (yy - y0)[:, None, None]
        tx = (xx - x0)[None, :, None]
        a = low[y0][:, x0]
        b = low[y0][:, x0 + 1]
        c = low[y0 + 1][:, x0]
        d = low[y0 + 1][:, x0 + 1]
        img += (a * (1 - ty) * (1 - tx) + b * (1 - ty) * tx
                + c * ty * (1 - tx) + d * ty * tx) / (scale ** 0.5)
    img -= img.min()
    return (img / max(img.max(), 1e-6)).astype(np.float32)


def _sample_bilinear(img: np.ndarray, ys: np.ndarray, xs: np.ndarray):
    h, w = img.shape[:2]
    y0 = np.clip(np.floor(ys).astype(np.int32), 0, h - 2)
    x0 = np.clip(np.floor(xs).astype(np.int32), 0, w - 2)
    ty = (np.clip(ys, 0, h - 1) - y0)[..., None]
    tx = (np.clip(xs, 0, w - 1) - x0)[..., None]
    return (img[y0, x0] * (1 - ty) * (1 - tx) + img[y0, x0 + 1] * (1 - ty) * tx
            + img[y0 + 1, x0] * ty * (1 - tx) + img[y0 + 1, x0 + 1] * ty * tx)


@functools.lru_cache(maxsize=4096)
def _motion_frame(seq: int, t: int, h: int, w: int) -> np.ndarray:
    """Cached: the generator is pure in (seq, t, h, w) and costs tens of
    ms per frame — regenerating every __getitem__ made the train loader
    the bottleneck.  Callers must not mutate the returned array (the
    dataset only crops/copies)."""
    rng = np.random.default_rng(seq * 7919)
    pad = 48
    bg = _texture(seq * 31 + 1, h + 2 * pad, w + 2 * pad)
    fg = _texture(seq * 31 + 2, h, w)
    # per-sequence velocities (px/frame): pan up to ±3, layers up to ±6
    pan = rng.uniform(-3, 3, 2)
    vel_fg = rng.uniform(-6, 6, 2)
    rot = rng.uniform(-0.01, 0.01)          # rad/frame
    zoom = 1.0 + rng.uniform(-0.004, 0.004)  # per frame
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    # background: camera pan
    out = _sample_bilinear(bg, yy + pad + pan[0] * t, xx + pad + pan[1] * t)
    # foreground patch: translate + rotate + zoom about its center
    cy, cx = h * 0.5 + vel_fg[0] * t, w * 0.5 + vel_fg[1] * t
    ry, rx = h * 0.22, w * 0.22
    th = rot * t
    zs = zoom ** t
    ys = (np.cos(th) * (yy - cy) - np.sin(th) * (xx - cx)) / zs + h * 0.5
    xs = (np.sin(th) * (yy - cy) + np.cos(th) * (xx - cx)) / zs + w * 0.5
    inside = ((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 < 1.0
    patch = _sample_bilinear(fg, ys, xs)
    out = np.where(inside[..., None], patch, out)
    return np.clip(out, 0.0, 1.0).astype(np.float32)


def _degrade_realistic(img: np.ndarray, rng: np.random.Generator):
    """Two-pass box blur (approx. anisotropic gaussian), sensor-ish noise
    (signal-dependent), and 6-bit quantization banding."""
    out = img
    for k in (3, 3):
        pad = np.pad(out, ((1, 1), (1, 1), (0, 0)), mode="edge")
        out = sum(pad[dy:dy + img.shape[0], dx:dx + img.shape[1]]
                  for dy in range(k) for dx in range(k)) / (k * k)
    noise = rng.normal(0, 1, img.shape).astype(np.float32)
    out = out + noise * (0.004 + 0.02 * np.sqrt(np.maximum(out, 0)))
    out = np.round(out * 63) / 63.0  # mild banding
    return np.clip(out, 0.0, 1.0).astype(np.float32)


@functools.lru_cache(maxsize=4096)
def _lq_frame(seq: int, t: int, h: int, w: int, scale: int = 1) -> np.ndarray:
    """Cached degraded frame: the degradation rng is derived purely from
    (seq, t), so the LQ frame is a pure function of the key too.  For
    ``scale`` > 1 the degraded frame is MATLAB-bicubic downsampled x1/scale
    (the reference's LR generation recipe,
    codes/scripts/generate_LR_BI_Vimeo90K.m)."""
    lq = _degrade_realistic(_motion_frame(seq, t, h, w),
                            np.random.default_rng(seq * 1000 + t))
    if scale > 1:
        from realvsr_tpu.ops.resize import matlab_imresize_np

        lq = np.clip(matlab_imresize_np(lq, 1.0 / scale), 0.0, 1.0)
    return lq.astype(np.float32)


class SyntheticMotionVSRDataset(SyntheticVSRDataset):
    """AllPair training set over the motion-rich generator."""

    def get(self, index: int, rng: np.random.Generator) -> dict:
        key = self.keys[index]
        seq, frame = (int(v) for v in key.split("_"))
        half = self.n_frames // 2
        neighbors = [
            int(np.clip(frame + d, 0, self.frames_per_seq - 1))
            for d in range(-half, half + 1)
        ]
        s = self.scale
        gts = [_motion_frame(seq, t, self.frame_h, self.frame_w)
               for t in neighbors]
        lqs = [_lq_frame(seq, t, self.frame_h, self.frame_w, s)
               for t in neighbors]
        gt_size = self.gt_size
        # crop origin aligned to the scale grid so LQ/GT crops correspond
        y = s * int(rng.integers(0, (self.frame_h - gt_size) // s + 1))
        x = s * int(rng.integers(0, (self.frame_w - gt_size) // s + 1))
        gts = [g[y:y + gt_size, x:x + gt_size] for g in gts]
        lqs = [l[y // s:(y + gt_size) // s, x // s:(x + gt_size) // s]
               for l in lqs]
        return {
            "LQs": np.stack(lqs).astype(np.float32),
            "GT": np.stack(gts).astype(np.float32),
            "key": key,
        }


class SyntheticMotionVideoTestDataset(SyntheticVideoTestDataset):
    """Eval clips over the motion-rich generator (held-out sequences)."""

    def __init__(self, opt: dict):
        opt = dict(opt)
        seq_base = opt.get("seq_base", 100)  # disjoint from training seqs
        from realvsr_tpu.utils.indexing import index_generation

        self._index_generation = index_generation
        self.n_frames = opt.get("N_frames") or 3
        self.padding = opt.get("padding") or "replicate"
        self.num_seqs = opt.get("num_seqs") or 2
        self.frames_per_seq = opt.get("frames_per_seq") or 6
        h = opt.get("frame_h") or 64
        w = opt.get("frame_w") or 64
        scale = opt.get("scale") or 1
        self.imgs_gt, self.imgs_lq = {}, {}
        self.entries = []
        for s0 in range(self.num_seqs):
            s = s0 + seq_base
            name = f"{s:03d}"
            gts = np.stack([_motion_frame(s, t, h, w)
                            for t in range(self.frames_per_seq)])
            lqs = np.stack([
                _lq_frame(s, t, h, w, scale)
                for t in range(self.frames_per_seq)
            ])
            self.imgs_gt[name] = gts
            self.imgs_lq[name] = lqs
            for i in range(self.frames_per_seq):
                border = int(i < self.n_frames // 2 or
                             i >= self.frames_per_seq - self.n_frames // 2)
                self.entries.append((name, i, border))
