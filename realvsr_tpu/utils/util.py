"""General utilities (rebuild of the remaining ``codes/utils/util.py`` and
``codes/data/util.py`` helpers: experiment archival, seeding, image/tensor
conversion, cropping, DUF downsampling)."""
from __future__ import annotations

import os
import os.path as osp
import random
import time
from datetime import datetime

import numpy as np


def get_timestamp() -> str:
    return datetime.now().strftime("%y%m%d-%H%M%S")


def mkdir_and_rename(path: str) -> None:
    """Archive an existing experiment dir with a timestamp suffix then
    create a fresh one (utils/util.py:69-76)."""
    if osp.exists(path):
        new_name = path + "_archived_" + get_timestamp()
        print(f"Path already exists. Rename it to [{new_name:s}]")
        os.rename(path, new_name)
    os.makedirs(path, exist_ok=True)


def set_random_seed(seed: int) -> None:
    """Seed host RNGs (utils/util.py:79-83); device RNG uses explicit
    jax.random keys derived from the config seed."""
    random.seed(seed)
    np.random.seed(seed)


def img2tensor(img: np.ndarray) -> np.ndarray:
    """HWC BGR float [0,1] → (T)HWC RGB float32 array (channels-last; the
    NHWC analog of utils/util.py img2tensor)."""
    if img.shape[-1] == 3:
        img = img[..., ::-1]
    return np.ascontiguousarray(img, dtype=np.float32)


def tensor2img(tensor, out_type=np.uint8, min_max=(0, 1),
               reverse_channel: bool = True) -> np.ndarray:
    """(H, W, C) device/np array → uint8 (or float) HWC image
    (utils/util.py:139-181 semantics, channels-last layout).

    reverse_channel flips RGB→BGR for cv2 writing; YCbCr data passes with
    reverse_channel=False like the reference.
    """
    img = np.asarray(tensor, dtype=np.float32)
    img = np.clip((img - min_max[0]) / (min_max[1] - min_max[0]), 0, 1)
    if reverse_channel and img.ndim == 3 and img.shape[-1] == 3:
        img = img[..., ::-1]
    if out_type == np.uint8:
        img = (img * 255.0).round().astype(np.uint8)
    else:
        img = img.astype(out_type)
    return img


def crop_border(img_list, crop_border_px: int):
    """Crop borders of HWC images (test scripts' util.crop_border)."""
    if crop_border_px == 0:
        return img_list
    return [v[crop_border_px:-crop_border_px, crop_border_px:-crop_border_px]
            for v in img_list]


def modcrop(img_in: np.ndarray, scale: int) -> np.ndarray:
    """Crop H, W to multiples of scale (data/util.py:419-432)."""
    img = np.copy(img_in)
    if img.ndim == 2:
        h, w = img.shape
        img = img[: h - h % scale, : w - w % scale]
    elif img.ndim == 3:
        h, w, _ = img.shape
        img = img[: h - h % scale, : w - w % scale, :]
    else:
        raise ValueError(f"Wrong img ndim: [{img.ndim:d}].")
    return img


def duf_downsample(x, scale: int = 4):
    """DUF protocol downsampling: 13-tap gaussian blur (sigma 0.4*scale)
    then decimation (utils/util.py:188-219), NHWC jnp.

    Matches the reference exactly, including two quirks: the kernel is a
    scipy ``gaussian_filter``-smoothed delta (truncated at radius
    int(4*sigma + 0.5) inside the 13x13 window, NOT a full analytic
    gaussian) and at scale 3 the bottom/right are reflect-extended by
    ``3 - (dim % 3)`` rows/cols — a full extra 3 when already divisible —
    so sizes come out ceil((dim+pad)/3)."""
    import jax
    import jax.numpy as jnp
    from scipy.ndimage import gaussian_filter

    assert scale in (2, 3, 4), f"scale [{scale}] is not supported"
    size = 13
    r = size // 2
    delta = np.zeros((size, size))
    delta[r, r] = 1.0
    k2d = gaussian_filter(delta, 0.4 * scale).astype(np.float32)
    b, h, w, c = x.shape
    r_h = r_w = 0
    if scale == 3:
        r_h, r_w = 3 - (h % 3), 3 - (w % 3)
    x_pad = jnp.pad(x, ((0, 0), (r, r + r_h), (r, r + r_w), (0, 0)),
                    mode="reflect")
    rhs = jnp.broadcast_to(jnp.asarray(k2d)[:, :, None, None],
                           (size, size, 1, c)).astype(x.dtype)
    blurred = jax.lax.conv_general_dilated(
        x_pad, rhs, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return blurred[:, ::scale, ::scale, :]


class ProgressBar:
    """Minimal terminal progress reporter (utils/util.py:337-384)."""

    def __init__(self, task_num: int = 0, start: bool = True):
        self.task_num = task_num
        self.completed = 0
        if start:
            self.start()

    def start(self):
        self.start_time = time.time()

    def update(self, msg: str = "In progress..."):
        self.completed += 1
        elapsed = max(time.time() - self.start_time, 1e-9)
        fps = self.completed / elapsed
        if self.task_num:
            pct = self.completed / self.task_num
            eta = int(elapsed * (1 - pct) / max(pct, 1e-9) + 0.5)
            print(f"[{self.completed}/{self.task_num}] {fps:.1f} task/s, "
                  f"elapsed {int(elapsed)}s, ETA {eta}s  {msg}", flush=True)
        else:
            print(f"completed {self.completed}, {fps:.1f} task/s", flush=True)


def encode_video_with_ffmpeg(src_pattern: str, dst_path: str, crf: int,
                             fps: int = 25, start_number: int = 1,
                             vframes: int = 1000) -> int:
    """x265 encode of a PNG sequence (utils/util.py:449-454); requires the
    ffmpeg binary on PATH."""
    cmd = (f"ffmpeg -r {fps} -f image2 -start_number {start_number} "
           f"-i {src_pattern} -vframes {vframes} -vcodec libx265 -vf fps={fps} "
           f"-crf {crf} -pix_fmt yuv420p -an {dst_path} -y")
    return os.system(cmd)


def extract_frames_with_ffmpeg(video_path: str, image_path: str) -> int:
    """Dump video frames to PNGs via cv2 (utils/util.py:457-483 equivalent
    without the ffmpeg-python dependency)."""
    import cv2

    cap = cv2.VideoCapture(video_path)
    assert cap.isOpened(), f"cannot open video {video_path}"
    os.makedirs(image_path, exist_ok=True)
    k = 0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        k += 1
        cv2.imwrite(osp.join(image_path, f"{k:05d}.png"), frame)
    cap.release()
    return k
