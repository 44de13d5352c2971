"""NIQE (no-reference quality) — fitting and scoring in pure numpy/scipy.

Rebuilds the reference's MATLAB no-reference evaluation workflow
(``codes/metrics/evaluate_niqe_brisque.m`` + ``fit_niqe_model.m``): the
reference *fits a custom NIQE model on RealVSR GT frames* (fitniqe, 96x96
blocks) and scores result sequences against it.  MATLAB's fitted model
ships as an opaque MCOS object (niqe_model_realvsr_all.mat) that cannot be
decoded outside MATLAB, so this module reimplements the full pipeline:

  * MSCN coefficients (7x7 gaussian, sigma 7/6),
  * AGGD moment-matching fits over MSCN and its 4 paired products,
  * 18 features x 2 scales = 36-dim NSS feature vector per block,
  * fit: sharpness-selected blocks → multivariate gaussian (mu, cov),
  * score: Mahalanobis-style distance between the model MVG and the
    test image's block-feature MVG.

BRISQUE (features, libsvm model parsing, fitting) lives in
``realvsr_tpu/eval/brisque.py``.
"""
from __future__ import annotations

import glob
import os.path as osp

import numpy as np
from scipy.ndimage import correlate
from scipy.special import gamma


def _gaussian_window(size: int = 7, sigma: float = 7.0 / 6.0) -> np.ndarray:
    ax = np.arange(size) - size // 2
    g = np.exp(-(ax**2) / (2 * sigma**2))
    w = np.outer(g, g)
    return w / w.sum()


_WIN = _gaussian_window()

# AGGD alpha lookup table
_GAM = np.arange(0.2, 10.001, 0.001)
_R_GAM = (gamma(2.0 / _GAM) ** 2) / (gamma(1.0 / _GAM) * gamma(3.0 / _GAM))


def _aggd_fit(vec: np.ndarray):
    """Asymmetric generalized gaussian fit → (alpha, beta_l, beta_r)."""
    vec = vec.ravel()
    left = vec[vec < 0]
    right = vec[vec > 0]
    lsq = np.sqrt(np.mean(left**2)) if left.size else 1e-6
    rsq = np.sqrt(np.mean(right**2)) if right.size else 1e-6
    gammahat = lsq / max(rsq, 1e-6)
    rhat = (np.mean(np.abs(vec)) ** 2) / max(np.mean(vec**2), 1e-12)
    rhatnorm = (rhat * (gammahat**3 + 1) * (gammahat + 1)) / \
        ((gammahat**2 + 1) ** 2)
    pos = np.argmin((_R_GAM - rhatnorm) ** 2)
    alpha = _GAM[pos]
    beta_l = lsq * np.sqrt(gamma(1.0 / alpha) / gamma(3.0 / alpha))
    beta_r = rsq * np.sqrt(gamma(1.0 / alpha) / gamma(3.0 / alpha))
    return alpha, beta_l, beta_r


def _mscn(img: np.ndarray):
    """MSCN coefficients and the local sigma field."""
    mu = correlate(img, _WIN, mode="nearest")
    sigma = np.sqrt(np.abs(correlate(img * img, _WIN, mode="nearest") - mu**2))
    return (img - mu) / (sigma + 1.0), sigma


def _block_features(struct: np.ndarray) -> np.ndarray:
    """18 NSS features of one MSCN block (niqe feature set)."""
    feats = []
    alpha, bl, br = _aggd_fit(struct)
    feats += [alpha, (bl + br) / 2.0]
    shifts = [(0, 1), (1, 0), (1, 1), (1, -1)]  # H, V, D1, D2
    for dy, dx in shifts:
        shifted = np.roll(struct, (dy, dx), axis=(0, 1))
        pair = struct * shifted
        alpha, bl, br = _aggd_fit(pair)
        const = np.sqrt(gamma(1.0 / alpha)) / np.sqrt(gamma(3.0 / alpha))
        mean = (br - bl) * (gamma(2.0 / alpha) / gamma(1.0 / alpha)) * const
        feats += [alpha, mean, bl, br]
    return np.asarray(feats, dtype=np.float64)


def niqe_features(img: np.ndarray, block_size: int = 96,
                  sharpness_threshold: float | None = None):
    """Per-block 36-dim features of a grayscale [0,255] image.

    Returns (features (N, 36), used_block_mask) — with a sharpness
    threshold, only blocks whose average local sigma exceeds
    threshold*max are used (the fitniqe selection rule).
    """
    img = img.astype(np.float64)
    h, w = img.shape
    nbh, nbw = h // block_size, w // block_size
    img = img[: nbh * block_size, : nbw * block_size]

    feats_scales = []
    sharpness = None
    cur = img
    for scale in range(2):
        struct, sigma = _mscn(cur)
        bs = block_size >> scale
        blocks = []
        sharp = []
        for by in range(nbh):
            for bx in range(nbw):
                blk = struct[by * bs:(by + 1) * bs, bx * bs:(bx + 1) * bs]
                blocks.append(_block_features(blk))
                if scale == 0:
                    sblk = sigma[by * bs:(by + 1) * bs, bx * bs:(bx + 1) * bs]
                    sharp.append(sblk.mean())
        feats_scales.append(np.stack(blocks))
        if scale == 0:
            sharpness = np.asarray(sharp)
        # downscale by 2 (average pool) for the second scale
        hh, ww = cur.shape[0] // 2 * 2, cur.shape[1] // 2 * 2
        c2 = cur[:hh, :ww]
        cur = (c2[0::2, 0::2] + c2[1::2, 0::2] + c2[0::2, 1::2] +
               c2[1::2, 1::2]) / 4.0

    feats = np.concatenate(feats_scales, axis=1)  # (N, 36)
    if sharpness_threshold is not None and sharpness.size:
        keep = sharpness > sharpness_threshold * sharpness.max()
        if keep.sum() >= 2:
            return feats[keep], keep
    return feats, np.ones(len(feats), bool)


def fit_niqe_model(gt_root: str, block_size: int = 96,
                   sharpness_threshold: float = 0.75,
                   max_images: int | None = None) -> dict:
    """Fit a custom NIQE model on a tree of GT frames (fit_niqe_model.m).

    gt_root: directory tree containing PNGs (searched two levels deep like
    the reference: <root>/*/*.png, falling back to <root>/*.png).
    Returns {"mu": (36,), "cov": (36, 36)} — save with np.savez.
    """
    import cv2

    paths = sorted(glob.glob(osp.join(gt_root, "*", "*.png"))) or \
        sorted(glob.glob(osp.join(gt_root, "*.png")))
    if max_images:
        paths = paths[:max_images]
    assert paths, f"no PNGs under {gt_root}"
    all_feats = []
    for p in paths:
        img = cv2.imread(p, cv2.IMREAD_GRAYSCALE).astype(np.float64)
        f, _ = niqe_features(img, block_size, sharpness_threshold)
        all_feats.append(f)
    feats = np.concatenate(all_feats, axis=0)
    mu = feats.mean(axis=0)
    cov = np.cov(feats, rowvar=False)
    return {"mu": mu, "cov": cov, "block_size": np.asarray(block_size)}


def load_matlab_niqe_model(path: str) -> dict:
    """Load a MATLAB-fitted niqeModel from a .mat file (e.g. the
    reference's ``metrics/models/niqe_model_realvsr_all.mat``).

    MATLAB saves fitniqe results as an opaque MCOS object that scipy can't
    decode; its numeric payload however lives in the embedded
    ``__function_workspace__`` MAT5 stream.  We scan that stream for the
    miDOUBLE elements with the known niqeModel shapes: mean (36,),
    covariance (36, 36), block size (2,), sharpness threshold (1,).
    Verified against the reference model: mu[0] ≈ 2.55 (typical MSCN
    alpha), 96x96 blocks, threshold 0.
    """
    import struct

    import scipy.io as sio

    m = sio.loadmat(path)
    fw = m.get("__function_workspace__")
    if fw is None:
        raise ValueError(f"{path}: no MCOS function workspace found")
    data = fw.tobytes()
    mu = cov = block = thr = None
    for off in range(0, len(data) - 8, 4):
        t, nb = struct.unpack_from("<ii", data, off)
        if t != 9:  # miDOUBLE
            continue
        cnt = nb // 8
        if cnt not in (36, 36 * 36, 2, 1):
            continue
        arr = np.frombuffer(data, np.float64, count=cnt, offset=off + 8)
        if not np.all(np.isfinite(arr)):
            continue
        if cnt == 36 and mu is None:
            mu = arr.copy()
        elif cnt == 36 * 36 and cov is None:
            cov = arr.copy().reshape(36, 36)
        elif cnt == 2 and block is None and np.all(arr > 0) and \
                np.all(arr == np.round(arr)):
            block = arr.copy()
        elif cnt == 1 and thr is None and 0 <= arr[0] <= 1:
            thr = float(arr[0])
    if mu is None or cov is None:
        raise ValueError(f"{path}: could not locate niqeModel arrays")
    return {"mu": mu, "cov": cov,
            "block_size": np.asarray(int(block[0]) if block is not None
                                     else 96),
            "sharpness_threshold": np.asarray(0.0 if thr is None else thr)}


def niqe_score(img: np.ndarray, model: dict, block_size: int | None = None) -> float:
    """NIQE score of a grayscale [0,255] image against a fitted model
    (lower is better)."""
    bs = int(model.get("block_size", 96)) if block_size is None else block_size
    feats, _ = niqe_features(img, bs, sharpness_threshold=None)
    mu_img = feats.mean(axis=0)
    cov_img = np.cov(feats, rowvar=False)
    d = model["mu"] - mu_img
    cov_avg = (model["cov"] + cov_img) / 2.0
    inv = np.linalg.pinv(cov_avg)
    return float(np.sqrt(max(d @ inv @ d, 0.0)))
