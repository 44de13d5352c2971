"""BRISQUE (no-reference quality) — features, SVR scoring, model fitting.

Completes the reference's MATLAB no-reference evaluation
(``codes/metrics/evaluate_niqe_brisque.m:41-60``): BRISQUE extracts 36
NSS features (GGD fit of MSCN coefficients + AGGD fits of 4 pairwise
products, at 2 scales) and maps them to a quality score with an RBF-kernel
support-vector regressor.

MATLAB's pretrained model (trained on LIVE IQA) is not redistributable, so
this module provides:
  * :func:`brisque_features` — the published 36-dim feature vector,
  * :func:`load_libsvm_model` — parse the original BRISQUE release's
    ``allmodel`` / ``allrange`` files (libsvm eps-SVR text format),
  * :func:`fit_brisque_model` — train a custom model from (image, score)
    pairs with sklearn's SVR using the original release's hyperparameters
    (the MATLAB ``fitbrisque`` workflow),
  * :func:`brisque_score` — score an image against either model form.
"""
from __future__ import annotations

import numpy as np
from scipy.special import gamma

from realvsr_tpu.eval.niqe import _GAM, _R_GAM, _mscn


def _ggd_fit(vec: np.ndarray):
    """Generalized gaussian fit → (alpha, sigma^2) (moment matching)."""
    vec = vec.ravel()
    sigma_sq = np.mean(vec**2)
    e_abs = np.mean(np.abs(vec))
    rho = sigma_sq / max(e_abs**2, 1e-12)
    # rho = gamma(1/a)*gamma(3/a)/gamma(2/a)^2 — reuse the AGGD table
    pos = np.argmin((1.0 / _R_GAM - rho) ** 2)
    return _GAM[pos], sigma_sq


def _aggd_fit4(vec: np.ndarray):
    """AGGD fit → (alpha, mean, l_var, r_var) — the BRISQUE product
    parameterization (variances, not scales)."""
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
    const = np.sqrt(gamma(1.0 / alpha) / gamma(3.0 / alpha))
    mean = (rsq - lsq) * (gamma(2.0 / alpha) / gamma(1.0 / alpha)) * const
    return alpha, mean, lsq**2, rsq**2


def brisque_features(img: np.ndarray) -> np.ndarray:
    """36-dim BRISQUE feature vector of a grayscale [0, 255] image."""
    img = img.astype(np.float64)
    feats = []
    cur = img
    for _ in range(2):
        struct, _ = _mscn(cur)
        alpha, sigma_sq = _ggd_fit(struct)
        feats += [alpha, sigma_sq]
        for dy, dx in [(0, 1), (1, 0), (1, 1), (1, -1)]:
            pair = struct * np.roll(struct, (dy, dx), axis=(0, 1))
            feats += list(_aggd_fit4(pair))
        hh, ww = cur.shape[0] // 2 * 2, cur.shape[1] // 2 * 2
        c2 = cur[:hh, :ww]
        cur = (c2[0::2, 0::2] + c2[1::2, 0::2] + c2[0::2, 1::2] +
               c2[1::2, 1::2]) / 4.0
    return np.asarray(feats, np.float64)


# ----------------------------------------------------------------- scoring
def _scale_features(f, lo, hi):
    """libsvm-style scaling to [-1, 1] with training min/max."""
    return -1.0 + 2.0 * (f - lo) / np.maximum(hi - lo, 1e-12)


def brisque_score(img: np.ndarray, model: dict) -> float:
    """BRISQUE score (lower is better for LIVE-style training labels)."""
    f = brisque_features(img)
    if "sklearn_svr" in model:
        fs = _scale_features(f, model["lo"], model["hi"])
        return float(model["sklearn_svr"].predict(fs[None])[0])
    fs = _scale_features(f, model["lo"], model["hi"])
    sv = model["sv"]                     # (n_sv, 36)
    coef = model["sv_coef"]              # (n_sv,)
    g = model["gamma"]
    k = np.exp(-g * np.sum((sv - fs[None]) ** 2, axis=1))
    return float(coef @ k - model["rho"])


def load_libsvm_model(model_path: str, range_path: str) -> dict:
    """Parse the original BRISQUE release's libsvm model + range files."""
    params = {}
    sv_coef = []
    svs = []
    in_sv = False
    with open(model_path) as fh:
        for line in fh:
            line = line.strip()
            if not line:
                continue
            if line == "SV":
                in_sv = True
                continue
            if not in_sv:
                parts = line.split()
                if parts[0] in ("gamma", "rho", "nr_class", "total_sv"):
                    params[parts[0]] = float(parts[1])
                continue
            parts = line.split()
            sv_coef.append(float(parts[0]))
            vec = np.zeros(36)
            for tok in parts[1:]:
                idx, val = tok.split(":")
                vec[int(idx) - 1] = float(val)
            svs.append(vec)
    lo = np.zeros(36)
    hi = np.ones(36)
    with open(range_path) as fh:
        lines = [ln.split() for ln in fh if ln.strip()]
    for ln in lines:
        if len(ln) == 3 and ln[0].isdigit():
            i = int(ln[0]) - 1
            if 0 <= i < 36:
                lo[i], hi[i] = float(ln[1]), float(ln[2])
    return {"sv": np.asarray(svs), "sv_coef": np.asarray(sv_coef),
            "gamma": params.get("gamma", 0.05),
            "rho": params.get("rho", 0.0), "lo": lo, "hi": hi}


def fit_brisque_model(images, scores, gamma_svr: float = 0.05,
                      c_svr: float = 1024.0, epsilon: float = 0.1) -> dict:
    """Train a custom BRISQUE model from (grayscale image, score) pairs —
    the MATLAB ``fitbrisque`` workflow, using the original release's
    libsvm hyperparameters (eps-SVR, RBF, g=0.05, C=1024)."""
    from sklearn.svm import SVR

    feats = np.stack([brisque_features(im) for im in images])
    lo = feats.min(axis=0)
    hi = feats.max(axis=0)
    fs = _scale_features(feats, lo, hi)
    svr = SVR(kernel="rbf", gamma=gamma_svr, C=c_svr, epsilon=epsilon)
    svr.fit(fs, np.asarray(scores, np.float64))
    return {"sklearn_svr": svr, "lo": lo, "hi": hi}
