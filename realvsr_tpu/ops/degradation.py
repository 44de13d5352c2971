"""Blur-kernel / PCA / SRMD degradation toolkit (rebuild of
``codes/utils/util.py:557-1008``).

Kernel generation and PCA run host-side (numpy, explicit Generator); the
batch blur and noising are jit-friendly jnp ops so SRMD-style degradation
can run on device inside the input pipeline.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from realvsr_tpu.ops.resize import matlab_imresize


# ---------------------------------------------------------------------------
# kernel generation (host)
# ---------------------------------------------------------------------------


def isotropic_gaussian_kernel(l: int, sigma: float) -> np.ndarray:
    """(l, l) isotropic gaussian, normalized (utils/util.py isogkern)."""
    ax = np.arange(-(l // 2), l // 2 + 1, dtype=np.float64)
    xx, yy = np.meshgrid(ax, ax)
    k = np.exp(-(xx**2 + yy**2) / (2.0 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def cal_sigma(sig_x: float, sig_y: float, radians: float) -> np.ndarray:
    """Covariance matrix of a rotated anisotropic gaussian."""
    d = np.array([[sig_x**2, 0.0], [0.0, sig_y**2]])
    u = np.array([[np.cos(radians), -np.sin(radians)],
                  [np.sin(radians), np.cos(radians)]])
    return u @ d @ u.T


def anisotropic_gaussian_kernel(l: int, sigma_matrix: np.ndarray) -> np.ndarray:
    """(l, l) anisotropic gaussian from a 2x2 covariance."""
    ax = np.arange(-(l // 2), l // 2 + 1, dtype=np.float64)
    xx, yy = np.meshgrid(ax, ax)
    xy = np.stack([xx, yy], axis=-1)  # (l, l, 2)
    inv = np.linalg.inv(sigma_matrix)
    k = np.exp(-0.5 * np.einsum("hwi,ij,hwj->hw", xy, inv, xy))
    return (k / k.sum()).astype(np.float32)


def random_isotropic_gaussian_kernel(rng: np.random.Generator,
                                     sig_min=0.2, sig_max=4.0, l=21):
    sig = rng.uniform(sig_min, sig_max)
    return isotropic_gaussian_kernel(l, sig), sig


def random_anisotropic_gaussian_kernel(rng: np.random.Generator,
                                       sig_min=0.2, sig_max=4.0,
                                       scaling=3, l=21):
    theta = rng.uniform(0, np.pi)
    sig_x = rng.uniform(sig_min, sig_max)
    sig_y = np.clip(sig_x * rng.uniform(1.0 / scaling, 1.0), sig_min, sig_max)
    return anisotropic_gaussian_kernel(l, cal_sigma(sig_x, sig_y, theta))


def random_gaussian_kernel(rng: np.random.Generator, l=21, sig_min=0.2,
                           sig_max=4.0, rate_iso=1.0, scaling=3):
    """iso with prob rate_iso else anisotropic (utils/util.py
    random_gaussian_kernel)."""
    if rng.random() < rate_iso:
        return random_isotropic_gaussian_kernel(rng, sig_min, sig_max, l)[0]
    return random_anisotropic_gaussian_kernel(rng, sig_min, sig_max, scaling, l)


def random_batch_kernel(rng: np.random.Generator, batch: int, l=21,
                        sig_min=0.2, sig_max=4.0, rate_iso=1.0,
                        scaling=3) -> np.ndarray:
    return np.stack([
        random_gaussian_kernel(rng, l, sig_min, sig_max, rate_iso, scaling)
        for _ in range(batch)
    ])


def stable_batch_kernel(batch: int, l=21, sig=2.6) -> np.ndarray:
    k = isotropic_gaussian_kernel(l, sig)
    return np.broadcast_to(k, (batch, l, l)).copy()


# ---------------------------------------------------------------------------
# PCA kernel encoding (host fit, device apply)
# ---------------------------------------------------------------------------


def pca_fit(data: np.ndarray, k: int = 2) -> np.ndarray:
    """PCA basis of flattened kernels: data (N, D) → (D, k) projection
    (utils/util.py PCA)."""
    x = data - data.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    return vt[:k].T.astype(np.float32)  # (D, k)


def pca_encode(kernels: jnp.ndarray, basis: jnp.ndarray) -> jnp.ndarray:
    """(B, l, l) kernels → (B, k) codes (PCAEncoder.__call__)."""
    b = kernels.shape[0]
    flat = kernels.reshape(b, -1)
    return flat @ basis


# ---------------------------------------------------------------------------
# device-side degradation ops
# ---------------------------------------------------------------------------


def batch_blur(x: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Per-example blur: x (B, H, W, C), kernels (B, l, l) (BatchBlur)."""
    b, h, w, c = x.shape
    l = kernels.shape[-1]
    pad = l // 2
    x_pad = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="edge")

    def one(img, k):
        rhs = jnp.broadcast_to(k[:, :, None, None], (l, l, 1, c)).astype(img.dtype)
        return jax.lax.conv_general_dilated(
            img[None], rhs, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)[0]

    return jax.vmap(one)(x_pad, kernels.astype(x.dtype))


def gaussian_noising(key, x: jnp.ndarray, sigma: jnp.ndarray,
                     clip_min=0.0, clip_max=1.0) -> jnp.ndarray:
    """Add per-example gaussian noise; sigma (B,) in [0,1] scale
    (b_GaussianNoising)."""
    noise = jax.random.normal(key, x.shape, x.dtype)
    out = x + noise * sigma.reshape(-1, *([1] * (x.ndim - 1))).astype(x.dtype)
    return jnp.clip(out, clip_min, clip_max)


def random_batch_noise(rng: np.random.Generator, batch: int, high: float,
                       rate_cln: float = 1.0) -> np.ndarray:
    """Per-example noise levels, zeroed with prob rate_cln
    (random_batch_noise)."""
    levels = rng.uniform(0, high, size=(batch,))
    mask = rng.uniform(size=(batch,)) > rate_cln
    return (levels * mask).astype(np.float32)


class SRMDPreprocessing:
    """SRMD-style degradation: blur → bicubic ↓scale → noise, plus the
    PCA kernel code (+ noise level) map (utils/util.py SRMDPreprocessing)."""

    def __init__(self, scale: int, pca_basis: np.ndarray, ksize: int = 21,
                 code_length: int = 10, random_kernel: bool = True,
                 noise: bool = False, sig: float = 2.6, sig_min: float = 0.2,
                 sig_max: float = 4.0, rate_iso: float = 1.0,
                 scaling: int = 3, rate_cln: float = 0.2,
                 noise_high: float = 0.08):
        self.scale = scale
        self.basis = jnp.asarray(pca_basis)
        self.ksize = ksize
        self.random_kernel = random_kernel
        self.noise = noise
        self.sig, self.sig_min, self.sig_max = sig, sig_min, sig_max
        self.rate_iso, self.scaling = rate_iso, scaling
        self.rate_cln, self.noise_high = rate_cln, noise_high

    def __call__(self, rng: np.random.Generator, key, hr: jnp.ndarray):
        b = hr.shape[0]
        if self.random_kernel:
            kernels = random_batch_kernel(rng, b, self.ksize, self.sig_min,
                                          self.sig_max, self.rate_iso,
                                          self.scaling)
        else:
            kernels = stable_batch_kernel(b, self.ksize, self.sig)
        kernels_j = jnp.asarray(kernels)
        blurred = batch_blur(hr, kernels_j)
        lr = matlab_imresize(blurred, 1.0 / self.scale)
        codes = pca_encode(kernels_j, self.basis)
        if self.noise:
            levels = jnp.asarray(
                random_batch_noise(rng, b, self.noise_high, self.rate_cln))
            lr = gaussian_noising(key, lr, levels)
            codes = jnp.concatenate([codes, levels[:, None] * 10.0], axis=1)
        return lr, codes, kernels_j
