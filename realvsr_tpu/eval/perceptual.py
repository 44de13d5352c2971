"""LPIPS (VGG16) and DISTS full-reference perceptual metrics in JAX.

Rebuilds the metrics the reference computes with IQA_pytorch
(``codes/metrics/evaluate_realvsr_full_reference_metrics.py:132-209``,
LPIPSvgg / DISTS): a VGG16 feature backbone with the published metric
heads.  The learned weights (VGG16 ImageNet convs, the LPIPS linear
calibration, the DISTS alpha/beta) are not bundled in this image — load
them from torch checkpoint files with :func:`load_lpips_weights` /
:func:`load_dists_weights` (torchvision ``vgg16`` + official
``LPIPS``/``DISTS`` releases).  Random-init params from
:func:`init_lpips_params` keep the pipeline runnable for wiring tests.

All metric math is pure jnp and jittable; inputs are NHWC RGB in [0, 1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG16 features: conv channels with 'M' pool markers; LPIPS /
# DISTS tap the (post-ReLU) stage outputs relu1_2 .. relu5_3
_VGG16_PLAN = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
               512, 512, 512, "M", 512, 512, 512]
_STAGE_CHNS = [64, 128, 256, 512, 512]

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _max_pool2(x):
    return jax.lax.reduce_window(x, -jnp.inf, jax.lax.max, (1, 2, 2, 1),
                                 (1, 2, 2, 1), "VALID")


def _l2_pool(x, filter_size: int = 5, stride: int = 2):
    """DISTS L2pooling: depthwise Hanning-window pooling of x² then sqrt."""
    a = np.hanning(filter_size)[1:-1]
    g = (a[:, None] * a[None, :]).astype(np.float32)
    g = g / g.sum()
    c = x.shape[-1]
    kern = jnp.asarray(np.tile(g[:, :, None, None], (1, 1, 1, c)))
    pad = (filter_size - 2) // 2
    out = jax.lax.conv_general_dilated(
        (x * x), kern, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return jnp.sqrt(out + 1e-12)


def _vgg16_stages(convs, x, pool):
    """Run the VGG16 conv stack; returns the 5 post-ReLU stage outputs."""
    stages = []
    ci = 0
    h = x
    for item in _VGG16_PLAN:
        if item == "M":
            stages.append(h)
            h = pool(h)
            continue
        w, b = convs[ci]["kernel"], convs[ci]["bias"]
        h = jax.lax.conv_general_dilated(
            h, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        h = jax.nn.relu(h)
        ci += 1
    stages.append(h)  # relu5_3 (no trailing pool)
    return stages


def _normalize_input(x):
    return (x - _MEAN.reshape(1, 1, 1, 3)) / _STD.reshape(1, 1, 1, 3)


# --------------------------------------------------------------------- LPIPS
def lpips(params, x, y):
    """LPIPS-VGG distance per image (B,) — lower is better.

    params: {'convs': [{kernel,bias}×13], 'lins': [(C_k,)×5]}.
    Matches IQA_pytorch LPIPSvgg: unit-normalize each stage's channels,
    squared difference, per-channel linear calibration, spatial mean,
    sum over stages.
    """
    fx = _vgg16_stages(params["convs"], _normalize_input(x), _max_pool2)
    fy = _vgg16_stages(params["convs"], _normalize_input(y), _max_pool2)
    score = 0.0
    for k in range(5):
        nx = fx[k] / (jnp.linalg.norm(fx[k], axis=-1, keepdims=True) + 1e-10)
        ny = fy[k] / (jnp.linalg.norm(fy[k], axis=-1, keepdims=True) + 1e-10)
        diff = (nx - ny) ** 2
        w = params["lins"][k].reshape(1, 1, 1, -1)
        score = score + jnp.mean(jnp.sum(w * diff, axis=-1), axis=(1, 2))
    return score


# --------------------------------------------------------------------- DISTS
def dists(params, x, y, c1: float = 1e-6, c2: float = 1e-6):
    """DISTS per image (B,) — lower is better.

    params: {'convs': [...×13], 'alpha': [(C_k,)×6], 'beta': [(C_k,)×6]}
    with stage 0 being the raw input (3 channels).  Texture term from
    channel means, structure term from channel (co)variances, weighted by
    the learned alpha/beta (normalized by their joint sum).
    """
    fx = [x] + _vgg16_stages(params["convs"], _normalize_input(x), _l2_pool)
    fy = [y] + _vgg16_stages(params["convs"], _normalize_input(y), _l2_pool)
    w_sum = sum(jnp.sum(a) for a in params["alpha"]) + \
        sum(jnp.sum(b) for b in params["beta"])
    dist1 = 0.0
    dist2 = 0.0
    for k in range(6):
        alpha = params["alpha"][k].reshape(1, -1) / w_sum
        beta = params["beta"][k].reshape(1, -1) / w_sum
        mx = jnp.mean(fx[k], axis=(1, 2))
        my = jnp.mean(fy[k], axis=(1, 2))
        s1 = (2 * mx * my + c1) / (mx**2 + my**2 + c1)
        dist1 = dist1 + jnp.sum(alpha * s1, axis=-1)
        vx = jnp.mean(fx[k]**2, axis=(1, 2)) - mx**2
        vy = jnp.mean(fy[k]**2, axis=(1, 2)) - my**2
        cxy = jnp.mean(fx[k] * fy[k], axis=(1, 2)) - mx * my
        s2 = (2 * cxy + c2) / (vx + vy + c2)
        dist2 = dist2 + jnp.sum(beta * s2, axis=-1)
    return 1.0 - (dist1 + dist2)


# ------------------------------------------------------------------- loaders
def init_lpips_params(rng=None, with_dists: bool = False):
    """Random-init params (runnable pipeline without weight files)."""
    rng = np.random.default_rng(0 if rng is None else rng)
    convs = []
    cin = 3
    for item in _VGG16_PLAN:
        if item == "M":
            continue
        convs.append({
            "kernel": jnp.asarray(
                rng.normal(0, 0.05, (3, 3, cin, item)).astype(np.float32)),
            "bias": jnp.zeros((item,), jnp.float32)})
        cin = item
    params = {"convs": convs,
              "lins": [jnp.asarray(rng.random(c).astype(np.float32))
                       for c in _STAGE_CHNS]}
    if with_dists:
        chns = [3] + _STAGE_CHNS
        params["alpha"] = [jnp.asarray(rng.random(c).astype(np.float32))
                           for c in chns]
        params["beta"] = [jnp.asarray(rng.random(c).astype(np.float32))
                          for c in chns]
    return params


def _load_torch(path):
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: np.asarray(v.detach().numpy() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def _vgg16_convs_from_sd(sd):
    """Extract the 13 conv layers from a torchvision vgg16 state_dict
    (features.N.weight) or an IQA_pytorch stageK.N.weight layout."""
    convs = []
    if any(k.startswith("features.") for k in sd):
        idx = 0
        for item in _VGG16_PLAN:
            if item == "M":
                idx += 1
                continue
            w = sd[f"features.{idx}.weight"].transpose(2, 3, 1, 0)
            b = sd[f"features.{idx}.bias"]
            convs.append({"kernel": jnp.asarray(w), "bias": jnp.asarray(b)})
            idx += 2
        return convs
    # IQA_pytorch saves the backbone as stage1..stage5 sequentials
    keys = sorted(
        (k for k in sd if k.endswith(".weight") and sd[k].ndim == 4),
        key=lambda k: (int(k.split("stage")[1].split(".")[0]),
                       int(k.split(".")[1])))
    for k in keys:
        convs.append({
            "kernel": jnp.asarray(sd[k].transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(sd[k[:-len("weight")] + "bias"])})
    assert len(convs) == 13, f"expected 13 VGG16 convs, got {len(convs)}"
    return convs


def load_lpips_weights(vgg16_path: str, lpips_path: str | None = None):
    """Build LPIPS params from torch files.

    vgg16_path: torchvision vgg16 state_dict (or a combined LPIPSvgg dump —
    then lpips_path may be None and the linear weights are read from the
    same file: official ``lin{k}.model.1.weight`` keys, IQA_pytorch
    ``weights.{k}``, or plain ``w{k}``).
    """
    sd = _load_torch(vgg16_path)
    if lpips_path is not None:
        sd.update(_load_torch(lpips_path))
    lins = []
    for k in range(5):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight",
                    f"weights.{k}", f"w{k}"):
            if key in sd:
                lins.append(jnp.asarray(sd[key].reshape(-1)))
                break
        else:
            raise KeyError(f"no LPIPS linear weight found for stage {k}")
    return {"convs": _vgg16_convs_from_sd(sd), "lins": lins}


def load_dists_weights(vgg16_path: str, dists_path: str | None = None):
    """Build DISTS params from torch files (official release stores alpha /
    beta of shape (1, 3+64+128+256+512+512, 1, 1))."""
    sd = _load_torch(vgg16_path)
    if dists_path is not None:
        sd.update(_load_torch(dists_path))
    chns = [3] + _STAGE_CHNS
    alpha = np.asarray(sd["alpha"]).reshape(-1)
    beta = np.asarray(sd["beta"]).reshape(-1)
    assert alpha.size == sum(chns), (alpha.size, sum(chns))
    splits = np.cumsum(chns)[:-1]
    return {"convs": _vgg16_convs_from_sd(sd),
            "alpha": [jnp.asarray(a) for a in np.split(alpha, splits)],
            "beta": [jnp.asarray(b) for b in np.split(beta, splits)]}
