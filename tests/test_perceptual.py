"""LPIPS / DISTS: property tests + torch-oracle numerics validation.

The oracle transcribes the published LPIPSvgg / DISTS formulas (the ones
IQA_pytorch implements, used by the reference's
evaluate_realvsr_full_reference_metrics.py:132-209) in torch, using the
SAME random weights as our JAX params — validating the conv stack, the
L2 pooling, the normalization, and the metric heads numerically.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from realvsr_tpu.eval import perceptual as P


def _rand_imgs(seed=0, b=2, hw=32):
    rng = np.random.default_rng(seed)
    x = rng.random((b, hw, hw, 3), np.float32)
    y = np.clip(x + rng.normal(0, 0.1, x.shape), 0, 1).astype(np.float32)
    return x, y


def _torch_vgg_stages(params, x_nchw, pool):
    """Oracle VGG16 stage outputs with the given pooling fn."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    h = (x_nchw - mean) / std
    stages = []
    ci = 0
    for item in P._VGG16_PLAN:
        if item == "M":
            stages.append(h)
            h = pool(h)
            continue
        w = torch.from_numpy(
            np.asarray(params["convs"][ci]["kernel"]).transpose(3, 2, 0, 1))
        b = torch.from_numpy(np.asarray(params["convs"][ci]["bias"]))
        h = F.relu(F.conv2d(h, w, b, padding=1))
        ci += 1
    stages.append(h)
    return stages


def _torch_l2pool(x, filter_size=5, stride=2):
    a = np.hanning(filter_size)[1:-1]
    g = torch.from_numpy((a[:, None] * a[None, :]).astype(np.float32))
    g = g / g.sum()
    c = x.shape[1]
    filt = g[None, None].repeat(c, 1, 1, 1)
    out = F.conv2d(x ** 2, filt, stride=stride,
                   padding=(filter_size - 2) // 2, groups=c)
    return (out + 1e-12).sqrt()


def _torch_maxpool(x):
    return F.max_pool2d(x, 2, 2)


class TestLPIPS:
    def test_identical_inputs_score_zero(self):
        params = P.init_lpips_params()
        x, _ = _rand_imgs()
        s = np.asarray(P.lpips(params, jnp.asarray(x), jnp.asarray(x)))
        np.testing.assert_allclose(s, 0.0, atol=1e-6)

    def test_matches_torch_oracle(self):
        params = P.init_lpips_params()
        x, y = _rand_imgs(1)
        ours = np.asarray(P.lpips(params, jnp.asarray(x), jnp.asarray(y)))

        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ty = torch.from_numpy(y.transpose(0, 3, 1, 2))
        with torch.no_grad():
            fx = _torch_vgg_stages(params, tx, _torch_maxpool)
            fy = _torch_vgg_stages(params, ty, _torch_maxpool)
            score = 0.0
            for k in range(5):
                nx = fx[k] / (fx[k].norm(dim=1, keepdim=True) + 1e-10)
                ny = fy[k] / (fy[k].norm(dim=1, keepdim=True) + 1e-10)
                w = torch.from_numpy(
                    np.asarray(params["lins"][k])).view(1, -1, 1, 1)
                score = score + (w * (nx - ny) ** 2).sum(1).mean([1, 2])
        np.testing.assert_allclose(ours, score.numpy(), rtol=2e-4, atol=1e-5)


class TestDISTS:
    def test_identical_inputs_score_zero(self):
        params = P.init_lpips_params(with_dists=True)
        x, _ = _rand_imgs(2)
        s = np.asarray(P.dists(params, jnp.asarray(x), jnp.asarray(x)))
        np.testing.assert_allclose(s, 0.0, atol=1e-5)

    def test_matches_torch_oracle(self):
        params = P.init_lpips_params(with_dists=True)
        x, y = _rand_imgs(3)
        ours = np.asarray(P.dists(params, jnp.asarray(x), jnp.asarray(y)))

        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ty = torch.from_numpy(y.transpose(0, 3, 1, 2))
        c1 = c2 = 1e-6
        with torch.no_grad():
            fx = [tx] + _torch_vgg_stages(params, tx, _torch_l2pool)
            fy = [ty] + _torch_vgg_stages(params, ty, _torch_l2pool)
            w_sum = sum(float(np.sum(a)) for a in params["alpha"]) + \
                sum(float(np.sum(b)) for b in params["beta"])
            d1 = d2 = 0.0
            for k in range(6):
                alpha = torch.from_numpy(
                    np.asarray(params["alpha"][k])).view(1, -1, 1, 1) / w_sum
                beta = torch.from_numpy(
                    np.asarray(params["beta"][k])).view(1, -1, 1, 1) / w_sum
                mx = fx[k].mean([2, 3], keepdim=True)
                my = fy[k].mean([2, 3], keepdim=True)
                s1 = (2 * mx * my + c1) / (mx**2 + my**2 + c1)
                d1 = d1 + (alpha * s1).sum(1).squeeze(-1).squeeze(-1)
                vx = ((fx[k] - mx) ** 2).mean([2, 3], keepdim=True)
                vy = ((fy[k] - my) ** 2).mean([2, 3], keepdim=True)
                cxy = (fx[k] * fy[k]).mean([2, 3], keepdim=True) - mx * my
                s2 = (2 * cxy + c2) / (vx + vy + c2)
                d2 = d2 + (beta * s2).sum(1).squeeze(-1).squeeze(-1)
            score = 1.0 - (d1 + d2)
        np.testing.assert_allclose(ours, score.numpy(), rtol=2e-4, atol=1e-5)


class TestLoaders:
    def test_torchvision_vgg16_format_roundtrip(self, tmp_path):
        params = P.init_lpips_params(with_dists=True)
        sd = {}
        idx = 0
        ci = 0
        for item in P._VGG16_PLAN:
            if item == "M":
                idx += 1
                continue
            k = np.asarray(params["convs"][ci]["kernel"]).transpose(3, 2, 0, 1)
            sd[f"features.{idx}.weight"] = torch.from_numpy(k.copy())
            sd[f"features.{idx}.bias"] = torch.from_numpy(
                np.asarray(params["convs"][ci]["bias"]).copy())
            idx += 2
            ci += 1
        for k in range(5):
            sd[f"lin{k}.model.1.weight"] = torch.from_numpy(
                np.asarray(params["lins"][k]).reshape(1, -1, 1, 1).copy())
        sd["alpha"] = torch.from_numpy(np.concatenate(
            [np.asarray(a) for a in params["alpha"]]).reshape(1, -1, 1, 1))
        sd["beta"] = torch.from_numpy(np.concatenate(
            [np.asarray(b) for b in params["beta"]]).reshape(1, -1, 1, 1))
        path = str(tmp_path / "combined.pth")
        torch.save(sd, path)

        lp = P.load_lpips_weights(path)
        dp = P.load_dists_weights(path)
        x, y = _rand_imgs(4, hw=16)
        np.testing.assert_allclose(
            np.asarray(P.lpips(lp, jnp.asarray(x), jnp.asarray(y))),
            np.asarray(P.lpips(params, jnp.asarray(x), jnp.asarray(y))),
            rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(P.dists(dp, jnp.asarray(x), jnp.asarray(y))),
            np.asarray(P.dists(params, jnp.asarray(x), jnp.asarray(y))),
            rtol=1e-6)
