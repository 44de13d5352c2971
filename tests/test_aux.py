"""Aux subsystems: degradation toolkit, NIQE, utils."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realvsr_tpu.ops import degradation as deg
from realvsr_tpu.eval import niqe
from realvsr_tpu.utils import util as u


class TestDegradation:
    def test_isotropic_kernel_normalized(self):
        k = deg.isotropic_gaussian_kernel(21, 2.0)
        assert abs(k.sum() - 1.0) < 1e-5
        assert k[10, 10] == k.max()

    def test_anisotropic_kernel(self):
        sm = deg.cal_sigma(3.0, 1.0, 0.5)
        k = deg.anisotropic_gaussian_kernel(21, sm)
        assert abs(k.sum() - 1.0) < 1e-5

    def test_batch_blur_matches_scipy(self):
        from scipy.ndimage import correlate

        rng = np.random.default_rng(0)
        x = rng.random((2, 16, 16, 3)).astype(np.float32)
        k = deg.stable_batch_kernel(2, l=5, sig=1.2)
        out = np.asarray(deg.batch_blur(jnp.asarray(x), jnp.asarray(k)))
        ref = np.stack([
            np.stack([correlate(x[b, :, :, c], k[b], mode="nearest")
                      for c in range(3)], axis=-1)
            for b in range(2)
        ])
        np.testing.assert_allclose(out, ref, atol=1e-4)

    def test_pca_roundtrip(self):
        rng = np.random.default_rng(1)
        kernels = deg.random_batch_kernel(rng, 32, l=13)
        basis = deg.pca_fit(kernels.reshape(32, -1), k=10)
        codes = np.asarray(deg.pca_encode(jnp.asarray(kernels),
                                          jnp.asarray(basis)))
        assert codes.shape == (32, 10)

    def test_srmd_preprocessing(self):
        rng = np.random.default_rng(2)
        kernels = deg.random_batch_kernel(rng, 16, l=21)
        basis = deg.pca_fit(kernels.reshape(16, -1), k=10)
        pre = deg.SRMDPreprocessing(scale=2, pca_basis=basis, noise=True)
        hr = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
        lr, codes, ks = pre(rng, jax.random.PRNGKey(0), hr)
        assert lr.shape == (2, 16, 16, 3)
        assert codes.shape == (2, 11)  # 10 pca + 1 noise level


class TestNIQE:
    def _mkimg(self, seed, sharp=True, hw=200):
        rng = np.random.default_rng(seed)
        if sharp:
            base = rng.random((hw, hw)) * 255
        else:
            from scipy.ndimage import gaussian_filter

            base = gaussian_filter(rng.random((hw, hw)) * 255, 4.0)
        return base

    def test_fit_and_score(self, tmp_path):
        import cv2

        # fit on noise-texture images, score similar vs heavily blurred
        for i in range(3):
            img = self._mkimg(i)
            cv2.imwrite(str(tmp_path / f"{i:03d}.png"), img.astype(np.uint8))
        model = niqe.fit_niqe_model(str(tmp_path), block_size=96,
                                    sharpness_threshold=0.0)
        similar = niqe.niqe_score(self._mkimg(99), model)
        blurred = niqe.niqe_score(self._mkimg(99, sharp=False), model)
        assert np.isfinite(similar) and np.isfinite(blurred)
        # statistics of the dissimilar (blurred) image must score worse
        assert blurred > similar

    def test_features_shape(self):
        f, mask = niqe.niqe_features(self._mkimg(0), block_size=96)
        assert f.shape[1] == 36


class TestUtils:
    def test_modcrop(self):
        img = np.zeros((10, 13, 3))
        assert u.modcrop(img, 4).shape == (8, 12, 3)

    def test_tensor2img_roundtrip(self):
        x = np.random.default_rng(0).random((8, 8, 3)).astype(np.float32)
        img = u.tensor2img(x, reverse_channel=True)
        assert img.dtype == np.uint8
        back = u.img2tensor(img.astype(np.float32) / 255.0)
        np.testing.assert_allclose(back, x, atol=1 / 255.0 + 1e-6)

    def test_mkdir_and_rename(self, tmp_path):
        p = str(tmp_path / "exp")
        u.mkdir_and_rename(p)
        open(os.path.join(p, "x.txt"), "w").write("1")
        u.mkdir_and_rename(p)
        assert os.path.isdir(p) and not os.listdir(p)
        archived = [d for d in os.listdir(tmp_path) if "archived" in d]
        assert len(archived) == 1

    def test_duf_downsample(self):
        x = jnp.ones((1, 16, 16, 3))
        out = u.duf_downsample(x, scale=4)
        assert out.shape == (1, 4, 4, 3)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


@pytest.mark.slow
class TestDufDownsampleOracle:
    """duf_downsample vs a torch reimplementation of the reference
    (utils/util.py:188-219), including the scale-3 r_h = 3 - dim%3 quirk
    that reflect-extends by a full 3 when already divisible."""

    @pytest.mark.parametrize("scale", [2, 3, 4])
    @pytest.mark.parametrize("hw", [(24, 32), (23, 31), (21, 27)])
    def test_matches_torch_reference(self, scale, hw):
        import torch
        import torch.nn.functional as F
        from scipy.ndimage import gaussian_filter

        H, W = hw

        def torch_ref(x, scale):
            delta = np.zeros((13, 13))
            delta[6, 6] = 1.0
            B, T, C, H, W = x.shape
            x = x.reshape(-1, 1, H, W)
            pad = 6 + scale * 2
            r_h = r_w = 0
            if scale == 3:
                r_h, r_w = 3 - (H % 3), 3 - (W % 3)
            x = F.pad(x, [pad, pad + r_w, pad, pad + r_h], "reflect")
            gf = torch.from_numpy(
                gaussian_filter(delta, 0.4 * scale)).type_as(x)[None, None]
            x = F.conv2d(x, gf, stride=scale)
            x = x[:, :, 2:-2, 2:-2]
            return x.reshape(B, T, C, x.size(2), x.size(3))

        rng = np.random.default_rng(scale * 100 + H)
        xn = rng.normal(size=(1, 2, 3, H, W)).astype(np.float32)
        ref = torch_ref(torch.from_numpy(xn), scale).numpy()
        got = np.asarray(u.duf_downsample(
            jnp.asarray(xn.transpose(0, 1, 3, 4, 2).reshape(2, H, W, 3)),
            scale))
        assert ref.shape[-2:] == got.shape[1:3]
        np.testing.assert_allclose(
            ref.transpose(0, 1, 3, 4, 2).reshape(got.shape), got, atol=2e-6)
