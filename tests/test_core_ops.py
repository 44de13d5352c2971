"""Golden-parity tests for core numerics vs. the reference implementation."""
import numpy as np
import pytest
import torch

from reference_loader import load_ref_module

from realvsr_tpu.ops import color, metrics, pyramid, resize
from realvsr_tpu.utils.indexing import index_generation

ref_du = load_ref_module("data/util.py", "ref_data_util")


def rand_img(h=24, w=20, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return rng.random((h, w, c)).astype(np.float32)


class TestColor:
    def test_rgb2ycbcr_float(self):
        img = rand_img()
        ref = ref_du.rgb2ycbcr(img.copy(), only_y=False)
        ours = np.asarray(color.rgb2ycbcr(img))
        np.testing.assert_allclose(ours, ref, atol=1e-5)
        ours_np = color.rgb2ycbcr_np(img)
        np.testing.assert_allclose(ours_np, ref, atol=1e-5)

    def test_rgb2ycbcr_only_y(self):
        img = rand_img(seed=1)
        ref = ref_du.rgb2ycbcr(img.copy(), only_y=True)
        ours = np.asarray(color.rgb2ycbcr(img, only_y=True))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_bgr2ycbcr(self):
        img = rand_img(seed=2)
        ref = ref_du.bgr2ycbcr(img.copy(), only_y=False)
        ours = np.asarray(color.bgr2ycbcr(img))
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_ycbcr2rgb(self):
        img = rand_img(seed=3) * 0.7 + 0.15
        ref = ref_du.ycbcr2rgb(img.copy())
        ours = np.asarray(color.ycbcr2rgb(img))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_ycbcr2bgr(self):
        img = rand_img(seed=4) * 0.7 + 0.15
        ref = ref_du.ycbcr2bgr(img.copy())
        ours = np.asarray(color.ycbcr2bgr(img))
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_roundtrip(self):
        img = rand_img(seed=5) * 0.6 + 0.2
        back = np.asarray(color.ycbcr2rgb(color.rgb2ycbcr(img)))
        np.testing.assert_allclose(back, img, atol=1e-3)


class TestImresize:
    @pytest.mark.parametrize("scale", [0.5, 0.25, 2.0, 1.5])
    def test_matlab_imresize_matches_reference(self, scale):
        img = rand_img(32, 28, seed=6)
        ref = ref_du.imresize_np(img.astype(np.float64), scale, antialiasing=True)
        ours = resize.matlab_imresize_np(img.astype(np.float64), scale)
        np.testing.assert_allclose(ours, ref, atol=1e-5)
        ours_j = np.asarray(resize.matlab_imresize(img[None], scale))[0]
        np.testing.assert_allclose(ours_j, ref, atol=1e-4)

    def test_bilinear_matches_torch(self):
        import torch.nn.functional as F

        img = rand_img(16, 12, 4, seed=7)
        t = torch.from_numpy(img).permute(2, 0, 1)[None]
        ref = F.interpolate(t, scale_factor=2, mode="bilinear", align_corners=False)
        ref = ref[0].permute(1, 2, 0).numpy()
        ours = np.asarray(resize.upsample2x_bilinear(img[None]))[0]
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_pixel_shuffle_matches_torch(self):
        rng = np.random.default_rng(8)
        x = rng.random((2, 5, 6, 16)).astype(np.float32)
        t = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.pixel_shuffle(t, 2).permute(0, 2, 3, 1).numpy()
        ours = np.asarray(resize.pixel_shuffle(x, 2))
        np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestPyramid:
    def _ref_pyr(self, x_nchw, fn_name, levels):
        ref_util = load_ref_module("utils/util.py", "ref_utils_util")
        t = torch.from_numpy(x_nchw)
        kernel = ref_util.gauss_kernel(size=5, device=torch.device("cpu"),
                                       channels=x_nchw.shape[1])
        fn = getattr(ref_util, fn_name)
        return [p.numpy() for p in fn(t, kernel, max_levels=levels)]

    @pytest.mark.parametrize("fn", ["lap_pyramid", "gau_pyramid", "laplacian_pyramid"])
    def test_pyramids_match_reference(self, fn):
        rng = np.random.default_rng(9)
        x = rng.random((2, 3, 32, 32)).astype(np.float32)
        refs = self._ref_pyr(x, fn, 3)
        x_nhwc = np.transpose(x, (0, 2, 3, 1))
        ours = getattr(pyramid, fn)(x_nhwc, max_levels=3)
        assert len(ours) == len(refs)
        for o, r in zip(ours, refs):
            np.testing.assert_allclose(
                np.transpose(np.asarray(o), (0, 3, 1, 2)), r, atol=1e-5
            )


class TestMetrics:
    def test_psnr(self):
        rng = np.random.default_rng(10)
        a = rng.random((32, 32)) * 255
        b = a + rng.normal(0, 5, a.shape)
        ref = metrics.calculate_psnr_np(a, b)
        ours = float(metrics.psnr(a, b))
        assert abs(ref - ours) < 1e-3

    def test_ssim_np_vs_jnp(self):
        rng = np.random.default_rng(11)
        a = rng.random((48, 48)) * 255
        b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255)
        ref = metrics.calculate_ssim_np(a, b)
        ours = float(metrics.ssim(a, b))
        assert abs(ref - ours) < 1e-4

    def test_ssim_matches_reference_cv2(self):
        ref_util = load_ref_module("utils/util.py", "ref_utils_util")
        rng = np.random.default_rng(12)
        a = (rng.random((64, 64)) * 255).astype(np.float64)
        b = np.clip(a + rng.normal(0, 8, a.shape), 0, 255)
        ref = ref_util.calculate_ssim(a, b)
        ours = metrics.calculate_ssim_np(a, b)
        assert abs(ref - ours) < 1e-6


class TestIndexing:
    def test_index_generation_matches_reference(self):
        for pad in ["replicate", "reflection", "new_info", "circle"]:
            for crt in range(0, 10):
                ref = ref_du.index_generation(crt, 10, 5, padding=pad)
                ours = index_generation(crt, 10, 5, padding=pad)
                assert ref == ours, (pad, crt)
