"""NIQE MATLAB-model loading + BRISQUE feature/SVR tests."""
import numpy as np
import pytest

from realvsr_tpu.eval import brisque as B
from realvsr_tpu.eval import niqe as N

REF_MODEL = ("/root/reference/codes/metrics/models/"
             "niqe_model_realvsr_all.mat")


def _natural_ish(seed, hw=192):
    """Smooth random field + texture — a natural-image stand-in."""
    rng = np.random.default_rng(seed)
    base = rng.random((hw // 8, hw // 8))
    import cv2

    img = cv2.resize(base, (hw, hw), interpolation=cv2.INTER_CUBIC)
    img = img * 200 + rng.normal(0, 4, (hw, hw))
    return np.clip(img, 0, 255)


class TestMatlabNiqeModel:
    @pytest.mark.skipif(not __import__("os").path.exists(REF_MODEL),
                        reason="reference model unavailable")
    def test_load_reference_fitted_model(self):
        model = N.load_matlab_niqe_model(REF_MODEL)
        assert model["mu"].shape == (36,)
        assert model["cov"].shape == (36, 36)
        assert int(model["block_size"]) == 96
        # MSCN alpha of natural images sits near 2-3 — sanity of the
        # heuristically extracted mean vector
        assert 1.0 < model["mu"][0] < 5.0
        # covariance symmetric positive semi-definite
        np.testing.assert_allclose(model["cov"], model["cov"].T, atol=1e-12)
        assert np.linalg.eigvalsh(model["cov"]).min() > -1e-8

    @pytest.mark.skipif(not __import__("os").path.exists(REF_MODEL),
                        reason="reference model unavailable")
    def test_score_with_matlab_model(self):
        model = N.load_matlab_niqe_model(REF_MODEL)
        img = _natural_ish(0)
        s_clean = N.niqe_score(img, model)
        noisy = np.clip(img + np.random.default_rng(1).normal(
            0, 40, img.shape), 0, 255)
        s_noisy = N.niqe_score(noisy, model)
        assert np.isfinite(s_clean) and np.isfinite(s_noisy)
        assert s_noisy > s_clean  # heavy noise reads as less natural


class TestBrisque:
    def test_feature_vector(self):
        f = B.brisque_features(_natural_ish(2))
        assert f.shape == (36,)
        assert np.all(np.isfinite(f))
        assert 0.2 <= f[0] <= 10  # MSCN GGD alpha in table range

    def test_fit_and_score_orders_distortion(self):
        rng = np.random.default_rng(3)
        imgs, scores = [], []
        for i in range(14):
            img = _natural_ish(10 + i)
            sigma = rng.uniform(0, 60)
            img = np.clip(img + rng.normal(0, sigma, img.shape), 0, 255)
            imgs.append(img)
            scores.append(sigma)  # higher = worse, like DMOS
        model = B.fit_brisque_model(imgs, scores)
        clean = _natural_ish(99)
        dirty = np.clip(clean + rng.normal(0, 55, clean.shape), 0, 255)
        assert B.brisque_score(dirty, model) > B.brisque_score(clean, model)

    def test_libsvm_roundtrip(self, tmp_path):
        """A hand-written libsvm model file scores identically to the
        direct kernel-sum computation."""
        rng = np.random.default_rng(4)
        sv = rng.random((3, 36))
        coef = rng.normal(0, 1, 3)
        gamma, rho = 0.05, -0.3
        mp = tmp_path / "allmodel"
        lines = ["svm_type epsilon_svr", "kernel_type rbf", f"gamma {gamma}",
                 "nr_class 2", "total_sv 3", f"rho {rho}", "SV"]
        for c, v in zip(coef, sv):
            lines.append(" ".join([f"{c:.8f}"] + [
                f"{j + 1}:{v[j]:.8f}" for j in range(36)]))
        mp.write_text("\n".join(lines) + "\n")
        rp = tmp_path / "allrange"
        rtxt = ["# feature range", "-1 1"]
        lo = np.full(36, -1.0)
        hi = np.full(36, 3.0)
        for j in range(36):
            rtxt.append(f"{j + 1} {lo[j]} {hi[j]}")
        rp.write_text("\n".join(rtxt) + "\n")

        model = B.load_libsvm_model(str(mp), str(rp))
        np.testing.assert_allclose(model["sv"], sv, atol=1e-7)
        img = _natural_ish(5)
        f = B.brisque_features(img)
        fs = -1 + 2 * (f - lo) / (hi - lo)
        kern = np.exp(-gamma * np.sum((sv - fs[None]) ** 2, axis=1))
        expect = float(coef @ kern - rho)
        np.testing.assert_allclose(B.brisque_score(img, model), expect,
                                   rtol=1e-6)
