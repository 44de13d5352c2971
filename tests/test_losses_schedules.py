"""Losses and LR schedules vs. the reference implementations."""
import numpy as np
import pytest
import torch

from reference_loader import import_ref_package

from realvsr_tpu import losses
from realvsr_tpu.ops import metrics
from realvsr_tpu import schedules


def nhwc(x_nchw):
    return np.transpose(x_nchw, (0, 2, 3, 1))


@pytest.fixture(scope="module")
def ref_loss():
    return import_ref_package("models.loss")


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(0)
    x = rng.random((2, 3, 32, 32)).astype(np.float32)
    y = rng.random((2, 3, 32, 32)).astype(np.float32)
    return x, y


class TestLosses:
    def test_charbonnier(self, ref_loss, pair):
        x, y = pair
        ref = ref_loss.CharbonnierLoss()(torch.from_numpy(x), torch.from_numpy(y))
        ours = losses.charbonnier_loss(nhwc(x), nhwc(y))
        assert abs(float(ref) - float(ours)) < 1e-6

    def test_huber(self, ref_loss, pair):
        x, y = pair
        ref = ref_loss.HuberLoss()(torch.from_numpy(x), torch.from_numpy(y))
        ours = losses.huber_loss(nhwc(x), nhwc(y))
        assert abs(float(ref) - float(ours)) < 1e-6

    def test_gw(self, ref_loss, pair):
        x, y = pair
        ref = ref_loss.GWLoss(w=4)(torch.from_numpy(x), torch.from_numpy(y))
        ours = losses.gw_loss(nhwc(x), nhwc(y), w=4.0)
        assert abs(float(ref) - float(ours)) < 1e-5

    def test_tv(self, ref_loss, pair):
        x, _ = pair
        ref = ref_loss.TVLoss()(torch.from_numpy(x))
        ours = losses.tv_loss(nhwc(x))
        assert abs(float(ref) - float(ours)) / max(abs(float(ref)), 1) < 1e-6

    @pytest.mark.parametrize("pyr_mode,loss_mode", [("gau", "cb"), ("lap", "l1")])
    def test_pyramid_loss(self, ref_loss, pair, pyr_mode, loss_mode):
        x, y = pair
        ref = ref_loss.PyramidLoss(num_levels=3, pyr_mode=pyr_mode,
                                   loss_mode=loss_mode)(
            torch.from_numpy(x), torch.from_numpy(y))
        ours = losses.pyramid_loss(nhwc(x), nhwc(y), num_levels=3,
                                   pyr_mode=pyr_mode, loss_mode=loss_mode)
        assert abs(float(ref) - float(ours)) < 1e-5

    def test_lappyr_loss_cb_modes(self, ref_loss, pair):
        """lf=cb avoids the stubbed IQA SSIM in the reference module."""
        x, y = pair
        ref = ref_loss.LapPyrLoss(num_levels=3, lf_mode="cb", hf_mode="cb")(
            torch.from_numpy(x), torch.from_numpy(y))
        ours = losses.lap_pyr_loss(nhwc(x), nhwc(y), num_levels=3,
                                   lf_mode="cb", hf_mode="cb")
        assert abs(float(ref) - float(ours)) < 1e-5

    def test_ssim_loss_consistency(self):
        """losses.ssim (unit range, IQA-style) vs MATLAB ssim at 255 range;
        on >11px images with f=1 these agree (same window, valid conv)."""
        rng = np.random.default_rng(3)
        x = rng.random((1, 64, 64, 1)).astype(np.float64)
        y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1)
        ours = 1.0 - float(losses.ssim_loss(x, y))
        ref = metrics.calculate_ssim_np(x[0] * 255.0, y[0] * 255.0)
        assert abs(ours - ref) < 1e-6

    def test_gan_loss_matches_reference(self, ref_loss):
        rng = np.random.default_rng(4)
        logits = rng.normal(size=(4, 1, 8, 8)).astype(np.float32)
        for gt in ["gan", "lsgan", "wgan-gp"]:
            crit = ref_loss.GANLoss(gt)
            for real in [True, False]:
                ref = crit(torch.from_numpy(logits), real)
                ours = losses.gan_loss(nhwc(logits), real, gan_type=gt)
                assert abs(float(ref) - float(ours)) < 1e-6, (gt, real)


class TestSchedules:
    def _simulate_torch(self, sched_cls, kwargs, niter, lr):
        opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(3))], lr=lr)
        sched = sched_cls(opt, **kwargs)
        lrs = []
        for _ in range(niter):
            sched.step()
            lrs.append(opt.param_groups[0]["lr"])
        return np.array(lrs)

    def test_cosine_restart_matches_reference(self):
        ref_sched = import_ref_package("models.lr_scheduler")
        base_lr = 2e-4
        kwargs = dict(T_period=[50, 50, 50, 50], restarts=[50, 100, 150],
                      weights=[1, 0.5, 0.5], eta_min=1e-7)
        ref = self._simulate_torch(ref_sched.CosineAnnealingLR_Restart,
                                   kwargs, 200, base_lr)
        fn = schedules.cosine_annealing_restart(
            base_lr, kwargs["T_period"], kwargs["restarts"],
            kwargs["weights"], kwargs["eta_min"])
        ours = np.array([float(fn(t)) for t in range(1, 201)])
        np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=1e-9)

    def test_multistep_restart_matches_reference(self):
        ref_sched = import_ref_package("models.lr_scheduler")
        base_lr = 2e-4
        kwargs = dict(milestones=[30, 60, 90, 130, 160],
                      restarts=[100], weights=[0.5], gamma=0.5)
        ref = self._simulate_torch(ref_sched.MultiStepLR_Restart, kwargs,
                                   200, base_lr)
        fn = schedules.multistep_restart(base_lr, kwargs["milestones"],
                                         kwargs["restarts"], kwargs["weights"],
                                         kwargs["gamma"])
        ours = np.array([float(fn(t)) for t in range(1, 201)])
        np.testing.assert_allclose(ours, ref, rtol=1e-6)

    def test_warmup(self):
        fn = schedules.with_warmup(lambda s: 1e-4, 1e-4, warmup_iter=10)
        assert abs(float(fn(5)) - 5e-5) < 1e-9
        assert abs(float(fn(15)) - 1e-4) < 1e-9

    def test_build_from_config(self):
        cfg = dict(lr_G=1e-4, lr_scheme="CosineAnnealingLR_Restart",
                   niter=150000, warmup_iter=-1,
                   T_period=[150000, 150000, 150000, 150000],
                   restarts=[150000, 300000, 450000],
                   restart_weights=[1, 1, 1], eta_min=1e-7)
        fn = schedules.build_lr_schedule(cfg)
        assert abs(float(fn(1)) - 1e-4) < 2e-6
        assert float(fn(150000)) < 2e-7
