"""Architecture zoo: forward parity / param-count / shape tests vs reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from reference_loader import import_ref_package

import torch_dcn_oracle
from realvsr_tpu.models.fstrn import FSTRN
from realvsr_tpu.models.rcan import RCAN
from realvsr_tpu.models.srresnet import MSRResNet
from realvsr_tpu.models.tdan import TDAN
from realvsr_tpu.models.tof import TOF
from realvsr_tpu.train.torch_import import import_torch_state_dict


def nhwc5(x):  # torch (B,T,C,H,W) ← ours (B,T,H,W,C)
    return np.ascontiguousarray(np.transpose(x, (0, 1, 4, 2, 3)))


def params_count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def torch_count(m):
    return sum(p.numel() for p in m.parameters() if p.requires_grad)


class TestMSRResNet:
    @pytest.mark.parametrize("upscale", [1, 2, 4])
    def test_forward_parity(self, upscale):
        ref_mod = import_ref_package("models.archs.TOF_arch")
        torch.manual_seed(0)
        tm = ref_mod.MSRResNet(in_nc=9, out_nc=3, nf=16, nb=2,
                               upscale=upscale).eval()
        m = MSRResNet(in_nc=9, out_nc=3, nf=16, nb=2, upscale=upscale)
        rng = np.random.default_rng(0)
        x = rng.random((2, 16, 16, 9)).astype(np.float32)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        params = import_torch_state_dict(params, tm.state_dict(), strict=True)
        ours = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            ref = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                                   atol=2e-5)


@pytest.mark.slow
class TestTDAN:
    def test_param_count_and_shape(self):
        ref_dcn = import_ref_package("models.archs.dcn.deform_conv")
        torch_dcn_oracle.install(ref_dcn)
        ref_mod = import_ref_package("models.archs.TDAN_arch")
        tm = ref_mod.TDAN(channel=3, nf=64, nframes=3, nb_f=2, nb_b=2,
                          groups=4, scale=1)
        m = TDAN(channel=3, nf=64, nframes=3, nb_f=2, nb_b=2, groups=4,
                 scale=1)
        x = jnp.zeros((1, 3, 16, 16, 3))
        params = m.init(jax.random.PRNGKey(0), x)["params"]
        assert params_count(params) == torch_count(tm)
        out = m.apply({"params": params}, x)
        assert out.shape == (1, 16, 16, 3)

    def test_forward_parity(self):
        ref_dcn = import_ref_package("models.archs.dcn.deform_conv")
        torch_dcn_oracle.install(ref_dcn)
        ref_mod = import_ref_package("models.archs.TDAN_arch")
        ref_mod.DCN = ref_dcn.ModulatedDeformConvPack
        torch.manual_seed(1)
        tm = ref_mod.TDAN(channel=3, nf=64, nframes=3, nb_f=2, nb_b=2,
                          groups=4, scale=2).eval()
        m = TDAN(channel=3, nf=64, nframes=3, nb_f=2, nb_b=2, groups=4,
                 scale=2)
        rng = np.random.default_rng(1)
        x = rng.random((1, 3, 12, 12, 3)).astype(np.float32)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        params = import_torch_state_dict(
            params, tm.state_dict(), strict=True,
            key_map=[
                (r"trunk\.feature_extractor\.", "trunk.feature_extractor.0."),
                (r"trunk\.final_conv", "trunk.upsampler.1"),
                (r"trunk\.upsampler\.conv(\d+)", r"trunk.upsampler.0.\1"),
            ])
        ours = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            ref = tm(torch.from_numpy(nhwc5(x)))
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                                   atol=5e-5)


@pytest.mark.slow
class TestTOF:
    def test_shapes_and_counts(self):
        ref_mod = import_ref_package("models.archs.TOF_arch")
        tm = ref_mod.TOF(nframes=3, K=2, in_nc=3, out_nc=3, nf=16, nb=2,
                         upscale=1)
        m = TOF(nframes=3, K=2, in_nc=3, out_nc=3, nf=16, nb=2, upscale=1)
        x = jnp.zeros((1, 3, 16, 16, 3))
        variables = m.init(jax.random.PRNGKey(0), x)
        # BN running stats are torch buffers (not parameters) so counts match
        assert params_count(variables["params"]) == torch_count(tm)
        out = m.apply(variables, x)
        assert out.shape == (1, 16, 16, 3)

    def test_spynet_flow_shape(self):
        from realvsr_tpu.models.tof import SpyNet

        m = SpyNet(K=2)
        ref = jnp.zeros((2, 16, 16, 3))
        variables = m.init(jax.random.PRNGKey(0), ref, ref)
        warped, flow = m.apply(variables, ref, ref)
        assert warped.shape == (2, 16, 16, 3)
        assert flow.shape == (2, 16, 16, 2)


@pytest.mark.slow
class TestFSTRN:
    def test_forward_parity(self):
        ref_mod = import_ref_package("models.archs.FSTRN_arch")
        torch.manual_seed(2)
        tm = ref_mod.FSTRN(k=3, nf=8, scale=1, nframes=3).eval()
        m = FSTRN(k=3, nf=8, scale=1, nframes=3)
        rng = np.random.default_rng(2)
        x = rng.random((2, 3, 12, 12, 3)).astype(np.float32)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        params = self._import(params, tm.state_dict())
        ours = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            ref = tm(torch.from_numpy(nhwc5(x)))
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                                   atol=5e-5)

    @staticmethod
    def _import(params, sd):
        """FSTRN-specific import: Conv3d OIDHW→DHWIO, PReLU, ConvTranspose."""
        import jax.tree_util as jtu

        def fill(path, leaf):
            names = [p.key for p in path]
            tk = ".".join(n for n in names[:-1] if not n.startswith("Conv"))
            leafname = path[-1].key
            if leafname == "alpha":
                t = sd[tk + ".weight" if tk else "prelu.weight"]
                return jnp.asarray(t.numpy())
            torch_key = (tk + "." if tk else "") + (
                "weight" if leafname == "kernel" else leafname)
            t = sd[torch_key].numpy()
            if t.ndim == 5:
                if "upsample" in torch_key:
                    # torch ConvTranspose3d (in, out, kT, kH, kW) → flax
                    # ConvTranspose kernel (kT, kH, kW, in, out)
                    t = t.transpose(2, 3, 4, 0, 1)
                else:
                    t = t.transpose(2, 3, 4, 1, 0)  # OIDHW → DHWIO
            return jnp.asarray(t.astype(np.float32))

        return jtu.tree_map_with_path(fill, params)


class TestRCAN:
    def test_forward_parity(self):
        ref_mod = import_ref_package("models.archs.RCAN_arch")
        torch.manual_seed(3)
        tm = ref_mod.RCAN(num_in_ch=3, num_out_ch=3, num_frames=3,
                          num_feat=16, num_group=2, num_block=2,
                          squeeze_factor=4, upscale=1, res_scale=1).eval()
        m = RCAN(num_in_ch=3, num_out_ch=3, num_frames=3, num_feat=16,
                 num_group=2, num_block=2, squeeze_factor=4, upscale=1,
                 res_scale=1)
        rng = np.random.default_rng(3)
        x = rng.random((2, 3, 12, 12, 3)).astype(np.float32)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        params = self._import(params, tm.state_dict())
        ours = np.asarray(m.apply({"params": params}, jnp.asarray(x)))
        with torch.no_grad():
            ref = tm(torch.from_numpy(nhwc5(x)))
        np.testing.assert_allclose(ours, ref.numpy().transpose(0, 2, 3, 1),
                                   atol=5e-5)

    @staticmethod
    def _import(params, sd):
        import jax.tree_util as jtu
        import re

        def fill(path, leaf):
            names = [p.key for p in path]
            s = "/".join(n for n in names[:-1]
                         if not re.fullmatch(r"Conv_\d+|Dense_\d+", n))
            # ordered substitutions: flax module names → torch Sequential idx
            s = s.replace("attention/conv1", "rcab/3/attention/1")
            s = s.replace("attention/conv2", "rcab/3/attention/3")
            s = re.sub(r"/conv1$", "/rcab/0", s)
            s = re.sub(r"/conv2$", "/rcab/2", s)
            s = re.sub(r"block(\d+)", r"\1", s)
            s = s.replace("upsample_conv0", "upsample/0")
            tk = s.replace("/", ".")
            leafname = "weight" if names[-1] == "kernel" else names[-1]
            t = sd[tk + "." + leafname].numpy()
            if t.ndim == 4:
                t = t.transpose(2, 3, 1, 0)
            return jnp.asarray(t.astype(np.float32))

        return jtu.tree_map_with_path(fill, params)
