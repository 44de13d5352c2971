"""Discriminator zoo + VGG: shape smoke tests and multiscale list outputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from realvsr_tpu.models import discriminators as D
from realvsr_tpu.models.vgg import (DiscriminatorVGG128, VGGFeatureExtractor)
from realvsr_tpu.ops.pyramid import laplacian_pyramid


def init_apply(model, *args, **kwargs):
    variables = model.init(jax.random.PRNGKey(0), *args, **kwargs)
    return model.apply(variables, *args, **kwargs)


@pytest.mark.slow
class TestSingle:
    def test_patch_discriminator_shapes(self):
        x = jnp.zeros((2, 32, 32, 3))
        out = init_apply(D.PatchDiscriminator(input_nc=3, ndf=8, n_block=2), x)
        assert out.shape == (2, 8, 8, 1)  # two stride-2 blocks

    def test_pixel_discriminator_shapes(self):
        x = jnp.zeros((2, 16, 16, 3))
        out = init_apply(D.PixelDiscriminator(input_nc=3, ndf=8, n_block=2), x)
        assert out.shape == (2, 16, 16, 1)

    def test_unet_discriminator(self):
        x = jnp.zeros((1, 32, 32, 3))
        out = init_apply(D.UNetDiscriminator(in_nc=3, nf=8), x)
        assert out.shape == (1, 32, 32, 1)

    def test_vgg_discriminator_128(self):
        x = jnp.zeros((2, 128, 128, 3))
        out = init_apply(DiscriminatorVGG128(in_nc=3, nf=8), x)
        assert out.shape == (2, 1)


@pytest.mark.slow
class TestMultiscale:
    def test_v1_v2_single_input(self):
        x = jnp.zeros((1, 32, 32, 3))
        outs = init_apply(
            D.MultiscaleDiscriminatorV1(input_nc=3, ndf=8, num_D=2, n_block=3), x)
        assert len(outs) == 2
        outs = init_apply(
            D.MultiscaleDiscriminatorV2(input_nc=3, ndf=8, num_D=2), x)
        assert len(outs) == 2
        # v2 downsamples between Ds
        assert outs[0].shape[1] != outs[1].shape[1]

    def test_v3_v4_pyramid_list_input(self):
        pyr = [jnp.zeros((1, 32, 32, 3)), jnp.zeros((1, 16, 16, 3))]
        outs = init_apply(
            D.MultiscaleDiscriminatorV3(input_nc=3, ndf=8, num_D=2, n_block=2),
            pyr)
        assert len(outs) == 2
        outs = init_apply(
            D.MultiscaleDiscriminatorV4(input_nc=3, ndf=8, num_D=2), pyr)
        assert len(outs) == 2

    def test_pyramid_discriminators(self):
        x = jnp.zeros((1, 32, 32, 3))
        for cls in [D.LaplacePyramidDiscriminator,
                    D.GaussianPyramidDiscriminator,
                    D.ImageGradientPyramidDiscriminatorV1]:
            outs = init_apply(cls(input_nc=3, ndf=8, num_D=2), x)
            assert len(outs) == 2, cls

    def test_image_gradient_v2_takes_two_pyramids(self):
        from realvsr_tpu.ops.pyramid import gau_pyramid

        x = jnp.ones((1, 32, 32, 3))
        gau = gau_pyramid(x, max_levels=2)
        lap = laplacian_pyramid(x, max_levels=2)
        outs = init_apply(
            D.ImageGradientPyramidDiscriminatorV2(input_nc=3, ndf=8, num_D=2),
            gau, lap)
        assert len(outs) == 2


@pytest.mark.slow
class TestVGGFeature:
    def test_feature_shape(self):
        # feature_layer 34 = conv5_4 output (pre-ReLU): 512 ch at /16
        m = VGGFeatureExtractor(feature_layer=34)
        x = jnp.ones((1, 64, 64, 3)) * 0.5
        variables = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(variables, x)
        assert out.shape == (1, 4, 4, 512)
