"""Network factory (rebuild of ``codes/models/VideoSR_archs.py``).

``define_g(opt)`` / ``define_d(opt)`` / ``define_f(opt)`` dispatch on the
same YAML keys (``which_model_G`` / ``which_model_D``) and constructor
option names as the reference (VideoSR_archs.py:18-144), returning flax
modules.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp


def define_g(opt: dict, dtype: Any = jnp.float32):
    opt_net = opt["network_G"]
    which = opt_net["which_model_G"]

    if which in ("EDVR", "EDVR_NoUp"):
        from realvsr_tpu.models.edvr import EDVR, EDVRNoUp

        cls = EDVR if which == "EDVR" else EDVRNoUp
        return cls(
            nf=opt_net["nf"], nc=opt_net["nc"], nframes=opt_net["nframes"],
            groups=opt_net["groups"], front_RBs=opt_net["front_RBs"],
            back_RBs=opt_net["back_RBs"], center=opt_net["center"],
            predeblur=bool(opt_net["predeblur"]), HR_in=bool(opt_net["HR_in"]),
            w_TSA=bool(opt_net["w_TSA"]), dtype=dtype,
        )
    if which == "TDAN":
        from realvsr_tpu.models.tdan import TDAN

        return TDAN(nf=opt_net["nf"], channel=opt_net["nc"],
                    nframes=opt_net["nframes"], nb_f=opt_net["nb_f"],
                    nb_b=opt_net["nb_b"], groups=opt_net["groups"],
                    scale=opt["scale"], dtype=dtype)
    if which == "TOF":
        from realvsr_tpu.models.tof import TOF

        return TOF(nframes=opt_net["nframes"], K=opt_net["K"],
                   in_nc=opt_net["nc"], out_nc=opt_net["nc"],
                   nf=opt_net["nf"], nb=opt_net["nb"], upscale=opt["scale"],
                   dtype=dtype)
    if which == "FSTRN":
        from realvsr_tpu.models.fstrn import FSTRN

        return FSTRN(k=opt_net["k"], nf=opt_net["nf"], scale=opt["scale"],
                     nframes=opt_net["nframes"], dtype=dtype)
    if which == "RCAN":
        from realvsr_tpu.models.rcan import RCAN

        return RCAN(num_in_ch=opt_net["num_in_ch"],
                    num_out_ch=opt_net["num_out_ch"],
                    num_frames=opt_net["num_frames"],
                    num_feat=opt_net["num_feat"],
                    num_group=opt_net["num_group"],
                    num_block=opt_net["num_block"],
                    squeeze_factor=opt_net["squeeze_factor"],
                    upscale=opt["scale"], res_scale=opt_net["res_scale"],
                    dtype=dtype)
    raise NotImplementedError(f"Generator model [{which}] not recognized")


def define_d(opt: dict, dtype: Any = jnp.float32):
    opt_net = opt["network_D"]
    which = opt_net["which_model_D"]
    from realvsr_tpu.models import discriminators as D

    kw = dict(input_nc=opt_net["in_nc"], ndf=opt_net["nf"], dtype=dtype)
    ms_kw = dict(num_D=opt_net["num_D"], gan_type=opt_net["gan_type"], **kw)
    if which == "discriminator_vgg_192":
        from realvsr_tpu.models.vgg import DiscriminatorVGG192

        return DiscriminatorVGG192(in_nc=opt_net["in_nc"], nf=opt_net["nf"],
                                   dtype=dtype)
    if which == "discriminator_vgg_128":
        from realvsr_tpu.models.vgg import DiscriminatorVGG128

        return DiscriminatorVGG128(in_nc=opt_net["in_nc"], nf=opt_net["nf"],
                                   dtype=dtype)
    if which == "PatchDiscriminator":
        return D.PatchDiscriminator(**kw)
    if which == "PixelDiscriminator":
        return D.PixelDiscriminator(**kw)
    if which == "UNetDiscriminator":
        return D.UNetDiscriminator(in_nc=opt_net["in_nc"], nf=opt_net["nf"],
                                   dtype=dtype)
    if which == "MultiscaleDiscriminator_v1":
        return D.MultiscaleDiscriminatorV1(**ms_kw)
    if which == "MultiscaleDiscriminator_v2":
        return D.MultiscaleDiscriminatorV2(**ms_kw)
    if which == "MultiscaleDiscriminator_v3":
        return D.MultiscaleDiscriminatorV3(**ms_kw)
    if which == "MultiscaleDiscriminator_v4":
        return D.MultiscaleDiscriminatorV4(**ms_kw)
    if which == "LaplacePyramidDiscriminator":
        return D.LaplacePyramidDiscriminator(**ms_kw)
    if which == "GaussianPyramidDiscriminator":
        return D.GaussianPyramidDiscriminator(**ms_kw)
    if which == "ImageGradientPyramidDiscriminator_v1":
        return D.ImageGradientPyramidDiscriminatorV1(**ms_kw)
    if which == "ImageGradientPyramidDiscriminator_v2":
        return D.ImageGradientPyramidDiscriminatorV2(**ms_kw)
    raise NotImplementedError(f"Discriminator model [{which}] not recognized")


def define_f(opt: dict, use_bn: bool = False, dtype: Any = jnp.float32):
    """VGG19 feature extractor for perceptual loss (VideoSR_archs.py:133-144)."""
    from realvsr_tpu.models.vgg import VGGFeatureExtractor

    feature_layer = 49 if use_bn else 34
    return VGGFeatureExtractor(feature_layer=feature_layer, use_bn=use_bn,
                               use_input_norm=True, dtype=dtype)
