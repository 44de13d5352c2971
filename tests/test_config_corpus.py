"""Reference-YAML compatibility corpus test.

Every training config shipped by the reference
(/root/reference/codes/options/train/*.yml) must parse through the repo's
config system and build its generator (and discriminator, when present)
unmodified — the PARITY.md §2.6 claim, encoded so it can't regress.
The repo's own configs/train/*.yml are held to the same bar, plus a
train-step dispatch check.
"""
import glob
import os

import pytest

from realvsr_tpu.core.config import parse
from realvsr_tpu.models import define_d, define_g

REF_CFG_DIR = "/root/reference/codes/options/train"
REPO_CFG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs", "train")

ref_cfgs = sorted(glob.glob(os.path.join(REF_CFG_DIR, "*.yml")))
repo_cfgs = sorted(glob.glob(os.path.join(REPO_CFG_DIR, "*.yml")))


def _build(path):
    opt = parse(path, is_train=True, root="/tmp/corpus_test")
    model = define_g(opt)
    assert model is not None
    if opt.get("network_D"):
        disc = define_d(opt)
        assert disc is not None
    return opt


@pytest.mark.parametrize("cfg", ref_cfgs, ids=[os.path.basename(c) for c in ref_cfgs])
def test_reference_train_yaml_builds(cfg):
    if "TOF-GAN" in cfg:
        # the reference file itself is malformed YAML (a stray leading
        # space before network_D:) — the repaired port ships in
        # configs/train/train_TOF-GAN_RealVSR_YCbCr_Split.yml
        pytest.xfail("malformed YAML in the reference itself")
    _build(cfg)


@pytest.mark.skipif(not ref_cfgs, reason="reference not available")
def test_reference_corpus_is_complete():
    assert len(ref_cfgs) == 17


@pytest.mark.parametrize("cfg", repo_cfgs, ids=[os.path.basename(c) for c in repo_cfgs])
def test_repo_train_yaml_builds_and_dispatches(cfg):
    from realvsr_tpu.train.wrappers import make_train_step

    opt = _build(cfg)
    kwargs = {}
    if opt["model"] in ("VideoSR_AllPair", "VideoSR_AllPair_YCbCr_Combine"):
        # feature extractor only needed when feature_weight > 0
        if opt["train"].get("feature_weight"):
            kwargs["feature_apply"] = lambda x: x
    step = make_train_step(define_g(opt), opt, **kwargs)
    assert callable(step)


def test_repo_ships_every_reference_config():
    """Every reference train config has a same-named repo port."""
    repo_names = {os.path.basename(c) for c in repo_cfgs}
    missing = [os.path.basename(c) for c in ref_cfgs
               if os.path.basename(c) not in repo_names]
    assert not missing, f"missing ports: {missing}"


def test_edvr_vimeo_port_is_faithful():
    """The EDVR Vimeo90K port must match the reference's geometry — it
    previously drifted to a scale-2/TSA/7-frame variant (now shipped
    separately as train_EDVRx4_TSA_Vimeo90K.yml, an explicit extension)."""
    opt = parse(os.path.join(REPO_CFG_DIR, "train_EDVR_woTSA_Vimeo90K.yml"),
                is_train=True, root="/tmp/corpus_test")
    assert opt["scale"] == 1
    assert opt["network_G"]["which_model_G"] == "EDVR_NoUp"
    assert not opt["network_G"]["w_TSA"]
    assert opt["network_G"]["nframes"] == 3
    assert opt["model"] == "VideoSR_AllPair"
    assert opt["train"]["pixel_criterion"] == "cb"
