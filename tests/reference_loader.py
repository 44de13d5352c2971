"""Import reference modules from /root/reference for golden-value tests.

The reference is used ONLY as a test oracle (its outputs are compared
against ours); none of its code ships in the framework.  Missing optional
deps (ffmpeg, torchvision, accimage, lmdb, IQA_pytorch, kornia) are stubbed.
"""
import importlib.util
import sys
import types

REF_ROOT = "/root/reference/codes"


def _stub(name, attrs=()):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)
    for a in attrs:
        setattr(mod, a, object)
    sys.modules[name] = mod


def _ensure_stubs():
    _stub("ffmpeg")
    _stub("lmdb")
    _stub("accimage")
    _stub("kornia")
    # torchvision.utils.make_grid
    tv = types.ModuleType("torchvision")
    tvu = types.ModuleType("torchvision.utils")
    tvu.make_grid = lambda *a, **k: None
    tv.utils = tvu
    sys.modules.setdefault("torchvision", tv)
    sys.modules.setdefault("torchvision.utils", tvu)
    # IQA_pytorch.{SSIM, MS_SSIM}
    iqa = types.ModuleType("IQA_pytorch")
    iqa.SSIM = object
    iqa.MS_SSIM = object
    sys.modules.setdefault("IQA_pytorch", iqa)


def import_ref_package(modname: str):
    """Import a reference module by package path, e.g.
    'models.archs.EDVR_arch' (relative imports inside it then resolve)."""
    import importlib

    _ensure_stubs()
    _stub("models.archs.dcn.deform_conv_cuda")
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    return importlib.import_module(modname)


def load_ref_module(relpath: str, name: str):
    """Load e.g. load_ref_module('data/util.py', 'ref_data_util')."""
    _ensure_stubs()
    if name in sys.modules:
        return sys.modules[name]
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    spec = importlib.util.spec_from_file_location(name, f"{REF_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
