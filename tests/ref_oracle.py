"""Load individual reference PyTorch modules as numerics oracles.

The reference package's __init__ imports pytorch_lightning (absent here), so
we materialize a synthetic package pointing at /root/reference/models and load
only the dependency-light nn.Module files (mix_transformer, modules, heads).
Reference code is used strictly as a black-box oracle in tests — never
imported into the framework itself.
"""
import importlib.util
import sys
import types

REF_ROOT = "/root/reference"


def _ensure_pkg(name, path):
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    pkg.__package__ = name
    sys.modules[name] = pkg
    return pkg


def _stub_torchvision():
    """Minimal torchvision stand-in (not installed here) so the reference's
    transforms module imports; only Compose/CenterCrop symbols are touched
    at import time."""
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")

    class _Compose:
        def __init__(self, transforms):
            self.transforms = transforms

        def __call__(self, x):
            for t in self.transforms:
                x = t(x)
            return x

    class _CenterCrop:
        def __init__(self, size=None):
            self.size = size

    class _Configurable:
        def __init__(self, *a, **k):
            self.args, self.kwargs = a, k

    tvt.Compose = _Compose
    tvt.CenterCrop = _CenterCrop
    for name in ("ColorJitter", "ConvertImageDtype", "GaussianBlur",
                 "Normalize", "RandomRotation"):
        setattr(tvt, name, type(name, (_Configurable,), {}))
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvf.hflip = lambda x: x
    tvf.pil_to_tensor = lambda x: x
    tvf.rotate = lambda x, *a, **k: x
    tvt.functional = tvf
    tv.transforms = tvt
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tvt
    sys.modules["torchvision.transforms.functional"] = tvf


def load_ref_module(dotted: str):
    """dotted e.g. 'models.backbones.mix_transformer' relative to REF_ROOT."""
    _ensure_pkg("models", f"{REF_ROOT}/models")
    _ensure_pkg("models.backbones", f"{REF_ROOT}/models/backbones")
    _ensure_pkg("models.heads", f"{REF_ROOT}/models/heads")
    _ensure_pkg("helpers", f"{REF_ROOT}/helpers")
    _ensure_pkg("data_modules", f"{REF_ROOT}/data_modules")
    if dotted.startswith("data_modules"):
        _stub_torchvision()
    full = dotted
    if full in sys.modules:
        return sys.modules[full]
    path = REF_ROOT + "/" + dotted.replace(".", "/") + ".py"
    spec = importlib.util.spec_from_file_location(full, path)
    mod = importlib.util.module_from_spec(spec)
    mod.__package__ = full.rsplit(".", 1)[0]
    sys.modules[full] = mod
    spec.loader.exec_module(mod)
    return mod
