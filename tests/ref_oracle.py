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


def _stub_lightning():
    """Minimal pytorch_lightning stand-in so the reference's LightningModule
    task files import and can be *manually* stepped (no Trainer).  The stub
    implements exactly what training_step touches: optimizers()/
    lr_schedulers() (returning objects injected by the test), manual_backward
    -> loss.backward, log -> no-op, global_step -> counter attribute."""
    if "pytorch_lightning" in sys.modules:
        return
    import torch.nn as nn

    pl = types.ModuleType("pytorch_lightning")

    class LightningModule(nn.Module):
        def __init__(self):
            super().__init__()
            self.global_step = 0
            self._optimizers = []
            self._lr_schedulers = []

        # -- test harness hooks ------------------------------------------
        def attach_optimizers(self, opts, scheds):
            self._optimizers = opts
            self._lr_schedulers = scheds

        # -- Lightning API used by the reference tasks -------------------
        def optimizers(self):
            o = self._optimizers
            return o[0] if len(o) == 1 else o

        def lr_schedulers(self):
            s = self._lr_schedulers
            return s[0] if len(s) == 1 else s

        def manual_backward(self, loss, *a, **k):
            loss.backward(*a, **k)

        def log(self, *a, **k):
            pass

        @property
        def device(self):
            try:
                return next(self.parameters()).device
            except StopIteration:
                import torch
                return torch.device("cpu")

    pl.LightningModule = LightningModule
    pl.LightningDataModule = type("LightningDataModule", (), {})
    pl.Trainer = type("Trainer", (), {})
    pl.Callback = type("Callback", (), {})

    cli = types.ModuleType("pytorch_lightning.utilities.cli")

    class _Registry:
        def __call__(self, cls=None, **k):
            return cls if cls is not None else (lambda c: c)

    def instantiate_class(args, init):
        """Real jsonargparse-style instantiation (class_path/init_args)."""
        if not isinstance(args, tuple):
            args = (args,)
        kwargs = init.get("init_args", {})
        module, name = init["class_path"].rsplit(".", 1)
        if module == "helpers.lr_scheduler":
            cls = getattr(load_ref_module("helpers.lr_scheduler"), name)
        else:
            import importlib
            cls = getattr(importlib.import_module(module), name)
        return cls(*args, **kwargs)

    cli.MODEL_REGISTRY = _Registry()
    cli.DATAMODULE_REGISTRY = _Registry()
    cli.CALLBACK_REGISTRY = _Registry()
    cli.LR_SCHEDULER_REGISTRY = _Registry()
    cli.instantiate_class = instantiate_class
    utilities = types.ModuleType("pytorch_lightning.utilities")
    utilities.cli = cli
    pl.utilities = utilities
    sys.modules["pytorch_lightning"] = pl
    sys.modules["pytorch_lightning.utilities"] = utilities
    sys.modules["pytorch_lightning.utilities.cli"] = cli


def _stub_kornia():
    """kornia is only touched inside the color-jitter/blur branches, which
    trajectory tests disable; an empty shell satisfies the import."""
    if "kornia" in sys.modules:
        return
    k = types.ModuleType("kornia")
    k.augmentation = types.ModuleType("kornia.augmentation")
    k.filters = types.ModuleType("kornia.filters")
    sys.modules["kornia"] = k


def _stub_helpers_metrics():
    """helpers.metrics imports torchmetrics (absent); the UDA module only
    needs MyMetricCollection for (empty) metric dicts in these tests."""
    if "helpers.metrics" in sys.modules:
        return
    _ensure_pkg("helpers", f"{REF_ROOT}/helpers")
    m = types.ModuleType("helpers.metrics")

    class MyMetricCollection(dict):
        def __init__(self, metrics):
            super().__init__(metrics)

    m.MyMetricCollection = MyMetricCollection
    sys.modules["helpers.metrics"] = m


def load_ref_uda_model_module():
    """Load the reference's full DomainAdaptationSegmentationModel module
    (models/segmentation_model.py) for manual stepping."""
    _stub_lightning()
    _stub_kornia()
    _stub_helpers_metrics()
    return load_ref_module("models.segmentation_model")


def load_ref_alignment_model_module():
    """Load the reference's AlignmentModel module
    (models/alignment_model.py) for manual stepping."""
    _stub_lightning()
    _stub_kornia()
    _stub_helpers_metrics()
    return load_ref_module("models.alignment_model")


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
