"""YAML config system: reference-compatible class_path/init_args configs.

Parses the same YAML schema as the reference's LightningCLI setup
(helpers/cli.py:10-21, tools/run.py:1-9): ``model:``, ``data:``,
``optimizer:``, ``lr_scheduler:``, ``trainer:`` sections with recursive
``class_path``/``init_args`` instantiation.  Reference class paths
(``models.backbones.MixVisionTransformer`` etc.) are mapped onto the
TPU-native modules so the reference's configs under configs/ work with
minimal edits.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import yaml


def load_yaml(path: str) -> Dict[str, Any]:
    with open(path) as f:
        return yaml.safe_load(f)


def precision_dtype(precision) -> str:
    """reference --trainer.precision {16,32} -> compute dtype
    (16/'16'/'bf16' => bfloat16 on TPU)."""
    if str(precision) in ("16", "bf16", "bfloat16"):
        return "bfloat16"
    return "float32"


def class_name(spec: Dict[str, Any]) -> str:
    return spec["class_path"].rsplit(".", 1)[-1]


def init_args(spec: Optional[Dict[str, Any]]) -> Dict[str, Any]:
    return dict((spec or {}).get("init_args") or {})


# ---------------------------------------------------------------------------
# model component builders
# ---------------------------------------------------------------------------

def build_backbone(spec: Dict[str, Any]):
    """Returns (module, pretrained_path_or_keyword)."""
    from .models.mix_transformer import MixVisionTransformer
    from .models.resnet import ResNet
    from .models.vgg import VGG
    name = class_name(spec)
    args = init_args(spec)
    pretrained = args.pop("pretrained", None)
    args.pop("channels_last", None)
    if name == "MixVisionTransformer":
        known = {k: v for k, v in args.items()
                 if k in ("model_type", "drop_path_rate", "qk_scale",
                          "in_chans", "remat", "remat_policy")}
        return MixVisionTransformer(**known), pretrained
    if name == "ResNet":
        known = {k: v for k, v in args.items()
                 if k in ("model_type", "strides", "dilations",
                          "out_indices", "contract_dilation", "norm_eval",
                          "max_pool_ceil_mode")}
        for key in ("strides", "dilations", "out_indices"):
            if key in known:
                known[key] = tuple(known[key])
        return ResNet(**known), pretrained
    if name == "VGG":
        known = {k: v for k, v in args.items()
                 if k in ("model_type", "out_indices")}
        if "out_indices" in known:
            known["out_indices"] = tuple(known["out_indices"])
        return VGG(**known), pretrained
    raise ValueError(f"unknown backbone {name}")


def build_head(spec: Dict[str, Any], bn_axis_name=None):
    """Returns (module, pretrained)."""
    from .models.heads.daformer import DAFormerHead
    from .models.heads.deeplabv2 import DeepLabV2Head
    from .models.heads.segformer import SegFormerHead
    from .models.heads.uawarpc import UAWarpCHead
    name = class_name(spec)
    args = init_args(spec)
    pretrained = args.pop("pretrained", None)
    if name == "DAFormerHead":
        known = {k: v for k, v in args.items()
                 if k in ("num_classes", "channels", "embed_dims",
                          "dropout_ratio", "in_index")}
        if "in_index" in known:
            known["in_index"] = tuple(known["in_index"])
        return DAFormerHead(**known), pretrained
    if name == "SegFormerHead":
        known = {k: v for k, v in args.items()
                 if k in ("num_classes", "channels", "dropout_ratio",
                          "in_index")}
        if "in_index" in known:
            known["in_index"] = tuple(known["in_index"])
        return SegFormerHead(**known), pretrained
    if name == "DeepLabV2Head":
        known = {k: v for k, v in args.items()
                 if k in ("num_classes", "dilation_series", "in_index",
                          "input_transform")}
        return DeepLabV2Head(**known), pretrained
    if name == "UAWarpCHead":
        known = {k: v for k, v in args.items()
                 if k in ("in_index", "batch_norm",
                          "refinement_at_adaptive_res",
                          "refinement_at_finest_level",
                          "estimate_uncertainty", "iterative_refinement")}
        if "in_index" in known:
            known["in_index"] = tuple(known["in_index"])
        return UAWarpCHead(**known), pretrained
    raise ValueError(f"unknown head {name}")


# ---------------------------------------------------------------------------
# optimizer / schedule specs
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class OptimizerSpec:
    name: str               # 'AdamW' | 'Adam'
    lr: float
    weight_decay: float = 0.0
    betas: Tuple[float, float] = (0.9, 0.999)


@dataclasses.dataclass
class SchedulerSpec:
    name: str               # 'LinearWarmupPolynomialLR' | 'MultiStepLR'
    warmup_iters: int = 1500
    warmup_ratio: float = 1e-6
    power: float = 0.9
    min_lr: float = 0.0
    milestones: Tuple[int, ...] = ()
    gamma: float = 0.5
    max_steps: Optional[int] = None


def parse_optimizer(spec: Dict[str, Any]) -> OptimizerSpec:
    args = init_args(spec)
    return OptimizerSpec(
        name=class_name(spec),
        lr=float(args.get("lr", 1e-3)),
        weight_decay=float(args.get("weight_decay", 0.0)),
        betas=tuple(args.get("betas", (0.9, 0.999))),
    )


def parse_scheduler(spec: Dict[str, Any],
                    max_steps: Optional[int]) -> SchedulerSpec:
    args = init_args(spec)
    return SchedulerSpec(
        name=class_name(spec),
        warmup_iters=int(args.get("warmup_iters", 1500)),
        warmup_ratio=float(args.get("warmup_ratio", 1e-6)),
        power=float(args.get("power", 0.9)),
        min_lr=float(args.get("min_lr", 0.0)),
        milestones=tuple(args.get("milestones", ())),
        gamma=float(args.get("gamma", 0.5)),
        max_steps=int(args.get("max_steps") or max_steps or 40000),
    )


def parse_metrics(metrics_cfg: Dict[str, Any]) -> Dict[str, Dict[str, dict]]:
    """{'val': {ds: [metric spec]}, ...} -> {'val': {ds: [(name, args)]}}"""
    out = {}
    for stage, per_ds in (metrics_cfg or {}).items():
        out[stage] = {}
        for ds, specs in per_ds.items():
            out[stage][ds] = [(class_name(s), init_args(s)) for s in specs]
    return out


def build_datamodule(cfg: Dict[str, Any], data_dir: Optional[str] = None):
    from .data.module import CombinedDataModule
    args = init_args(cfg)
    args.pop("pin_memory", None)
    if data_dir:
        args["data_dir"] = data_dir
    return CombinedDataModule(**args)


def build_task(cfg: Dict[str, Any], data_dir: Optional[str] = None):
    """Top-level: config dict -> (task, datamodule)."""
    model_cfg = cfg["model"]
    name = class_name(model_cfg)
    datamodule = build_datamodule(cfg["data"], data_dir)
    trainer_cfg = cfg.get("trainer", {}) or {}
    opt = parse_optimizer(cfg.get("optimizer", {
        "class_path": "AdamW", "init_args": {"lr": 6e-4}}))
    sched = parse_scheduler(cfg.get("lr_scheduler", {"class_path":
                                                     "LinearWarmupPolynomialLR"}),
                            trainer_cfg.get("max_steps"))
    if name == "DomainAdaptationSegmentationModel":
        from .tasks.seg_task import SegTask
        return SegTask(init_args(model_cfg), opt, sched, trainer_cfg,
                       datamodule), datamodule
    if name == "AlignmentModel":
        from .tasks.align_task import AlignTask
        return AlignTask(init_args(model_cfg), opt, sched, trainer_cfg,
                         datamodule), datamodule
    raise ValueError(f"unknown model class {name}")
