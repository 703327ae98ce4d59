"""Domain-adaptive segmentation task: fit / validate / test / predict.

Glue equivalent of the reference's DomainAdaptationSegmentationModel +
Lightning Trainer runtime (models/segmentation_model.py, SURVEY.md §1 L3-L4):
owns the Segmentor (student), the UDA train step (EMA teacher, align,
refine, DACS, fdist), slide/whole inference, per-dataset IoU evaluation,
prediction PNG export, and orbax checkpointing — all running under a
data-parallel mesh.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import OptimizerSpec, SchedulerSpec, build_backbone, build_head
from ..config import parse_metrics, precision_dtype as _precision_dtype
from ..metrics import iou_compute, iou_init, iou_update
from ..models.segmentor import Segmentor, slide_inference
from ..ops.resize import interpolate
from ..parallel.mesh import (active_mesh, compute_mesh, make_mesh, replicate,
                             shard_batch)
from ..train.optim import make_uda_optimizer
from ..uda.trainer import (UDAConfig, UDATrainState, init_uda_state,
                           make_uda_train_step)
from ..utils.checkpoint import (load_torch_alignment_head,
                                load_torch_backbone, load_torch_full_uda,
                                restore_checkpoint)
from ..utils.torch_convert import subset_like
from ..utils.palette import colorize_mask


class SegTask:

    def __init__(self, margs: Dict[str, Any], opt: OptimizerSpec,
                 sched: SchedulerSpec, trainer_cfg: Dict[str, Any],
                 datamodule):
        self.margs = margs
        self.opt = opt
        self.sched = sched
        self.trainer_cfg = trainer_cfg or {}
        self.datamodule = datamodule

        self.backbone, self.backbone_pretrained = build_backbone(
            margs["backbone"])
        self.head, _ = build_head(margs["head"])
        self.num_classes = self.head.num_classes
        self.use_hrda = margs.get("use_hrda", False)
        scale_attention = None
        if self.use_hrda and margs.get("hrda_scale_attention"):
            scale_attention, _ = build_head(margs["hrda_scale_attention"])
        self.segmentor = Segmentor(
            backbone=self.backbone, head=self.head,
            scale_attention=scale_attention,
            hrda_output_stride=margs.get("hrda_output_stride", 4))

        self.align_backbone = self.align_head = None
        self.align_head_pretrained = self.align_backbone_pretrained = None
        if margs.get("alignment_backbone") and margs.get("alignment_head"):
            self.align_backbone, self.align_backbone_pretrained = \
                build_backbone(margs["alignment_backbone"])
            self.align_head, self.align_head_pretrained = build_head(
                margs["alignment_head"])

        self.uda_cfg = UDAConfig(
            num_classes=self.num_classes,
            use_hrda=self.use_hrda,
            hrda_output_stride=margs.get("hrda_output_stride", 4),
            hr_loss_weight=margs.get("hr_loss_weight", 0.1),
            use_refign=margs.get("use_refign", False),
            use_align=margs.get("use_align", True),
            adapt_to_ref=margs.get("adapt_to_ref", False),
            gamma=margs.get("gamma", 0.25),
            disable_M=margs.get("disable_M", False),
            disable_P=margs.get("disable_P", False),
            ema_momentum=margs.get("ema_momentum", 0.999),
            pseudo_label_threshold=margs.get("pseudo_label_threshold",
                                             0.968),
            psweight_ignore_top=margs.get("psweight_ignore_top", 0),
            psweight_ignore_bottom=margs.get("psweight_ignore_bottom", 0),
            enable_fdist=margs.get("enable_fdist", True),
            fdist_lambda=margs.get("fdist_lambda", 0.005),
            fdist_classes=tuple(margs.get(
                "fdist_classes", (6, 7, 11, 12, 13, 14, 15, 16, 17, 18))),
            fdist_scale_min_ratio=margs.get("fdist_scale_min_ratio", 0.75),
            color_jitter_s=margs.get("color_jitter_s", 0.2),
            color_jitter_p=margs.get("color_jitter_p", 0.2),
            blur=margs.get("blur", True),
            compute_dtype=_precision_dtype(
                self.trainer_cfg.get("precision", 16)),
            device_normalize=bool(getattr(datamodule, "device_normalize",
                                          False)),
            **({"norm_mean": tuple(norm["mean"]),
                "norm_std": tuple(norm["std"])}
               if (norm := getattr(datamodule, "normalize_settings", None))
               else {}),
        )
        self.backbone_lr_factor = margs.get("backbone_lr_factor", 1.0)
        self.use_slide_inference = margs.get("use_slide_inference", False)
        self.inference_crop_size = tuple(margs.get("inference_crop_size",
                                                   (1080, 1080)))
        self.inference_stride = tuple(margs.get("inference_stride",
                                                (420, 420)))
        self.metrics_cfg = parse_metrics(margs.get("metrics", {}))
        self.pretrained = margs.get("pretrained")
        self.mesh = make_mesh()
        self._fwd_cache = {}

    # ------------------------------------------------------------------ init

    def init_state(self, rng) -> Tuple[UDATrainState, Any]:
        # initialize on the host CPU backend: parameter init needs no TPU
        # and avoids dozens of slow remote compiles; replicate() moves the
        # weights to the mesh afterwards
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = jax.devices()[0]
        with jax.default_device(cpu):
            return self._init_state_impl(rng)

    def _init_state_impl(self, rng) -> Tuple[UDATrainState, Any]:
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        if self.use_hrda:
            variables = self.segmentor.init(
                rng, dummy, method=Segmentor.hrda_eval)
        else:
            variables = self.segmentor.init(
                rng, dummy, method=Segmentor.logits_and_features)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        # bootstrap pretrained weights ('imagenet'/'cityscapes' keywords,
        # paths, URLs — reference mix_transformer.py:445-462); unresolvable
        # sources abort loudly rather than silently random-initializing
        if self.backbone_pretrained:
            loaded = self._resolve_torch(self.backbone_pretrained,
                                         self.backbone)
            bb = load_torch_backbone(loaded)
            params = dict(params)
            params["backbone"] = subset_like(bb["params"],
                                             params["backbone"])
            # BN backbones (ResNet/DeepLabV2): the converted running
            # mean/var must land too — norm_eval/inference BN reads them,
            # and dropping them silently leaves flax-init stats (0/1)
            if bb.get("batch_stats") and batch_stats.get("backbone"):
                batch_stats = dict(batch_stats)
                batch_stats["backbone"] = subset_like(
                    bb["batch_stats"], batch_stats["backbone"])

        align_params = None
        if self.align_backbone is not None:
            ab_vars = self.align_backbone.init(
                rng, jnp.zeros((1, 256, 256, 3), jnp.float32))
            feats = self.align_backbone.apply(
                ab_vars, dummy, extract_only_indices=[-3, -2])
            feats256 = self.align_backbone.apply(
                ab_vars, jnp.zeros((1, 256, 256, 3), jnp.float32),
                extract_only_indices=[-2, -1])
            ah_vars = self.align_head.init(rng, feats, feats, feats256,
                                           feats256, (64, 64))
            align_params = {"backbone": ab_vars["params"],
                            "head": ah_vars["params"],
                            "head_stats": ah_vars.get("batch_stats", {})}
            if self.align_backbone_pretrained:
                loaded = self._resolve_torch(self.align_backbone_pretrained,
                                             self.align_backbone)
                bv = load_torch_backbone(loaded)
                align_params["backbone"] = subset_like(
                    bv["params"], align_params["backbone"])
            if self.align_head_pretrained:
                loaded = self._resolve_torch(self.align_head_pretrained)
                hv = load_torch_alignment_head(loaded)
                align_params["head"] = hv["params"]
                align_params["head_stats"] = hv["batch_stats"]

        tx, sched_fn = make_uda_optimizer(
            params, self.opt.lr, self.opt.weight_decay,
            self.sched.max_steps,
            backbone_lr_factor=self.backbone_lr_factor,
            warmup_iters=self.sched.warmup_iters, power=self.sched.power,
            warmup_ratio=self.sched.warmup_ratio, min_lr=self.sched.min_lr,
            betas=self.opt.betas)
        self.tx = tx
        self.sched_fn = sched_fn
        state = init_uda_state(params, batch_stats, tx,
                               enable_fdist=self.uda_cfg.enable_fdist)

        if self.pretrained:
            loaded = self._resolve_torch(self.pretrained)
            groups = load_torch_full_uda(loaded)
            assert groups, f"no recognized submodules in {loaded}"
            state = self._load_full(state, groups)
            if "alignment_head" in groups and align_params is not None:
                align_params["head"] = groups["alignment_head"]["params"]
                align_params["head_stats"] = \
                    groups["alignment_head"]["batch_stats"]
            if ("alignment_backbone" in groups
                    and align_params is not None):
                align_params["backbone"] = subset_like(
                    groups["alignment_backbone"]["params"],
                    align_params["backbone"])
        return state, align_params

    @staticmethod
    def _resolve_torch(spec: str, module=None) -> str:
        """Resolve keyword/path/URL to a local checkpoint file; raises if
        the source cannot be found (reference mix_transformer.py:445-462,
        segmentation_model.py:421-436)."""
        from ..utils.pretrained import backbone_family, resolve_pretrained
        family = backbone_family(module) if module is not None else None
        return resolve_pretrained(
            spec, family=family,
            model_type=getattr(module, "model_type", None))

    def _load_full(self, state: UDATrainState, groups) -> UDATrainState:
        params = dict(state.params)
        stats = dict(state.batch_stats)
        tparams = dict(state.teacher_params)
        tstats = dict(state.teacher_batch_stats)
        mapping = [("backbone", "backbone", params, stats),
                   ("head", "head", params, stats),
                   ("scale_attention", "scale_attention", params, stats),
                   ("m_backbone", "backbone", tparams, tstats),
                   ("m_head", "head", tparams, tstats),
                   ("m_scale_attention", "scale_attention", tparams,
                    tstats)]
        # strict=True semantics (reference segmentation_model.py:436): a
        # full UDA checkpoint must cover every submodule the model owns —
        # silently keeping fresh-init teacher/imnet weights would degrade
        # training with no error
        required = {src for src, dst, p, _ in mapping if dst in p}
        if state.imnet_params is not None:
            required.add("imnet_backbone")
        missing = sorted(required - set(groups))
        if missing:
            raise KeyError(
                f"pretrained checkpoint is missing submodule groups "
                f"{missing} (has {sorted(groups)}); the reference loads "
                f"full-state checkpoints with strict=True")
        for src, dst, p, s in mapping:
            if src in groups:
                p[dst] = groups[src]["params"]
                if groups[src]["batch_stats"]:
                    s[dst] = groups[src]["batch_stats"]
        imnet = state.imnet_params
        imnet_stats = state.imnet_batch_stats
        if "imnet_backbone" in groups and imnet is not None:
            imnet = groups["imnet_backbone"]["params"]
            if groups["imnet_backbone"]["batch_stats"]:
                imnet_stats = groups["imnet_backbone"]["batch_stats"]
        return state._replace(params=params, batch_stats=stats,
                              teacher_params=tparams,
                              teacher_batch_stats=tstats,
                              imnet_params=imnet,
                              imnet_batch_stats=imnet_stats)

    # ----------------------------------------------------------------- infer

    def make_forward(self, out_size: Tuple[int, int]):
        """Jittable eval forward at a fixed geometry
        (reference segmentation_model.py:304-318).  Cached per geometry
        (and per active compute mesh — sharded eval traces differently) so
        repeated validation passes reuse the compiled executable."""
        mesh = active_mesh()
        key = (out_size, None if mesh is None
               else tuple(d.id for d in mesh.devices.flat))
        if key in self._fwd_cache:
            return self._fwd_cache[key]
        seg = self.segmentor
        use_slide = self.use_slide_inference
        crop, stride = self.inference_crop_size, self.inference_stride

        def forward(variables, x):
            from ..parallel.mesh import shard_rows

            def whole(c):
                return seg.apply(variables, c, method=Segmentor.whole)
            if use_slide:
                logits = slide_inference(whole, x, crop, stride)
            else:
                logits = whole(shard_rows(x))
            return interpolate(logits, out_size, mode="bilinear",
                               align_corners=False)

        self._fwd_cache[key] = jax.jit(forward)
        return self._fwd_cache[key]

    # ------------------------------------------------------------------ eval

    def evaluate(self, stage: str, state: Optional[UDATrainState] = None,
                 rng=None) -> Dict[str, float]:
        if stage not in self.datamodule.datasets:
            self.datamodule.setup("validate" if stage == "val" else stage)
        if state is None:
            state, _ = self.init_state(rng or jax.random.PRNGKey(0))
        # upload the weights ONCE: fit hands us the device_get'd (numpy)
        # state, and numpy pytrees passed as jit arguments re-transfer
        # host->device on every call — per-batch re-upload of the full
        # param set would dominate eval time
        variables = replicate(self.mesh, {"params": state.params,
                                          "batch_stats": state.batch_stats})
        results: Dict[str, float] = {}
        loaders = self.datamodule.eval_dataloaders(stage)
        names = self.datamodule.stage_on[stage]
        # evaluation runs under the data mesh: eval batches and slide/HRDA
        # crop stacks spread over all devices (SURVEY §5.8); the confusion
        # matrix reduction psums automatically under pjit
        with compute_mesh(self.mesh):
            for name, loader in zip(names, loaders):
                # honor the per-dataset metric list from the config
                # (reference segmentation_model.py:258-281 routes arbitrary
                # metric collections per eval dataloader; the seg metric
                # universe is IoU with per-spec init_args)
                metric_specs = self.metrics_cfg.get(stage, {}).get(
                    name, [("IoU", {})])
                for mname, margs_ in metric_specs:
                    if mname != "IoU":
                        raise ValueError(
                            f"unsupported metric '{mname}' for segmentation "
                            f"dataset '{name}' (supported: IoU)")
                    nc = margs_.get("num_classes", self.num_classes)
                    if nc != self.num_classes:
                        raise ValueError(
                            f"metric num_classes {nc} != model "
                            f"{self.num_classes}")
                # one confusion matrix per distinct ignore_index; every IoU
                # variant computes from the matching accumulator
                ign_list = sorted({m.get("ignore_index", 255)
                                   for _, m in metric_specs})
                # per-batch counts are exact in device int32; the running
                # total accumulates on host in int64 (the reference's
                # torchmetrics confmat is long — a device int32 accumulator
                # would silently wrap past 2**31 pixels per cell on large
                # evaluations)
                confmats = {ig: np.zeros((self.num_classes,) * 2, np.int64)
                            for ig in ign_list}
                update = jax.jit(iou_update,
                                 static_argnames=("ignore_index",))
                zero = iou_init(self.num_classes)
                # the reference computes out_size per batch
                # (segmentation_model.py:257) — eval datasets may carry
                # non-uniform image sizes, so key the compiled forward by
                # the label geometry instead of freezing the first one
                fwds: Dict[Tuple[int, int], Any] = {}
                for batch in loader:
                    x = jnp.asarray(batch["image"])
                    y = jnp.asarray(batch["semantic"])
                    hw = tuple(y.shape[1:3])
                    if hw not in fwds:
                        fwds[hw] = self.make_forward(hw)
                    logits = fwds[hw](variables, x)
                    preds = jnp.argmax(logits, axis=-1)
                    for ig in ign_list:
                        confmats[ig] += np.asarray(
                            update(zero, preds, y, ignore_index=ig),
                            np.int64)
                for i, (mname, margs_) in enumerate(metric_specs):
                    val = float(iou_compute(
                        confmats[margs_.get("ignore_index", 255)],
                        margs_.get("average", "macro"),
                        absent_score=margs_.get("absent_score", 0.0),
                        over_present_classes=margs_.get(
                            "over_present_classes", False)))
                    key = f"{stage}_{name}_{mname}"
                    if len(metric_specs) > 1 and i > 0:
                        key = f"{key}_{i}"
                    results[key] = val
        return results

    # ------------------------------------------------------------------- fit

    def fit(self, workdir: str, seed: int = 0,
            resume: Optional[str] = None) -> Dict[str, float]:
        from ..data.loader import DevicePrefetcher, InfiniteLoader
        os.makedirs(workdir, exist_ok=True)
        self.datamodule.setup("fit")
        train_loaders = self.datamodule.train_dataloaders(seed=seed)
        iters = [iter(InfiniteLoader(l)) for l in train_loaders]

        rng = jax.random.PRNGKey(seed)
        state, align_params = self.init_state(rng)
        if resume:
            state = restore_checkpoint(resume, state)

        # size the data mesh to the largest device count dividing every
        # batch axis (DP over ICI; single device degenerates gracefully).
        # With ignore_every_second_semantic_training_batch the src rows are
        # randomly halved per step, so include the halved size too — the
        # probe batch's own halving is a coin flip and must not decide the
        # mesh (shard_batch additionally replicates any non-divisible
        # array, so a surprise shape can never crash a step)
        import math
        probe = self.datamodule.merge_train_batch(
            [next(it) for it in iters], drop_half=False)
        dims = [v.shape[0] for v in probe.values()
                if hasattr(v, "shape") and v.ndim > 0]
        if (getattr(self.datamodule,
                    "ignore_every_second_semantic_training_batch", False)
                and "image_src" in probe):
            dims.append(max(probe["image_src"].shape[0] // 2, 1))
        n_dev = len(jax.devices())
        for d in dims:
            n_dev = math.gcd(n_dev, d)
        self.mesh = make_mesh(jax.devices()[:max(n_dev, 1)])

        state = replicate(self.mesh, state)
        if align_params is not None:
            align_params = replicate(self.mesh, align_params)

        # make_uda_train_step internally jits its two programs; the
        # adapt_to_ref coin is drawn host-side per step (reference
        # segmentation_model.py:195 python random.uniform)
        step_fn = make_uda_train_step(
            self.segmentor, self.align_backbone, self.align_head,
            self.tx, self.uda_cfg)
        coin_rng = np.random.RandomState(seed ^ 0x5EED)

        from ..train.loop import FitBookkeeper
        bk = FitBookkeeper(workdir, self.trainer_cfg, self.sched_fn,
                           lambda hs: self.evaluate("val", state=hs),
                           default_max_steps=40000)

        # double-buffered input pipeline: the next sharded batch is built
        # and transferred while the current step runs
        prefetcher = DevicePrefetcher(
            lambda: self.datamodule.merge_train_batch(
                [next(it) for it in iters]),
            lambda b: shard_batch(self.mesh, b))

        start_step = int(state.step)
        for step in range(start_step, bk.max_steps):
            batch = prefetcher.next()
            rng, krun = jax.random.split(rng)
            coin = (self.uda_cfg.adapt_to_ref
                    and bool(coin_rng.rand() < 0.5))
            state, logs = step_fn(state, batch, align_params, krun,
                                  use_ref_as_target=coin)
            bk.on_step(step, start_step, state, logs)
        prefetcher.close()
        return bk.finish(state)

    # ---------------------------------------------------------------- predict

    def predict(self, workdir: str,
                state: Optional[UDATrainState] = None) -> None:
        """argmax -> trainId PNG + palette-colorized PNG
        (reference segmentation_model.py:283-302)."""
        self.datamodule.setup("predict")
        if state is None:
            state, _ = self.init_state(jax.random.PRNGKey(0))
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        loaders = self.datamodule.eval_dataloaders("predict")
        names = self.datamodule.stage_on["predict"]
        with compute_mesh(self.mesh):
            for name, loader, ds in zip(names, loaders,
                                        self.datamodule.datasets["predict"]):
                save_dir = os.path.join(workdir, "preds", name)
                col_dir = os.path.join(workdir, "color_preds", name)
                os.makedirs(save_dir, exist_ok=True)
                os.makedirs(col_dir, exist_ok=True)
                out_size = tuple(ds.orig_dims)
                fwd = self.make_forward(out_size)
                for batch in loader:
                    x = jnp.asarray(batch["image"])
                    logits = fwd(variables, x)
                    preds = np.asarray(
                        jnp.argmax(logits, -1)).astype(np.uint8)
                    for pred, fn in zip(preds, batch["filename"]):
                        from PIL import Image
                        Image.fromarray(pred).save(
                            os.path.join(save_dir, fn))
                        colorize_mask(pred).save(os.path.join(col_dir, fn))
