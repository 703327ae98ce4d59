"""Alignment (UAWarpC) task: fit / validate / test.

Glue equivalent of the reference AlignmentModel + Lightning runtime
(models/alignment_model.py): frozen VGG + UAWarpC head training with
on-device synthetic-flow supervision, and sparse EPE/PCK/AUSE evaluation.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..alignment.trainer import (AlignConfig, align_forward,
                                 init_align_state, make_align_train_step)
from ..config import OptimizerSpec, SchedulerSpec, build_backbone, build_head
from ..config import parse_metrics, precision_dtype as _precision_dtype
from ..parallel.mesh import make_mesh, replicate, shard_batch
from ..train.optim import make_adam_optimizer
from ..utils.checkpoint import (load_torch_alignment_head,
                                restore_checkpoint)
from ..utils.sparse_epe import SparseEPE


def _host_batch_from(raw_batches):
    """Concatenate per-loader sub-batches into one train batch (reference
    on_before_batch_transfer cat semantics, combined_data_module.py:
    263-310); maps the datasets' 'image' key to the step's image_trg."""
    return {
        "image_ref": np.concatenate([r["image_ref"] for r in raw_batches]),
        "image_trg": np.concatenate([r["image"] for r in raw_batches]),
    }


class AlignTask:

    def __init__(self, margs: Dict[str, Any], opt: OptimizerSpec,
                 sched: SchedulerSpec, trainer_cfg: Dict[str, Any],
                 datamodule):
        self.margs = margs
        self.opt = opt
        self.sched = sched
        self.trainer_cfg = trainer_cfg or {}
        self.datamodule = datamodule
        self.backbone, self.backbone_pretrained = build_backbone(
            margs["alignment_backbone"])
        self.head, self.head_pretrained = build_head(
            margs["alignment_head"])
        cf = dict(datamodule.composite_flow_settings or {})
        cf.pop("apply_keys", None)
        pp = getattr(datamodule, "prime_photometric_settings", {}) or {}
        norm = getattr(datamodule, "normalize_settings", None) or {}
        us_args = (margs.get("unsupervised_loss") or {}).get("init_args", {})
        self.align_cfg = AlignConfig(
            prime_jitter=pp.get("jitter"),
            prime_channel_shuffle=pp.get("channel_shuffle", False),
            prime_blur=pp.get("blur"),
            crop_after_flow=cf.get("crop_after_flow"),
            norm_mean=norm.get("mean", (0.485, 0.456, 0.406)),
            norm_std=norm.get("std", (0.229, 0.224, 0.225)),
            device_normalize=bool(getattr(datamodule, "device_normalize",
                                          False)),
            apply_constant_flow_weights=margs.get(
                "apply_constant_flow_weights", False),
            visibility_mask=us_args.get("visibility_mask", False),
            alpha_1=us_args.get("alpha_1", 0.03),
            alpha_2=us_args.get("alpha_2", 0.5),
            include_transforms=tuple(cf.get("include_transforms",
                                            ("hom", "tps", "afftps"))),
            random_alpha=cf.get("random_alpha", 0.26),
            random_s=cf.get("random_s", 0.45),
            random_tx=cf.get("random_tx", 0.25),
            random_ty=cf.get("random_ty", 0.25),
            random_t_hom=cf.get("random_t_hom", 0.333),
            random_t_tps=cf.get("random_t_tps", 0.333),
            random_t_tps_for_afftps=cf.get("random_t_tps_for_afftps", 0.08),
            add_elastic=cf.get("add_elastic", False),
            compute_dtype=_precision_dtype(
                self.trainer_cfg.get("precision", 16)),
            # TPU memory knobs (no reference analog): the 3-pass step
            # needs 28.4 GB of HBM un-checkpointed at the MegaDepth stage
            # geometry (520^2 b6) vs the v5e's 15.75 GB.  Default is
            # per-SUBMODULE remat (UAWarpCHead.remat_modules): only
            # module-boundary tensors stay resident, and the backward
            # recomputes one decoder/refinement/uncertainty module at a
            # time instead of a whole head pass — measured 400.3 ->
            # 357.8 ms/step over whole-pass remat at stage-1 geometry
            # (r5 campaign, artifacts/align_train_stage1_520_b6_r05.txt).
            # model.init_args.remat_head=True restores the r4 whole-pass
            # scheme (with optional remat_head_policy / remat_skip_last);
            # fold_passes folds the 3 passes into one 3B apply (grouped
            # BN; equal math, measured neutral-to-slower — kept for A/B).
            remat_head=bool(margs.get("remat_head", False)),
            remat_head_policy=margs.get("remat_head_policy"),
            remat_skip_last=bool(margs.get("remat_skip_last", False)),
            remat_modules=bool(margs.get("remat_modules", True)),
            fold_passes=bool(margs.get("fold_passes", False)),
        )
        self.pretrained = margs.get("pretrained")
        self.metrics_cfg = parse_metrics(margs.get("metrics", {}))
        self.mesh = make_mesh()
        self._fwd_cache = {}

    def init_state(self, rng, image_hw=(256, 256)):
        # initialize on the host CPU backend (see SegTask.init_state)
        try:
            cpu = jax.local_devices(backend="cpu")[0]
        except RuntimeError:
            cpu = jax.devices()[0]
        with jax.default_device(cpu):
            return self._init_state_impl(rng, image_hw)

    def _init_state_impl(self, rng, image_hw=(256, 256)):
        H, W = image_hw
        bvars = self.backbone.init(
            rng, jnp.zeros((1, 256, 256, 3), jnp.float32))
        feats = self.backbone.apply(
            bvars, jnp.zeros((1, H, W, 3), jnp.float32),
            extract_only_indices=[-3, -2])
        feats256 = self.backbone.apply(
            bvars, jnp.zeros((1, 256, 256, 3), jnp.float32),
            extract_only_indices=[-2, -1])
        hvars = self.head.init(rng, feats, feats, feats256, feats256,
                               (H, W))
        from ..utils.checkpoint import load_torch_backbone
        from ..utils.pretrained import backbone_family, resolve_pretrained
        from ..utils.torch_convert import subset_like
        if self.backbone_pretrained:
            path = resolve_pretrained(
                self.backbone_pretrained,
                family=backbone_family(self.backbone),
                model_type=getattr(self.backbone, "model_type", None))
            bv = load_torch_backbone(path)
            bvars = dict(bvars)
            bvars["params"] = subset_like(bv["params"], bvars["params"])
            if bv["batch_stats"] and "batch_stats" in bvars:
                bvars["batch_stats"] = subset_like(bv["batch_stats"],
                                                   bvars["batch_stats"])
        if self.head_pretrained:
            loaded = load_torch_alignment_head(
                resolve_pretrained(self.head_pretrained))
            hvars = {"params": loaded["params"],
                     "batch_stats": loaded["batch_stats"]}
        if self.pretrained:
            loaded = load_torch_alignment_head(
                resolve_pretrained(self.pretrained))
            hvars = {"params": loaded["params"],
                     "batch_stats": loaded["batch_stats"]}
        tx, sched_fn = make_adam_optimizer(self.opt.lr,
                                    self.sched.milestones or [10 ** 9],
                                    gamma=self.sched.gamma,
                                    weight_decay=self.opt.weight_decay,
                                    betas=self.opt.betas)
        self.tx = tx
        self.sched_fn = sched_fn
        return init_align_state(hvars, bvars["params"], tx)

    # ------------------------------------------------------------------- fit

    def fit(self, workdir: str, seed: int = 0,
            resume: Optional[str] = None) -> Dict[str, float]:
        """All train loaders contribute each step: per-loader sub-batches
        are concatenated like the reference's on_before_batch_transfer
        (combined_data_module.py:263-310) — previously only loaders[0]
        was consumed, silently dropping extra train datasets."""
        from ..data.loader import DevicePrefetcher, InfiniteLoader
        os.makedirs(workdir, exist_ok=True)
        self.datamodule.setup("fit")
        loaders = self.datamodule.train_dataloaders(seed=seed)
        iters = [iter(InfiniteLoader(l)) for l in loaders]

        rng = jax.random.PRNGKey(seed)
        state = self.init_state(rng)
        if resume:
            state = restore_checkpoint(resume, state)
        import math
        probe = _host_batch_from([next(i) for i in iters])
        n_dev = math.gcd(len(jax.devices()), probe["image_trg"].shape[0])
        self.mesh = make_mesh(jax.devices()[:max(n_dev, 1)])
        state = replicate(self.mesh, state)
        step_fn = jax.jit(make_align_train_step(
            self.backbone, self.head, self.tx, self.align_cfg))

        from ..train.loop import FitBookkeeper
        bk = FitBookkeeper(workdir, self.trainer_cfg, self.sched_fn,
                           lambda hs: self.evaluate("val", state=hs),
                           default_max_steps=400000)

        prefetcher = DevicePrefetcher(
            lambda: _host_batch_from([next(i) for i in iters]),
            lambda b: shard_batch(self.mesh, b))

        start_step = int(state.step)
        for step in range(start_step, bk.max_steps):
            batch = prefetcher.next()
            rng, krun = jax.random.split(rng)
            state, logs = step_fn(state, batch, krun)
            bk.on_step(step, start_step, state, logs)
        prefetcher.close()
        return bk.finish(state)

    # ------------------------------------------------------------------ eval

    def evaluate(self, stage: str, state=None, rng=None) -> Dict[str, float]:
        if stage not in self.datamodule.datasets:
            self.datamodule.setup("validate" if stage == "val" else stage)
        if state is None:
            state = self.init_state(rng or jax.random.PRNGKey(0))
        # upload the weights ONCE (fit hands us device_get'd numpy state;
        # numpy jit arguments re-transfer host->device on every call)
        head_vars = replicate(self.mesh, {"params": state.params,
                                          "batch_stats": state.batch_stats})
        bb_params = replicate(self.mesh, state.backbone_params)

        def fwd(images_trg, images_ref):
            key = images_trg.shape
            if key not in self._fwd_cache:
                self._fwd_cache[key] = jax.jit(
                    lambda t, r, bb, hv: align_forward(
                        self.backbone, self.head, bb, hv, t, r))
            return self._fwd_cache[key](images_trg, images_ref,
                                        bb_params, head_vars)

        results = {}
        loaders = self.datamodule.eval_dataloaders(stage)
        names = self.datamodule.stage_on[stage]
        for name, loader in zip(names, loaders):
            specs = self.metrics_cfg.get(stage, {}).get(
                name, [("SparseEPE", {})])
            for mname, _ in specs:
                if mname != "SparseEPE":
                    raise ValueError(
                        f"unsupported metric '{mname}' for matching "
                        f"dataset '{name}' (supported: SparseEPE)")
            metric = SparseEPE(uncertainty_estimation=any(
                a.get("uncertainty_estimation") for _, a in specs))
            for batch in loader:
                flow, uncert = fwd(jnp.asarray(batch["image"]),
                                   jnp.asarray(batch["image_ref"]))
                h, w = batch["image"].shape[1:3]
                metric.update(np.asarray(flow), batch["corr_pts_ref"],
                              batch["corr_pts"], (h, w),
                              np.asarray(uncert))
            for k, v in metric.compute().items():
                results[f"{stage}_{name}_{k}"] = float(v)
        return results
