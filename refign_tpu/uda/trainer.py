"""Refign/DAFormer/HRDA UDA training: one fused, jittable train step.

TPU-first redesign of the reference training_step
(models/segmentation_model.py:146-253):

* The reference's three manual backward passes (source CE, ImageNet feature
  distance, mixed-batch CE — :173, :186, :244) collapse into ONE scalar loss
  and ONE ``jax.grad`` — gradients of a sum equal summed gradients, and XLA
  fuses the whole step.
* The EMA teacher update (:680-689) is a ``tree_map`` lerp inside the step.
* All teacher/align/refine work runs under ``stop_gradient`` (replacing
  ``torch.no_grad``).
* Data-dependent choices (adapt_to_ref coin :195-200) are ``lax.cond``
  branches; the random HRDA crop is a traced offset into
  ``lax.dynamic_slice``.
* Designed for pjit data parallelism: batch arrays are sharded on the mesh
  'data' axis, params replicated; global-batch reductions (BN statistics,
  losses) become cross-device automatically, replacing the reference's
  sync_batchnorm + DDP allreduce.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..models.segmentor import Segmentor
from ..ops.resize import interpolate
from ..ops.warp import confidence_from_logvar, warp
from .dacs import dacs_mix
from .losses import pixel_weighted_cross_entropy
from .refine import fdist_loss, refine


@dataclasses.dataclass(frozen=True)
class UDAConfig:
    """Static hyperparameters (reference __init__ kwargs, :26-62)."""
    num_classes: int = 19
    use_hrda: bool = False
    hrda_output_stride: int = 4
    hr_loss_weight: float = 0.1
    use_refign: bool = False
    use_align: bool = True
    adapt_to_ref: bool = False
    gamma: float = 0.25
    disable_M: bool = False
    disable_P: bool = False
    ema_momentum: float = 0.999
    pseudo_label_threshold: float = 0.968
    psweight_ignore_top: int = 0
    psweight_ignore_bottom: int = 0
    enable_fdist: bool = True
    fdist_lambda: float = 0.005
    fdist_classes: Tuple[int, ...] = (6, 7, 11, 12, 13, 14, 15, 16, 17, 18)
    fdist_scale_min_ratio: float = 0.75
    color_jitter_s: float = 0.2
    color_jitter_p: float = 0.2
    blur: bool = True
    # 'bfloat16' matches the reference's AMP training (--trainer.precision 16,
    # README.md:262): params/images cast to bf16 at the apply boundary, fp32
    # master params and fp32 loss/softmax/warp islands preserved.
    compute_dtype: str = "bfloat16"
    # TPU-first input path (CombinedDataModule device_normalize=True): the
    # host ships uint8 images (4x fewer host->device bytes) and the step
    # applies ConvertImageDtype+Normalize on device, fused by XLA into the
    # first conv.  Identical math to the host transforms; fp32 batches
    # pass through untouched, so the goldens and the host-normalized path
    # are unaffected.
    device_normalize: bool = False
    norm_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    norm_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)


class UDATrainState(NamedTuple):
    step: jax.Array
    params: Any                 # student: backbone / head / scale_attention
    batch_stats: Any            # student BN running stats
    teacher_params: Any
    teacher_batch_stats: Any
    imnet_params: Any           # frozen init copy of the backbone (fdist)
    imnet_batch_stats: Any      # frozen BN running stats (eval-mode imnet)
    opt_state: Any


def init_uda_state(params, batch_stats, tx, enable_fdist=True):
    imnet = imnet_stats = None
    if enable_fdist:
        imnet = jax.tree_util.tree_map(jnp.copy, params["backbone"])
        # BN backbones (ResNet/DeepLabV2): the imnet runs in eval mode
        # (reference imnet_backbone.eval(), segmentation_model.py:596-598)
        # against the INIT running stats, frozen here
        imnet_stats = jax.tree_util.tree_map(
            jnp.copy, (batch_stats or {}).get("backbone", {}))
    return UDATrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        teacher_params=jax.tree_util.tree_map(jnp.copy, params),
        teacher_batch_stats=jax.tree_util.tree_map(jnp.copy, batch_stats),
        imnet_params=imnet,
        imnet_batch_stats=imnet_stats,
        opt_state=tx.init(params),
    )


def ema_update(teacher, student, step, momentum):
    """min(1 - 1/(step+1), momentum) lerp (reference :680-689)."""
    m = jnp.minimum(1.0 - 1.0 / (step.astype(jnp.float32) + 1.0), momentum)
    return jax.tree_util.tree_map(
        lambda t, s: t * m + s.astype(t.dtype) * (1.0 - m), teacher, student)


def _hrda_crop_offset(rng, H, W, divisible):
    """Random HR crop origin (reference hrda.py:9-34): offsets divisible by
    2*os in [0, margin], margin = size/2."""
    ky, kx = jax.random.split(rng)
    ny = (H // 2 + 1) // divisible
    nx = (W // 2 + 1) // divisible
    oy = jax.random.randint(ky, (), 0, ny) * divisible
    ox = jax.random.randint(kx, (), 0, nx) * divisible
    return jnp.stack([oy, ox]).astype(jnp.int32)


def make_uda_train_step(segmentor: Segmentor,
                        align_backbone, align_head,
                        tx: optax.GradientTransformation,
                        cfg: UDAConfig):
    """Returns train_step(state, batch, align_params, rng) -> (state, logs).

    batch keys (from the combined data module, reference
    combined_data_module.py:263-310): ``image_src`` (B,H,W,3),
    ``semantic_src`` (B,H,W), ``image_trg``, optionally ``image_ref``.
    """
    os_ = cfg.hrda_output_stride
    cdt = jnp.dtype(cfg.compute_dtype)

    def _cast(tree):
        from ..parallel.mesh import cast_floating
        return cast_floating(tree, cdt) if cdt != jnp.float32 else tree

    def _norm_batch(b):
        """Device-side ConvertImageDtype + Normalize for uint8 input
        batches (cfg.device_normalize); float batches pass through."""
        if not cfg.device_normalize:
            return b
        nm = jnp.asarray(cfg.norm_mean, jnp.float32)
        nsd = jnp.asarray(cfg.norm_std, jnp.float32)
        out = dict(b)
        for k in ("image_src", "image_trg", "image_ref"):
            if k in out and out[k].dtype == jnp.uint8:
                out[k] = (out[k].astype(jnp.float32) / 255.0 - nm) / nsd
        return out

    def student_src_forward(params, batch_stats, images, rng, train=True):
        """Returns (logits_at_input_res, aux) where aux carries hr branch +
        lr feats + new batch stats."""
        variables = {"params": _cast(params), "batch_stats": batch_stats}
        images = images.astype(cdt)
        H, W = images.shape[1:3]
        if cfg.use_hrda:
            offset = _hrda_crop_offset(rng, H, W, 2 * os_)
            (fused, hr_logits, crop_offset, lr_feats), mut = segmentor.apply(
                variables, images, offset, train=train, deterministic=False,
                rngs={"dropout": rng, "droppath": rng},
                mutable=["batch_stats"], method=Segmentor.hrda_train)
            logits = interpolate(fused, (H, W), mode="bilinear",
                                 align_corners=False)
            return logits, dict(hr_logits=hr_logits, crop_offset=crop_offset,
                                feats=lr_feats, batch_stats=mut["batch_stats"])
        (logits, feats), mut = segmentor.apply(
            variables, images, train=train, deterministic=False,
            rngs={"dropout": rng, "droppath": rng},
            mutable=["batch_stats"], method=Segmentor.logits_and_features)
        logits = interpolate(logits, (H, W), mode="bilinear",
                             align_corners=False)
        return logits, dict(feats=feats, batch_stats=mut["batch_stats"])

    def teacher_forward(tparams, tstats, images):
        """EMA teacher logits at input resolution; BN in batch-stats mode
        with stat updates discarded (reference :691-701)."""
        variables = {"params": _cast(tparams), "batch_stats": tstats}
        images = images.astype(cdt)
        out, _ = segmentor.apply(
            variables, images, train=True, mutable=["batch_stats"],
            method=Segmentor.whole)
        return out

    def align_fn(align_params, logits_ref, images_ref, images_trg):
        """Warp reference logits onto the target view (reference :493-523)."""
        align_params = {"backbone": _cast(align_params["backbone"]),
                        "head": _cast(align_params["head"]),
                        "head_stats": align_params["head_stats"]}
        images_ref = images_ref.astype(cdt)
        images_trg = images_trg.astype(cdt)
        B, H, W, _ = images_trg.shape
        trg256 = interpolate(images_trg, (256, 256), mode="area")
        ref256 = interpolate(images_ref, (256, 256), mode="area")
        bb_vars = {"params": align_params["backbone"]}
        full = align_backbone.apply(
            bb_vars, jnp.concatenate([images_ref, images_trg]),
            extract_only_indices=[-3, -2])
        pyr_ref = [f[:B] for f in full]
        pyr_trg = [f[B:] for f in full]
        small = align_backbone.apply(
            bb_vars, jnp.concatenate([ref256, trg256]),
            extract_only_indices=[-2, -1])
        pyr_ref_256 = [f[:B] for f in small]
        pyr_trg_256 = [f[B:] for f in small]
        head_vars = {"params": align_params["head"],
                     "batch_stats": align_params["head_stats"]}
        flow, logvar = align_head.apply(
            head_vars, pyr_trg, pyr_ref, pyr_trg_256, pyr_ref_256,
            (H, W))[-1]
        flow = interpolate(flow, (H, W), mode="bilinear", align_corners=False)
        logvar = interpolate(logvar, (H, W), mode="bilinear",
                             align_corners=False)
        cert = confidence_from_logvar(logvar, R=1.0)
        warped, mask = warp(logits_ref, flow, return_mask=True)
        return warped, mask, cert

    def pseudo_probs(state, batch, use_ref_as_target: bool):
        """Teacher pseudo-probabilities + chosen target images
        (reference :194-224).  ``use_ref_as_target`` is the adapt_to_ref
        coin, decided host-side like the reference's python
        ``random.uniform`` (:195) — see make_uda_train_step."""
        images_trg = batch["image_trg"]

        def refign_branch(images_trg):
            images_ref = batch["image_ref"]
            b = images_trg.shape[0]
            m_in = jnp.concatenate([images_trg, images_ref])
            m_logits = teacher_forward(state.teacher_params,
                                       state.teacher_batch_stats, m_in)
            m_trg, m_ref = m_logits[:b], m_logits[b:]
            if cfg.use_align:
                warped, mask, cert = align_fn(
                    batch["align_params"], m_ref, images_ref, images_trg)
                probs = refine(m_trg, warped, mask, cert, cfg.gamma,
                               cfg.disable_M, cfg.disable_P)
            else:
                probs = refine(m_trg, m_ref, None, None, cfg.gamma,
                               cfg.disable_M, cfg.disable_P)
            return probs

        def plain_branch(images):
            m_logits = teacher_forward(state.teacher_params,
                                       state.teacher_batch_stats, images)
            return jax.nn.softmax(m_logits.astype(jnp.float32), axis=-1)

        if cfg.adapt_to_ref and use_ref_as_target:
            # the coin swapped the adaptation target to the
            # normal-condition reference frame; align/refine are skipped.
            # NOTE: the reference swap (:195-200) is independent of
            # use_refign — with use_refign=False and adapt_to_ref=True the
            # plain teacher still runs on image_ref for that step
            return plain_branch(batch["image_ref"]), batch["image_ref"]
        if cfg.use_refign:
            return refign_branch(images_trg), images_trg
        return plain_branch(images_trg), images_trg

    def prefix_fn(state: UDATrainState, batch: Dict[str, jax.Array],
                  align_params, rng: jax.Array, use_ref_as_target: bool):
        """No-grad prologue: EMA refresh, pseudo-labels, DACS mixing."""
        batch = _norm_batch(batch)
        k_teacher, k_dacs = jax.random.split(rng)

        # 1. EMA teacher refresh (reference does it first, :151)
        teacher_params = ema_update(state.teacher_params, state.params,
                                    state.step, cfg.ema_momentum)
        state = state._replace(teacher_params=teacher_params)

        # 2. pseudo-labels
        batch2 = dict(batch)
        batch2["align_params"] = align_params
        probs_trg, images_trg = pseudo_probs(state, batch2,
                                             use_ref_as_target)

        # 3. DACS mixing
        mixed_img, mixed_lbl, mixed_weight = dacs_mix(
            k_dacs, images_trg, probs_trg,
            batch["image_src"], batch["semantic_src"],
            pseudo_label_threshold=cfg.pseudo_label_threshold,
            color_jitter_s=cfg.color_jitter_s,
            color_jitter_p=cfg.color_jitter_p,
            blur=cfg.blur,
            psweight_ignore_top=cfg.psweight_ignore_top,
            psweight_ignore_bottom=cfg.psweight_ignore_bottom,
            num_classes=cfg.num_classes)
        return teacher_params, mixed_img, mixed_lbl, mixed_weight

    def core_fn(state: UDATrainState, batch: Dict[str, jax.Array],
                mixed_img, mixed_lbl, mixed_weight, rng: jax.Array):
        """Differentiated section: student passes, fdist, grad, update."""
        batch = _norm_batch(batch)
        k_src, k_mix = jax.random.split(rng)
        gt_src = batch["semantic_src"]

        def loss_fn(params):
            logs = {}
            # SOURCE pass
            logits_src, aux_src = student_src_forward(
                params, state.batch_stats, batch["image_src"], k_src)
            if cfg.use_hrda:
                oy, ox = aux_src["crop_offset"][0], aux_src["crop_offset"][1]
                H, W = gt_src.shape[1:3]
                gt_crop = jax.lax.dynamic_slice(
                    gt_src, (0, oy, ox),
                    (gt_src.shape[0], H // 2, W // 2))
                loss_src = ((1 - cfg.hr_loss_weight)
                            * pixel_weighted_cross_entropy(logits_src, gt_src)
                            + cfg.hr_loss_weight
                            * pixel_weighted_cross_entropy(
                                aux_src["hr_logits"], gt_crop))
            else:
                loss_src = pixel_weighted_cross_entropy(logits_src, gt_src)
            logs["train_loss_src"] = loss_src
            total = loss_src

            # ImageNet feature distance
            if cfg.enable_fdist:
                img = batch["image_src"]
                if cfg.use_hrda:
                    img = interpolate(
                        img, (img.shape[1] // 2, img.shape[2] // 2),
                        mode="bilinear", align_corners=False)
                # eval-mode frozen imnet (reference :596-598): BN reads the
                # init-snapshot running stats; params cast like the student
                # (the reference runs this forward under the same AMP
                # autocast as everything else)
                imnet_vars = {"params": _cast(state.imnet_params)}
                if state.imnet_batch_stats:
                    imnet_vars["batch_stats"] = state.imnet_batch_stats
                imnet_feats = segmentor.backbone.apply(
                    imnet_vars, img.astype(cdt), deterministic=True)
                lfd = fdist_loss(
                    aux_src["feats"][-1], imnet_feats[-1], gt_src,
                    cfg.fdist_classes, cfg.fdist_scale_min_ratio,
                    cfg.num_classes, cfg.fdist_lambda)
                logs["train_loss_featdist_src"] = lfd
                total = total + lfd

            # MIXED pass (continues BN stat mutation from the source pass)
            logits_mix, aux_mix = student_src_forward(
                params, aux_src["batch_stats"], mixed_img, k_mix)
            if cfg.use_hrda:
                oy, ox = aux_mix["crop_offset"][0], aux_mix["crop_offset"][1]
                H, W = mixed_lbl.shape[1:3]
                lbl_crop = jax.lax.dynamic_slice(
                    mixed_lbl, (0, oy, ox),
                    (mixed_lbl.shape[0], H // 2, W // 2))
                w_crop = jax.lax.dynamic_slice(
                    mixed_weight, (0, oy, ox),
                    (mixed_weight.shape[0], H // 2, W // 2))
                loss_mix = ((1 - cfg.hr_loss_weight)
                            * pixel_weighted_cross_entropy(
                                logits_mix, mixed_lbl, mixed_weight)
                            + cfg.hr_loss_weight
                            * pixel_weighted_cross_entropy(
                                aux_mix["hr_logits"], lbl_crop, w_crop))
            else:
                loss_mix = pixel_weighted_cross_entropy(
                    logits_mix, mixed_lbl, mixed_weight)
            logs["train_loss_uda_trg"] = loss_mix
            total = total + loss_mix
            # teacher-confidence observability: the DACS uniform pseudo
            # weight is frac(conf >= threshold) per image (reference
            # :218-222); its mean tracks how confident/stable the teacher's
            # pseudo-labels are (used by the convergence harness)
            logs["train_pseudo_weight"] = jnp.mean(
                mixed_weight.astype(jnp.float32))
            return total, (aux_mix["batch_stats"], logs)

        (loss, (new_stats, logs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        logs["train_loss_total"] = loss
        new_state = state._replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt)
        return new_state, logs

    # The step runs as TWO jitted programs, not one: compiling the no-grad
    # teacher/align/refine/DACS prologue into the same program as
    # value_and_grad measurably doubles the step on v5e (894 ms monolith vs
    # ~430 ms split at 512^2 b2 — an XLA scheduling interaction, not memory:
    # compiled temp is 7.2 GB of 16 GB either way).  The adapt_to_ref coin
    # is decided HOST-side per step (the reference's python
    # ``random.uniform(0,1)``, segmentation_model.py:195) and selects one of
    # two compiled prefix variants, replacing the round-1 lax.cond.
    jit_prefix = jax.jit(prefix_fn, static_argnames=("use_ref_as_target",))
    jit_core = jax.jit(core_fn)

    def train_step(state: UDATrainState, batch: Dict[str, jax.Array],
                   align_params, rng: jax.Array,
                   use_ref_as_target: bool = False):
        # jit_prefix/jit_core are traced once and cached WITHOUT the active
        # compute mesh in their key (unlike SegTask.make_forward); refuse to
        # trace/run them inside a compute_mesh context so eval-crop sharding
        # constraints can never be silently baked into the train executable
        from ..parallel.mesh import active_mesh
        if active_mesh() is not None:
            raise RuntimeError(
                "train_step must not run inside a compute_mesh context "
                "(its jit cache is not mesh-keyed)")
        k_prefix, k_core = jax.random.split(rng)
        teacher_params, mixed_img, mixed_lbl, mixed_weight = jit_prefix(
            state, batch, align_params, k_prefix,
            use_ref_as_target=bool(use_ref_as_target))
        state = state._replace(teacher_params=teacher_params)
        return jit_core(state, batch, mixed_img, mixed_lbl, mixed_weight,
                        k_core)

    # exposed for AOT compile-checking (e.g. __graft_entry__ compiles the
    # flagship geometry against a sharded mesh without executing it)
    train_step.jit_prefix = jit_prefix
    train_step.jit_core = jit_core
    return train_step
