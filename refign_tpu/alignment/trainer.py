"""UAWarpC (alignment) training — fused jittable step.

Reproduces the reference AlignmentModel training semantics
(models/alignment_model.py:81-146): frozen VGG pyramids at native + 256^2
resolutions for (ref, trg, prime) in one batched pass, per-sample (i, j)
pyramid shuffling by ``prime_trg_idx``, three head passes (warp supervision
prime->i; W-bipath prime->j and j->i), probabilistic Huber losses, and the
adaptive ss/us weighting (bug-compatibly passing apply_constant_flow_weights
in the weight_ss slot, alignment_model.py:141-143).

The synthetic target_prime is generated ON DEVICE (alignment/synthetic_flows)
instead of in CPU dataloader workers.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..ops.resize import interpolate
from ..ops.warp import confidence_from_logvar
from .losses import adaptive_loss_weights, multi_scale_flow_loss, wbipath_loss
from .synthetic_flows import batched_composite_flow


@dataclasses.dataclass(frozen=True)
class AlignConfig:
    loss_type: str = "HuberLoss"
    apply_constant_flow_weights: bool = False
    level_weights: Optional[Tuple[float, ...]] = None
    # WBipathLoss cyclic-consistency visibility mask (reference
    # losses.py:233-250,314-318; stage-2 sets visibility_mask: True)
    visibility_mask: bool = False
    alpha_1: float = 0.03
    alpha_2: float = 0.5
    # CompositeFlow settings (configs/megadepth/uawarpc_stage1.yaml:44-60)
    include_transforms: Tuple[str, ...] = ("hom", "tps", "afftps")
    random_alpha: float = 0.26
    random_s: float = 0.45
    random_tx: float = 0.25
    random_ty: float = 0.25
    random_t_hom: float = 0.333
    random_t_tps: float = 0.333
    random_t_tps_for_afftps: float = 0.08
    add_elastic: bool = False
    # photometric prime-view augs (the reference's image_prime-only host
    # transforms, uawarpc_stage1.yaml:21-41: ColorJitter 0.6/0.6/0.6/0 +
    # ChannelShuffle + GaussianBlur(p=0.2, k=7, sigma 0.2-2)), applied ON
    # DEVICE before the geometric warp.  The images arrive normalized, so
    # the augs run in denormalized [0,1] space via norm_mean/std.
    prime_jitter: Optional[Tuple[float, float, float, float]] = None
    prime_channel_shuffle: bool = False
    prime_blur: Optional[Tuple[float, int, float, float]] = None  # p,k,lo,hi
    # reference CenterCrop AFTER CompositeFlow (stage configs load 750^2,
    # synthesize the flow there, then crop everything to 520^2) — the crop
    # happens on device right after the prime is generated
    crop_after_flow: Optional[Tuple[int, int]] = None
    norm_mean: Tuple[float, float, float] = (0.485, 0.456, 0.406)
    norm_std: Tuple[float, float, float] = (0.229, 0.224, 0.225)
    # TPU-first input path (CombinedDataModule device_normalize): train
    # batches arrive uint8 and the step applies (x/255 - mean)/std on
    # device — 4x fewer host->device bytes, no host fp32 math (same
    # mechanism as UDAConfig.device_normalize; eval keeps host normalize)
    device_normalize: bool = False
    # bf16 compute at the apply boundary (reference AMP), fp32 master params
    compute_dtype: str = "bfloat16"
    # rematerialize each differentiated head pass: the step runs THREE
    # UAWarpC passes whose activations are otherwise all live until the
    # losses' backward — at the production stage geometry (520^2 b6,
    # uawarpc_stage1.yaml) that is 28.4 GB of HBM vs the v5e's 15.75 GB.
    # checkpointing caps the peak at one pass's fwd+bwd (recompute is
    # cheap: the head is a fraction of the frozen-VGG FLOPs)
    remat_head: bool = False
    # 'dots': keep each pass's matmul/conv outputs resident and recompute
    # only the elementwise tail in the backward (align_opt_lab measured
    # the full-recompute fwd at ~39 ms/pass of the 755 ms step; the finer
    # policy trades a little HBM to get most of that back)
    remat_head_policy: Optional[str] = None
    # keep the LAST head pass unrematerialized: reverse-mode backprop
    # consumes pass 3's activations FIRST, so they are freed before the
    # pass-1/2 recomputes run — peak HBM stays ~one pass's activations
    # above the all-remat step while skipping one forward recompute
    # (~39 ms of the step; artifacts/align_train_stage1_520_b6_r04b.txt)
    remat_skip_last: bool = False
    # fold the THREE head passes into ONE 3B-batched apply (r5): the convs
    # see 3x the batch (one launch instead of three), while bn_groups=3
    # keeps the exact serial-pass math — per-group batch statistics and
    # sequential running-stat EMA (see TorchBatchNorm.groups).  Gradients
    # are identical: the losses consume disjoint slices of the 3B output.
    fold_passes: bool = False
    # per-submodule remat inside the head (UAWarpCHead.remat_modules):
    # keeps only module-boundary tensors resident — REQUIRED to fit the
    # folded 3B pass in HBM at stage geometry (whole-pass remat would
    # hold all three groups' activations during the recompute)
    remat_modules: bool = False


class AlignTrainState(NamedTuple):
    step: jax.Array
    params: Any              # head params (trainable)
    batch_stats: Any         # head BN stats
    backbone_params: Any     # frozen VGG
    opt_state: Any


def init_align_state(head_vars, backbone_params, tx) -> AlignTrainState:
    return AlignTrainState(
        step=jnp.zeros((), jnp.int32),
        params=head_vars["params"],
        batch_stats=head_vars.get("batch_stats", {}),
        backbone_params=backbone_params,
        opt_state=tx.init(head_vars["params"]),
    )


def _prime_photometric(rng, base, cfg: AlignConfig):
    """The reference's image_prime-only host augs, batched on device:
    jitter -> channel shuffle -> blur (transform order in
    uawarpc_stage{1,2}.yaml), in denormalized [0,1] space."""
    from ..uda.dacs import color_jitter_bcsh, gaussian_blur_image
    B = base.shape[0]
    mean = jnp.asarray(cfg.norm_mean, base.dtype)
    std = jnp.asarray(cfg.norm_std, base.dtype)
    x = base * std + mean
    if cfg.prime_jitter is not None:
        b, c, s, h = cfg.prime_jitter
        rng, k = jax.random.split(rng)
        x = jax.vmap(lambda kk, im: color_jitter_bcsh(kk, im, b, c, s, h))(
            jax.random.split(k, B), x)
    if cfg.prime_channel_shuffle:
        rng, k = jax.random.split(rng)
        perms = jax.vmap(lambda kk: jax.random.permutation(kk, 3))(
            jax.random.split(k, B))
        x = jax.vmap(lambda im, p: im[..., p])(x, perms)
    if cfg.prime_blur is not None:
        p, ksize, lo, hi = cfg.prime_blur
        rng, kp, ks = jax.random.split(rng, 3)
        apply = jax.random.bernoulli(kp, p, (B,))
        sigmas = jax.random.uniform(ks, (B,), minval=lo, maxval=hi)
        blurred = jax.vmap(
            lambda im, sg: gaussian_blur_image(im, sg,
                                               kernel_size=int(ksize)))(
            x, sigmas)
        x = jnp.where(apply[:, None, None, None], blurred, x)
    return (x - mean) / std


def prepare_alignment_batch(rng, images_ref, images_trg, cfg: AlignConfig,
                            out_slice=None):
    """Synthesize the prime view (reference megadepth.py:408-413 +
    CompositeFlow transform): per-sample coin picks the base image
    (prime_trg_idx=1 -> derived from trg; distributionally equivalent to
    the reference's exchange_images_with_proba + always-target prime),
    then photometric augs and a random geometric flow warp.

    out_slice: optional (top, left, th, tw) — return image_prime /
    flow_prime / mask_prime already sliced to that window, with the warp
    gathers computed only there (exact; see apply_synthetic_flow)."""
    B = images_ref.shape[0]
    k_coin, k_photo, k_flow = jax.random.split(rng, 3)
    prime_trg_idx = jax.random.bernoulli(k_coin, 0.5, (B,))
    base = jnp.where(prime_trg_idx[:, None, None, None],
                     images_trg, images_ref)
    if (cfg.prime_jitter is not None or cfg.prime_channel_shuffle
            or cfg.prime_blur is not None):
        base = _prime_photometric(k_photo, base, cfg)
    image_prime, flow_prime, mask_prime = batched_composite_flow(
        k_flow, base, out_slice=out_slice,
        include_transforms=cfg.include_transforms,
        random_alpha=cfg.random_alpha, random_s=cfg.random_s,
        random_tx=cfg.random_tx, random_ty=cfg.random_ty,
        random_t_tps=cfg.random_t_tps, random_t_hom=cfg.random_t_hom,
        random_t_tps_for_afftps=cfg.random_t_tps_for_afftps,
        add_elastic=cfg.add_elastic)
    return {
        "image_prime": image_prime,
        "flow_prime": flow_prime,
        "mask_prime": mask_prime,
        "prime_trg_idx": prime_trg_idx.astype(jnp.int32),
    }


def extract_pyramids(backbone, backbone_params, images_ref, images_trg,
                     images_prime):
    """Frozen VGG pyramids at native and 256^2 resolutions for all three
    image sets in one batched pass each (reference :96-105)."""
    B = images_ref.shape[0]
    to256 = lambda x: interpolate(x, (256, 256), mode="area")
    stack = jnp.concatenate([images_ref, images_trg, images_prime])
    stack256 = jnp.concatenate(
        [to256(images_ref), to256(images_trg), to256(images_prime)])
    vars_ = {"params": backbone_params}
    full = backbone.apply(vars_, stack, extract_only_indices=[-3, -2])
    small = backbone.apply(vars_, stack256, extract_only_indices=[-2, -1])
    split = lambda fs: ([f[:B] for f in fs], [f[B:2 * B] for f in fs],
                        [f[2 * B:] for f in fs])
    pyr_ref, pyr_trg, pyr_prime = split(full)
    pyr_ref_256, pyr_trg_256, pyr_prime_256 = split(small)
    return ((pyr_ref, pyr_trg, pyr_prime),
            (pyr_ref_256, pyr_trg_256, pyr_prime_256))


def _select(idx, a_list, b_list):
    """Per-sample select: out[k] = b[k] if idx[k] else a[k]."""
    sel = []
    for a, b in zip(a_list, b_list):
        m = idx.reshape((-1,) + (1,) * (a.ndim - 1)).astype(bool)
        sel.append(jnp.where(m, b, a))
    return sel


def make_align_train_step(backbone, head, tx, cfg: AlignConfig):
    """Returns train_step(state, batch, rng) -> (state, logs).

    batch: image_ref, image_trg (B,H,W,3) normalized.  The prime view and
    synthetic flow are generated inside the step.
    """

    cdt = jnp.dtype(cfg.compute_dtype)
    if cfg.fold_passes or cfg.remat_modules:
        head = head.clone(bn_groups=3 if cfg.fold_passes else 1,
                          remat_modules=cfg.remat_modules)

    def _cast(tree):
        from ..parallel.mesh import cast_floating
        return cast_floating(tree, cdt) if cdt != jnp.float32 else tree

    def train_step(state: AlignTrainState, batch: Dict[str, jax.Array],
                   rng: jax.Array):
        k_prime, k_drop = jax.random.split(rng)
        images_ref = batch["image_ref"]
        images_trg = batch["image_trg"]
        if cfg.device_normalize:
            # device-side ConvertImageDtype + Normalize for uint8 input
            # batches; float batches pass through (fp32 exact, fused by
            # XLA into the first VGG conv / prime-view denormalize)
            nm = jnp.asarray(cfg.norm_mean, jnp.float32)
            nsd = jnp.asarray(cfg.norm_std, jnp.float32)

            def _n(x):
                return ((x.astype(jnp.float32) / 255.0 - nm) / nsd
                        if x.dtype == jnp.uint8 else x)

            images_ref = _n(images_ref)
            images_trg = _n(images_trg)

        out_slice = None
        if cfg.crop_after_flow is not None:
            # reference CenterCrop after CompositeFlow: the flow is
            # synthesized on the full (e.g. 750^2) grid; images, prime,
            # flow and mask are cropped consistently (displacements are
            # relative, so the cropped flow stays valid).  The prime warp
            # gathers ONLY the cropped window (exact — see
            # apply_synthetic_flow out_slice).
            th, tw = cfg.crop_after_flow
            h0, w0 = images_trg.shape[1:3]
            top = int(round((h0 - th) / 2.0))
            left = int(round((w0 - tw) / 2.0))
            out_slice = (top, left, th, tw)

        prime = jax.lax.stop_gradient(prepare_alignment_batch(
            k_prime, images_ref, images_trg, cfg, out_slice=out_slice))
        idx = prime["prime_trg_idx"]

        if out_slice is not None:
            images_ref = images_ref[:, top:top + th, left:left + tw]
            images_trg = images_trg[:, top:top + th, left:left + tw]
        H, W = images_trg.shape[1:3]

        (pyrs, pyrs256) = jax.lax.stop_gradient(extract_pyramids(
            backbone, _cast(state.backbone_params),
            images_ref.astype(cdt), images_trg.astype(cdt),
            prime["image_prime"].astype(cdt)))
        (pyr_ref, pyr_trg, pyr_prime) = pyrs
        (pyr_ref_256, pyr_trg_256, pyr_prime_256) = pyrs256
        # i = the image the prime was derived from; j = the other
        pyr_i = _select(idx, pyr_ref, pyr_trg)
        pyr_j = _select(1 - idx, pyr_ref, pyr_trg)
        pyr_i_256 = _select(idx, pyr_ref_256, pyr_trg_256)
        pyr_j_256 = _select(1 - idx, pyr_ref_256, pyr_trg_256)

        def loss_fn(params):
            variables = {"params": _cast(params),
                         "batch_stats": state.batch_stats}

            def _head_pass(vs, trg_pyr, src_pyr, trg256, src256):
                # head signature is (trg, src, trg_256, src_256) -> flow
                # trg->src (uawarpc.py:95)
                out, mut = head.apply(
                    vs, trg_pyr, src_pyr, trg256, src256, (H, W),
                    train=True, mutable=["batch_stats"])
                return out, mut["batch_stats"]

            if cfg.fold_passes:
                # ONE 3B-batched head apply in pass order [prime->i,
                # prime->j, j->i]; bn_groups=3 (set in the clone above)
                # reproduces the serial passes' BN math exactly
                B = idx.shape[0]
                cat = lambda a, b, c: [jnp.concatenate([x, y, z])
                                       for x, y, z in zip(a, b, c)]
                trg_pyr = cat(pyr_prime, pyr_prime, pyr_j)
                src_pyr = cat(pyr_i, pyr_j, pyr_i)
                trg256 = cat(pyr_prime_256, pyr_prime_256, pyr_j_256)
                src256 = cat(pyr_i_256, pyr_j_256, pyr_i_256)
                out3, new_stats = _head_pass(variables, trg_pyr, src_pyr,
                                             trg256, src256)

                def grp(g):
                    sl = slice(g * B, (g + 1) * B)
                    return [tuple(t[sl] for t in lv) if isinstance(lv, tuple)
                            else lv[sl] for lv in out3]

                prime_i, prime_j, j_i = grp(0), grp(1), grp(2)
                ss = multi_scale_flow_loss(
                    prime_i, prime["flow_prime"], prime["mask_prime"],
                    loss_type=cfg.loss_type,
                    level_weights=cfg.level_weights)
                us = wbipath_loss(
                    prime_j, j_i, prime["flow_prime"], prime["mask_prime"],
                    loss_type=cfg.loss_type,
                    level_weights=cfg.level_weights,
                    visibility_mask=cfg.visibility_mask,
                    alpha_1=cfg.alpha_1, alpha_2=cfg.alpha_2)
                w_ss, w_us = adaptive_loss_weights(
                    jax.lax.stop_gradient(ss), jax.lax.stop_gradient(us),
                    weight_ss=float(cfg.apply_constant_flow_weights))
                loss = w_ss * ss + w_us * us
                logs = {"train_matching_loss": loss, "loss_ss": ss,
                        "loss_us": us}
                return loss, (new_stats, logs)

            if cfg.remat_head:
                policy = None
                if cfg.remat_head_policy == "dots":
                    policy = jax.checkpoint_policies.\
                        dots_with_no_batch_dims_saveable
                elif cfg.remat_head_policy is not None:
                    raise ValueError(
                        f"unknown remat_head_policy "
                        f"{cfg.remat_head_policy!r}")
                _pass = jax.checkpoint(_head_pass, policy=policy)
            else:
                _pass = _head_pass

            def head_pass(vs, trg_pyr, src_pyr, trg256, src256, fn=None):
                out, new_stats = (fn or _pass)(vs, trg_pyr, src_pyr,
                                               trg256, src256)
                return out, {"params": vs["params"],
                             "batch_stats": new_stats}

            prime_i, variables = head_pass(
                variables, pyr_prime, pyr_i, pyr_prime_256, pyr_i_256)
            prime_j, variables = head_pass(
                variables, pyr_prime, pyr_j, pyr_prime_256, pyr_j_256)
            last_fn = _head_pass if cfg.remat_skip_last else None
            j_i, variables = head_pass(
                variables, pyr_j, pyr_i, pyr_j_256, pyr_i_256, fn=last_fn)

            ss = multi_scale_flow_loss(
                prime_i, prime["flow_prime"], prime["mask_prime"],
                loss_type=cfg.loss_type, level_weights=cfg.level_weights)
            us = wbipath_loss(
                prime_j, j_i, prime["flow_prime"], prime["mask_prime"],
                loss_type=cfg.loss_type, level_weights=cfg.level_weights,
                visibility_mask=cfg.visibility_mask,
                alpha_1=cfg.alpha_1, alpha_2=cfg.alpha_2)
            w_ss, w_us = adaptive_loss_weights(
                jax.lax.stop_gradient(ss), jax.lax.stop_gradient(us),
                weight_ss=float(cfg.apply_constant_flow_weights))
            loss = w_ss * ss + w_us * us
            logs = {"train_matching_loss": loss, "loss_ss": ss,
                    "loss_us": us}
            return loss, (variables["batch_stats"], logs)

        (loss, (new_stats, logs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return state._replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats,
                              opt_state=new_opt), logs

    return train_step


def align_forward(backbone, head, backbone_params, head_vars,
                  images_i, images_j):
    """AlignmentModel.forward (reference :55-79): flow i->j at image res and
    1 - P_R uncertainty."""
    B, H, W = images_i.shape[:3]
    to256 = lambda x: interpolate(x, (256, 256), mode="area")
    vars_b = {"params": backbone_params}
    stack = jnp.concatenate([images_j, images_i])
    full = backbone.apply(vars_b, stack, extract_only_indices=[-3, -2])
    small = backbone.apply(vars_b, jnp.concatenate(
        [to256(images_j), to256(images_i)]), extract_only_indices=[-2, -1])
    pyr_j = [f[:B] for f in full]
    pyr_i = [f[B:] for f in full]
    pyr_j_256 = [f[:B] for f in small]
    pyr_i_256 = [f[B:] for f in small]
    flow, logvar = head.apply(head_vars, pyr_i, pyr_j, pyr_i_256, pyr_j_256,
                              (H, W))[-1]
    flow = interpolate(flow, (H, W), mode="bilinear", align_corners=False)
    logvar = interpolate(logvar, (H, W), mode="bilinear",
                         align_corners=False)
    uncert = 1.0 - confidence_from_logvar(logvar, R=1.0)
    return flow, uncert
