"""Decompose the UAWarpC alignment TRAIN step on the TPU (r4).

bench_align_train.py pinned the stage-1 step at 755 ms/step device
(single-dispatch lax.scan) — far above the ~15 ms MXU floor.  This lab
times the step's ingredients SEPARATELY, each inside its own single
lax.scan dispatch (relay-immune, inputs chained through the carry so
loop-invariant work cannot be hoisted), to localize where the time goes:

  prime      on-device prime synthesis (photometric augs + CompositeFlow)
  vgg        frozen VGG16 pyramids: 3 image sets x (520^2 + 256^2)
  head1      ONE UAWarpC head pass, forward only (with uncertainty)
  head1_nou  same pass with estimate_uncertainty=False — isolates the
             patch-im2col UncertaintyModule chains
  fwd3       the full loss_fn forward (3 head passes + both losses)
  grad1      value_and_grad of ONE head pass + multi-scale loss
  full       the production train step (bench_align_train baseline)

Usage: python tools/align_opt_lab.py [--probes vgg,head1] [--scan 10]
       [--batch 6] [--load 750] [--crop 520]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--load", type=int, default=750)
    ap.add_argument("--crop", type=int, default=520)
    ap.add_argument("--scan", type=int, default=10, metavar="K")
    ap.add_argument("--probes", default=None,
                    help="comma list (default: all)")
    ap.add_argument("--fold", action="store_true",
                    help="fold_passes=True for the full/full_dots probes")
    ap.add_argument("--remat_modules", action="store_true", default=None,
                    help="force remat_modules=True (r5 production default)")
    ap.add_argument("--no_remat_modules", dest="remat_modules",
                    action="store_false",
                    help="disable per-submodule remat")
    ap.add_argument("--no_remat_head", action="store_true", default=None,
                    help="remat_head=False (r5 production default)")
    ap.add_argument("--remat_head", dest="no_remat_head",
                    action="store_false",
                    help="whole-pass remat (r4 production default)")
    args = ap.parse_args()
    if args.remat_modules is None:
        args.remat_modules = True    # production default (align_task.py)
    if args.no_remat_head is None:
        args.no_remat_head = True

    import jax
    import jax.numpy as jnp
    import refign_tpu  # noqa: F401
    from refign_tpu.alignment.losses import (adaptive_loss_weights,
                                             multi_scale_flow_loss,
                                             wbipath_loss)
    from refign_tpu.alignment.trainer import (AlignConfig, _select,
                                              extract_pyramids,
                                              init_align_state,
                                              make_align_train_step,
                                              prepare_alignment_batch)
    from refign_tpu.models.heads.uawarpc import UAWarpCHead
    from refign_tpu.models.vgg import VGG
    from refign_tpu.parallel.mesh import cast_floating
    from refign_tpu.train.optim import make_adam_optimizer

    B, L, C = args.batch, args.load, args.crop
    cfg = AlignConfig(
        prime_jitter=(0.6, 0.6, 0.6, 0.0),
        prime_channel_shuffle=True,
        prime_blur=(0.2, 7, 0.2, 2.0),
        crop_after_flow=(C, C),
        visibility_mask=False,
        remat_head=not args.no_remat_head,
        fold_passes=args.fold,
        remat_modules=args.remat_modules,
    )
    cdt = jnp.dtype(cfg.compute_dtype)
    backbone = VGG(model_type="vgg16", out_indices=(2, 3, 4))
    head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
    head_nou = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=False)

    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(0)
    batch = {
        "image_ref": jnp.asarray(rng.randn(B, L, L, 3), jnp.float32),
        "image_trg": jnp.asarray(rng.randn(B, L, L, 3), jnp.float32),
    }
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except RuntimeError:
        cpu = jax.devices()[0]
    with jax.default_device(cpu):
        bvars = backbone.init(key, np.zeros((1, 256, 256, 3), np.float32))
        feats = backbone.apply(bvars, np.zeros((1, C, C, 3), np.float32),
                               extract_only_indices=[-3, -2])
        f256 = backbone.apply(bvars, np.zeros((1, 256, 256, 3), np.float32),
                              extract_only_indices=[-2, -1])
        hvars = head.init(key, feats, feats, f256, f256, (C, C))
        hvars_nou = head_nou.init(key, feats, feats, f256, f256, (C, C))
    tx, _ = make_adam_optimizer(1e-4, [250000, 325000], gamma=0.5,
                                weight_decay=4e-4)
    state = init_align_state(hvars, bvars["params"], tx)
    state = jax.device_put(state, jax.devices()[0])
    batch = jax.device_put(batch, jax.devices()[0])
    hvars_nou = jax.device_put(hvars_nou, jax.devices()[0])

    # cropped image sets for the post-prime probes (the production step
    # crops after flow synthesis; probes past that point see 520^2 inputs)
    t0 = (L - C) // 2
    img_i = batch["image_ref"][:, t0:t0 + C, t0:t0 + C].astype(cdt)
    img_j = batch["image_trg"][:, t0:t0 + C, t0:t0 + C].astype(cdt)
    img_p = (0.5 * (img_i + img_j))

    probes = {}
    only = set(args.probes.split(",")) if args.probes else None

    def run(name, make_scan, *a):
        if only is not None and name not in only:
            return
        fn = jax.jit(make_scan)
        t0 = time.time()
        jax.block_until_ready(fn(*a))
        compile_s = time.time() - t0
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*a))
        ms = (time.perf_counter() - t0) / args.scan * 1e3
        probes[name] = ms
        print(json.dumps({"probe": name, "device_ms_per_step": round(ms, 1),
                          "K": args.scan, "compile_s": round(compile_s, 1)}),
              flush=True)

    K = args.scan

    def chain(keyed_body):
        """K chained iterations; eps (derived from each output) perturbs the
        inputs so nothing is loop-invariant."""
        def scanned(*a):
            def body(carry, k):
                eps = carry
                out = keyed_body(eps, k, *a)
                s = jnp.sum(out.astype(jnp.float32))
                return s * 0.0, s
            _, outs = jax.lax.scan(body, jnp.float32(0.0),
                                   jax.random.split(key, K))
            return outs[-1]
        return scanned

    # --- prime synthesis (on the full 750^2 grid, like production)
    def prime_body(eps, k, b):
        out = prepare_alignment_batch(
            k, b["image_ref"] + eps, b["image_trg"] + eps, cfg)
        return out["image_prime"]
    run("prime", chain(prime_body), batch)

    # --- prime sub-probes: photometric augs / flow-field gen / warp+mask
    from refign_tpu.alignment.trainer import _prime_photometric
    from refign_tpu.alignment.synthetic_flows import (apply_synthetic_flow,
                                                      composite_flow)

    def photo_body(eps, k, b):
        return _prime_photometric(k, b["image_trg"] + eps, cfg)
    run("prime_photo", chain(photo_body), batch)

    flow_kwargs = dict(
        include_transforms=cfg.include_transforms,
        random_alpha=cfg.random_alpha, random_s=cfg.random_s,
        random_tx=cfg.random_tx, random_ty=cfg.random_ty,
        random_t_tps=cfg.random_t_tps, random_t_hom=cfg.random_t_hom,
        random_t_tps_for_afftps=cfg.random_t_tps_for_afftps,
        add_elastic=cfg.add_elastic)

    def flowgen_body(eps, k, b):
        keys = jax.random.split(k, B)
        flows = jax.vmap(lambda kk: composite_flow(kk, L, L,
                                                   **flow_kwargs))(keys)
        return flows + eps
    run("prime_flowgen", chain(flowgen_body), batch)

    # single-branch flow generators (no switch): which branch is the cost?
    from refign_tpu.alignment.synthetic_flows import (afftps_mapping,
                                                      homography_mapping,
                                                      tps_mapping)
    from refign_tpu.ops.warp import unnormalize_mapping_to_flow

    def mk_branch_body(gen):
        def branch_body(eps, k, b):
            keys = jax.random.split(k, B)
            maps = jax.vmap(lambda kk: gen(kk, L, L))(keys)
            return unnormalize_mapping_to_flow(maps) + eps
        return branch_body
    run("flowgen_hom", chain(mk_branch_body(
        lambda k, H, W: homography_mapping(k, H, W, cfg.random_t_hom))),
        batch)
    run("flowgen_tps", chain(mk_branch_body(
        lambda k, H, W: tps_mapping(k, H, W, cfg.random_t_tps))), batch)
    run("flowgen_afftps", chain(mk_branch_body(
        lambda k, H, W: afftps_mapping(
            k, H, W, cfg.random_alpha, cfg.random_s, cfg.random_tx,
            cfg.random_ty, cfg.random_t_tps_for_afftps))), batch)

    def warpmask_body(eps, k, b):
        keys = jax.random.split(k, B)
        flows = jax.lax.stop_gradient(jax.vmap(
            lambda kk: composite_flow(kk, L, L, **flow_kwargs))(keys))
        img = b["image_trg"] + eps
        warped, _, mask = jax.vmap(apply_synthetic_flow)(img, flows)
        return warped + mask[..., None].astype(warped.dtype)
    run("prime_warpmask", chain(warpmask_body), batch)

    # warp+mask gathered only on the production crop window (out_slice)
    _t0 = (L - C) // 2

    def warpmask_crop_body(eps, k, b):
        keys = jax.random.split(k, B)
        flows = jax.lax.stop_gradient(jax.vmap(
            lambda kk: composite_flow(kk, L, L, **flow_kwargs))(keys))
        img = b["image_trg"] + eps
        warped, _, mask = jax.vmap(
            lambda im, fl: apply_synthetic_flow(
                im, fl, out_slice=(_t0, _t0, C, C)))(img, flows)
        return warped + mask[..., None].astype(warped.dtype)
    run("prime_warpmask_crop", chain(warpmask_crop_body), batch)

    # --- frozen VGG pyramids: 3 sets x 2 resolutions at crop size
    bb_cast = cast_floating(state.backbone_params, cdt)

    def vgg_body(eps, k, bp, ii, jj, pp):
        pyrs, pyrs256 = extract_pyramids(
            backbone, bp, ii + eps.astype(cdt), jj + eps.astype(cdt),
            pp + eps.astype(cdt))
        return pyrs[0][0]  # finest ref level
    run("vgg", chain(vgg_body), bb_cast, img_i, img_j, img_p)

    # --- one head pass (fwd), with and without uncertainty
    def mk_head_body(h, hv):
        def head_body(eps, k, bp, hv_, ii, jj):
            pyrs, pyrs256 = extract_pyramids(
                backbone, bp, ii + eps.astype(cdt), jj + eps.astype(cdt),
                (0.5 * (ii + jj)) + eps.astype(cdt))
            out = h.apply(hv_, pyrs[2], pyrs[0], pyrs256[2], pyrs256[0],
                          (C, C), train=True, mutable=["batch_stats"])[0]
            last = out[-1]
            return last[0] if isinstance(last, tuple) else last
        return head_body
    hv = {"params": cast_floating(state.params, cdt),
          "batch_stats": state.batch_stats}
    hv_nou = {"params": cast_floating(hvars_nou["params"], cdt),
              "batch_stats": hvars_nou.get("batch_stats", {})}
    run("head1", chain(mk_head_body(head, hv)), bb_cast, hv, img_i, img_j)
    run("head1_nou", chain(mk_head_body(head_nou, hv_nou)), bb_cast,
        hv_nou, img_i, img_j)

    # --- head without the two RefinementModules (dilated chains at 32^2
    # and 130^2) — isolates their share of the pass
    head_noref = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True,
                             refinement_at_adaptive_res=False,
                             refinement_at_finest_level=False)
    if only is None or "head1_noref" in only:
        with jax.default_device(cpu):
            hvars_noref = head_noref.init(key, feats, feats, f256, f256,
                                          (C, C))
        hv_noref = jax.device_put(
            {"params": cast_floating(hvars_noref["params"], cdt),
             "batch_stats": hvars_noref.get("batch_stats", {})},
            jax.devices()[0])
        run("head1_noref", chain(mk_head_body(head_noref, hv_noref)),
            bb_cast, hv_noref, img_i, img_j)

    # --- full loss forward (3 passes + both losses), no grad
    def fwd3_body(eps, k, st, b):
        b2 = {kk: vv + eps for kk, vv in b.items()}
        images_ref, images_trg = b2["image_ref"], b2["image_trg"]
        prime = jax.lax.stop_gradient(prepare_alignment_batch(
            k, images_ref, images_trg, cfg))
        idx = prime["prime_trg_idx"]
        th, tw = cfg.crop_after_flow
        h0 = images_trg.shape[1]
        top = int(round((h0 - th) / 2.0))
        cc = lambda x: x[:, top:top + th, top:top + tw]
        images_ref, images_trg = cc(images_ref), cc(images_trg)
        prime = dict(prime, image_prime=cc(prime["image_prime"]),
                     flow_prime=cc(prime["flow_prime"]),
                     mask_prime=cc(prime["mask_prime"]))
        pyrs, pyrs256 = jax.lax.stop_gradient(extract_pyramids(
            backbone, cast_floating(st.backbone_params, cdt),
            images_ref.astype(cdt), images_trg.astype(cdt),
            prime["image_prime"].astype(cdt)))
        pyr_ref, pyr_trg, pyr_prime = pyrs
        pyr_ref_256, pyr_trg_256, pyr_prime_256 = pyrs256
        pyr_i = _select(idx, pyr_ref, pyr_trg)
        pyr_j = _select(1 - idx, pyr_ref, pyr_trg)
        pyr_i_256 = _select(idx, pyr_ref_256, pyr_trg_256)
        pyr_j_256 = _select(1 - idx, pyr_ref_256, pyr_trg_256)
        vs = {"params": cast_floating(st.params, cdt),
              "batch_stats": st.batch_stats}
        hp = lambda t, s, t2, s2: head.apply(
            vs, t, s, t2, s2, (th, tw), train=True,
            mutable=["batch_stats"])[0]
        prime_i = hp(pyr_prime, pyr_i, pyr_prime_256, pyr_i_256)
        prime_j = hp(pyr_prime, pyr_j, pyr_prime_256, pyr_j_256)
        j_i = hp(pyr_j, pyr_i, pyr_j_256, pyr_i_256)
        ss = multi_scale_flow_loss(prime_i, prime["flow_prime"],
                                   prime["mask_prime"],
                                   loss_type=cfg.loss_type)
        us = wbipath_loss(prime_j, j_i, prime["flow_prime"],
                          prime["mask_prime"], loss_type=cfg.loss_type,
                          visibility_mask=cfg.visibility_mask,
                          alpha_1=cfg.alpha_1, alpha_2=cfg.alpha_2)
        w_ss, w_us = adaptive_loss_weights(
            jax.lax.stop_gradient(ss), jax.lax.stop_gradient(us),
            weight_ss=0.0)
        return (w_ss * ss + w_us * us).reshape(1)
    run("fwd3", chain(fwd3_body), state, batch)

    # --- grad of ONE pass + ss loss
    def grad1_body(eps, k, st, b):
        b2 = {kk: vv + eps for kk, vv in b.items()}
        images_ref, images_trg = b2["image_ref"], b2["image_trg"]
        prime = jax.lax.stop_gradient(prepare_alignment_batch(
            k, images_ref, images_trg, cfg))
        th, tw = cfg.crop_after_flow
        h0 = images_trg.shape[1]
        top = int(round((h0 - th) / 2.0))
        cc = lambda x: x[:, top:top + th, top:top + tw]
        images_ref = cc(images_ref)
        prime = dict(prime, image_prime=cc(prime["image_prime"]),
                     flow_prime=cc(prime["flow_prime"]),
                     mask_prime=cc(prime["mask_prime"]))
        pyrs, pyrs256 = jax.lax.stop_gradient(extract_pyramids(
            backbone, cast_floating(st.backbone_params, cdt),
            images_ref.astype(cdt), images_ref.astype(cdt),
            prime["image_prime"].astype(cdt)))

        def loss_fn(p):
            vs = {"params": cast_floating(p, cdt),
                  "batch_stats": st.batch_stats}
            out = head.apply(vs, pyrs[2], pyrs[0], pyrs256[2], pyrs256[0],
                             (th, tw), train=True,
                             mutable=["batch_stats"])[0]
            return multi_scale_flow_loss(out, prime["flow_prime"],
                                         prime["mask_prime"],
                                         loss_type=cfg.loss_type)
        l, g = jax.value_and_grad(loss_fn)(st.params)
        gsum = jax.tree_util.tree_reduce(
            lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, 0.0)
        return (l + gsum).reshape(1)
    run("grad1", chain(grad1_body), state, batch)

    # --- one pass + ss loss fwd+bwd on PRECOMPUTED pyramids (no prime, no
    # VGG): isolates the differentiated core.  Variants: no-uncertainty,
    # and corr backward through XLA vs the Pallas fwd default.
    def mk_passgrad(h, hv_full, use_pallas_env):
        def passgrad_body(eps, k, st, b):
            old = os.environ.get("REFIGN_TPU_CORR_PALLAS")
            if use_pallas_env is not None:
                os.environ["REFIGN_TPU_CORR_PALLAS"] = use_pallas_env
            try:
                ii = img_i + eps.astype(cdt)
                jj = img_j + eps.astype(cdt)
                pyrs, pyrs256 = jax.lax.stop_gradient(extract_pyramids(
                    backbone, bb_cast, ii, jj, 0.5 * (ii + jj)))
                gtf = jax.lax.stop_gradient(
                    jnp.zeros((B, C, C, 2), jnp.float32) + eps)

                def loss_fn(p):
                    vs = {"params": cast_floating(p, cdt),
                          "batch_stats": hv_full["batch_stats"]}
                    out = h.apply(vs, pyrs[2], pyrs[0], pyrs256[2],
                                  pyrs256[0], (C, C), train=True,
                                  mutable=["batch_stats"])[0]
                    return multi_scale_flow_loss(out, gtf, None,
                                                 loss_type=cfg.loss_type)
                l, g = jax.value_and_grad(loss_fn)(hv_full["params"])
                gsum = jax.tree_util.tree_reduce(
                    lambda a, x: a + jnp.sum(x.astype(jnp.float32)), g, 0.0)
                return (l + gsum).reshape(1)
            finally:
                if use_pallas_env is not None:
                    if old is None:
                        os.environ.pop("REFIGN_TPU_CORR_PALLAS", None)
                    else:
                        os.environ["REFIGN_TPU_CORR_PALLAS"] = old
        return passgrad_body
    run("passgrad", chain(mk_passgrad(head, hv, None)), state, batch)
    run("passgrad_nou", chain(mk_passgrad(head_nou, hv_nou, None)), state,
        batch)
    run("passgrad_corrxla", chain(mk_passgrad(head, hv, "0")), state, batch)

    # --- production step (and the dots-remat variant)
    def mk_full_scan(step_fn):
        def full_scan(st, b):
            def body(carry, k):
                st_c, eps = carry
                b2 = {kk: vv + eps for kk, vv in b.items()}
                new_st, logs = step_fn(st_c, b2, k)
                loss = logs["train_matching_loss"]
                return (new_st, loss * 0.0), loss
            (st2, _), losses = jax.lax.scan(body, (st, jnp.float32(0.0)),
                                            jax.random.split(key, K))
            return losses[-1]
        return full_scan
    run("full", mk_full_scan(make_align_train_step(backbone, head, tx,
                                                   cfg)), state, batch)
    cfg_dots = dataclasses.replace(cfg, remat_head_policy="dots")
    run("full_dots", mk_full_scan(make_align_train_step(
        backbone, head, tx, cfg_dots)), state, batch)

    print(json.dumps({"probe": "summary", "ms": {k: round(v, 1)
                                                 for k, v in probes.items()},
                      "geometry": f"vgg16+uawarpc load{L} crop{C} b{B}"}),
          flush=True)


if __name__ == "__main__":
    main()
