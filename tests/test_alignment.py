"""Alignment training: loss oracles vs reference torch, synthetic-flow
geometry oracles, and a train-step smoke test."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_oracle
from refign_tpu.alignment.losses import (adaptive_loss_weights,
                                         multi_scale_flow_loss, wbipath_loss)
from refign_tpu.alignment.synthetic_flows import (apply_synthetic_flow,
                                                  homography_mapping,
                                                  tps_mapping)
from refign_tpu.alignment.trainer import (AlignConfig, align_forward,
                                          init_align_state,
                                          make_align_train_step,
                                          prepare_alignment_batch)
from refign_tpu.models.heads.uawarpc import UAWarpCHead
from refign_tpu.models.vgg import VGG
from refign_tpu.train.optim import make_adam_optimizer


def _nchw(a):
    return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))


def _pyramid(rng, B, shapes):
    """[(flow (B,h,w,2), uncert (B,h,w,1))] random pyramid."""
    return [
        (rng.randn(B, h, w, 2).astype(np.float32) * 3,
         rng.randn(B, h, w, 1).astype(np.float32))
        for (h, w) in shapes
    ]


def test_multiscale_flow_loss_matches_reference():
    losses = ref_oracle.load_ref_module("models.losses")
    ref_loss = losses.MultiScaleFlowLoss(loss_type="HuberLoss")
    rng = np.random.RandomState(0)
    B, H, W = 2, 32, 48
    pyr = _pyramid(rng, B, [(4, 6), (8, 12), (16, 24), (32, 48)])
    gt = rng.randn(B, H, W, 2).astype(np.float32) * 3
    mask = (rng.rand(B, H, W) > 0.3)

    pyr_t = [(_nchw(f), _nchw(u)) for f, u in pyr]
    want = ref_loss(pyr_t, _nchw(gt), mask=torch.from_numpy(mask)).item()
    got = float(multi_scale_flow_loss(
        [(jnp.asarray(f), jnp.asarray(u)) for f, u in pyr],
        jnp.asarray(gt), jnp.asarray(mask), loss_type="HuberLoss"))
    assert abs(got - want) < 1e-3 * max(1, abs(want)), (got, want)


def test_wbipath_loss_matches_reference():
    losses = ref_oracle.load_ref_module("models.losses")
    ref_loss = losses.WBipathLoss(objective="multi_scale_flow_loss",
                                  loss_type="HuberLoss")
    rng = np.random.RandomState(1)
    B, H, W = 2, 32, 48
    shapes = [(4, 6), (8, 12), (16, 24), (32, 48)]
    pyr_a = _pyramid(rng, B, shapes)
    pyr_b = _pyramid(rng, B, shapes)
    gt = rng.randn(B, H, W, 2).astype(np.float32) * 3
    mask = (rng.rand(B, H, W) > 0.3)

    want = ref_loss(
        [(_nchw(f), _nchw(u)) for f, u in pyr_a],
        [(_nchw(f), _nchw(u)) for f, u in pyr_b],
        _nchw(gt), torch.from_numpy(mask)).item()
    got = float(wbipath_loss(
        [(jnp.asarray(f), jnp.asarray(u)) for f, u in pyr_a],
        [(jnp.asarray(f), jnp.asarray(u)) for f, u in pyr_b],
        jnp.asarray(gt), jnp.asarray(mask), loss_type="HuberLoss"))
    assert abs(got - want) < 1e-3 * max(1, abs(want)), (got, want)


def test_wbipath_visibility_mask_matches_reference():
    # stage-2 path: WBipathLoss(visibility_mask=True) adds the
    # cyclic-consistency occlusion mask (reference losses.py:233-250,314-318)
    losses = ref_oracle.load_ref_module("models.losses")
    ref_loss = losses.WBipathLoss(objective="multi_scale_flow_loss",
                                  loss_type="HuberLoss",
                                  visibility_mask=True)
    rng = np.random.RandomState(7)
    B, H, W = 2, 32, 48
    shapes = [(4, 6), (8, 12), (16, 24), (32, 48)]
    pyr_a = _pyramid(rng, B, shapes)
    pyr_b = _pyramid(rng, B, shapes)
    gt = rng.randn(B, H, W, 2).astype(np.float32) * 3
    mask = (rng.rand(B, H, W) > 0.3)

    want = ref_loss(
        [(_nchw(f), _nchw(u)) for f, u in pyr_a],
        [(_nchw(f), _nchw(u)) for f, u in pyr_b],
        _nchw(gt), torch.from_numpy(mask)).item()
    got = float(wbipath_loss(
        [(jnp.asarray(f), jnp.asarray(u)) for f, u in pyr_a],
        [(jnp.asarray(f), jnp.asarray(u)) for f, u in pyr_b],
        jnp.asarray(gt), jnp.asarray(mask), loss_type="HuberLoss",
        visibility_mask=True))
    assert abs(got - want) < 1e-3 * max(1, abs(want)), (got, want)
    # the mask must actually bite: loss differs from the unmasked variant
    got_off = float(wbipath_loss(
        [(jnp.asarray(f), jnp.asarray(u)) for f, u in pyr_a],
        [(jnp.asarray(f), jnp.asarray(u)) for f, u in pyr_b],
        jnp.asarray(gt), jnp.asarray(mask), loss_type="HuberLoss"))
    assert abs(got - got_off) > 1e-6, (got, got_off)


def test_adaptive_weights_match_reference_formula():
    # expected values hand-derived from alignment_model.py:217-232 with the
    # reference's positional-arg quirk (apply_constant_flow_weights=False
    # lands in weight_ss -> ratio = 0):
    #   loss_un > loss_ss: s = clamp(un/ss * 0) = 0, u = 1
    #   else:              s = 1, u = clamp(ss/un / 0) = inf -> 100
    cases = [
        ((1.0, 2.0), (0.0, 1.0)),
        ((2.0, 1.0), (1.0, 100.0)),
        ((0.5, 0.50001), (0.0, 1.0)),
    ]
    for (ss, us), want in cases:
        got = adaptive_loss_weights(jnp.asarray(ss), jnp.asarray(us),
                                    weight_ss=0.0)
        assert abs(float(got[0]) - want[0]) < 1e-4, (ss, us, got, want)
        assert abs(float(got[1]) - want[1]) < 1e-4, (ss, us, got, want)

    # sane mode: weight_ss=1 (ratio 1) gives the intended adaptive weights
    got = adaptive_loss_weights(jnp.asarray(1.0), jnp.asarray(3.0),
                                weight_ss=1.0)
    assert abs(float(got[0]) - 3.0) < 1e-4 and abs(float(got[1]) - 1.0) < 1e-4


def test_homography_identity_and_oracle():
    # zero perturbation -> identity mapping -> zero flow
    from refign_tpu.ops.warp import unnormalize_mapping_to_flow
    m = homography_mapping(jax.random.PRNGKey(0), 16, 20, random_t_hom=0.0)
    flow = unnormalize_mapping_to_flow(m)
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-4)

    # oracle: same theta through the reference DLT solve
    tr = ref_oracle.load_ref_module("data_modules.transforms")
    rand_vals = torch.tensor([0.1, 0.9, 0.3, 0.7, 0.5, 0.2, 0.8, 0.4])
    orig_rand = torch.rand
    try:
        torch.rand = lambda *a, **k: rand_vals.clone()
        want = tr.RandomHomography.get_params(0.333, 16, 20, False,
                                              "cpu").numpy()
    finally:
        torch.rand = orig_rand
    # same theta through my DLT path
    base = jnp.array([-1., -1., 1., 1., -1., 1., -1., 1.])
    theta = base + (jnp.asarray(rand_vals.numpy()) - 0.5) * 2 * 0.333
    got = np.asarray(homography_mapping(None, 16, 20, theta=theta))
    np.testing.assert_allclose(got, want[0], rtol=1e-4, atol=1e-4)


def test_tps_oracle():
    tr = ref_oracle.load_ref_module("data_modules.transforms")
    ref_tps = tr.RandomTPS(random_t_tps=0.333)
    rand_vals = torch.linspace(0.05, 0.95, 18)
    orig_rand = torch.rand
    try:
        torch.rand = lambda *a, **k: rand_vals.clone()
        want = ref_tps.get_params(0.333, 12, 18, ref_tps.N, ref_tps.Li,
                                  ref_tps.P_X, ref_tps.P_Y, False,
                                  "cpu").numpy()
    finally:
        torch.rand = orig_rand

    from refign_tpu.alignment.synthetic_flows import _tps_control
    P_X, P_Y, Li, N = _tps_control(3)
    base = jnp.concatenate([jnp.asarray(P_X), jnp.asarray(P_Y)])
    theta = base + (jnp.asarray(rand_vals.numpy()) - 0.5) * 2 * 0.333
    got = np.asarray(tps_mapping(None, 12, 18, theta=theta))
    np.testing.assert_allclose(got, want[0], rtol=1e-3, atol=1e-4)


def test_afftps_analytic_compose_matches_grid_sample():
    """afftps_mapping composes affine-of-TPS analytically (the affine field
    is linear, so each of grid_sample's corner reads is A @ grid + t) —
    it must reproduce the reference's gather formulation exactly:
    grid_sample(sentineled affine image, tps coords, align_corners=True,
    padding_mode=zeros) then re-sentinel (transforms.py:1084-1109).
    Includes the OOB-sentinel bleed regions (values ~1e10)."""
    from refign_tpu.alignment.synthetic_flows import (_affine_params,
                                                      _oob_sentinel,
                                                      _oob_sentinel_wrt,
                                                      afftps_mapping,
                                                      tps_mapping)
    from refign_tpu.ops.warp import grid_sample

    for seed, (H, W) in ((0, (40, 56)), (7, (33, 33)), (13, (75, 75))):
        rng = jax.random.PRNGKey(seed)
        # large perturbations so the sentinel/padding branches are hit
        got = np.asarray(afftps_mapping(rng, H, W, random_alpha=0.26,
                                        random_s=0.9, random_tx=0.6,
                                        random_ty=0.6,
                                        random_t_tps_for_afftps=0.3))
        ka, kt = jax.random.split(rng)
        A, t = _affine_params(ka, 0.26, 0.9, 0.6, 0.6, True)
        gx_, gy_ = np.meshgrid((2.0 * np.arange(W) + 1.0) / W - 1.0,
                               (2.0 * np.arange(H) + 1.0) / H - 1.0)
        A = np.asarray(A)
        t = np.asarray(t)
        aff = jnp.asarray(np.stack([A[0, 0] * gx_ + A[0, 1] * gy_ + t[0],
                                    A[1, 0] * gx_ + A[1, 1] * gy_ + t[1]],
                                   axis=-1), jnp.float32)
        tps = tps_mapping(kt, H, W, 0.3)
        want = _oob_sentinel_wrt(
            grid_sample(_oob_sentinel(aff)[None], tps[None],
                        align_corners=True, padding_mode="zeros")[0], tps)
        want = np.asarray(want)
        assert (np.abs(got) > 1e8).any() or seed != 13, \
            "test should exercise sentinel regions at least once"
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-5)


def test_apply_synthetic_flow_out_slice_equals_full_then_crop():
    """out_slice computes the warp only on the crop window; it must equal
    warping at full resolution then slicing — including the
    too-small-border-mask fallback, whose sum stays on the FULL grid."""
    from refign_tpu.alignment.synthetic_flows import composite_flow
    rng = np.random.RandomState(5)
    H = W = 48
    top, left, th, tw = 7, 9, 24, 26
    img = jnp.asarray(rng.rand(H, W, 3).astype(np.float32))
    flows = [
        np.asarray(composite_flow(jax.random.PRNGKey(3), H, W)),
        # huge displacement -> border mask nearly empty -> too_small branch
        np.full((H, W, 2), 3.0 * W, np.float32),
    ]
    for fl in flows:
        fl = jnp.asarray(fl)
        w_full, f_full, m_full = apply_synthetic_flow(img, fl)
        w_s, f_s, m_s = apply_synthetic_flow(
            img, fl, out_slice=(top, left, th, tw))
        sl = (slice(top, top + th), slice(left, left + tw))
        np.testing.assert_array_equal(np.asarray(w_full)[sl],
                                      np.asarray(w_s))
        np.testing.assert_array_equal(np.asarray(f_full)[sl],
                                      np.asarray(f_s))
        np.testing.assert_array_equal(np.asarray(m_full)[sl],
                                      np.asarray(m_s))


def test_apply_synthetic_flow_masks():
    rng = np.random.RandomState(2)
    img = rng.rand(16, 20, 3).astype(np.float32)
    flow = np.zeros((16, 20, 2), np.float32)
    flow[..., 0] = 3.0  # shift right: last 3 source columns out of bounds
    warped, f, mask = apply_synthetic_flow(jnp.asarray(img),
                                           jnp.asarray(flow))
    mask = np.asarray(mask)
    # warp mask uses strict in-bounds tests: border rows (y=0, y=H-1 at zero
    # y-flow) are excluded, interior columns valid up to x=15 (x+3 < W-1)
    assert mask[1:-1, :16].all()
    assert not mask[:, 17:].any()
    assert not mask[0].any() and not mask[-1].any()


def test_align_train_step_runs():
    backbone = VGG(model_type="vgg11", out_indices=(2, 3, 4))
    head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(3)
    B, H, W = 2, 64, 64
    batch = {
        "image_ref": rng.randn(B, H, W, 3).astype(np.float32),
        "image_trg": rng.randn(B, H, W, 3).astype(np.float32),
    }
    bvars = backbone.init(key, np.zeros((1, 256, 256, 3), np.float32))
    feats = backbone.apply(bvars, np.zeros((1, H, W, 3), np.float32),
                           extract_only_indices=[-3, -2])
    feats256 = backbone.apply(bvars, np.zeros((1, 256, 256, 3), np.float32),
                              extract_only_indices=[-2, -1])
    hvars = head.init(key, feats, feats, feats256, feats256, (H, W))

    cfg = AlignConfig()
    tx, _ = make_adam_optimizer(1e-4, [100], weight_decay=4e-4)
    state = init_align_state(hvars, bvars["params"], tx)
    step = jax.jit(make_align_train_step(backbone, head, tx, cfg))
    new_state, logs = step(state, batch, key)
    assert np.isfinite(float(logs["train_matching_loss"]))
    assert np.isfinite(float(logs["loss_ss"]))
    assert np.isfinite(float(logs["loss_us"]))
    assert int(new_state.step) == 1
    # frozen backbone unchanged
    b0 = jax.tree_util.tree_leaves(state.backbone_params)[0]
    b1 = jax.tree_util.tree_leaves(new_state.backbone_params)[0]
    np.testing.assert_array_equal(np.asarray(b0), np.asarray(b1))

    # inference path
    flow, uncert = align_forward(backbone, head, bvars["params"],
                                 {"params": new_state.params,
                                  "batch_stats": new_state.batch_stats},
                                 batch["image_trg"], batch["image_ref"])
    assert flow.shape == (B, H, W, 2)
    assert uncert.shape == (B, H, W, 1)
    assert np.isfinite(np.asarray(flow)).all()


def test_prime_photometric_and_crop_after_flow():
    """Device-side prime view reproduces the reference's image_prime-only
    host transforms (ColorJitter 0.6 + ChannelShuffle + GaussianBlur) and
    the CenterCrop-AFTER-CompositeFlow order (750 -> flow -> 520)."""
    import jax
    import jax.numpy as jnp
    from refign_tpu.alignment.trainer import (AlignConfig,
                                              prepare_alignment_batch)

    rng = np.random.RandomState(7)
    B, H, W = 2, 48, 48
    ref = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32) * 0.3
    trg = jnp.asarray(rng.randn(B, H, W, 3), jnp.float32) * 0.3
    key = jax.random.PRNGKey(3)

    plain = AlignConfig()
    aug = AlignConfig(prime_jitter=(0.6, 0.6, 0.6, 0.0),
                      prime_channel_shuffle=True,
                      prime_blur=(0.2, 7, 0.2, 2.0))
    out_plain = prepare_alignment_batch(key, ref, trg, plain)
    out_aug = prepare_alignment_batch(key, ref, trg, aug)
    # photometric augs change the prime image but not the flow supervision
    assert not np.allclose(np.asarray(out_plain["image_prime"]),
                           np.asarray(out_aug["image_prime"]))
    np.testing.assert_array_equal(np.asarray(out_plain["flow_prime"]),
                                  np.asarray(out_aug["flow_prime"]))
    np.testing.assert_array_equal(np.asarray(out_plain["mask_prime"]),
                                  np.asarray(out_aug["mask_prime"]))
    # deterministic under the same key
    out_aug2 = prepare_alignment_batch(key, ref, trg, aug)
    np.testing.assert_array_equal(np.asarray(out_aug["image_prime"]),
                                  np.asarray(out_aug2["image_prime"]))

    # crop-after-flow: the train step crops images/prime/flow consistently
    from refign_tpu.alignment.trainer import make_align_train_step
    from refign_tpu.models.heads.uawarpc import UAWarpCHead
    from refign_tpu.models.vgg import VGG
    from refign_tpu.train.optim import make_adam_optimizer
    from refign_tpu.alignment.trainer import init_align_state

    backbone = VGG(model_type="vgg11", out_indices=(2, 3, 4))
    head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
    kk = jax.random.PRNGKey(0)
    Hf, Wf, Hc, Wc = 64, 64, 32, 32
    bv = backbone.init(kk, np.zeros((1, 256, 256, 3), np.float32))
    feats = backbone.apply(bv, np.zeros((1, Hc, Wc, 3), np.float32),
                           extract_only_indices=[-3, -2])
    f256 = backbone.apply(bv, np.zeros((1, 256, 256, 3), np.float32),
                          extract_only_indices=[-2, -1])
    hv = head.init(kk, feats, feats, f256, f256, (Hc, Wc))
    tx, _ = make_adam_optimizer(1e-4, [100], weight_decay=4e-4)
    state = init_align_state(hv, bv["params"], tx)
    cfg = AlignConfig(crop_after_flow=(Hc, Wc), compute_dtype="float32",
                      prime_jitter=(0.6, 0.6, 0.6, 0.0),
                      prime_channel_shuffle=True,
                      prime_blur=(0.2, 7, 0.2, 2.0))
    step = jax.jit(make_align_train_step(backbone, head, tx, cfg))
    batch = {"image_ref": jnp.asarray(rng.randn(B, Hf, Wf, 3), jnp.float32),
             "image_trg": jnp.asarray(rng.randn(B, Hf, Wf, 3), jnp.float32)}
    new_state, logs = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(logs["train_matching_loss"]))
    assert int(new_state.step) == 1


def test_align_train_step_remat_head_numerics_identical():
    """remat_head (AlignConfig) recomputes the three differentiated UAWarpC
    passes in backward instead of keeping all their activations live — the
    memory fix that lets the production stage geometry (520^2 b6,
    uawarpc_stage1.yaml) fit the v5e's 15.75 GB HBM (without it the step
    needs 28.4 GB).  jax.checkpoint must not change a single bit of math."""
    backbone = VGG(model_type="vgg11", out_indices=(2, 3, 4))
    head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(5)
    B, H, W = 2, 64, 64
    batch = {
        "image_ref": rng.randn(B, H, W, 3).astype(np.float32),
        "image_trg": rng.randn(B, H, W, 3).astype(np.float32),
    }
    bvars = backbone.init(key, np.zeros((1, 256, 256, 3), np.float32))
    feats = backbone.apply(bvars, np.zeros((1, H, W, 3), np.float32),
                           extract_only_indices=[-3, -2])
    feats256 = backbone.apply(bvars, np.zeros((1, 256, 256, 3), np.float32),
                              extract_only_indices=[-2, -1])
    hvars = head.init(key, feats, feats, feats256, feats256, (H, W))
    tx, _ = make_adam_optimizer(1e-4, [100], weight_decay=4e-4)

    out = {}
    variants = {"none": dict(remat_head=False),
                "full": dict(remat_head=True),
                "dots": dict(remat_head=True, remat_head_policy="dots"),
                "skip_last": dict(remat_head=True, remat_skip_last=True)}
    for name, kw in variants.items():
        cfg = AlignConfig(visibility_mask=True, **kw)
        state = init_align_state(hvars, bvars["params"], tx)
        step = jax.jit(make_align_train_step(backbone, head, tx, cfg))
        state, logs = step(state, batch, key)
        state, logs = step(state, batch, jax.random.fold_in(key, 1))
        out[name] = (
            float(logs["train_matching_loss"]),
            float(sum(np.sum(np.square(np.asarray(x)))
                      for x in jax.tree_util.tree_leaves(state.params))))
    # rtol 1e-5, not 1e-6: since the r5 bf16 BN FMA fold (nn/layers.py),
    # XLA may contract the fold's x*a+b with or without a fused
    # multiply-add depending on the surrounding (remat-dependent) fusion
    # — a 1-ulp fp32 difference at bf16 boundaries, measured 5.3e-6 rel
    # on the step-2 loss.  A genuine remat bug would sit orders above.
    np.testing.assert_allclose(out["full"], out["none"], rtol=1e-5)
    np.testing.assert_allclose(out["dots"], out["none"], rtol=1e-5)
    np.testing.assert_allclose(out["skip_last"], out["none"], rtol=1e-5)


def test_align_device_normalize_matches_host_normalize():
    """AlignConfig.device_normalize: a uint8 batch normalized ON DEVICE
    ((x/255 - mean)/std at train-step entry) must produce the same step as
    the host-normalized fp32 batch — the same math moved across the PCIe
    boundary (4x fewer host->device bytes; CombinedDataModule strips the
    trailing ConvertImageDtype+Normalize when device_normalize is on).
    fp32 compute so the comparison is tight-tolerance."""
    backbone = VGG(model_type="vgg11", out_indices=(2, 3, 4))
    head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
    key = jax.random.PRNGKey(5)
    rng = np.random.RandomState(9)
    B, H, W = 2, 64, 64
    MEAN = np.array([0.485, 0.456, 0.406], np.float32)
    STD = np.array([0.229, 0.224, 0.225], np.float32)
    u8 = {
        "image_ref": rng.randint(0, 256, (B, H, W, 3)).astype(np.uint8),
        "image_trg": rng.randint(0, 256, (B, H, W, 3)).astype(np.uint8),
    }
    host = {k: (v.astype(np.float32) / 255.0 - MEAN) / STD
            for k, v in u8.items()}

    bvars = backbone.init(key, np.zeros((1, 256, 256, 3), np.float32))
    feats = backbone.apply(bvars, np.zeros((1, H, W, 3), np.float32),
                           extract_only_indices=[-3, -2])
    feats256 = backbone.apply(bvars, np.zeros((1, 256, 256, 3), np.float32),
                              extract_only_indices=[-2, -1])
    hvars = head.init(key, feats, feats, feats256, feats256, (H, W))
    tx, _ = make_adam_optimizer(1e-4, [100], weight_decay=4e-4)

    out = {}
    for name, cfg, batch in (
            ("host", AlignConfig(compute_dtype="float32"), host),
            ("device", AlignConfig(compute_dtype="float32",
                                   device_normalize=True), u8)):
        state = init_align_state(hvars, bvars["params"], tx)
        step = jax.jit(make_align_train_step(backbone, head, tx, cfg))
        state, logs = step(state, batch, key)
        out[name] = {k: float(v) for k, v in logs.items()}
    for k in out["host"]:
        np.testing.assert_allclose(
            out["device"][k], out["host"][k], rtol=1e-6, atol=1e-7,
            err_msg=f"{k} diverged between host and device normalize")
