"""Folded 3B-batched UAWarpC train step == three serial head passes.

r5 optimization (r4 verdict next-round #1b): the alignment step's three
differentiated head passes fold into ONE 3B-batched apply.  Exactness
rests on grouped BN (TorchBatchNorm.groups / _PackedBN.groups): per-group
batch statistics + sequential running-stat EMA in group order reproduce
what three serial train-mode BN calls compute.  These tests pin both the
BN unit semantics and the end-to-end step equivalence.
"""
import jax
import jax.numpy as jnp
import numpy as np

from refign_tpu.alignment.trainer import (AlignConfig, init_align_state,
                                          make_align_train_step)
from refign_tpu.models.heads.uawarpc import UAWarpCHead
from refign_tpu.models.vgg import VGG
from refign_tpu.nn.layers import TorchBatchNorm
from refign_tpu.train.optim import make_adam_optimizer


def test_grouped_bn_equals_serial_calls():
    rng = np.random.RandomState(0)
    G, B, H, W, C = 3, 2, 5, 7, 4
    xs = [jnp.asarray(rng.randn(B, H, W, C), jnp.float32) for _ in range(G)]

    bn1 = TorchBatchNorm()
    v = bn1.init(jax.random.PRNGKey(0), xs[0], use_running_average=False)
    stats = v["batch_stats"]
    outs = []
    for x in xs:  # serial train-mode calls threading the running stats
        y, mut = bn1.apply({"params": v["params"], "batch_stats": stats},
                           x, use_running_average=False,
                           mutable=["batch_stats"])
        stats = mut["batch_stats"]
        outs.append(np.asarray(y))

    bng = TorchBatchNorm(groups=G)
    yg, mutg = bng.apply({"params": v["params"],
                          "batch_stats": v["batch_stats"]},
                         jnp.concatenate(xs), use_running_average=False,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yg), np.concatenate(outs),
                               rtol=1e-5, atol=1e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(mutg["batch_stats"][k]),
                                   np.asarray(stats[k]),
                                   rtol=1e-5, atol=1e-7,
                                   err_msg=f"running {k} diverged")


def test_grouped_packed_bn_equals_serial_calls():
    from refign_tpu.models.matching_modules import _PackedBN
    rng = np.random.RandomState(1)
    G, B, H, W, P, C = 3, 2, 4, 4, 5, 8
    xs = [jnp.asarray(rng.randn(B, H, W, P * C), jnp.float32)
          for _ in range(G)]
    bn1 = _PackedBN(C)
    v = bn1.init(jax.random.PRNGKey(0), xs[0], use_running_average=False)
    stats = v["batch_stats"]
    outs = []
    for x in xs:
        y, mut = bn1.apply({"params": v["params"], "batch_stats": stats},
                           x, use_running_average=False,
                           mutable=["batch_stats"])
        stats = mut["batch_stats"]
        outs.append(np.asarray(y))
    bng = _PackedBN(C, groups=G)
    yg, mutg = bng.apply({"params": v["params"],
                          "batch_stats": v["batch_stats"]},
                         jnp.concatenate(xs), use_running_average=False,
                         mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(yg), np.concatenate(outs),
                               rtol=1e-5, atol=1e-6)
    for k in ("mean", "var"):
        np.testing.assert_allclose(np.asarray(mutg["batch_stats"][k]),
                                   np.asarray(stats[k]),
                                   rtol=1e-5, atol=1e-7)


def _setup(seed=7):
    backbone = VGG(model_type="vgg11", out_indices=(2, 3, 4))
    head = UAWarpCHead(in_index=(0, 1), estimate_uncertainty=True)
    key = jax.random.PRNGKey(0)
    rng = np.random.RandomState(seed)
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
    return backbone, head, hvars, bvars, tx, batch, key


def _run_two_steps(backbone, head, hvars, bvars, tx, batch, key, **cfg_kw):
    cfg = AlignConfig(visibility_mask=True, compute_dtype="float32",
                      **cfg_kw)
    state = init_align_state(hvars, bvars["params"], tx)
    step = jax.jit(make_align_train_step(backbone, head, tx, cfg))
    state, logs1 = step(state, batch, key)
    state, logs2 = step(state, batch, jax.random.fold_in(key, 1))
    return state, logs1, logs2


def test_folded_step_matches_three_serial_passes():
    """fold_passes=True: identical losses on step 1 AND step 2 (step 2
    only matches if step 1's params, opt state and BN running stats all
    came out the same), same updated params, same running stats."""
    setup = _setup()
    s_ref, l1_ref, l2_ref = _run_two_steps(*setup)
    s_fold, l1_fold, l2_fold = _run_two_steps(*setup, fold_passes=True)

    for lref, lfold, tag in ((l1_ref, l1_fold, "step1"),
                             (l2_ref, l2_fold, "step2")):
        for k in ("train_matching_loss", "loss_ss", "loss_us"):
            np.testing.assert_allclose(
                float(lfold[k]), float(lref[k]), rtol=2e-4,
                err_msg=f"{tag} {k}")

    # flip-tolerant param bound: Adam's first-step update is ~±lr per
    # param; a fp32-reassociation-level difference in a NEAR-ZERO gradient
    # flips that param by 2*lr per step (measured: 2.0e-4 after step 1
    # with bit-identical losses; a single element of 147k at 3.5e-4 after
    # step 2).  Anything structural would sit far above 5*lr.
    for a, b in zip(jax.tree_util.tree_leaves(s_fold.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)
    # step-2 running stats see activations computed with the flipped
    # params, so their bound is the flip magnitude, not fp noise
    # (measured max 3.0e-4 with step-2 losses matching to 3e-5 rel)
    for a, b in zip(jax.tree_util.tree_leaves(s_fold.batch_stats),
                    jax.tree_util.tree_leaves(s_ref.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-4)


def test_folded_step_with_module_remat_matches():
    """fold_passes + remat_modules (the production HBM-fitting config)
    must not change the math (jax.checkpoint is recompute-only)."""
    setup = _setup(seed=11)
    s_ref, l1_ref, _ = _run_two_steps(*setup, fold_passes=True)
    s_rm, l1_rm, _ = _run_two_steps(*setup, fold_passes=True,
                                    remat_modules=True)
    for k in ("train_matching_loss", "loss_ss", "loss_us"):
        np.testing.assert_allclose(float(l1_rm[k]), float(l1_ref[k]),
                                   rtol=1e-6, err_msg=k)
    for a, b in zip(jax.tree_util.tree_leaves(s_rm.params),
                    jax.tree_util.tree_leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_patchconv_toeplitz_matrix_matches_scatter_build():
    """The pad/tile/reshape Toeplitz construction of _PatchConv's
    structured matmul matrix must reproduce the r4 scatter build
    (M.at[in_idx, out_idx].set(kernel[w_idx])) EXACTLY — same band, same
    kernel entry per slot, zeros elsewhere — at every layer geometry of
    the uncertainty decoders.  (The scatter build lowered to a serial
    per-element TPU loop costing ~33 ms of the 148 ms head pass;
    artifacts/align_profile_passgrad_r05.txt.)"""
    from refign_tpu.models.matching_modules import _toeplitz_expand

    rng = np.random.RandomState(3)
    for (ih, iw, cin, cout) in [(9, 9, 1, 32), (7, 7, 32, 32),
                                (5, 5, 32, 16), (3, 3, 16, 6)]:
        k = 3
        oh, ow = ih - k + 1, iw - k + 1
        kernel = rng.randn(k, k, cin, cout).astype(np.float32)
        M_ref = np.zeros((ih * iw * cin, oh * ow * cout), np.float32)
        for oy in range(oh):
            for ox in range(ow):
                for dy in range(k):
                    for dx in range(k):
                        M_ref[np.arange(cin)[:, None]
                              + (((oy + dy) * iw + ox + dx) * cin),
                              np.arange(cout)[None, :]
                              + ((oy * ow + ox) * cout)] = kernel[dy, dx]
        a = _toeplitz_expand(jnp.asarray(kernel), ih, oh)
        a = jnp.moveaxis(a, 2, 0)
        b = _toeplitz_expand(a, iw, ow)
        M_new = np.asarray(jnp.transpose(b, (3, 1, 4, 2, 0, 5)).reshape(
            ih * iw * cin, oh * ow * cout))
        np.testing.assert_array_equal(M_new, M_ref, err_msg=str((ih, cin)))
