"""UAWarpC coarse-to-fine uncertainty-aware dense matching head.

TPU-native re-implementation of the reference head
(models/heads/uawarpc.py:17-305), a GLU-Net/PDC-Net-style decoder:

  L4 (16x16):  global correlation (mutual matching) -> mapping decoder ->
               normalized map -> flow at 256-scale
  L3 (32x32):  warp source feats by upsampled flow -> local correlation
               (patch 9) -> residual flow decoder (+ adaptive refinement)
  L2 (1/8):    same pattern at original-image scale
  L1 (1/4):    same + upsampled 2-ch feature skip + finest refinement
  Per-level UncertaintyModules chain a 1-ch log-variance across levels.

Layout: NHWC features, channel-last (x, y) flows.  All correlation/warp math
runs in float32 (reference AMP islands, correlation_function.py:51,
matching_utils.py:41-43).

The reference's eval-only ``iterative_refinement`` loop
(uawarpc.py:175-207) has a size-dependent Python loop; here the number of
extra pyramid levels is a static function of ``out_size`` (known at trace
time), so it unrolls into the jitted graph (SURVEY.md §7.1 static-shape
rule).
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from ...ops.correlation import (global_correlation_relu_l2norm,
                                local_correlation_relu_l2norm)
from ...ops.resize import interpolate
from ...ops.warp import unnormalize_mapping_to_flow, warp
from ..matching_modules import (OpticalFlowEstimator, RefinementModule,
                                UncertaintyModule)
from ...nn.layers import conv2d


def _l2norm_channels(x: jax.Array) -> jax.Array:
    # sqrt(max(ss, eps^2)) == max(||x||, eps) with a zero (not NaN) gradient
    # in the clamped branch — torch F.normalize semantics
    x32 = x.astype(jnp.float32)
    ss = jnp.sum(jnp.square(x32), axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.maximum(ss, 1e-24))
    return (x32 / n).astype(x.dtype)


def _scale_flow(flow: jax.Array, sx: float, sy: float) -> jax.Array:
    return jnp.stack([flow[..., 0] * sx, flow[..., 1] * sy], axis=-1)


class UAWarpCHead(nn.Module):
    in_index: Sequence[int] = (0, 1)
    batch_norm: bool = True
    refinement_at_adaptive_res: bool = True
    refinement_at_finest_level: bool = True
    estimate_uncertainty: bool = True
    iterative_refinement: bool = False
    bn_axis_name: Optional[str] = None
    # bn_groups=G: train-mode BN statistics are computed per-group over a
    # batch stacking G logical head calls along axis 0, with sequential
    # running-stat EMA in group order — the exact-math enabler for the
    # folded 3B-batched alignment train step (see TorchBatchNorm.groups)
    bn_groups: int = 1
    # rematerialize each decoder/refinement/uncertainty submodule in the
    # backward pass: only module boundaries (corr volumes, flows, small
    # feats) stay resident, capping peak HBM at one submodule's internals
    # instead of a whole head pass (finer than AlignConfig.remat_head)
    remat_modules: bool = False

    @nn.compact
    def __call__(self, trg, src, trg_256, src_256,
                 out_size: Tuple[int, int], train: bool = False):
        """Args mirror the reference forward (uawarpc.py:95-99): two-level
        feature pyramids of target/source at native resolution (1/4, 1/8)
        and at 256x256 (1/8 -> 32x32, 1/16 -> 16x16).

        Returns a 4-level list, coarse->fine, of (flow, logvar) tuples when
        ``estimate_uncertainty`` else flows; flows are (B, h, w, 2) in
        out_size pixel units.
        """
        sel = list(self.in_index)
        c11, c12 = [trg[i] for i in sel]        # 1/4, 1/8 of original
        c13, c14 = [trg_256[i] for i in sel]    # 32^2, 16^2
        c21, c22 = [src[i] for i in sel]
        c23, c24 = [src_256[i] for i in sel]
        c11, c12, c13, c14, c21, c22, c23, c24 = map(
            _l2norm_channels, (c11, c12, c13, c14, c21, c22, c23, c24))

        h_256 = w_256 = 256.0
        h_orig, w_orig = float(out_size[0]), float(out_size[1])
        diag_ratio_log = 2 * math.log(
            math.sqrt(h_orig ** 2 + w_orig ** 2)
            / math.sqrt(h_256 ** 2 + w_256 ** 2))
        uncert = self.estimate_uncertainty

        # flax lifted-transform static_argnums count the module itself as
        # argument 0, so `train` sits at position 2 (decoder/refinement)
        # or 5 (uncertainty).  nn.remat preserves the param tree.
        Dec = (nn.remat(OpticalFlowEstimator, static_argnums=(2,))
               if self.remat_modules else OpticalFlowEstimator)
        Ref = (nn.remat(RefinementModule, static_argnums=(2,))
               if self.remat_modules else RefinementModule)
        Unc = (nn.remat(UncertaintyModule, static_argnums=(5,))
               if self.remat_modules else UncertaintyModule)
        decoder4 = Dec(
            batch_norm=self.batch_norm, bn_axis_name=self.bn_axis_name,
            bn_groups=self.bn_groups, name="decoder4")
        decoder3 = Dec(
            batch_norm=self.batch_norm, bn_axis_name=self.bn_axis_name,
            bn_groups=self.bn_groups, name="decoder3")
        decoder2 = Dec(
            batch_norm=self.batch_norm, bn_axis_name=self.bn_axis_name,
            bn_groups=self.bn_groups, name="decoder2")
        decoder1 = Dec(
            batch_norm=self.batch_norm, bn_axis_name=self.bn_axis_name,
            bn_groups=self.bn_groups, name="decoder1")
        if uncert:
            um4 = Unc(search_size=16, batch_norm=self.batch_norm,
                      bn_axis_name=self.bn_axis_name,
                      bn_groups=self.bn_groups,
                      name="estimate_uncertainty_components4")
            um3 = Unc(search_size=9, feed_in_previous=True,
                      batch_norm=self.batch_norm,
                      bn_axis_name=self.bn_axis_name,
                      bn_groups=self.bn_groups,
                      name="estimate_uncertainty_components3")
            um2 = Unc(search_size=9, feed_in_previous=True,
                      batch_norm=self.batch_norm,
                      bn_axis_name=self.bn_axis_name,
                      bn_groups=self.bn_groups,
                      name="estimate_uncertainty_components2")
            um1 = Unc(search_size=9, feed_in_previous=True,
                      batch_norm=self.batch_norm,
                      bn_axis_name=self.bn_axis_name,
                      bn_groups=self.bn_groups,
                      name="estimate_uncertainty_components1")

        # ---- level 4: 16x16 global correlation -> mapping ----
        h4, w4 = c14.shape[1:3]
        assert (h4, w4) == (16, 16), (h4, w4)
        # correlation math runs in fp32 (reference AMP island) but its
        # CONSUMERS (decoders/uncertainty/refinement) run in the compute
        # dtype, matching reference autocast (fp16 decoder convs)
        corr4 = global_correlation_relu_l2norm(c24, c14).astype(
            c14.dtype)  # (B,16,16,256)
        est_map4, x4 = decoder4(corr4, train)
        # decoder stacks run in the compute dtype; the additive flow /
        # log-variance chains stay fp32 (flow magnitudes reach the image
        # size, where bf16 resolution is ~2 px)
        flow4_256 = unnormalize_mapping_to_flow(
            est_map4.astype(jnp.float32))
        flow4_256 = _scale_flow(flow4_256, w_256 / w4, h_256 / h4)
        if uncert:
            u4_256 = um4(corr4, x4, None, None, train).astype(jnp.float32)
            u4_256 = u4_256 + 2 * math.log(w_256 / w4)

        # ---- level 3: 32x32 local correlation ----
        h3, w3 = c13.shape[1:3]
        assert (h3, w3) == (32, 32), (h3, w3)
        up_flow4 = interpolate(flow4_256, (h3, w3), mode="bilinear",
                               align_corners=False)
        if uncert:
            up_u4 = interpolate(u4_256, (h3, w3), mode="bilinear",
                                align_corners=False)
        warp3 = warp(c23, _scale_flow(up_flow4, w3 / w_256, h3 / h_256))
        corr3 = local_correlation_relu_l2norm(
            c13, warp3, patch_size=9).astype(c13.dtype)
        cdt = corr3.dtype
        inp3 = (jnp.concatenate([corr3, up_flow4.astype(cdt),
                                 up_u4.astype(cdt)], axis=-1) if uncert
                else jnp.concatenate([corr3, up_flow4.astype(cdt)],
                                     axis=-1))
        res_flow3, x3 = decoder3(inp3, train)
        if self.refinement_at_adaptive_res:
            res_flow3 = res_flow3 + Ref(
                batch_norm=self.batch_norm, bn_axis_name=self.bn_axis_name,
                bn_groups=self.bn_groups,
                name="refinement_module_adaptive")(x3, train)
        flow3 = res_flow3.astype(jnp.float32) + up_flow4
        if uncert:
            u3 = um3(corr3, x3, up_u4.astype(cdt), up_flow4.astype(cdt),
                     train).astype(jnp.float32)

        # rescale level-3 flow (and uncertainty) to original resolution units
        flow3 = _scale_flow(flow3, w_orig / w_256, h_orig / h_256)
        if uncert:
            u3 = u3 + diag_ratio_log

        # ---- eval-only iterative refinement (static unroll) ----
        if self.iterative_refinement and not train:
            R = max(h_orig, w_orig) / 8.0 / 32.0
            n_extra = max(0, int(round(math.log(R / 3.0) / math.log(2))))
            for n in range(n_extra):
                ratio = 1.0 / (8.0 * 2 ** (n_extra - n))
                h_this, w_this = int(h_orig * ratio), int(w_orig * ratio)
                up_flow3 = interpolate(flow3, (h_this, w_this),
                                       mode="bilinear", align_corners=False)
                if uncert:
                    up_u3 = interpolate(u3, (h_this, w_this), mode="bilinear",
                                        align_corners=False)
                c23_bis = interpolate(c22, (h_this, w_this), mode="area")
                c13_bis = interpolate(c12, (h_this, w_this), mode="area")
                warp3b = warp(c23_bis, up_flow3 * ratio)
                corr3b = local_correlation_relu_l2norm(
                    c13_bis, warp3b, 9).astype(c13_bis.dtype)
                inp = (jnp.concatenate(
                    [corr3b, up_flow3.astype(cdt), up_u3.astype(cdt)],
                    axis=-1) if uncert
                       else jnp.concatenate(
                           [corr3b, up_flow3.astype(cdt)], axis=-1))
                res_flow3, x3 = decoder2(inp, train)
                flow3 = res_flow3.astype(jnp.float32) + up_flow3
                if uncert:
                    u3 = um2(corr3b, x3, up_u3.astype(cdt),
                             up_flow3.astype(cdt),
                             train).astype(jnp.float32)

        # ---- level 2: 1/8 of original ----
        h2, w2 = c12.shape[1:3]
        up_flow3 = interpolate(flow3, (h2, w2), mode="bilinear",
                               align_corners=False)
        if uncert:
            up_u3 = interpolate(u3, (h2, w2), mode="bilinear",
                                align_corners=False)
        warp2 = warp(c22, _scale_flow(up_flow3, w2 / w_orig, h2 / h_orig))
        corr2 = local_correlation_relu_l2norm(
            c12, warp2, patch_size=9).astype(c12.dtype)
        inp2 = (jnp.concatenate([corr2, up_flow3.astype(cdt),
                                 up_u3.astype(cdt)], axis=-1) if uncert
                else jnp.concatenate([corr2, up_flow3.astype(cdt)],
                                     axis=-1))
        res_flow2, x2 = decoder2(inp2, train)
        flow2 = res_flow2.astype(jnp.float32) + up_flow3
        if uncert:
            u2 = um2(corr2, x2, up_u3.astype(cdt), up_flow3.astype(cdt),
                     train).astype(jnp.float32)

        # ---- level 1: 1/4 of original ----
        h1, w1 = c11.shape[1:3]
        up_flow2 = interpolate(flow2, (h1, w1), mode="bilinear",
                               align_corners=False)
        if uncert:
            up_u2 = interpolate(u2, (h1, w1), mode="bilinear",
                                align_corners=False)
        up_feat2 = interpolate(x2, (h1, w1), mode="bilinear",
                               align_corners=False)
        up_feat2 = conv2d(2, kernel_size=1, padding=0, name="reduce")(up_feat2)
        warp1 = warp(c21, _scale_flow(up_flow2, w1 / w_orig, h1 / h_orig))
        corr1 = local_correlation_relu_l2norm(
            c11, warp1, patch_size=9).astype(c11.dtype)
        inp1 = (jnp.concatenate([corr1, up_flow2.astype(cdt),
                                 up_feat2.astype(cdt),
                                 up_u2.astype(cdt)], axis=-1)
                if uncert
                else jnp.concatenate([corr1, up_flow2.astype(cdt),
                                      up_feat2.astype(cdt)], axis=-1))
        res_flow1, x1 = decoder1(inp1, train)
        if self.refinement_at_finest_level:
            res_flow1 = res_flow1 + Ref(
                batch_norm=self.batch_norm, bn_axis_name=self.bn_axis_name,
                bn_groups=self.bn_groups,
                name="refinement_module_finest")(x1, train)
        flow1 = res_flow1.astype(jnp.float32) + up_flow2

        flow4 = _scale_flow(flow4_256, w_orig / w_256, h_orig / h_256)
        if uncert:
            u1 = um1(corr1, x1, up_u2.astype(cdt), up_flow2.astype(cdt),
                     train).astype(jnp.float32)
            u4 = u4_256 + diag_ratio_log
            return [(flow4, u4), (flow3, u3), (flow2, u2), (flow1, u1)]
        return [flow4, flow3, flow2, flow1]
