"""Encoder-decoder segmentor with optional HRDA multi-resolution fusion.

TPU-first redesign of the reference's composition:
* plain path: head(backbone(x)) + bilinear upsample
  (reference models/segmentation_model.py:314-318).
* HRDA: the reference monkey-patches backbone/head forwards with decorators
  (models/segmentation_model.py:125-135, models/hrda.py:97-235); here it is
  an explicit combinator on a (backbone, head, scale_attention) triple with
  static crop grids, ``lax.dynamic_slice`` for the random train-time HR crop
  and ``dynamic_update_slice`` folds — fully jit-compatible, no Python-level
  control flow on data.
* sliding-window inference (models/segmentation_model.py:320-382): the crop
  grid is a compile-time constant for a given image geometry; all crops are
  folded into the batch axis and evaluated in ONE forward pass, then
  scatter-added back with a count-matrix average.

All feature maps NHWC.
"""
from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.resize import interpolate
from ..parallel.mesh import shard_rows


def compute_slide_boxes(img_size: Tuple[int, int],
                        crop_size: Tuple[int, int],
                        stride: Tuple[int, int]) -> List[Tuple[int, int, int, int]]:
    """Static slide-crop boxes (y1, y2, x1, x2), matching the reference grid
    rule (segmentation_model.py:333-354, hrda.py:76-94)."""
    h_img, w_img = img_size
    h_crop, w_crop = crop_size
    h_stride, w_stride = stride
    h_grids = max(h_img - h_crop + h_stride - 1, 0) // h_stride + 1
    w_grids = max(w_img - w_crop + w_stride - 1, 0) // w_stride + 1
    boxes = []
    for hi in range(h_grids):
        for wi in range(w_grids):
            y1, x1 = hi * h_stride, wi * w_stride
            y2, x2 = min(y1 + h_crop, h_img), min(x1 + w_crop, w_img)
            y1, x1 = max(y2 - h_crop, 0), max(x2 - w_crop, 0)
            boxes.append((y1, y2, x1, x2))
    return boxes


def fold_crops(crop_logits: jax.Array, boxes, img_size: Tuple[int, int],
               batch: int) -> jax.Array:
    """Scatter-add per-crop logits back onto the full grid and average by
    visit count.  crop_logits: (n_crops*B, ch, cw, C) stacked like the
    reference's torch.cat (crop-major)."""
    import numpy as np
    h_img, w_img = img_size
    C = crop_logits.shape[-1]
    preds = jnp.zeros((batch, h_img, w_img, C), crop_logits.dtype)
    # the visit-count matrix depends only on the STATIC box grid — build
    # it host-side as one constant instead of a chain of scatter-adds XLA
    # would spend seconds constant-folding at compile time (observed in
    # the flagship-geometry dryrun's slow-operation alarms)
    count_np = np.zeros((1, h_img, w_img, 1), np.float32)
    for (y1, y2, x1, x2) in boxes:
        count_np[:, y1:y2, x1:x2, :] += 1.0
    for i, (y1, y2, x1, x2) in enumerate(boxes):
        piece = crop_logits[i * batch:(i + 1) * batch]
        preds = preds.at[:, y1:y2, x1:x2, :].add(piece)
    return preds / jnp.asarray(count_np, crop_logits.dtype)


class Segmentor(nn.Module):
    """backbone + head (+ HRDA scale attention) composition."""
    backbone: nn.Module
    head: nn.Module
    scale_attention: Optional[nn.Module] = None
    hrda_output_stride: int = 4   # os of the head output wrt its input

    # ---------------- plain paths ----------------

    def features(self, x: jax.Array, train: bool = False,
                 deterministic: bool = True):
        return self.backbone(x, train=train,
                             deterministic=deterministic)

    def logits(self, x: jax.Array, train: bool = False,
               deterministic: bool = True) -> jax.Array:
        feats = self.backbone(x, train=train,
                              deterministic=deterministic)
        return self.head(feats, train=train, deterministic=deterministic)

    def whole(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Eval-mode logits upsampled to input resolution
        (reference segmentation_model.py:314-318)."""
        if self.scale_attention is not None:
            logits = self.hrda_eval(x, train=train)
        else:
            logits = self.logits(x, train=train)
        return interpolate(logits, x.shape[1:3], mode="bilinear",
                           align_corners=False)

    def logits_and_features(self, x: jax.Array, train: bool = False,
                            deterministic: bool = True):
        feats = self.backbone(x, train=train,
                              deterministic=deterministic)
        return self.head(feats, train=train,
                         deterministic=deterministic), feats

    # ---------------- HRDA ----------------

    def hrda_train(self, x: jax.Array, crop_offset: jax.Array,
                   train: bool = True, deterministic: bool = False):
        """HRDA training forward (reference hrda.py:97-186).

        Args:
          x: (B, H, W, 3) full-resolution images.
          crop_offset: (2,) int32 (oy, ox), each divisible by
            2*hrda_output_stride, in [0, H/2] — the random HR crop origin.
        Returns:
          (fused_logits (B,H/os,W/os,C), hr_logits (B,H/2,W/2,C),
           crop_offset, lr_feats) — lr_feats feed the fdist loss
          (segmentation_model.py:161).
        """
        os_ = self.hrda_output_stride
        B, H, W, _ = x.shape
        ch, cw = H // 2, W // 2

        lr_x = interpolate(x, (ch, cw), mode="bilinear", align_corners=False)
        oy = crop_offset[0]
        ox = crop_offset[1]
        hr_x = jax.lax.dynamic_slice(x, (0, oy, ox, 0), (B, ch, cw, 3))

        both = jnp.concatenate([lr_x, hr_x], axis=0)
        both_feats = self.backbone(both, train=train,
                                   deterministic=deterministic)
        lr_feats = [f[:B] for f in both_feats]
        both_seg = self.head(both_feats, train=train,
                             deterministic=deterministic)
        lr_seg, hr_seg = both_seg[:B], both_seg[B:]

        att = jax.nn.sigmoid(
            self.scale_attention(lr_feats, train=train,
                                 deterministic=deterministic))

        # mask attention to the crop region on the lr grid (scale 2*os)
        gh, gw = lr_seg.shape[1:3]
        ry = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 0)
        rx = jax.lax.broadcasted_iota(jnp.int32, (gh, gw), 1)
        y1, x1 = oy // (2 * os_), ox // (2 * os_)
        y2, x2 = y1 + ch // (2 * os_), x1 + cw // (2 * os_)
        mask = ((ry >= y1) & (ry < y2) & (rx >= x1) & (rx < x2))
        att = att * mask[None, :, :, None].astype(att.dtype)

        lr_seg = (1.0 - att) * lr_seg
        up_lr_seg = interpolate(lr_seg, (2 * gh, 2 * gw), mode="bilinear",
                                align_corners=False)
        up_att = interpolate(att, (2 * gh, 2 * gw), mode="bilinear",
                             align_corners=False)
        inserted = jnp.zeros_like(up_lr_seg)
        inserted = jax.lax.dynamic_update_slice(
            inserted, hr_seg.astype(inserted.dtype),
            (0, oy // os_, ox // os_, 0))
        fused = up_att * inserted + up_lr_seg

        hr_logits = interpolate(hr_seg, (ch, cw), mode="bilinear",
                                align_corners=False)
        return fused, hr_logits, crop_offset, lr_feats

    def hrda_eval(self, x: jax.Array, train: bool = False) -> jax.Array:
        """HRDA inference forward (reference hrda.py:187-232): LR full pass +
        HR slide crops (crop = LR size, stride = crop/2), count-mat fold,
        sigmoid scale-attention fusion.  Output at H/os.

        ``train=True`` keeps BatchNorm in batch-stats mode (the reference's
        EMA teacher runs this path with BN still in train mode,
        segmentation_model.py:691-701); dropout stays off either way.
        """
        os_ = self.hrda_output_stride
        B, H, W, _ = x.shape
        ch, cw = H // 2, W // 2
        lr_x = interpolate(x, (ch, cw), mode="bilinear", align_corners=False)
        boxes = compute_slide_boxes((H, W), (ch, cw), (ch // 2, cw // 2))
        crops = jnp.concatenate(
            [x[:, y1:y2, x1:x2] for (y1, y2, x1, x2) in boxes], axis=0)

        # spread the (1 LR + n_crops HR) row batch across the active compute
        # mesh — a v5e-8 runs 8 crops' backbone passes concurrently
        both = shard_rows(jnp.concatenate([lr_x, crops], axis=0))
        both_feats = self.backbone(both, train=train, deterministic=True)
        lr_feats = [f[:B] for f in both_feats]
        both_seg = self.head(both_feats, train=train, deterministic=True)
        lr_seg, crop_seg = both_seg[:B], both_seg[B:]

        att = jax.nn.sigmoid(
            self.scale_attention(lr_feats, train=train, deterministic=True))
        lr_seg = (1.0 - att) * lr_seg
        gh, gw = lr_seg.shape[1:3]
        up_lr_seg = interpolate(lr_seg, (2 * gh, 2 * gw), mode="bilinear",
                                align_corners=False)
        up_att = interpolate(att, (2 * gh, 2 * gw), mode="bilinear",
                             align_corners=False)

        scaled_boxes = [(y1 // os_, y2 // os_, x1 // os_, x2 // os_)
                        for (y1, y2, x1, x2) in boxes]
        hr_seg = fold_crops(crop_seg, scaled_boxes, (H // os_, W // os_), B)
        return up_att * hr_seg + up_lr_seg

    # default method so Segmentor.init works conveniently
    def __call__(self, x: jax.Array) -> jax.Array:
        return self.whole(x)


def slide_inference(whole_fn: Callable[[jax.Array], jax.Array],
                    img: jax.Array,
                    crop_size: Tuple[int, int],
                    stride: Tuple[int, int]) -> jax.Array:
    """Batched sliding-window inference (segmentation_model.py:320-382).

    Args:
      whole_fn: maps (N, ch, cw, 3) -> (N, ch, cw, C) logits at crop res.
      img: (B, H, W, 3).
    """
    B, H, W, _ = img.shape
    boxes = compute_slide_boxes((H, W), crop_size, stride)
    crops = shard_rows(jnp.concatenate(
        [img[:, y1:y2, x1:x2] for (y1, y2, x1, x2) in boxes], axis=0))
    crop_logits = whole_fn(crops)
    return fold_crops(crop_logits, boxes, (H, W), B)
