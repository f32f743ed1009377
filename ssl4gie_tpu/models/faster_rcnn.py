"""Faster R-CNN (ViTDet or RN50-FPN backbone) — static-shape, SPMD-friendly.

Covers the reference's two detector builds (`Object_detection/train_detection.py`):
- RN50: `fasterrcnn_resnet50_fpn(trainable_backbone_layers=5)` with SSL weights in
  `backbone.body` (`:197-204`),
- ViT-B: `FasterRCNN(backbone=ViTDet)` at fixed 1024px with windowed attention
  (`:243-250`).

XLA redesign decisions (vs torchvision's dynamic shapes):
- images arrive pre-padded to a fixed square (the reference already fixes 1024 for
  ViT via `transform.fixed_size`; we fix both paths — TPU needs static shapes),
- proposal/detection counts are fixed top-k with validity masks,
- NMS is the exact-greedy slot loop (ops/nms.py), RoIAlign the single-pass gather
  (ops/roi_align.py).

Normalization (ImageNet mean/std) happens inside the model, like torchvision's
GeneralizedRCNNTransform (`train_detection.py:200-201` passes mean/std there).
"""

from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ssl4gie_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD
from ssl4gie_tpu.models.roi_heads import (BoxHead, assign_proposals,
                                          extract_roi_features,
                                          postprocess_detections, roi_head_loss)
from ssl4gie_tpu.models.rpn import (RPNHead, anchor_grid_info, generate_anchors,
                                    rpn_loss, select_proposals)
from ssl4gie_tpu.models.vit import ViTBackbone
from ssl4gie_tpu.models.vitdet_fpn import ResNetFPN, ViTDetFPN

STRIDES = (4, 8, 16, 32, 64)


class FasterRCNN(nn.Module):
    arch: str = "vit_b"                  # vit_b | resnet50
    num_classes: int = 2
    image_size: int = 1024
    pos_embed_type: str = "learned"
    # torchvision defaults, bounded for TPU
    rpn_pre_nms_top_n_train: int = 2000
    rpn_pre_nms_top_n_test: int = 1000
    rpn_post_nms_top_n_train: int = 1000
    rpn_post_nms_top_n_test: int = 1000
    rpn_nms_thresh: float = 0.7
    box_batch_size_per_image: int = 512
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    detections_per_img: int = 100
    # ViT path FPN LayerNorm: "channel" (shape-agnostic, repo default) or
    # "chw" (reference-checkpoint-compatible full-(C,H,W) norm — see
    # models/vitdet_fpn.LayerNormCHW)
    fpn_ln_mode: str = "channel"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images, gt_boxes=None, gt_labels=None, gt_valid=None,
                 train: bool = False, content_sizes=None):
        """images: (B, S, S, 3) float in [0,1] (pre-padded square).
        Train: returns loss dict. Eval: returns detections dict of (B, D, ...).

        content_sizes: optional (B, 2) int (w, h) per-image pre-pad extents,
        top-left placed (the RN50/`resize="torchvision"` prep). When given
        (eval only), the static canvas reproduces torchvision's dynamic
        batch-max padding to float-reassociation noise: (a) anchors outside
        the batch-max /32 extent are masked out of RPN top-k (they do not
        exist on torchvision's per-batch canvas; set-equality tested),
        (b) proposals and detections are clipped per image to (w_i, h_i)
        BEFORE their NMS passes like `filter_proposals` /
        `RoIHeads.postprocess_detections`, (c) the RN50 backbone is
        extent-masked before every spatial-kernel op so border halos match
        a tight-canvas run (`resnet.extent_mask` — also zeroes the
        -mean/std normalize-pad pixels, matching torchvision's
        post-normalize zero pad), (d) RoIAlign border rules apply at the
        batch-max extent where torchvision's maps end
        (`multiscale_roi_align(extent_hw)`). Cross-canvas eval equality is
        asserted by `tests/test_detection.py::test_eval_cross_canvas_bitwise`.
        Train mode ignores it: `detection_augment` rot90/flips move the
        content region around the canvas, and the ablation
        (`benchmarks/canvas_ablation.py`) measured train-time padding
        effects below seed noise."""
        x = (images - IMAGENET_MEAN) / IMAGENET_STD
        x = x.astype(self.dtype)

        # batch-max content extent, /32-rounded like torchvision
        # ImageList.batch_images(size_divisible=32)
        mask_hw = None
        if content_sizes is not None and not train:
            wm = ((jnp.max(content_sizes[:, 0]) + 31) // 32) * 32
            hm = ((jnp.max(content_sizes[:, 1]) + 31) // 32) * 32
            if self.arch != "vit_b":
                # extent-mask the backbone so border halos match a
                # tight-canvas run (the mask also zeroes the -mean/std
                # normalize-pad pixels, matching torchvision's post-normalize
                # zero pad); the ViT backbone is used with fixed_size
                # semantics (content == canvas) so it never takes a mask
                mask_hw = (hm, wm)

        if self.arch == "vit_b":
            fmap = ViTBackbone(img_size=self.image_size, mode="det",
                               pos_embed_type=self.pos_embed_type,
                               dtype=self.dtype, name="backbone")(x, train)
            feats = ViTDetFPN(dtype=self.dtype, ln_mode=self.fpn_ln_mode,
                              name="fpn")(fmap)
        else:
            # BatchNorm stays frozen even in training — torchvision's
            # fasterrcnn_resnet50_fpn uses FrozenBatchNorm2d, and the reference's
            # SyncBN conversion does not touch it (train_detection.py:272)
            feats = ResNetFPN(dtype=self.dtype, name="backbone")(
                x, train=False, mask_hw=mask_hw)
        feats = [f.astype(jnp.float32) for f in feats]

        objectness, deltas = RPNHead(dtype=self.dtype, name="rpn_head")(feats)

        shapes = [(f.shape[1], f.shape[2]) for f in feats]
        anchors = jnp.asarray(generate_anchors(shapes, STRIDES))
        sizes = [h * w * 3 for h, w in shapes]
        offs = np.concatenate([[0], np.cumsum(sizes)]).tolist()
        level_slices = [(offs[i], offs[i + 1]) for i in range(len(sizes))]

        pre_n = self.rpn_pre_nms_top_n_train if train else self.rpn_pre_nms_top_n_test
        post_n = (self.rpn_post_nms_top_n_train if train
                  else self.rpn_post_nms_top_n_test)

        anchor_valid = None
        if content_sizes is not None and not train:
            grid = jnp.asarray(anchor_grid_info(shapes, STRIDES))  # (N, 3)
            gx, gy, st = grid[:, 0], grid[:, 1], grid[:, 2]
            anchor_valid = (gx < (wm + st - 1) // st) & \
                           (gy < (hm + st - 1) // st)

        prop_fn = functools.partial(
            select_proposals, anchors=anchors, level_ids=None,
            level_slices=level_slices, image_size=self.image_size,
            pre_nms_top_n=pre_n, post_nms_top_n=post_n,
            nms_thresh=self.rpn_nms_thresh)
        if anchor_valid is None:
            proposals, prop_valid = jax.vmap(
                lambda o, d: prop_fn(o, d))(objectness, deltas)
        else:
            proposals, prop_valid = jax.vmap(
                lambda o, d, wh: prop_fn(o, d, anchor_valid=anchor_valid,
                                         content_wh=wh)
            )(objectness, deltas, content_sizes)
        proposals = jax.lax.stop_gradient(proposals)

        box_head = BoxHead(num_classes=self.num_classes, dtype=self.dtype,
                           name="box_head")

        if train:
            key = self.make_rng("sampler")
            B = images.shape[0]
            keys = jax.random.split(key, B)

            obj_l, box_l = jax.vmap(
                lambda k, o, d, gb, gv: rpn_loss(k, anchors, o, d, gb, gv)
            )(keys, objectness, deltas, gt_boxes, gt_valid)

            keys2 = jax.random.split(jax.random.fold_in(key, 1), B)
            sampled = jax.vmap(assign_proposals, in_axes=(0, 0, 0, 0, 0, 0, None))(
                keys2, proposals, prop_valid, gt_boxes, gt_labels, gt_valid,
                self.box_batch_size_per_image)
            boxes_s, cls_labels, reg_targets, pos_mask, sampled_valid = sampled

            roi_feats = jax.vmap(
                lambda f0, f1, f2, f3, b: extract_roi_features([f0, f1, f2, f3], b)
            )(feats[0], feats[1], feats[2], feats[3], boxes_s)
            B, S = roi_feats.shape[:2]
            scores, box_deltas = box_head(roi_feats.reshape(B * S, 7, 7, -1))
            cls_loss, reg_loss = roi_head_loss(
                scores, box_deltas,
                cls_labels.reshape(-1), reg_targets.reshape(-1, 4),
                pos_mask.reshape(-1), sampled_valid.reshape(-1))
            return {"loss_objectness": jnp.mean(obj_l),
                    "loss_rpn_box_reg": jnp.mean(box_l),
                    "loss_classifier": cls_loss,
                    "loss_box_reg": reg_loss}

        roi_extent = None
        if mask_hw is not None:
            roi_extent = jnp.stack(
                [jnp.stack([mask_hw[0] // s, mask_hw[1] // s])
                 for s in STRIDES[:4]]).astype(jnp.float32)
        roi_fn = functools.partial(extract_roi_features, extent_hw=roi_extent)
        roi_feats = jax.vmap(
            lambda f0, f1, f2, f3, b: roi_fn([f0, f1, f2, f3], b)
        )(feats[0], feats[1], feats[2], feats[3], proposals)
        B, R = roi_feats.shape[:2]
        scores, box_deltas = box_head(roi_feats.reshape(B * R, 7, 7, -1))
        scores = scores.reshape(B, R, -1)
        box_deltas = box_deltas.reshape(B, R, self.num_classes, 4)
        post_fn = functools.partial(
            postprocess_detections, image_size=self.image_size,
            score_thresh=self.box_score_thresh, nms_thresh=self.box_nms_thresh,
            detections_per_img=self.detections_per_img)
        if content_sizes is None:
            det = jax.vmap(post_fn)(scores, box_deltas, proposals, prop_valid)
        else:
            det = jax.vmap(lambda s, d, p, v, wh: post_fn(s, d, p, v,
                                                          content_wh=wh)
                           )(scores, box_deltas, proposals, prop_valid,
                             content_sizes)
        return det


def build_detector(architecture, pos_embed_type: str = "learned",
                   img_size: int = 1024, dtype=jnp.float32,
                   num_classes: int = 2,
                   fpn_ln_mode: str = "channel") -> FasterRCNN:
    from ssl4gie_tpu.core.config import Architecture
    arch = "vit_b" if architecture == Architecture.VIT_B else "resnet50"
    return FasterRCNN(arch=arch, num_classes=num_classes, image_size=img_size,
                      pos_embed_type=pos_embed_type, dtype=dtype,
                      fpn_ln_mode=fpn_ln_mode)
