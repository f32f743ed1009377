"""RoI heads (torchvision `RoIHeads` semantics, static shapes).

Proposal sampling (512/img, 0.25 positive fraction, IoU thresholds 0.5/0.5 without
low-quality matches, GT boxes appended to proposals), MultiScaleRoIAlign 7x7,
TwoMLPHead (2x FC-1024), FastRCNNPredictor (cls + per-class box deltas with
weights (10,10,5,5)), cross-entropy + smooth-L1 losses, and the static-shape
inference postprocess (score threshold, per-class NMS, top detections_per_img)."""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssl4gie_tpu.models.rpn import sample_balanced
from ssl4gie_tpu.ops.boxes import (box_iou, clip_boxes, decode_boxes, encode_boxes,
                                   small_box_mask, smooth_l1)
from ssl4gie_tpu.ops.nms import batched_nms_topk
from ssl4gie_tpu.ops.roi_align import multiscale_roi_align

BOX_REG_WEIGHTS = (10.0, 10.0, 5.0, 5.0)


class BoxHead(nn.Module):
    """TwoMLPHead + FastRCNNPredictor."""
    num_classes: int = 2
    representation_size: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, roi_feats):
        """roi_feats: (R, 7, 7, C) -> (scores (R, K), deltas (R, K, 4))."""
        R = roi_feats.shape[0]
        x = roi_feats.reshape(R, -1).astype(self.dtype)
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name="fc6")(x))
        x = nn.relu(nn.Dense(self.representation_size, dtype=self.dtype,
                             name="fc7")(x))
        x = x.astype(jnp.float32)
        scores = nn.Dense(self.num_classes, name="cls_score")(x)
        deltas = nn.Dense(self.num_classes * 4, name="bbox_pred")(x)
        return scores, deltas.reshape(R, self.num_classes, 4)


def assign_proposals(key, proposals, prop_valid, gt_boxes, gt_labels, gt_valid,
                     batch_size_per_image: int = 512, positive_fraction: float = 0.25,
                     fg_iou: float = 0.5, bg_iou: float = 0.5):
    """Per image: append GT to proposals, match at 0.5/0.5 (no low-quality), sample.
    Returns (sampled_boxes (S,4), labels (S,), reg_targets (S,4), pos_mask, sampled_valid).
    S = batch_size_per_image."""
    proposals = jnp.concatenate([proposals, gt_boxes], axis=0)
    prop_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    iou = box_iou(proposals, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    matched = jnp.argmax(iou, axis=1)
    best = jnp.max(iou, axis=1)
    labels = jnp.where(best >= fg_iou, 1, 0)               # 1 fg / 0 bg
    labels = jnp.where(prop_valid, labels, -1)             # invalid -> ignore
    no_gt = ~jnp.any(gt_valid)
    labels = jnp.where(no_gt & prop_valid, 0, labels)

    ksample, ktie = jax.random.split(key)
    pos_mask, neg_mask = sample_balanced(ksample, labels, batch_size_per_image,
                                         positive_fraction)
    sampled_mask = pos_mask | neg_mask
    # gather up to S sampled indices (pad by repeating index 0 with valid=False)
    S = batch_size_per_image
    score = sampled_mask.astype(jnp.float32) * 2.0 + pos_mask.astype(jnp.float32)
    _, idx = jax.lax.top_k(score + jax.random.uniform(ktie, score.shape) * 0.5, S)
    sampled_valid = sampled_mask[idx]
    boxes_s = proposals[idx]
    matched_s = matched[idx]
    cls_labels = jnp.where(pos_mask[idx],
                           gt_labels[matched_s].astype(jnp.int32), 0)
    reg_targets = encode_boxes(gt_boxes[matched_s], boxes_s, BOX_REG_WEIGHTS)
    return boxes_s, cls_labels, reg_targets, pos_mask[idx], sampled_valid


def roi_head_loss(scores, deltas, labels, reg_targets, pos_mask, valid):
    """torchvision fastrcnn_loss: CE over sampled, smooth-L1 over positives with the
    matched class's deltas, normalized by num sampled."""
    n_sampled = jnp.maximum(jnp.sum(valid), 1)
    logp = jax.nn.log_softmax(scores, axis=-1)
    ce = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    cls_loss = jnp.sum(jnp.where(valid, ce, 0.0)) / n_sampled

    d = jnp.take_along_axis(deltas, labels[:, None, None].repeat(4, -1),
                            axis=1)[:, 0]
    bl = smooth_l1(d, reg_targets, beta=1.0 / 9.0).sum(-1)
    box_loss = jnp.sum(jnp.where(pos_mask & valid, bl, 0.0)) / n_sampled
    return cls_loss, box_loss


def postprocess_detections(scores, deltas, proposals, prop_valid,
                           image_size: int, score_thresh: float = 0.05,
                           nms_thresh: float = 0.5, detections_per_img: int = 100,
                           content_wh=None):
    """Per image. scores (R, K) logits; deltas (R, K, 4); proposals (R, 4).
    Returns dict(boxes (D,4), scores (D,), labels (D,), valid (D,)).

    content_wh: optional (2,) (w, h) per-image pre-pad extent — torchvision
    RoIHeads clips detections to `image_shapes` BEFORE the per-class NMS
    (clipping changes IoUs and therefore NMS outcomes, so in-model clipping
    here is strictly more faithful than the host-side post-NMS clip)."""
    K = scores.shape[1]
    probs = jax.nn.softmax(scores, axis=-1)
    boxes_k = decode_boxes(deltas, proposals[:, None, :].repeat(K, 1),
                           BOX_REG_WEIGHTS)
    if content_wh is None:
        boxes_k = clip_boxes(boxes_k, image_size, image_size)
    else:
        boxes_k = clip_boxes(boxes_k, content_wh[1], content_wh[0])
    # drop background column
    probs = probs[:, 1:]
    boxes_k = boxes_k[:, 1:]
    R, Km1 = probs.shape
    flat_boxes = boxes_k.reshape(R * Km1, 4)
    flat_scores = probs.reshape(R * Km1)
    flat_labels = jnp.tile(jnp.arange(1, K, dtype=jnp.int32)[None], (R, 1)).reshape(-1)
    valid = (flat_scores > score_thresh) & small_box_mask(flat_boxes, 1e-2) & \
        jnp.repeat(prop_valid, Km1)
    idx, ok = batched_nms_topk(flat_boxes, flat_scores, flat_labels, nms_thresh,
                               detections_per_img, valid)
    return {"boxes": flat_boxes[idx], "scores": flat_scores[idx],
            "labels": flat_labels[idx], "valid": ok}


def extract_roi_features(feature_maps: List[jnp.ndarray], boxes,
                         strides=(4, 8, 16, 32), extent_hw=None):
    """Single image: FPN levels 0..3 feed RoIAlign (pool level excluded, like
    torchvision's featmap_names=['0','1','2','3']). extent_hw: optional (4, 2)
    per-level valid extents for batch-max emulation."""
    return multiscale_roi_align(feature_maps[:4], boxes,
                                [1.0 / s for s in strides],
                                extent_hw=extent_hw)
