"""Region proposal network (torchvision-semantics, static shapes).

Everything the reference gets from torchvision's `RegionProposalNetwork` inside
`fasterrcnn_resnet50_fpn` / `FasterRCNN(backbone=ViTDet)` (`train_detection.py:197,
244`), rebuilt for XLA: multi-level anchors (sizes 32..512, ratios 0.5/1/2), a
shared 3x3 conv head, per-level pre-NMS top-k, level-aware NMS with fixed output
count, IoU matcher (0.7/0.3 with low-quality matches), 256-anchor sampling at 0.5
positive fraction, BCE objectness + smooth-L1 (beta=1/9) box loss normalized like
torchvision (sum / num_sampled)."""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ssl4gie_tpu.ops.boxes import (box_iou, clip_boxes, decode_boxes, encode_boxes,
                                   small_box_mask, smooth_l1)
from ssl4gie_tpu.ops.nms import batched_nms_topk

ANCHOR_SIZES = (32, 64, 128, 256, 512)
ASPECT_RATIOS = (0.5, 1.0, 2.0)
NUM_ANCHORS = len(ASPECT_RATIOS)


def anchor_grid_info(feature_shapes: Sequence[Tuple[int, int]],
                     strides: Sequence[int]) -> np.ndarray:
    """Static per-anchor (gx, gy, stride) int32 array aligned with
    `generate_anchors`' flattening order (level-major, row-major, A-fast).

    Used to emulate torchvision's dynamic batch-max padding on the static
    canvas: an anchor of `generate_anchors(batch_canvas)` exists in
    torchvision's anchor set for a batch padded to (Hm, Wm) iff
    gx < ceil(Wm/stride) and gy < ceil(Hm/stride) — masking by that
    predicate reproduces the smaller canvas's anchor set exactly
    (`tests/test_detection.py::test_anchor_grid_info_matches_small_canvas`).
    """
    rows = []
    for (h, w), stride in zip(feature_shapes, strides):
        gx, gy = np.meshgrid(np.arange(w), np.arange(h))
        g = np.stack([gx.ravel(), gy.ravel()], axis=1)      # (H*W, 2)
        g = np.repeat(g, NUM_ANCHORS, axis=0)               # (H*W*A, 2)
        s = np.full((g.shape[0], 1), stride)
        rows.append(np.concatenate([g, s], axis=1))
    return np.concatenate(rows, axis=0).astype(np.int32)


def generate_anchors(feature_shapes: Sequence[Tuple[int, int]],
                     strides: Sequence[int]) -> np.ndarray:
    """Static anchor lattice: list over levels of (H*W*A, 4), concatenated.
    torchvision AnchorGenerator: zero-centered cell anchors scaled by size, shifted
    by stride grid."""
    all_anchors = []
    for (h, w), stride, size in zip(feature_shapes, strides, ANCHOR_SIZES):
        cell = []
        for ar in ASPECT_RATIOS:
            h_r = np.sqrt(ar)
            w_r = 1.0 / h_r
            ws = w_r * size
            hs = h_r * size
            cell.append([-ws / 2, -hs / 2, ws / 2, hs / 2])
        cell = np.asarray(cell, np.float32)           # (A, 4)
        sx = np.arange(w, dtype=np.float32) * stride
        sy = np.arange(h, dtype=np.float32) * stride
        sx, sy = np.meshgrid(sx, sy)
        shifts = np.stack([sx.ravel(), sy.ravel(), sx.ravel(), sy.ravel()], axis=1)
        anchors = (shifts[:, None, :] + cell[None, :, :]).reshape(-1, 4)
        all_anchors.append(anchors.astype(np.float32))
    return np.concatenate(all_anchors, axis=0)


class RPNHead(nn.Module):
    in_channels: int = 256
    num_anchors: int = NUM_ANCHORS
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: List[jnp.ndarray]):
        """feats: list of (B, H, W, C). Returns (objectness (B, sumHWA),
        deltas (B, sumHWA, 4)) concatenated over levels."""
        conv = nn.Conv(self.in_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")
        cls_l = nn.Conv(self.num_anchors, (1, 1), dtype=jnp.float32,
                        name="cls_logits")
        reg_l = nn.Conv(self.num_anchors * 4, (1, 1), dtype=jnp.float32,
                        name="bbox_pred")
        objs, regs = [], []
        for f in feats:
            t = nn.relu(conv(f))
            B, H, W, _ = t.shape
            o = cls_l(t.astype(jnp.float32)).reshape(B, H * W * self.num_anchors)
            r = reg_l(t.astype(jnp.float32)).reshape(B, H * W * self.num_anchors, 4)
            objs.append(o)
            regs.append(r)
        return jnp.concatenate(objs, axis=1), jnp.concatenate(regs, axis=1)


def match_anchors(anchors, gt_boxes, gt_valid, high: float = 0.7,
                  low: float = 0.3, allow_low_quality: bool = True):
    """Returns (matched_gt_idx (N,), labels (N,)): label 1 pos / 0 neg / -1 ignore.
    gt_boxes: (G, 4) padded; gt_valid: (G,) bool."""
    iou = box_iou(anchors, gt_boxes)                        # (N, G)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    matched = jnp.argmax(iou, axis=1)
    best = jnp.max(iou, axis=1)
    labels = jnp.where(best >= high, 1, jnp.where(best < low, 0, -1))
    if allow_low_quality:
        best_per_gt = jnp.max(iou, axis=0)                  # (G,)
        is_best = (iou == best_per_gt[None, :]) & gt_valid[None, :] & \
                  (best_per_gt[None, :] > 0)
        force = jnp.any(is_best, axis=1)
        # matched index follows argmax even for forced anchors (torchvision keeps
        # the all_matches index for low-quality)
        labels = jnp.where(force, 1, labels)
    no_gt = ~jnp.any(gt_valid)
    labels = jnp.where(no_gt, 0, labels)
    return matched, labels


def sample_balanced(key, labels, num_samples: int = 256, pos_fraction: float = 0.5):
    """torchvision BalancedPositiveNegativeSampler: random subset of positives
    (up to num*frac) and negatives (fill the rest). Returns (pos_mask, neg_mask)."""
    n = labels.shape[0]
    rand = jax.random.uniform(key, (n,))
    num_pos_max = int(num_samples * pos_fraction)

    pos = labels == 1
    pos_rank_scores = jnp.where(pos, rand, -1.0)
    n_pos = jnp.minimum(jnp.sum(pos), num_pos_max)
    # top-n_pos random positives: threshold by rank
    order = jnp.argsort(-pos_rank_scores)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    pos_mask = pos & (ranks < n_pos)

    neg = labels == 0
    n_neg = jnp.minimum(jnp.sum(neg), num_samples - n_pos)
    neg_rank_scores = jnp.where(neg, rand, -1.0)
    order_n = jnp.argsort(-neg_rank_scores)
    ranks_n = jnp.zeros((n,), jnp.int32).at[order_n].set(
        jnp.arange(n, dtype=jnp.int32))
    neg_mask = neg & (ranks_n < n_neg)
    return pos_mask, neg_mask


def rpn_loss(key, anchors, objectness, deltas, gt_boxes, gt_valid):
    """Per image. objectness (N,), deltas (N, 4)."""
    matched, labels = match_anchors(anchors, gt_boxes, gt_valid)
    pos_mask, neg_mask = sample_balanced(key, labels, 256, 0.5)
    sampled = pos_mask | neg_mask

    matched_gt = gt_boxes[matched]                          # (N, 4)
    reg_targets = encode_boxes(matched_gt, anchors)
    box_l = smooth_l1(deltas, reg_targets, beta=1.0 / 9.0).sum(-1)
    box_loss = jnp.sum(jnp.where(pos_mask, box_l, 0.0)) / \
        jnp.maximum(jnp.sum(sampled), 1)

    obj_t = labels.astype(jnp.float32)
    bce = optax_sigmoid_bce(objectness, obj_t)
    obj_loss = jnp.sum(jnp.where(sampled, bce, 0.0)) / \
        jnp.maximum(jnp.sum(sampled), 1)
    return obj_loss, box_loss


def optax_sigmoid_bce(logits, targets):
    log_p = jax.nn.log_sigmoid(logits)
    log_np = jax.nn.log_sigmoid(-logits)
    return -(targets * log_p + (1.0 - targets) * log_np)


def select_proposals(objectness, deltas, anchors, level_ids, level_slices,
                     image_size: int, pre_nms_top_n: int, post_nms_top_n: int,
                     nms_thresh: float = 0.7, min_size: float = 1e-3,
                     anchor_valid=None, content_wh=None):
    """Per image: per-level top-k -> decode -> clip -> level-aware NMS -> fixed
    post_nms_top_n proposals (+validity). level_slices: python list of (start, end).

    anchor_valid: optional (N,) bool — anchors outside the batch-max content
    extent (torchvision pads to the per-batch max, so those anchors do not
    exist there); masked to -inf objectness so they can never enter top-k.
    content_wh: optional (2,) (w, h) — torchvision `filter_proposals` clips
    proposals to each image's own (pre-pad) size, not the canvas."""
    if anchor_valid is not None:
        objectness = jnp.where(anchor_valid, objectness, -jnp.inf)
    sel_scores, sel_boxes, sel_levels = [], [], []
    for li, (s, e) in enumerate(level_slices):
        k = min(pre_nms_top_n, e - s)
        sc, idx = jax.lax.top_k(objectness[s:e], k)
        d = deltas[s:e][idx]
        a = anchors[s:e][idx]
        b = decode_boxes(d, a)
        sel_scores.append(sc)
        sel_boxes.append(b)
        sel_levels.append(jnp.full((k,), li, jnp.int32))
    scores = jnp.concatenate(sel_scores)
    if content_wh is None:
        boxes = clip_boxes(jnp.concatenate(sel_boxes), image_size, image_size)
    else:
        boxes = clip_boxes(jnp.concatenate(sel_boxes), content_wh[1],
                           content_wh[0])
    levels = jnp.concatenate(sel_levels)
    valid = small_box_mask(boxes, min_size) & (scores > -jnp.inf)
    idx, ok = batched_nms_topk(boxes, jax.nn.sigmoid(scores), levels, nms_thresh,
                               post_nms_top_n, valid)
    return boxes[idx], ok
