"""Static-shape NMS for XLA/TPU.

The reference leans on torchvision's CUDA NMS with data-dependent output counts
(inside `fasterrcnn_resnet50_fpn`). Under XLA shapes must be static, and a
sequential per-box greedy loop would serialize thousands of scalar steps on TPU.
We instead run an exact greedy *slot loop*: `k` iterations of (argmax over live
scores -> suppress IoU > threshold), each iteration one fused O(N) vector pass on
the VPU. Output is always k indices + validity mask; exhausted slots are invalid.
This is exactly torchvision-greedy for the top-k survivors, which is all callers
ever consume (RPN post_nms_top_n, per-class detections_per_img).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _iou_one_vs_all(box, boxes):
    area1 = (box[2] - box[0]) * (box[3] - box[1])
    areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    union = area1 + areas - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def nms_topk(boxes, scores, iou_threshold: float, k: int, valid=None):
    """Exact greedy NMS keeping (up to) the top-k survivors.

    boxes: (N, 4), scores: (N,), valid: optional (N,) bool.
    Returns (indices (k,), out_valid (k,)) — indices into the input arrays,
    ordered by descending score; out_valid False for exhausted slots.
    """
    live = scores.astype(jnp.float32)
    if valid is not None:
        live = jnp.where(valid, live, -jnp.inf)

    def body(live, _):
        i = jnp.argmax(live)
        s = live[i]
        iou = _iou_one_vs_all(boxes[i], boxes)
        suppressed = iou > iou_threshold
        new_live = jnp.where(suppressed, -jnp.inf, live).at[i].set(-jnp.inf)
        # if the slot itself is exhausted (s == -inf), suppress nothing
        new_live = jnp.where(jnp.isfinite(s), new_live, live.at[i].set(-jnp.inf))
        return new_live, (i, jnp.isfinite(s))

    _, (idx, ok) = jax.lax.scan(body, live, None, length=k)
    return idx, ok


def batched_nms_topk(boxes, scores, idxs, iou_threshold: float, k: int,
                     valid=None):
    """Class/level-aware NMS via the torchvision coordinate-offset trick."""
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0)) + 1.0
    offset_boxes = boxes + idxs.astype(boxes.dtype)[:, None] * max_coord
    return nms_topk(offset_boxes, scores, iou_threshold, k, valid)
