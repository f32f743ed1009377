"""Box utilities (pure jax, static shapes) for the Faster R-CNN stack.

Semantics follow torchvision's box ops that the reference's detector rests on
(`fasterrcnn_resnet50_fpn` internals): xyxy format, BoxCoder encode/decode with
per-coordinate weights and a log-space size clamp, IoU with +1-free widths
(torchvision uses exclusive x2/y2: w = x2 - x1)."""

from __future__ import annotations

import math

import jax.numpy as jnp

BBOX_XFORM_CLIP = math.log(1000.0 / 16)


def box_area(boxes):
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(a, b):
    """a: (N, 4), b: (M, 4) -> (N, M)."""
    area_a = box_area(a)[:, None]
    area_b = box_area(b)[None, :]
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def encode_boxes(reference, proposals, weights=(1.0, 1.0, 1.0, 1.0)):
    """Deltas that map `proposals` (anchors) onto `reference` (GT). Both (N, 4)."""
    wx, wy, ww, wh = weights
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    gx = (reference[..., 0] + reference[..., 2]) * 0.5
    gy = (reference[..., 1] + reference[..., 3]) * 0.5
    gw = reference[..., 2] - reference[..., 0]
    gh = reference[..., 3] - reference[..., 1]
    pw = jnp.maximum(pw, 1e-6)
    ph = jnp.maximum(ph, 1e-6)
    dx = wx * (gx - px) / pw
    dy = wy * (gy - py) / ph
    dw = ww * jnp.log(jnp.maximum(gw, 1e-6) / pw)
    dh = wh * jnp.log(jnp.maximum(gh, 1e-6) / ph)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(deltas, anchors, weights=(1.0, 1.0, 1.0, 1.0)):
    """deltas (..., 4) applied to anchors (..., 4) -> boxes xyxy."""
    wx, wy, ww, wh = weights
    px = (anchors[..., 0] + anchors[..., 2]) * 0.5
    py = (anchors[..., 1] + anchors[..., 3]) * 0.5
    pw = anchors[..., 2] - anchors[..., 0]
    ph = anchors[..., 3] - anchors[..., 1]
    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.clip(deltas[..., 2] / ww, a_max=BBOX_XFORM_CLIP)
    dh = jnp.clip(deltas[..., 3] / wh, a_max=BBOX_XFORM_CLIP)
    cx = dx * pw + px
    cy = dy * ph + py
    w = jnp.exp(dw) * pw
    h = jnp.exp(dh) * ph
    return jnp.stack([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h],
                     axis=-1)


def clip_boxes(boxes, height, width):
    return jnp.stack([
        jnp.clip(boxes[..., 0], 0.0, width),
        jnp.clip(boxes[..., 1], 0.0, height),
        jnp.clip(boxes[..., 2], 0.0, width),
        jnp.clip(boxes[..., 3], 0.0, height)], axis=-1)


def small_box_mask(boxes, min_size: float = 1e-3):
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    return (w >= min_size) & (h >= min_size)


def smooth_l1(pred, target, beta: float = 1.0 / 9.0):
    diff = jnp.abs(pred - target)
    return jnp.where(diff < beta, 0.5 * diff * diff / beta, diff - 0.5 * beta)
