"""Binary-segmentation losses/metrics.

Exact behavioral match (jit-safe jnp) of the reference formulas:
SoftDiceLoss `Binary_segmentation/Metrics/losses.py:5-24` and
DiceScore/IoU/Precision/Recall `Binary_segmentation/Metrics/performance.py:5-97`
(0.5-thresholded, smooth=1e-8, per-image then batch-mean).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SMOOTH = 1e-8


def _flatten(x):
    return x.reshape(x.shape[0], -1)


def soft_dice_loss(logits, targets, smooth: float = SMOOTH):
    probs = jax.nn.sigmoid(logits.astype(jnp.float32))
    m1 = _flatten(probs)
    m2 = _flatten(targets.astype(jnp.float32))
    inter = jnp.sum(m1 * m2, axis=1)
    score = 2.0 * (inter + smooth) / (jnp.sum(m1 * m1, axis=1)
                                      + jnp.sum(m2 * m2, axis=1) + smooth)
    return 1.0 - jnp.mean(score)


def _thresholded(logits, targets, apply_sigmoid: bool):
    probs = jax.nn.sigmoid(logits.astype(jnp.float32)) if apply_sigmoid \
        else logits.astype(jnp.float32)
    m1 = _flatten(probs) > 0.5
    m2 = _flatten(targets.astype(jnp.float32)) > 0.5
    inter = jnp.sum((m1 & m2).astype(jnp.float32), axis=1)
    s1 = jnp.sum(m1.astype(jnp.float32), axis=1)
    s2 = jnp.sum(m2.astype(jnp.float32), axis=1)
    return inter, s1, s2


def dice_score(logits, targets, apply_sigmoid: bool = True, smooth: float = SMOOTH):
    inter, s1, s2 = _thresholded(logits, targets, apply_sigmoid)
    return jnp.mean(2.0 * (inter + smooth) / (s1 + s2 + smooth))


def dice_per_image(logits, targets, apply_sigmoid: bool = True,
                   smooth: float = SMOOTH):
    """Per-image Dice, shape (B,) — `dice_score` without the batch mean."""
    inter, s1, s2 = _thresholded(logits, targets, apply_sigmoid)
    return 2.0 * (inter + smooth) / (s1 + s2 + smooth)


def dice_pair(logits, targets):
    """(numerator, denominator) per sample for padded-batch evaluation:
    sum(num[valid]) / sum(den[valid]) over a batch reproduces the reference's
    per-batch mean Dice (`train_segmentation.py:90-95`) on the unpadded batch."""
    d = dice_per_image(logits, targets)
    return d, jnp.ones_like(d)


def iou_score(logits, targets, apply_sigmoid: bool = True, smooth: float = SMOOTH):
    inter, s1, s2 = _thresholded(logits, targets, apply_sigmoid)
    return jnp.mean((inter + smooth) / (s1 + s2 - inter + smooth))


def precision_score(logits, targets, apply_sigmoid: bool = True,
                    smooth: float = SMOOTH):
    inter, s1, _ = _thresholded(logits, targets, apply_sigmoid)
    return jnp.mean((inter + smooth) / (s1 + smooth))


def recall_score(logits, targets, apply_sigmoid: bool = True, smooth: float = SMOOTH):
    inter, _, s2 = _thresholded(logits, targets, apply_sigmoid)
    return jnp.mean((inter + smooth) / (s2 + smooth))
