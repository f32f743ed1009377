"""Classification loss and metrics.

meanF1/meanPrecision/meanRecall match `Classification/Metrics/performance.py:4-56`
(per-class one-vs-rest with smooth=1e-8, averaged over classes, computed on the full
accumulated prediction vector like the reference's test() accumulation,
`train_classification.py:92-98`). The train loss is inverse-frequency-weighted
cross-entropy (`train_classification.py:278`, weights from the dataset folder scan).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SMOOTH = 1e-8


def weighted_cross_entropy(logits, labels, class_weights=None):
    """torch F.cross_entropy(weight=w) semantics: per-sample NLL scaled by w[label],
    summed and divided by the sum of the participating weights."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    if class_weights is None:
        return jnp.mean(nll)
    w = class_weights[labels]
    return jnp.sum(w * nll) / jnp.sum(w)


def _per_class(preds, targets, n_class: int):
    preds = preds.reshape(-1)
    targets = targets.reshape(-1)
    cls = jnp.arange(n_class)
    m1 = preds[None, :] == cls[:, None]
    m2 = targets[None, :] == cls[:, None]
    inter = jnp.sum(m1 & m2, axis=1).astype(jnp.float32)
    s1 = jnp.sum(m1, axis=1).astype(jnp.float32)
    s2 = jnp.sum(m2, axis=1).astype(jnp.float32)
    return inter, s1, s2


def mean_f1(preds, targets, n_class: int, smooth: float = SMOOTH):
    inter, s1, s2 = _per_class(preds, targets, n_class)
    return jnp.mean(2.0 * (inter + smooth) / (s1 + s2 + smooth))


def mean_precision(preds, targets, n_class: int, smooth: float = SMOOTH):
    inter, s1, _ = _per_class(preds, targets, n_class)
    return jnp.mean((inter + smooth) / (s1 + smooth))


def mean_recall(preds, targets, n_class: int, smooth: float = SMOOTH):
    inter, _, s2 = _per_class(preds, targets, n_class)
    return jnp.mean((inter + smooth) / (s2 + smooth))


def accuracy(preds, targets):
    return jnp.mean((preds.reshape(-1) == targets.reshape(-1)).astype(jnp.float32))


def smooth_one_hot(labels, n_class: int, smoothing: float = 0.0):
    """Label-smoothed one-hot targets (timm LabelSmoothingCrossEntropy /
    Mixup target transform, used by `Models/mae/main_finetune.py:219-226`)."""
    off = smoothing / n_class
    on = 1.0 - smoothing + off
    return jnp.full((labels.shape[0], n_class), off, jnp.float32).at[
        jnp.arange(labels.shape[0]), labels].set(on)


def soft_target_cross_entropy(logits, soft_targets):
    """timm SoftTargetCrossEntropy: mean over batch of -sum(y * log_softmax(x))
    (`main_finetune.py:251-254` path when mixup is active)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(jnp.sum(-soft_targets * logp, axis=-1))


def accuracy_topk(logits, labels, ks=(1, 5)):
    """timm-style accuracy@k in percent (`engine_finetune.py:98-130` eval)."""
    n_class = logits.shape[-1]
    order = jnp.argsort(logits, axis=-1)[:, ::-1]
    out = []
    for k in ks:
        k = min(k, n_class)
        hit = jnp.any(order[:, :k] == labels[:, None], axis=1)
        out.append(100.0 * jnp.mean(hit.astype(jnp.float32)))
    return tuple(out)
