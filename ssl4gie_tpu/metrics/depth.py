"""Depth loss and eval metrics.

Scale-and-shift-invariant loss: masked MSE after a per-image closed-form least-squares
scale/shift alignment, plus a 4-scale gradient-matching regularizer — behavioral match
of `Depth_estimation/Metrics/losses.py` (compute_scale_and_shift `:5-25`,
mse_loss `:51-57`, gradient_loss `:60-77`, ScaleAndShiftInvariantLoss `:120-146`,
batch-based reduction). All jit-safe.

Eval metrics follow `eval_depth.py:42-61`: align on GT, clamp to [0,1], zero invalid,
x10 metric scale, then RMSE / median relative error / mean absolute error.
"""

from __future__ import annotations

import jax.numpy as jnp


def compute_scale_and_shift(prediction, target, mask):
    """Closed-form 2x2 least squares per image. Inputs (B, H, W)."""
    prediction = prediction.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    a00 = jnp.sum(mask * prediction * prediction, axis=(1, 2))
    a01 = jnp.sum(mask * prediction, axis=(1, 2))
    a11 = jnp.sum(mask, axis=(1, 2))
    b0 = jnp.sum(mask * prediction * target, axis=(1, 2))
    b1 = jnp.sum(mask * target, axis=(1, 2))
    det = a00 * a11 - a01 * a01
    valid = det != 0
    safe_det = jnp.where(valid, det, 1.0)
    x0 = jnp.where(valid, (a11 * b0 - a01 * b1) / safe_det, 0.0)
    x1 = jnp.where(valid, (-a01 * b0 + a00 * b1) / safe_det, 0.0)
    return x0, x1


def _masked_mse(prediction, target, mask):
    m_sum = jnp.sum(mask, axis=(1, 2))
    res = prediction - target
    image_loss = jnp.sum(mask * res * res, axis=(1, 2))
    divisor = jnp.sum(2.0 * m_sum)
    return jnp.where(divisor == 0, 0.0, jnp.sum(image_loss) / jnp.maximum(divisor, 1e-38))


def _gradient_loss_single(prediction, target, mask):
    m_sum = jnp.sum(mask, axis=(1, 2))
    diff = mask * (prediction - target)
    grad_x = jnp.abs(diff[:, :, 1:] - diff[:, :, :-1]) * (mask[:, :, 1:] * mask[:, :, :-1])
    grad_y = jnp.abs(diff[:, 1:, :] - diff[:, :-1, :]) * (mask[:, 1:, :] * mask[:, :-1, :])
    image_loss = jnp.sum(grad_x, axis=(1, 2)) + jnp.sum(grad_y, axis=(1, 2))
    divisor = jnp.sum(m_sum)
    return jnp.where(divisor == 0, 0.0, jnp.sum(image_loss) / jnp.maximum(divisor, 1e-38))


def gradient_loss(prediction, target, mask, scales: int = 4):
    total = 0.0
    for s in range(scales):
        step = 2 ** s
        total += _gradient_loss_single(prediction[:, ::step, ::step],
                                       target[:, ::step, ::step],
                                       mask[:, ::step, ::step])
    return total


def ssi_eval_pair(prediction, target):
    """Per-sample (numerator, denominator) of the alpha=0 SSI eval loss.

    The reference eval metric (`ScaleAndShiftInvariantLoss(alpha=0)`,
    `Depth_estimation/Metrics/losses.py:51-57`) is a ratio of sums over the
    batch: sum_i ||mask*(ssi_pred - gt)||^2 / (2 * sum_i mask_count_i). The
    per-image scale/shift alignment is independent per sample, so on a padded
    eval batch sum(num[valid]) / sum(den[valid]) reproduces the reference's
    value on the unpadded batch exactly."""
    if prediction.ndim == 4:
        prediction = prediction[..., 0]
    if target.ndim == 4:
        target = target[..., 0]
    prediction = prediction.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mask = (target > 0).astype(jnp.float32)
    scale, shift = compute_scale_and_shift(prediction, target, mask)
    pred_ssi = scale[:, None, None] * prediction + shift[:, None, None]
    res = pred_ssi - target
    num = jnp.sum(mask * res * res, axis=(1, 2))
    den = 2.0 * jnp.sum(mask, axis=(1, 2))
    return num, den


def ssi_loss(prediction, target, alpha: float = 0.1, scales: int = 4):
    """prediction/target: (B, H, W) or (B, H, W, 1). mask = target > 0.
    alpha=0.1 for training, alpha=0 for val/selection (`train_depth.py:280-281`)."""
    if prediction.ndim == 4:
        prediction = prediction[..., 0]
    if target.ndim == 4:
        target = target[..., 0]
    prediction = prediction.astype(jnp.float32)
    target = target.astype(jnp.float32)
    mask = (target > 0).astype(jnp.float32)
    scale, shift = compute_scale_and_shift(prediction, target, mask)
    pred_ssi = scale[:, None, None] * prediction + shift[:, None, None]
    total = _masked_mse(pred_ssi, target, mask)
    if alpha > 0:
        total = total + alpha * gradient_loss(pred_ssi, target, mask, scales)
    return total


def aligned_prediction(prediction, target):
    """Scale/shift-align prediction to GT (used by eval post-processing)."""
    mask = (target > 0).astype(jnp.float32)
    scale, shift = compute_scale_and_shift(prediction, target, mask)
    return scale[:, None, None] * prediction + shift[:, None, None]


def depth_eval_metrics(pred_aligned, target, metric_scale: float = 10.0):
    """Per-image RMSE, median relative error, mean absolute error on valid pixels,
    matching `eval_depth.py:45-62` (clamp [0,1], zero where GT==0, x10 scale)."""
    pred = jnp.clip(pred_aligned, 0.0, 1.0)
    mask = target > 0
    pred = jnp.where(mask, pred, 0.0) * metric_scale
    gt = target * metric_scale
    n = jnp.maximum(jnp.sum(mask, axis=(1, 2)), 1)
    err = pred - gt
    rmse = jnp.sqrt(jnp.sum(jnp.where(mask, err * err, 0.0), axis=(1, 2)) / n)
    abs_err = jnp.sum(jnp.where(mask, jnp.abs(err), 0.0), axis=(1, 2)) / n
    rel = jnp.where(mask, jnp.abs(err) / jnp.maximum(gt, 1e-12), jnp.nan)
    med_rel = jnp.nanmedian(rel.reshape(rel.shape[0], -1), axis=1)
    return {"rmse": rmse, "med_rel_err": med_rel, "abs_err": abs_err}
