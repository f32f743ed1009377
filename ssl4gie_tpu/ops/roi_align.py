"""RoIAlign (torchvision semantics) in pure XLA, plus FPN level assignment.

Replaces torchvision's C++/CUDA `roi_align` used inside the reference's Faster
R-CNN (`MultiScaleRoIAlign`): aligned bilinear sampling with `sampling_ratio=2`
(2x2 sample points per output bin), output 7x7, and the FPN level mapper
k = floor(4 + log2(sqrt(area)/224)) clamped to available levels.

Design: rois are a fixed-size (R, 4) array with a validity mask; each roi gathers
4*2*2 bilinear taps per output cell from its assigned level. Gathers are batched
into one take_along_axis per level. A Pallas kernel can later replace the gather
core; the interface stays the same.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def _bilinear_sample(feat, ys, xs):
    """feat: (H, W, C); ys/xs: (P,) float sample coords. Returns (P, C).
    torchvision roi_align convention: samples outside [−1, H] are zero; border
    coords clamp (`roi_align_kernel`: if y < -1 or y > height -> 0)."""
    H, W, C = feat.shape
    outside = (ys < -1.0) | (ys > H) | (xs < -1.0) | (xs > W)
    y = jnp.clip(ys, 0.0, H - 1.0)
    x = jnp.clip(xs, 0.0, W - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1, H - 1.0)
    x1 = jnp.minimum(x0 + 1, W - 1.0)
    wy = y - y0
    wx = x - x0

    flat = feat.reshape(H * W, C)

    def tap(yy, xx):
        lin = (yy * W + xx).astype(jnp.int32)
        return flat[lin]

    v = (tap(y0, x0) * ((1 - wy) * (1 - wx))[:, None]
         + tap(y0, x1) * ((1 - wy) * wx)[:, None]
         + tap(y1, x0) * (wy * (1 - wx))[:, None]
         + tap(y1, x1) * (wy * wx)[:, None])
    return jnp.where(outside[:, None], 0.0, v)


def roi_align_single_level(feat, rois, spatial_scale: float, output_size: int = 7,
                           sampling_ratio: int = 2, aligned: bool = False):
    """feat: (H, W, C); rois: (R, 4) xyxy in image coords. Returns (R, out, out, C).
    torchvision (non-aligned) continuous-coordinate convention."""
    off = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - off
    y1 = rois[:, 1] * spatial_scale - off
    x2 = rois[:, 2] * spatial_scale - off
    y2 = rois[:, 3] * spatial_scale - off
    roi_w = jnp.maximum(x2 - x1, 1.0 if not aligned else 1e-6)
    roi_h = jnp.maximum(y2 - y1, 1.0 if not aligned else 1e-6)
    bin_w = roi_w / output_size
    bin_h = roi_h / output_size
    s = sampling_ratio

    # sample offsets within each bin: (s,) midpoints
    grid = (jnp.arange(s, dtype=jnp.float32) + 0.5) / s
    # per-roi sample coords: y in (R, out, s), x in (R, out, s)
    bins = jnp.arange(output_size, dtype=jnp.float32)
    ys = y1[:, None, None] + (bins[None, :, None] + grid[None, None, :]) * bin_h[:, None, None]
    xs = x1[:, None, None] + (bins[None, :, None] + grid[None, None, :]) * bin_w[:, None, None]

    R = rois.shape[0]
    P = output_size * s
    ys_flat = ys.reshape(R, P)
    xs_flat = xs.reshape(R, P)

    # full sample lattice per roi: (R, P, P) -> flatten
    yy = jnp.broadcast_to(ys_flat[:, :, None], (R, P, P)).reshape(R, P * P)
    xx = jnp.broadcast_to(xs_flat[:, None, :], (R, P, P)).reshape(R, P * P)

    vals = jax.vmap(lambda y, x: _bilinear_sample(feat, y, x))(yy, xx)
    C = feat.shape[-1]
    vals = vals.reshape(R, output_size, s, output_size, s, C)
    return vals.mean(axis=(2, 4))


def fpn_level_assignment(rois, k_min: int = 2, k_max: int = 5,
                         canonical_scale: float = 224.0, canonical_level: int = 4):
    """torchvision LevelMapper: k = floor(k0 + log2(sqrt(area)/s0 + eps))."""
    area = jnp.maximum((rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1]), 0.0)
    k = jnp.floor(canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + 1e-6))
    return jnp.clip(k, k_min, k_max).astype(jnp.int32) - k_min


def multiscale_roi_align(features: Sequence[jnp.ndarray], rois,
                         spatial_scales: Sequence[float], output_size: int = 7,
                         sampling_ratio: int = 2, extent_hw=None):
    """features: list of (H_l, W_l, C) maps (one image, strides 4..32);
    rois: (R, 4) in image coords. Single-pass design: all levels are flattened into
    one (sum HW, C) table and each roi gathers from its assigned level via a
    per-roi (scale, H, W, base-offset) lookup — no per-level scatter, no L-fold
    recompute, static shapes throughout.

    extent_hw: optional (L, 2) per-level (h, w) valid extents (dynamic) — the
    batch-max emulation (`models/faster_rcnn.py` content_sizes): torchvision's
    feature maps END at the batch-max extent, so its border clamp/outside
    rules apply at the extent, not at this static canvas's map edge. The
    gather row stride stays the real map width."""
    L = len(features)
    C = features[0].shape[-1]
    levels = fpn_level_assignment(rois, k_min=2, k_max=2 + L - 1)   # (R,) in [0, L)

    hs = jnp.asarray([f.shape[0] for f in features], jnp.float32)
    ws = jnp.asarray([f.shape[1] for f in features], jnp.float32)
    scales = jnp.asarray(list(spatial_scales), jnp.float32)
    bases = jnp.asarray(
        np_cumsum0([f.shape[0] * f.shape[1] for f in features]), jnp.int32)
    table = jnp.concatenate([f.reshape(-1, C) for f in features], axis=0)

    scale_r = scales[levels]                 # (R,)
    if extent_hw is None:
        H_r = hs[levels]
        W_r = ws[levels]
    else:
        ext = jnp.asarray(extent_hw, jnp.float32)
        H_r = ext[:, 0][levels]
        W_r = ext[:, 1][levels]
    W_row = ws[levels]                       # physical row stride for gathers
    base_r = bases[levels]

    x1 = rois[:, 0] * scale_r
    y1 = rois[:, 1] * scale_r
    x2 = rois[:, 2] * scale_r
    y2 = rois[:, 3] * scale_r
    roi_w = jnp.maximum(x2 - x1, 1.0)
    roi_h = jnp.maximum(y2 - y1, 1.0)
    out = output_size
    s = sampling_ratio
    P = out * s
    grid = (jnp.arange(P, dtype=jnp.float32) + 0.5) / s      # bin+offset fused
    ys = y1[:, None] + grid[None, :] * (roi_h / out)[:, None]     # (R, P)
    xs = x1[:, None] + grid[None, :] * (roi_w / out)[:, None]

    R = rois.shape[0]
    yy = jnp.broadcast_to(ys[:, :, None], (R, P, P))
    xx = jnp.broadcast_to(xs[:, None, :], (R, P, P))

    outside = ((yy < -1.0) | (yy > H_r[:, None, None])
               | (xx < -1.0) | (xx > W_r[:, None, None]))
    y = jnp.clip(yy, 0.0, H_r[:, None, None] - 1.0)
    x = jnp.clip(xx, 0.0, W_r[:, None, None] - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1f = jnp.minimum(y0 + 1, H_r[:, None, None] - 1.0)
    x1f = jnp.minimum(x0 + 1, W_r[:, None, None] - 1.0)
    wy = y - y0
    wx = x - x0

    def tap(yc, xc):
        lin = base_r[:, None, None] + (yc * W_row[:, None, None] + xc).astype(jnp.int32)
        g = jnp.take(table, lin.reshape(R, P * P), axis=0)   # (R, P*P, C)
        return g.reshape(R, P, P, C)

    v = (tap(y0, x0) * ((1 - wy) * (1 - wx))[..., None]
         + tap(y0, x1f) * ((1 - wy) * wx)[..., None]
         + tap(y1f, x0) * (wy * (1 - wx))[..., None]
         + tap(y1f, x1f) * (wy * wx)[..., None])
    v = jnp.where(outside[..., None], 0.0, v)
    v = v.reshape(R, out, s, out, s, C)
    return v.mean(axis=(2, 4))


def np_cumsum0(sizes):
    import numpy as np
    return np.concatenate([[0], np.cumsum(sizes)[:-1]]).astype("int32")
