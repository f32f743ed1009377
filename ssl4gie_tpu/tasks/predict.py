"""Prediction renderers — the reference predict_*.py equivalents.

- segmentation (`predict_segmentation.py:20-38`): thresholded mask PNGs at native
  resolution into `Predictions/<dataset>/...`.
- depth (`predict_depth.py:17-63`): magma-colormapped depth + bone-colormapped
  error maps.
- detection (`predict_detection.py:29-76`): GT (yellow) + predicted (green) boxes
  drawn on the image.

Host-side output path (PIL/numpy; the reference used cv2 — drawing stays on host
either way).
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssl4gie_tpu.data.augment import eval_batch


def _fwd(model, params, batch_stats):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return jax.jit(lambda img: model.apply(variables, img, train=False))


def _colormap(x: np.ndarray, name: str = "magma") -> np.ndarray:
    """x in [0,1] -> uint8 RGB. Uses matplotlib if present, else grayscale."""
    try:
        import matplotlib.cm as cm
        return (cm.get_cmap(name)(np.clip(x, 0, 1))[..., :3] * 255).astype(np.uint8)
    except Exception:
        g = (np.clip(x, 0, 1) * 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)


def predict_segmentation(cfg, model, params, batch_stats, test_source, out_dir,
                         indices: Optional[Iterable[int]] = None):
    from PIL import Image
    fwd = _fwd(model, params, batch_stats)
    os.makedirs(out_dir, exist_ok=True)
    idx = list(indices) if indices is not None else range(len(test_source))
    written = []
    for i in idx:
        s = test_source.get(i)
        img = eval_batch(jnp.asarray(s["image"][None]))
        logits = fwd(img)
        h, w = s["mask"].shape[:2]
        logits = jax.image.resize(logits.astype(jnp.float32), (1, h, w, 1),
                                  "bilinear")
        mask = (np.asarray(jax.nn.sigmoid(logits))[0, :, :, 0] > 0.5)
        path = os.path.join(out_dir, f"pred_{i}.png")
        Image.fromarray((mask * 255).astype(np.uint8)).save(path)
        written.append(path)
    return written


def predict_depth(cfg, model, params, batch_stats, test_source, out_dir,
                  indices: Optional[Iterable[int]] = None):
    from PIL import Image
    from ssl4gie_tpu.metrics.depth import compute_scale_and_shift
    fwd = _fwd(model, params, batch_stats)
    os.makedirs(out_dir, exist_ok=True)
    idx = list(indices) if indices is not None else range(len(test_source))
    written = []
    for i in idx:
        s = test_source.get(i)
        img = eval_batch(jnp.asarray(s["image"][None]))
        out = np.asarray(fwd(img))[0, :, :, 0]
        t224 = s["depth"][:, :, 0]
        sc, sh = compute_scale_and_shift(jnp.asarray(out[None]),
                                         jnp.asarray(t224[None]),
                                         jnp.asarray((t224 > 0)[None]))
        aligned = np.clip(float(sc[0]) * out + float(sh[0]), 0, 1)
        depth_png = os.path.join(out_dir, f"depth_{i}.png")
        Image.fromarray(_colormap(aligned, "magma")).save(depth_png)
        err = np.abs(aligned - t224)
        err[t224 == 0] = 0.0
        err_png = os.path.join(out_dir, f"error_{i}.png")
        Image.fromarray(_colormap(err, "bone")).save(err_png)
        written += [depth_png, err_png]
    return written


def draw_boxes(img_u8: np.ndarray, boxes, color, thickness: int = 2) -> np.ndarray:
    """Rectangle outlines on an HxWx3 uint8 array (cv2.rectangle equivalent)."""
    out = img_u8.copy()
    H, W = out.shape[:2]
    for b in boxes:
        x0, y0, x1, y1 = [int(round(float(v))) for v in b]
        x0, x1 = max(x0, 0), min(x1, W - 1)
        y0, y1 = max(y0, 0), min(y1, H - 1)
        for t in range(thickness):
            if y0 + t < H:
                out[y0 + t, x0:x1 + 1] = color
            if 0 <= y1 - t < H:
                out[y1 - t, x0:x1 + 1] = color
            if x0 + t < W:
                out[y0:y1 + 1, x0 + t] = color
            if 0 <= x1 - t < W:
                out[y0:y1 + 1, x1 - t] = color
    return out


def predict_detection(cfg, model, params, batch_stats, test_source, out_dir,
                      indices=None, score_thresh: float = 0.5):
    """GT (yellow) + predictions above 0.5 (green) drawn on the ORIGINAL
    image: boxes are mapped back through the pad/downscale bookkeeping like
    `predict_detection.py:29-76,115`. Sources without originals (synthetic)
    draw on the model-input canvas."""
    from PIL import Image
    from ssl4gie_tpu.tasks.detection import (boxes_to_original, clip_to_content,
                                             make_detection_eval_step)
    eval_step = make_detection_eval_step(model, batch_stats)
    os.makedirs(out_dir, exist_ok=True)
    if hasattr(test_source, "keep_original"):
        test_source.keep_original = True
    idx = list(indices) if indices is not None else range(len(test_source))
    written = []
    for i in idx:
        s = test_source.get(i)
        img = jnp.asarray(s["image"][None]).astype(jnp.float32) / 255.0
        # per-image content extent -> in-model torchvision batch-max semantics
        # (a predict "batch" is one image, so batch-max == its own extent)
        cs = (jnp.asarray(s["content_size"][None])
              if "content_size" in s else None)
        det = {k: np.asarray(v)[0]
               for k, v in eval_step(params, img, cs).items()}
        keep = det["valid"] & (det["scores"] > score_thresh)
        gt = s["gt_boxes"][s["gt_valid"]]
        pred = det["boxes"][keep]
        if "content_size" in s:
            # torchvision per-image clip to the pre-pad extent (RN50 path)
            pred = clip_to_content(pred, s["content_size"])
        if "original" in s:
            canvas = s["original"].copy()
            gt = boxes_to_original(gt, s["pad"], s["scale"])
            pred = boxes_to_original(pred, s["pad"], s["scale"])
        else:
            canvas = s["image"].copy()
        canvas = draw_boxes(canvas, gt, color=(255, 255, 0))    # GT yellow
        canvas = draw_boxes(canvas, pred, color=(0, 255, 0))    # pred green
        path = os.path.join(out_dir, f"det_{i}.png")
        Image.fromarray(canvas).save(path)
        written.append(path)
    return written
