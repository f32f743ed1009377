"""Held-out evaluation with the reference's post-processing and ledger output.

- classification (`eval_classification.py:41-61`): accumulate argmax preds over the
  test split, print/append mF1, mPrecision, mRecall, accuracy.
- segmentation (`eval_segmentation.py:25-70`): batch 1, keep GT at native
  resolution, bilinearly resize the 224px logits up to (h, w), then Dice/IoU/
  Precision/Recall averaged over images; optional per-instance list.
- depth (`eval_depth.py:31-61`): scale/shift-align the 224px prediction on the 224px
  GT, resize to max(h,w) and center-crop to native, clamp [0,1], zero invalid, x10
  scale, then RMSE / median-rel-err / abs-err per image.

All model forwards are jitted at a fixed 224px input; native-res post-processing
runs per image on host arrays (tiny work).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssl4gie_tpu.core.config import Task, TrainConfig
from ssl4gie_tpu.core.logger import append_eval_results
from ssl4gie_tpu.data.augment import eval_batch
from ssl4gie_tpu.metrics import classification as cls_metrics
from ssl4gie_tpu.metrics import depth as depth_metrics
from ssl4gie_tpu.metrics import segmentation as seg_metrics


def _print_list_header(cfg: TrainConfig) -> str:
    """The per-instance list variable name (`eval_segmentation.py:71-91`)."""
    arch_id = "RN_" if cfg.architecture.value == "resnet50" else "VT_"
    p = cfg.pretraining.value
    if p in ("Hyperkvasir", "ImageNet_self"):
        data_id = "HK_" if p == "Hyperkvasir" else "IN_"
        alg_id = {"mocov3": "MC_", "barlowtwins": "BT_",
                  "mae": "MA_"}[cfg.ss_framework.value]
        return arch_id + data_id + alg_id + cfg.data.dataset
    if p == "ImageNet_class":
        return arch_id + "IN_SL_" + cfg.data.dataset
    return arch_id + "NA_NA_" + cfg.data.dataset


def _forward_fn(model, params, batch_stats):
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats

    @jax.jit
    def fwd(img):
        return model.apply(variables, img, train=False)

    return fwd


def evaluate_classification(cfg, model, params, batch_stats, test_source,
                            n_class: int, results_root: str = "."):
    fwd = _forward_fn(model, params, batch_stats)
    preds, targets = [], []
    from ssl4gie_tpu.data.loader import Loader
    loader = Loader(test_source, cfg.data.batch_size, shuffle=False, drop_last=False)
    for batch in loader.epoch(0):
        img = eval_batch(jnp.asarray(batch["image"]))
        logits = fwd(img)
        preds.append(np.asarray(jnp.argmax(logits, axis=-1)))
        targets.append(batch["label"])
    preds = jnp.asarray(np.concatenate(preds))
    targets = jnp.asarray(np.concatenate(targets))
    results = {
        "mF1": float(cls_metrics.mean_f1(preds, targets, n_class)),
        "mPrecision": float(cls_metrics.mean_precision(preds, targets, n_class)),
        "mRecall": float(cls_metrics.mean_recall(preds, targets, n_class)),
        "Accuracy": float(cls_metrics.accuracy(preds, targets)),
    }
    header = f"Classification results for {cfg.run_name()}"
    lines = [f"{k}: {v}" for k, v in results.items()]
    for ln in [header] + lines:
        print(ln)
    append_eval_results(results_root, header, lines)
    return results


def evaluate_segmentation(cfg, model, params, batch_stats, test_source,
                          results_root: str = ".", print_list: bool = False):
    """test_source must yield native-res masks (SegmentationSource(native_target=True),
    one image per batch like the reference's batch-1 eval loader)."""
    fwd = _forward_fn(model, params, batch_stats)
    from ssl4gie_tpu.ops.resize import resize_bilinear_ac
    acc = {"Dice": 0.0, "IoU": 0.0, "Precision": 0.0, "Recall": 0.0}
    per_instance = []
    n = len(test_source)
    for i in range(n):
        s = test_source.get(i)
        img = eval_batch(jnp.asarray(s["image"][None]))
        logits = fwd(img)                           # (1, 224, 224, 1)
        mask = jnp.asarray(s["mask"][None])         # (1, h, w, 1) native
        h, w = mask.shape[1], mask.shape[2]
        logits = jax.image.resize(logits.astype(jnp.float32), (1, h, w, 1),
                                  method="bilinear")
        d = float(seg_metrics.dice_score(logits, mask))
        acc["Dice"] += d
        acc["IoU"] += float(seg_metrics.iou_score(logits, mask))
        acc["Precision"] += float(seg_metrics.precision_score(logits, mask))
        acc["Recall"] += float(seg_metrics.recall_score(logits, mask))
        per_instance.append(d)
    results = {k: v / n for k, v in acc.items()}
    header = f"Segmentation results for {cfg.run_name()}"
    lines = [f"{k}: {v}" for k, v in results.items()]
    for ln in [header] + lines:
        print(ln)
    append_eval_results(results_root, header, lines)
    if print_list:
        print(_print_list_header(cfg) + " = [")
        for r in per_instance:
            print(f"    {r},")
        print("]")
    return results


def _center_crop(arr: np.ndarray, h: int, w: int) -> np.ndarray:
    """torchvision center_crop semantics on (H, W) array."""
    H, W = arr.shape
    top = int(round((H - h) / 2.0))
    left = int(round((W - w) / 2.0))
    return arr[top:top + h, left:left + w]


def evaluate_depth(cfg, model, params, batch_stats, test_source,
                   results_root: str = ".", print_list: bool = False,
                   metric_scale: float = 10.0):
    """test_source: DepthSource(with_native=True)."""
    fwd = _forward_fn(model, params, batch_stats)
    acc = {"RMSE": 0.0, "Relative Error": 0.0, "Absolute Error": 0.0}
    per_instance = []
    n = len(test_source)
    for i in range(n):
        s = test_source.get(i)
        img = eval_batch(jnp.asarray(s["image"][None]))
        out = np.asarray(fwd(img))[0, :, :, 0]               # (224, 224)
        target224 = s["depth"][:, :, 0]
        native = s["native_depth"][:, :, 0]
        h, w = native.shape
        # scale/shift align on the 224px pair (`eval_depth.py:43-44`)
        sc, sh = depth_metrics.compute_scale_and_shift(
            jnp.asarray(out[None]), jnp.asarray(target224[None]),
            jnp.asarray((target224 > 0)[None]))
        out = float(sc[0]) * out + float(sh[0])
        # resize to max(h,w) square, center-crop to (h,w) (`eval_depth.py:46-51`)
        m = max(h, w)
        out = np.asarray(jax.image.resize(jnp.asarray(out), (m, m), "bilinear"))
        out = _center_crop(out, h, w)
        out = np.clip(out, 0.0, 1.0)
        out[native == 0.0] = 0.0
        pred = out * metric_scale
        gt = native * metric_scale
        valid = gt > 0
        rmse = float(np.sqrt(np.mean((pred - gt)[valid] ** 2)))
        rel = float(np.median(np.abs((pred - gt) / gt)[valid]))
        abse = float(np.mean(np.abs(pred - gt)[valid]))
        acc["RMSE"] += rmse
        acc["Relative Error"] += rel
        acc["Absolute Error"] += abse
        per_instance.append(rmse)
    results = {k: v / n for k, v in acc.items()}
    header = f"Depth estimation results for {cfg.run_name()}"
    lines = [f"{k}: {v}" for k, v in results.items()]
    for ln in [header] + lines:
        print(ln)
    append_eval_results(results_root, header, lines)
    if print_list:
        print(_print_list_header(cfg) + " = [")
        for r in per_instance:
            print(f"    {r},")
        print("]")
    return results
