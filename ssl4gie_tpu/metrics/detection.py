"""COCO-style mean average precision (host-side numpy).

Replaces `torchmetrics.detection.mean_ap.MeanAveragePrecision` which the reference
uses for detection selection/eval (`train_detection.py:18,136-151`): 101-point
interpolated AP averaged over IoU thresholds 0.50:0.95:0.05 ("map"), plus map_50
and map_75, maxDets=100, greedy best-IoU matching per COCO protocol.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

IOU_THRESHOLDS = np.arange(0.5, 1.0, 0.05).round(2)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float32)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def _ap_for_class(preds, gts, iou_thr: float, max_dets: int = 100) -> float:
    """preds: list per image of (boxes, scores); gts: list per image of boxes.
    Returns AP (or nan if no GT)."""
    n_gt = sum(len(g) for g in gts)
    if n_gt == 0:
        return float("nan")
    records = []                       # (score, is_tp)
    for (boxes, scores), gt in zip(preds, gts):
        order = np.argsort(-scores)[:max_dets]
        boxes, scores = boxes[order], scores[order]
        iou = _iou_matrix(boxes, gt)
        matched = np.zeros(len(gt), bool)
        for i in range(len(boxes)):
            best_j, best_iou = -1, iou_thr
            for j in range(len(gt)):
                if not matched[j] and iou[i, j] >= best_iou:
                    best_iou = iou[i, j]
                    best_j = j
            if best_j >= 0:
                matched[best_j] = True
                records.append((scores[i], 1))
            else:
                records.append((scores[i], 0))
    if not records:
        return 0.0
    records.sort(key=lambda r: -r[0])
    tps = np.array([r[1] for r in records], np.float32)
    tp_cum = np.cumsum(tps)
    fp_cum = np.cumsum(1.0 - tps)
    recall = tp_cum / n_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-12)
    # COCO: precision envelope, 101-point interpolation
    for i in range(len(precision) - 2, -1, -1):
        precision[i] = max(precision[i], precision[i + 1])
    idx = np.searchsorted(recall, RECALL_POINTS, side="left")
    p_at_r = np.where(idx < len(precision), precision[np.minimum(idx,
                                                                 len(precision) - 1)],
                      0.0)
    return float(np.mean(p_at_r))


class MeanAveragePrecision:
    """Accumulate per-image detections/targets; compute() -> dict like
    torchmetrics (map, map_50, map_75)."""

    def __init__(self, max_dets: int = 100):
        self.max_dets = max_dets
        self.preds: List[Dict] = []
        self.targets: List[Dict] = []

    def update(self, preds: List[Dict], targets: List[Dict]):
        """Each pred: dict(boxes (N,4), scores (N,), labels (N,)); each target:
        dict(boxes (M,4), labels (M,)). numpy arrays."""
        self.preds += [{k: np.asarray(v) for k, v in p.items()} for p in preds]
        self.targets += [{k: np.asarray(v) for k, v in t.items()} for t in targets]

    def compute(self) -> Dict[str, float]:
        classes = sorted({int(c) for t in self.targets
                          for c in np.unique(t["labels"])})
        aps = np.full((len(IOU_THRESHOLDS), len(classes)), np.nan)
        for ci, c in enumerate(classes):
            preds_c = []
            gts_c = []
            for p, t in zip(self.preds, self.targets):
                sel = p["labels"] == c
                preds_c.append((p["boxes"][sel].reshape(-1, 4),
                                p["scores"][sel].reshape(-1)))
                gts_c.append(t["boxes"][t["labels"] == c].reshape(-1, 4))
            for ti, thr in enumerate(IOU_THRESHOLDS):
                aps[ti, ci] = _ap_for_class(preds_c, gts_c, thr, self.max_dets)
        with np.errstate(invalid="ignore"):
            return {"map": float(np.nanmean(aps)),
                    "map_50": float(np.nanmean(aps[0])),
                    "map_75": float(np.nanmean(aps[5]))}

    def reset(self):
        self.preds, self.targets = [], []
