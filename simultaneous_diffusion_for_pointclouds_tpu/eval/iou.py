"""Semantic-segmentation IoU over generated vs ground-truth scans.

The reference defers to an external ``metrics.iou`` (LiDARGen's, not
vendored) fed by RangeNet++ predictions (``MeasureResults/
SemanticSegmenter.py:41-55``).  This module provides:

- :data:`RANGENET_TO_KITTI360`: the learning-map used by the reference's
  SceneCompleter (:81-103) to convert RangeNet++ train ids to KITTI-360
  semantic ids.
- :func:`confusion_matrix` / :func:`iou_from_confusion`: the standard
  per-class IoU computation the external metric performs.
- :func:`evaluate_folders`: IoU between two Organised/ label trees.
"""

from __future__ import annotations

import glob
import os

import numpy as np

RANGENET_TO_KITTI360 = {
    0: 0, 1: 26, 2: 33, 3: 32, 4: 27, 5: 43, 6: 24, 7: 25, 8: 25, 9: 7,
    10: 9, 11: 8, 12: 6, 13: 11, 14: 13, 15: 21, 16: 21, 17: 22, 18: 17,
    19: 20,
}


def map_labels(labels: np.ndarray, table=RANGENET_TO_KITTI360) -> np.ndarray:
    lut = np.zeros(max(table) + 1, dtype=np.int64)
    for k, v in table.items():
        lut[k] = v
    return lut[np.asarray(labels, dtype=np.int64)]


def confusion_matrix(pred: np.ndarray, gt: np.ndarray, num_classes: int) -> np.ndarray:
    pred = np.asarray(pred).reshape(-1)
    gt = np.asarray(gt).reshape(-1)
    mask = (gt >= 0) & (gt < num_classes) & (pred >= 0) & (pred < num_classes)
    idx = gt[mask] * num_classes + pred[mask]
    return np.bincount(idx, minlength=num_classes**2).reshape(num_classes, num_classes)


def iou_from_confusion(conf: np.ndarray):
    tp = np.diag(conf).astype(np.float64)
    fp = conf.sum(0) - tp
    fn = conf.sum(1) - tp
    denom = tp + fp + fn
    iou = np.where(denom > 0, tp / np.maximum(denom, 1), np.nan)
    return iou, np.nanmean(iou)


def evaluate_folders(pred_dir: str, gt_dir: str, num_classes: int = 50):
    """IoU between per-view label trees (``k_<view>/<n>.npy``)."""
    conf = np.zeros((num_classes, num_classes), dtype=np.int64)
    for gt_path in sorted(glob.glob(os.path.join(gt_dir, "k_*", "*.npy"))):
        rel = os.path.relpath(gt_path, gt_dir)
        pred_path = os.path.join(pred_dir, rel)
        if not os.path.isfile(pred_path):
            continue
        conf += confusion_matrix(np.load(pred_path), np.load(gt_path), num_classes)
    iou, miou = iou_from_confusion(conf)
    return {"iou": iou.tolist(), "miou": float(miou)}
