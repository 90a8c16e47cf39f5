"""Segmentation evaluation metrics (capability parity: reference
simulation_evaluation/evaluation.py:6-47)."""

from __future__ import annotations

import numpy as np


def cal_ami(a1: np.ndarray, a2: np.ndarray) -> float:
    """Adjusted mutual information between label images (parity:
    evaluation.py:6)."""
    from sklearn.metrics.cluster import adjusted_mutual_info_score

    return float(adjusted_mutual_info_score(np.asarray(a1).astype(np.int32).ravel(), np.asarray(a2).astype(np.int32).ravel()))


def cal_f1score(a1: np.ndarray, a2: np.ndarray, binary: bool = True) -> float:
    """F1 score, binarized by default (parity: evaluation.py:13)."""
    from sklearn.metrics import f1_score

    l1 = np.asarray(a1).astype(np.int32).copy()
    l2 = np.asarray(a2).astype(np.int32).copy()
    if binary:
        l1[l1 > 0] = 1
        l2[l2 > 0] = 1
    return float(f1_score(l1.ravel(), l2.ravel()))


def cal_precision(a1: np.ndarray, a2: np.ndarray, tau: float = 0.5) -> float:
    """Object-level precision at IoU >= tau (parity: evaluation.py:23).
    Vectorized: the per-(pred, gt) overlap matrix replaces the per-id
    Python loops."""
    pred = np.asarray(a1).astype(np.int64).ravel()
    gt = np.asarray(a2).astype(np.int64).ravel()
    n_pred, n_gt = pred.max() + 1, gt.max() + 1
    overlap = np.zeros((n_pred, n_gt), np.int64)
    np.add.at(overlap, (pred, gt), 1)
    pred_sizes = overlap.sum(1)
    gt_sizes = overlap.sum(0)
    inter = overlap[1:, 1:]
    union = pred_sizes[1:, None] + gt_sizes[None, 1:] - inter
    iou = inter / np.maximum(union, 1)
    hit = iou >= tau
    tp = int((hit.any(axis=1) & (pred_sizes[1:] > 0)).sum())
    pred_ids = int((pred_sizes[1:] > 0).sum())
    gt_ids = int((gt_sizes[1:] > 0).sum())
    matched_gt = int((hit.any(axis=0) & (gt_sizes[1:] > 0)).sum())
    fp = pred_ids - tp
    fn = gt_ids - matched_gt
    return tp / max(tp + fp + fn, 1)
