"""Segmentation benchmarking metrics (parity: reference spateo/segmentation/benchmark.py)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pandas as pd
from scipy import sparse
from sklearn import metrics

from ..configuration import SKM
from ..core.anndata import AnnData
from ..logging import logger_manager as lm
from . import utils
from .qc import _generate_random_labels


def adjusted_rand_score(y_true: np.ndarray, y_pred: np.ndarray) -> float:
    """Overflow-safe ARI (parity: benchmark.py:18)."""
    (tn, fp), (fn, tp) = metrics.pair_confusion_matrix(y_true, y_pred)
    tn, tp, fp, fn = int(tn), int(tp), int(fp), int(fn)
    if fn == 0 and fp == 0:
        return 1.0
    return 2.0 * (tp * tn - fn * fp) / ((tp + fn) * (fn + tn) + (tp + fp) * (fp + tn))


def iou(labels1: np.ndarray, labels2: np.ndarray) -> sparse.csr_matrix:
    """Pairwise label IoU matrix (parity: benchmark.py:38) — vectorized over
    the overlap sparsity pattern instead of a nonzero loop."""
    labels1 = np.asarray(labels1)
    labels2 = np.asarray(labels2)
    areas1 = np.bincount(labels1.ravel())
    areas2 = np.bincount(labels2.ravel())
    overlaps = utils.label_overlap(labels1, labels2).astype(float).tocoo()
    union = areas1[overlaps.row] + areas2[overlaps.col] - overlaps.data
    return sparse.csr_matrix((overlaps.data / union, (overlaps.row, overlaps.col)), shape=overlaps.shape)


def average_precision(iou: sparse.csr_matrix, tau: float = 0.5) -> float:
    """AP@tau given an IoU matrix (parity: benchmark.py:58)."""
    tp = (iou > tau).sum()
    fp = iou.shape[1] - tp - 1
    fn = iou.shape[0] - tp - 1
    return tp / (tp + fn + fp)


def classification_stats(y_true: np.ndarray, y_pred: np.ndarray) -> Tuple[float, ...]:
    """Binary occupancy confusion stats (parity: benchmark.py:75)."""
    y_true_bool = np.asarray(y_true).ravel() > 0
    y_pred_bool = np.asarray(y_pred).ravel() > 0
    pos = y_true_bool.sum()
    neg = (~y_true_bool).sum()
    tn, fp, fn, tp = metrics.confusion_matrix(y_true_bool, y_pred_bool).ravel()
    precision = tp / (tp + fp)
    recall = tp / (tp + fn)
    accuracy = (tp + tn) / (tp + tn + fp + fn)
    f1 = 2 * precision * recall / (precision + recall)
    return (tn / neg, fp / neg, fn / pos, recall, precision, accuracy, f1)


def labeling_stats(y_true: np.ndarray, y_pred: np.ndarray) -> Tuple[float, float, float, float]:
    """ARI + homogeneity/completeness/V (parity: benchmark.py:107)."""
    ars = adjusted_rand_score(y_true, y_pred)
    homogeneity, completeness, v = metrics.homogeneity_completeness_v_measure(y_true, y_pred)
    return ars, homogeneity, completeness, v


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def compare(
    adata: AnnData,
    true_layer: str,
    pred_layer: str,
    data_layer: str = SKM.X_LAYER,
    umi_pixels_only: bool = True,
    random_background: bool = True,
    ap_taus: Tuple[float, ...] = tuple(np.arange(0.5, 1, 0.05)),
    seed: Optional[int] = None,
) -> pd.DataFrame:
    """Compute segmentation statistics vs reference labels (parity: benchmark.py:129)."""

    def _stats(y_true, y_pred):
        tn, fp, fn, tp, precision, accuracy, f1 = classification_stats(y_true, y_pred)
        both_labeled = (y_true > 0) & (y_pred > 0)
        ars, homogeneity, completeness, v = labeling_stats(y_true[both_labeled], y_pred[both_labeled])
        return [tn, fp, fn, tp, precision, accuracy, f1, ars, homogeneity, completeness, v]

    def _ap(y_true, y_pred, taus):
        _iou = iou(y_true, y_pred)
        return [average_precision(_iou, tau) for tau in taus]

    y_true = np.asarray(SKM.select_layer_data(adata, true_layer))
    y_pred = np.asarray(SKM.select_layer_data(adata, pred_layer))

    if umi_pixels_only:
        X = SKM.select_layer_data(adata, data_layer, make_dense=True)
        umi_mask = np.asarray(X) > 0
        y_true = y_true[umi_mask]
        y_pred = y_pred[umi_mask]

    lm.main_info("Computing statistics.")
    data = {pred_layer: _stats(y_true, y_pred) + _ap(y_true, y_pred, ap_taus)}
    if random_background:
        bincount = np.bincount(y_pred.ravel())
        y_random = _generate_random_labels(y_pred.shape, bincount[1:], seed)
        data["background"] = _stats(y_true, y_random) + _ap(y_true, y_random, ap_taus)
    return pd.DataFrame(
        data,
        index=[
            "True negative",
            "False positive",
            "False negative",
            "True positive",
            "Precision",
            "Accuracy",
            "F1 score",
            "Adjusted rand score",
            "Homogeneity",
            "Completeness",
            "V measure",
        ]
        + [f"Average precision ({tau:.2f})" for tau in ap_taus],
    )
