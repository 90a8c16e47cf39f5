"""Segmentation utilities (capability parity: reference spateo/segmentation/utils.py).

All raster compute routes through `spateo_tpu.ops` device kernels.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
from scipy import sparse

from ..configuration import SKM
from ..core.anndata import AnnData
from ..errors import SegmentationError
from ..logging import logger_manager as lm
from ..ops.image import (
    circle,
    clahe,
    conv2d,
    dilate,
    erode,
    gaussian_blur,
    mclose_mopen,
    median_blur,
    scale_to_01,
    scale_to_255,
)
from ..ops.labels import connected_components, find_boundaries, label_overlap
from ..ops.threshold import knee_threshold, threshold_local, threshold_multiotsu, threshold_otsu

__all__ = [
    "circle",
    "clahe",
    "conv2d",
    "knee_threshold",
    "scale_to_01",
    "scale_to_255",
    "mclose_mopen",
    "apply_threshold",
    "safe_erode",
    "label_overlap",
    "cal_cell_area",
    "filter_cell_labels_by_area",
    "get_cell_shape",
]


def apply_threshold(X, k: int, threshold: Optional[Union[float, np.ndarray]] = None) -> np.ndarray:
    """Threshold an array (knee by default) then morphologically close+open
    (parity: reference segmentation/utils.py:196)."""
    X = np.asarray(X)
    threshold = threshold if threshold is not None else knee_threshold(X)
    mask = mclose_mopen(X >= threshold, k)
    return np.asarray(mask)


def safe_erode(
    X: np.ndarray,
    k: int,
    square: bool = False,
    min_area: int = 1,
    n_iter: int = -1,
    float_k: Optional[int] = None,
    float_threshold: Optional[float] = None,
    max_iter: int = 1000,
) -> np.ndarray:
    """Erode iteratively, preserving connected regions whose area would drop
    below `min_area` (parity: reference segmentation/utils.py:215). Components
    and areas are computed with the device CCA kernel instead of cv2."""
    X = np.asarray(X)
    if X.dtype == np.dtype(bool):
        X = X.astype(np.uint8)
    is_float = np.issubdtype(X.dtype, np.floating)
    if is_float and (float_k is None or float_threshold is None):
        raise ValueError("`float_k` and `float_threshold` must be provided for floating point arrays.")
    saved = np.zeros(X.shape, dtype=bool)

    i = 0
    while True:
        mask_now = apply_threshold(X, float_k, float_threshold) if is_float else (X > 0)
        labels, n = connected_components(mask_now)
        areas = np.bincount(labels.ravel(), minlength=n + 1)
        small = np.where(areas[1:] <= min_area)[0] + 1
        if small.size:
            saved |= np.isin(labels, small)
        X_eroded = np.asarray(erode(X > 0 if not is_float else X, k, square)) if not is_float else None
        if is_float:
            # float erosion: grayscale min-filter via negated dilation of -X
            import jax.numpy as jnp
            from jax import lax

            kern = (np.ones((k, k)) if square else circle(k)).astype(bool)
            Xj = jnp.asarray(X, jnp.float32)
            padded = jnp.pad(Xj, ((k // 2, k // 2), (k // 2, k // 2)), constant_values=jnp.inf)
            patches = lax.conv_general_dilated_patches(
                padded[None, None], filter_shape=(k, k), window_strides=(1, 1), padding="VALID"
            )[0].reshape(k * k, *X.shape)
            sel = jnp.asarray(kern.ravel())
            patches = jnp.where(sel[:, None, None], patches, jnp.inf)
            X = np.asarray(jnp.min(patches, axis=0))
        else:
            X = X_eroded.astype(X.dtype)
        i += 1
        if (areas[1:] > min_area).sum() <= 1 or (n_iter > 0 and n_iter == i) or i >= max_iter:
            break

    mask = (X >= float_threshold) if is_float else (X > 0)
    return (mask | saved).astype(bool)


def cal_cell_area(cell_labels: np.ndarray) -> dict:
    """Pixel count per positive label (parity: reference utils.py:341)."""
    t = np.bincount(np.asarray(cell_labels).ravel())
    return {i: int(t[i]) for i in range(len(t)) if i > 0 and t[i] > 0}


def filter_cell_labels_by_area(adata: AnnData, layer: str, area_cutoff: int = 7):
    """Zero out labels whose area is below `area_cutoff` (parity: utils.py:355)."""
    X = SKM.select_layer_data(adata, layer, make_dense=True)
    cells = [i for i in np.unique(X) if i > 0]
    lm.main_info(f"Cell number before filtering is {len(cells)}")
    areas = np.bincount(np.asarray(X).astype(int).ravel())
    small = np.where(areas < area_cutoff)[0]
    X = np.where(np.isin(X, small[small > 0]), 0, X)
    SKM.set_layer_data(adata, layer, X)
    cells = [i for i in np.unique(X) if i > 0]
    lm.main_info(f"Cell number after filtering is {len(cells)}")


def get_cell_shape(adata: AnnData, layer: str, thickness: int = 1, out_layer: Optional[str] = None):
    """Render cell boundaries (value 255) with the given thickness
    (parity: reference utils.py:377)."""
    labels = np.asarray(SKM.select_layer_data(adata, layer, make_dense=True))
    bound = np.zeros_like(labels, dtype=np.uint8)
    work = labels.copy()
    for _ in range(thickness):
        work = np.where(bound == 0, work, 0)
        bound_one = find_boundaries(work, mode="inner").astype(np.uint8)
        bound += bound_one
    bound = bound * 255
    out_layer = out_layer or SKM.gen_new_layer_key(layer, SKM.BOUNDARY_SUFFIX)
    SKM.set_layer_data(adata, out_layer, bound)
