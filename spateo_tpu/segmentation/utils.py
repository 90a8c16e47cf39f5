"""Segmentation utilities (capability parity: reference spateo/segmentation/utils.py).

All raster compute routes through `spateo_tpu.ops` device kernels.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
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
    below `min_area` (parity: reference segmentation/utils.py:215).

    The WHOLE iterate-erode-until-one-component loop runs as a single
    `lax.while_loop` on device (CCA + area accounting + erosion per step);
    one dispatch in, one bool mask out — per-iteration host syncs cost
    ~0.5 s each over a tunneled link."""
    X = np.asarray(X)
    if X.dtype == np.dtype(bool):
        X = X.astype(np.uint8)
    is_float = np.issubdtype(X.dtype, np.floating)
    if is_float and (float_k is None or float_threshold is None):
        raise ValueError("`float_k` and `float_threshold` must be provided for floating point arrays.")
    mask, saved = _safe_erode_kernel(
        jnp.asarray(X, jnp.float32),
        bool(is_float),
        int(k),
        bool(square),
        int(min_area),
        int(n_iter),
        int(float_k or 0),
        float(float_threshold if float_threshold is not None else 0.0),
        int(max_iter),
    )
    return np.asarray(mask | saved).astype(bool)


@partial(jax.jit, static_argnames=("is_float", "k", "square", "min_area", "n_iter", "float_k", "max_iter"))
def _safe_erode_kernel(
    X0: "jnp.ndarray",
    is_float: bool,
    k: int,
    square: bool,
    min_area: int,
    n_iter: int,
    float_k: int,
    float_threshold: float,
    max_iter: int,
):
    from jax import lax

    from ..ops.image import dilate as _dilate
    from ..ops.image import erode as _erode
    from ..ops.labels import _cc_kernel

    H, W = X0.shape
    kern_bool = jnp.asarray((np.ones((k, k)) if square else circle(k)).astype(bool))

    def threshold_mask(Xc):
        if is_float:
            m = Xc >= float_threshold
            m = _erode(_dilate(m, float_k), float_k)  # close
            return _dilate(_erode(m, float_k), float_k)  # open
        return Xc > 0

    def analyze(mask_now, saved):
        roots = _cc_kernel(mask_now, 8)
        area = jnp.zeros(H * W, jnp.int32).at[roots.ravel()].add(mask_now.ravel().astype(jnp.int32))
        area_pp = area[roots]
        saved = saved | (mask_now & (area_pp > 0) & (area_pp <= min_area))
        return saved, jnp.sum(area > min_area)

    def erode_step(Xc):
        if is_float:
            padded = jnp.pad(Xc, ((k // 2, k // 2), (k // 2, k // 2)), constant_values=jnp.inf)
            patches = lax.conv_general_dilated_patches(
                padded[None, None], filter_shape=(k, k), window_strides=(1, 1), padding="VALID"
            )[0].reshape(k * k, H, W)
            return jnp.min(jnp.where(kern_bool.ravel()[:, None, None], patches, jnp.inf), axis=0)
        return _erode(Xc > 0, k, square).astype(Xc.dtype)

    def cond(state):
        Xc, saved, i, done = state
        return jnp.logical_not(done) & (i < max_iter)

    def body(state):
        Xc, saved, i, _ = state
        saved, n_big = analyze(threshold_mask(Xc), saved)
        Xc = erode_step(Xc)
        i = i + 1
        done = (n_big <= 1) | ((n_iter > 0) & (i >= n_iter))
        return (Xc, saved, i, done)

    Xf, saved, _, _ = lax.while_loop(cond, body, (X0, jnp.zeros((H, W), bool), 0, False))
    mask = (Xf >= float_threshold) if is_float else (Xf > 0)
    return mask, saved


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
