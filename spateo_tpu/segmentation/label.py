"""Labeling nuclei/cells after masking (capability parity: reference
spateo/segmentation/label.py). All flood/expand algorithms run as device
kernels from `spateo_tpu.ops.labels`.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from ..configuration import SKM
from ..core.anndata import AnnData
from ..errors import SegmentationError
from ..logging import logger_manager as lm
from ..ops.image import conv2d
from ..ops.labels import (
    connected_components,
    distance_transform,
    expand_labels_capped,
    peak_local_max,
    watershed as watershed_kernel,
)
from ..ops.threshold import threshold_otsu
from . import utils


def _replace_labels(labels: np.ndarray, mapping: Dict[int, int]) -> np.ndarray:
    """Apply a label -> label mapping via a lookup table (vectorized;
    parity: reference label.py:22)."""
    labels = np.asarray(labels)
    replacement = np.arange(labels.max() + 1)
    for from_label, to_label in mapping.items():
        replacement[from_label] = to_label
    return replacement[labels]


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def replace_labels(adata: AnnData, layer: str, mapping: Dict[int, int], out_layer: Optional[str] = None):
    """Replace labels according to a mapping."""
    labels = SKM.select_layer_data(adata, layer)
    SKM.set_layer_data(adata, out_layer or layer, _replace_labels(labels, mapping))


def _watershed(X: np.ndarray, mask: np.ndarray, markers: np.ndarray, k: int) -> np.ndarray:
    """Gaussian-blur X and flood `mask` from `markers` (parity: reference
    label.py:62; skimage watershed(-blur, markers, mask))."""
    blur = np.asarray(conv2d(X, k, mode="gauss"))
    if markers.dtype == np.dtype(bool):
        markers = connected_components(markers)[0]
    return watershed_kernel(blur, markers, np.asarray(mask).astype(bool))


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def find_peaks_with_erosion(
    adata: AnnData,
    layer: str = SKM.STAIN_LAYER_KEY,
    k: int = 3,
    square: bool = False,
    min_area: int = 80,
    n_iter: int = -1,
    float_k: int = 5,
    float_threshold: Optional[float] = None,
    out_layer: Optional[str] = None,
):
    """Watershed markers via iterative safe erosion (parity: reference label.py:92)."""
    _layer1 = SKM.gen_new_layer_key(layer, SKM.SCORES_SUFFIX)
    _layer2 = SKM.gen_new_layer_key(layer, SKM.MASK_SUFFIX)
    if _layer1 not in adata.layers and _layer2 not in adata.layers and layer not in adata.layers:
        raise SegmentationError(
            f'Neither "{_layer1}", "{_layer2}", nor "{layer}" are present in AnnData. '
            "Please run either `st.cs.mask_nuclei_from_stain` or `st.cs.score_and_mask_pixels` first."
        )
    _layer = _layer1 if _layer1 in adata.layers else (_layer2 if _layer2 in adata.layers else layer)
    X = np.asarray(SKM.select_layer_data(adata, _layer, make_dense=True))
    if np.issubdtype(X.dtype, np.floating) and not float_threshold:
        float_threshold = threshold_otsu(X)
    markers = utils.safe_erode(X, k, square, min_area, n_iter, float_k, float_threshold)
    out_layer = out_layer or SKM.gen_new_layer_key(layer, SKM.MARKERS_SUFFIX)
    SKM.set_layer_data(adata, out_layer, markers)


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def watershed_fused(
    adata: AnnData,
    layer: str = SKM.STAIN_LAYER_KEY,
    min_distance: int = 3,
    mask_layer: Optional[str] = None,
    out_layer: Optional[str] = None,
    centroids_key: str = "cell_centroids",
):
    """The whole labeling chain (distance transform -> peak markers ->
    connected components -> distance-based watershed -> per-cell centroids)
    as ONE device program (`ops.labels.label_cells_from_mask`).

    TPU-native fast path for production raster sizes: the staged
    `find_peaks_from_mask` + `watershed` pair round-trips four full rasters
    over the host link; this uploads one packed mask and pulls the labels
    once. Writes the label raster to ``{layer}_labels`` and the [L, 2]
    float centroids to ``adata.uns[centroids_key]``. Equivalent to the
    staged pair on disk-shaped cells (identical labels on the atlas
    workload); the staged path remains for custom elevation maps."""
    from ..ops.labels import label_cells_from_mask

    mask_layer = mask_layer or SKM.gen_new_layer_key(layer, SKM.MASK_SUFFIX)
    mask = np.asarray(SKM.select_layer_data(adata, mask_layer)).astype(bool)
    labels_dev, cents = label_cells_from_mask(mask, min_distance=min_distance)
    out_layer = out_layer or SKM.gen_new_layer_key(layer, SKM.LABELS_SUFFIX)
    SKM.set_layer_data(adata, out_layer, np.asarray(labels_dev))
    adata.uns[centroids_key] = cents
    return cents


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def watershed(
    adata: AnnData,
    layer: str = SKM.STAIN_LAYER_KEY,
    k: int = 3,
    mask_layer: Optional[str] = None,
    markers_layer: Optional[str] = None,
    out_layer: Optional[str] = None,
):
    """Assign individual nuclei/cells with the Watershed algorithm (parity:
    reference label.py:144)."""
    X = np.asarray(SKM.select_layer_data(adata, layer, make_dense=True))
    mask_layer = mask_layer or SKM.gen_new_layer_key(layer, SKM.MASK_SUFFIX)
    mask = np.asarray(SKM.select_layer_data(adata, mask_layer))
    markers_layer = markers_layer or SKM.gen_new_layer_key(layer, SKM.MARKERS_SUFFIX)
    markers = np.asarray(SKM.select_layer_data(adata, markers_layer))
    labels = _watershed(X, mask.astype(bool) | (markers > 0), markers, k)
    areas = np.bincount(labels.ravel())
    if (areas[1:] > 10000).any():
        lm.main_warning(
            "Some labels have area greater than 10000. If you are segmenting based on RNA, consider "
            "using `st.cs.label_connected_components` instead."
        )
    out_layer = out_layer or SKM.gen_new_layer_key(layer, SKM.LABELS_SUFFIX)
    SKM.set_layer_data(adata, out_layer, labels)


def _expand_labels(labels: np.ndarray, distance: int, max_area: int, mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Area-capped expansion (device kernel; parity: reference label.py:183)."""
    return expand_labels_capped(labels, distance, max_area, mask)


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def expand_labels(
    adata: AnnData,
    layer: str,
    distance: int = 5,
    max_area: int = 400,
    mask_layer: Optional[str] = None,
    out_layer: Optional[str] = None,
):
    """Expand labels up to `distance` (parity: reference label.py:270)."""
    label_layer = SKM.gen_new_layer_key(layer, SKM.LABELS_SUFFIX)
    if label_layer not in adata.layers:
        label_layer = layer
    labels = np.asarray(SKM.select_layer_data(adata, label_layer))
    mask = np.asarray(SKM.select_layer_data(adata, mask_layer)).astype(bool) if mask_layer else None
    expanded = _expand_labels(labels, distance, max_area, mask=mask)
    out_layer = out_layer or SKM.gen_new_layer_key(label_layer, SKM.EXPANDED_SUFFIX)
    SKM.set_layer_data(adata, out_layer, expanded)


def _label_connected_components(
    X: np.ndarray,
    area_threshold: int = 500,
    k: int = 3,
    min_area: int = 100,
    n_iter: int = -1,
    distance: int = 8,
    max_area: int = 400,
    seed_labels: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Label connected components, splitting those above `area_threshold` by
    erode+re-expand (parity: reference label.py:301)."""
    X = np.asarray(X).astype(bool)
    comps, n = connected_components(X)
    areas = np.bincount(comps.ravel(), minlength=n + 1)
    seeded = np.zeros(n + 1, dtype=bool)
    if seed_labels is not None:
        overlaps = utils.label_overlap(comps, (np.asarray(seed_labels) > 0).astype(int))
        seeded[: overlaps.shape[0]] = np.asarray(overlaps[:, 1:].sum(axis=1)).ravel() > 0
        seeded[0] = False

    small = (areas <= area_threshold) & ~seeded
    small[0] = False
    to_erode_ids = np.where((areas > area_threshold) & ~seeded)[0]
    to_erode_ids = to_erode_ids[to_erode_ids != 0]  # label 0 is background, never erode-split it

    saved = np.zeros(X.shape, dtype=int)
    saved_i = (int(seed_labels.max()) + 1) if seed_labels is not None else 1
    small_ids = np.where(small)[0]
    if small_ids.size:
        remap = np.zeros(n + 1, dtype=int)
        remap[small_ids] = np.arange(len(small_ids)) + saved_i
        saved = remap[comps]
        saved_i += len(small_ids)

    to_erode = np.isin(comps, to_erode_ids)
    if to_erode.any():
        eroded = utils.safe_erode(to_erode, k=k, min_area=min_area, n_iter=n_iter)
        labels, _ = connected_components(eroded)
        labels = np.where(labels > 0, labels + saved_i - 1, 0)
    elif seed_labels is None:
        return saved
    else:
        labels = np.zeros_like(saved)
    if seed_labels is not None:
        labels = labels + np.asarray(seed_labels)
    expanded = _expand_labels(labels, distance=distance, max_area=max_area, mask=X > 0)
    return saved + expanded


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def label_connected_components(
    adata: AnnData,
    layer: str,
    seed_layer: Optional[str] = None,
    area_threshold: int = 500,
    k: int = 3,
    min_area: int = 100,
    n_iter: int = -1,
    distance: int = 8,
    max_area: int = 400,
    out_layer: Optional[str] = None,
):
    """Label connected components with large-component splitting
    (parity: reference label.py:369)."""
    mask_layer = SKM.gen_new_layer_key(layer, SKM.MASK_SUFFIX)
    if mask_layer not in adata.layers:
        mask_layer = layer
    mask = np.asarray(SKM.select_layer_data(adata, mask_layer))
    seed_labels = np.asarray(SKM.select_layer_data(adata, seed_layer)) if seed_layer else None
    labels = _label_connected_components(mask, area_threshold, k, min_area, n_iter, distance, max_area, seed_labels)
    out_layer = out_layer or SKM.gen_new_layer_key(layer, SKM.LABELS_SUFFIX)
    SKM.set_layer_data(adata, out_layer, labels)


def _find_peaks(X: np.ndarray, min_distance: int = 1, **kwargs) -> np.ndarray:
    """Label local maxima (parity: reference label.py:436, skimage
    peak_local_max wrapper)."""
    return peak_local_max(X, min_distance=min_distance)


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def find_peaks(
    adata: AnnData,
    layer: str,
    k: int,
    min_distance: int,
    mask_layer: Optional[str] = None,
    out_layer: Optional[str] = None,
):
    """Blur then find peaks (parity: reference label.py:470)."""
    X = np.asarray(SKM.select_layer_data(adata, layer, make_dense=True))
    if X.dtype == np.dtype(bool):
        raise SegmentationError(
            f"Layer {layer} contains a boolean array. Please use `st.cs.find_peaks_from_mask` instead."
        )
    X = np.asarray(conv2d(X, k, mode="gauss"))
    peaks = _find_peaks(X, min_distance=min_distance)
    if mask_layer:
        peaks = peaks * np.asarray(SKM.select_layer_data(adata, mask_layer))
    out_layer = out_layer or SKM.gen_new_layer_key(layer, SKM.MARKERS_SUFFIX)
    SKM.set_layer_data(adata, out_layer, peaks)


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def find_peaks_from_mask(
    adata: AnnData,
    layer: str,
    min_distance: int,
    distances_layer: Optional[str] = None,
    markers_layer: Optional[str] = None,
):
    """Peaks of the distance transform of a boolean mask -> Watershed markers
    (parity: reference label.py:505; distance transform is the device chamfer
    kernel instead of cv2.distanceTransform)."""
    mask_layer = SKM.gen_new_layer_key(layer, SKM.MASK_SUFFIX)
    if mask_layer not in adata.layers:
        mask_layer = layer
    mask = np.asarray(SKM.select_layer_data(adata, mask_layer))
    if mask.dtype != np.dtype(bool):
        raise SegmentationError(f"Only boolean masks are supported for this function, but got {mask.dtype} instead.")
    distances = distance_transform(mask)
    peaks = _find_peaks(distances, min_distance=min_distance)
    distances_layer = distances_layer or SKM.gen_new_layer_key(layer, SKM.DISTANCES_SUFFIX)
    SKM.set_layer_data(adata, distances_layer, distances)
    markers_layer = markers_layer or SKM.gen_new_layer_key(layer, SKM.MARKERS_SUFFIX)
    SKM.set_layer_data(adata, markers_layer, peaks)


def _augment_labels(source_labels: np.ndarray, target_labels: np.ndarray) -> np.ndarray:
    """Keep target labels that overlap source; copy over source labels with no
    target overlap (parity: reference label.py:549) — both passes via one
    overlap matrix instead of per-region loops."""
    source_labels = np.asarray(source_labels)
    target_labels = np.asarray(target_labels)
    overlap = utils.label_overlap(target_labels, source_labels).toarray()
    # target labels that overlap any positive source
    t_keep = np.where(overlap[:, 1:].sum(axis=1) > 0)[0]
    t_keep = t_keep[t_keep > 0]
    # source labels with no positive target overlap
    overlap_st = overlap.T  # source x target
    s_copy = np.where(overlap_st[:, 1:].sum(axis=1) == 0)[0]
    s_copy = s_copy[s_copy > 0]

    augmented = np.zeros_like(target_labels)
    label = 1
    t_map = np.zeros(int(target_labels.max()) + 1, dtype=int)
    for _label in t_keep:
        t_map[_label] = label
        label += 1
    augmented = t_map[target_labels]
    s_map = np.zeros(int(source_labels.max()) + 1, dtype=int)
    for _label in s_copy:
        s_map[_label] = label
        label += 1
    source_mapped = s_map[source_labels]
    augmented = np.where((augmented == 0) & (source_mapped > 0), source_mapped, augmented)
    return augmented


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def augment_labels(adata: AnnData, source_layer: str, target_layer: str, out_layer: Optional[str] = None):
    """Augment one label layer with another (parity: reference label.py:599)."""
    source_labels = np.asarray(SKM.select_layer_data(adata, source_layer))
    target_labels = np.asarray(SKM.select_layer_data(adata, target_layer))
    augmented = _augment_labels(source_labels, target_labels)
    out_layer = out_layer or SKM.gen_new_layer_key(target_layer, SKM.AUGMENTED_SUFFIX)
    SKM.set_layer_data(adata, out_layer, augmented)
