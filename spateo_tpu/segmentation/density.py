"""Density binning: spatially-constrained hierarchical clustering of UMI
density (capability parity: reference spateo/segmentation/density.py:46-246).

The Gaussian blur and dilation run on device; the Ward tree itself operates on
the (binned, small) raster host-side via sklearn — it is O(pixels) once the
recommended binning is applied and is not a hot path.
"""

from __future__ import annotations

from typing import Optional, Union

import numpy as np
from scipy import sparse
from scipy.sparse import spmatrix

from ..configuration import SKM
from ..core.anndata import AnnData
from ..logging import logger_manager as lm
from ..ops.image import circle, conv2d, dilate, mclose_mopen
from . import utils


def _create_spatial_adjacency(shape) -> sparse.csr_matrix:
    """4-adjacency matrix of a raster grid."""
    n_rows, n_cols = shape
    n = n_rows * n_cols
    idx = np.arange(n)
    r, c = idx // n_cols, idx % n_cols
    rows, cols = [], []
    right = idx[c < n_cols - 1]
    rows += [right, right + 1]
    cols += [right + 1, right]
    down = idx[r < n_rows - 1]
    rows += [down, down + n_cols]
    cols += [down + n_cols, down]
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    return sparse.csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))


def _schc(X: np.ndarray, distance_threshold: Optional[float] = None) -> np.ndarray:
    """Ward-linkage clustering constrained to the 4-neighbor grid graph
    (parity: reference density.py:46). Dynamic threshold = knee of the
    distance vs cluster-count curve."""
    from sklearn import cluster

    adjacency = _create_spatial_adjacency(X.shape)
    X_flat = X.reshape(-1, 1)
    children, _, n_leaves, _, distances = cluster.ward_tree(X_flat, connectivity=adjacency, return_distance=True)

    if not distance_threshold:
        x = np.sort(np.unique(distances))[-1000:]
        y = np.array([(distances >= val).sum() + 1 for val in x])
        # knee of convex decreasing curve (kneedle): max of inverted difference
        xn = (x - x.min()) / max(x.max() - x.min(), 1e-30)
        yn = (y - y.min()) / max(y.max() - y.min(), 1e-30)
        d = (1 - yn) - xn
        distance_threshold = float(x[int(np.argmax(d))])

    n_clusters = int((distances >= distance_threshold).sum() + 1)
    assignments = cluster._agglomerative._hc_cut(n_clusters, children, n_leaves)
    return assignments.reshape(X.shape)


def _segment_densities(
    X: Union[spmatrix, np.ndarray], k: int, dk: int, distance_threshold: Optional[float] = None
) -> np.ndarray:
    """Blur -> SCHC -> per-bin dilation, ascending mean density
    (parity: reference density.py:97)."""
    if sparse.issparse(X):
        X = X.toarray()
    X = np.asarray(X, dtype=float)
    if X.size > 5e5:
        lm.main_warning(
            f"Array has {X.size} elements. Consider condensing the array by increasing the binsize."
        )
    X = X / X.max()
    X = np.asarray(conv2d(X, k, mode="gauss"))
    bins = _schc(X, distance_threshold=distance_threshold) + 1

    dilated = np.zeros_like(bins)
    for label in sorted(np.unique(bins), key=lambda label: X[bins == label].mean()):
        mask = bins == label
        d = np.asarray(dilate(mask, dk))
        dilated[np.asarray(mclose_mopen(d, dk))] = label
    return dilated


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def segment_densities(
    adata: AnnData,
    layer: str,
    binsize: int,
    k: int,
    dk: int,
    distance_threshold: Optional[float] = None,
    background: Optional[Union[bool, tuple]] = None,
    out_layer: Optional[str] = None,
):
    """Segment into regions by UMI density (parity: reference density.py:145).

    Args:
        adata: Input AnnData (AGG type).
        layer: Layer containing UMI counts.
        binsize: Size of bins to use (counts are sum-pooled before clustering;
            results are upscaled back).
        k: Gaussian blur kernel size.
        dk: Dilation kernel size.
        distance_threshold: Ward linkage distance threshold (dynamic knee if None).
        background: If a (x, y) tuple, the bin at that pixel is marked as
            background. If True, the bin with the most pixels on the raster
            border is considered background. If False/None, no background.
        out_layer: Output layer; defaults to `{layer}_bins`.
    """
    X = SKM.select_layer_data(adata, layer, make_dense=(binsize == 1))
    if binsize > 1:
        from ..io.utils import bin_matrix

        X = bin_matrix(X, binsize)
        if sparse.issparse(X):
            X = X.toarray()
    bins = _segment_densities(X, k, dk, distance_threshold)
    if binsize > 1:
        bins = np.kron(bins, np.ones((binsize, binsize), dtype=int))
        bins = bins[: adata.n_obs, : adata.n_vars]
    if background is not None and background is not False:
        if isinstance(background, (tuple, list)):
            bg_label = bins[int(background[0]), int(background[1])]
        else:
            border = np.concatenate([bins[0], bins[-1], bins[:, 0], bins[:, -1]])
            bg_label = np.bincount(border).argmax()
        bins[bins == bg_label] = 0
        bins[bins > bg_label] -= 1
    out_layer = out_layer or SKM.gen_new_layer_key(layer, SKM.BINS_SUFFIX)
    SKM.set_layer_data(adata, out_layer, bins)


@SKM.check_adata_is_type(SKM.ADATA_AGG_TYPE)
def merge_densities(
    adata: AnnData,
    layer: str,
    mapping: Optional[dict] = None,
    out_layer: Optional[str] = None,
):
    """Merge density bins by a label mapping (parity: reference density.py:223)."""
    bins_layer = SKM.gen_new_layer_key(layer, SKM.BINS_SUFFIX)
    if bins_layer not in adata.layers:
        bins_layer = layer
    bins = np.asarray(SKM.select_layer_data(adata, bins_layer)).copy()
    if mapping:
        for from_label, to_label in mapping.items():
            bins[bins == from_label] = to_label
    out_layer = out_layer or bins_layer
    SKM.set_layer_data(adata, out_layer, bins)
