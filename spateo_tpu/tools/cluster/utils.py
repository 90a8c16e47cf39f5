"""Clustering utilities (capability parity: reference spateo/tools/cluster/utils.py)."""

from __future__ import annotations

from typing import Any, List, Optional, Tuple, Union

import numpy as np
from scipy.sparse import issparse, spmatrix

from ...configuration import SKM
from ...core.anndata import AnnData
from ...logging import logger_manager as lm


def to_dense_matrix(X) -> np.ndarray:
    return X.toarray() if issparse(X) else np.asarray(X)


def compute_pca_components(
    matrix, random_state: Optional[int] = 1, save_curve_img: Optional[str] = None
) -> Tuple[Any, int, float]:
    """PCA + knee of the explained-variance curve (parity: cluster/utils.py:18)."""
    from ..dimensionality_reduction import randomized_pca_centered

    matrix = to_dense_matrix(matrix)
    matrix[np.isnan(matrix)] = 0
    n_max = min(matrix.shape[0] - 1, matrix.shape[1] - 1, 100)
    pcs, comps, expl = randomized_pca_centered(matrix, n_max, random_state=random_state or 0)
    ratio = expl / expl.sum()
    # knee (convex decreasing): kneedle on the normalized curve
    x = np.arange(1, len(ratio) + 1, dtype=float)
    xn = (x - x.min()) / max(x.max() - x.min(), 1e-30)
    yn = (ratio - ratio.min()) / max(ratio.max() - ratio.min(), 1e-30)
    knee = int(x[np.argmax((1 - yn) - xn)])
    new_n_components = max(knee, 2)
    return pcs, new_n_components, round(float(ratio[:new_n_components].sum()), 3)


@SKM.check_adata_is_type(SKM.ADATA_UMI_TYPE)
def pca_spateo(
    adata: AnnData,
    X_data: Optional[np.ndarray] = None,
    n_pca_components: Optional[int] = None,
    pca_key: Optional[str] = "X_pca",
    genes: Optional[list] = None,
    layer: Optional[str] = None,
    random_state: Optional[int] = 1,
):
    """PCA with automatic component count (parity: cluster/utils.py:60)."""
    from ..dimensionality_reduction import randomized_pca_centered

    if X_data is None:
        if genes is not None:
            genes = adata.var_names.intersection(genes).to_list()
            if len(genes) == 0:
                raise ValueError("no genes from your genes list appear in your adata object.")
        else:
            genes = list(adata.var_names)
        matrix = adata[:, np.asarray(genes)].layers[layer] if layer is not None else adata[:, np.asarray(genes)].X
    else:
        matrix = X_data
    if n_pca_components is None:
        pcs, n_pca_components, _ = compute_pca_components(matrix, random_state=random_state)
    else:
        pcs, _, _ = randomized_pca_centered(matrix, n_pca_components, random_state=random_state or 0)
    adata.obsm[pca_key] = np.asarray(pcs)[:, :n_pca_components]
    return adata


def pearson_residuals(
    adata: AnnData,
    n_top_genes: Optional[int] = 3000,
    subset: bool = False,
    theta: float = 100,
    clip: Optional[float] = None,
    check_values: bool = True,
):
    """Analytic Pearson residuals (parity: cluster/utils.py:121; native
    implementation of Lause et al. 2021 instead of the dynamo import)."""
    X = to_dense_matrix(adata.X).astype(float)
    if check_values and not np.allclose(X, np.round(X)):
        lm.main_warning("`pearson_residuals` expects raw count data; non-integer values found.")
    if n_top_genes is not None and n_top_genes < adata.n_vars:
        # residual-variance-based HVG selection
        tot = X.sum()
        pe = X.sum(0) / tot
        n = X.sum(1)
        mu = n[:, None] * pe[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            res = (X - mu) / np.sqrt(mu + mu**2 / theta)
        res[~np.isfinite(res)] = 0
        var = res.var(axis=0)
        top = np.argsort(-var)[:n_top_genes]
        hv = np.zeros(adata.n_vars, bool)
        hv[top] = True
        adata.var["highly_variable"] = hv
        if subset:
            adata._inplace_subset_var(hv)
            X = X[:, top]
    tot = X.sum()
    pe = X.sum(0) / tot
    n = X.sum(1)
    mu = n[:, None] * pe[None, :]
    with np.errstate(divide="ignore", invalid="ignore"):
        residuals = (X - mu) / np.sqrt(mu + mu**2 / theta)
    residuals[~np.isfinite(residuals)] = 0
    clip_val = np.sqrt(X.shape[0]) if clip is None else clip
    residuals = np.clip(residuals, -clip_val, clip_val)
    adata.obsm["pearson_residuals"] = residuals


@SKM.check_adata_is_type(SKM.ADATA_UMI_TYPE, "adatas")
def integrate(adatas: List[AnnData], batch_key: str = "slices", fill_value: Union[int, float] = 0) -> AnnData:
    """Concatenate slices with batch labels (parity: cluster/utils.py:171)."""
    from ...core.anndata import concat

    for i, a in enumerate(adatas):
        a.obs[batch_key] = str(i)
    out = concat(adatas, join="outer")
    out.uns[SKM.ADATA_TYPE_KEY] = SKM.ADATA_UMI_TYPE
    return out


def ecp_silhouette(matrix, cluster_labels: np.ndarray) -> float:
    """Silhouette coefficient for cluster evaluation (parity:
    cluster/utils.py:243)."""
    from sklearn.metrics import silhouette_score

    return silhouette_score(to_dense_matrix(matrix), cluster_labels)


def spatial_adj(
    adata: AnnData,
    spatial_key: str = "spatial",
    pca_key: str = "pca",
    e_neigh: int = 30,
    s_neigh: int = 6,
    n_pca_components: int = 30,
):
    """Union of expression-KNN and spatial-KNN adjacency (parity:
    cluster/utils.py:277)."""
    from ..find_neighbors import neighbors

    _, adata = neighbors(adata, n_neighbors=e_neigh, basis=pca_key, n_pca_components=n_pca_components)
    _, adata = neighbors(
        adata, n_neighbors=s_neigh, basis="spatial", spatial_key=spatial_key, n_pca_components=n_pca_components
    )
    conn = adata.obsp["expression_connectivities"].copy()
    conn.data[conn.data > 0] = 1
    adj = conn + adata.obsp["spatial_connectivities"]
    adj.data[adj.data > 0] = 1
    return adj
