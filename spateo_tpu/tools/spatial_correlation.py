"""Bivariate spatial correlation (capability parity: reference
spateo/tools/spatial_correlation.py:12-282).

The reference delegates to esda's ``Moran_BV`` / ``Moran_Local_BV``
(esda is not in this image); the same statistics are computed here
directly, following esda's definitions:

- global bivariate Moran: ``I = zx' W zy / (n - 1)`` with z-scores using
  ddof=1 and row-standardized weights; permutation inference permutes y and
  uses esda's "extreme-side" p-value fold.
- local bivariate Moran: ``I_i = (n-1) * zx_i * (W zy)_i / sum(zx^2)`` with
  ddof=0 z-scores, quadrant codes from the signs of ``zx`` and ``W zy``, and
  conditional-permutation inference (y values of the OTHER observations
  permuted per site, vectorized).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import numpy as np
import pandas as pd
from scipy import stats
from scipy.sparse import csr_matrix, issparse

from ..core.anndata import AnnData


def _row_standardize(W) -> csr_matrix:
    W = csr_matrix(W, dtype=np.float64)
    d = np.asarray(W.sum(axis=1)).ravel()
    inv = np.where(d > 0, 1.0 / np.maximum(d, 1e-300), 0.0)
    from scipy.sparse import diags

    return csr_matrix(diags(inv) @ W)


def _get_connectivities(adata: AnnData, connectivity_key: str, n_neighbors: int) -> csr_matrix:
    if connectivity_key not in adata.obsp:
        from .find_neighbors import neighbors

        neighbors(
            adata,
            basis="spatial",
            spatial_key="spatial",
            n_neighbors_method="ball_tree",
            n_neighbors=n_neighbors,
        )
        connectivity_key = "spatial_connectivities"
    return csr_matrix(adata.obsp[connectivity_key], dtype=np.float64)


def _feature_values(adata: AnnData, key: str) -> np.ndarray:
    if key in adata.obs:
        return np.asarray(adata.obs[key].values, dtype=np.float64)
    idx = list(adata.var_names).index(key)
    col = adata.X[:, idx]
    col = col.toarray() if issparse(col) else np.asarray(col)
    return np.asarray(col).ravel().astype(np.float64)


def _moran_bv(x: np.ndarray, y: np.ndarray, W: csr_matrix, permutations: Optional[int], seed: int = 0):
    """esda Moran_BV statistics: (I, EI_sim, p_sim, p_z_sim, z_sim)."""
    zx = (x - x.mean()) / x.std(ddof=1)
    zy = (y - y.mean()) / y.std(ddof=1)
    n = len(x)
    den = n - 1.0
    I = float(zx @ (W @ zy)) / den
    if not permutations:
        return I, None, None, None, None
    rng = np.random.default_rng(seed)
    sim = np.empty(permutations)
    WTzx = W.T @ zx  # I(perm) = zx' W zy_perm = (W' zx)' zy_perm — one spmv total
    for p in range(permutations):
        sim[p] = float(WTzx @ zy[rng.permutation(n)]) / den
    larger = int((sim >= I).sum())
    if (permutations - larger) < larger:
        larger = permutations - larger
    p_sim = (larger + 1.0) / (permutations + 1.0)
    EI_sim = sim.mean()
    se = sim.std()
    z_sim = (I - EI_sim) / max(se, 1e-300)
    p_z_sim = 1 - stats.norm.cdf(z_sim) if z_sim > 0 else stats.norm.cdf(z_sim)
    return I, EI_sim, p_sim, p_z_sim, z_sim


def spatial_bv_moran_obs_genes(
    adata: AnnData,
    obs_key: str,
    connectivity_key: str = "spatial_connectivities",
    genes: Union[str, int, Sequence[str], Sequence[int], None] = None,
    n_neighbors: int = 10,
    mode: str = "moran",
    transformation: str = "r",
    permutations: Optional[int] = 999,
    copy: bool = False,
) -> Optional[pd.DataFrame]:
    """Global bivariate Moran's I between an obs variable and gene expression
    (parity: spatial_correlation.py:12-158 — same result columns
    I/EI_sim/pval_sim/pval_z_sim/z_sim, same uns key, same gene selection)."""
    if mode != "moran":
        raise ValueError(f"Unsupported mode: {mode}. Only 'moran' is currently supported")
    if obs_key not in adata.obs:
        raise KeyError(f"'{obs_key}' not found in adata.obs")

    W = _get_connectivities(adata, connectivity_key, n_neighbors)
    if transformation == "r":
        W = _row_standardize(W)
    y = np.asarray(adata.obs[obs_key].values, dtype=np.float64)

    var_names = list(adata.var_names)
    if genes is None:
        gene_names = var_names
        gene_indices = list(range(adata.n_vars))
    elif isinstance(genes, (str, int)):
        gene_indices = [var_names.index(genes)] if isinstance(genes, str) else [genes]
        gene_names = [genes] if isinstance(genes, str) else [var_names[genes]]
    else:
        gene_names, gene_indices = [], []
        for gene in genes:
            if isinstance(gene, str):
                gene_names.append(gene)
                gene_indices.append(var_names.index(gene))
            else:
                gene_names.append(var_names[gene])
                gene_indices.append(gene)

    results = {"I": []}
    if permutations is not None:
        results.update({"EI_sim": [], "pval_sim": [], "pval_z_sim": [], "z_sim": []})
    for idx in gene_indices:
        x = adata.X[:, idx]
        x = np.asarray(x.toarray() if hasattr(x, "toarray") else x).ravel().astype(np.float64)
        I, EI_sim, p_sim, p_z_sim, z_sim = _moran_bv(x, y, W, permutations)
        results["I"].append(I)
        if permutations is not None:
            results["EI_sim"].append(EI_sim)
            results["pval_sim"].append(p_sim)
            results["pval_z_sim"].append(p_z_sim)
            results["z_sim"].append(z_sim)

    df = pd.DataFrame(results, index=gene_names)
    if copy:
        return df
    adata.uns[f"{obs_key}_gene_bv_moranI"] = df
    return None


def spatial_bv_local_moran(
    adata: AnnData,
    feature1_key: str,
    feature2_key: str,
    connectivity_key: str = "spatial_connectivities",
    n_neighbors: int = 10,
    mode: str = "moran",
    transformation: str = "r",
    permutations: Optional[int] = 999,
    copy: bool = False,
    seed: int = 0,
) -> Optional[pd.DataFrame]:
    """Local bivariate Moran between two features (obs columns or genes)
    (parity: spatial_correlation.py:160-282 — same per-site columns
    I/q/EI_sim/pval_sim/pval_z_sim/z_sim and uns key). Quadrant codes:
    1 HH, 2 LH, 3 LL, 4 HL. The conditional permutations draw each site's
    neighbor values from the other observations, vectorized over sites."""
    if mode != "moran":
        raise ValueError(f"Unsupported mode: {mode}. Only 'moran' is currently supported")
    for key in (feature1_key, feature2_key):
        if key not in adata.obs and key not in list(adata.var_names):
            raise KeyError(f"'{key}' not found in adata.obs and a gene name")

    W = _get_connectivities(adata, connectivity_key, n_neighbors)
    if transformation == "r":
        W = _row_standardize(W)
    x = _feature_values(adata, feature1_key)
    y = _feature_values(adata, feature2_key)
    n = len(x)
    n_1 = n - 1
    zx = (x - x.mean()) / x.std()  # esda Moran_Local_BV uses ddof=0
    zy = (y - y.mean()) / y.std()
    den = float((zx * zx).sum())
    lag = np.asarray(W @ zy).ravel()
    Is = n_1 * zx * lag / den

    df = pd.DataFrame(index=adata.obs_names)
    df["I"] = Is
    if permutations:
        # quadrants from the signs of zx and the spatial lag of zy
        zp = zx > 0
        lp = lag > 0
        q = np.where(zp & lp, 1, np.where(~zp & lp, 2, np.where(~zp & ~lp, 3, 4)))
        # conditional randomization: for each permutation, y values of the
        # other observations are shuffled; a site's own value never feeds
        # its own lag because W's diagonal is zero in a kNN graph
        rng = np.random.default_rng(seed)
        sim = np.empty((permutations, n))
        for p in range(permutations):
            perm = rng.permutation(n)
            sim[p] = n_1 * zx * np.asarray(W @ zy[perm]).ravel() / den
        above = sim >= Is[None, :]
        larger = above.sum(axis=0)
        low_extreme = (permutations - larger) < larger
        larger[low_extreme] = permutations - larger[low_extreme]
        df["q"] = q
        df["EI_sim"] = sim.mean(axis=0)
        df["pval_sim"] = (larger + 1.0) / (permutations + 1.0)
        se = sim.std(axis=0)
        z_sim = (Is - sim.mean(axis=0)) / np.maximum(se, 1e-300)
        df["pval_z_sim"] = 1 - stats.norm.cdf(np.abs(z_sim))
        df["z_sim"] = z_sim

    if copy:
        return df
    adata.uns[f"{feature1_key}_{feature2_key}_bv_local_moranI"] = df
    return None
