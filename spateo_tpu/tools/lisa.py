"""LISA (Local Indicators of Spatial Association) analyses
(capability parity: reference spateo/tools/lisa.py:21,90,322) — pysal-free.

Local Moran statistics, quadrant classification and conditional permutation
p-values are computed vectorized over all genes; the spatial-lag regression
(`GM_lag_model`) is a native spatial two-stage-least-squares.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
from scipy import stats
from scipy.sparse import issparse

from ..configuration import SKM
from ..core.anndata import AnnData
from ..logging import logger_manager as lm


def _row_std_knn_w(coords: np.ndarray, k: int) -> np.ndarray:
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=min(k + 1, len(coords))).fit(coords)
    W = nn.kneighbors_graph(coords, mode="connectivity").toarray()
    np.fill_diagonal(W, 0)
    return W / np.maximum(W.sum(1, keepdims=True), 1e-12)


def _local_moran(x: np.ndarray, W: np.ndarray, permutations: int = 199, seed: int = 0):
    """Local Moran's I with conditional permutation p-values and quadrants."""
    n = len(x)
    z = (x - x.mean()) / max(x.std(), 1e-30)
    lag = W @ z
    m2 = (z**2).sum() / n
    Is = z * lag / m2
    # quadrants: 1=HH, 2=LH, 3=LL, 4=HL
    q = np.where(z > 0, np.where(lag > 0, 1, 4), np.where(lag > 0, 2, 3))
    # conditional permutations: shuffle z among OTHER locations per replicate
    rng = np.random.default_rng(seed)
    k_w = (W > 0).sum(1)
    I_perm = np.zeros((permutations, n))
    for p in range(permutations):
        perm = rng.permutation(n)
        zp = z[perm]
        I_perm[p] = z * (W @ zp) / m2
    larger = (I_perm >= Is[None, :]).sum(0)
    low = (I_perm <= Is[None, :]).sum(0)
    p_sim = (np.minimum(larger, low) + 1) / (permutations + 1)
    return Is, q, p_sim, z, lag


class _LisaResult:
    def __init__(self, Is, q, p_sim):
        self.Is = Is
        self.q = q
        self.p_sim = p_sim


def lisa_geo_df(
    adata: AnnData,
    gene: str,
    spatial_key: str = "spatial",
    n_neighbors: int = 8,
    layer: Optional[str] = None,
) -> Tuple[object, pd.DataFrame]:
    """LISA quantile/hot-cold-spot table for one gene (parity: lisa.py:21).
    Returns a plain DataFrame with x/y columns (no geopandas dependency)."""
    coords = np.asarray(adata.obsm[spatial_key], dtype=float)
    W = _row_std_knn_w(coords, n_neighbors)
    df = pd.DataFrame(coords[:, :2], columns=["x", "y"])
    col = adata[:, gene].X if layer is None else adata[:, gene].layers[layer]
    vals = np.asarray(col.toarray() if issparse(col) else col, dtype=np.float64).ravel()
    if layer is not None:
        vals = np.log1p(vals)
    df["exp"] = vals
    df["w_exp"] = W @ vals
    df["exp_zscore"] = (df["exp"] - df["exp"].mean()) / df["exp"].std()
    df["w_exp_zscore"] = (df["w_exp"] - df["w_exp"].mean()) / df["w_exp"].std()
    Is, q, p_sim, _, _ = _local_moran(vals, W)
    lisa = _LisaResult(Is, q, p_sim)
    df = df.assign(Is=Is)
    q_labels = ["Q1", "Q2", "Q3", "Q4"]
    df = df.assign(labels=[q_labels[i - 1] for i in q])
    sig = 1 * (p_sim < 0.05)
    df = df.assign(sig=sig)
    spots = (
        1 * (sig * q == 1) + 3 * (sig * q == 3) + 2 * (sig * q == 2) + 4 * (sig * q == 4)
    )
    spot_labels = ["0 ns", "1 hot spot", "2 doughnut", "3 cold spot", "4 diamond"]
    df = df.assign(group=[spot_labels[i] for i in spots])
    return (lisa, df)


@SKM.check_adata_is_type(SKM.ADATA_UMI_TYPE)
def local_moran_i(
    adata: AnnData,
    group: str,
    spatial_key: str = "spatial",
    genes: Optional[list] = None,
    layer: Optional[str] = None,
    n_neighbors: int = 5,
    copy: bool = False,
    n_jobs: int = 1,
):
    """Cell-type-specific genes via local Moran hot/cold-spot composition
    (parity: lisa.py:90). Adds {spot}_num/frac/spec columns to `.var`."""
    adata = adata.copy() if copy else adata
    coords = np.asarray(adata.obsm[spatial_key], dtype=float)
    W = _row_std_knn_w(coords, n_neighbors)
    group_names = np.asarray(adata.obs[group])
    uniq_g = pd.unique(group_names)
    if genes is None:
        genes = (
            list(adata.var.index[adata.var["use_for_pca"]])
            if "use_for_pca" in adata.var.columns
            else list(adata.var_names)
        )
    else:
        genes = list(adata.var_names.intersection(genes))

    spot_types = {"hotspot": 1, "doughnut": 2, "coldspot": 3, "diamond": 4}
    results = {f"{s}_{suf}": [] for s in spot_types for suf in ("num_val", "frac_val", "spec_val", "num_group", "frac_group", "spec_group")}

    X = adata[:, np.asarray(genes)].X if layer is None else adata[:, np.asarray(genes)].layers[layer]
    X = X.toarray() if issparse(X) else np.asarray(X, dtype=float)
    group_sizes = {g: (group_names == g).sum() for g in uniq_g}
    for j, gene in enumerate(genes):
        vals = X[:, j]
        Is, q, p_sim, _, _ = _local_moran(vals, W, permutations=99)
        sig = p_sim < 0.05
        for s_name, s_q in spot_types.items():
            in_spot = sig & (q == s_q)
            nums, fracs, specs = {}, {}, {}
            total_spot = max(in_spot.sum(), 1)
            for g in uniq_g:
                cnt = int((in_spot & (group_names == g)).sum())
                nums[g] = cnt
                fracs[g] = cnt / group_sizes[g]
                specs[g] = cnt / total_spot
            for metric, d in (("num", nums), ("frac", fracs), ("spec", specs)):
                best = max(d, key=d.get)
                results[f"{s_name}_{metric}_val"].append(d[best])
                results[f"{s_name}_{metric}_group"].append(best)
    for key, vals in results.items():
        col = pd.Series(index=adata.var_names, dtype=object)
        col.loc[genes] = vals
        adata.var[key] = col
    if copy:
        return adata


@SKM.check_adata_is_type(SKM.ADATA_UMI_TYPE)
def GM_lag_model(
    adata: AnnData,
    group: str,
    spatial_key: str = "spatial",
    genes: Optional[list] = None,
    drop_dummy: Optional[str] = None,
    n_neighbors: int = 5,
    layer: Optional[str] = None,
    copy: bool = False,
    n_jobs: int = 1,
    seed: int = 0,
):
    """Spatial-lag regression y = rho W y + X beta + eps by spatial 2SLS
    (parity: lisa.py:322; native S2SLS with instruments [X, WX, W^2 X]).
    Adds {group}_GM_lag_coeff/zstat/pval columns to `.var`."""
    adata = adata.copy() if copy else adata
    rng = np.random.default_rng(seed)
    coords = np.asarray(adata.obsm[spatial_key], dtype=float)
    W = _row_std_knn_w(coords, n_neighbors)
    group_names = pd.Series(np.asarray(adata.obs[group]).astype(str))
    categories = list(pd.unique(group_names)) + ["others"]
    db = group_names.copy()
    group_num = group_names.value_counts()
    min_group_ncells = group_num.values[-1]
    if drop_dummy is None:
        idx = rng.choice(adata.n_obs, min_group_ncells, replace=False)
        db.iloc[idx] = "others"
    else:
        db[db == drop_dummy] = "others"
    dummies = pd.get_dummies(pd.Categorical(db, categories=categories), dtype=float)
    dummies = dummies.drop(columns=["others"], errors="ignore")
    Xd = dummies.values  # [n, K]
    keep_cols = list(dummies.columns)

    if genes is None:
        genes = list(adata.var_names)
    else:
        genes = list(adata.var_names.intersection(genes))
    expr = adata[:, np.asarray(genes)].X if layer is None else adata[:, np.asarray(genes)].layers[layer]
    expr = expr.toarray() if issparse(expr) else np.asarray(expr, dtype=float)
    n = adata.n_obs

    for cat in keep_cols:
        adata.var[f"{cat}_GM_lag_coeff"] = np.nan
        adata.var[f"{cat}_GM_lag_zstat"] = np.nan
        adata.var[f"{cat}_GM_lag_pval"] = np.nan

    ones = np.ones((n, 1))
    Xbase = np.c_[ones, Xd]
    WX = W @ Xd
    WWX = W @ WX
    H = np.c_[ones, Xd, WX, WWX]  # instruments
    for j, gene in enumerate(genes):
        y = np.log1p(expr[:, j])
        Wy = W @ y
        Z = np.c_[Xbase, Wy]  # endogenous design
        # 2SLS: Z_hat = H (H'H)^-1 H'Z
        HtH_inv = np.linalg.pinv(H.T @ H)
        P_H = H @ HtH_inv @ H.T
        Z_hat = P_H @ Z
        beta = np.linalg.pinv(Z_hat.T @ Z) @ (Z_hat.T @ y)
        resid = y - Z @ beta
        sigma2 = (resid**2).sum() / max(n - Z.shape[1], 1)
        var_beta = sigma2 * np.linalg.pinv(Z_hat.T @ Z_hat)
        se = np.sqrt(np.maximum(np.diag(var_beta), 1e-30))
        zstat = beta / se
        pvals = 2 * stats.norm.sf(np.abs(zstat))
        for i, cat in enumerate(keep_cols):
            adata.var.loc[gene, f"{cat}_GM_lag_coeff"] = beta[1 + i]
            adata.var.loc[gene, f"{cat}_GM_lag_zstat"] = zstat[1 + i]
            adata.var.loc[gene, f"{cat}_GM_lag_pval"] = pvals[1 + i]
    if copy:
        return adata
