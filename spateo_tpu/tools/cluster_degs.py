"""Cluster marker genes (capability parity: reference
spateo/tools/cluster_degs.py:26,109,389,506).

Vectorized redesign: all per-gene statistics (expression ratios, log2 fold
changes, specificity scores, Mann-Whitney U with tie-corrected normal
p-values) are computed for EVERY gene at once with rank matrices — replacing
the reference's per-gene Python loop (cluster_degs.py:211-300).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
from scipy import stats
from scipy.sparse import issparse

from ..core.anndata import AnnData
from ..logging import logger_manager as lm
from ..svg.utils import multipletests_bh


def _dense(X):
    return X.toarray() if issparse(X) else np.asarray(X, dtype=float)


def _mannwhitney_batch(X_test: np.ndarray, X_control: np.ndarray) -> np.ndarray:
    """Two-sided Mann-Whitney U p-values for every column (normal approx with
    tie correction)."""
    n1, n2 = X_test.shape[0], X_control.shape[0]
    combined = np.concatenate([X_test, X_control], axis=0)
    ranks = stats.rankdata(combined, axis=0)
    R1 = ranks[:n1].sum(axis=0)
    U1 = R1 - n1 * (n1 + 1) / 2
    mu = n1 * n2 / 2
    n = n1 + n2
    # tie correction per gene
    tie_term = np.zeros(combined.shape[1])
    for j in range(combined.shape[1]):
        _, counts = np.unique(combined[:, j], return_counts=True)
        tie_term[j] = (counts**3 - counts).sum()
    sigma = np.sqrt(n1 * n2 / 12 * ((n + 1) - tie_term / (n * (n - 1))))
    with np.errstate(divide="ignore", invalid="ignore"):
        z = (U1 - mu) / np.maximum(sigma, 1e-12)
    p = 2 * stats.norm.sf(np.abs(z))
    p[sigma == 0] = 1.0
    return np.clip(p, 0, 1)


def _specificity_scores(all_vals: np.ndarray, mask: np.ndarray) -> tuple:
    """(pearson, cosine) similarity of each gene to an indicator pattern."""
    v = all_vals
    ind = mask.astype(float)[:, None]
    vc = v - v.mean(0, keepdims=True)
    ic = ind - ind.mean()
    denom = np.sqrt((vc**2).sum(0)) * np.sqrt((ic**2).sum())
    pearson = np.where(denom > 0, (vc * ic).sum(0) / np.maximum(denom, 1e-30), 0.0)
    denom_c = np.sqrt((v**2).sum(0)) * np.sqrt((ind**2).sum())
    cosine = np.where(denom_c > 0, (v * ind).sum(0) / np.maximum(denom_c, 1e-30), 0.0)
    return pearson, cosine


def find_cluster_degs(
    adata: AnnData,
    test_group: str,
    control_groups: List[str],
    genes: Optional[List[str]] = None,
    layer: Optional[str] = None,
    X_data: Optional[np.ndarray] = None,
    group: Optional[str] = None,
    qval_thresh: float = 0.05,
    ratio_expr_thresh: float = 0.1,
    diff_ratio_expr_thresh: float = 0,
    log2fc_thresh: float = 0,
    method: str = "multiple",
) -> pd.DataFrame:
    """Markers of `test_group` vs `control_groups` (parity:
    cluster_degs.py:109)."""
    if method not in ("multiple", "pairwise"):
        raise ValueError("`method` must be 'multiple' or 'pairwise'")
    if isinstance(control_groups, str):
        control_groups = [control_groups]
    groups = np.asarray(adata.obs[group])
    test_cells = groups == test_group
    control_cells = np.isin(groups, control_groups)
    genes = list(adata.var_names) if genes is None else list(genes)
    if X_data is None:
        X_data = adata[:, np.asarray(genes)].X if layer is None else adata[:, np.asarray(genes)].layers[layer]
    X = _dense(X_data)

    num_cells = X.shape[0]
    num_test = test_cells.sum()
    num_control = control_cells.sum()
    X_test = X[test_cells]
    X_ctrl = X[control_cells]

    ratio_expr = (X_test > 0).sum(0) / num_test
    perc_test = (X_test > 0).sum(0) / num_cells
    percs = [perc_test] + [(X[groups == g] > 0).sum(0) / num_cells for g in control_groups]
    perc_mat = np.stack(percs)  # [G+1, genes]
    perc_spec = np.zeros(len(control_groups) + 1)
    perc_spec[0] = 1.0

    # JSD to the perfect-specificity distribution, per gene
    with np.errstate(divide="ignore", invalid="ignore"):
        P = perc_mat / np.maximum(perc_mat.sum(0, keepdims=True), 1e-30)
        Q = perc_spec[:, None]
        M = (P + Q) / 2
        kl_pm = np.nansum(np.where(P > 0, P * np.log(P / np.maximum(M, 1e-30)), 0.0), axis=0)
        kl_qm = np.nansum(np.where(Q > 0, Q * np.log(Q / np.maximum(M, 1e-30)), 0.0), axis=0)
    jsd_adj_score = 1 - 0.5 * (kl_pm + kl_qm)

    pearson_test, cosine_test = _specificity_scores(X, test_cells)

    if method == "multiple":
        test_mean = X_test.mean(0) + 1e-9
        control_mean = X_ctrl.mean(0) + 1e-9
        log2fc = np.log2(test_mean / control_mean + 1e-4)
        pvals = _mannwhitney_batch(X_test, X_ctrl)
        diff_ratio_expr = ratio_expr - (X_ctrl > 0).sum(0) / num_control
        pearson_control, _ = _specificity_scores(X, control_cells)
        pearson_score = pearson_test**3 / np.maximum(pearson_control**2 + pearson_test**2, 1e-30)
        df = pd.DataFrame(
            {
                "gene": genes,
                "log2fc": log2fc,
                "pval": pvals,
                "ratio_expr": ratio_expr,
                "diff_ratio_expr": diff_ratio_expr,
                "person_score": pearson_score,
                "cosine_score": cosine_test,
                "jsd_adj_score": jsd_adj_score,
            }
        )
        df["qval"] = multipletests_bh(df["pval"].values)
    else:
        records = []
        for g in control_groups:
            Xg = X[groups == g]
            mean_g = Xg.mean(0) + 1e-9
            log2fc = np.log2((X_test.mean(0) + 1e-9) / mean_g + 1e-4)
            pvals = _mannwhitney_batch(X_test, Xg)
            records.append(pd.DataFrame({
                "gene": genes, "control_group": g, "log2fc": log2fc, "pval": pvals,
                "ratio_expr": ratio_expr, "jsd_adj_score": jsd_adj_score,
            }))
        df = pd.concat(records, ignore_index=True)
        df["qval"] = multipletests_bh(df["pval"].values)

    df = df[
        (df["qval"] < qval_thresh)
        & (df["ratio_expr"] > ratio_expr_thresh)
        & (df["log2fc"] > log2fc_thresh)
    ]
    if method == "multiple" and diff_ratio_expr_thresh is not None:
        df = df[df["diff_ratio_expr"] > diff_ratio_expr_thresh]
    df = df.set_index("gene")
    df["test_group"] = test_group
    return df


def find_all_cluster_degs(
    adata: AnnData,
    group: str,
    genes: Optional[List[str]] = None,
    layer: Optional[str] = None,
    X_data: Optional[np.ndarray] = None,
    copy: bool = True,
    n_jobs: int = 1,
    **kwargs,
) -> AnnData:
    """Markers for every cluster vs the rest (parity: cluster_degs.py:389)."""
    adata = adata.copy() if copy else adata
    cluster_set = np.unique(np.asarray(adata.obs[group]))
    if len(cluster_set) < 2:
        raise ValueError(f"the number of groups for the argument {group} must be at least two.")
    de_tables = {}
    de_genes = {}
    for test_group in cluster_set:
        controls = [g for g in cluster_set if g != test_group]
        table = find_cluster_degs(
            adata, test_group, controls, genes=genes, layer=layer, X_data=X_data, group=group, **kwargs
        )
        de_tables[test_group] = table
        de_genes[test_group] = list(table.index)
    adata.uns["cluster_markers"] = {"deg_tables": de_tables, "de_genes": de_genes}
    return adata


def find_spatial_cluster_degs(
    adata: AnnData,
    test_group: str,
    x: Optional[List[int]] = None,
    y: Optional[List[int]] = None,
    group: Optional[str] = None,
    genes: Optional[List[str]] = None,
    k: int = 10,
    ratio_thresh: float = 0.5,
) -> pd.DataFrame:
    """Markers of a spatially-defined group vs its spatially-adjacent
    neighborhood (parity: cluster_degs.py:26): control = clusters whose cells
    are frequently within the test group's spatial KNN."""
    coords = np.asarray(adata.obsm["spatial"], dtype=float)
    if x is not None:
        coords = np.c_[np.asarray(x), np.asarray(y)]
    groups = np.asarray(adata.obs[group])
    test_cells = groups == test_group
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=min(k + 1, adata.n_obs)).fit(coords)
    _, idx = nn.kneighbors(coords[test_cells])
    neigh_groups = groups[idx[:, 1:].ravel()]
    uniq, counts = np.unique(neigh_groups, return_counts=True)
    frac = counts / counts.sum()
    control_groups = [g for g, f in zip(uniq, frac) if g != test_group and f > (1 - ratio_thresh) / max(len(uniq), 1)]
    if not control_groups:
        control_groups = [g for g in uniq if g != test_group]
    return find_cluster_degs(adata, test_group, control_groups, group=group, genes=genes)


def top_n_degs(
    adata: AnnData,
    group: str,
    custom_score_func: Optional[callable] = None,
    sort_by: str = "log2fc",
    top_n_genes: int = 10,
    only_deg_list: bool = True,
):
    """Top-n markers per cluster from `find_all_cluster_degs` output
    (parity: cluster_degs.py:506)."""
    if "cluster_markers" not in adata.uns:
        raise ValueError("Run `find_all_cluster_degs` with `copy=False` first.")
    tables = adata.uns["cluster_markers"]["deg_tables"]
    out = {}
    frames = []
    for g, table in tables.items():
        t = table.copy()
        if custom_score_func is not None:
            t["custom_score"] = custom_score_func(t)
            key = "custom_score"
        else:
            key = sort_by
        t = t.sort_values(by=key, ascending=False).head(top_n_genes)
        out[g] = list(t.index)
        frames.append(t.assign(cluster=g))
    if only_deg_list:
        return out
    return pd.concat(frames)
