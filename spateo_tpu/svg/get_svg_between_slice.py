"""Cross-slice SVG detection via Gromov-Wasserstein distances
(capability parity: reference spateo/svg/get_svg_between_slice.py:25-129).

Per-gene GW distances between two slices run as entropic GW on device
(alpha=1 FGW from spateo_tpu.ops.ot)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np
import pandas as pd
from scipy.sparse import issparse
from scipy.stats import norm

from ..core.anndata import AnnData
from ..logging import logger_manager as lm
from ..ops.ot import fgw
from .get_svg import bin_scale_adata_get_distance
from .utils import multipletests_bh, shuffle_adata


def cal_gw_dis_on_genes(inp1, inp2) -> Tuple[List, np.ndarray]:
    """GW distance per gene between two slices (parity: between_slice.py:129)."""
    M0, adata0, seed0 = inp1
    M1, adata1, seed1 = inp2
    adata0 = shuffle_adata(adata0, seed0)
    adata1 = shuffle_adata(adata1, seed1)
    X0 = adata0.X.toarray() if issparse(adata0.X) else np.asarray(adata0.X)
    X1 = adata1.X.toarray() if issparse(adata1.X) else np.asarray(adata1.X)
    genes = [g for g in adata0.var_names if g in set(adata1.var_names)]
    ws = []
    dummy_M = np.zeros((M0.shape[0], M1.shape[0]), np.float32)
    for g in genes:
        a = X0[:, adata0.var_names.get_loc(g)].astype(np.float64)
        b = X1[:, adata1.var_names.get_loc(g)].astype(np.float64)
        if a.sum() == 0 or b.sum() == 0:
            ws.append(0.0)
            continue
        a = a / a.sum()
        b = b / b.sum()
        _, obj = fgw(dummy_M, M0, M1, a, b, alpha=1.0, eps=max(float(M0.max()) * 1e-2, 1e-4), max_iter=30)
        ws.append(float(obj))
    return genes, np.asarray(ws)


def cal_gro_wass_bs(
    adata0: AnnData,
    adata1: AnnData,
    bin_size: int = 1,
    bin_layer: str = "spatial",
    cell_distance_method: str = "geodesic",
    distance_layer: str = "spatial",
    n_neighbors: int = 30,
    gene_set=None,
    processes: int = 1,
    bootstrap: int = 100,
    min_dis_cutoff: float = 2.0,
    max_dis_cutoff: float = 6.0,
    larger_or_small: str = "larger",
) -> pd.DataFrame:
    """Per-gene cross-slice GW with bootstrap permutation p-values (parity:
    between_slice.py:25)."""
    b0, M0 = bin_scale_adata_get_distance(
        adata0, bin_size, bin_layer, distance_layer, cell_distance_method, min_dis_cutoff, max_dis_cutoff, n_neighbors
    )
    b1, M1 = bin_scale_adata_get_distance(
        adata1, bin_size, bin_layer, distance_layer, cell_distance_method, min_dis_cutoff, max_dis_cutoff, n_neighbors
    )
    if gene_set is not None:
        b0 = b0[:, np.asarray(gene_set)]
        b1 = b1[:, np.asarray(gene_set)]

    genes0, ws0 = cal_gw_dis_on_genes((M0, b0, 0), (M1, b1, 0))
    boot_genes, boot_ws = [], []
    for seed in range(1, bootstrap + 1):
        g, w = cal_gw_dis_on_genes((M0, b0, seed), (M1, b1, seed))
        boot_genes += list(g)
        boot_ws += list(w)
    w_df = pd.DataFrame({"GW_distance": ws0}, index=genes0)
    if bootstrap > 0:
        boot = pd.DataFrame({"gene": boot_genes, "w": boot_ws})
        stats = boot.groupby("gene")["w"].agg(["mean", "std"])
        w_df["mean"] = stats["mean"].reindex(w_df.index).values
        w_df["std"] = stats["std"].reindex(w_df.index).values
        with np.errstate(divide="ignore", invalid="ignore"):
            z = (w_df["GW_distance"] - w_df["mean"]) / w_df["std"]
        w_df["zscore"] = z
        w_df["pvalue"] = norm.sf(z) if larger_or_small == "larger" else norm.cdf(z)
        w_df["adj_pvalue"] = multipletests_bh(np.nan_to_num(w_df["pvalue"].values, nan=1.0))
    return w_df
