"""Bivariate spatial correlation (capability parity: reference
spateo/tools/spatial_correlation.py:12,162) — vectorized bivariate Moran."""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
from scipy.sparse import issparse

from ..core.anndata import AnnData
from ..svg.utils import multipletests_bh
from .spatial_degs import _spatial_weights


def spatial_bv_moran_obs_genes(
    adata: AnnData,
    obs_key: str,
    genes: Optional[List[str]] = None,
    layer: Optional[str] = None,
    spatial_key: str = "spatial",
    k: int = 5,
    permutations: int = 199,
    seed: int = 0,
) -> pd.DataFrame:
    """Bivariate Moran's I between an obs variable and every gene
    (parity: spatial_correlation.py:12)."""
    coords = np.asarray(adata.obsm[spatial_key], dtype=float)
    W = _spatial_weights(coords, k)
    yv = np.asarray(adata.obs[obs_key], dtype=float)
    zy = (yv - yv.mean()) / max(yv.std(), 1e-30)
    sub = adata if genes is None else adata[:, np.asarray(genes)]
    X = sub.X if layer is None else sub.layers[layer]
    X = X.toarray() if issparse(X) else np.asarray(X, dtype=float)
    Z = (X - X.mean(0)) / np.maximum(X.std(0), 1e-30)
    n = len(zy)
    S0 = W.sum()
    Wz = W @ Z
    I_obs = (n / S0) * (zy @ Wz) / n

    rng = np.random.default_rng(seed)
    I_perm = np.zeros((permutations, Z.shape[1]))
    for p in range(permutations):
        perm = rng.permutation(n)
        I_perm[p] = (n / S0) * (zy @ (W @ Z[perm])) / n
    p_sim = ((I_perm >= I_obs[None, :]).sum(0) + 1) / (permutations + 1)
    out = pd.DataFrame({"bv_moran_i": I_obs, "p_val": p_sim}, index=sub.var_names)
    out["q_val"] = multipletests_bh(out["p_val"].values)
    return out


def spatial_bv_local_moran(
    adata: AnnData,
    obs_key: str,
    gene: str,
    layer: Optional[str] = None,
    spatial_key: str = "spatial",
    k: int = 5,
) -> np.ndarray:
    """Local bivariate Moran of one obs variable vs one gene (parity:
    spatial_correlation.py:162); stored in `.obs['bv_local_moran']`."""
    coords = np.asarray(adata.obsm[spatial_key], dtype=float)
    W = _spatial_weights(coords, k)
    yv = np.asarray(adata.obs[obs_key], dtype=float)
    zy = (yv - yv.mean()) / max(yv.std(), 1e-30)
    col = adata[:, gene].X if layer is None else adata[:, gene].layers[layer]
    gv = np.asarray(col.toarray() if issparse(col) else col, dtype=float).ravel()
    zg = (gv - gv.mean()) / max(gv.std(), 1e-30)
    Is = zy * (W @ zg)
    adata.obs["bv_local_moran"] = Is
    return Is
