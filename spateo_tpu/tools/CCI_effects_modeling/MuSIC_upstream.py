"""Target/ligand/receptor selection for MuSIC models
(capability parity: reference spateo/tools/CCI_effects_modeling/MuSIC_upstream.py:21)."""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pandas as pd
from scipy.sparse import issparse

from ...logging import logger_manager as lm
from .MuSIC import MuSIC


class MuSIC_Molecule_Selector(MuSIC):
    """Select targets, ligands and receptors worth modeling, by expression
    prevalence and L:R-database pairing (parity surface: MuSIC_upstream.py:21)."""

    def find_targets(
        self,
        save_id: str = "",
        bw_membrane_bound: float = 8,
        bw_secreted: float = 25,
        kernel: str = "bisquare",
        **kwargs,
    ):
        """Rank genes as candidate targets: expressed above threshold, present
        in the GRN (when available), and spatially variable by Moran's I."""
        self.load_and_process()
        self._load_db()
        X = self.adata.X.toarray() if issparse(self.adata.X) else np.asarray(self.adata.X, dtype=float)
        pos_rate = (X > 0).mean(axis=0)
        eligible = pos_rate >= self.target_expr_threshold
        genes = np.asarray(self.adata.var_names)

        lig_all = {l for entry in self.lr_db["from"] for l in str(entry).split("_")}
        rec_all = {r for entry in self.lr_db["to"] for r in str(entry).split("_")}
        ligands = [g for g in genes[eligible] if g in lig_all]
        receptors = [g for g in genes[eligible] if g in rec_all]

        from ..spatial_degs import moran_i

        sub = self.adata[:, np.asarray(genes[eligible])]
        sub.uns["__type"] = "UMI"
        res = moran_i(sub, permutations=49)
        targets = list(res[res["moran_q_val"] < 0.05].sort_values("moran_i", ascending=False).index)
        if self.grn is not None:
            targets = [t for t in targets if t in self.grn.index]

        self.targets = targets
        self.ligands = ligands
        self.receptors = receptors
        out = pd.DataFrame(
            {
                "gene": list(targets) + list(ligands) + list(receptors),
                "role": ["target"] * len(targets) + ["ligand"] * len(ligands) + ["receptor"] * len(receptors),
            }
        )
        self.selection = out
        lm.main_info(
            f"Selected {len(targets)} targets, {len(ligands)} ligands, {len(receptors)} receptors."
        )
        return out
