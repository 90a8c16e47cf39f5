"""MuSIC: spatially-weighted regression of cell-cell-interaction effects.

Capability parity with reference spateo/tools/CCI_effects_modeling/MuSIC.py:39
(`load_and_process`:470, `define_sig_inputs`:870, `run_subsample`:2086,
`local_fit`:2665, `find_optimal_bw`:2837, `mpi_fit`:2940, `fit`:3183,
`predict`:3570, AICc :3644-3675).

TPU-native redesign: the reference's vestigial-MPI per-cell loop
(`mpi_fit` iterating `self.x_chunk` serially) becomes the batched device
kernel `regression_utils.iwls_batch` — every cell's local GLM solved in one
fused [n, k, k] batched solve; the golden-section bandwidth search drives the
jitted evaluation. Multi-host scaling shards the query-cell axis over the
mesh ('data' axis) — the design SURVEY.md §2.12 prescribes.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd
import scipy.sparse
from scipy.sparse import issparse

from ...core.anndata import AnnData, read_h5ad
from ...logging import logger_manager as lm
from ..find_neighbors import get_wi_batch
from .regression_utils import compute_betas_local, iwls_batch, multitesting_correction, wald_test

_DB_DIR = os.path.join(os.path.dirname(__file__), "..", "database")


class MuSIC:
    """Spatially weighted regression on spatial omics data with parallel
    processing (parity surface: reference MuSIC.py:39)."""

    def __init__(self, parser=None, args_list: Optional[List[str]] = None, verbose: bool = True, **kwargs):
        self.logger = lm.get_main_logger()
        self.verbose = verbose
        if parser is not None:
            self.arg_retrieve = parser.parse_args(args_list)
            self.parse_stgwr_args()
        for k, v in kwargs.items():
            setattr(self, k, v)
        self._set_defaults()
        self._fitted = False

    # -- configuration ------------------------------------------------------
    def _set_defaults(self):
        defaults = dict(
            adata_path=None,
            csv_path=None,
            mod_type="niche",
            species="human",
            cci_dir=_DB_DIR,
            output_path="./music_results/results.csv",
            custom_ligands=None,
            custom_receptors=None,
            custom_pathways=None,
            custom_targets=None,
            targets_path=None,
            init_betas_path=None,
            normalize=False,
            smooth=False,
            log_transform=False,
            target_expr_threshold=0.05,
            coords_key="spatial",
            group_key="cell_type",
            distr="gaussian",
            kernel="bisquare",
            bw=None,
            minbw=None,
            maxbw=None,
            bw_fixed=False,
            n_neighbors=10,
            exclude_self=True,
            fit_intercept=True,
            tolerance=1e-3,
            max_iter=500,
            ridge_lambda=0.3,
            subsample=False,
            subsample_size=5000,
            seed=888,
        )
        for k, v in defaults.items():
            if not hasattr(self, k):
                setattr(self, k, v)

    def parse_stgwr_args(self):
        """Flags -> attributes (parity: MuSIC.py:327)."""
        a = self.arg_retrieve
        for key, val in vars(a).items():
            setattr(self, key, val)

    # -- data loading -------------------------------------------------------
    def load_and_process(self, upstream: bool = False):
        """Load AnnData and preprocess (parity: MuSIC.py:470)."""
        if getattr(self, "adata", None) is None:
            if self.adata_path is not None:
                self.adata = read_h5ad(self.adata_path)
            elif self.csv_path is not None:
                df = pd.read_csv(self.csv_path, index_col=0)
                coords = df.iloc[:, :2].values
                expr = df.iloc[:, 2:]
                self.adata = AnnData(X=expr.values, obs=pd.DataFrame(index=df.index), var=pd.DataFrame(index=expr.columns))
                self.adata.obsm[self.coords_key] = coords
            else:
                raise ValueError("Provide `adata_path`, `csv_path` or an `adata` object.")
        self.coords = np.asarray(self.adata.obsm[self.coords_key], dtype=float)[:, :2]
        self.n_samples = self.adata.n_obs
        self.x_chunk = np.arange(self.n_samples)
        if self.normalize:
            from ...preprocessing.normalize import normalize_total

            normalize_total(self.adata)
        if self.smooth:
            from ...svg.get_svg import smooth as smooth_fn

            self.adata = smooth_fn(self.adata)
        if self.log_transform:
            from ...preprocessing.transform import log1p

            log1p(self.adata)

    # -- design matrices ----------------------------------------------------
    def _load_db(self):
        sp = self.species
        if self.cci_dir is None:
            self.cci_dir = _DB_DIR  # parser default is None; fall back to the shipped databases
        self.lr_db = pd.read_csv(os.path.join(self.cci_dir, f"lr_db_{sp}.csv"), index_col=0)
        try:
            self.grn = pd.read_csv(os.path.join(self.cci_dir, f"{sp}_GRN.csv"), index_col=0)
        except FileNotFoundError:
            self.grn = None

    def define_sig_inputs(self, adata: Optional[AnnData] = None, recompute: bool = False):
        """Build the independent-variable design matrix (parity: MuSIC.py:870).

        - 'niche': spatially-lagged one-hot cell-type composition;
        - 'ligand': spatial lag of ligand expression;
        - 'receptor': receptor expression;
        - 'lr':   lagged-ligand x receptor product per L:R pair.
        """
        adata = adata if adata is not None else self.adata
        X = adata.X.toarray() if issparse(adata.X) else np.asarray(adata.X, dtype=float)
        expr_df = pd.DataFrame(X, index=adata.obs_names, columns=adata.var_names)

        # neighbor graph for spatial lag
        from sklearn.neighbors import NearestNeighbors

        nn = NearestNeighbors(n_neighbors=min(self.n_neighbors + 1, adata.n_obs)).fit(self.coords)
        conn = nn.kneighbors_graph(self.coords, mode="connectivity").tolil()
        conn.setdiag(0)
        conn = scipy.sparse.csr_matrix(conn)
        conn = conn.multiply(1.0 / np.maximum(conn.sum(axis=1), 1))

        if self.mod_type in ("lr", "ligand", "receptor"):
            self._load_db()

        if self.mod_type == "niche":
            groups = pd.get_dummies(pd.Series(np.asarray(adata.obs[self.group_key]).astype(str), index=adata.obs_names), dtype=float)
            self.cell_categories = groups
            niche = np.asarray(conn @ groups.values)
            X_df = pd.DataFrame(niche, index=adata.obs_names, columns=[f"Niche_{c}" for c in groups.columns])
        elif self.mod_type in ("ligand", "lr", "receptor"):
            db = self.lr_db
            if self.custom_pathways:
                db = db[db["pathway"].isin(self.custom_pathways)]
            ligands = sorted({l for entry in db["from"] for l in str(entry).split("_")})
            receptors = sorted({r for entry in db["to"] for r in str(entry).split("_")})
            if self.custom_ligands:
                ligands = [l for l in ligands if l in self.custom_ligands]
            if self.custom_receptors:
                receptors = [r for r in receptors if r in self.custom_receptors]
            ligands = [l for l in ligands if l in adata.var_names]
            receptors = [r for r in receptors if r in adata.var_names]
            lig_expr = expr_df[ligands] if ligands else pd.DataFrame(index=adata.obs_names)
            rec_expr = expr_df[receptors] if receptors else pd.DataFrame(index=adata.obs_names)
            self.ligands_expr_nonlag = lig_expr
            lig_lag = pd.DataFrame(np.asarray(conn @ lig_expr.values), index=adata.obs_names, columns=ligands) if ligands else lig_expr
            self.ligands_expr = lig_lag
            self.receptors_expr = rec_expr
            if self.mod_type == "ligand":
                X_df = lig_lag.add_prefix("")
            elif self.mod_type == "receptor":
                X_df = rec_expr
            else:  # lr: product of lagged ligand and receptor per db pair
                cols = {}
                for _, row in db.iterrows():
                    ls = [l for l in str(row["from"]).split("_") if l in lig_lag.columns]
                    rs = [r for r in str(row["to"]).split("_") if r in rec_expr.columns]
                    if not ls or not rs:
                        continue
                    lig_val = lig_lag[ls].mean(axis=1)
                    rec_val = rec_expr[rs].mean(axis=1)
                    cols[f"{row['from']}:{row['to']}"] = lig_val.values * rec_val.values
                X_df = pd.DataFrame(cols, index=adata.obs_names)
        else:
            raise ValueError(f"Invalid mod_type {self.mod_type}")

        # drop all-zero / low-variance columns
        keep = X_df.columns[(X_df != 0).sum(axis=0) > 0]
        X_df = X_df[keep]
        if self.fit_intercept:
            X_df.insert(0, "intercept", 1.0)
        self.X_df = X_df
        self.feature_names = list(X_df.columns)
        self.n_features = X_df.shape[1]

        # targets
        if self.targets_path is not None:
            with open(self.targets_path) as f:
                targets = [t for t in f.read().splitlines() if t in adata.var_names]
        elif self.custom_targets:
            targets = [t for t in self.custom_targets if t in adata.var_names]
        else:
            pos_rate = (X > 0).mean(axis=0)
            targets = list(np.asarray(adata.var_names)[pos_rate >= self.target_expr_threshold][:25])
        targets_expr = expr_df[targets].copy()
        for col in targets_expr.columns:
            cap = np.percentile(targets_expr[col], 99.7)
            targets_expr[col] = np.floor(np.where(targets_expr[col] > cap, cap, targets_expr[col]))
        self.targets_expr = targets_expr
        self.targets = targets
        return X_df

    def _set_up_model(self):
        self.load_and_process()
        self.define_sig_inputs()
        if self.subsample and self.n_samples > self.subsample_size:
            self.run_subsample()
        else:
            self.fitted_indices = np.arange(self.n_samples)

    def run_subsample(self, verbose: bool = True):
        """Spatially stratified subsample for very large N (parity:
        MuSIC.py:2086): k-means bins over coordinates, proportional draws."""
        from sklearn.cluster import MiniBatchKMeans

        rng = np.random.default_rng(self.seed)
        n_bins = max(self.subsample_size // 50, 10)
        km = MiniBatchKMeans(n_clusters=n_bins, random_state=self.seed, n_init=3).fit(self.coords)
        picks = []
        for b in range(n_bins):
            members = np.where(km.labels_ == b)[0]
            n_pick = max(int(round(len(members) / self.n_samples * self.subsample_size)), 1)
            picks.append(rng.choice(members, min(n_pick, len(members)), replace=False))
        self.fitted_indices = np.sort(np.concatenate(picks))
        self.logger.info(f"Subsampled {len(self.fitted_indices)} / {self.n_samples} cells.")

    # -- bandwidth ----------------------------------------------------------
    def _weights(self, bw: float) -> np.ndarray:
        return get_wi_batch(
            self.coords[self.fitted_indices],
            bw,
            fixed_bw=self.bw_fixed,
            exclude_self=self.exclude_self,
            kernel=self.kernel,
        ) if len(self.fitted_indices) == self.n_samples else self._weights_subset(bw)

    def _weights_subset(self, bw: float) -> np.ndarray:
        # queries = fitted subset, neighbors = all cells
        from .regression_utils import EPS
        from ..find_neighbors import _kernel_weights_batch
        import jax.numpy as jnp

        # stays a device array: iwls_batch slices it on device
        W = (
            _kernel_weights_batch(
                jnp.asarray(self.coords[self.fitted_indices], jnp.float32),
                jnp.asarray(self.coords, jnp.float32),
                jnp.asarray(float(bw), jnp.float32) if self.bw_fixed else jnp.asarray(int(bw)),
                function=self.kernel,
                fixed=self.bw_fixed,
                exclude_self=self.exclude_self,
            )
        )
        return W

    def _aicc_for_bw(self, y: np.ndarray, X: np.ndarray, bw: float) -> float:
        W = self._weights_subset(bw)
        betas, hats = iwls_batch(
            y, X, W, distr=self.distr, ridge_lambda=self.ridge_lambda, clip=5.0
        )
        y_sub = y[self.fitted_indices]
        X_sub = X[self.fitted_indices]
        linear = np.einsum("ik,ik->i", X_sub, betas)
        if self.distr == "gaussian":
            y_hat = linear
            rss = ((y_sub - y_hat) ** 2).sum()
            n = len(y_sub)
            trace_S = np.clip(hats.sum(), 1.0, n - 2)
            aicc = n * np.log(rss / n + 1e-12) + n * np.log(2 * np.pi) + n * (n + trace_S) / max(n - trace_S - 2, 1)
        else:
            mu = np.exp(np.clip(linear, -30, 30))
            # NB/Poisson deviance-based AICc
            with np.errstate(divide="ignore", invalid="ignore"):
                dev = 2 * np.sum(np.where(y_sub > 0, y_sub * np.log(np.maximum(y_sub, 1e-12) / np.maximum(mu, 1e-12)), 0.0) - (y_sub - mu))
            n = len(y_sub)
            trace_S = np.clip(hats.sum(), 1.0, n - 2)
            aicc = dev + 2 * trace_S + (2 * trace_S * (trace_S + 1)) / max(n - trace_S - 1, 1)
        return float(aicc)

    def find_optimal_bw(self, y: np.ndarray, X: np.ndarray, verbose: bool = True) -> float:
        """Golden-section search for the AICc-minimizing bandwidth (parity:
        MuSIC.py:2837)."""
        if self.bw_fixed:
            from scipy.spatial.distance import pdist

            d = pdist(self.coords[np.random.default_rng(0).choice(self.n_samples, min(2000, self.n_samples), replace=False)])
            lo = self.minbw or float(np.percentile(d, 1))
            hi = self.maxbw or float(np.percentile(d, 50))
        else:
            lo = float(self.minbw or 5)
            hi = float(self.maxbw or min(50, self.n_samples - 1))
        phi = (1 + 5**0.5) / 2
        a, b = lo, hi
        c = b - (b - a) / phi
        d_ = a + (b - a) / phi
        fc = self._aicc_for_bw(y, X, c if self.bw_fixed else int(round(c)))
        fd = self._aicc_for_bw(y, X, d_ if self.bw_fixed else int(round(d_)))
        for _ in range(20):
            if abs(b - a) < (1e-2 if self.bw_fixed else 1.0):
                break
            if fc < fd:
                b, d_, fd = d_, c, fc
                c = b - (b - a) / phi
                fc = self._aicc_for_bw(y, X, c if self.bw_fixed else int(round(c)))
            else:
                a, c, fc = c, d_, fd
                d_ = a + (b - a) / phi
                fd = self._aicc_for_bw(y, X, d_ if self.bw_fixed else int(round(d_)))
        best = (a + b) / 2
        best = best if self.bw_fixed else int(round(best))
        if verbose:
            self.logger.info(f"Optimal bandwidth: {best}")
        return best

    # -- fitting ------------------------------------------------------------
    def mpi_fit(self, y: np.ndarray, X: np.ndarray, bw: float, final: bool = True) -> np.ndarray:
        """Per-cell local fits (name kept for parity with reference
        MuSIC.py:2940). On a single device the fan-out is the batched device
        kernel; with a multi-device mesh the query-cell axis shards over the
        'data' axis (the reference's vestigial-MPI design made real)."""
        import jax

        W = self._weights_subset(bw)
        if len(jax.devices()) > 1:
            from .regression_utils import iwls_batch_sharded

            betas, hats = iwls_batch_sharded(y, X, W, distr=self.distr, ridge_lambda=self.ridge_lambda, clip=5.0)
        else:
            betas, hats = iwls_batch(y, X, W, distr=self.distr, ridge_lambda=self.ridge_lambda, clip=5.0)
        self._last_hats = hats
        return betas

    def fit(
        self,
        y: Optional[pd.DataFrame] = None,
        X: Optional[np.ndarray] = None,
        multiscale: bool = False,
        fit_predictor: bool = False,
        verbose: bool = True,
    ):
        """Fit every target gene (parity: MuSIC.py:3183). Saves per-target
        coefficient CSVs under the output path (checkpoint parity with
        reference `save_results` MuSIC.py:3709)."""
        if not hasattr(self, "X_df"):
            self._set_up_model()
        X_arr = np.asarray(self.X_df.values, dtype=np.float32) if X is None else np.asarray(X, dtype=np.float32)
        targets = self.targets_expr if y is None else y
        out_dir = os.path.splitext(self.output_path)[0]
        Path(out_dir).mkdir(parents=True, exist_ok=True)

        self.coeffs: Dict[str, pd.DataFrame] = {}
        self.bws: Dict[str, float] = {}
        self.aiccs: Dict[str, float] = {}
        for target in targets.columns:
            y_t = np.asarray(targets[target].values, dtype=np.float32)
            if self.bw is not None:
                bw = self.bw
            else:
                bw = self.find_optimal_bw(y_t, X_arr, verbose=verbose)
            betas = self.mpi_fit(y_t, X_arr, bw)
            coeffs = pd.DataFrame(
                betas, index=np.asarray(self.adata.obs_names)[self.fitted_indices],
                columns=[f"b_{c}" for c in self.feature_names],
            )
            self.coeffs[target] = coeffs
            self.bws[target] = bw
            self.aiccs[target] = self._aicc_for_bw(y_t, X_arr, bw)
            coeffs.to_csv(os.path.join(out_dir, f"{target}.csv"))
            if verbose:
                self.logger.info(f"Fitted target {target}: bw={bw}, AICc={self.aiccs[target]:.2f}")
        self._fitted = True
        return self

    def predict(
        self, input: Optional[np.ndarray] = None, coeffs: Optional[Dict[str, pd.DataFrame]] = None, adjust_for_subsampling: bool = False
    ) -> pd.DataFrame:
        """Predicted expression per target (parity: MuSIC.py:3570)."""
        X_arr = np.asarray(self.X_df.values, dtype=np.float32) if input is None else np.asarray(input, dtype=np.float32)
        coeffs = coeffs if coeffs is not None else self.coeffs
        preds = {}
        for target, cdf in coeffs.items():
            betas = np.asarray(cdf.values, dtype=np.float32)
            linear = np.einsum("ik,ik->i", X_arr[self.fitted_indices], betas)
            preds[target] = linear if self.distr == "gaussian" else np.exp(np.clip(linear, -30, 30))
        return pd.DataFrame(preds, index=np.asarray(self.adata.obs_names)[self.fitted_indices])

    # -- persistence --------------------------------------------------------
    def save_results(self):
        out_dir = os.path.splitext(self.output_path)[0]
        Path(out_dir).mkdir(parents=True, exist_ok=True)
        for target, coeffs in self.coeffs.items():
            coeffs.to_csv(os.path.join(out_dir, f"{target}.csv"))

    def return_outputs(self):
        """(coeffs dict, standard errors placeholder) — parity helper."""
        return self.coeffs, self.bws
