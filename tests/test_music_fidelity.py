"""MuSIC signaling-model fidelity tests.

Golden-parity against the reference implementation (conditioned spatial
weights, local WLS fits, membrane-bound vs secreted ligand lagging) plus
behavioral tests for the spatially-stratified subsample and the spatial
effect potential.
"""

import os
import tempfile

import numpy as np
import pandas as pd
import pytest

from _reference_harness import reference_module

import spateo_tpu as st


def _need(name):
    mod = reference_module(name)
    if mod is None:
        pytest.skip(f"reference module {name} unavailable in this image")
    return mod


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(7)
    n = 120
    coords = rng.uniform(0, 50, (n, 2))
    ct = rng.integers(1, 4, n)  # three cell types coded 1..3
    y = rng.poisson(1.0, n).astype(float)
    y[rng.random(n) < 0.4] = 0.0
    return coords, ct, y


class TestConditionedWeightsGolden:
    """Batched conditioned kernel weights vs the reference per-sample Kernel
    (reference find_neighbors.py:392 via get_wi, the hurdle-model weight
    construction of MuSIC local_fit, reference MuSIC.py:2724-2755)."""

    @pytest.mark.parametrize("fixed", [True, False])
    def test_matches_reference_get_wi(self, toy, fixed):
        ref_fn = _need("spateo.tools.find_neighbors")
        import jax.numpy as jnp

        from spateo_tpu.tools.find_neighbors import _conditioned_kernel_weights_batch

        coords, ct, y = toy
        n = len(y)
        bw = 6.0 if fixed else 10
        cov = np.where(y == 0, 1, 0)
        # non-niche semantics: queries with y == 0 are cell-type conditioned
        cond_ct = y == 0
        W = np.asarray(
            _conditioned_kernel_weights_batch(
                jnp.asarray(coords, jnp.float32),
                jnp.asarray(coords, jnp.float32),
                jnp.asarray(float(bw), jnp.float32) if fixed else jnp.asarray(int(bw)),
                jnp.asarray(ct.astype(np.int32)),
                jnp.asarray(ct.astype(np.int32)),
                jnp.asarray(cond_ct),
                function="bisquare",
                fixed=fixed,
                exclude_self=True,
            )
        )
        # a handful of zero- and nonzero-target queries
        q_zero = np.flatnonzero(y == 0)[:3]
        q_nonzero = np.flatnonzero(y != 0)[:3]
        for i in list(q_zero) + list(q_nonzero):
            if y[i] == 0:
                wi_ref = ref_fn.get_wi(
                    int(i), n_samples=n, coords=coords, cov=cov, ct=ct,
                    fixed_bw=fixed, exclude_self=True, kernel="bisquare", bw=bw,
                ).reshape(-1)
            else:
                wi_ref = ref_fn.get_wi(
                    int(i), n_samples=n, coords=coords,
                    fixed_bw=fixed, exclude_self=True, kernel="bisquare", bw=bw,
                ).reshape(-1)
            wi_ref = np.asarray(wi_ref.todense()).ravel() if hasattr(wi_ref, "todense") else np.asarray(wi_ref).ravel()
            np.testing.assert_allclose(W[i], wi_ref, atol=2e-4, err_msg=f"query {i} (y={y[i]})")

    def test_niche_always_ct_conditioned(self, toy):
        ref_fn = _need("spateo.tools.find_neighbors")
        import jax.numpy as jnp

        from spateo_tpu.tools.find_neighbors import _conditioned_kernel_weights_batch

        coords, ct, y = toy
        n = len(y)
        W = np.asarray(
            _conditioned_kernel_weights_batch(
                jnp.asarray(coords, jnp.float32),
                jnp.asarray(coords, jnp.float32),
                jnp.asarray(8),
                jnp.asarray(ct.astype(np.int32)),
                jnp.asarray(ct.astype(np.int32)),
                jnp.asarray(np.ones(n, bool)),
                function="bisquare",
                fixed=False,
                exclude_self=True,
            )
        )
        for i in [0, 5, 17]:
            wi_ref = ref_fn.get_wi(
                int(i), n_samples=n, coords=coords, ct=ct,
                fixed_bw=False, exclude_self=True, kernel="bisquare", bw=8,
            )
            wi_ref = np.asarray(wi_ref.todense()).ravel() if hasattr(wi_ref, "todense") else np.asarray(wi_ref).ravel()
            np.testing.assert_allclose(W[i], wi_ref, atol=2e-4)


class TestLocalFitGolden:
    """Batched Gaussian local fits vs reference compute_betas_local
    (reference regression_utils.py:180): betas, focal leverage and the
    inverse-covariance diagonal agree row by row."""

    def test_gaussian_matches_compute_betas_local(self, toy):
        ref_ru = _need("spateo.tools.CCI_effects_modeling.regression_utils")
        from spateo_tpu.tools.CCI_effects_modeling.regression_utils import iwls_batch_full
        from spateo_tpu.tools.find_neighbors import get_wi_batch

        coords, ct, y = toy
        rng = np.random.default_rng(1)
        n = len(y)
        X = np.c_[np.ones(n), rng.normal(size=(n, 3))]
        yr = X @ np.array([0.5, 1.0, -1.0, 0.3]) + rng.normal(0, 0.1, n)
        W = get_wi_batch(coords, 8.0, fixed_bw=True, exclude_self=False, kernel="gaussian")
        betas, hats, inv_diag, preds = iwls_batch_full(yr, X, W, distr="gaussian", ridge_lambda=0.3, clip=50.0)
        for i in [0, 10, 55]:
            b_ref, pinv_ref, invcov_ref = ref_ru.compute_betas_local(
                yr, X, W[i].reshape(-1, 1), ridge_lambda=0.3, clip=50.0
            )
            np.testing.assert_allclose(betas[i], np.asarray(b_ref).ravel(), rtol=2e-3, atol=2e-4)
            hat_ref = X[i] @ pinv_ref[:, i]
            np.testing.assert_allclose(hats[i], hat_ref, rtol=5e-3, atol=1e-5)
            np.testing.assert_allclose(inv_diag[i], np.diag(invcov_ref), rtol=5e-3, atol=1e-6)

    def test_poisson_recovers_truth(self, toy):
        """GLM IWLS: the reference evaluates the IRLS weights at the linear
        predictor (an mgwr idiosyncrasy, reference iwls
        regression_utils.py:363 passing `linear_predictor` into
        `weights()`); ours uses the textbook Fisher weights w = mu. Both
        must recover the generating coefficients on clean data."""
        from spateo_tpu.tools.CCI_effects_modeling.regression_utils import iwls_batch_full

        rng = np.random.default_rng(3)
        n = 400
        X = np.c_[np.ones(n), rng.normal(0, 0.5, (n, 2))]
        beta_true = np.array([1.0, 0.8, -0.5])
        mu = np.exp(X @ beta_true)
        y = rng.poisson(mu).astype(float)
        W = np.ones((4, n), np.float32)
        betas, *_ = iwls_batch_full(y, X, W, distr="poisson", ridge_lambda=0.0, clip=10.0)
        np.testing.assert_allclose(betas[0], beta_true, atol=0.15)


@pytest.fixture(scope="module")
def lr_adata():
    """Synthetic dataset with one secreted (TGFB1) and one membrane-bound
    (DLL1, Notch pathway 'Cell-Cell Contact') ligand."""
    rng = np.random.default_rng(11)
    n = 250
    pts = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    genes = ["TGFB1", "TGFBR1", "TGFBR2", "DLL1", "NOTCH1", "TGT1"]
    X = rng.poisson(0.2, (n, len(genes))).astype(np.float32)
    senders = pts[:, 0] < 50
    X[senders, 0] += rng.poisson(5.0, senders.sum())
    X[senders, 3] += rng.poisson(4.0, senders.sum())
    X[~senders, 1] += rng.poisson(3.0, (~senders).sum())
    X[~senders, 2] += rng.poisson(3.0, (~senders).sum())
    X[~senders, 4] += rng.poisson(3.0, (~senders).sum())
    near = ~senders & (pts[:, 0] < 65)
    X[near, 5] += rng.poisson(6.0, near.sum())
    adata = st.AnnData(
        X=X,
        obs=pd.DataFrame({"cell_type": np.where(senders, "sender", "receiver")}, index=[f"c{i}" for i in range(n)]),
        var=pd.DataFrame(index=genes),
    )
    adata.obsm["spatial"] = pts
    st.SKM.init_adata_type(adata, "UMI")
    return adata


class TestSignalingModel:
    def test_membrane_vs_secreted_weights_differ(self, lr_adata):
        """The ligand lag must use the secreted weights (exclude_self=False,
        n_neighbors_secreted) for secreted ligands and membrane-bound weights
        (exclude_self=True, n_neighbors_membrane_bound) otherwise
        (reference MuSIC.py:1490-1571)."""
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC, define_spateo_argparse

        with tempfile.TemporaryDirectory() as tmp:
            parser, args_list = define_spateo_argparse(
                mod_type="ligand", species="human", output_path=f"{tmp}/out.csv",
                custom_ligands=["TGFB1", "DLL1"], custom_targets=["TGT1"],
                n_neighbors_membrane_bound=4, n_neighbors_secreted=20,
                bw_fixed=True, bw=8.0, fit_intercept=True,
            )
            model = MuSIC(parser, args_list)
            model.adata = lr_adata.copy()
            model.load_and_process()
            model.define_sig_inputs()
            W_mb = model.spatial_weights_membrane_bound
            W_sec = model.spatial_weights_secreted
            # secreted weights keep self (diagonal nonzero), membrane-bound exclude it
            assert W_sec.diagonal().sum() > 0
            assert W_mb.diagonal().sum() == 0
            # secreted bandwidth is wider: more neighbors per row
            assert (W_sec > 0).sum() > (W_mb > 0).sum()
            # TGFB1 is Secreted Signaling; DLL1 (Notch) is not
            lig_raw = model.ligands_expr_nonlag
            lag_tgfb = np.asarray(W_sec @ lig_raw["TGFB1"].values).ravel()
            lag_dll = np.asarray(W_mb @ lig_raw["DLL1"].values).ravel()
            np.testing.assert_allclose(model.ligands_expr["TGFB1"].values, lag_tgfb, rtol=1e-5)
            np.testing.assert_allclose(model.ligands_expr["DLL1"].values, lag_dll, rtol=1e-5)

    def test_secreted_weights_match_reference_rows(self, lr_adata):
        """The all-pairs weight matrix rows equal reference get_wi rows with
        the same bandwidth settings (reference MuSIC.py:2606)."""
        ref_fn = _need("spateo.tools.find_neighbors")
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC

        with tempfile.TemporaryDirectory() as tmp:
            model = MuSIC(
                adata=lr_adata.copy(), mod_type="ligand", output_path=f"{tmp}/o.csv", kernel="bisquare",
                bw_fixed=False, normalize=False,
            )
            model.load_and_process()
            W = model._compute_all_wi(bw=10, bw_fixed=False, exclude_self=False).toarray()
            coords = model.coords
            for i in [0, 33, 77]:
                wi_ref = ref_fn.get_wi(
                    int(i), n_samples=len(coords), coords=coords,
                    fixed_bw=False, exclude_self=False, kernel="bisquare", bw=10, threshold=0.01,
                )
                wi_ref = np.asarray(wi_ref.todense()).ravel() if hasattr(wi_ref, "todense") else np.asarray(wi_ref).ravel()
                np.testing.assert_allclose(W[i], wi_ref, atol=2e-4)

    def test_lr_model_end_to_end(self, lr_adata):
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC, define_spateo_argparse

        with tempfile.TemporaryDirectory() as tmp:
            parser, args_list = define_spateo_argparse(
                mod_type="lr", species="human", output_path=f"{tmp}/out.csv",
                custom_ligands=["TGFB1"], custom_receptors=["TGFBR1", "TGFBR2"],
                custom_targets=["TGT1"], bw_fixed=True, bw=10.0, fit_intercept=True,
            )
            model = MuSIC(parser, args_list)
            model.adata = lr_adata.copy()
            model.fit()
            assert "TGT1" in model.coeffs
            # reference-format results CSV exists
            assert os.path.exists(f"{tmp}/out_TGT1.csv")
            saved = pd.read_csv(f"{tmp}/out_TGT1.csv")
            assert "index" in saved.columns and "influence" in saved.columns
            assert any(c.startswith("b_") for c in saved.columns)
            assert any(c.startswith("se_") for c in saved.columns)
            # design matrix checkpoint exists
            assert os.path.exists(f"{tmp}/out/design_matrix/design_matrix.csv")
            # in the receiver region near senders the predicted effect is strongest
            coeffs, ses = model.return_outputs(adjust_for_subsampling=False)
            assert "TGT1" in coeffs and "TGT1" in ses

    def test_bandwidth_search_runs(self, lr_adata):
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC, define_spateo_argparse

        with tempfile.TemporaryDirectory() as tmp:
            parser, args_list = define_spateo_argparse(
                mod_type="lr", species="human", output_path=f"{tmp}/out.csv",
                custom_ligands=["TGFB1"], custom_receptors=["TGFBR1", "TGFBR2"],
                custom_targets=["TGT1"], fit_intercept=True,
                n_neighbors_membrane_bound=4, n_neighbors_secreted=12,
            )
            model = MuSIC(parser, args_list)
            model.adata = lr_adata.copy()
            model.fit(verbose=False)
            assert "TGT1" in model.bws
            assert 4 <= model.bws["TGT1"] <= 24


class TestSubsample:
    def test_spatial_subsample_mapping(self, lr_adata):
        """Spatially-stratified subsampling (reference MuSIC.py:2245-2397):
        per-target indices, and every unsampled cell maps to a sampled cell
        with matching zero/nonzero expression."""
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC, define_spateo_argparse

        with tempfile.TemporaryDirectory() as tmp:
            parser, args_list = define_spateo_argparse(
                mod_type="lr", species="human", output_path=f"{tmp}/out.csv",
                custom_ligands=["TGFB1"], custom_receptors=["TGFBR1", "TGFBR2"],
                custom_targets=["TGT1"], bw_fixed=True, bw=10.0, spatial_subsample=True,
            )
            model = MuSIC(parser, args_list)
            model.adata = lr_adata.copy()
            model._set_up_model(verbose=False)
            assert model.subsampled
            assert "TGT1" in model.subsampled_indices
            idx = model.subsampled_indices["TGT1"]
            assert 0 < len(idx) < model.n_samples
            # mapping covers exactly the unsampled cells
            mapping = model.neighboring_unsampled["TGT1"]
            unsampled = {c for lst in mapping.values() for c in lst}
            sampled = set(model.subsampled_sample_names["TGT1"])
            assert unsampled.isdisjoint(sampled)
            assert len(unsampled) + len(sampled) == model.n_samples
            # expression-pattern matching: mapped cells share zero/nonzero y
            y = pd.Series(model.targets_expr["TGT1"].values, index=model.sample_names.astype(str))
            for s_name, lst in mapping.items():
                for u in lst[:5]:
                    assert (y[u] != 0) == (y[s_name] != 0)
            # checkpoints saved
            assert os.path.exists(f"{tmp}/subsampling/out.json")
            # fit uses the per-target chunk
            model.fit(verbose=False)
            assert model.coeffs["TGT1"].shape[0] == len(idx)
            # return_outputs extends to all cells through the mapping
            coeffs, _ = model.return_outputs(adjust_for_subsampling=True)
            assert coeffs["TGT1"].shape[0] == model.n_samples

    def test_total_counts_filter(self, lr_adata):
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC, define_spateo_argparse

        adata = lr_adata.copy()
        adata.obs["total_counts"] = np.asarray(adata.X.sum(axis=1)).ravel()
        med = float(np.median(adata.obs["total_counts"]))
        with tempfile.TemporaryDirectory() as tmp:
            parser, args_list = define_spateo_argparse(
                mod_type="lr", species="human", output_path=f"{tmp}/out.csv",
                custom_ligands=["TGFB1"], custom_receptors=["TGFBR1", "TGFBR2"],
                custom_targets=["TGT1"], bw_fixed=True, bw=10.0,
                total_counts_threshold=med, total_counts_key="total_counts",
            )
            model = MuSIC(parser, args_list)
            model.adata = adata
            model._set_up_model(verbose=False)
            assert model.subsampled
            idx = model.subsampled_indices["TGT1"]
            tc = np.asarray(adata.obs["total_counts"], float)
            assert np.all(tc[np.asarray(idx)] >= med)


class TestCCIDegGLM:
    def test_glm_deg_detection_finds_driving_tf(self):
        """GLM-based CCI DEG detection (reference MuSIC_downstream.py:6838):
        a TF that drives the ligand's expression gets a large significant
        coefficient; an unrelated TF does not."""
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC_Interpreter, define_spateo_argparse

        rng = np.random.default_rng(5)
        n = 400
        pts = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        # STAT3 / JUN are real TFs present in the human receptor-TF database
        tf_on = rng.poisson(3.0, n).astype(float)
        tf_off = rng.poisson(3.0, n).astype(float)
        lig = rng.poisson(np.exp(0.45 * np.log1p(tf_on)), n).astype(float)  # driven by STAT3
        genes = ["TGFB1", "STAT3", "JUN"]
        X = np.c_[lig, tf_on, tf_off].astype(np.float32)
        adata = st.AnnData(X=X, obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
                           var=pd.DataFrame(index=genes))
        adata.obsm["spatial"] = pts
        st.SKM.init_adata_type(adata, "UMI")
        with tempfile.TemporaryDirectory() as tmp:
            parser, args_list = define_spateo_argparse(
                mod_type="ligand", species="human", output_path=f"{tmp}/out.csv",
                custom_ligands=["TGFB1"], custom_targets=["TGFB1"],
            )
            interp = MuSIC_Interpreter(parser, args_list)
            interp.adata = adata
            interp.load_and_process()
            design, targets = interp.CCI_deg_detection_setup(use_ligands=True, custom_tfs=["STAT3", "JUN"])
            assert "STAT3" in design.columns and "JUN" in design.columns
            res = interp.CCI_deg_detection("TGFB1", distr="poisson")
            assert res.loc["STAT3", "coefficient"] > 0.1
            assert abs(res.loc["STAT3", "coefficient"]) > 3 * abs(res.loc["JUN", "coefficient"])
            assert bool(res.loc["STAT3", "significant"])

            # --- fitted downstream-model state (reference attribute names,
            # MuSIC_downstream.py:5110-5143 / 7398) -----------------------
            assert "TGFB1" in interp.downstream_model_ligand_coeffs
            cdf = interp.downstream_model_ligand_coeffs["TGFB1"]
            assert list(cdf.index) == list(interp.adata.obs_names)
            assert {"b_STAT3", "b_JUN"} <= set(cdf.columns)
            dm = interp.downstream_model_ligand_design_matrix
            assert {"regulator_STAT3", "regulator_JUN"} <= set(dm.columns)
            # predictions persisted at the reference's path contract
            import os

            pred_path = os.path.join(tmp, "cci_deg_detection", "ligand_analysis", "downstream", "predictions.csv")
            assert os.path.exists(pred_path)

            # summarize_tf_effects: average over true-positive cells —
            # the driving TF carries the mass
            eff = interp.summarize_tf_effects(target_type="ligand")
            assert eff.loc["STAT3", "TGFB1"] > eff.loc["JUN", "TGFB1"]
            with pytest.raises(ValueError, match="Unrecognized input for target_type"):
                interp.summarize_tf_effects(target_type="nope")

            # enriched_tfs_barplot: average + proportion modes and figure
            ser = interp.enriched_tfs_barplot(target_type="ligand")
            assert ser.index[0] == "STAT3"
            prop = interp.enriched_tfs_barplot(target_type="ligand", plot_type="proportion")
            assert 0.0 <= prop.max() <= 1.0
            with pytest.raises(ValueError, match="average' or 'proportion"):
                interp.enriched_tfs_barplot(target_type="ligand", plot_type="nope")
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax, ser2 = interp.enriched_tfs_barplot(target_type="ligand", save_show_or_return="axes")
            assert len(ax.patches) == len(ser2)
            plt.close(fig)

            # deg_effect_barplot: target found in the DOWNSTREAM ligand
            # model (not the upstream coeffs); proportion over expressing
            # cells; sequential-cmap guard
            props = interp.deg_effect_barplot("TGFB1")
            assert {"STAT3", "JUN"} <= set(props.index)
            assert props.max() <= 1.0 and list(props) == sorted(props, reverse=True)
            with pytest.raises(ValueError, match="sequential"):
                interp.deg_effect_barplot("TGFB1", cmap="coolwarm")
            fig, ax, p2 = interp.deg_effect_barplot("TGFB1", save_show_or_return="axes")
            assert len(ax.patches) == len(p2)
            plt.close(fig)
            with pytest.raises(ValueError, match="not found"):
                interp.deg_effect_barplot("NOSUCH")

            # deg_effect_heatmap over the downstream ligand model
            M = interp.deg_effect_heatmap(target_type="ligand")
            assert "TGFB1" in M.columns and {"STAT3", "JUN"} <= set(M.index)


class TestMoleculeSelector:
    def test_find_targets(self, lr_adata):
        """Upstream selector (reference MuSIC_upstream.py:95): receptors
        from the database, cognate ligands, targets from
        interaction-predicted cells minus housekeeping + receptors."""
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC_Molecule_Selector, define_spateo_argparse

        adata = lr_adata.copy()
        # add a housekeeping gene that must be excluded
        import pandas as pd

        X = np.c_[np.asarray(adata.X), np.random.default_rng(0).poisson(5.0, (adata.n_obs, 1))]
        adata2 = st.AnnData(
            X=X.astype(np.float32), obs=adata.obs.copy(),
            var=pd.DataFrame(index=list(adata.var_names) + ["GAPDH"]),
        )
        adata2.obsm["spatial"] = adata.obsm["spatial"]
        st.SKM.init_adata_type(adata2, "UMI")
        with tempfile.TemporaryDirectory() as tmp:
            parser, args_list = define_spateo_argparse(
                mod_type="lr", species="human", output_path=f"{tmp}/out.csv",
                target_expr_threshold=0.05, bw_fixed=True, bw=10.0,
            )
            sel = MuSIC_Molecule_Selector(parser, args_list, adata=adata2)
            out = sel.find_targets()
            assert set(out["role"]) == {"target", "ligand", "receptor"}
            assert "TGFB1" in sel.ligands
            assert any("TGFBR" in r for r in sel.receptors)
            # housekeeping + receptors excluded from targets
            assert "GAPDH" not in sel.targets
            assert not set(sel.targets) & set(sel.receptors)
            assert "TGT1" in sel.targets
            # selections persisted
            assert os.path.exists(f"{tmp}/out/ligands.txt")
            assert os.path.exists(f"{tmp}/out/targets.txt")

    def test_rejects_unsupported_mod_type(self, lr_adata):
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC_Molecule_Selector, define_spateo_argparse

        with tempfile.TemporaryDirectory() as tmp:
            parser, args_list = define_spateo_argparse(
                mod_type="niche", species="human", output_path=f"{tmp}/out.csv",
            )
            sel = MuSIC_Molecule_Selector(parser, args_list, adata=lr_adata.copy())
            with pytest.raises(ValueError, match="receptor"):
                sel.find_targets()


class TestEffectPotential:
    def test_spatial_weights_change_output(self, lr_adata):
        """The defining property flagged in round 1: passing different
        spatial weights MUST change the effect potential."""
        import scipy.sparse

        from spateo_tpu.tools.CCI_effects_modeling import MuSIC, MuSIC_Interpreter, define_spateo_argparse

        with tempfile.TemporaryDirectory() as tmp:
            parser, args_list = define_spateo_argparse(
                mod_type="lr", species="human", output_path=f"{tmp}/out.csv",
                custom_ligands=["TGFB1"], custom_receptors=["TGFBR1", "TGFBR2"],
                custom_targets=["TGT1"], bw_fixed=True, bw=10.0, fit_intercept=True,
            )
            model = MuSIC(parser, args_list)
            model.adata = lr_adata.copy()
            model.fit(verbose=False)
            interp = MuSIC_Interpreter(parser, args_list)
            for attr in ("adata", "coeffs", "X_df", "targets_expr", "ligands_expr_nonlag", "receptors_expr",
                         "lr_db", "coords", "n_samples", "sample_names"):
                setattr(interp, attr, getattr(model, attr))
            # pick the first fitted lr feature
            feat = [c[2:] for c in model.coeffs["TGT1"].columns if ":" in c][0]
            lig, rec = feat.split(":")
            P1, ns1, nr1 = interp.get_effect_potential(
                target="TGT1", ligand=lig, receptor=rec,
                spatial_weights_membrane_bound=model.spatial_weights_membrane_bound,
                spatial_weights_secreted=model.spatial_weights_secreted,
            )
            n = model.n_samples
            W_alt = scipy.sparse.identity(n, format="csr")
            P2, ns2, nr2 = interp.get_effect_potential(
                target="TGT1", ligand=lig, receptor=rec,
                spatial_weights_membrane_bound=W_alt, spatial_weights_secreted=W_alt,
            )
            assert P1.shape == (n, n)
            assert not np.allclose(ns1, ns2)
            # sent potential concentrates on ligand-expressing (sender) cells
            senders = np.asarray(lr_adata.X[:, 0]).ravel() > 2
            assert np.abs(ns1[senders]).mean() > np.abs(ns1[~senders]).mean()
            # stored in .obs
            keys = [k for k in interp.adata.obs.columns if k.startswith("norm_sum_sent_effect_potential")]
            assert keys


class TestParityMethods:
    """MuSIC-level parity methods: local_fit (reference MuSIC.py:2665),
    map_new_cells (:2419), setup_downstream (:654)."""

    def _model(self, lr_adata, tmp):
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC
        from spateo_tpu.tools.CCI_effects_modeling.SWR import define_spateo_argparse

        parser, args_list = define_spateo_argparse(
            mod_type="ligand", species="human", output_path=f"{tmp}/out.csv",
            custom_ligands=["TGFB1", "DLL1"], custom_targets=["TGT1"],
            bw_fixed=True, bw=8.0, fit_intercept=True,
        )
        model = MuSIC(parser, args_list)
        model.adata = lr_adata.copy()
        model.load_and_process()
        model.define_sig_inputs()
        return model

    def test_local_fit_matches_batched_row(self, lr_adata):
        with tempfile.TemporaryDirectory() as tmp:
            m = self._model(lr_adata, tmp)
            target = list(m.targets_expr.columns)[0]
            y = np.asarray(m.targets_expr[target].values, float)
            X = np.asarray(m.X_df.values, float)
            m.x_chunk = np.arange(m.n_samples)
            b_one = m.local_fit(5, y, X, bw=8, final=True)
            B = m.mpi_fit(y, X, y_label=target, bw=8, final=True)
            np.testing.assert_allclose(b_one, B[5], rtol=1e-4, atol=1e-5)
            out = m.local_fit(5, y, X, bw=8, final=False)
            assert out[0] == 5.0 and len(out) == 3 + X.shape[1]

    def test_map_new_cells_extends_mapping(self, lr_adata):
        with tempfile.TemporaryDirectory() as tmp:
            m = self._model(lr_adata, tmp)
            target = list(m.targets_expr.columns)[0]
            fitted = [str(n) for n in m.sample_names[: m.n_samples - 20]]
            m.subsampled_sample_names = {target: fitted}
            m.neighboring_unsampled = {target: {}}
            m.map_new_cells()
            mapped = m.neighboring_unsampled[target]
            assert sum(len(v) for v in mapped.values()) == 20
            assert set(mapped.keys()) <= set(fitted)

    def test_setup_downstream_selects_measured_tfs(self, lr_adata):
        with tempfile.TemporaryDirectory() as tmp:
            m = self._model(lr_adata, tmp)
            tfs = m.setup_downstream()
            assert isinstance(tfs, list)
            assert all(t in set(map(str, m.adata.var_names)) for t in tfs)


class TestCCIDegSetupReferenceSemantics:
    """Reference pipeline behaviors in CCI_deg_detection_setup
    (ref MuSIC_downstream.py:6607-7085): complex splitting, >1% filter,
    pathway aggregation, GRN secondary-TF selection, intersection-ratio
    ranking, per-cell-type designs, X_jaccard."""

    def _interp(self, genes, X, extra_args=None, obs=None):
        import tempfile

        from spateo_tpu.tools.CCI_effects_modeling import MuSIC_Interpreter, define_spateo_argparse

        n = len(X)
        adata = st.AnnData(X=np.asarray(X, np.float32),
                           obs=obs if obs is not None else pd.DataFrame(index=[f"c{i}" for i in range(n)]),
                           var=pd.DataFrame(index=genes))
        adata.obsm["spatial"] = np.random.default_rng(0).uniform(0, 100, (n, 2)).astype(np.float32)
        st.SKM.init_adata_type(adata, "UMI")
        self._tmp = tempfile.TemporaryDirectory()
        parser, args_list = define_spateo_argparse(
            mod_type="ligand", species="human", output_path=f"{self._tmp.name}/out.csv",
            **(extra_args or {"custom_ligands": [genes[0]], "custom_targets": [genes[0]]}),
        )
        interp = MuSIC_Interpreter(parser, args_list)
        interp.adata = adata
        interp.load_and_process()
        return interp

    def test_intersection_ratio_ranking(self):
        from spateo_tpu.tools.CCI_effects_modeling.MuSIC_downstream import MuSIC_Interpreter

        sig = pd.DataFrame({"L": [1, 1, 1, 0, 0, 0]})
        regs = pd.DataFrame({
            "good": [2, 3, 1, 0, 0, 0],   # all nonzero cells overlap L -> ratio 1
            "half": [1, 0, 0, 1, 0, 0],   # 1 of 2 nonzero overlap -> 0.5
            "none": [0, 0, 0, 2, 2, 1],   # 0 of 3 -> 0
        })
        top = MuSIC_Interpreter._intersection_ratio_top_regulators(sig, regs, k=2)
        assert top["L"] == ["good", "half"]

    def test_complex_splitting_and_nonzero_filter(self):
        rng = np.random.default_rng(1)
        n = 300
        # ligand + complex components (IL12A_IL12B) + TF; one gene <1% cells
        genes = ["TGFB1", "IL12A", "IL12B", "RARELY", "STAT3"]
        X = np.c_[rng.poisson(2, n), rng.poisson(2, n), rng.poisson(2, n), np.zeros(n), rng.poisson(2, n)]
        X[0, 3] = 1.0  # RARELY in exactly 1/300 cells (<1%)
        interp = self._interp(genes, X)
        # synthesize a ligands table carrying a complex column
        interp.ligands_expr_nonlag = pd.DataFrame(
            {"TGFB1": X[:, 0], "IL12A_IL12B": np.minimum(X[:, 1], X[:, 2]), "RARELY": X[:, 3]},
            index=interp.adata.obs_names,
        )
        design, targets = interp.CCI_deg_detection_setup(use_ligands=True, custom_tfs=["STAT3"])
        # complex replaced by measured components; <1% gene filtered out
        assert "IL12A_IL12B" not in targets.columns
        assert "IL12A" in targets.columns and "IL12B" in targets.columns
        assert "RARELY" not in targets.columns
        # X_jaccard stored with one column per dependent molecule
        assert interp._cci_deg_jaccard.shape == (n, targets.shape[1])
        assert set(np.unique(interp._cci_deg_jaccard)) <= {0, 1}

    def test_pathway_aggregation_sums_member_ligands(self):
        rng = np.random.default_rng(2)
        n = 250
        # two human ligands from the same pathway in lr_db plus a TF
        from spateo_tpu.tools.CCI_effects_modeling.MuSIC import _read_db_csv, _DB_DIR
        import os

        lr = _read_db_csv(os.path.join(_DB_DIR, "lr_db_human.csv"))
        # first-occurrence ligand->pathway map (the reference's own
        # drop_duplicates semantics), then pick a pathway with >=2 ligands
        first_map = lr.set_index("from")["pathway"]
        first_map = first_map[~first_map.index.duplicated()]
        by_pathway = first_map[~first_map.index.str.contains("_")].groupby(first_map).groups
        pathway, members = next((k, list(v)) for k, v in by_pathway.items() if len(v) >= 2)
        ligs = members[:2]
        genes = ligs + ["STAT3"]
        X = rng.poisson(2, (n, len(genes)))
        interp = self._interp(genes, X, extra_args={"custom_ligands": ligs, "custom_targets": [ligs[0]]})
        design, targets = interp.CCI_deg_detection_setup(
            use_ligands=False, use_pathways=True, sender_receiver_or_target_degs="sender",
            custom_tfs=["STAT3"],
        )
        assert pathway in targets.columns
        # reference quirk preserved (MuSIC_downstream.py:6823): the
        # ligand->pathway map is Series.drop_duplicates() of the pathway
        # VALUES, so only the first lr_db-listed ligand of each pathway
        # survives the mapping; the "sum" is over surviving members
        surviving = lr.set_index("from")["pathway"].drop_duplicates()
        surviving = {l: p_ for l, p_ in surviving.items() if p_ == pathway and l in ligs}
        expected = sum(np.asarray(X[:, ligs.index(l)], float) for l in surviving)
        np.testing.assert_allclose(targets[pathway].values, expected, rtol=1e-6)

    def test_cell_type_designs(self):
        rng = np.random.default_rng(3)
        n = 300
        genes = ["TGFB1", "STAT3", "JUN"]
        X = rng.poisson(3, (n, 3))
        obs = pd.DataFrame({"group": ["A"] * 150 + ["B"] * 150}, index=[f"c{i}" for i in range(n)])
        interp = self._interp(genes, X, extra_args={
            "custom_ligands": ["TGFB1"], "custom_targets": ["TGFB1"], "group_key": "group"},
            obs=obs)
        out = interp.CCI_deg_detection_setup(
            use_ligands=False, use_cell_types=True, sender_receiver_or_target_degs="sender",
            custom_tfs=["STAT3"], group_key="group",
        )
        assert set(out) == {"A", "B"}
        assert "TGFB1" in out["A"]["targets"].columns
        # per-cell-type fit path
        res = interp.CCI_deg_detection("TGFB1", cell_type="A", distr="poisson")
        assert "coefficient" in res.columns

    def test_pathway_target_combination_rejected(self):
        interp = self._interp(["TGFB1", "STAT3"], np.random.default_rng(0).poisson(2, (100, 2)))
        with pytest.raises(ValueError, match="cannot be 'target'"):
            interp.CCI_deg_detection_setup(use_pathways=True, sender_receiver_or_target_degs="target")


class TestCoeffSignificanceFittedSE:
    def test_wald_uses_fitted_se_and_zero_filter(self):
        """Reference compute_coeff_significance (MuSIC_downstream.py:201):
        p-values come from per-cell fitted SEs; zero coefficient or zero SE
        entries get p=1."""
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC_Interpreter, define_spateo_argparse
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            parser, args_list = define_spateo_argparse(
                mod_type="ligand", species="human", output_path=f"{tmp}/out.csv",
                custom_ligands=["TGFB1"], custom_targets=["TGT"],
            )
            interp = MuSIC_Interpreter(parser, args_list)
            n = 50
            idx = [f"c{i}" for i in range(n)]
            b = np.full(n, 2.0)
            b[0] = 0.0  # zero coefficient -> p=1
            se = np.full(n, 0.5)
            se[1] = 0.0  # zero SE -> p=1
            interp.coeffs = {"TGT": pd.DataFrame({"b_TGFB1": b}, index=idx)}
            interp.standard_errors = {"TGT": pd.DataFrame({"se_TGFB1": se}, index=idx)}
            sig = interp.compute_coeff_significance()
            pv = interp.pvalues["TGT"]["b_TGFB1"]
            assert pv.iloc[0] == 1.0 and pv.iloc[1] == 1.0
            # z = 2/0.5 = 4 -> p ~ 6e-5
            assert pv.iloc[2] < 1e-3
            assert bool(sig["TGT"]["b_TGFB1"].iloc[2])


class TestKeepColumnThreshold:
    def test_sparse_columns_zeroed(self):
        """Reference init filter (MuSIC_downstream.py:187-196): columns
        nonzero in fewer than prop x expressing cells are zeroed in both
        coeffs and SEs."""
        from spateo_tpu.tools.CCI_effects_modeling import MuSIC_Interpreter, define_spateo_argparse
        import tempfile

        with tempfile.TemporaryDirectory() as tmp:
            parser, args_list = define_spateo_argparse(
                mod_type="ligand", species="human", output_path=f"{tmp}/out.csv",
                custom_ligands=["TGFB1"], custom_targets=["TGT"],
            )
            interp = MuSIC_Interpreter(parser, args_list, keep_coeff_threshold_proportion_cells=0.5)
            n = 100
            idx = [f"c{i}" for i in range(n)]
            dense = np.ones(n)
            sparse = np.zeros(n)
            sparse[:10] = 1.0  # 10% << 50% threshold
            interp.coeffs = {"TGT": pd.DataFrame({"b_dense": dense.copy(), "b_sparse": sparse.copy()}, index=idx)}
            interp.standard_errors = {"TGT": pd.DataFrame({"se_dense": dense * 0.1, "se_sparse": dense * 0.1}, index=idx)}
            interp._apply_keep_column_threshold()
            assert (interp.coeffs["TGT"]["b_sparse"] == 0).all()
            assert (interp.coeffs["TGT"]["b_dense"] == 1).all()
            assert (interp.standard_errors["TGT"]["se_sparse"] == 0).all()
