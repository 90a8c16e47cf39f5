"""CAST-Stack delta-alignment + CAST-Project tests (reference
external/CAST/CAST_Stack.py, CAST_Projection.py)."""

import numpy as np
import pandas as pd
import pytest

import spateo_tpu as st


@pytest.fixture(scope="module")
def warped_pair():
    """Rotated+translated slice pair with spatially SMOOTH shared
    embeddings (CAST-Mark embeddings are graph-smoothed; i.i.d. random
    features would give a flat, gradient-free similarity landscape)."""
    rng = np.random.default_rng(0)
    n = 300
    pts_r = rng.uniform(0, 2000, (n, 2)).astype(np.float32)
    th = np.deg2rad(25.0)
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
    pts_q = pts_r @ R.T + np.array([300.0, -200.0], np.float32)
    W = rng.normal(0, 1.0 / 400, (2, 16)).astype(np.float32)
    phase = rng.uniform(0, 2 * np.pi, 16).astype(np.float32)
    E = np.c_[np.sin(pts_r @ W + phase), np.cos(pts_r @ W + phase)].astype(np.float32)
    return pts_q, pts_r, E


def _params(**kw):
    from spateo_tpu.external.cast_stack import reg_params

    base = dict(
        dataname="q", iterations=800, diff_step=25.0,
        alpha_basis=(1 / 300, 1 / 300, 1 / 10, 10, 10),
        iterations_bs=(60,), meshsize=(6,), alpha_basis_bs=(300.0,),
    )
    base.update(kw)
    return reg_params(**base)


class TestCastStack:
    def test_recovers_affine_warp(self, warped_pair):
        from spateo_tpu.external.cast_stack import CAST_STACK

        pts_q, pts_r, E = warped_pair
        init_err = float(np.linalg.norm(pts_q - pts_r, axis=1).mean())
        out = CAST_STACK(
            {"q": pts_q, "r": pts_r}, {"q": E, "r": E}, ["q", "r"], params_dist=_params(),
        )
        err = float(np.linalg.norm(out["q"] - pts_r, axis=1).mean())
        assert err < 0.15 * init_err, f"alignment error {err:.1f} vs initial {init_err:.1f}"
        assert out["r"].shape == pts_r.shape

    def test_prelocate_finds_rotation(self, warped_pair):
        """A 180-degree flip must be identified by the pre-location grid."""
        import jax.numpy as jnp

        from spateo_tpu.external.cast_stack import corr_dist, max_minus_value, prelocate

        pts_q, pts_r, E = warped_pair
        # rotate query by exactly 180 degrees around its mean
        q = -(pts_q - pts_q.mean(0))
        r = pts_r - pts_r.mean(0)
        cov = max_minus_value(corr_dist(E, E)).astype(np.float32)
        theta = prelocate(jnp.asarray(q), jnp.asarray(r), jnp.asarray(cov), 500.0, d_list=[1.0])
        # 180 + the original 25-degree offset: 180 or 270 are the two grid
        # rotations closest to 205; both beat 0/90
        assert theta[2] in (180.0, 270.0)

    def test_ffd_handles_nonrigid(self):
        """A smooth sinusoidal warp is reduced by the B-spline FFD stage."""
        from spateo_tpu.external.cast_stack import CAST_STACK

        rng = np.random.default_rng(1)
        n = 300
        pts_r = rng.uniform(0, 2000, (n, 2)).astype(np.float32)
        warp = np.c_[60 * np.sin(pts_r[:, 1] / 300), 60 * np.cos(pts_r[:, 0] / 300)].astype(np.float32)
        pts_q = pts_r + warp
        W = rng.normal(0, 1.0 / 400, (2, 16)).astype(np.float32)
        phase = rng.uniform(0, 2 * np.pi, 16).astype(np.float32)
        E = np.c_[np.sin(pts_r @ W + phase), np.cos(pts_r @ W + phase)].astype(np.float32)
        params = _params(iterations=100, iterations_bs=(200,))
        out = CAST_STACK({"q": pts_q, "r": pts_r}, {"q": E, "r": E}, ["q", "r"], params_dist=params)
        err = float(np.linalg.norm(out["q"] - pts_r, axis=1).mean())
        init_err = float(np.linalg.norm(warp, axis=1).mean())
        assert err < 0.7 * init_err, f"FFD error {err:.1f} vs initial {init_err:.1f}"

    def test_reg_total_replays_saved_transform(self, warped_pair):
        from spateo_tpu.external.cast_stack import CAST_STACK, reg_total

        pts_q, pts_r, E = warped_pair
        params = _params(iterations=150, iterations_bs=(20,), meshsize=(5,))
        out = CAST_STACK({"q": pts_q, "r": pts_r}, {"q": E, "r": E}, ["q", "r"], params_dist=params)
        _, replay = reg_total(pts_q, pts_r, params)
        np.testing.assert_allclose(np.asarray(replay), out["q"], atol=1e-2)


class TestCastProject:
    def test_projection_prefers_physical_window(self):
        from spateo_tpu.external.cast_projection import physical_dist_priority_project

        rng = np.random.default_rng(0)
        ns, nt, F = 200, 100, 16
        coords_s = rng.uniform(0, 1000, (ns, 2)).astype(np.float32)
        coords_t = coords_s[:nt] + rng.normal(0, 5, (nt, 2)).astype(np.float32)
        feats = rng.normal(size=(ns, F)).astype(np.float32)
        feat_t = feats[:nt] + rng.normal(0, 0.05, (nt, F)).astype(np.float32)
        src_expr = rng.poisson(3.0, (ns, 10)).astype(np.float32)
        ind, w, cd, pd_, proj = physical_dist_priority_project(
            feat_t, feats, coords_t, coords_s, source_feat=src_expr, k2=1, pdist_thres=100.0
        )
        # each target matches its generating source cell
        assert (ind[:, 0] == np.arange(nt)).mean() > 0.9
        assert proj.shape == (nt, 10)
        np.testing.assert_allclose(
            proj[ind[:, 0] == np.arange(nt)], src_expr[:nt][ind[:, 0] == np.arange(nt)], rtol=1e-5, atol=1e-5
        )

    def test_fallback_extends_window(self):
        """Targets with no in-window source still get k2 matches from the
        k_extend physically-nearest sources."""
        from spateo_tpu.external.cast_projection import physical_dist_priority_project

        rng = np.random.default_rng(1)
        coords_s = rng.uniform(0, 100, (50, 2)).astype(np.float32)
        coords_t = coords_s[:10] + 10000.0  # far outside any window
        feats = rng.normal(size=(50, 8)).astype(np.float32)
        ind, w, cd, pd_ = physical_dist_priority_project(
            feats[:10], feats, coords_t, coords_s, k2=2, k_extend=5, pdist_thres=50.0
        )
        assert ind.shape == (10, 2)
        assert np.all(np.isfinite(w)) and np.allclose(w.sum(1), 1.0, atol=1e-5)

    def test_cast_project_anndata(self):
        from spateo_tpu.external.cast_projection import CAST_PROJECT

        rng = np.random.default_rng(2)
        n = 120
        coords = rng.uniform(0, 500, (n, 2)).astype(np.float32)
        X = rng.poisson(2.0, (2 * n, 12)).astype(np.float32)
        feats = np.vstack([rng.normal(size=(n, 8))] * 2).astype(np.float32)
        obs = pd.DataFrame({
            "protocol": ["src"] * n + ["tgt"] * n,
            "ctype": (["A"] * (n // 2) + ["B"] * (n - n // 2)) * 2,
        }, index=[f"c{i}" for i in range(2 * n)])
        adata = st.AnnData(X=X, obs=obs, var=pd.DataFrame(index=[f"g{j}" for j in range(12)]))
        adata.obsm["X_pca"] = feats
        st.SKM.init_adata_type(adata, "UMI")
        sdata_ref, out = CAST_PROJECT(
            adata, "src", "tgt", coords, coords + 1.0, batch_key="protocol",
            source_sample_ctype_col="ctype", pc_feature="X_pca", raw_layer="X",
        )
        assert sdata_ref.X.shape == (n, 12)
        assert "ctype_projected" in sdata_ref.obs.columns
        # identical features + near-identical coords -> identity matching
        assert (np.asarray(out[0])[:, 0] == np.arange(n)).mean() > 0.9
