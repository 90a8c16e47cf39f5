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


class TestReferenceNamedCompat:
    """The reference-shaped host drivers (Affine_GD / BSpline_GD and their
    per-iteration internals, reference CAST_Stack.py:117-613) must agree
    with the TPU-native lax.scan fast path that CAST_STACK actually runs."""

    def test_affine_host_driver_matches_scan(self, warped_pair):
        import jax.numpy as jnp

        from spateo_tpu.external.cast_stack import Affine_GD, _affine_gd

        pts_q, pts_r, E = warped_pair
        from spateo_tpu.external.cast_stack import corr_dist, max_minus_value

        cov = max_minus_value(corr_dist(E, E)).astype(np.float32)
        alpha_basis = np.reshape(np.array([1 / 300, 1 / 300, 1 / 10, 10, 10]), [5, 1])
        iters = 40
        sscore, it_J, it_theta, _ = Affine_GD(
            pts_q, pts_r, cov, bleeding=500, dist_penalty=0, diff_step=25.0,
            alpha_basis=alpha_basis, iterations=iters,
        )
        theta_scan, Js = _affine_gd(
            jnp.asarray(pts_q), jnp.asarray(pts_r), jnp.asarray(cov),
            500.0, 0.0, jnp.asarray(alpha_basis.reshape(-1), jnp.float32),
            25.0, iters, False,
        )
        theta_host = np.asarray(it_theta[-1]).reshape(-1)
        np.testing.assert_allclose(theta_host, np.asarray(theta_scan), rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(sscore[1:]), np.asarray(Js), rtol=5e-3,
        )

    def test_bspline_host_driver_reduces_cost_and_identity_warp(self):
        from spateo_tpu.external.cast_stack import (
            BSpline_GD, BSpline_GD_preparation, BSpline_GD_uv_ij_calculate,
            BSpline_renew_coords, _kls,
        )

        rng = np.random.default_rng(3)
        pts_r = rng.uniform(0, 400, (150, 2)).astype(np.float32)
        pts_q = pts_r + rng.normal(0, 12, pts_r.shape).astype(np.float32)
        W = rng.normal(0, 1.0 / 80, (2, 12)).astype(np.float32)
        E = np.c_[np.sin(pts_r @ W), np.cos(pts_r @ W)].astype(np.float32)
        from spateo_tpu.external.cast_stack import corr_dist, max_minus_value

        cov = max_minus_value(corr_dist(E, E)).astype(np.float32)
        # identity warp: mesh_trans == mesh reproduces the input coords
        mesh, mw, kls, _, delta = BSpline_GD_preparation(pts_q.max(0), 6)
        uv, ij = BSpline_GD_uv_ij_calculate(pts_q, delta)
        back = BSpline_renew_coords(uv, kls, ij, mesh)
        np.testing.assert_allclose(back, pts_q, rtol=1e-4, atol=1e-3)
        out = BSpline_GD(
            pts_q, pts_r, cov, iterations=25, bleeding=500, dist_penalty=0,
            alpha_basis=300.0, diff_step=25.0, mesh_size=6,
        )
        coords_final, mesh_trans_list, _, sscore, _ = out
        assert coords_final.shape == pts_q.shape
        assert len(mesh_trans_list) == 25
        assert sscore[-1] < sscore[0]

    def test_bspline_basis_partition_of_unity(self):
        from spateo_tpu.external.cast_stack import B_matrix, _kls, torch_Bspline

        uv = np.random.default_rng(0).uniform(0, 1, (2, 64))
        # 1D cubic B-spline basis sums to 1 over the 4 supports
        total = sum(torch_Bspline(uv[0], np.full_like(uv[0], k)) for k in range(4))
        np.testing.assert_allclose(total, np.ones_like(uv[0]), rtol=1e-12)
        # tensor-product (16-support) partition of unity
        B = B_matrix(uv, _kls())
        assert B.shape == (16, 64)
        np.testing.assert_allclose(B.sum(0), np.ones(64), rtol=1e-12)

    def test_dJ_dtheta_rigid_ties_scale_axes(self):
        from spateo_tpu.external.cast_stack import dJ_dtheta_cal

        rng = np.random.default_rng(1)
        xi, yi = rng.normal(size=(2, 50))
        dJ = rng.normal(size=(2, 50))
        theta = np.array([1.0, 1.0, 0.0, 0.0, 0.0]).reshape(5, 1)
        g = dJ_dtheta_cal(xi, yi, dJ, theta, ifrigid=True)
        assert g.shape == (5,)
        np.testing.assert_allclose(g[0], g[1], rtol=1e-12)


class TestCastModelFamily:
    """GCNII / GCN / CCA_SSG module surface (reference model_GCNII.py)."""

    def _graph(self, n=40, f=16, seed=0):
        rng = np.random.default_rng(seed)
        pts = rng.uniform(0, 100, (n, 2))
        d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        A = np.zeros((n, n), np.float32)
        nbr = np.argsort(d2, 1)[:, 1:6]
        for i in range(n):
            A[i, nbr[i]] = 1
        A = np.maximum(A, A.T)
        X = rng.normal(size=(n, f)).astype(np.float32)
        return A, X

    def test_gcnii_forward_shape_and_determinism(self):
        from spateo_tpu.external.cast_model import GCNII

        A, X = self._graph()
        m = GCNII(in_dim=16, encoder_dim=8, n_layers=4)
        h1 = np.asarray(m(A, X))
        h2 = np.asarray(m(A, X))
        assert h1.shape == (40, 16)
        np.testing.assert_array_equal(h1, h2)

    def test_gcnii_encoder_changes_width(self):
        from spateo_tpu.external.cast_model import GCNII

        A, X = self._graph()
        m = GCNII(in_dim=16, encoder_dim=8, n_layers=3, use_encoder=True)
        assert np.asarray(m(A, X)).shape == (40, 8)

    def test_gcn_backbone(self):
        from spateo_tpu.external.cast_model import GCN

        A, X = self._graph()
        assert np.asarray(GCN(16, 8, 2)(A, X)).shape == (40, 16)

    def test_cca_ssg_standardized_views(self):
        from spateo_tpu.external.cast_model import CCA_SSG

        A, X = self._graph()
        model = CCA_SSG(in_dim=16, encoder_dim=8, n_layers=3, backbone="GCNII")
        h1, h2 = model(A, X, A, X)
        for h in (h1, h2):
            h = np.asarray(h)
            np.testing.assert_allclose(h.mean(0), 0.0, atol=1e-4)
            np.testing.assert_allclose(h.std(0), 1.0, atol=1e-2)
        emb = np.asarray(model.get_embedding(A, X))
        assert emb.shape == (40, 16)
        with pytest.raises(ValueError):
            CCA_SSG(16, 8, 2, backbone="SAGE")

    def test_args_dataclass(self):
        from spateo_tpu.external.cast_model import Args

        a = Args(dataname="demo")
        assert a.epochs == 1000 and a.device in ("cpu", "tpu", "gpu")
