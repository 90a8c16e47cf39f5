"""Compat/parity surface tests for the sweep additions (reference symbol
coverage: tools/utils, regression helpers, tdr utilities, widgets, UMAP,
spagcn utils, fdr, mesh utils)."""

import numpy as np
import pandas as pd
import pytest

import spateo_tpu as st


class TestToolsUtils:
    def test_affine_and_rotation(self):
        from spateo_tpu.tools.utils import affine_transform, gen_rotation_2d, in_hull

        R = gen_rotation_2d(90)
        out = affine_transform(np.array([[1.0, 0.0]]), R, np.zeros(2))
        np.testing.assert_allclose(out, [[0.0, 1.0]], atol=1e-12)
        hull = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
        assert in_hull(np.array([[0.5, 0.5], [2, 2]]), hull).tolist() == [True, False]

    def test_parse_instruction(self):
        from spateo_tpu.tools.utils import parse_instruction

        assert parse_instruction("x less than 5 and y greater than or equal to 2") == "(x < 5) & (y >= 2)"

    def test_create_new_coordinate(self):
        """Reference semantics (tools/utils.py:304): distance along the
        plane diagonal from the min corner; '-' variants flip the second
        axis so the axis runs from (min x, max y)."""
        from spateo_tpu.tools.utils import create_new_coordinate

        a = st.sample_data.synthetic(n_cells=100, seed=0)
        create_new_coordinate(a, plane="xy")
        assert "xy Coordinate" in a.obs.columns and "xy Line" in a.uns
        coords = np.asarray(a.obsm["spatial"], float)
        d = np.asarray(a.obs["xy Coordinate"], float)
        # the cell nearest the min corner has (near-)minimal distance
        corner = np.argmin(coords[:, 0] + coords[:, 1])
        assert d[corner] <= np.quantile(d, 0.05)
        far = np.argmax(coords[:, 0] + coords[:, 1])
        assert d[far] >= np.quantile(d, 0.95)
        # negative plane: the axis runs from the (max x, min y) corner
        create_new_coordinate(a, plane="-xy")
        d2 = np.asarray(a.obs["-xy Coordinate"], float)
        corner2 = np.argmax(coords[:, 0] - coords[:, 1])
        assert d2[corner2] <= np.quantile(d2, 0.1)
        # z-plane requires 3 spatial dims
        with pytest.raises(ValueError, match="z-axis"):
            create_new_coordinate(a, plane="yz")
        # centerline extension still writes new_x / new_y
        create_new_coordinate(a, centerline_points=np.array([[0.0, 0.0], [1.0, 0.0]]))
        assert "new_x" in a.obs.columns and "new_y" in a.obs.columns


class TestNativeUMAP:
    def test_blob_separation(self):
        from spateo_tpu.tools.dimensionality_reduction import umap_conn_indices_dist_embedding

        rng = np.random.default_rng(0)
        X = np.concatenate([rng.normal(c, 0.3, (80, 8)) for c in (0, 6)])
        labels = np.repeat([0, 1], 80)
        # reference default (return_mapper=True): mapper comes FIRST
        mapper, graph, ki, kd, emb = umap_conn_indices_dist_embedding(X, n_neighbors=10, max_iter=200)
        assert emb.shape == (160, 2)
        c0, c1 = emb[labels == 0].mean(0), emb[labels == 1].mean(0)
        intra = np.linalg.norm(emb[labels == 0] - c0, axis=1).mean()
        assert np.linalg.norm(c0 - c1) > 3 * intra
        # the mapper projects new points near their cluster
        proj = mapper.transform(X[:5] + 0.01)
        assert np.linalg.norm(proj - c0, axis=1).mean() < np.linalg.norm(proj - c1, axis=1).mean()
        # 4-tuple form preserved
        graph2, ki2, kd2, emb2 = umap_conn_indices_dist_embedding(
            X, n_neighbors=10, max_iter=200, return_mapper=False
        )
        assert emb2.shape == (160, 2)


class TestRegressionHelpers:
    def test_golden_section_and_vif(self):
        from spateo_tpu.tools.CCI_effects_modeling.regression_utils import (
            golden_section_search,
            multicollinearity_check,
        )

        assert abs(golden_section_search(lambda v: (v - 1.7) ** 2, 0, 5) - 1.7) < 1e-3
        df = pd.DataFrame({
            "a": np.arange(40.0),
            "b": np.arange(40.0) * 3 + 1e-4,
            "c": np.random.default_rng(0).normal(size=40),
        })
        kept = multicollinearity_check(df)
        assert kept.shape[1] == 2  # one of the collinear pair dropped


class TestTdrUtilities:
    def test_model_io_roundtrip(self, tmp_path):
        from spateo_tpu.tdr.models.mesh_core import PointCloud

        pc = PointCloud(np.random.default_rng(0).normal(size=(30, 3)), {"v": np.arange(30.0)})
        f = st.tdr.save_model(pc, str(tmp_path / "m"))
        back = st.tdr.read_model(f)
        np.testing.assert_allclose(back.points, pc.points)
        np.testing.assert_allclose(back.point_data["v"], pc.point_data["v"])

    def test_transforms(self):
        from spateo_tpu.tdr.models.mesh_core import PointCloud

        pts = np.random.default_rng(0).normal(size=(40, 3))
        pc = PointCloud(pts)
        r = st.tdr.rotate_model(pc, (0, 0, 90))
        np.testing.assert_allclose(
            np.linalg.norm(r.points - r.points.mean(0), axis=1),
            np.linalg.norm(pts - pts.mean(0), axis=1), rtol=1e-6,
        )
        s = st.tdr.scale_model(pc, 2.0)
        np.testing.assert_allclose(np.ptp(s.points, axis=0), 2 * np.ptp(pts, axis=0), rtol=1e-6)

    def test_widgets_slice_pick(self):
        from spateo_tpu.tdr.models.mesh_core import PointCloud

        pts = np.random.default_rng(0).uniform(0, 10, (200, 3))
        pc = PointCloud(pts, {"groups": np.where(pts[:, 0] < 5, "a", "b")})
        bands = st.tdr.three_d_slice(pc, n_slices=5)
        assert len(bands) == 5 and sum(b.n_points for b in bands) == 200
        picked = st.tdr.three_d_pick(pc, picked_groups="a")
        assert picked[0].n_points == int((pts[:, 0] < 5).sum())


class TestFdrSpagcn:
    def test_fdr_correct_axes(self):
        from spateo_tpu.tools.cci_fdr import fdr_correct

        pv = pd.DataFrame(np.full((3, 2), 0.04))
        out_c = fdr_correct(pv, corr_axis="clusters")
        out_i = fdr_correct(pv, corr_axis="interactions")
        assert (out_c.values >= 0.04 - 1e-12).all() and (out_i.values >= 0.04 - 1e-12).all()
        with pytest.raises(ValueError, match="corr_axis"):
            fdr_correct(pv, corr_axis="bogus")

    def test_spagcn_adjacency(self):
        from spateo_tpu.tools.cluster.spagcn_utils import calculate_adj_matrix, calculate_p, search_l

        rng = np.random.default_rng(0)
        adj = calculate_adj_matrix(rng.uniform(0, 10, 40), rng.uniform(0, 10, 40))
        l = search_l(0.5, adj)
        assert abs(calculate_p(adj, l) - 0.5) < 0.02


class TestMeshUtils:
    def test_clean_and_fix(self):
        from spateo_tpu.tdr.models.mesh_core import Mesh
        from spateo_tpu.tdr.models.models_individual.mesh_utils import clean_mesh, fix_mesh

        pts = np.random.default_rng(0).normal(size=(10, 3))
        faces = np.array([[0, 1, 2], [0, 1, 2], [3, 3, 4], [5, 6, 7]])  # dup + degenerate + island
        m = clean_mesh(Mesh(pts, faces))
        assert m.n_faces == 2  # dup collapsed, degenerate dropped
        fixed = fix_mesh(Mesh(pts, faces))
        assert fixed.n_faces == 1  # only the largest component survives
