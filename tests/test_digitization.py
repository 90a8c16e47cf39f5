"""Digitization tests: Jacobi heat solver, digitize/gridit, contours."""

import cv2
import numpy as np
import pandas as pd
import pytest

import spateo_tpu as st
from spateo_tpu.ops.stencil import graph_heat_solve, jacobi_solve


class TestJacobi:
    def test_laplace_1d_profile(self):
        """On a rectangle with hot left edge and cold right edge, the solution
        is a linear ramp."""
        H, W = 32, 64
        field = np.zeros((H, W), np.float32)
        border = np.zeros((H, W))
        mask = np.ones((H, W))
        field[:, 0] = 1.0
        field[:, -1] = 100.0
        border[:, 0] = 1
        border[:, -1] = 1
        # top/bottom edges: linear gradient Dirichlet
        ramp = np.linspace(1, 100, W)
        field[0] = ramp
        field[-1] = ramp
        border[0] = 1
        border[-1] = 1
        sol, it, err = jacobi_solve(field, border, mask, max_err=1e-8, max_itr=50_000)
        np.testing.assert_allclose(sol[H // 2], ramp, rtol=0.02)

    def test_pallas_vmem_block_matches_xla_block(self):
        """The VMEM-resident Pallas sweep block (engaged on real TPUs for
        rasters that fit on-chip) is exactly the XLA roll/update step
        (interpret mode on CPU)."""
        import jax.numpy as jnp

        from spateo_tpu.ops.stencil import _jacobi_pallas_block

        rng = np.random.default_rng(0)
        H, W = 16, 128  # lane-aligned last dim
        f0 = rng.uniform(0, 10, (H, W)).astype(np.float32)
        border = np.zeros((H, W), bool)
        border[0] = border[-1] = True
        border[3, 40:60] = True
        upd = np.zeros((H, W), np.float32)
        upd[1:-1, 1:-1] = 1.0
        upd[border] = 0.0

        f_ref = f0.copy()
        for _ in range(7):
            pre = f_ref.copy()
            avg = 0.25 * (
                np.roll(pre, -1, 0) + np.roll(pre, 1, 0) + np.roll(pre, -1, 1) + np.roll(pre, 1, 1)
            )
            f_ref = np.where(upd > 0, avg, pre)

        got = np.asarray(_jacobi_pallas_block(jnp.asarray(f0), jnp.asarray(upd), 7, interpret=True))
        np.testing.assert_allclose(got, f_ref, atol=1e-6)

    def test_matches_numpy_reference_solver(self):
        """Device solver must agree with a literal numpy transcription of the
        reference update rule (reference digitization/utils.py:513-515)."""
        rng = np.random.default_rng(0)
        H = W = 24
        init = np.zeros((H, W), np.float32)
        border = np.zeros((H, W))
        mask = np.ones((H, W))
        init[0, :] = 1
        init[-1, :] = 100
        border[0] = border[-1] = 1
        got, _, _ = jacobi_solve(init, border, mask, max_err=1e-12, max_itr=100_000)

        grid = init.copy()
        for _ in range(20000):
            pre = grid.copy()
            grid[1:-1, 1:-1] = 0.25 * (pre[1:-1, 2:] + pre[1:-1, :-2] + pre[2:, 1:-1] + pre[:-2, 1:-1])
            grid = np.where(border != 0, init, grid)
        np.testing.assert_allclose(got, grid * mask, atol=0.3)

    def test_graph_heat(self):
        # path graph 0-1-2-3-4 with ends fixed
        rows = np.array([0, 1, 1, 2, 2, 3, 3, 4])
        cols = np.array([1, 0, 2, 1, 3, 2, 4, 3])
        v, it, err = graph_heat_solve(5, rows, cols, [0], [4], lh=0.0, hh=4.0)
        np.testing.assert_allclose(v, [0, 1, 2, 3, 4], atol=0.05)


@pytest.fixture
def domain_adata():
    """Cells filling a square domain with a contour around it."""
    n = 30
    xs, ys = np.meshgrid(np.arange(5, 35), np.arange(5, 35))
    coords = np.c_[xs.ravel(), ys.ravel()].astype(float)
    adata = st.AnnData(X=np.ones((len(coords), 4)))
    adata.obsm["spatial"] = coords
    st.SKM.init_adata_type(adata, "UMI")
    # contour: the boundary of the square [5,34]x[5,34]
    mask = np.zeros((40, 40), np.uint8)
    mask[5:35, 5:35] = 255
    ctrs, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_NONE)
    return adata, ctrs


class TestDigitize:
    def test_digitize_and_gridit(self, domain_adata):
        adata, ctrs = domain_adata
        # corners in (x, y) = (col, row) order as cv2 produces
        pnt_xy = (5, 5)
        pnt_Xy = (34, 5)
        pnt_xY = (5, 34)
        pnt_XY = (34, 34)
        st.dd.digitize(adata, ctrs, 0, pnt_xy, pnt_Xy, pnt_xY, pnt_XY, max_itr=20000)
        layer = np.asarray(adata.obs["digital_layer"], float)
        column = np.asarray(adata.obs["digital_column"], float)
        assert (layer > 0).mean() > 0.9
        # heat must increase along the layer direction: the min/max isolines
        # sit at contour-y = 5 / 34, and contour-y maps to spatial[:, 0]
        coords = np.asarray(adata.obsm["spatial"])
        low = layer[coords[:, 0] < 10].mean()
        high = layer[coords[:, 0] > 30].mean()
        assert high > low + 20

        st.dd.gridit(adata, layer_num=4, column_num=4)
        assert set(np.unique(adata.obs["layer_label"])) - {0} <= {1, 2, 3, 4}
        assert (np.asarray(adata.obs["layer_label"]) > 0).mean() > 0.8


class TestContour:
    def test_gen_cluster_image_and_contours(self):
        rng = np.random.default_rng(0)
        coords = rng.uniform(2, 38, (300, 2))
        clusters = np.where(coords[:, 0] < 20, "A", "B")
        adata = st.AnnData(X=np.ones((300, 3)))
        adata.obsm["spatial"] = coords
        adata.obs["scc"] = clusters
        st.SKM.init_adata_type(adata, "UMI")
        img = st.dd.gen_cluster_image(adata, bin_size=2, cluster_key="scc", show=False)
        assert img.max() == 2
        labels = np.asarray(adata.obs["cluster_img_label"])
        ctrs, filled, outline = st.dd.extract_cluster_contours(img, [1], bin_size=2, min_area=4, show=False)
        assert len(ctrs) >= 1
        assert filled.sum() > 0

    def test_set_domains(self):
        rng = np.random.default_rng(1)
        coords = rng.uniform(2, 38, (400, 2))
        clusters = np.where(coords[:, 0] < 20, "A", "B")
        adata = st.AnnData(X=np.ones((400, 3)))
        adata.obsm["spatial"] = coords
        adata.obs["scc"] = clusters
        st.SKM.init_adata_type(adata, "UMI")
        st.dd.set_domains(adata, bin_size_high=2, cluster_key="scc", min_area=2)
        domains = np.asarray(adata.obs["domain_scc"])
        assert (domains != "NA").mean() > 0.7


class TestBorderline:
    def test_get_borderline(self):
        xs, ys = np.meshgrid(np.arange(2, 38), np.arange(2, 38))
        coords = np.c_[xs.ravel(), ys.ravel()].astype(float)
        clusters = np.where(coords[:, 0] < 20, "A", "B")
        adata = st.AnnData(X=np.ones((len(coords), 3)))
        adata.obsm["spatial"] = coords
        adata.obs["cl"] = clusters
        st.SKM.init_adata_type(adata, "UMI")
        img = st.dd.get_borderline(adata, "cl", ["A"], ["B"], bin_size=1, k_size=4, min_area=4)
        assert img.sum() > 0
        # borderline should be near x=20
        ys_b, xs_b = np.nonzero(img)
        assert abs(np.median(ys_b) - 20) < 5


class TestBoundaryOldAPI:
    """The boundary-centric workflow of the reference's *_old API surface
    (boundary_old.py identify_boundary/boundary_gridding,
    utils_old.py add_ep_boundary/add_gp_boundary/calc_op_field)."""

    def _two_region_adata(self):
        xs, ys = np.meshgrid(np.arange(2, 58), np.arange(2, 58))
        coords = np.c_[xs.ravel(), ys.ravel()].astype(float)
        clusters = np.where(coords[:, 0] < 30, "A", "B")
        adata = st.AnnData(X=np.ones((len(coords), 3)))
        adata.obsm["spatial"] = coords
        adata.obs["cl"] = clusters
        st.SKM.init_adata_type(adata, "UMI")
        return adata

    def test_identify_boundary(self):
        adata = self._two_region_adata()
        img = st.dd.identify_boundary(adata, "cl", ["A"], ["B"], bin_size=1, k_size=4, min_area=4)
        assert img.sum() > 0
        assert "boundary_line" in adata.obs
        assert (np.asarray(adata.obs["boundary_line"]) == "Boundary Line").sum() > 0
        # the boundary hugs the A/B interface at x ~ 30
        ys_b, xs_b = np.nonzero(img)
        assert abs(np.median(ys_b) - 30) < 6

    def test_boundary_gridding(self):
        adata = self._two_region_adata()
        img = st.dd.identify_boundary(adata, "cl", ["A"], ["B"], bin_size=1, k_size=4, min_area=4)
        from spateo_tpu.digitization.utils import order_borderline

        line = order_borderline(img)
        if len(line) < 8:
            import pytest

            pytest.skip("boundary too short on this synthetic raster")
        segs = st.dd.boundary_gridding(adata, img, line, n_layer=2, n_column=5, layer_width=5, init=True)
        assert len(segs) >= 3
        # layer/column labels written for some cells
        assert (np.asarray(adata.obs["layer_label"]) != 0).any()

    def test_calc_op_field_alias(self):
        # calc_op_field == domain_heat_eqn_solver with old parameter names
        field = np.zeros((40, 40), np.float32)
        border = np.zeros((40, 40), np.float32)
        mask = np.zeros((40, 40), np.float32)
        mask[5:35, 5:35] = 1
        min_line = [(x, 5) for x in range(5, 35)]
        max_line = [(x, 34) for x in range(5, 35)]
        edge_a = [(5, y) for y in range(5, 35)]
        edge_b = [(34, y) for y in range(5, 35)]
        for ln in (min_line, max_line, edge_a, edge_b):
            for x, y in ln:
                border[y, x] = 1
        out = st.dd.calc_op_field(field, min_line, max_line, edge_a, edge_b, border, mask, max_itr=2e4, lp=1, hp=100)
        inner = out[10:30, 10:30]
        assert inner.min() >= 0 and inner.max() <= 100
        # monotone gradient from the lp to the hp side
        assert out[30, 20] > out[8, 20]


class TestShardedJacobi:
    def test_sharded_matches_serial(self):
        """Row-sharded Jacobi (rolls -> GSPMD halo exchanges) matches the
        serial kernel bit-for-bit; 60 rows on 8 devices exercises padding."""
        from spateo_tpu.ops.stencil import jacobi_solve, jacobi_solve_sharded
        from spateo_tpu.parallel import create_mesh

        H = W = 60
        field = np.zeros((H, W), np.float32)
        border = np.zeros((H, W), bool)
        mask = np.zeros((H, W), np.float32)
        mask[5:-5, 5:-5] = 1
        field[5, 5:-5] = 1.0
        border[5, 5:-5] = True
        field[-6, 5:-5] = 100.0
        border[-6, 5:-5] = True
        f_serial, it_s, _ = jacobi_solve(field, border, mask, max_itr=20000, max_err=1e-8)
        f_shard, it_p, _ = jacobi_solve_sharded(field, border, mask, max_itr=20000, max_err=1e-8, mesh=create_mesh())
        assert it_s == it_p
        np.testing.assert_allclose(f_serial, f_shard, atol=1e-5)
