"""sample_data, live-wire/lasso/ROI tools, simulation_evaluation, theming
(reference parity: spateo/sample_data.py, tools/{live_wire,cluster_lasso,
roi}.py, segmentation/simulation_evaluation/, configuration theming)."""

import numpy as np
import pandas as pd
import pytest

import spateo_tpu as st


class TestSampleData:
    def test_synthetic_structure(self):
        a = st.sample_data.synthetic(n_cells=400, n_genes=30, n_domains=4, seed=1)
        assert a.n_obs == 400 and a.n_vars == 30
        assert len(set(np.asarray(a.obs["domain"]))) == 4
        assert a.obsm["spatial"].shape == (400, 2)
        assert st.SKM.get_adata_type(a) == "UMI"
        # markers actually mark: domain_0's markers higher inside than outside
        dom = np.asarray(a.obs["domain"]) == "domain_0"
        X = np.asarray(a.X)
        assert X[dom, :3].mean() > X[~dom, :3].mean() + 1

    def test_unknown_filename_raises(self):
        with pytest.raises(KeyError, match="unknown sample file"):
            st.sample_data.mousebrain("nope.h5ad")


class TestLiveWire:
    def test_path_follows_dark_valley(self):
        img = np.ones((50, 50)) * 0.5
        img[:, 24:27] = 0.0
        path = np.asarray(st.tl.compute_shortest_path(img, (2, 25), (47, 25)))
        assert len(path) >= 46
        assert np.all(np.abs(path[:, 1] - 25) <= 2)

    def test_requires_image(self):
        lw = st.tl.LiveWireSegmentation(None)
        with pytest.raises(AttributeError, match="Load an image"):
            lw.compute_shortest_path((0, 0), (1, 1))


class TestLassoRoi:
    def test_lasso_select(self):
        a = st.sample_data.synthetic(n_cells=300, seed=0)
        L = st.tl.Lasso(a)
        sub = L.select(np.array([[0.0, 0.0], [40.0, 0.0], [40.0, 40.0], [0.0, 40.0]]))
        pts = np.asarray(sub.obsm["spatial"])
        assert sub.n_obs > 0
        assert (pts <= 40.0 + 1e-6).all()
        assert st.tl.Lasso.sub_adata is sub

    def test_roi_fill(self):
        roi = st.tl.ROIAnnotator(np.zeros((40, 40)))
        roi.add_boundary([(5, 5), (5, 35), (35, 35), (35, 5)])
        roi.add_boundary([(10, 10), (10, 20), (20, 20), (20, 10)])
        labels = roi.fill_regions()
        assert labels.max() == 2  # nested region + annulus
        assert labels[2, 2] == 0  # outside stays background
        assert labels[15, 15] > 0
        masks = roi.region_masks()
        assert len(masks) == 2


class TestSimulationEvaluation:
    def _real_labels(self):
        real = np.zeros((80, 80), np.uint16)
        yy, xx = np.mgrid[0:80, 0:80]
        for i, (cy, cx, r) in enumerate([(20, 20, 7), (55, 30, 5), (40, 65, 8)]):
            real[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = i + 1
        return real

    def test_distributions_and_placement(self):
        from spateo_tpu.segmentation.simulation_evaluation import (
            add_sig_to_cell,
            cell_area_dis,
            get_cell_pos,
            get_fb_dis,
            ltos_ratio_dis,
        )

        real = self._real_labels()
        rng = np.random.default_rng(0)
        img = rng.poisson(1.0, (80, 80))
        img[real > 0] += rng.poisson(5.0, int((real > 0).sum()))

        area_df = cell_area_dis([real])
        ltos = ltos_ratio_dis([real])
        assert (ltos >= 1).all()
        labels = get_cell_pos(area_df, ltos, cell_num=8, height=100, width=100, seed=1, max_iter=2000, shift_length=25)
        assert len(np.unique(labels)) - 1 == 8  # all placed without overlap

        fb = get_fb_dis(img, real)
        sigs = add_sig_to_cell(
            labels, pd.DataFrame({"prob": fb["cell_sigs"]}), pd.DataFrame({"prob": fb["bg_sigs"]}), 1
        )
        assert sigs[labels > 0].mean() > sigs[labels == 0].mean() + 2

    def test_metrics(self):
        from spateo_tpu.segmentation.simulation_evaluation import cal_ami, cal_f1score, cal_precision

        real = self._real_labels()
        assert cal_ami(real, real) == pytest.approx(1.0)
        assert cal_f1score(real, real) == pytest.approx(1.0)
        assert cal_precision(real, real) == pytest.approx(1.0)
        # a shifted prediction scores worse
        assert cal_precision(real, np.roll(real, 5, axis=0)) < 1.0


class TestTheming:
    def test_rcparams_and_shifted_cmap(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from spateo_tpu.configuration import config_spateo_rcParams, set_pub_style, shiftedColorMap

        config_spateo_rcParams(fontsize=9)
        assert matplotlib.rcParams["axes.grid"] is True
        set_pub_style(scaler=2)
        assert matplotlib.rcParams["axes.labelsize"] == 16
        cm = shiftedColorMap(plt.get_cmap("coolwarm"), midpoint=0.75, name="t_shift")
        mid = np.asarray(cm(0.75))
        assert abs(mid[0] - mid[2]) < 0.05  # near-neutral at the new center


class TestAuxsegInteractive:
    """The preprocessing/auxseg stateful tracer (reference auxseg.py:8):
    LineDDA rasterization, contour filling, and the committed-segment undo
    semantics, driven through synthetic matplotlib events."""

    class _Ev:
        def __init__(self, x, y, key=None):
            self.xdata, self.ydata, self.key = x, y, key

    def _tracer(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from spateo_tpu.preprocessing.auxseg import LiveWireSegmentation

        img = np.zeros((30, 30))
        img[8:22, 8:22] = 1.0
        plt.figure()
        plt.imshow(img)
        return LiveWireSegmentation(image=img)

    def test_linedda_and_fill(self):
        from spateo_tpu.preprocessing.auxseg import LiveWireSegmentation

        line = LiveWireSegmentation.LineDDA((0, 0), (5, 10))
        assert tuple(line[0]) == (0, 0) and tuple(line[-1]) == (5, 10)
        sq = np.array(
            [[r, 5] for r in range(5, 15)] + [[r, 14] for r in range(5, 15)]
            + [[5, c] for c in range(5, 15)] + [[14, c] for c in range(5, 15)]
        )
        assert len(LiveWireSegmentation.fill_contours(sq)) == 100

    def test_undo_removes_committed_segment_not_preview(self):
        import matplotlib.pyplot as plt

        lw = self._tracer()
        lw.button_pressed(self._Ev(5, 5))
        lw.mouse_moved(self._Ev(20, 5))  # preview becomes the committed path
        lw.button_pressed(self._Ev(20, 5))  # commit
        committed = len(lw.path_list)
        assert committed > 0
        lw.mouse_moved(self._Ev(6, 6))  # NEW live preview of different length
        lw.key_pressed(self._Ev(0, 0, key="ctrl+z"))
        assert len(lw.path_list) == 0
        plt.close("all")

    def test_closing_loop_fills_rst(self):
        import matplotlib.pyplot as plt

        lw = self._tracer()
        pts = [(10, 10), (10, 20), (20, 20), (20, 10)]
        for x, y in pts:
            lw.button_pressed(self._Ev(x, y))
            lw.mouse_moved(self._Ev(x, y))
        # next click within 2 px of the start closes and fills
        lw.mouse_moved(self._Ev(10, 11))
        lw.button_pressed(self._Ev(10, 11))
        assert lw.rst is not None and len(lw.rst) > 10
        plt.close("all")


class TestBivariateMoran:
    """Bivariate Moran (reference tools/spatial_correlation.py:12-282, which
    delegates to esda Moran_BV / Moran_Local_BV — the statistics are pinned
    here against literal NumPy transcriptions of esda's definitions)."""

    @staticmethod
    def _adata(n=60, g=4, seed=3):
        import spateo_tpu.core as core
        from scipy.sparse import csr_matrix

        rng = np.random.default_rng(seed)
        coords = rng.uniform(0, 10, (n, 2))
        # smooth spatial signal + gene tracking it (positive bv Moran)
        sig = np.sin(coords[:, 0] / 3.0) + coords[:, 1] / 10.0
        X = rng.poisson(1.0, (n, g)).astype(float)
        X[:, 0] += 3 * sig - 3 * sig.min()
        a = core.AnnData(
            X=X,
            obs=pd.DataFrame({"sig": sig}, index=[f"c{i}" for i in range(n)]),
            var=pd.DataFrame(index=[f"g{j}" for j in range(g)]),
        )
        a.obsm["spatial"] = coords
        a.uns["__type"] = "UMI"
        # explicit kNN connectivities (row-standardized inside the function)
        d2 = ((coords[:, None] - coords[None]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        W = np.zeros((n, n))
        nn = np.argsort(d2, axis=1)[:, :6]
        for i in range(n):
            W[i, nn[i]] = 1.0
        a.obsp["spatial_connectivities"] = csr_matrix(W)
        return a, W

    def test_global_bv_matches_esda_definition(self):
        a, W = self._adata()
        from spateo_tpu.tools.spatial_correlation import spatial_bv_moran_obs_genes

        df = spatial_bv_moran_obs_genes(a, "sig", genes=["g0", "g1"], permutations=199, copy=True)
        assert list(df.index) == ["g0", "g1"]
        assert {"I", "EI_sim", "pval_sim", "pval_z_sim", "z_sim"} <= set(df.columns)

        # literal esda Moran_BV: I = zx' W_rowstd zy / (n - 1), ddof=1
        x = np.asarray(a.X[:, 0]).ravel()
        y = np.asarray(a.obs["sig"].values, float)
        Wr = W / W.sum(1, keepdims=True)
        zx = (x - x.mean()) / x.std(ddof=1)
        zy = (y - y.mean()) / y.std(ddof=1)
        I_expect = float(zx @ (Wr @ zy)) / (len(x) - 1)
        assert np.isclose(df.loc["g0", "I"], I_expect, atol=1e-10)
        # the tracking gene is significantly spatially co-varying
        assert df.loc["g0", "I"] > 0.2 and df.loc["g0", "pval_sim"] < 0.05

        # uns storage contract
        spatial_bv_moran_obs_genes(a, "sig", genes="g0", permutations=None)
        stored = a.uns["sig_gene_bv_moranI"]
        assert list(stored.columns) == ["I"] and np.isclose(stored.loc["g0", "I"], I_expect)

    def test_local_bv_statistics_and_quadrants(self):
        a, W = self._adata()
        from spateo_tpu.tools.spatial_correlation import spatial_bv_local_moran

        df = spatial_bv_local_moran(a, "g0", "sig", permutations=99, copy=True)
        assert len(df) == a.n_obs
        assert {"I", "q", "EI_sim", "pval_sim", "pval_z_sim", "z_sim"} <= set(df.columns)

        # literal esda Moran_Local_BV: I_i = (n-1) zx_i (W zy)_i / sum(zx^2), ddof=0
        x = np.asarray(a.X[:, 0]).ravel()
        y = np.asarray(a.obs["sig"].values, float)
        Wr = W / W.sum(1, keepdims=True)
        zx = (x - x.mean()) / x.std()
        zy = (y - y.mean()) / y.std()
        lag = Wr @ zy
        Is = (len(x) - 1) * zx * lag / (zx * zx).sum()
        np.testing.assert_allclose(df["I"].values, Is, atol=1e-10)
        # quadrant codes: 1 HH, 2 LH, 3 LL, 4 HL
        q = np.where((zx > 0) & (lag > 0), 1, np.where((zx <= 0) & (lag > 0), 2, np.where((zx <= 0) & (lag <= 0), 3, 4)))
        np.testing.assert_array_equal(df["q"].values, q)
        # storage contract
        spatial_bv_local_moran(a, "g0", "sig", permutations=49)
        assert "g0_sig_bv_local_moranI" in a.uns

    def test_input_validation(self):
        a, _ = self._adata()
        from spateo_tpu.tools.spatial_correlation import spatial_bv_local_moran, spatial_bv_moran_obs_genes

        with pytest.raises(ValueError, match="Only 'moran'"):
            spatial_bv_moran_obs_genes(a, "sig", mode="geary")
        with pytest.raises(KeyError):
            spatial_bv_moran_obs_genes(a, "missing")
        with pytest.raises(KeyError):
            spatial_bv_local_moran(a, "missing", "sig")
