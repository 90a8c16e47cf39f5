"""Plotting-layer tests: each plot path renders to an Agg canvas and we
assert on the artists it created (reference test model: smoke + structure,
spateo's tests don't pixel-compare either)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

import spateo_tpu as st
import spateo_tpu.plotting as pl
from spateo_tpu.plotting.three_d_plot.three_dims_plots import (
    plot_expression_3D,
    plot_multiple_genes_3D,
    quick_plot_3D_celltypes,
    visualize_3D_increasing_direction_gradient,
)


@pytest.fixture(autouse=True)
def _close_figs():
    yield
    plt.close("all")


@pytest.fixture()
def adata():
    rng = np.random.default_rng(0)
    n = 300
    X = rng.poisson(2.0, (n, 5)).astype(np.float32)
    a = st.AnnData(
        X=X,
        obs=pd.DataFrame({"leiden": rng.choice(["a", "b", "c"], n)}, index=[f"c{i}" for i in range(n)]),
        var=pd.DataFrame(index=[f"g{j}" for j in range(5)]),
    )
    a.obsm["spatial"] = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    st.SKM.init_adata_type(a, "UMI")
    return a


class TestScattersSpace:
    def test_scatters_categorical_and_gene(self, adata):
        ax = pl.scatters(adata, basis="spatial", color="leiden", save_show_or_return="return")
        assert len(ax.collections) >= 3  # one PathCollection per category

        ax2 = pl.scatters(adata, basis="spatial", color="g0", save_show_or_return="return")
        assert len(ax2.collections) >= 1

    def test_space_figsize_and_stack(self, adata):
        axes = pl.space(adata, genes=["g0", "g1"], save_show_or_return="return")
        assert len(axes) == 2
        ax = pl.space(adata, genes=["g0", "g1"], stack_genes=True, save_show_or_return="return")
        assert ax.get_legend() is not None

    def test_plot_vectors_quiver(self, adata):
        _, ax = plt.subplots()
        V = np.random.default_rng(1).normal(size=(adata.n_obs, 2))
        pl.plot_vectors(ax, adata.obsm["spatial"], V, method="cell")
        from matplotlib.quiver import Quiver

        assert any(isinstance(c, Quiver) for c in ax.get_children())


class TestAgg:
    def test_imshow_and_qc(self):
        rng = np.random.default_rng(0)
        img = rng.poisson(1.0, (40, 50)).astype(np.float32)
        a = st.AnnData(X=img, obs=pd.DataFrame(index=[str(i) for i in range(40)]), var=pd.DataFrame(index=[str(j) for j in range(50)]))
        st.SKM.init_adata_type(a, "AGG")
        fig, ax = pl.imshow(a, save_show_or_return="return")
        assert ax.get_images()[0].get_array().shape == (40, 50)

        from spateo_tpu.segmentation.qc import select_qc_regions

        select_qc_regions(a, n=2, size=10)
        fig, ax = pl.box_qc_regions(a, save_show_or_return="return")
        assert len(ax.patches) == 2
        axes = pl.qc_regions(a, save_show_or_return="return")
        assert len(axes) == 2

    def test_imshow_rejects_umi(self, adata):
        with pytest.raises(ValueError):
            pl.imshow(adata)


class TestAlign:
    def test_slices_2d_and_overlay(self, adata):
        b = adata.copy() if hasattr(adata, "copy") else adata
        axes = pl.slices_2d([adata, b], label_key="leiden", save_show_or_return="return")
        assert len(axes) == 2
        axes = pl.overlay_slices_2d([adata, b], save_show_or_return="return")
        assert len(axes) == 2  # one panel per slice (reference align.py:445)
        axes = pl.multi_slices([adata, b], label="leiden", spatial_key="spatial", save_show_or_return="return")
        # reference semantics: one panel per slice (FacetGrid -> grid)
        assert len(axes) == 2 and all(a.collections for a in axes)

    def test_multi_slices_gene_colorbar(self, adata):
        b = adata.copy()
        axes = pl.multi_slices([adata, b], label="g0", spatial_key="spatial", save_show_or_return="return")
        fig = axes[0].figure
        # shared numeric colorbar beside the top-right panel: the inset
        # cax adds one axes beyond the two slice panels
        assert len(fig.axes) == 3

    def test_deformation_grid(self, adata):
        adata.obsm["align_spatial"] = np.asarray(adata.obsm["spatial"]) + 1.0
        ax = pl.plot_deformation_grid(
            adata, "align_spatial", "spatial", "leiden",
            predict_func=lambda x: x + 1.0, point_size=2, grid_num=5,
        )
        assert len(ax.lines) == 10  # 5 horizontal + 5 vertical grid lines


class TestDotplot:
    def test_dotplot_basic(self, adata):
        ax = pl.dotplot(adata, var_names=["g0", "g1", "g2"], cat_key="leiden", save_show_or_return="return")
        sc = ax.collections[0]
        assert sc.get_offsets().shape[0] == 9  # 3 genes x 3 groups

    def test_dotplot_dendrogram_orders_rows(self, adata):
        ax = pl.dotplot(adata, var_names=["g0", "g1"], cat_key="leiden", dendrogram=True, save_show_or_return="return")
        assert f"dendrogram_leiden" in adata.uns

    def test_dotplot_color_on_square_changes_artists(self, adata):
        """color_on='square' renders a QuadMesh behind edge-only dots
        (reference dotplot.py style(color_on='square'))."""
        from matplotlib.collections import QuadMesh

        ax_dot = pl.dotplot(adata, var_names=["g0", "g1", "g2"], cat_key="leiden", save_show_or_return="return")
        ax_sq = pl.dotplot(adata, var_names=["g0", "g1", "g2"], cat_key="leiden",
                           color_on="square", save_show_or_return="return")
        assert not any(isinstance(c, QuadMesh) for c in ax_dot.collections)
        meshes = [c for c in ax_sq.collections if isinstance(c, QuadMesh)]
        assert len(meshes) == 1
        # the dot layer is edge-only (transparent faces)
        sc = [c for c in ax_sq.collections if not isinstance(c, QuadMesh)][0]
        assert sc.get_facecolor().size == 0 or np.all(sc.get_facecolor()[:, 3] == 0)

    def test_dotplot_size_exponent_changes_dot_sizes(self, adata):
        ax1 = pl.dotplot(adata, var_names=["g0", "g1"], cat_key="leiden",
                         size_exponent=1.0, save_show_or_return="return")
        ax3 = pl.dotplot(adata, var_names=["g0", "g1"], cat_key="leiden",
                         size_exponent=3.0, save_show_or_return="return")
        s1 = np.asarray(ax1.collections[0].get_sizes())
        s3 = np.asarray(ax3.collections[0].get_sizes())
        # exponent > 1 shrinks sub-maximal dots, leaves the max fixed
        assert np.isclose(s1.max(), s3.max(), rtol=1e-6)
        mid = (s1 > s1.max() * 0.05) & (s1 < s1.max() * 0.95)
        assert mid.any() and np.all(s3[mid] < s1[mid])

    def test_dotplot_smallest_dot_floors_sizes(self, adata):
        ax = pl.dotplot(adata, var_names=["g0", "g1"], cat_key="leiden",
                        smallest_dot=40.0, save_show_or_return="return")
        assert np.asarray(ax.collections[0].get_sizes()).min() >= 40.0 - 1e-9

    def test_dotplot_size_legend_toggle(self, adata):
        ax_on = pl.dotplot(adata, var_names=["g0"], cat_key="leiden", save_show_or_return="return")
        ax_off = pl.dotplot(adata, var_names=["g0"], cat_key="leiden",
                            show_size_legend=False, save_show_or_return="return")
        assert ax_on.get_legend() is not None
        assert ax_off.get_legend() is None

    def test_dotplot_grid_and_dendrogram_panel(self, adata):
        ax = pl.dotplot(adata, var_names=["g0", "g1"], cat_key="leiden",
                        grid=True, save_show_or_return="return")
        assert any(gl.get_visible() for gl in ax.get_xgridlines())
        # the dendrogram renders as a side panel sharing the category axis
        from spateo_tpu.plotting.dotplot import Dotplot

        dp = Dotplot(adata=adata, var_names=["g0", "g1"], cat_key="leiden")
        dp.add_dendrogram()
        dp.make_figure()
        assert "group_extra_ax" in dp.ax_dict
        assert len(dp.ax_dict["group_extra_ax"].lines) > 0


class TestInteractions:
    def test_ligrec(self, adata):
        pairs = ["L1-R1", "L2-R2", "L3-R3"]
        cols = ["a|b", "b|c"]
        rng = np.random.default_rng(0)
        adata.uns["cci"] = {
            "means": pd.DataFrame(rng.uniform(0.1, 2.0, (3, 2)), index=pairs, columns=cols),
            "pvalues": pd.DataFrame(rng.uniform(0, 0.2, (3, 2)), index=pairs, columns=cols),
        }
        ax = pl.ligrec(adata, "cci", alpha=0.05, save_show_or_return="return")
        assert ax.collections  # dots rendered

    def test_plot_connections(self, adata):
        fig, axes = pl.plot_connections(adata, "leiden", n_spatial_neighbors=5, save_show_or_return="return")
        assert len(axes) == 1
        assert len(axes[0].patches) > 0  # squares drawn

    def test_ligrec_alpha_controls_rings(self, adata):
        """The significance rings (open circles over dots) follow the alpha
        threshold — a data-presentation option, not just render-smoke."""
        pairs = ["L1-R1", "L2-R2", "L3-R3"]
        cols = ["a|b", "b|c"]
        pv = np.array([[0.001, 0.5], [0.5, 0.5], [0.02, 0.5]])
        adata.uns["cci2"] = {
            "means": pd.DataFrame(np.ones((3, 2)), index=pairs, columns=cols),
            "pvalues": pd.DataFrame(pv, index=pairs, columns=cols),
        }

        def n_rings(alpha):
            ax = pl.ligrec(adata, "cci2", alpha=alpha, save_show_or_return="return")
            rings = [c for c in ax.collections
                     if c.get_offsets().shape[0] and c.get_facecolor().size == 0]
            return sum(c.get_offsets().shape[0] for c in rings)

        assert n_rings(0.01) == 1  # only the 0.001 entry
        assert n_rings(0.05) == 2  # 0.001 and 0.02

    def test_ligrec_dendrogram_reorders_rows(self, adata):
        rng = np.random.default_rng(1)
        pairs = [f"L{i}-R{i}" for i in range(6)]
        cols = ["a|b", "b|c", "c|a"]
        adata.uns["cci3"] = {
            "means": pd.DataFrame(rng.uniform(0.1, 2.0, (6, 3)), index=pairs, columns=cols),
            "pvalues": pd.DataFrame(rng.uniform(0, 0.5, (6, 3)), index=pairs, columns=cols),
        }
        ax0 = pl.ligrec(adata, "cci3", save_show_or_return="return")
        ax1 = pl.ligrec(adata, "cci3", dendrogram="interacting_molecules", save_show_or_return="return")
        labels0 = [t.get_text() for t in ax0.get_yticklabels()]
        labels1 = [t.get_text() for t in ax1.get_yticklabels()]
        assert sorted(labels0) == sorted(labels1)
        assert labels0 != labels1  # clustering changed the row order

    def test_plot_connections_heatmap_vs_shapes(self, adata):
        fig, axes = pl.plot_connections(adata, "leiden", n_spatial_neighbors=5,
                                        shapes_style=False, save_show_or_return="return")
        assert len(axes[0].get_images()) == 1  # heatmap, not patches
        assert len(axes[0].patches) == 0

    def test_plot_connections_zero_self(self, adata):
        fig, axes = pl.plot_connections(adata, "leiden", n_spatial_neighbors=5,
                                        zero_self_connections=False, normalize_by_self_connections=False,
                                        shapes_style=False, save_show_or_return="return")
        M_with = np.asarray(axes[0].get_images()[0].get_array())
        fig, axes0 = pl.plot_connections(adata, "leiden", n_spatial_neighbors=5,
                                         zero_self_connections=True,
                                         shapes_style=False, save_show_or_return="return")
        M_zero = np.asarray(axes0[0].get_images()[0].get_array())
        assert np.allclose(np.diag(M_zero), 0)
        assert np.diag(M_with).sum() > 0


class TestGlmLisaPolarity:
    def test_glm_plots(self, adata):
        xs = np.linspace(0, 1, 50)
        corr = {"g0": pd.DataFrame({"torsion": xs, "expression": 2 * xs + 0.1})}
        adata.uns["glm_degs"] = {"glm_result": pd.DataFrame(index=["g0"]), "correlation": corr}
        axes = pl.glm_fit(adata, genes="g0", feature_x="torsion", save_show_or_return="return")
        assert axes[0].lines  # fitted trend drawn
        ax = pl.glm_heatmap(adata, genes="g0", feature_x="torsion", save_show_or_return="return")
        assert ax.get_images()

    def test_lisa_panels(self):
        rng = np.random.default_rng(0)
        df = pd.DataFrame({
            "x": rng.uniform(0, 10, 100), "y": rng.uniform(0, 10, 100),
            "exp_zscore": rng.normal(size=100), "w_exp_zscore": rng.normal(size=100),
            "Is": rng.normal(size=100),
            "labels": rng.choice(["Q1", "Q2", "Q3", "Q4"], 100),
            "sig": rng.choice([0, 1], 100),
            "group": rng.choice(["0 ns", "1 hot spot"], 100),
        })
        ax = pl.lisa_quantiles(df)
        assert ax.lines  # regression + axlines
        axs = pl.lisa(df)
        assert len(axs) == 4

    def test_polarity(self, adata):
        adata.obs["region"] = np.random.default_rng(0).integers(0, 5, adata.n_obs)
        ax = pl.polarity(adata, {"anno": ["g0"]}, "region", mode="exp")
        assert ax.lines


class TestGeoNetwork:
    def test_geo_fallback_squares(self, adata):
        ax = pl.geo(adata, color="leiden", save_show_or_return="return")
        assert ax.collections  # PolyCollection added
        ax = pl.color_label(adata, save_show_or_return="return")
        assert ax.collections

    def test_plot_network(self):
        import networkx as nx

        G = nx.DiGraph()
        G.add_edge("A", "B", weight=2.0)
        G.add_edge("B", "C", weight=1.0)
        ax = pl.plot_network(G, title="t", layout="circular", edge_thickness_attr="weight", save_show_or_return="return")
        assert ax.get_title() == "t"


class TestThreeD:
    def _ball(self):
        rng = np.random.default_rng(0)
        pts = rng.normal(size=(200, 3))
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        return pts

    def test_three_d_plot_mesh_and_points(self):
        from spateo_tpu.tdr.models.mesh_core import PointCloud

        pc = PointCloud(self._ball(), {"val": np.arange(200.0)})
        fig = pl.three_d_plot(pc, key="val", model_style="points")
        assert fig.axes[0].collections

        mesh, _, _ = st.tdr.construct_surface(PointCloud(self._ball() * 0.9), smooth=2)
        fig = pl.three_d_plot(mesh, model_style="surface")
        assert fig.axes[0].collections

    def test_multi_and_morphometrics(self, tmp_path):
        from spateo_tpu.tdr.models.mesh_core import PointCloud

        rng = np.random.default_rng(0)
        X = rng.uniform(-1, 1, (150, 3)).astype(np.float32)
        V = np.cross(np.broadcast_to([0.0, 0.0, 1.0], X.shape), X).astype(np.float32)
        a = st.AnnData(X=np.ones((150, 3), dtype=np.float32))
        st.SKM.init_adata_type(a, "UMI")
        a.obsm["align_spatial"] = X
        a.obsm["V_mapping"] = V
        st.tdr.morphofield_sparsevfc(a, spatial_key="align_spatial", V_key="V_mapping", NX=X[:5], M=50, restart_num=1, min_vel_corr=-1)
        st.tdr.morphofield_curl(a)
        pc = PointCloud(X)
        fig = pl.curl(a, pc, model_style="points")
        assert fig.axes[0].collections
        out = pl.curl(a, pc, model_style="points", filename=str(tmp_path / "curl.png"))
        assert (tmp_path / "curl.png").exists()

    def test_missing_key_raises(self):
        from spateo_tpu.tdr.models.mesh_core import PointCloud

        a = st.AnnData(X=np.ones((5, 2), dtype=np.float32))
        st.SKM.init_adata_type(a, "UMI")
        with pytest.raises(KeyError):
            pl.divergence(a, PointCloud(np.zeros((5, 3))))

    def test_pi_heatmap_and_mapping(self):
        rng = np.random.default_rng(0)
        a = st.AnnData(X=np.ones((30, 2), dtype=np.float32))
        b = st.AnnData(X=np.ones((25, 2), dtype=np.float32))
        for x in (a, b):
            st.SKM.init_adata_type(x, "UMI")
        a.obsm["align_spatial"] = rng.uniform(0, 1, (30, 2))
        b.obsm["align_spatial"] = rng.uniform(0, 1, (25, 2))
        P = rng.uniform(0, 1, (30, 25))
        ax = pl.pi_heatmap(P, save_show_or_return="return")
        assert ax.get_images()
        fig, mapping = pl.pairwise_mapping(adataA=a, adataB=b, pi=P, distance=3.0)
        # one line per A cell: optimal partner deduplicated to highest pi
        assert len(fig.axes[0].lines) == 30
        assert mapping["index_x"].is_unique
        np.testing.assert_array_equal(mapping["index_y"].values, np.argmax(P, axis=1))

    def test_pi_heatmap_lexsort_and_mapping_offset(self):
        from spateo_tpu.plotting.three_d_plot.pairwise_align_plots import _lexsort_pi

        P = np.array([[0.0, 0.9, 0.1], [0.8, 0.1, 0.1], [0.1, 0.0, 0.9]])
        S = _lexsort_pi(P)
        # same multiset of entries, rows/cols reordered (ref :59-60)
        assert sorted(S.ravel()) == sorted(P.ravel())
        ref = P.T[np.lexsort(P[::-1, :])].T
        ref = ref[np.lexsort(ref[:, ::-1].T)]
        np.testing.assert_array_equal(S, ref)


class TestInteractive:
    def test_contours_and_select_polygon(self):
        rng = np.random.default_rng(0)
        img = rng.poisson(1.0, (40, 50)).astype(np.float32)
        a = st.AnnData(X=img, obs=pd.DataFrame(index=[str(i) for i in range(40)]), var=pd.DataFrame(index=[str(j) for j in range(50)]))
        st.SKM.init_adata_type(a, "AGG")
        bins = np.zeros((40, 50), np.float32)
        bins[5:15, 5:20] = 1
        bins[20:35, 25:45] = 2
        a.layers["X_bins"] = bins

        from spateo_tpu.plotting.interactive import contours, select_polygon

        fig = contours(a, "X_bins")
        assert fig.axes[0].collections  # one scatter per bin boundary

        sel = select_polygon(a, "X")
        sel.onselect([(5, 5), (25, 5), (25, 20), (5, 20)])
        mask = np.asarray(a.layers["X_selection"])
        assert mask[10, 10] and not mask[35, 45]
        assert 250 < mask.sum() < 400

    def test_cellbin_select_and_type_guard(self):
        from spateo_tpu.errors import PlottingError
        from spateo_tpu.plotting.interactive import cellbin_select, contours

        u = st.sample_data.synthetic(n_cells=300, seed=0)
        sel, cb = cellbin_select(u, binsize=10, return_all=True)
        assert st.SKM.get_adata_type(cb) == "AGG"
        with pytest.raises(PlottingError):
            contours(u, "X")


class TestPairwiseIterationRender:
    def test_full_iteration_trace_renders(self, tmp_path):
        """The full per-iteration Morpho trace (reference iter_added dict)
        drives the pairwise_iteration animation and panel."""
        rng = np.random.default_rng(0)
        n = 80
        pts = rng.uniform(0, 10, (n, 2)).astype(np.float32)
        X = rng.poisson(2.0, (n, 8)).astype(np.float32)

        def mk(p):
            a = st.AnnData(X=X.copy(), obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
                           var=pd.DataFrame(index=[f"g{j}" for j in range(8)]))
            a.obsm["spatial"] = p
            st.SKM.init_adata_type(a, "UMI")
            return a

        A, B = mk(pts + 0.3), mk(pts)
        aligned, _ = st.align.morpho_align([B, A], iter_key_added="iter_spatial", max_iter=12, verbose=False)
        from spateo_tpu.plotting.three_d_plot.pairwise_align_plots import (
            pairwise_iteration,
            pairwise_iteration_panel,
        )

        gif = pairwise_iteration(aligned[1], aligned[0], filename=str(tmp_path / "it.gif"), fps=5)
        assert (tmp_path / "it.gif").exists()
        fig = pairwise_iteration_panel(aligned[1], aligned[0], ncols=3)
        assert fig is not None


class TestScattersOptions:
    """Reference scatters.py option surface: highlights, themes, smoothing,
    outlining, 3d projection, affine pre-transform, vector-field overlay."""

    def _ad(self):
        rng = np.random.default_rng(0)
        n, g = 200, 6
        ad = st.AnnData(
            X=rng.poisson(2, (n, g)).astype(float),
            obs=pd.DataFrame({"leiden": rng.choice(["0", "1", "2"], n)}, index=[f"c{i}" for i in range(n)]),
            var=pd.DataFrame(index=[f"g{j}" for j in range(g)]),
        )
        ad.obsm["spatial"] = rng.uniform(0, 10, (n, 2))
        ad.obsm["spatial3d"] = rng.uniform(0, 10, (n, 3))
        ad.uns["__type"] = "UMI"
        return ad, rng

    def test_highlights_greys_out(self):
        ad, _ = self._ad()
        ax = st.pl.scatters(ad, color="leiden", basis="spatial", highlights=["0"], save_show_or_return="return")
        labels = {t.get_text() for t in ax.texts}
        assert "other" in labels and "0" in labels
        plt.close("all")

    def test_explicit_values_and_labels(self, ):
        ad, rng = self._ad()
        st.pl.scatters(ad, basis="spatial", values=list(rng.normal(0, 1, ad.n_obs)), save_show_or_return="return")
        st.pl.scatters(ad, basis="spatial", labels=list(rng.choice(["a", "b"], ad.n_obs)), save_show_or_return="return")
        plt.close("all")

    def test_smooth_reduces_variance(self):
        ad, rng = self._ad()
        from spateo_tpu.plotting.scatters import _neighbor_smooth

        v = rng.normal(0, 1, ad.n_obs)
        sm = _neighbor_smooth(np.asarray(ad.obsm["spatial"]), v, 2)
        assert sm.std() < v.std()

    def test_3d_projection_and_affine(self):
        ad, _ = self._ad()
        st.pl.scatters(ad, color="g1", basis="spatial3d", projection="3d", save_show_or_return="return")
        st.pl.scatters(ad, color="g1", basis="spatial", affine_transform_degree=90, save_show_or_return="return")
        plt.close("all")

    def test_vf_overlay_and_return_all(self):
        ad, rng = self._ad()
        V = rng.normal(0, 1, (ad.n_obs, 2))
        fig, axes = st.pl.scatters(ad, color="g1", basis="spatial", V=V, return_all=True)
        assert fig is not None
        st.pl.scatters(ad, color="g1", basis="spatial", V=V, vf_plot_method="stream", save_show_or_return="return")
        plt.close("all")

    def test_frontier_contour_theme(self):
        ad, _ = self._ad()
        st.pl.scatters(ad, color="g1", basis="spatial", frontier=True, contour=True, theme="fire", save_show_or_return="return")
        st.pl.scatters(ad, color="leiden", basis="spatial", color_key_cmap="tab10", save_show_or_return="return")
        plt.close("all")


class TestDotplotVarGroups:
    def test_var_group_brackets_drawn(self, adata):
        """var_group_positions/labels render bracket lines + labels in a
        dedicated gene-group axis (reference dotplot.py:1224)."""
        from spateo_tpu.plotting.dotplot import Dotplot

        dp = Dotplot(adata=adata, var_names=["g0", "g1", "g2"], cat_key="leiden",
                     var_group_positions=[(0, 1), (2, 2)], var_group_labels=["ab", "c"])
        dp.make_figure()
        assert "gene_group_ax" in dp.ax_dict
        gax = dp.ax_dict["gene_group_ax"]
        assert len(gax.lines) == 2  # one bracket per group
        assert [t.get_text() for t in gax.texts] == ["ab", "c"]
        # front-end pass-through
        ax = pl.dotplot(adata, var_names=["g0", "g1", "g2"], cat_key="leiden",
                        var_group_positions=[(0, 2)], var_group_labels=["all"],
                        save_show_or_return="return")
        fig = ax.figure
        assert any(len(a.texts) and a.texts[0].get_text() == "all" for a in fig.axes)


class TestSlices2DOptions:
    def test_limits_and_scalar_sort(self, adata):
        """slices_2d x/y limits clamp the axes; sort_values controls the
        scalar draw order (high values on top by default) — reference
        align.py:24 options."""
        axes = pl.slices_2d([adata], label_key="g0", x_min=0, x_max=50, y_min=10, y_max=60,
                            ticks_off=False, save_show_or_return="return")
        ax = axes[0]
        assert ax.get_xlim() == (0.0, 50.0)
        assert ax.get_ylim() == (10.0, 60.0)
        # scalar color array is ascending when sort_values=True
        vals = np.asarray(ax.collections[0].get_array())
        assert np.all(np.diff(vals) >= 0)
        axes_d = pl.slices_2d([adata], label_key="g0", sort_ascending=False, save_show_or_return="return")
        vals_d = np.asarray(axes_d[0].collections[0].get_array())
        assert np.all(np.diff(vals_d) <= 0)


class TestNetworkTraces:
    """PlotNetwork trace API (reference networks.py:44-417): plotly-shaped
    trace dicts with the reference's size/color/style semantics, composited
    with matplotlib; hover callbacks are pure data transforms."""

    def _graph(self):
        import networkx as nx

        G = nx.Graph()
        G.add_node("A", score=3.0)
        G.add_node("B", score=1.0)
        G.add_node("C", score=2.0)
        G.add_edge("A", "B", kind="act", weight=2.0)
        G.add_edge("B", "C", kind="inh", weight=1.0)
        return G

    def test_node_trace_semantics(self):
        from spateo_tpu.plotting.networks import PlotNetwork

        pn = PlotNetwork(self._graph(), layout="circular")
        tr = pn.generate_node_traces(
            "YlGnBu", "deg", "degree", node_label="score", node_text=["score"],
            node_label_size=8, node_label_position="top center", node_opacity=0.8,
            size_method="degree",
        )
        # degree sizing: degree + 12 (reference networks.py:119)
        assert tr["marker"]["size"] == [d + 12 for _, d in pn.G.degree()]
        assert tr["marker"]["color"] == [d for _, d in pn.G.degree()]
        assert "Degree:" in tr["hovertext"][0] and "score:" in tr["hovertext"][0]
        # static sizing and attribute coloring
        tr2 = pn.generate_node_traces(
            "YlGnBu", "", "score", None, None, 8, "top center", 0.8, "static",
        )
        assert set(tr2["marker"]["size"]) == {28}
        assert tr2["marker"]["color"] == [3.0, 1.0, 2.0]

    def test_edge_traces_styles_and_thickness(self):
        from spateo_tpu.plotting.networks import PlotNetwork

        pn = PlotNetwork(self._graph(), layout="circular")
        edges, mid = pn.generate_edge_traces(
            "kind", 8, "middle center", edge_text=["weight"],
            edge_attribute_for_thickness="weight", add_text=True,
        )
        assert len(edges) == 2
        # two distinct linestyles for the two 'kind' values
        assert len({e["line"]["dash"] for e in edges}) == 2
        # thickness = (2*weight)^2 (reference networks.py:213)
        ws = sorted(e["line"]["width"] for e in edges)
        assert ws == [4.0, 16.0]
        # invisible mid-edge label nodes at segment midpoints with hovertext
        assert len(mid["x"]) == 2 and mid["mode"] == "markers+text"
        assert all("weight:" in t for t in mid["hovertext"])

    def test_figure_compositing_and_hover(self):
        from spateo_tpu.plotting.networks import PlotNetwork

        pn = PlotNetwork(self._graph(), layout="circular")
        node_tr = pn.generate_node_traces(
            "YlGnBu", "deg", "degree", None, None, 8, "top center", 0.8, "degree",
        )
        edges, mid = pn.generate_edge_traces(None, 8, "middle center", None)
        fig = pn.generate_figure(
            node_tr, edges, mid, "net", 14, 2.0,
            transparent_background=True, highlight_neighbors_on_hover=True,
        )
        assert pn.ax.get_title() == "net"
        assert fig.patch.get_alpha() == 0.0
        assert len(pn.ax.collections) >= 1  # node scatter

        # hover over node A: only A and its neighbor B keep their colors
        nodes = list(pn.pos_dict)
        iA = nodes.index("A")
        pos_A = pn.pos_dict["A"]
        hovered = pn.on_hover(node_tr, {"point_inds": [iA], "xs": [pos_A[0]], "ys": [pos_A[1]]})
        colors = hovered["marker"]["color"]
        assert colors[nodes.index("C")] == "#E4E4E4"
        assert colors[iA] != "#E4E4E4" and colors[nodes.index("B")] != "#E4E4E4"
        restored = pn.on_unhover(node_tr)
        assert restored["marker"]["color"] == pn.original_node_trace["marker"]["color"]

    def test_digraph_arrowheads(self):
        import networkx as nx

        from spateo_tpu.plotting.networks import PlotNetwork

        G = nx.DiGraph()
        G.add_edge("A", "B")
        G.add_edge("B", "C")
        pn = PlotNetwork(G, layout="circular")
        node_tr = pn.generate_node_traces("YlGnBu", "", "degree", None, None, 8, "top center", 0.8, "degree")
        edges, mid = pn.generate_edge_traces(None, 8, "middle center", None)
        pn.generate_figure(node_tr, edges, mid, "", 12, 2.0, False, False)
        from matplotlib.text import Annotation

        arrows = [a for a in pn.ax.get_children() if isinstance(a, Annotation) and a.arrowprops]
        assert len(arrows) == 2  # one arrowhead per directed edge


class TestDotplotMethods:
    def test_swap_axes_method_transposes(self, adata):
        from spateo_tpu.plotting.dotplot import Dotplot

        dp = Dotplot(adata, var_names=["g0", "g1", "g2", "g3"], cat_key="leiden")
        assert dp.swap_axes() is dp  # chainable (reference dotplot.py:507)
        dp.make_figure()
        # swapped: x axis carries the 3 categories, y the 4 genes
        assert len(dp.ax.get_xticklabels()) == 3
        assert len(dp.ax.get_yticklabels()) == 4

    def test_get_axes_builds_figure(self, adata):
        from spateo_tpu.plotting.dotplot import Dotplot

        dp = Dotplot(adata, var_names=["g0", "g1"], cat_key="leiden")
        axd = dp.get_axes()
        assert "mainplot_ax" in axd and dp.fig is axd["mainplot_ax"].figure

    def test_reorder_categories_after_dendrogram(self, adata):
        from spateo_tpu.plotting.dotplot import Dotplot

        dp = Dotplot(adata, var_names=["g0", "g1", "g2"], cat_key="leiden")
        before = list(dp.dot_color_df.index)
        key = dp.reorder_categories_after_dendrogram()
        assert key in adata.uns
        order = [c for c in adata.uns[key]["categories_ordered"] if c in before]
        assert list(dp.dot_color_df.index) == order
        assert list(dp.dot_size_df.index) == order

    def test_swapped_dendrogram_panel_on_top(self, adata):
        ax = pl.dotplot(adata, var_names=["g0", "g1"], cat_key="leiden",
                        dendrogram=True, swap_axes=True, save_show_or_return="return")
        fig = ax.figure
        fig.canvas.draw()  # axes_grid1 divider geometry resolves at draw time
        # the appended dendrogram axes sits above the main axes
        main_box = ax.get_position()
        others = [a for a in fig.axes if a is not ax]
        assert any(a.get_position().y0 >= main_box.y1 - 1e-6 for a in others)


class TestOverlaySlices2DOptions:
    def test_neighbor_overlay_palette(self, adata):
        """Without label_key: current red, forward (previous) green,
        backward (next) blue — reference align.py:655 palette; overlay_type
        controls which neighbors appear."""
        import matplotlib.colors as mcolors

        b = adata.copy()
        c = adata.copy()
        axes = pl.overlay_slices_2d([adata, b, c], overlay_type="both", save_show_or_return="return")
        assert len(axes) == 3
        # middle panel shows all three overlay roles
        mid_colors = [tuple(col.get_facecolor()[0][:3]) for col in axes[1].collections]
        expected = {mcolors.to_rgb("green"), mcolors.to_rgb("blue"), mcolors.to_rgb("red")}
        assert set(mid_colors) == expected
        # first panel has no forward neighbor
        first_colors = {tuple(col.get_facecolor()[0][:3]) for col in axes[0].collections}
        assert mcolors.to_rgb("green") not in first_colors
        # forward-only: no blue anywhere
        axes_f = pl.overlay_slices_2d([adata, b, c], overlay_type="forward", save_show_or_return="return")
        all_colors = {tuple(col.get_facecolor()[0][:3]) for ax in axes_f for col in ax.collections}
        assert mcolors.to_rgb("blue") not in all_colors

    def test_label_coloring_and_options(self, adata):
        b = adata.copy()
        axes = pl.overlay_slices_2d(
            [adata, b], label_key="leiden", n_sampling=50, center_coordinate=True,
            x_min=-60, x_max=60, save_show_or_return="return",
        )
        # label coloring: one collection per category per drawn slice (3 cats x 2 slices)
        assert len(axes[0].collections) == 6
        assert axes[0].get_xlim() == (-60.0, 60.0)
        # centered: points cluster around 0
        offsets = np.concatenate([c.get_offsets() for c in axes[0].collections])
        assert abs(offsets.mean()) < 20
        assert len(offsets) == 100  # 50 sampled points per slice
        # scalar label -> shared colorbar range via vmin/vmax
        axes_s = pl.overlay_slices_2d([adata, b], label_key="g0", save_show_or_return="return")
        assert axes_s[0].collections[0].get_array() is not None


class TestPlotCellSignaling:
    def _vf_adata(self):
        rng = np.random.default_rng(3)
        n = 400
        a = st.AnnData(
            X=rng.poisson(1.0, (n, 3)).astype(np.float32),
            obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
            var=pd.DataFrame(index=["g0", "g1", "g2"]),
        )
        pts = rng.uniform(0, 100, (n, 2)).astype(np.float32)
        a.obsm["spatial"] = pts
        # rotational field
        ctr = pts - pts.mean(0)
        V = np.stack([-ctr[:, 1], ctr[:, 0]], 1) / 100.0
        a.obsm["vf"] = V.astype(np.float32)
        st.SKM.init_adata_type(a, "UMI")
        return a

    def test_cell_mode_suppresses_zero_vectors(self):
        from matplotlib.quiver import Quiver

        a = self._vf_adata()
        a.obsm["vf"][:50] = 0.0
        ax = pl.plot_cell_signaling(a, "vf", plot_method="cell", save_show_or_return="return")
        q = [c for c in ax.get_children() if isinstance(c, Quiver)][0]
        ax.figure.canvas.draw()
        # zero vectors NaN-ed out -> their arrow paths carry NaN vertices and
        # are skipped at render time (reference space.py:306)
        nan_paths = [bool(np.isnan(pth.vertices).any()) for pth in q.get_paths()]
        assert sum(nan_paths) == 50

    def test_grid_mode_knn_and_threshold(self):
        from matplotlib.quiver import Quiver

        a = self._vf_adata()
        ax1 = pl.plot_cell_signaling(a, "vf", plot_method="grid", grid_density=0.5,
                                     grid_knn=20, save_show_or_return="return")
        q1 = [c for c in ax1.get_children() if isinstance(c, Quiver)][0]
        n_default = len(q1.U)
        # tighter threshold (larger value) keeps fewer lattice points
        ax2 = pl.plot_cell_signaling(a, "vf", plot_method="grid", grid_density=0.5,
                                     grid_knn=20, grid_threshold=50.0, save_show_or_return="return")
        q2 = [c for c in ax2.get_children() if isinstance(c, Quiver)][0]
        assert 0 < len(q2.U) < n_default

    def test_stream_mode_renders_lines(self):
        a = self._vf_adata()
        ax = pl.plot_cell_signaling(a, "vf", plot_method="stream", grid_density=0.6,
                                    stream_density=0.8, stream_linewidth=1.0,
                                    save_show_or_return="return")
        # streamplot adds a LineCollection + arrow patches
        from matplotlib.collections import LineCollection

        assert any(isinstance(c, LineCollection) for c in ax.collections)

    def test_bad_method_raises(self):
        a = self._vf_adata()
        with pytest.raises(ValueError):
            pl.plot_cell_signaling(a, "vf", plot_method="nope", save_show_or_return="return")


class TestPlotly3DFamily:
    """Reference-semantics tests for the three_dims_plots plotly-family
    (ref three_dims_plots.py:807-1318): signatures, 'Other' relabeling,
    percentile clipping, exclusivity categories, center-shifted norm."""

    @pytest.fixture()
    def adata3d(self):
        rng = np.random.default_rng(3)
        n = 120
        X = np.zeros((n, 3), dtype=np.float32)
        X[:40, 0] = rng.poisson(3.0, 40) + 1  # gene g0 in first 40
        X[30:70, 1] = rng.poisson(3.0, 40) + 1  # g1 overlaps 30:40
        a = st.AnnData(
            X=X,
            obs=pd.DataFrame(
                {"celltype": (["A"] * 60 + ["B"] * 40 + ["C"] * 20)},
                index=[f"c{i}" for i in range(n)],
            ),
            var=pd.DataFrame(index=["g0", "g1", "g2"]),
        )
        a.obsm["spatial"] = rng.uniform(0, 10, (n, 3)).astype(np.float64)
        st.SKM.init_adata_type(a, "UMI")
        return a

    def test_quick_plot_celltypes_other_relabel(self, adata3d, tmp_path):
        out = tmp_path / "ct.html"
        mapping = quick_plot_3D_celltypes(
            adata3d, str(out), group_key="celltype", ct_subset=["A"], opacity=0.4
        )
        assert out.exists() and out.read_text().startswith("<!DOCTYPE html>")
        # cells outside ct_subset collapse to 'Other' pinned to light grey
        assert mapping["Other"] == "#D3D3D3"
        assert set(mapping) == {"A", "Other"}

    def test_quick_plot_celltypes_errors(self, adata3d, tmp_path):
        with pytest.raises(ValueError, match="does not contain"):
            quick_plot_3D_celltypes(adata3d, str(tmp_path / "x.html"), group_key="nope")
        adata2 = adata3d.copy()
        adata2.obsm["spatial"] = adata2.obsm["spatial"][:, :2]
        with pytest.raises(ValueError, match="3-dimensional"):
            quick_plot_3D_celltypes(adata2, str(tmp_path / "x.html"), group_key="celltype")

    def test_expression_percentile_clip_and_zero_split(self, adata3d, tmp_path):
        out = tmp_path / "expr.png"
        expr = plot_expression_3D(adata3d, str(out), "g0", pcutoff=90.0)
        assert out.exists()
        raw = adata3d[:, "g0"].X.flatten()
        assert expr.max() == np.percentile(raw, 90.0)  # clipped at the cutoff
        assert (expr == 0).sum() == (raw == 0).sum()  # zeros preserved

    def test_multiple_genes_categories(self, adata3d, tmp_path):
        out = tmp_path / "genes.html"
        cats = plot_multiple_genes_3D(adata3d, ["g0", "g1"], str(out))
        assert out.exists()
        # first 30 exclusive g0, 30:40 overlap, 40:70 exclusive g1, rest None
        assert (cats.iloc[:30] == "g0").all()
        assert (cats.iloc[30:40] == "Multiple genes").all()
        assert (cats.iloc[40:70] == "g1").all()
        assert (cats.iloc[70:] == "None").all()
        # reference writes the helper columns into obs
        assert "gene_expressed" in adata3d.obs and "gene_expr_category" in adata3d.obs

    def test_gradient_center_shift(self, adata3d, tmp_path):
        out = tmp_path / "grad.html"
        norm = visualize_3D_increasing_direction_gradient(
            adata3d, str(out), coord_column=2, center=0.25
        )
        assert out.exists()
        # center shift: value at midpoint 0.5 maps to 0.25
        vals = adata3d.obsm["spatial"][:, 2]
        raw = (vals - vals.min()) / (vals.max() - vals.min())
        lower = raw <= 0.5
        np.testing.assert_allclose(norm[lower], raw[lower] * 0.5, rtol=1e-12)
        np.testing.assert_allclose(norm[~lower], 1 - (1 - raw[~lower]) * 1.5, rtol=1e-9)

    def test_gradient_errors(self, adata3d, tmp_path):
        with pytest.raises(ValueError, match="not found"):
            visualize_3D_increasing_direction_gradient(adata3d, str(tmp_path / "x.html"), color_key="zzz")


class TestMorphometricsObsIndex:
    """The model->adata row mapping goes through point_data['obs_index']
    (ref morphometrics_plots.py:17-23), so subset/permuted models pick up
    the right cells' values."""

    def _adata(self, n=40):
        rng = np.random.default_rng(7)
        a = st.AnnData(X=np.ones((n, 2), dtype=np.float32),
                       obs=pd.DataFrame(index=[f"cell{i}" for i in range(n)]))
        st.SKM.init_adata_type(a, "UMI")
        a.obsm["spatial"] = rng.uniform(0, 1, (n, 3))
        a.obs["torsion"] = np.arange(float(n))
        return a

    def test_permuted_subset_model_maps_by_obs_index(self):
        from spateo_tpu.plotting.three_d_plot.morphometrics_plots import _attach_scalar
        from spateo_tpu.tdr.models.mesh_core import PointCloud

        a = self._adata()
        order = np.array([5, 3, 30, 12])
        pc = PointCloud(np.asarray(a.obsm["spatial"])[order])
        pc.point_data["obs_index"] = np.asarray(a.obs.index)[order]
        out = _attach_scalar(a, pc, "torsion")
        np.testing.assert_array_equal(out.point_data["torsion"], order.astype(float))

    def test_jacobian_reference_layout_and_labels(self, tmp_path):
        from spateo_tpu.tdr.models.mesh_core import PointCloud

        a = self._adata(n=20)
        # reference stores [3, 3, N] (morphometrics_plots.py:183)
        J = np.arange(3 * 3 * 20, dtype=float).reshape(3, 3, 20)
        a.uns["jacobian"] = J
        pc = PointCloud(np.asarray(a.obsm["spatial"]))
        fig = pl.jacobian(a, pc, model_style="points")
        titles = [ax.get_title() for ax in fig.axes if ax.get_title()]
        assert "∂fx/∂x" in titles and "∂fz/∂y" in titles and len(titles) == 9


class TestMultiModels:
    """Reference mode semantics of st.pl.multi_models
    (ref align_plots.py:46): panel counts and overlap coloring."""

    def _slices(self, k=3):
        rng = np.random.default_rng(5)
        out = []
        for i in range(k):
            a = st.AnnData(X=np.ones((50, 2), dtype=np.float32),
                           obs=pd.DataFrame({"slices": [f"s{i}"] * 50},
                                            index=[f"c{i}_{j}" for j in range(50)]))
            st.SKM.init_adata_type(a, "UMI")
            a.obsm["align_spatial"] = rng.uniform(0, 1, (50, 2))
            out.append(a)
        return out

    def test_single_mode_one_panel_per_slice(self):
        fig = pl.multi_models(self._slices(3), mode="single")
        visible = [ax for ax in fig.axes if ax.get_visible() and ax.collections]
        assert len(visible) == 3
        assert visible[0].get_title() == "Model id: s0"

    def test_overlap_mode_pairs(self):
        import matplotlib.colors as mcolors

        fig = pl.multi_models(self._slices(3), mode="overlap")
        visible = [ax for ax in fig.axes if ax.get_visible() and ax.collections]
        assert len(visible) == 2  # consecutive pairs
        assert visible[0].get_title() == "Model id: s0 & s1"
        # first model dodgerblue at overlap_amap, second red opaque
        cols = visible[0].collections
        assert len(cols) == 2
        c0 = cols[0].get_facecolor()[0][:3]
        np.testing.assert_allclose(c0, mcolors.to_rgb("dodgerblue"), atol=0.01)
        assert cols[0].get_alpha() == 0.5

    def test_both_mode_three_panels_per_pair(self):
        fig = pl.multi_models(self._slices(2), mode="both")
        visible = [ax for ax in fig.axes if ax.get_visible() and ax.collections]
        assert len(visible) == 3
        titles = [ax.get_title() for ax in visible]
        assert titles == ["Model id: s0", "Model id: s1", "Model id: s0 & s1"]


class TestBackbonePlot:
    def test_backbone_wireframe_and_node_labels(self):
        rng = np.random.default_rng(2)
        pts = np.c_[np.linspace(0, 1, 300), rng.normal(0, 0.03, 300), rng.normal(0, 0.03, 300)]
        bb, length, _ = st.tdr.construct_backbone(pts, rd_method="SimplePPT", num_nodes=10)
        from spateo_tpu.tdr.models.mesh_core import PointCloud

        fig = pl.backbone(bb, bg_model=PointCloud(pts))
        ax = fig.axes[0]
        from mpl_toolkits.mplot3d.art3d import Line3DCollection

        # backbone edges render as a 3D line collection (ref: wireframe)
        assert any(isinstance(c, Line3DCollection) for c in ax.collections)
        # one text label per backbone node (ref add_point_labels)
        assert len(ax.texts) == 10


class TestScattersReferenceOptions:
    """Reference option semantics added to scatters (ref scatters.py:643-991):
    phase-plot axes, aggregate, uns color persistence, geo polygons, image
    underlay."""

    def test_phase_plot_gene_vs_gene(self, adata):
        ax = pl.scatters(adata, basis="spatial", color="leiden", x="g0", y="g1",
                         save_show_or_return="return")
        assert ax.get_title() == "g0 VS g1"
        offsets = np.concatenate([c.get_offsets() for c in ax.collections])
        X = np.asarray(adata.X)
        assert set(np.unique(offsets[:, 0])) <= set(np.unique(X[:, 0]))

    def test_aggregate_collapses_to_groups(self, adata):
        ax = pl.scatters(adata, basis="spatial", color="g0", aggregate="leiden",
                         save_show_or_return="return")
        pts = ax.collections[0].get_offsets()
        assert len(pts) == 3  # one median point per leiden group
        sizes = np.asarray(ax.collections[0].get_sizes())
        counts = adata.obs["leiden"].value_counts()
        assert set(sizes.astype(int)) == set(counts.values)

    def test_uns_colors_written(self, adata):
        pl.scatters(adata, basis="spatial", color="leiden", save_show_or_return="return")
        assert "leiden_colors" in adata.uns
        assert set(adata.uns["leiden_colors"]) == {"a", "b", "c"}
        assert all(str(v).startswith("#") for v in adata.uns["leiden_colors"].values())

    def test_geo_polygons(self, adata):
        from matplotlib.collections import PolyCollection

        ax = pl.scatters(adata, basis="spatial", color="g0", geo=True,
                         save_show_or_return="return")
        assert any(isinstance(c, PolyCollection) for c in ax.collections)

    def test_img_underlay(self, adata):
        rng = np.random.default_rng(0)
        adata.uns["spatial"] = {0: {"images": [rng.uniform(0, 1, (20, 20))], "scalefactors": [1.0]}}
        ax = pl.scatters(adata, basis="spatial", color="g0", slices=0, img_layers=0,
                         save_show_or_return="return")
        assert len(ax.get_images()) == 1


class TestImshowOverlayGuards:
    def _agg(self, shape=(30, 40)):
        rng = np.random.default_rng(0)
        a = st.AnnData(X=rng.poisson(1.0, shape).astype(np.float32),
                       obs=pd.DataFrame(index=[str(i) for i in range(shape[0])]),
                       var=pd.DataFrame(index=[str(j) for j in range(shape[1])]))
        st.SKM.init_adata_type(a, "AGG")
        return a

    def test_mismatched_overlay_raises(self):
        from spateo_tpu.errors import PlottingError

        a = self._agg((30, 40))
        b = self._agg((20, 25))
        fig, ax = pl.imshow(a, save_show_or_return="return")
        with pytest.raises(PlottingError, match="dimensions"):
            pl.imshow(b, ax=ax)

    def test_title_is_layer(self):
        a = self._agg()
        fig, ax = pl.imshow(a, save_show_or_return="return")
        assert ax.get_title() == "X"


class TestThreeDAnimateOptions:
    def test_stable_model_in_every_frame(self, tmp_path):
        from spateo_tpu.tdr.models.mesh_core import PointCloud
        from spateo_tpu.plotting.three_d_plot.three_dims_plots import three_d_animate

        rng = np.random.default_rng(0)
        frames = [PointCloud(rng.normal(size=(40, 3)) + i * 0.1) for i in range(3)]
        stable = PointCloud(rng.normal(size=(25, 3)))
        out = str(tmp_path / "anim.gif")
        three_d_animate(frames, stable_model=stable, stable_kwargs={"opacity": 0.3},
                        filename=out, framerate=5)
        assert (tmp_path / "anim.gif").stat().st_size > 1000

    def test_string_shape_descriptor(self):
        from spateo_tpu.tdr.models.mesh_core import PointCloud

        rng = np.random.default_rng(1)
        models = [PointCloud(rng.normal(size=(30, 3))) for _ in range(4)]
        # "3|1": 3 panels left column, 1 right (ref three_dims_plots.py:396)
        fig = pl.three_d_multi_plot(models, shape="3|1")
        drawn = [ax for ax in fig.axes if ax.collections]
        assert len(drawn) == 4


class TestDendrogramReferenceContract:
    """dendrogram/plot_dendrogram follow the reference's full contract
    (reference plotting/static/utils.py:1669-1948)."""

    @staticmethod
    def _adata(n=90, g=8, seed=0):
        import pandas as pd

        import spateo_tpu.core as core

        rng = np.random.default_rng(seed)
        X = rng.poisson(2.0, (n, g)).astype(float)
        ct = np.array(["a", "b", "c"] * (n // 3))
        X[ct == "a", :3] += 5
        X[ct == "b", 3:6] += 5
        a = core.AnnData(
            X=X,
            obs=pd.DataFrame({"ct": ct, "batch": ["x", "y"] * (n // 2)}, index=[f"c{i}" for i in range(n)]),
            var=pd.DataFrame(index=[f"g{j}" for j in range(g)]),
        )
        a.uns["__type"] = "UMI"
        return a

    def test_correlation_linkage_and_storage(self):
        from scipy.cluster import hierarchy as sch
        from scipy.spatial import distance

        from spateo_tpu.plotting.utils import dendrogram

        a = self._adata()
        dendrogram(a, "ct", n_pcs=0, cor_method="pearson", linkage_method="complete")
        dat = a.uns["dendrogram_ct"]
        assert {"linkage", "categories_ordered", "categories_idx_ordered",
                "dendrogram_info", "correlation_matrix", "cor_method",
                "linkage_method"} <= set(dat.keys())
        # literal transcription: mean per category -> pearson corr -> complete
        # linkage on 1 - corr
        X = np.asarray(a.X)
        ct = np.asarray(a.obs["ct"])
        cats = list(pd.unique(ct))
        means = np.stack([X[ct == c].mean(0) for c in cats])
        corr = np.corrcoef(means)
        link = sch.linkage(distance.squareform(1 - corr), method="complete")
        np.testing.assert_allclose(dat["linkage"], link, atol=1e-10)
        np.testing.assert_allclose(dat["correlation_matrix"], corr, atol=1e-10)
        assert sorted(dat["categories_ordered"]) == sorted(cats)

        # inplace=False returns without storing
        out = dendrogram(a, "ct", n_pcs=0, key_added="alt", inplace=False)
        assert out is not None and "alt" not in a.uns

        # multi-key: categories merged by string concatenation
        dendrogram(a, ["ct", "batch"], n_pcs=0)
        merged = a.uns["dendrogram_ct_batch"]["categories_ordered"]
        assert any("_" in c for c in merged) and len(merged) == 6

    def test_plot_orientations_and_ticks(self):
        import matplotlib.pyplot as plt

        from spateo_tpu.plotting.utils import dendrogram, plot_dendrogram

        a = self._adata()
        dendrogram(a, "ct", n_pcs=0)
        for orient in ("top", "bottom", "left", "right"):
            fig, ax = plt.subplots()
            plot_dendrogram(ax, a, "ct", orientation=orient, remove_labels=False)
            assert len(ax.lines) >= 2  # the linkage arcs were drawn
            if orient in ("left", "right"):
                labels = [t.get_text() for t in ax.get_yticklabels()]
            else:
                labels = [t.get_text() for t in ax.get_xticklabels()]
            assert sorted(labels) == ["a", "b", "c"]
            plt.close(fig)

        # custom ticks translate the leaf coordinates
        fig, ax = plt.subplots()
        plot_dendrogram(ax, a, "ct", orientation="top", ticks=[0, 1, 2], remove_labels=False)
        xs = np.concatenate([l.get_xdata() for l in ax.lines])
        assert xs.max() <= 2.5  # translated into the new tick range
        plt.close(fig)

        # invalid stored dict raises
        a.uns["dendrogram_bad"] = {"nope": 1}
        with pytest.raises(ValueError, match="valid dendrogram information"):
            plot_dendrogram(ax, a, "ct", dendrogram_key="dendrogram_bad")
