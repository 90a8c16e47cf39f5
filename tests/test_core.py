"""L0 tests: AnnData data model, SKM registry, config, mesh, bridge."""

import numpy as np
import pandas as pd
import pytest
from scipy import sparse

import spateo_tpu as st
from spateo_tpu.core.anndata import AnnData, concat, read_h5ad


class TestAnnData:
    def test_construct_dense(self):
        X = np.arange(12, dtype=np.float32).reshape(3, 4)
        adata = AnnData(X=X)
        assert adata.shape == (3, 4)
        assert adata.n_obs == 3 and adata.n_vars == 4
        np.testing.assert_array_equal(adata.X, X)

    def test_construct_sparse(self):
        X = sparse.random(20, 10, density=0.3, format="csr", random_state=0)
        adata = AnnData(X=X)
        assert adata.shape == (20, 10)
        assert sparse.issparse(adata.X)

    def test_layers_shape_check(self):
        adata = AnnData(X=np.zeros((3, 4)))
        adata.layers["ok"] = np.ones((3, 4))
        with pytest.raises(ValueError):
            adata.layers["bad"] = np.ones((3, 5))

    def test_obsm_shape_check(self):
        adata = AnnData(X=np.zeros((3, 4)))
        adata.obsm["spatial"] = np.zeros((3, 2))
        with pytest.raises(ValueError):
            adata.obsm["bad"] = np.zeros((4, 2))

    def test_slicing(self):
        X = np.arange(20, dtype=float).reshape(4, 5)
        adata = AnnData(X=X, obs=pd.DataFrame({"total": [1, 2, 3, 4]}))
        adata.layers["copy"] = X * 2
        adata.obsm["spatial"] = np.arange(8).reshape(4, 2)
        sub = adata[[0, 2], :]
        assert sub.shape == (2, 5)
        np.testing.assert_array_equal(sub.X, X[[0, 2]])
        np.testing.assert_array_equal(sub.layers["copy"], X[[0, 2]] * 2)
        np.testing.assert_array_equal(sub.obsm["spatial"], [[0, 1], [4, 5]])
        # boolean mask
        sub2 = adata[np.array([True, False, True, False]), :]
        np.testing.assert_array_equal(sub2.X, X[[0, 2]])
        # var name select
        sub3 = adata[:, np.array(["1", "3"])]
        np.testing.assert_array_equal(sub3.X, X[:, [1, 3]])

    def test_copy_is_deep(self):
        adata = AnnData(X=np.zeros((2, 2)), uns={"nested": {"a": 1}})
        c = adata.copy()
        c.uns["nested"]["a"] = 2
        assert adata.uns["nested"]["a"] == 1

    def test_h5ad_roundtrip(self, tmp_path):
        X = sparse.random(15, 8, density=0.4, format="csr", random_state=1)
        adata = AnnData(
            X=X,
            obs=pd.DataFrame({"area": np.arange(15.0)}),
            var=pd.DataFrame(index=[f"g{i}" for i in range(8)]),
            uns={"__type": "UMI", "spatial": {"binsize": 1}},
        )
        adata.layers["raw"] = X.copy()
        adata.obsm["spatial"] = np.random.rand(15, 2)
        path = str(tmp_path / "t.h5ad")
        adata.write_h5ad(path)
        back = read_h5ad(path)
        assert back.shape == adata.shape
        np.testing.assert_allclose(back.X.toarray(), X.toarray())
        np.testing.assert_allclose(back.obsm["spatial"], adata.obsm["spatial"])
        assert back.uns["__type"] == "UMI"
        assert back.uns["spatial"]["binsize"] == 1
        np.testing.assert_array_equal(back.obs["area"].values, adata.obs["area"].values)

    def test_concat_inner(self):
        a = AnnData(X=np.ones((2, 3)), var=pd.DataFrame(index=["a", "b", "c"]))
        b = AnnData(X=2 * np.ones((3, 2)), var=pd.DataFrame(index=["b", "c"]))
        out = concat([a, b], join="inner")
        assert out.shape == (5, 2)
        assert list(out.var_names) == ["b", "c"]

    def test_transpose(self):
        adata = AnnData(X=np.arange(6).reshape(2, 3))
        assert adata.T.shape == (3, 2)


class TestSKM:
    def test_adata_type_guard(self, random_adata):
        @st.SKM.check_adata_is_type(st.SKM.ADATA_UMI_TYPE)
        def fn(adata):
            return True

        assert fn(random_adata)
        st.SKM.init_adata_type(random_adata, st.SKM.ADATA_AGG_TYPE)
        with pytest.raises(st.ConfigurationError):
            fn(random_adata)

    def test_layer_select_set(self, random_adata):
        dense = st.SKM.select_layer_data(random_adata, "X", make_dense=True)
        assert isinstance(dense, np.ndarray)
        st.SKM.set_layer_data(random_adata, "new_layer", dense * 2)
        np.testing.assert_allclose(random_adata.layers["new_layer"], dense * 2)

    def test_gen_new_layer_key(self):
        assert st.SKM.gen_new_layer_key("stain", "mask") == "stain_mask"
        assert st.SKM.gen_new_layer_key("", "mask") == "mask"

    def test_agg_bounds(self):
        adata = AnnData(
            X=np.zeros((3, 4)),
            obs=pd.DataFrame(index=["10", "11", "12"]),
            var=pd.DataFrame(index=["5", "6", "7", "8"]),
        )
        st.SKM.init_adata_type(adata, "AGG")
        assert st.SKM.get_agg_bounds(adata) == (10, 12, 5, 8)


class TestMesh:
    def test_default_mesh_all_devices(self):
        import jax

        from spateo_tpu.parallel import create_mesh

        mesh = create_mesh(axis_names=("data", "model"))
        assert mesh.shape["data"] == jax.device_count()
        assert mesh.shape["model"] == 1

    def test_mesh_2d(self):
        from spateo_tpu.parallel import create_mesh

        mesh = create_mesh((4, 2), ("data", "model"))
        assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2

    def test_bad_shape_raises(self):
        from spateo_tpu.parallel import create_mesh

        with pytest.raises(st.MeshError):
            create_mesh((3, 2), ("data", "model"))

    def test_shard_rows_pads(self):
        import jax.numpy as jnp

        from spateo_tpu.parallel import shard_rows

        x = jnp.ones((10, 4))
        sharded, n = shard_rows(x)
        assert n == 10
        assert sharded.shape[0] % 8 == 0


class TestBridge:
    def test_csr_to_dense_device(self):
        from spateo_tpu.core.bridge import csr_to_dense_device

        mat = sparse.random(37, 21, density=0.2, format="csr", random_state=0)
        dense, (r, c) = csr_to_dense_device(mat, pad_rows_to=8, pad_cols_to=128)
        assert (r, c) == (37, 21)
        assert dense.shape == (40, 128)
        np.testing.assert_allclose(np.asarray(dense)[:37, :21], mat.toarray(), rtol=1e-6)
        assert np.asarray(dense)[37:, :].sum() == 0

    def test_points_to_raster(self):
        from spateo_tpu.core.bridge import points_to_raster

        x = np.array([0, 0, 1, 3])
        y = np.array([0, 0, 2, 1])
        counts = np.array([1.0, 2.0, 3.0, 4.0])
        raster = np.asarray(points_to_raster(x, y, counts, (4, 4)))
        assert raster[0, 0] == 3.0
        assert raster[1, 2] == 3.0
        assert raster[3, 1] == 4.0
        assert raster.sum() == 10.0


class TestProfiler:
    def test_timer_and_report(self):
        import spateo_tpu as st

        st.profiler.reset()
        with st.profiler.timer("unit", log=False):
            sum(range(1000))
        rows = st.profiler.report()
        assert rows and rows[0][0] == "unit" and rows[0][1] == 1

    def test_annotate(self):
        import jax.numpy as jnp

        import spateo_tpu as st

        st.profiler.reset()

        @st.profiler.annotate("anno")
        def f(x):
            return x * 2

        f(jnp.ones(4))
        assert "anno" in st.profiler.timings()

    def test_sync_audit_counts_and_restores(self):
        import jax
        import jax.numpy as jnp

        import spateo_tpu as st

        cls = type(jnp.zeros(()))
        orig_float, orig_get = cls.__float__, jax.device_get
        with st.profiler.sync_audit(log=False, capture_stacks=True) as audit:
            float(jnp.ones(()).sum())
            jax.device_get(jnp.arange(3))
        assert audit["float"] == 1 and audit["device_get"] == 1
        assert audit["stacks"] and audit["stacks"][0][0] in {"float", "device_get"}
        # wrappers must be unwound on exit
        assert cls.__float__ is orig_float and jax.device_get is orig_get


class TestSurfaceTail:
    """Round-3 closure of the last public names (package-wide AST sweep vs
    the reference returns zero missing)."""

    def test_fast_utils_numerics(self):
        from scipy import sparse

        from spateo_tpu.preprocessing._fast_utils import (
            calc_mean_and_var_dense,
            calc_mean_and_var_sparse,
            calc_stat_per_batch_dense,
            calc_stat_per_batch_sparse,
        )

        rng = np.random.default_rng(0)
        M = sparse.random(40, 7, density=0.4, format="csr", random_state=1)
        X = M.toarray()
        m, v = calc_mean_and_var_sparse(40, 7, M.data, M.indices, M.indptr, 0)
        np.testing.assert_allclose(m, X.mean(0))
        np.testing.assert_allclose(v, X.var(0, ddof=1), rtol=1e-10)
        m, v = calc_mean_and_var_dense(40, 7, X, 1)
        np.testing.assert_allclose(v, X.var(1, ddof=1), rtol=1e-10)
        codes = rng.integers(0, 3, 40)
        out_s = calc_stat_per_batch_sparse(40, 7, M.data, M.indices, M.indptr, 3, codes)
        out_d = calc_stat_per_batch_dense(40, 7, X, 3, codes)
        for a, b in zip(out_s, out_d):
            np.testing.assert_allclose(a, b)

    def test_version_helpers(self):
        from spateo_tpu.get_version import Version, get_all_dependencies_version, match_groups

        v = Version.parse("1.2.3.dev4+a.b")
        assert str(v) == "1.2.3.dev4+a.b"
        with pytest.raises(Exception):
            match_groups(r"\d+$", "abc")
        df = get_all_dependencies_version(display=False)
        assert "jax" in df.columns and "spateo-tpu" in df.columns

    def test_utils_and_warnings(self):
        import warnings as pywarnings

        import spateo_tpu.warnings as w
        from spateo_tpu.utils import remove_kwargs

        d = {"a": 1, "b": 2, "c": 3}
        removed = remove_kwargs(d, ["a", "z", "c"])
        assert removed == [("a", 1), ("c", 3)] and d == {"b": 2}
        with pytest.warns(w.SegmentationWarning):
            pywarnings.warn("x", w.SegmentationWarning)

    def test_theme_helpers_roundtrip(self):
        import matplotlib

        from spateo_tpu.configuration import reset_rcParams, spateo_theme

        spateo_theme("black")
        assert matplotlib.rcParams["axes.facecolor"] == "black"
        reset_rcParams()
        assert matplotlib.rcParams["axes.facecolor"] != "black"


class TestAnnDataLen:
    def test_len_is_n_obs(self):
        import pandas as pd

        import spateo_tpu as st

        a = st.AnnData(X=np.zeros((7, 3)), obs=pd.DataFrame(index=[f"c{i}" for i in range(7)]))
        assert len(a) == 7 == a.n_obs  # upstream anndata convention


class TestColormapSurface:
    """Named colormap constants (reference configuration.py:300-460)."""

    def test_registered_names(self):
        import matplotlib as mpl

        import spateo_tpu.colormaps  # noqa: F401

        for name in [
            "fire", "darkblue", "darkgreen", "darkred", "darkpurple",
            "div_blue_black_red", "div_blue_red", "glasbey_white", "glasbey_dark",
        ]:
            assert name in mpl.colormaps(), name

    def test_configuration_reexports(self):
        from spateo_tpu.configuration import (
            cyc_10,
            cyc_20,
            fire_cmap,
            glasbey_dark_cmap,
            glasbey_white_cmap,
            zebrafish_256,
            zebrafish_colors,
        )

        assert fire_cmap.name == "fire"
        assert len(zebrafish_colors) == 12 and len(zebrafish_256) == 12
        assert len(cyc_10) == 10 and len(cyc_20) == 20
        # fire runs dark -> bright (luminance increases)
        import numpy as np

        lo = np.array(fire_cmap(0.0)[:3]).sum()
        hi = np.array(fire_cmap(1.0)[:3]).sum()
        assert hi > lo

    def test_glasbey_generator_constraints(self):
        import matplotlib
        import numpy as np

        from spateo_tpu.colormaps import _srgb_to_lab, glasbey_palette

        # exact Lab conversion at known points
        lab = _srgb_to_lab(np.array([[1.0, 1.0, 1.0], [0.0, 0.0, 0.0], [1.0, 0.0, 0.0]]))
        np.testing.assert_allclose(lab[0], [100, 0, 0], atol=0.01)
        np.testing.assert_allclose(lab[2], [53.24, 80.09, 67.20], atol=0.1)
        p = glasbey_palette(48, min_chroma=20.0, max_lightness=70.0)
        assert len(set(p)) == 48
        labp = _srgb_to_lab(np.array([matplotlib.colors.to_rgb(c) for c in p]))
        assert labp[:, 0].max() <= 70.01  # dark-background lightness cap
        assert np.hypot(labp[:, 1], labp[:, 2]).min() >= 19.9  # chroma floor
        # distinctness: min pairwise Lab distance stays useful
        d = np.linalg.norm(labp[:, None] - labp[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        assert d.min() > 10.0
