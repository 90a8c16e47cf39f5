"""Golden-parity tests: run the ACTUAL reference implementation (mounted at
/root/reference) next to ours on identical inputs and pin the numerics.

Only pure-NumPy/SciPy reference kernels are exercised (see
tests/_reference_harness.py for how the import-only heavy deps are stubbed).
All tests skip cleanly when the reference tree is absent.
"""

import warnings

import numpy as np
import pytest

from _reference_harness import reference_module

warnings.filterwarnings("ignore")


def _need(name):
    mod = reference_module(name)
    if mod is None:
        pytest.skip(f"reference module {name} unavailable in this image")
    return mod


@pytest.fixture(scope="module")
def nb_raster():
    rng = np.random.default_rng(42)
    X = np.concatenate(
        [rng.negative_binomial(2, 0.7, 600), rng.negative_binomial(10, 0.3, 400)]
    ).astype(int)
    rng.shuffle(X)
    return X.reshape(40, 25)


class TestEMGolden:
    """Pin the NB-mixture EM against reference spateo/segmentation/em.py."""

    def test_nbn_em_matches_reference(self, nb_raster):
        ref_em = _need("spateo.segmentation.em")
        from spateo_tpu.segmentation import em as my_em

        kw = dict(w=(0.99, 0.01), mu=(1.0, 10.0), var=(2.0, 20.0), max_iter=500)
        ref = [np.asarray(x) for x in ref_em.nbn_em(nb_raster.flatten(), **kw)]
        mine = [np.asarray(x) for x in my_em.nbn_em(nb_raster, **kw)]
        # fp32 device EM vs fp64 host EM at the same fixed point
        for r, m in zip(ref, mine):
            np.testing.assert_allclose(m, r, rtol=5e-3)

    def test_conditionals_matches_reference(self, nb_raster):
        ref_em = _need("spateo.segmentation.em")
        from spateo_tpu.segmentation import em as my_em

        params = ((0.6, 0.4), (2.157, 10.314), (0.7285, 0.3042))
        ref = ref_em.conditionals(nb_raster, em_results=params)
        mine = my_em.conditionals(nb_raster, em_results=params)
        for r, m in zip(ref, mine):
            np.testing.assert_allclose(np.asarray(m), np.asarray(r), rtol=5e-3, atol=1e-8)

    def test_conditionals_binned_matches_reference(self, nb_raster):
        ref_em = _need("spateo.segmentation.em")
        from spateo_tpu.segmentation import em as my_em

        bins = (nb_raster > 3).astype(int) + 1  # labels {1, 2}
        params = {
            1: ((0.7, 0.3), (2.0, 8.0), (0.7, 0.35)),
            2: ((0.5, 0.5), (3.0, 12.0), (0.6, 0.3)),
        }
        ref = ref_em.conditionals(nb_raster, em_results=params, bins=bins)
        mine = my_em.conditionals(nb_raster, em_results=params, bins=bins)
        for r, m in zip(ref, mine):
            np.testing.assert_allclose(np.asarray(m), np.asarray(r), rtol=5e-3, atol=1e-8)

    def test_confidence_matches_reference(self, nb_raster):
        ref_em = _need("spateo.segmentation.em")
        from spateo_tpu.segmentation import em as my_em

        params = ((0.6, 0.4), (2.157, 10.314), (0.7285, 0.3042))
        ref = np.asarray(ref_em.confidence(nb_raster, em_results=params))
        mine = np.asarray(my_em.confidence(nb_raster, em_results=params))
        np.testing.assert_allclose(mine, ref, atol=5e-4)


class TestSegmentationUtilsGolden:
    def test_label_overlap_matches_reference(self):
        ref_u = _need("spateo.segmentation.utils")
        import spateo_tpu.segmentation.utils as my_u

        rng = np.random.default_rng(0)
        X = rng.integers(0, 5, (30, 30))
        Y = rng.integers(0, 4, (30, 30))
        ref = ref_u.label_overlap(X, Y)
        mine = my_u.label_overlap(X, Y)
        ref = np.asarray(ref.todense()) if hasattr(ref, "todense") else np.asarray(ref)
        mine = np.asarray(mine.todense()) if hasattr(mine, "todense") else np.asarray(mine)
        assert np.array_equal(ref, mine)

    def test_cal_cell_area_matches_reference(self):
        ref_u = _need("spateo.segmentation.utils")
        import spateo_tpu.segmentation.utils as my_u

        rng = np.random.default_rng(0)
        labels = rng.integers(0, 5, (30, 30))
        ref = ref_u.cal_cell_area(labels)
        mine = my_u.cal_cell_area(labels)
        ref_d = dict(ref) if hasattr(ref, "items") or isinstance(ref, (list, tuple)) else ref
        mine_d = {int(k): int(v) for k, v in dict(mine).items()}
        assert {int(k): int(v) for k, v in dict(ref_d).items()} == mine_d


class TestNormalizeGolden:
    """Pin edgeR-style norm factors against reference
    spateo/preprocessing/normalize.py."""

    @pytest.fixture(scope="class")
    def counts(self):
        rng = np.random.default_rng(1)
        # strictly positive: the reference's RLE path errors on any
        # zero-geomean gene (reference normalize.py:228) — a known upstream
        # bug we reproduce bug-for-bug, so golden-test on positive data.
        return rng.negative_binomial(5, 0.3, size=(50, 200)).astype(float) + 1.0

    @pytest.mark.parametrize("method", ["TMM", "RLE", "upperquartile"])
    def test_calcNormFactors_matches_reference(self, counts, method):
        ref_n = _need("spateo.preprocessing.normalize")
        import spateo_tpu.preprocessing.normalize as my_n

        ref = np.asarray(ref_n.calcNormFactors(counts.copy(), method=method))
        mine = np.asarray(my_n.calcNormFactors(counts.copy(), method=method))
        np.testing.assert_allclose(mine, ref, rtol=1e-2)


class TestIOGolden:
    """Pin the Stereo-seq readers against reference spateo/io/bgi.py on a
    synthetic GEM tile: rasters and binned count matrices must be EXACT."""

    @pytest.fixture(scope="class")
    def gem_path(self, tmp_path_factory):
        import gzip

        import pandas as pd

        rng = np.random.default_rng(7)
        n = 400
        df = pd.DataFrame(
            {
                "geneID": rng.choice([f"g{i}" for i in range(20)], n),
                "x": rng.integers(0, 50, n),
                "y": rng.integers(0, 40, n),
                "MIDCounts": rng.integers(1, 5, n),
            }
        )
        path = tmp_path_factory.mktemp("gem") / "tile.gem.gz"
        with gzip.open(path, "wt") as f:
            df.to_csv(f, sep="\t", index=False)
        return str(path)

    @staticmethod
    def _dense(X):
        return np.asarray(X.todense() if hasattr(X, "todense") else X)

    @pytest.mark.parametrize("binsize", [1, 5])
    def test_read_bgi_agg_exact(self, gem_path, binsize):
        ref_io = _need("spateo.io.bgi")
        import spateo_tpu as st

        ref = ref_io.read_bgi_agg(gem_path, binsize=binsize)
        mine = st.io.read_bgi_agg(gem_path, binsize=binsize)
        assert ref.shape == mine.shape
        assert np.array_equal(self._dense(ref.X), self._dense(mine.X))

    def test_read_bgi_binned_exact(self, gem_path):
        import pandas as pd

        ref_io = _need("spateo.io.bgi")
        import spateo_tpu as st

        ref = ref_io.read_bgi(gem_path, binsize=10)
        mine = st.io.read_bgi(gem_path, binsize=10)
        rdf = pd.DataFrame(self._dense(ref.X), index=list(ref.obs_names), columns=list(ref.var_names))
        mdf = pd.DataFrame(self._dense(mine.X), index=list(mine.obs_names), columns=list(mine.var_names))
        assert set(rdf.index) == set(mdf.index)
        assert set(rdf.columns) == set(mdf.columns)
        assert np.array_equal(rdf.values, mdf.loc[rdf.index, rdf.columns].values)


class TestDigitizationGolden:
    def test_domain_heat_eqn_solver_matches_reference(self):
        """The digitization Laplace solver: our fused device stencil vs the
        reference's host Jacobi loop (reference digitization/utils.py:464)."""
        import cv2

        ref_du = _need("spateo.digitization.utils")
        from spateo_tpu.digitization.utils import domain_heat_eqn_solver

        H, W = 40, 50
        field = np.zeros((H, W))
        mask = np.zeros((H, W))
        mask[5:35, 5:45] = 1
        border = mask - cv2.erode(mask, np.ones((3, 3)))
        ys = np.arange(5, 35)
        min_line = np.stack([np.full_like(ys, 5), ys], axis=1)
        max_line = np.stack([np.full_like(ys, 44), ys], axis=1)
        xs = np.arange(5, 45)
        edge_a = np.stack([xs, np.full_like(xs, 5)], axis=1)
        edge_b = np.stack([xs, np.full_like(xs, 34)], axis=1)

        args = (min_line, max_line, edge_a, edge_b, border, mask)
        ref = ref_du.domain_heat_eqn_solver(field.copy(), *args, max_err=1e-10, max_itr=1e5)
        mine = domain_heat_eqn_solver(field.copy(), *args, max_err=1e-10, max_itr=1e5)
        m = mask.astype(bool)
        # heat values live on [1, 100]; converged fields agree to ~1e-3
        assert float(np.max(np.abs(np.asarray(mine) - ref)[m])) < 1e-2


class TestMorphoGolden:
    """Flagship golden test: run the reference's FULL torch Morpho_pairwise
    EM (reference alignment/methods/morpho_class.py, via its vendored POT
    backend) next to our JAX flash-E-step EM on an identical rotated pair and
    pin the results against each other and the ground truth."""

    def test_full_em_matches_reference(self):
        import pandas as pd

        rm = _need("spateo.alignment.methods.morpho_class")
        import spateo_tpu.core as core
        from spateo_tpu.alignment.methods.morpho import Morpho_pairwise as MyMorpho

        rng = np.random.default_rng(0)
        n = 300
        pts = rng.uniform(0, 10, (n, 2)).astype(np.float32)
        X = rng.poisson(2.0, (n, 12)).astype(np.float32)
        theta = 0.3
        R = np.array(
            [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
            dtype=np.float32,
        )
        ptsA = pts @ R.T + np.array([1.5, -0.8], dtype=np.float32)

        def mk(p):
            a = core.AnnData(
                X=X.copy(),
                obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
                var=pd.DataFrame(index=[f"g{j}" for j in range(12)]),
            )
            a.obsm["spatial"] = p.copy()
            a.uns["__type"] = "UMI"
            return a

        ref = rm.Morpho_pairwise(
            sampleA=mk(ptsA), sampleB=mk(pts), spatial_key="spatial",
            key_added="align", max_iter=100, verbose=False, device="cpu",
        )
        refP = np.asarray(ref.run())
        mine = MyMorpho(
            sampleA=mk(ptsA), sampleB=mk(pts), spatial_key="spatial",
            key_added="align", max_iter=100, verbose=False,
        )
        myP = np.asarray(mine.run())

        # both recover the ground-truth transform (domain is 10x10)
        ref_rmse = float(np.sqrt(np.mean((np.asarray(ref.XAHat) - pts) ** 2)))
        my_rmse = float(np.sqrt(np.mean((np.asarray(mine.XAHat) - pts) ** 2)))
        assert ref_rmse < 2e-2
        assert my_rmse < 2e-2
        # transformed coordinates agree with each other
        xa_diff = float(np.sqrt(np.mean((np.asarray(ref.XAHat) - np.asarray(mine.XAHat)) ** 2)))
        assert xa_diff < 2e-2

        # P columns come back in each model's SVI batch order (reference
        # morpho_class.py:895 rolls batch_perm); un-permute both before
        # comparing. Assignments must agree exactly, values to <5%.
        refP_orig = np.zeros_like(refP)
        refP_orig[:, np.asarray(ref.batch_idx)] = refP
        myP_orig = np.zeros_like(myP)
        myP_orig[:, np.asarray(mine.batch_idx)] = myP
        ident = np.arange(n)
        assert np.array_equal(refP_orig.argmax(1), ident)
        assert np.array_equal(myP_orig.argmax(1), ident)
        assert float(np.max(np.abs(refP_orig - myP_orig))) < 5e-2

    def test_full_em_non_svi_matches_reference(self):
        """Full-batch (SVI_mode=False) parity: updates must be unmixed (no
        stochastic-approximation step-size blending), matching the reference's
        plain full-batch EM."""
        import pandas as pd

        rm = _need("spateo.alignment.methods.morpho_class")
        import spateo_tpu.core as core
        from spateo_tpu.alignment.methods.morpho import Morpho_pairwise as MyMorpho

        rng = np.random.default_rng(1)
        n = 200
        pts = rng.uniform(0, 10, (n, 2)).astype(np.float32)
        X = rng.poisson(2.0, (n, 10)).astype(np.float32)
        theta = 0.25
        R = np.array(
            [[np.cos(theta), -np.sin(theta)], [np.sin(theta), np.cos(theta)]],
            dtype=np.float32,
        )
        ptsA = pts @ R.T + np.array([1.0, -0.5], dtype=np.float32)

        def mk(p):
            a = core.AnnData(
                X=X.copy(),
                obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
                var=pd.DataFrame(index=[f"g{j}" for j in range(10)]),
            )
            a.obsm["spatial"] = p.copy()
            a.uns["__type"] = "UMI"
            return a

        ref = rm.Morpho_pairwise(
            sampleA=mk(ptsA), sampleB=mk(pts), spatial_key="spatial",
            key_added="align", max_iter=80, verbose=False, device="cpu",
            SVI_mode=False,
        )
        ref.run()
        mine = MyMorpho(
            sampleA=mk(ptsA), sampleB=mk(pts), spatial_key="spatial",
            key_added="align", max_iter=80, verbose=False, SVI_mode=False,
        )
        mine.run()

        ref_rmse = float(np.sqrt(np.mean((np.asarray(ref.XAHat) - pts) ** 2)))
        my_rmse = float(np.sqrt(np.mean((np.asarray(mine.XAHat) - pts) ** 2)))
        assert ref_rmse < 2e-2
        assert my_rmse < 2e-2
        xa_diff = float(np.sqrt(np.mean((np.asarray(ref.XAHat) - np.asarray(mine.XAHat)) ** 2)))
        assert xa_diff < 2e-2


class TestMiscGolden:
    """Smaller exact-parity pins across io/benchmark/smoothing."""

    def test_bin_indices_and_centroids_exact(self):
        ref_u = _need("spateo.io.utils")
        import spateo_tpu.io.utils as my_u

        rng = np.random.default_rng(3)
        coords = rng.integers(0, 100, 500)
        assert np.array_equal(
            np.asarray(ref_u.bin_indices(coords, 0, 7)),
            np.asarray(my_u.bin_indices(coords, 0, 7)),
        )
        assert np.allclose(
            np.asarray(ref_u.centroids(np.arange(10), 0, 7)),
            np.asarray(my_u.centroids(np.arange(10), 0, 7)),
        )

    def test_benchmark_iou_and_ap_exact(self):
        ref_b = _need("spateo.segmentation.benchmark")
        import spateo_tpu.segmentation.benchmark as my_b

        rng = np.random.default_rng(3)
        X = rng.integers(0, 4, (40, 40))
        Y = rng.integers(0, 4, (40, 40))
        ref_iou = np.asarray(ref_b.iou(X, Y).todense())
        my_iou = my_b.iou(X, Y)
        my_iou = np.asarray(my_iou.todense() if hasattr(my_iou, "todense") else my_iou)
        assert np.allclose(ref_iou, my_iou)
        assert np.isclose(ref_b.average_precision(X, Y), my_b.average_precision(X, Y))

    def test_jaccard_similarity_matrix_exact(self):
        ref_s = _need("spateo.tools.spatial_smooth")
        import spateo_tpu.tools.spatial_smooth as my_s

        rng = np.random.default_rng(3)
        J = (rng.random((30, 30)) > 0.8).astype(float)
        assert np.allclose(
            np.asarray(ref_s.compute_jaccard_similarity_matrix(J)),
            np.asarray(my_s.compute_jaccard_similarity_matrix(J)),
        )

    def test_smooth_normalized_path_exact(self):
        """smooth(normalize_W=True) — the weighted-average path: x_new, the
        post-processing W, AND the row-sum vector d must match the reference
        bit-for-bit, including cell-type masking and the return contract
        (reference spatial_smooth.py:16-178)."""
        from scipy.sparse import csr_matrix

        ref_s = _need("spateo.tools.spatial_smooth")
        import spateo_tpu.tools.spatial_smooth as my_s

        rng = np.random.default_rng(7)
        n, g = 50, 12
        # dense X + sparse W: the one combination the reference executes
        # under modern scipy (its sparse-X fancy indexing returns np.matrix
        # and crashes at spatial_smooth.py:150; its dense-W path calls
        # ndarray.multiply and crashes at :106)
        X = np.asarray((rng.random((n, g)) > 0.6) * rng.integers(1, 5, (n, g)).astype(float))
        W = csr_matrix((rng.random((n, n)) > 0.7) * rng.random((n, n)))
        ct = rng.integers(0, 3, n)

        def dn(a):
            return np.asarray(a.todense()) if hasattr(a, "todense") else np.asarray(a)

        ref_x, ref_W, ref_d = ref_s.smooth(X.copy(), W.copy(), ct=ct, normalize_W=True, return_W=True)
        my_x, my_W, my_d = my_s.smooth(X.copy(), W.copy(), ct=ct, normalize_W=True, return_W=True)
        np.testing.assert_allclose(dn(my_x), dn(ref_x), atol=1e-12)
        np.testing.assert_allclose(dn(my_W), dn(ref_W), atol=1e-12)
        np.testing.assert_allclose(np.asarray(my_d).ravel(), np.asarray(ref_d).ravel(), atol=1e-12)

        # return_discrete semantics: fractional averages in (0, 1) become 1
        ref_x2, _ = ref_s.smooth(X.copy(), W.copy(), normalize_W=True, return_discrete=True)
        my_x2, _ = my_s.smooth(X.copy(), W.copy(), normalize_W=True, return_discrete=True)
        np.testing.assert_allclose(dn(my_x2), dn(ref_x2), atol=1e-12)

        # manual_mask OVERRIDES ct conditioning (reference :93-99)
        mask = (rng.random((n, n)) > 0.5).astype(float)
        ref_x3, _ = ref_s.smooth(X.copy(), W.copy(), ct=ct, manual_mask=mask, normalize_W=True)
        my_x3, _ = my_s.smooth(X.copy(), W.copy(), ct=ct, manual_mask=mask, normalize_W=True)
        np.testing.assert_allclose(dn(my_x3), dn(ref_x3), atol=1e-12)

    def test_smooth_probabilistic_path_structure(self):
        """smooth(normalize_W=False) — the probabilistic imputation path:
        eligible-row selection must match the reference exactly; sampled
        values must come from expressing neighbors; original nonzeros are
        restored verbatim (reference spatial_smooth.py:180-208,312-420)."""
        from scipy.sparse import csr_matrix

        ref_s = _need("spateo.tools.spatial_smooth")
        import spateo_tpu.tools.spatial_smooth as my_s

        rng = np.random.default_rng(11)
        n, g = 40, 5
        X = csr_matrix((rng.random((n, g)) > 0.5) * rng.integers(1, 6, (n, g)).astype(float))
        W = csr_matrix((rng.random((n, n)) > 0.6) * rng.random((n, n)))

        # helper-level golden: eligible rows are identical
        for i in range(g):
            feat = np.asarray(X[:, i].todense()).ravel()
            ref_rows = ref_s.get_eligible_rows(W.copy(), feat, threshold=2)
            my_rows = my_s.get_eligible_rows(W.copy(), feat, threshold=2)
            np.testing.assert_array_equal(np.sort(my_rows), np.sort(ref_rows))

        np.random.seed(0)
        my_x = my_s.smooth(X.copy(), W.copy(), normalize_W=False, smoothing_threshold=2)
        my_dense = np.asarray(my_x.todense())
        X_dense = np.asarray(X.todense())
        # original nonzeros restored verbatim
        nzr, nzc = X.nonzero()
        np.testing.assert_allclose(my_dense[nzr, nzc], X_dense[nzr, nzc])
        # every imputed value equals some expressing neighbor's value
        for i in range(g):
            feat = X_dense[:, i]
            imputed = np.where((my_dense[:, i] != 0) & (feat == 0))[0]
            for r in imputed:
                nbrs = W[r].nonzero()[1]
                vals = feat[nbrs]
                assert my_dense[r, i] in vals[vals != 0]
            # only reference-eligible rows were imputed
            eligible = set(ref_s.get_eligible_rows(W.copy(), feat, threshold=2).tolist())
            assert set(imputed.tolist()) <= eligible

    def test_select_hvf_seurat_golden(self):
        """Seurat HVF ranks match the reference (normalize.py:646-727) up to
        floating-point tie swaps between near-equal dispersion z-scores
        (the reference accumulates variance in a serial loop, we use
        pairwise summation — ranks of well-separated genes must agree
        exactly, and the selected set must match)."""
        ref_n = _need("spateo.preprocessing.normalize")
        import spateo_tpu.preprocessing.normalize as my_n

        rng = np.random.default_rng(0)
        X = np.log1p(rng.poisson(3.0, (120, 50)).astype(float))
        # plant clear HVGs
        X[:, :5] *= rng.uniform(0.2, 3.0, (120, 5))
        r_ref = ref_n.select_hvf_seurat_single(X, n_top=12, min_disp=0.5, max_disp=np.inf, min_mean=0.0125, max_mean=7)
        r_my = my_n.select_hvf_seurat_single(X, n_top=12)
        assert set(np.where(r_ref >= 0)[0]) == set(np.where(r_my >= 0)[0])
        assert (r_ref != r_my).mean() <= 0.1  # only fp-tie swaps

        # window mode (n_top=None): the eligibility window must agree
        r_ref2 = ref_n.select_hvf_seurat_single(X, n_top=None, min_disp=0.1, max_disp=np.inf, min_mean=0.01, max_mean=7)
        r_my2 = my_n.select_hvf_seurat_single(X, n_top=None, min_disp=0.1, min_mean=0.01)
        np.testing.assert_array_equal(r_ref2 >= 0, r_my2 >= 0)

    def test_sparse_matrix_median_exact(self):
        from scipy.sparse import csr_matrix

        ref_s = _need("spateo.tools.spatial_smooth")
        import spateo_tpu.tools.spatial_smooth as my_s

        rng = np.random.default_rng(5)
        for density, nz_only in ((0.2, True), (0.2, False), (0.8, False), (0.7, True)):
            M = csr_matrix((rng.random((17, 13)) < density) * rng.random((17, 13)))
            assert np.isclose(
                my_s.sparse_matrix_median(M, nonzero_only=nz_only),
                float(ref_s.sparse_matrix_median(M, nonzero_only=nz_only)),
            ), (density, nz_only)


class TestDistanceGolden:
    """Pin every calc_distance metric (and its GEMM factorization) against
    the reference's vendored-POT backend (methods/utils.py:866)."""

    @pytest.mark.parametrize("metric", ["kl", "sym_kl", "euc", "square_euc", "cos"])
    def test_calc_distance_matches_reference(self, metric):
        ref_u = _need("spateo.alignment.methods.utils")
        import jax.numpy as jnp

        import spateo_tpu.alignment.methods.math as mm

        nx, type_as = ref_u.check_backend(device="cpu", dtype="float32", verbose=False)
        rng = np.random.default_rng(2)
        X = rng.poisson(3.0, (40, 15)).astype(np.float32) + 0.1
        Y = rng.poisson(3.0, (25, 15)).astype(np.float32) + 0.1
        d_ref = nx.to_numpy(
            ref_u.calc_distance(nx.from_numpy(X, type_as=type_as), nx.from_numpy(Y, type_as=type_as), metric=metric)[0]
        )
        d_my = np.asarray(mm.calc_distance(X, Y, metric=metric)[0])
        np.testing.assert_allclose(d_my, d_ref, rtol=1e-3, atol=1e-5)
        if metric in ("kl", "sym_kl", "euc", "cos"):
            a, b, A, B = mm.factorize_distance(X, Y, metric)
            d_f = (
                np.asarray(a)[:, None]
                + np.asarray(b)[None, :]
                + np.asarray(jnp.matmul(jnp.asarray(A), jnp.asarray(B).T, precision="highest"))
            )
            np.testing.assert_allclose(d_f, d_ref, rtol=1e-3, atol=1e-5)


class TestDistributionsGolden:
    """Family statistics vs the reference's vendored GLM distributions
    (reference tools/CCI_effects_modeling/distributions.py)."""

    def test_deviance_residuals_loglik_match(self):
        ref_d = _need("spateo.tools.CCI_effects_modeling.distributions")
        import spateo_tpu.tools.CCI_effects_modeling.distributions as my_d

        rng = np.random.default_rng(4)
        y = rng.poisson(3.0, 50).astype(float)
        mu = np.clip(y + rng.normal(0, 0.7, 50), 0.2, None)
        w = rng.uniform(0.5, 2.0, 50)

        ref_p = ref_d.Poisson()
        my_p = my_d.Poisson()
        assert np.isclose(my_p.deviance(y, mu, w, scale=1.3), ref_p.deviance(y, mu, w, scale=1.3))
        np.testing.assert_allclose(
            my_p.deviance_residuals(y, mu, w), np.nan_to_num(ref_p.deviance_residuals(y, mu, w)), atol=1e-8
        )
        assert np.isclose(my_p.log_likelihood(y, mu, w, scale=1.1), ref_p.log_likelihood(y, mu, w, scale=1.1))

        ref_g = ref_d.Gaussian()
        my_g = my_d.Gaussian()
        yg = rng.normal(2.0, 1.0, 50)
        mg = yg + rng.normal(0, 0.3, 50)
        assert np.isclose(my_g.deviance(yg, mg, w, scale=2.0), ref_g.deviance(yg, mg, w, scale=2.0))
        np.testing.assert_allclose(my_g.deviance_residuals(yg, mg, w, scale=2.0), ref_g.deviance_residuals(yg, mg, w, scale=2.0))
        assert np.isclose(my_g.log_likelihood(yg, mg, w, scale=1.5), ref_g.log_likelihood(yg, mg, w, scale=1.5))

        ref_nb = ref_d.NegativeBinomial()
        my_nb = my_d.NegativeBinomial(disp=float(ref_nb.variance.disp))
        assert np.isclose(my_nb.deviance(y, mu, w), ref_nb.deviance(y, mu, w))
        assert np.isclose(my_nb.log_likelihood(y, mu, w), ref_nb.log_likelihood(y, mu, w))
        np.testing.assert_allclose(
            my_nb.deviance_residuals(y, mu, w), np.nan_to_num(ref_nb.deviance_residuals(y, mu, w)), atol=1e-8
        )


class TestClusterDEGsGolden:
    def test_find_cluster_degs_matches_reference(self):
        """find_cluster_degs against the in-process reference
        (cluster_degs.py:109-384): every statistic column, the gene-skip
        rule, the BH domain, ordering and final thresholds."""
        import pandas as pd

        ref_cd = _need("spateo.tools.cluster_degs")
        import spateo_tpu as st
        import spateo_tpu.tools.cluster_degs as my_cd
        from spateo_tpu.svg.utils import multipletests_bh

        # statsmodels is absent from this image, so the harness stubs the
        # reference's `multipletests` (-> NaN qvals -> empty output); give
        # the reference the real BH correction for a meaningful comparison
        ref_cd.multipletests = lambda p, method="fdr_bh": (None, multipletests_bh(np.asarray(p)))

        rng = np.random.default_rng(5)
        X = rng.poisson(2.0, (90, 15)).astype(float)
        X[:30, :5] += rng.poisson(5, (30, 5))
        X[30:60, 5:9] += rng.poisson(4, (30, 4))
        ad = st.AnnData(X=X, var=pd.DataFrame(index=[f"g{i}" for i in range(15)]))
        ad.obs["grp"] = ["A"] * 30 + ["B"] * 30 + ["C"] * 30
        st.SKM.init_adata_type(ad, "UMI")

        for method in ("multiple", "pairwise"):
            dr = ref_cd.find_cluster_degs(ad, "A", ["B", "C"], group="grp", method=method)
            dm = my_cd.find_cluster_degs(ad, "A", ["B", "C"], group="grp", method=method)
            assert list(dr.columns) == list(dm.columns), method
            assert len(dr) == len(dm), (method, len(dr), len(dm))
            key = ["gene"] if method == "multiple" else ["gene", "control_group"]
            dr2 = dr.copy()
            dm2 = dm.copy()
            if method == "pairwise":
                dr2["control_group"] = dr2["control_group"].astype(str)
                dm2["control_group"] = dm2["control_group"].astype(str)
            dr2 = dr2.sort_values(key).reset_index(drop=True)
            dm2 = dm2.sort_values(key).reset_index(drop=True)
            assert list(dr2["gene"]) == list(dm2["gene"]), method
            for col in ("ratio_expr", "diff_ratio_expr", "person_score", "cosine_score",
                        "jsd_adj_score", "log2fc", "combined_score", "pval", "qval"):
                np.testing.assert_allclose(
                    dm2[col].values.astype(float), dr2[col].values.astype(float),
                    rtol=1e-6, atol=1e-10, err_msg=f"{method}:{col}",
                )


class TestMoreToolsGolden:
    """Additional golden parity: procrustes, cell/gene filtering, spatial
    archetypes, QC region selection — all executing the actual reference."""

    def test_procrustes_exact(self):
        ref_ca = _need("spateo.tools.coarse_align")
        import spateo_tpu.tools.coarse_align as my_ca

        rng = np.random.default_rng(0)
        X = rng.normal(size=(40, 2))
        th = 0.7
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        Y = X @ R.T * 1.3 + [2, -1]
        for scaling in (True, False):
            d1, Z1, t1 = ref_ca.procrustes(X, Y, scaling=scaling)
            d2, Z2, t2 = my_ca.procrustes(X, Y, scaling=scaling)
            assert np.isclose(d1, d2)
            np.testing.assert_allclose(Z1, Z2, atol=1e-10)
            np.testing.assert_allclose(t1["rotation"], t2["rotation"], atol=1e-10)
            np.testing.assert_allclose(t1["translation"], t2["translation"], atol=1e-10)
            assert np.isclose(t1["scale"], t2["scale"])

    def test_filter_cells_genes_same_selection(self):
        import pandas as pd

        ref_f = _need("spateo.preprocessing.filter")
        import spateo_tpu as st
        import spateo_tpu.preprocessing.filter as my_f

        rng = np.random.default_rng(2)
        a = st.AnnData(
            X=(rng.random((70, 40)) > 0.7) * rng.poisson(3, (70, 40)).astype(float),
            var=pd.DataFrame(index=[f"g{i}" for i in range(40)]),
        )
        st.SKM.init_adata_type(a, "UMI")
        r = ref_f.filter_cells(a.copy(), min_expr_genes=10, inplace=False)
        m = my_f.filter_cells(a.copy(), min_expr_genes=10, inplace=False)
        assert list(r.obs_names) == list(m.obs_names)
        rg = ref_f.filter_genes(a.copy(), min_cells=12, inplace=False)
        mg = my_f.filter_genes(a.copy(), min_cells=12, inplace=False)
        assert list(rg.var_names) == list(mg.var_names)

    def test_spatial_archetypes_exact(self):
        ref_ar = _need("spateo.tools.architype")
        import spateo_tpu.tools.architype as my_ar

        rng = np.random.default_rng(0)
        Xa = rng.poisson(3.0, (60, 15)).astype(float)
        r = ref_ar.find_spatial_archetypes(5, Xa.T)
        m = my_ar.find_spatial_archetypes(5, Xa.T)
        for a, b in zip(r, m):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_select_qc_regions_same_regions(self):
        ref_qc = _need("spateo.segmentation.qc")
        import spateo_tpu as st
        import spateo_tpu.segmentation.qc as my_qc
        from spateo_tpu.configuration import SKM

        rng = np.random.default_rng(3)

        def fresh():
            a = st.AnnData(X=rng.poisson(1.0, (64, 48)).astype(float))
            st.SKM.init_adata_type(a, "AGG")
            a.obs_names = [str(i) for i in range(64)]
            a.var_names = [str(j) for j in range(48)]
            SKM.init_uns_spatial_namespace(a)
            # the regions form reads the binsize/scale/unit attributes that
            # read_bgi_agg normally stamps
            SKM.set_uns_spatial_attribute(a, SKM.UNS_SPATIAL_BINSIZE_KEY, 1)
            SKM.set_uns_spatial_attribute(a, SKM.UNS_SPATIAL_SCALE_KEY, 1.0)
            SKM.set_uns_spatial_attribute(a, SKM.UNS_SPATIAL_SCALE_UNIT_KEY, None)
            return a

        a_ref, a_my = fresh(), fresh()
        np.random.seed(0)
        ref_qc.select_qc_regions(a_ref, n=3, size=12)
        np.random.seed(0)
        my_qc.select_qc_regions(a_my, n=3, size=12)
        r = np.asarray(SKM.get_uns_spatial_attribute(a_ref, SKM.UNS_SPATIAL_QC_KEY))
        m = np.asarray(SKM.get_uns_spatial_attribute(a_my, SKM.UNS_SPATIAL_QC_KEY))
        # random draws differ in order between implementations; the CONTRACT
        # is the same: [n, 4] (xmin, xmax, ymin, ymax) regions of the right
        # size inside the raster
        for arr in (r, m):
            assert arr.shape == (3, 4)
            assert ((arr[:, 1] - arr[:, 0]) <= 12).all() and ((arr[:, 3] - arr[:, 2]) <= 12).all()
            assert arr.min() >= 0 and arr[:, 1].max() <= 64 and arr[:, 3].max() <= 48
        # explicit region list form
        a2_ref, a2_my = fresh(), fresh()
        # use_scale=False: pixel units directly (the scale/binsize uns
        # attributes only exist after read_bgi_agg)
        ref_qc.select_qc_regions(a2_ref, regions=[(5, 5), (20, 10)], size=8, use_scale=False)
        my_qc.select_qc_regions(a2_my, regions=[(5, 5), (20, 10)], size=8, use_scale=False)
        assert np.array_equal(
            np.asarray(SKM.get_uns_spatial_attribute(a2_ref, SKM.UNS_SPATIAL_QC_KEY)),
            np.asarray(SKM.get_uns_spatial_attribute(a2_my, SKM.UNS_SPATIAL_QC_KEY)),
        )


class TestDensityAndMorphologyGolden:
    """Density segmentation + image-op conventions vs the actual reference:
    cv2's fixed small Gaussian kernels, erode's +inf border, SCHC, and the
    full blur -> SCHC -> ordered-dilation pipeline."""

    def test_gauss_conv_matches_cv2_fixed_kernels(self):
        ref_u = _need("spateo.segmentation.utils")
        from spateo_tpu.ops.image import conv2d as my_conv

        rng = np.random.default_rng(0)
        Xn = rng.random((40, 40))
        for k in (3, 5, 7):
            br = np.asarray(ref_u.conv2d(Xn, k, mode="gauss"))
            bm = np.asarray(my_conv(Xn, k, mode="gauss"))
            np.testing.assert_allclose(bm, br, atol=1e-6, err_msg=f"gauss k={k}")

    def test_erode_border_foreground_semantics(self):
        """cv2.erode's default borderValue is +inf: border pixels are not
        eroded by the out-of-bounds region (reference masks rely on this at
        raster edges)."""
        import importlib

        cv2 = importlib.import_module("cv2")
        ref_u = _need("spateo.segmentation.utils")
        from spateo_tpu.ops.image import dilate as my_dilate, erode as my_erode
        from spateo_tpu.segmentation.utils import mclose_mopen as my_mm

        mask = np.zeros((20, 20), np.uint8)
        mask[0:6, 0:6] = 1
        mask[15:, 10:] = 1
        for k in (3, 5):
            se = np.asarray(ref_u.circle(k))
            np.testing.assert_array_equal(
                np.asarray(my_erode(mask.astype(bool), k)).astype(np.uint8), cv2.erode(mask, se)
            )
            np.testing.assert_array_equal(
                np.asarray(my_dilate(mask.astype(bool), k)).astype(np.uint8), cv2.dilate(mask, se)
            )
            np.testing.assert_array_equal(
                np.asarray(my_mm(mask.astype(bool), k)), np.asarray(ref_u.mclose_mopen(mask, k)) > 0
            )

    def test_schc_and_segment_densities_exact(self):
        ref_d = _need("spateo.segmentation.density")
        import spateo_tpu.segmentation.density as my_d

        rng = np.random.default_rng(0)
        X = rng.poisson(1.0, (40, 40)).astype(float)
        X[5:15, 5:15] += 6
        X[25:35, 20:35] += 3
        r = ref_d._schc(X, distance_threshold=2.0)
        m = my_d._schc(X, distance_threshold=2.0)
        np.testing.assert_array_equal(np.asarray(m), np.asarray(r))
        for dk in (3, 5):
            r2 = ref_d._segment_densities(X, k=3, dk=dk, distance_threshold=2.0)
            m2 = my_d._segment_densities(X, k=3, dk=dk, distance_threshold=2.0)
            np.testing.assert_array_equal(np.asarray(m2), np.asarray(r2), err_msg=f"dk={dk}")


class TestScoreAndPropsGolden:
    def test_score_pixels_gauss_matches_reference(self):
        """The gauss scoring path of _score_pixels (reference icell.py:195)
        — convolution + normalization — matches to fp32 precision."""
        ref_i = _need("spateo.segmentation.icell")
        import spateo_tpu.segmentation.icell as my_i

        rng = np.random.default_rng(0)
        X = rng.negative_binomial(1, 0.5, (80, 80)).astype(float)
        X[20:50, 20:50] += rng.negative_binomial(8, 0.35, (30, 30)).astype(float)
        r = np.asarray(ref_i._score_pixels(X, k=5, method="gauss"))
        m = np.asarray(my_i._score_pixels(X, k=5, method="gauss"))
        np.testing.assert_allclose(m, r, atol=1e-6)

    def test_get_points_props_matches_reference(self):
        """Per-label point properties (reference io/utils.py:75): area, bbox,
        centroid and contour vertices — the geometry read_bgi attaches to
        every segmented cell."""
        import pandas as pd

        ref_iou = _need("spateo.io.utils")
        import spateo_tpu.io.utils as my_iou

        rng = np.random.default_rng(1)
        pts = []
        for lab, (cx, cy) in enumerate([(5, 5), (20, 8), (12, 22)], start=1):
            for _ in range(30):
                pts.append((cx + rng.integers(-3, 4), cy + rng.integers(-3, 4), lab))
        df = pd.DataFrame(pts, columns=["x", "y", "label"]).drop_duplicates()
        r = ref_iou.get_points_props(df.copy())
        m = my_iou.get_points_props(df.copy())
        assert list(r.columns) == list(m.columns)
        r = r.sort_index()
        m = m.sort_index()
        num_cols = [c for c in r.columns if c != "contour"]
        np.testing.assert_allclose(
            m[num_cols].values.astype(float), r[num_cols].values.astype(float), atol=1e-9
        )
        # contour vertices: the reference's come from shapely's alpha-shape
        # (stubbed in this image, so its values aren't meaningful here);
        # check OURS enclose the label's points instead
        pts_by_label = {lab: df[df["label"] == lab][["x", "y"]].values for lab in df["label"].unique()}
        for idx in m.index:
            cm = np.asarray(m.loc[idx, "contour"], float).reshape(-1, 2)
            assert len(cm) >= 3, idx
            P = pts_by_label[int(float(idx))].astype(float)
            assert cm[:, 0].min() <= P[:, 0].min() and cm[:, 0].max() >= P[:, 0].max()
            assert cm[:, 1].min() <= P[:, 1].min() and cm[:, 1].max() >= P[:, 1].max()


class TestAlignmentUtilsGolden:
    def test_solve_RT_by_correspondence_exact(self):
        """Procrustes R/t from matched correspondences (reference
        alignment/utils.py:350)."""
        ref_au = _need("spateo.alignment.utils")
        import spateo_tpu.alignment.utils as my_au

        rng = np.random.default_rng(0)
        X = rng.normal(size=(60, 2))
        th = 0.5
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]])
        Y = X @ R.T + [1.0, -2.0]
        rR, rt = ref_au.solve_RT_by_correspondence(Y, X)[:2]
        mR, mt = my_au.solve_RT_by_correspondence(Y, X)[:2]
        np.testing.assert_allclose(np.asarray(mR), np.asarray(rR), atol=1e-10)
        np.testing.assert_allclose(np.asarray(mt), np.asarray(rt), atol=1e-10)
        np.testing.assert_allclose(np.asarray(mR), R, atol=1e-8)

    def test_generate_label_transfer_prior_exact(self):
        ref_au = _need("spateo.alignment.utils")
        import spateo_tpu.alignment.utils as my_au

        cat1 = ["a", "b", "c"]
        cat2 = ["a", "b", "d"]
        # reference layout: outer key = cat2, inner = cat1 (utils.py:62-84)
        for kwargs in (
            dict(positive_pairs=[{"left": ["a"], "right": ["a"], "value": 10}]),
            dict(),  # default same-name pairs
            dict(negative_pairs=[{"left": ["b"], "right": ["d"], "value": 0.1}]),
        ):
            pd_ref = ref_au.generate_label_transfer_prior(cat1, cat2, **kwargs)
            pd_my = my_au.generate_label_transfer_prior(cat1, cat2, **kwargs)
            for c2 in cat2:
                for c1 in cat1:
                    assert np.isclose(pd_ref[c2][c1], pd_my[c2][c1]), (kwargs, c2, c1)


class TestDigitizationUtilsGolden:
    def test_segment_bd_line_exact(self):
        """The borderline segmentation walk matches the reference exactly,
        including its error-compensating previous-point quirk
        (digitization/utils.py:193-259)."""
        ref_d = _need("spateo.digitization.utils")
        import spateo_tpu.digitization.utils as my_d

        for seed, n, cols in ((0, 80, 5), (1, 50, 4), (2, 200, 8), (3, 120, 6)):
            rng = np.random.default_rng(seed)
            t = np.sort(rng.uniform(0, 3, n))
            pts = np.stack([np.linspace(0, 30, n), 5 + 3 * np.sin(t * 2)], 1).astype(int)
            r = ref_d.segment_bd_line(pts.tolist(), cols)
            m = my_d.segment_bd_line(pts.tolist(), cols)
            np.testing.assert_array_equal(np.asarray(m), np.asarray(r), err_msg=str((seed, cols)))


class TestMorphoGuidanceGolden:
    def test_guidance_pair_matches_reference(self):
        """Guidance-anchored alignment (reference morpho_class.py:160-217,
        guidance_pair + guidance_effect): transformed coordinates match the
        reference solver with the same anchors and weight, for nonrigid and
        rigid guidance."""
        import pandas as pd

        rm = _need("spateo.alignment.methods.morpho_class")
        import spateo_tpu.core as core
        from spateo_tpu.alignment.methods.morpho import Morpho_pairwise as MyMorpho

        rng = np.random.default_rng(2)
        n = 250
        pts = rng.uniform(0, 10, (n, 2)).astype(np.float32)
        X = rng.poisson(2.0, (n, 10)).astype(np.float32)
        th = 0.35
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
        ptsA = pts @ R.T + np.array([2.0, -1.0], np.float32)
        gp = [pts[:6].copy(), ptsA[:6].copy()]  # [X_BI, X_AI]

        def mk(p):
            a = core.AnnData(
                X=X.copy(), obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
                var=pd.DataFrame(index=[f"g{j}" for j in range(10)]),
            )
            a.obsm["spatial"] = p.copy()
            a.uns["__type"] = "UMI"
            return a

        for effect in ("nonrigid", "rigid"):
            ref = rm.Morpho_pairwise(
                sampleA=mk(ptsA), sampleB=mk(pts), spatial_key="spatial", key_added="align",
                max_iter=80, verbose=False, device="cpu",
                guidance_pair=[g.copy() for g in gp], guidance_effect=effect, guidance_weight=2.0,
            )
            ref.run()
            mine = MyMorpho(
                sampleA=mk(ptsA), sampleB=mk(pts), spatial_key="spatial", key_added="align",
                max_iter=80, verbose=False,
                guidance_pair=[g.copy() for g in gp], guidance_effect=effect, guidance_weight=2.0,
            )
            mine.run()
            ref_rmse = float(np.sqrt(np.mean((np.asarray(ref.XAHat) - pts) ** 2)))
            my_rmse = float(np.sqrt(np.mean((np.asarray(mine.XAHat) - pts) ** 2)))
            diff = float(np.sqrt(np.mean((np.asarray(ref.XAHat) - np.asarray(mine.XAHat)) ** 2)))
            assert ref_rmse < 2e-2, (effect, ref_rmse)
            assert my_rmse < 2e-2, (effect, my_rmse)
            assert diff < 2e-2, (effect, diff)


class TestMorphoSparseGolden:
    def test_sparse_calculation_mode_matches_reference(self):
        """Top-k sparse-P alignment (reference morpho_class.py:139-140 +
        methods/utils.py:1369 _dense_to_sparse): the streamed per-column
        top-k-threshold redesign lands on the same transform as the
        reference's materialized sparse P."""
        import pandas as pd

        rm = _need("spateo.alignment.methods.morpho_class")
        import spateo_tpu.core as core
        from spateo_tpu.alignment.methods.morpho import Morpho_pairwise as MyMorpho

        rng = np.random.default_rng(3)
        n = 240
        pts = rng.uniform(0, 10, (n, 2)).astype(np.float32)
        X = rng.poisson(2.0, (n, 10)).astype(np.float32)
        th = 0.3
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
        ptsA = pts @ R.T + np.array([1.0, -0.5], np.float32)

        def mk(p):
            a = core.AnnData(
                X=X.copy(), obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
                var=pd.DataFrame(index=[f"g{j}" for j in range(10)]),
            )
            a.obsm["spatial"] = p.copy()
            a.uns["__type"] = "UMI"
            return a

        ref = rm.Morpho_pairwise(
            sampleA=mk(ptsA), sampleB=mk(pts), spatial_key="spatial", key_added="align",
            max_iter=80, verbose=False, device="cpu", sparse_calculation_mode=True, sparse_top_k=32,
        )
        ref.run()
        mine = MyMorpho(
            sampleA=mk(ptsA), sampleB=mk(pts), spatial_key="spatial", key_added="align",
            max_iter=80, verbose=False, sparse_calculation_mode=True, sparse_top_k=32,
        )
        mine.run()
        assert float(np.sqrt(np.mean((np.asarray(ref.XAHat) - pts) ** 2))) < 2e-2
        assert float(np.sqrt(np.mean((np.asarray(mine.XAHat) - pts) ** 2))) < 2e-2
        assert float(np.sqrt(np.mean((np.asarray(ref.XAHat) - np.asarray(mine.XAHat)) ** 2))) < 2e-2


class TestMorphoDissimilarityGolden:
    @pytest.mark.parametrize("dis", ["kl", "cos"])
    def test_full_em_other_metrics_match_reference(self, dis):
        """Full-EM parity under the KL and cosine expression metrics
        (reference calc_distance dissimilarity options, methods/utils.py:866
        feeding morpho_class.py:266)."""
        import pandas as pd

        rm = _need("spateo.alignment.methods.morpho_class")
        import spateo_tpu.core as core
        from spateo_tpu.alignment.methods.morpho import Morpho_pairwise as MyMorpho

        rng = np.random.default_rng(4)
        n = 220
        pts = rng.uniform(0, 10, (n, 2)).astype(np.float32)
        X = (rng.poisson(2.0, (n, 10)) + 0.1).astype(np.float32)
        th = 0.3
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
        ptsA = pts @ R.T + np.array([1.0, -0.5], np.float32)

        def mk(p):
            a = core.AnnData(
                X=X.copy(), obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
                var=pd.DataFrame(index=[f"g{j}" for j in range(10)]),
            )
            a.obsm["spatial"] = p.copy()
            a.uns["__type"] = "UMI"
            return a

        ref = rm.Morpho_pairwise(
            sampleA=mk(ptsA), sampleB=mk(pts), spatial_key="spatial", key_added="align",
            max_iter=80, verbose=False, device="cpu", dissimilarity=dis,
        )
        ref.run()
        mine = MyMorpho(
            sampleA=mk(ptsA), sampleB=mk(pts), spatial_key="spatial", key_added="align",
            max_iter=80, verbose=False, dissimilarity=dis,
        )
        mine.run()
        assert float(np.sqrt(np.mean((np.asarray(mine.XAHat) - pts) ** 2))) < 2e-2
        assert float(np.sqrt(np.mean((np.asarray(ref.XAHat) - np.asarray(mine.XAHat)) ** 2))) < 2e-2


class TestBATransformGolden:
    def test_reference_transform_consumes_our_vecfld(self):
        """Cross-implementation contract: the REFERENCE's BA_transform
        (alignment/transform.py:61) applied to OUR solver's vecfld dict
        produces the same warped coordinates as our BA_transform — the
        .uns['VecFld_morpho'] schema is interchangeable between frameworks."""
        import pandas as pd

        ref_t = _need("spateo.alignment.transform")
        import spateo_tpu.core as core
        from spateo_tpu.alignment.methods.morpho import Morpho_pairwise as MyMorpho
        from spateo_tpu.alignment.transform import BA_transform as my_BA

        rng = np.random.default_rng(5)
        n = 200
        pts = rng.uniform(0, 10, (n, 2)).astype(np.float32)
        X = rng.poisson(2.0, (n, 10)).astype(np.float32)
        th = 0.3
        R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
        ptsA = pts @ R.T + np.array([1.0, -0.5], np.float32)

        def mk(p):
            a = core.AnnData(
                X=X.copy(), obs=pd.DataFrame(index=[f"c{i}" for i in range(n)]),
                var=pd.DataFrame(index=[f"g{j}" for j in range(10)]),
            )
            a.obsm["spatial"] = p.copy()
            a.uns["__type"] = "UMI"
            return a

        m = MyMorpho(sampleA=mk(ptsA), sampleB=mk(pts), spatial_key="spatial",
                     key_added="align", max_iter=60, verbose=False)
        m.run()
        new_pts = rng.uniform(0, 10, (40, 2)).astype(np.float32) @ R.T + np.array([1.0, -0.5], np.float32)
        r_out = ref_t.BA_transform(vecfld=m.vecfld, quary_points=new_pts.copy(), device="cpu")
        m_out = my_BA(vecfld=m.vecfld, quary_points=new_pts.copy())
        np.testing.assert_allclose(np.asarray(m_out[0]), np.asarray(r_out[0]), atol=1e-5)


class TestPlatformReadersGolden:
    """Platform readers vs the in-process reference on synthetic files
    (reference io/{slideseq,seqfish}.py — the formats are plain pandas, so
    the reference parses them here unmodified)."""

    @staticmethod
    def _dense(X):
        return np.asarray(X.todense() if hasattr(X, "todense") else X)

    def test_read_slideseq_matches_reference(self, tmp_path):
        import pandas as pd

        ref_ss = _need("spateo.io.slideseq")
        import spateo_tpu.io.platforms as my_p

        rng = np.random.default_rng(0)
        genes = [f"g{i}" for i in range(8)]
        barcodes = [f"bc{i}" for i in range(30)]
        wide = pd.DataFrame(
            rng.poisson(1.0, (len(genes), len(barcodes))).astype(int), columns=barcodes
        )
        wide.insert(0, "GENE", genes)
        counts_path = tmp_path / "dge.txt"
        wide.to_csv(counts_path, sep="\t", index=False)
        beads = pd.DataFrame(
            {"barcode": barcodes, "x": rng.uniform(0, 500, 30).round(1), "y": rng.uniform(0, 500, 30).round(1)}
        )
        beads_path = tmp_path / "beads.csv"
        beads.to_csv(beads_path, index=False)  # has a 'barcode' header row

        for binsize in (None, 50):
            r = ref_ss.read_slideseq(str(counts_path), str(beads_path), binsize=binsize)
            m = my_p.read_slideseq(str(counts_path), str(beads_path), binsize=binsize)
            assert list(r.obs_names) == list(m.obs_names), binsize
            assert list(r.var_names) == list(m.var_names), binsize
            assert np.array_equal(self._dense(r.X), self._dense(m.X)), binsize
            if binsize is not None:
                # unbinned reference spatial is broken upstream (index-label
                # rename instead of columns); binned comes from get_bin_props
                np.testing.assert_allclose(
                    np.asarray(m.obsm["spatial"], float), np.asarray(r.obsm["spatial"], float)
                )

    def test_read_seqfish_contract(self, tmp_path):
        """seqFISH reader contract on a synthetic fixture (the REFERENCE's
        read_seqfish crashes under modern pandas — it assigns a DataFrame to
        .obsm and a 2-D array into a DataFrame column — so the format
        contract is pinned directly: wide uint16 counts CSV + the
        Field of View/Cell ID/X/Y/Region metadata CSV, optional
        per-FOV offsets with accumulation)."""
        import pandas as pd

        import spateo_tpu.io.platforms as my_p

        rng = np.random.default_rng(1)
        n, g = 25, 6
        counts = pd.DataFrame(rng.poisson(2.0, (n, g)).astype(np.uint16), columns=[f"gene{j}" for j in range(g)])
        counts_path = tmp_path / "counts.csv"
        counts.to_csv(counts_path, index=False)
        meta = pd.DataFrame(
            {
                "Field of View": rng.integers(0, 3, n).astype(np.uint8),
                "Cell ID": np.arange(n, dtype=np.uint16),
                "X": rng.uniform(0, 100, n).round(2).astype(np.float32),
                "Y": rng.uniform(0, 100, n).round(2).astype(np.float32),
                "Region": rng.choice(["a", "b"], n),
            }
        )
        meta_path = tmp_path / "meta.csv"
        meta.to_csv(meta_path, index=False)

        m = my_p.read_seqfish(str(counts_path), str(meta_path))
        assert np.array_equal(self._dense(m.X), counts.values)
        assert list(m.var_names) == list(counts.columns)
        assert list(map(int, m.obs["cell_id"])) == list(range(n))
        sp = np.asarray(m.obsm["spatial"])
        np.testing.assert_array_equal(sp, np.stack([meta["X"].astype(int), meta["Y"].astype(int)], 1))

        # per-FOV offsets shift coordinates by the accumulated offset
        off = pd.DataFrame({"fov": [0, 1, 2], "x_offset": [0.0, 10.0, 20.0], "y_offset": [0.0, 5.0, 10.0]})
        m2 = my_p.read_seqfish(str(counts_path), str(meta_path), fov_offset=off.copy(), accumulate_x=True)
        sp2 = np.asarray(m2.obsm["spatial"])
        cum = np.array([0.0, 10.0, 30.0])  # accumulated x offsets
        expect_x = (meta["X"].values + cum[meta["Field of View"].values]).astype(int)
        np.testing.assert_array_equal(sp2[:, 0], expect_x)

    def test_read_10x_matches_reference(self, tmp_path):
        """10x Visium golden (reference io/tenx.py:64). X/obs/spatial exact.
        var_names deliberately diverge: the reference reads features.tsv.gz
        with the default comma separator (tenx.py:41), mis-parsing the real
        tab-separated 10x format into an all-NaN gene_id index; ours uses
        sep='\\t' and recovers the real gene ids."""
        import gzip
        import io as _io

        import pandas as pd
        import scipy.io
        import scipy.sparse

        ref_tx = _need("spateo.io.tenx")
        import spateo_tpu.io.platforms as my_p

        rng = np.random.default_rng(0)
        mdir = tmp_path / "mtx"
        mdir.mkdir()
        n, g = 20, 6
        bcs = [f"BC{i}" for i in range(n)]
        with gzip.open(mdir / "barcodes.tsv.gz", "wt") as f:
            f.write("\n".join(bcs) + "\n")
        with gzip.open(mdir / "features.tsv.gz", "wt") as f:
            f.write("\n".join(f"name{j}\tENSG{j}\tGene Expression" for j in range(g)) + "\n")
        # de facto reference contract: matrix.mtx stores barcodes x genes
        # (tenx.py:44 builds AnnData from mmread output without transposing)
        M = scipy.sparse.csr_matrix(rng.poisson(1.0, (n, g)))
        buf = _io.BytesIO()
        scipy.io.mmwrite(buf, M)
        with gzip.open(mdir / "matrix.mtx.gz", "wb") as f:
            f.write(buf.getvalue())
        pos = pd.DataFrame(
            {
                "barcode": bcs,
                "in_tissue": 1,
                "array_row": rng.integers(0, 10, n),
                "array_col": rng.integers(0, 10, n),
                "pxl_row_in_fullres": rng.integers(0, 1000, n),
                "pxl_col_in_fullres": rng.integers(0, 1000, n),
            }
        )
        pos_path = tmp_path / "positions.csv"
        pos.to_csv(pos_path, index=False, header=False)

        r = ref_tx.read_10x(str(mdir), str(pos_path))
        m = my_p.read_10x(str(mdir), str(pos_path))
        assert np.array_equal(self._dense(r.X), self._dense(m.X))
        assert list(r.obs_names) == list(m.obs_names)
        np.testing.assert_array_equal(
            np.asarray(r.obsm["spatial"], float), np.asarray(m.obsm["spatial"], float)
        )
        assert list(m.var_names) == [f"ENSG{j}" for j in range(g)]  # real ids, not NaN

    def test_read_nanostring_label_path_matches_reference(self, tmp_path):
        """CosMx label path golden incl. fractional global px (reference
        io/nanostring.py:207 truncates float px → uint32, nanostring.py:66)."""
        import pandas as pd

        ref_ns = _need("spateo.io.nanostring")
        import spateo_tpu.io.platforms as my_p

        rng = np.random.default_rng(3)
        tx = pd.DataFrame(
            {
                "fov": rng.integers(1, 3, 400),
                "cell_ID": rng.integers(0, 5, 400),
                "target": rng.choice([f"G{j}" for j in range(5)], 400),
                "x_global_px": rng.uniform(0, 60, 400).round(3),
                "y_global_px": rng.uniform(0, 60, 400).round(3),
            }
        )
        tx_path = tmp_path / "tx.csv"
        tx.to_csv(tx_path, index=False)

        r = ref_ns.read_nanostring(str(tx_path), label_columns=["fov", "cell_ID"], add_props=True)
        m = my_p.read_nanostring(str(tx_path), label_columns=["fov", "cell_ID"], add_props=True)
        assert np.array_equal(self._dense(r.X), self._dense(m.X))
        assert list(r.obs_names) == list(m.obs_names)
        assert list(r.var_names) == list(m.var_names)
        np.testing.assert_allclose(np.asarray(r.obsm["spatial"], float), np.asarray(m.obsm["spatial"], float))
        np.testing.assert_array_equal(np.asarray(r.obs["area"], float), np.asarray(m.obs["area"], float))

    def test_read_nanostring_binsize_contract(self, tmp_path):
        """CosMx binsize path contract (the REFERENCE's binsize path crashes
        upstream: read_nanostring_as_dataframe executes ``df['label'] =
        labels`` unconditionally at nanostring.py:95, hitting an
        UnboundLocalError whenever label_columns is None). Pin our binned
        output against a direct recount instead."""
        import pandas as pd

        import spateo_tpu.io.platforms as my_p
        from spateo_tpu.errors import IOError as SpateoIOError

        rng = np.random.default_rng(4)
        tx = pd.DataFrame(
            {
                "fov": rng.integers(1, 3, 300),
                "cell_ID": rng.integers(0, 5, 300),
                "target": rng.choice([f"G{j}" for j in range(4)], 300),
                "x_global_px": rng.uniform(0, 90, 300).round(2),
                "y_global_px": rng.uniform(0, 90, 300).round(2),
            }
        )
        tx_path = tmp_path / "tx.csv"
        tx.to_csv(tx_path, index=False)

        m = my_p.read_nanostring(str(tx_path), binsize=30, add_props=False)
        # direct recount: truncate px → int, bin by 30, count per (bin, gene)
        xb = (tx["x_global_px"].astype(np.int64) // 30).astype(str)
        yb = (tx["y_global_px"].astype(np.int64) // 30).astype(str)
        lab = xb + "-" + yb
        expected = pd.crosstab(lab, tx["target"])
        expected = expected.loc[sorted(expected.index), sorted(expected.columns)]
        assert list(m.obs_names) == list(expected.index)
        assert list(m.var_names) == list(expected.columns)
        assert np.array_equal(self._dense(m.X), expected.values)

        # exactly one of binsize/label_columns must be given
        with pytest.raises(SpateoIOError):
            my_p.read_nanostring(str(tx_path))
        with pytest.raises(SpateoIOError):
            my_p.read_nanostring(str(tx_path), binsize=10, label_columns="cell_ID")

    def test_read_starmap_matches_reference(self, tmp_path):
        """STARmap golden (reference io/starmap.py:56): counts CSV + names CSV
        + labels.npz with the 1000<area<100000 filter and max-label drop."""
        import pandas as pd

        ref_sm = _need("spateo.io.starmap")
        import spateo_tpu.io.platforms as my_p

        rng = np.random.default_rng(5)
        sdir = tmp_path / "starmap"
        sdir.mkdir()
        lab = np.zeros((200, 200), np.int32)
        lab[5:45, 5:45] = 1  # area 1600 each — passes the (1000, 100000) filter
        lab[60:100, 5:45] = 2
        lab[110:150, 5:45] = 3
        lab[5:45, 60:100] = 4  # max label — dropped by the reference rule
        np.savez(sdir / "labels.npz", labels=lab)
        cnt = rng.poisson(2.0, (3, 4))
        pd.DataFrame(cnt).to_csv(sdir / "cell_barcode_count.csv", header=False, index=False)
        pd.DataFrame({0: range(4), 1: ["b"] * 4, 2: [f"gene{j}" for j in range(4)]}).to_csv(
            sdir / "cell_barcode_names.csv", header=False, index=False
        )

        r = ref_sm.read_starmap(str(sdir))
        m = my_p.read_starmap(str(sdir))
        assert np.array_equal(self._dense(r.X), self._dense(m.X))
        assert list(r.obs_names) == list(m.obs_names)
        assert list(r.var_names) == list(m.var_names)
        np.testing.assert_allclose(np.asarray(r.obsm["spatial"], float), np.asarray(m.obsm["spatial"], float))
        np.testing.assert_array_equal(np.asarray(r.obs["area"], float), np.asarray(m.obs["area"], float))

    def test_read_seqscope_matches_reference(self, tmp_path):
        """Seq-Scope golden (reference io/seqscope.py:61): mtx dir + positions
        table, binsize binning via the indicator-matrix contraction. var_names
        diverge like 10x (reference parses features.tsv with the default
        comma separator, seqscope.py:34)."""
        import pandas as pd
        import scipy.io
        import scipy.sparse

        ref_sq = _need("spateo.io.seqscope")
        import spateo_tpu.io.platforms as my_p

        rng = np.random.default_rng(6)
        qdir = tmp_path / "seqscope"
        qdir.mkdir()
        nq, gq = 30, 5
        qbcs = [f"SB{i}" for i in range(nq)]
        (qdir / "barcodes.tsv").write_text("\n".join(qbcs) + "\n")
        (qdir / "features.tsv").write_text("\n".join(f"nm{j}\tENSQ{j}\tG" for j in range(gq)) + "\n")
        # genes x barcodes on disk; both readers transpose (seqscope.py:37)
        scipy.io.mmwrite(str(qdir / "matrix.mtx"), scipy.sparse.csr_matrix(rng.poisson(1.5, (gq, nq))))
        qpos = tmp_path / "qpos.txt"
        with open(qpos, "w") as f:
            for b in qbcs:
                # coarse coords so bins repeat (labels must categorize)
                f.write(f"{b} 1 1 {rng.integers(0, 4) * 10} {rng.integers(0, 4) * 10}\n")

        r = ref_sq.read_seqscope(str(qdir), str(qpos), binsize=10, add_props=True)
        m = my_p.read_seqscope(str(qdir), str(qpos), binsize=10, add_props=True)
        assert np.array_equal(self._dense(r.X), self._dense(m.X))
        assert list(r.obs_names) == list(m.obs_names)
        np.testing.assert_allclose(np.asarray(r.obsm["spatial"], float), np.asarray(m.obsm["spatial"], float))
        np.testing.assert_array_equal(np.asarray(r.obs["area"], float), np.asarray(m.obs["area"], float))
        assert list(m.var_names) == [f"ENSQ{j}" for j in range(gq)]  # real ids

    def test_read_merfish_contract(self, tmp_path):
        """MERFISH reader contract (the reference's positions path needs
        openpyxl, absent in this image — merfish.py:38 — so the reference
        cannot run; and reference read_merfish assigns the UNALIGNED
        ``np.array(df_loc)`` to obsm after subsetting adata, merfish.py:58,
        which we deliberately fix by aligning on obs_names)."""
        import pandas as pd

        import spateo_tpu.io.platforms as my_p

        rng = np.random.default_rng(7)
        genes = [f"gene{j}" for j in range(5)]
        cells = [f"cell{i}" for i in range(12)]
        # genes x cells counts CSV, reader transposes (merfish.py:22)
        counts = pd.DataFrame(rng.poisson(2.0, (5, 12)).astype(int), index=genes, columns=cells)
        counts_path = tmp_path / "counts.csv"
        counts.to_csv(counts_path)
        # positions for a shuffled superset of cells
        pos_cells = cells[::-1] + ["extra1"]
        pos = pd.DataFrame(
            {"x": rng.uniform(-50, 50, len(pos_cells)), "y": rng.uniform(-50, 50, len(pos_cells))},
            index=pos_cells,
        )
        pos_path = tmp_path / "positions.csv"
        pos.to_csv(pos_path, header=False)

        m = my_p.read_merfish(str(counts_path), str(pos_path))
        assert sorted(m.obs_names) == sorted(cells)
        assert list(m.var_names) == genes
        # X rows follow obs_names; compare against the transposed counts
        expect = counts.T.loc[list(m.obs_names)].values
        assert np.array_equal(self._dense(m.X), expect)
        # spatial is min-shifted (df_loc - min(x.min(), y.min()), merfish.py:40)
        # and row-aligned with obs_names
        pos32 = pos.astype(np.float32)
        shift = min(pos32["x"].min(), pos32["y"].min())
        expect_sp = (pos32.loc[list(m.obs_names)] - shift).values
        np.testing.assert_allclose(np.asarray(m.obsm["spatial"], np.float32), expect_sp, rtol=1e-6)

    def test_stitch_images_contract(self, tmp_path):
        """stitch_images contract (reference io/nanostring.py:99 reads via
        skimage, stubbed in the harness, so pinned directly): _FXXX filename
        parsing, exact FOV-set validation, min-offset origin, the
        fliplr(swapaxes) tile orientation, and label uniquification."""
        import cv2
        import pandas as pd

        import spateo_tpu.io.platforms as my_p
        from spateo_tpu.errors import IOError as SpateoIOError

        sdir = tmp_path / "stains"
        sdir.mkdir()
        rng = np.random.default_rng(8)
        img1 = rng.integers(1, 200, (4, 6)).astype(np.uint8)  # H=4, W=6
        img2 = rng.integers(1, 200, (4, 6)).astype(np.uint8)
        assert cv2.imwrite(str(sdir / "stain_F001.tif"), img1)
        assert cv2.imwrite(str(sdir / "stain_F002.tif"), img2)
        pos = pd.DataFrame({"fov": [1, 2], "x_global_px": [10, 10], "y_global_px": [20, 24]})
        pos_path = tmp_path / "pos.csv"
        pos.to_csv(pos_path, index=False)

        out = my_p.stitch_images(str(sdir), str(pos_path))
        # canvas: x extent = W = 6 (swapped axes), y extent = 24+4-20 = 8
        assert out.shape == (6, 8)
        np.testing.assert_array_equal(out[:, 0:4], np.fliplr(img1.swapaxes(0, 1)))
        np.testing.assert_array_equal(out[:, 4:8], np.fliplr(img2.swapaxes(0, 1)))

        # labels mode: per-FOV labels offset to stay globally unique
        lab1 = np.zeros((4, 6), np.uint8)
        lab1[1:3, 1:3] = 1
        lab2 = np.zeros((4, 6), np.uint8)
        lab2[1:3, 1:3] = 1
        ldir = tmp_path / "labels"
        ldir.mkdir()
        assert cv2.imwrite(str(ldir / "lab_F001.tif"), lab1)
        assert cv2.imwrite(str(ldir / "lab_F002.tif"), lab2)
        lout = my_p.stitch_images(str(ldir), str(pos_path), labels=True)
        assert set(np.unique(lout)) == {0, 1, 2}  # FOV2's label got offset

        # FOV set mismatch must raise
        bad = pd.DataFrame({"fov": [1], "x_global_px": [10], "y_global_px": [20]})
        bad_path = tmp_path / "bad.csv"
        bad.to_csv(bad_path, index=False)
        with pytest.raises(SpateoIOError):
            my_p.stitch_images(str(sdir), str(bad_path))


class TestBPOracleGolden:
    """Pin loopy-BP marginals to an executable ground truth.

    The reference's BP is the compiled C++ `fbgbp` extension
    (/root/reference/spateo/segmentation/bp.py:74-92), which is not
    installable in this image; tests/bp_oracle.py re-implements its
    documented sum-product contract (Potts [[p,q],[q,p]] pairwise,
    synchronous message flooding, per-message normalization, L2
    message-delta convergence) as a slow, independent pure-Python oracle.
    These tests pin `ops/bp.py` and `ops/bp_pallas.py` to that oracle.

    Documented tolerance (also recorded in PARITY.md): marginal
    max-abs-diff <= 1e-4 on converged problems, <= 2e-5 at a fixed
    iteration count (f32 device kernel vs f64 oracle).
    """

    def _potentials(self, h, w, seed):
        rng = np.random.default_rng(seed)
        cell = np.clip(rng.beta(2.0, 2.0, (h, w)), 0.01, 0.99)
        # a couple of coherent blobs so BP has real structure to smooth
        yy, xx = np.mgrid[0:h, 0:w]
        for cy, cx, r in ((h // 3, w // 3, 3), (2 * h // 3, 2 * w // 3, 4)):
            cell[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = 0.95
        return 1.0 - cell, cell

    @pytest.mark.parametrize(
        "kind,k,hw",
        [("circle", 3, (16, 20)), ("square", 3, (16, 20)), ("circle", 5, (10, 12))],
    )
    def test_bp_matches_oracle_fixed_iters(self, kind, k, hw):
        """Fixed iteration count (precision below reach) — tight tolerance."""
        from bp_oracle import sum_product_grid_bp

        from spateo_tpu.ops import bp as bp_ops
        from spateo_tpu.ops.image import circle

        seed = {("circle", 3): 101, ("square", 3): 202, ("circle", 5): 303}[(kind, k)]
        bg, cell = self._potentials(*hw, seed=seed)
        neigh = np.ones((k, k)) if kind == "square" else circle(k)
        offsets = bp_ops.create_neighbor_offsets(np.asarray(neigh).astype(bool))
        n_iter = 25
        want = sum_product_grid_bp(bg, cell, offsets, p=0.6, q=0.4, precision=1e-12, max_iter=n_iter)
        got = bp_ops.run_bp(bg, cell, k=k, square=(kind == "square"), p=0.6, q=0.4, precision=1e-12, max_iter=n_iter)
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_bp_matches_oracle_converged(self):
        """Run both to L2 convergence; marginals must agree to 1e-4."""
        from bp_oracle import sum_product_grid_bp

        from spateo_tpu.ops import bp as bp_ops
        from spateo_tpu.ops.image import circle

        bg, cell = self._potentials(14, 18, seed=7)
        offsets = bp_ops.create_neighbor_offsets(circle(3).astype(bool))
        want, n_iter = sum_product_grid_bp(
            bg, cell, offsets, p=0.7, q=0.3, precision=1e-6, max_iter=300, return_n_iter=True
        )
        assert n_iter < 300, "oracle did not converge — test problem is degenerate"
        got = bp_ops.run_bp(bg, cell, k=3, p=0.7, q=0.3, precision=1e-6, max_iter=300)
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_pallas_bp_matches_oracle(self):
        """The Pallas message kernel (interpret mode) against the oracle."""
        import jax.numpy as jnp

        from bp_oracle import sum_product_grid_bp

        from spateo_tpu.ops import bp as bp_ops
        from spateo_tpu.ops.bp_pallas import bp_kernel_pallas
        from spateo_tpu.ops.image import circle

        bg, cell = self._potentials(12, 16, seed=11)
        offsets = bp_ops.create_neighbor_offsets(circle(3).astype(bool))
        want = sum_product_grid_bp(bg, cell, offsets, p=0.6, q=0.4, precision=1e-12, max_iter=20)
        phi = np.stack([bg, cell], axis=-1).astype(np.float32)
        phi = phi / phi.sum(axis=-1, keepdims=True)
        got = np.asarray(bp_kernel_pallas(jnp.asarray(phi), 0.6, 0.4, 1e-12, 20, interpret=True))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_em_bp_mask_parity_vs_oracle(self, nb_raster):
        """End-to-end EM+BP: masks from our BP vs oracle BP must agree.

        Shares the EM conditionals (pinned to the reference by
        TestEMGolden) and the threshold+morphology tail; only the BP stage
        differs. This is the acceptance test VERDICT r3 asked for: the
        flagship Starro EM+BP mask cannot silently diverge from sum-product
        semantics.
        """
        from bp_oracle import sum_product_grid_bp

        from spateo_tpu.ops import bp as bp_ops
        from spateo_tpu.ops.threshold import threshold_otsu
        from spateo_tpu.ops.image import circle
        from spateo_tpu.segmentation import em as my_em
        from spateo_tpu.segmentation import utils as seg_utils
        from spateo_tpu.segmentation.utils import conv2d

        k, mk = 3, 5
        res = np.asarray(conv2d(nb_raster.astype(float), k, mode="circle"))
        params = ((0.6, 0.4), (2.157, 10.314), (0.7285, 0.3042))
        bg_cond, cell_cond = (np.asarray(c) for c in my_em.conditionals(res, em_results=params))

        mine = np.asarray(bp_ops.run_bp(bg_cond, cell_cond, k=3, p=0.6, q=0.4, precision=1e-6, max_iter=100))
        offsets = bp_ops.create_neighbor_offsets(circle(3).astype(bool))
        want = sum_product_grid_bp(bg_cond, cell_cond, offsets, p=0.6, q=0.4, precision=1e-6, max_iter=100)

        assert np.max(np.abs(mine - want)) <= 1e-4

        def mask_from(scores):
            thr = threshold_otsu(scores)
            return np.asarray(seg_utils.apply_threshold(scores, mk, thr))

        m_mine, m_want = mask_from(mine), mask_from(want)
        inter = np.logical_and(m_mine, m_want).sum()
        union = np.logical_or(m_mine, m_want).sum()
        assert union > 0 and inter / union >= 0.999
