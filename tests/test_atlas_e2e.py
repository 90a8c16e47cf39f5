"""Atlas-scale end-to-end pipeline test (VERDICT r4 #1).

Runs the SAME `bench.atlas_e2e` the driver benches (segmentation stream ->
labeling -> centroid extraction -> serial `st.align.morpho_align` chain ->
batched morphofield with fused div/curl -> digitization PDE + per-cell
layers) at tiny shapes, and pins correctness of every stage's output plus
the cross-stage contracts (the big-run config only scales sizes).
Marked slow via tests/_slow_manifest.py.
"""

import sys

import numpy as np
import pytest

sys.path.insert(0, ".")


@pytest.fixture(scope="module")
def atlas_result():
    import bench

    return bench.atlas_e2e(
        n_slices=2,
        tile=256,
        spacing=10,
        n_genes=12,
        align_max_iter=60,
        svi_batch=400,
        vfc_M=24,
        vfc_iters=15,
        pde_max_itr=1500,
        n_layers=5,
        seed=0,
    )


class TestAtlasE2E:
    def test_segmentation_recovers_most_cells(self, atlas_result):
        r = atlas_result
        # planted lattice: ((256 - 24) // 10 + 1)^2 = 576 cells per slice;
        # the Starro->watershed chain must recover the large majority
        for n in r["cells_found_per_slice"]:
            assert n >= 0.6 * 576, r["cells_found_per_slice"]
        assert 0.05 < r["checks"]["mask_frac"] < 0.7

    def test_alignment_chain_accuracy(self, atlas_result):
        # the chain maps the last slice back onto the tissue frame: median
        # error well under the 10 px cell pitch
        assert atlas_result["checks"]["align_last_slice_med_err_px"] < 5.0

    def test_morphofield_outputs_finite(self, atlas_result):
        assert atlas_result["checks"]["div_finite"]

    def test_digitization_layers_span_bins(self, atlas_result):
        assert atlas_result["checks"]["digital_layer_bins"] >= 3
        assert atlas_result["pde_iters"] > 0

    def test_throughput_accounting(self, atlas_result):
        r = atlas_result
        stages = r["stage_seconds"]
        assert set(stages) == {
            "segmentation_stream",
            "labeling_centroids",
            "alignment_chain",
            "morphofield_divcurl",
            "digitization",
        }
        assert all(v >= 0 for v in stages.values())
        assert abs(sum(stages.values()) - r["wall_seconds"]) < 0.02
        assert r["total_cell_slices"] == r["cells_per_slice"] * r["n_slices"]
        assert r["cells_slices_per_min"] > 0


class TestAtlasQuadrantTiling:
    def test_quadrant_tiling_matches_single_tile(self, atlas_result):
        """Processing each slice as a grid of seg_tile quadrants (the
        production tile-stream shape) finds the same cells as whole-slice
        labeling, minus only the <2% seam-band exclusions, and keeps chain
        accuracy."""
        import bench

        r = bench.atlas_e2e(
            n_slices=2, tile=256, spacing=10, n_genes=12, align_max_iter=60,
            svi_batch=400, vfc_M=24, vfc_iters=15, pde_max_itr=1500,
            n_layers=5, seg_tile=128, seed=0,
        )
        whole = atlas_result  # nq=1 fixture (seg_tile clamped to tile)
        # the 12 px seam band spans ~10% of a 256 px test tile (vs ~1% of
        # the production 4096 px slice), so the tiny geometry loses more
        for nq_cells, whole_cells in zip(r["cells_found_per_slice"], whole["cells_found_per_slice"]):
            assert nq_cells >= 0.8 * whole_cells, (nq_cells, whole_cells)
        assert r["checks"]["align_last_slice_med_err_px"] < 5.0
        assert r["checks"]["div_finite"]
