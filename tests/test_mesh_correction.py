"""Native MRF solver + Mesh_correction (reference parity:
spateo/alignment/methods/morpho_mesh_correction.py + libfastpd)."""

import itertools

import numpy as np
import pytest

import spateo_tpu as st
from spateo_tpu.native import fastpd


class TestNativeFastPD:
    def test_exact_on_small_mrf(self):
        rng = np.random.default_rng(0)
        L, N = 5, 4
        pairs = np.array(list(itertools.combinations(range(N), 2)), np.int32)
        u = rng.uniform(0, 1, (L, N)).astype(np.float32)
        b = rng.uniform(0, 1, (len(pairs), L, L)).astype(np.float32)
        labels = fastpd(u, list(b), pairs, 100)

        def energy(x):
            return sum(u[x[v], v] for v in range(N)) + sum(b[k, x[i], x[j]] for k, (i, j) in enumerate(pairs))

        best = min(itertools.product(range(L), repeat=N), key=energy)
        assert tuple(labels) == best

    def test_python_fallback_matches(self):
        from spateo_tpu.native import _fastpd_python

        rng = np.random.default_rng(1)
        L, N = 4, 3
        pairs = np.array(list(itertools.combinations(range(N), 2)), np.int32)
        u = rng.uniform(0, 1, (L, N)).astype(np.float32)
        b = rng.uniform(0, 1, (len(pairs), L, L)).astype(np.float32)
        native = fastpd(u, list(b), pairs, 200)
        py = _fastpd_python(u, b, pairs, 200, 0)

        def energy(x):
            return sum(u[x[v], v] for v in range(N)) + sum(b[k, x[i], x[j]] for k, (i, j) in enumerate(pairs))

        # both should land on (near-)optimal energies
        assert energy(py) <= energy(native) + 1e-4


class TestMeshCorrectionComponents:
    def test_transform_points_roundtrip(self):
        from spateo_tpu.alignment.methods.mesh_correction import _transform_points

        pts = np.random.default_rng(0).normal(size=(50, 3))
        out = _transform_points(pts, [0, 0, 0], 0.0, 1.0)
        np.testing.assert_allclose(out, pts, atol=1e-12)
        out = _transform_points(pts, [0, 0, 90], 0.0, 1.0)
        # rotation preserves distances from the centroid
        c = pts.mean(0)
        np.testing.assert_allclose(
            np.linalg.norm(out - out.mean(0), axis=1), np.linalg.norm(pts - c, axis=1), rtol=1e-6
        )

    def test_mesh_sections(self):
        from scipy.spatial import ConvexHull

        from spateo_tpu.alignment.methods.mesh_correction import _extract_contours_from_mesh

        rng = np.random.default_rng(0)
        sp = rng.normal(size=(300, 3))
        sp /= np.linalg.norm(sp, axis=1, keepdims=True)
        hull = ConvexHull(sp)
        secs, ok = _extract_contours_from_mesh(sp, hull.simplices, [0.0, 0.5])
        assert ok
        # unit-sphere sections: radii ~1 at z=0, ~sqrt(0.75) at z=0.5
        r0 = np.linalg.norm(secs[0], axis=1).mean()
        r5 = np.linalg.norm(secs[1], axis=1).mean()
        assert abs(r0 - 1.0) < 0.1
        assert abs(r5 - np.sqrt(0.75)) < 0.1
        # plane outside the mesh -> not ok
        _, ok2 = _extract_contours_from_mesh(sp, hull.simplices, [2.0])
        assert not ok2

    def test_icp_recovers_translation(self):
        from spateo_tpu.alignment.methods.mesh_correction import ICP

        rng = np.random.default_rng(0)
        th = np.linspace(0, 2 * np.pi, 200, endpoint=False)
        ring = np.stack([np.cos(th), np.sin(th)], 1)
        shifted = ring + np.array([0.3, -0.2])
        gamma, _, _, _, aligned, _ = ICP(ring, shifted, allow_rotation=False)
        assert gamma > 0.9
        np.testing.assert_allclose(aligned.mean(0), ring.mean(0), atol=0.05)


class TestMeshCorrectionEndToEnd:
    def test_correction_reduces_slice_drift(self):
        from scipy.spatial import ConvexHull

        from spateo_tpu.tdr.models.mesh_core import Mesh

        rng = np.random.default_rng(0)
        sp = rng.normal(size=(400, 3))
        sp /= np.linalg.norm(sp, axis=1, keepdims=True)
        sp = sp * np.array([1.0, 0.8, 0.6])
        mesh = Mesh(sp, ConvexHull(sp).simplices)

        z_heights = np.linspace(-0.45, 0.45, 4)
        slices, shifts = [], []
        for z in z_heights:
            a = np.sqrt(max(1 - (z / 0.6) ** 2, 1e-6))
            th = rng.uniform(0, 2 * np.pi, 400)
            rr = np.sqrt(rng.uniform(0, 1, 400))
            pts = np.stack([a * rr * np.cos(th), 0.8 * a * rr * np.sin(th)], 1)
            shift = rng.uniform(-0.15, 0.15, 2)
            shifts.append(shift)
            ad = st.AnnData(X=np.ones((400, 2), np.float32))
            st.SKM.init_adata_type(ad, "UMI")
            ad.obsm["spatial"] = pts + shift
            slices.append(ad)

        mc = st.align.Mesh_correction(
            slices, z_heights, mesh, label_num=5, fastpd_iter=30, max_iter=2,
            max_rotation_angle=15, max_translation_scale=0.2, max_scaling=1.15,
        )
        mc.extract_contours(alpha_shape_kwargs={"alpha": 2.0})
        assert all(c is not None and len(c) >= 20 for c in mc.contours)
        mc.run_discrete_optimization()
        assert mc.best_loss < 1.0
        out = mc.perform_correction()
        assert all(o.shape[1] == 3 for o in out)
        resid = np.mean([np.linalg.norm(np.asarray(o)[:, :2].mean(0)) for o in out])
        orig = np.mean([np.linalg.norm(s) for s in shifts])
        assert resid < orig  # drift reduced
        assert all("align_spatial" in s.obsm for s in slices)

    def test_validation_errors(self):
        from scipy.spatial import ConvexHull

        from spateo_tpu.tdr.models.mesh_core import Mesh

        rng = np.random.default_rng(0)
        sp = rng.normal(size=(50, 3))
        mesh = Mesh(sp, ConvexHull(sp).simplices)
        ad = st.AnnData(X=np.ones((5, 2), np.float32))
        st.SKM.init_adata_type(ad, "UMI")
        ad.obsm["spatial"] = np.zeros((5, 2))
        with pytest.raises(ValueError, match="unique"):
            st.align.Mesh_correction([ad, ad], [1.0, 1.0], mesh)
        with pytest.raises(ValueError, match="same length"):
            st.align.Mesh_correction([ad, ad], [1.0, 2.0, 3.0], mesh)
