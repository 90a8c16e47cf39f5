"""Device kernel tests: conv/threshold/morphology/EM/BP/labels."""

import numpy as np
import pytest
from scipy import signal

import spateo_tpu as st
from spateo_tpu.ops import bp as bp_ops
from spateo_tpu.ops import em as em_ops
from spateo_tpu.ops import image as img_ops
from spateo_tpu.ops import labels as lbl_ops
from spateo_tpu.ops import threshold as thr_ops


class TestImageOps:
    def test_circle(self):
        c = img_ops.circle(3)
        np.testing.assert_array_equal(c, [[0, 1, 0], [1, 1, 1], [0, 1, 0]])
        assert img_ops.circle(7).sum() > 20

    def test_conv2d_circle_matches_scipy(self, rng):
        X = rng.poisson(2, (32, 33)).astype(float)
        got = np.asarray(img_ops.conv2d(X, 5, mode="circle"))
        expected = signal.convolve2d(X, img_ops.circle(5), boundary="symm", mode="same")
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_conv2d_gauss_normalized(self, rng):
        X = np.ones((16, 16))
        got = np.asarray(img_ops.conv2d(X, 5, mode="gauss"))
        np.testing.assert_allclose(got, 1.0, rtol=1e-5)

    def test_conv2d_bins(self, rng):
        X = rng.poisson(2, (20, 20)).astype(float)
        bins = np.zeros((20, 20), int)
        bins[:10] = 1
        bins[10:] = 2
        got = np.asarray(img_ops.conv2d(X, 3, mode="circle", bins=bins))
        # per-bin conv must not leak across the bin boundary
        exp_top = signal.convolve2d(X * (bins == 1), img_ops.circle(3), boundary="symm", mode="same")
        np.testing.assert_allclose(got[:10], exp_top[:10], rtol=1e-5)

    def test_median_blur(self, rng):
        X = rng.integers(0, 255, (16, 16)).astype(float)
        got = np.asarray(img_ops.median_blur(X, 3))
        assert got.shape == X.shape
        # interior pixel check against numpy median
        i, j = 8, 8
        np.testing.assert_allclose(got[i, j], np.median(X[i - 1 : i + 2, j - 1 : j + 2]))

    def test_erode_dilate(self):
        mask = np.zeros((11, 11), bool)
        mask[3:8, 3:8] = True
        er = np.asarray(img_ops.erode(mask, 3, square=True))
        assert er.sum() == 9  # 5x5 -> 3x3
        di = np.asarray(img_ops.dilate(mask, 3, square=True))
        assert di.sum() == 49  # 5x5 -> 7x7

    def test_morphology_scipy_parity(self, rng):
        """Boolean shift-decomposed dilate/erode == scipy.ndimage with the
        same SE and cv2's border conventions (dilate: outside is background;
        erode: outside counts as FOREGROUND — cv2's default borderValue is
        morphologyDefaultBorderValue = +inf, which the reference's
        segmentation pipelines rely on at raster edges), for circle and
        square SEs of several radii."""
        from scipy import ndimage

        mask = rng.random((64, 57)) > 0.6
        for k in (3, 5, 7, 9):
            for square in (False, True):
                se = np.ones((k, k), bool) if square else img_ops.circle(k).astype(bool)
                got_d = np.asarray(img_ops.dilate(mask, k, square=square))
                exp_d = ndimage.binary_dilation(mask, structure=se)
                np.testing.assert_array_equal(got_d, exp_d, err_msg=f"dilate k={k} square={square}")
                got_e = np.asarray(img_ops.erode(mask, k, square=square))
                exp_e = ndimage.binary_erosion(mask, structure=se, border_value=1)
                np.testing.assert_array_equal(got_e, exp_e, err_msg=f"erode k={k} square={square}")

    def test_mclose_mopen_removes_noise(self):
        mask = np.zeros((20, 20), bool)
        mask[5:15, 5:15] = True
        mask[0, 0] = True  # speck
        out = np.asarray(img_ops.mclose_mopen(mask, 3))
        assert not out[0, 0]
        assert out[7:13, 7:13].all()


class TestThreshold:
    def test_otsu_bimodal(self, rng):
        X = np.concatenate([rng.normal(10, 2, 5000), rng.normal(50, 5, 5000)])
        t = thr_ops.threshold_otsu(X)
        assert 15 < t < 40

    def test_multiotsu_trimodal(self, rng):
        X = np.concatenate([rng.normal(10, 1, 3000), rng.normal(40, 2, 3000), rng.normal(90, 3, 3000)])
        t = thr_ops.threshold_multiotsu(X, classes=3)
        assert len(t) == 2
        assert 12 < t[0] < 35 and 45 < t[1] < 85

    def test_knee(self, rng):
        X = rng.exponential(5, 10000).astype(int)
        t = thr_ops.knee_threshold(X)
        assert 0 < t < X.max()


class TestEM:
    def test_nbn_em_recovers_params(self, rng):
        # background: NB(mean 5, var 10); cells: NB(mean 100, var 200)
        def nb_sample(mean, var, size):
            r = mean**2 / (var - mean)
            p = mean / var
            return rng.negative_binomial(r, p, size)

        X = np.concatenate([nb_sample(5, 10, 8000), nb_sample(100, 200, 2000)]).astype(float)
        w, r, p = em_ops.nbn_em(X, w=(0.5, 0.5), mu=(3, 50), var=(6, 100), precision=1e-5)
        mu_b = r[0] * (1 - p[0]) / p[0]
        mu_c = r[1] * (1 - p[1]) / p[1]
        assert 4 < mu_b < 6.5
        assert 85 < mu_c < 115
        assert 0.7 < w[0] < 0.9

    def test_run_em_with_bins_matches_unbinned_per_bin(self, rng):
        X = rng.negative_binomial(2, 0.3, (40, 40)).astype(float)
        bins = np.ones((40, 40), int)
        bins[:, 20:] = 2
        res = em_ops.run_em(X, downsample=1.0, bins=bins, seed=0,
                            params=dict(w=(0.5, 0.5), mu=(2.0, 10.0), var=(4.0, 20.0)))
        assert set(res.keys()) == {1, 2}
        for label, (w, r, p) in res.items():
            assert len(w) == 2 and len(r) == 2 and len(p) == 2
            assert 0 <= w[0] <= 1

    def test_confidence_monotone(self, rng):
        X = rng.negative_binomial(2, 0.3, (20, 20)).astype(float)
        em_results = ((0.8, 0.2), (2.0, 2.0), (0.6, 0.2))
        conf = em_ops.confidence(X, em_results)
        assert conf.shape == X.shape
        assert (conf >= 0).all() and (conf <= 1).all()


class TestBP:
    def test_bp_sharpens_probabilities(self, rng):
        # two blocks: clear cell region and clear background + noisy pixels
        cell_prob = np.full((20, 20), 0.3)
        cell_prob[5:15, 5:15] = 0.7
        # add noise
        noise = rng.uniform(-0.15, 0.15, cell_prob.shape)
        cell_prob = np.clip(cell_prob + noise, 0.05, 0.95)
        bg_prob = 1 - cell_prob
        marg = bp_ops.run_bp(bg_prob, cell_prob, k=3, p=0.7, q=0.3, max_iter=100)
        assert marg.shape == (20, 20)
        # BP should push interior pixels toward consensus
        assert marg[8:12, 8:12].mean() > 0.9
        assert marg[:3, :3].mean() < 0.1

    def test_neighbor_offsets(self):
        off = bp_ops.create_neighbor_offsets(img_ops.circle(3))
        assert off.shape == (4, 2)
        assert set(map(tuple, off.tolist())) == {(-1, 0), (1, 0), (0, -1), (0, 1)}


class TestLabels:
    def test_connected_components(self):
        mask = np.zeros((20, 20), bool)
        mask[2:5, 2:5] = True
        mask[10:14, 10:14] = True
        mask[18, 18] = True
        labels, n = lbl_ops.connected_components(mask)
        assert n == 3
        assert labels[3, 3] != labels[11, 11] != labels[18, 18]
        assert (labels[mask] > 0).all()
        assert (labels[~mask] == 0).all()

    def test_connected_components_4_vs_8(self):
        mask = np.zeros((4, 4), bool)
        mask[0, 0] = mask[1, 1] = True  # diagonal touch
        _, n8 = lbl_ops.connected_components(mask, connectivity=8)
        _, n4 = lbl_ops.connected_components(mask, connectivity=4)
        assert n8 == 1 and n4 == 2

    def test_distance_transform(self):
        mask = np.zeros((21, 21), bool)
        mask[5:16, 5:16] = True
        d = lbl_ops.distance_transform(mask)
        assert d[10, 10] == d.max()
        assert abs(d[10, 10] - 6 * 0.955) < 1.0  # ~6 px to boundary
        assert (d[~mask] == 0).all()

    def test_watershed_two_cells(self):
        # two circular blobs merged at the waist
        yy, xx = np.mgrid[0:40, 0:40]
        blob1 = (yy - 20) ** 2 + (xx - 12) ** 2 <= 64
        blob2 = (yy - 20) ** 2 + (xx - 28) ** 2 <= 64
        mask = blob1 | blob2
        dist = lbl_ops.distance_transform(mask)
        markers = np.zeros((40, 40), int)
        markers[20, 12] = 1
        markers[20, 28] = 2
        labels = lbl_ops.watershed(dist, markers, mask)
        assert (labels[mask] > 0).mean() > 0.98
        assert labels[20, 8] == 1
        assert labels[20, 32] == 2
        # the two sides split at the waist
        assert labels[20, 10] == 1 and labels[20, 30] == 2

    def test_expand_labels_capped(self):
        labels = np.zeros((20, 20), np.int32)
        labels[10, 5] = 1
        labels[10, 15] = 2
        out = lbl_ops.expand_labels_capped(labels, distance=3, max_area=1000)
        assert out[10, 5] == 1 and out[7, 5] == 1  # expanded up 3
        assert (out == 1).sum() > 10
        # cap: tiny max area stops expansion immediately
        out2 = lbl_ops.expand_labels_capped(labels, distance=3, max_area=1)
        assert (out2 == 1).sum() == 1

    def test_label_overlap(self):
        X = np.array([[0, 1, 1], [2, 2, 0]])
        Y = np.array([[0, 1, 2], [2, 2, 0]])
        o = lbl_ops.label_overlap(X, Y)
        assert o[1, 1] == 1 and o[1, 2] == 1 and o[2, 2] == 2 and o[0, 0] == 2

    def test_peak_local_max(self):
        X = np.zeros((20, 20))
        X[5, 5] = 10
        X[15, 15] = 8
        peaks = lbl_ops.peak_local_max(X, min_distance=3)
        assert peaks[5, 5] > 0 and peaks[15, 15] > 0
        assert peaks[5, 5] != peaks[15, 15]
        assert (peaks > 0).sum() == 2

    def test_find_boundaries(self):
        labels = np.zeros((10, 10), int)
        labels[2:8, 2:8] = 1
        b = lbl_ops.find_boundaries(labels)
        assert b[2, 2] and b[2, 5] and not b[4, 4]


class TestPallasBP:
    def test_pallas_matches_xla(self):
        """Interpret-mode Pallas BP vs the generic XLA kernel."""
        import jax.numpy as jnp

        from spateo_tpu.ops.bp import _bp_kernel
        from spateo_tpu.ops.bp_pallas import OFFSETS4, bp_kernel_pallas

        rng = np.random.default_rng(0)
        H, W = 40, 72  # non-multiples of the (8, 128) tile: exercises padding
        cell = rng.uniform(0, 1, (H, W)).astype(np.float32)
        bg = 1 - cell + rng.uniform(0, 0.2, (H, W)).astype(np.float32)
        phi = np.stack([bg, cell], -1)
        phi = phi / phi.sum(-1, keepdims=True)
        ref = np.asarray(_bp_kernel(jnp.asarray(phi), OFFSETS4, 0.6, 0.4, 1e-6, 25))
        pal = np.asarray(bp_kernel_pallas(jnp.asarray(phi), 0.6, 0.4, 1e-6, 25, interpret=True))
        np.testing.assert_allclose(pal, ref, atol=2e-6)

    def test_dispatch_off_on_cpu(self):
        from spateo_tpu.ops.bp import _use_pallas_bp
        from spateo_tpu.ops.bp_pallas import OFFSETS4

        assert not _use_pallas_bp(OFFSETS4)  # tests run on CPU
        assert not _use_pallas_bp(((0, 1), (1, 0)))  # non-standard neighborhood


class TestEstepPallas:
    def test_interpret_matches_xla_estep(self):
        """The Pallas-fused E-step (ops/estep_pallas.py) reproduces every
        reduction of the XLA dense path (interpret mode on CPU)."""
        import jax.numpy as jnp

        from spateo_tpu.alignment.methods.math import estep_reduced, factorize_distance
        from spateo_tpu.ops.estep_pallas import estep_pallas

        rng = np.random.default_rng(0)
        NA, B, D, G = 700, 300, 2, 24
        XAHat = rng.normal(size=(NA, D)).astype(np.float32)
        coordsA = rng.normal(size=(NA, D)).astype(np.float32)
        coordsB = rng.normal(size=(B, D)).astype(np.float32)
        a, b, A, Bf = factorize_distance(
            rng.poisson(2.0, (NA, G)).astype(np.float32), rng.poisson(2.0, (B, G)).astype(np.float32), "kl"
        )
        mm = rng.uniform(0.5, 1, NA).astype(np.float32)
        kw = dict(sigma2=jnp.asarray(0.4), gamma=jnp.asarray(0.7),
                  samples_s=jnp.asarray(3.0), sigma2_variance=jnp.asarray(1.5))
        ref = estep_reduced(
            float(D), jnp.asarray(XAHat), jnp.asarray(coordsA), jnp.asarray(coordsB),
            (a,), (b,), (A,), (Bf,), kw["sigma2"], jnp.asarray(mm), kw["gamma"],
            kw["samples_s"], kw["sigma2_variance"], ["gauss"], [jnp.asarray(0.3)], n_chunks=1,
        )
        out = estep_pallas(
            jnp.asarray(XAHat), jnp.asarray(coordsA), jnp.asarray(coordsB),
            a, b, A, Bf, jnp.asarray(mm), kw["sigma2"], kw["gamma"], kw["samples_s"],
            kw["sigma2_variance"], jnp.asarray(0.3), interpret=True,
        )
        for k in ref:
            r, o = np.asarray(ref[k]), np.asarray(out[k])
            err = np.max(np.abs(r - o) / (np.abs(r) + 1e-6))
            assert err < 5e-4, f"{k}: {err}"


class TestInlierPallas:
    def test_interpret_matches_xla_inlier(self):
        """The fused coarse-init inlier EM (ops/inlier_pallas.py) reproduces
        the XLA fori_loop kernel (interpret mode on CPU)."""
        import jax.numpy as jnp

        from spateo_tpu.alignment.methods.math import _inlier_from_NN_kernel
        from spateo_tpu.ops.inlier_pallas import inlier_from_NN_pallas

        rng = np.random.default_rng(0)
        n, N = 1900, 2048  # masked padding rows
        th = 0.4
        R_true = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)
        tx = rng.uniform(0, 5, (N, 2)).astype(np.float32)
        ty = (tx @ R_true.T + np.array([1.0, -2.0], np.float32)).astype(np.float32)
        ty[: n // 3] += rng.normal(0, 2.0, (n // 3, 2)).astype(np.float32)  # outliers
        dist = rng.uniform(0, 3, (N, 1)).astype(np.float32)
        tx[n:] = tx[0]
        ty[n:] = ty[0]
        dist[n:] = dist[0]
        mask = np.zeros((N, 1), np.float32)
        mask[:n] = 1.0

        args = (jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(dist), jnp.asarray(mask), jnp.asarray(float(n)))
        P_ref, R_ref, t_ref, w_ref, s2_ref, g_ref = _inlier_from_NN_kernel(*args)
        P, R, t, w, s2, g = inlier_from_NN_pallas(*args, interpret=True)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_ref), atol=2e-5)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_ref), atol=2e-4)
        np.testing.assert_allclose(np.asarray(P).ravel(), np.asarray(P_ref).ravel(), atol=1e-3)
        np.testing.assert_allclose(np.asarray(w), np.asarray(w_ref), atol=1e-5)
        assert abs(float(s2) - float(s2_ref)) < 1e-3 * max(float(s2_ref), 1e-3)
        assert abs(float(g) - float(g_ref)) < 1e-3
        # recovered the planted transform
        np.testing.assert_allclose(np.asarray(R), R_true, atol=0.05)

    def test_tile_skipping_parity_with_morton_order(self):
        """With Morton-ordered rows and a small sigma2, most [TA, TB] tiles
        fail the min(d) < 80*sigma2 test and are skipped; the reductions
        must still match the dense XLA path (skipped contributions are
        < e^-40 each)."""
        import jax.numpy as jnp

        from spateo_tpu.alignment.methods.math import estep_reduced, factorize_distance, morton_code
        from spateo_tpu.ops.estep_pallas import estep_pallas

        rng = np.random.default_rng(1)
        NA, B, G = 1600, 600, 12
        pts = rng.uniform(0, 1, (NA, 2)).astype(np.float32)
        order = np.argsort(morton_code(pts))
        XAHat = pts[order]
        coordsA = XAHat.copy()
        ptsB = rng.uniform(0, 1, (B, 2)).astype(np.float32)
        coordsB = ptsB[np.argsort(morton_code(ptsB))]
        a, b, A, Bf = factorize_distance(
            rng.poisson(2.0, (NA, G)).astype(np.float32), rng.poisson(2.0, (B, G)).astype(np.float32), "kl")
        mm = jnp.asarray(rng.uniform(0.5, 1, NA).astype(np.float32))
        sigma2 = jnp.asarray(2e-4)  # tiny: interaction radius ~ 0.13 of the unit box
        kw = dict(gamma=jnp.asarray(0.7), samples_s=jnp.asarray(1.0), sigma2_variance=jnp.asarray(2.0))
        ref = estep_reduced(
            2.0, jnp.asarray(XAHat), jnp.asarray(coordsA), jnp.asarray(coordsB),
            (a,), (b,), (A,), (Bf,), sigma2, mm, kw["gamma"], kw["samples_s"],
            kw["sigma2_variance"], ["gauss"], [jnp.asarray(0.3)], n_chunks=1,
        )
        args = (jnp.asarray(XAHat), jnp.asarray(coordsA), jnp.asarray(coordsB),
                a, b, A, Bf, mm, sigma2, kw["gamma"], kw["samples_s"],
                kw["sigma2_variance"], jnp.asarray(0.3))
        # shrink the tiles so Morton neighborhoods are smaller than the
        # interaction radius and tiles genuinely skip (default 512x256
        # tiles cover most of the unit box at this problem size)
        import spateo_tpu.ops.estep_pallas as ep

        old = (ep.TA, ep.TB, ep._SKIP_MULT)
        try:
            ep.TA, ep.TB = 128, 128
            out = ep.estep_pallas.__wrapped__(*args, interpret=True)
            ep._SKIP_MULT = 1e30  # force-disable skipping
            out_noskip = ep.estep_pallas.__wrapped__(*args, interpret=True)
            ep._SKIP_MULT = 0.0  # skip EVERY tile: proves the guard is live
            out_allskip = ep.estep_pallas.__wrapped__(*args, interpret=True)
        finally:
            ep.TA, ep.TB, ep._SKIP_MULT = old
        assert np.max(np.abs(np.asarray(out_allskip["K_NA"]))) == 0.0
        for k in ref:
            r, o, o2 = np.asarray(ref[k]), np.asarray(out[k]), np.asarray(out_noskip[k])
            scale = np.max(np.abs(r)) + 1e-12
            # vs the dense XLA path: FP reduction-order spread at spiky sigma2
            assert np.max(np.abs(r - o)) / scale < 5e-4, f"{k}"
            # the skip itself contributes nothing (dropped mass < e^-40/tile)
            assert np.max(np.abs(o - o2)) / scale < 1e-6, f"skip changed {k}"


class TestHistogramSorted:
    def test_counts_match_numpy(self):
        import jax.numpy as jnp

        from spateo_tpu.ops.threshold import _histogram_chunked

        rng = np.random.default_rng(0)
        idx = rng.integers(0, 256, 100_000).astype(np.int32)
        h = np.asarray(_histogram_chunked(jnp.asarray(idx), 256))
        np.testing.assert_array_equal(h, np.bincount(idx, minlength=256).astype(np.float32))

    def test_otsu_unchanged(self):
        from spateo_tpu.ops.threshold import threshold_otsu

        rng = np.random.default_rng(1)
        vals = np.concatenate([rng.normal(1, 0.3, 5000), rng.normal(5, 0.5, 5000)]).astype(np.float32)
        t = threshold_otsu(vals)
        assert 1.8 < t < 4.2


class TestBPCheckEvery:
    def test_blocked_checks_match_per_iteration(self):
        """check_every>1 produces the same marginals as per-iteration checks
        when the loop runs to max_iter (no early exit)."""
        import jax.numpy as jnp

        from spateo_tpu.ops.bp_pallas import bp_kernel_pallas

        rng = np.random.default_rng(2)
        phi = rng.uniform(0.1, 0.9, (16, 128, 2)).astype(np.float32)
        phi /= phi.sum(-1, keepdims=True)
        a = np.asarray(bp_kernel_pallas(jnp.asarray(phi), 0.6, 0.4, 1e-12, 20, check_every=1, interpret=True))
        b = np.asarray(bp_kernel_pallas(jnp.asarray(phi), 0.6, 0.4, 1e-12, 20, check_every=7, interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-6)

    def test_fixed_iteration_mode(self):
        """precision<=0 runs exactly max_iter iterations (matches the
        per-iteration path run to completion)."""
        import jax.numpy as jnp

        from spateo_tpu.ops.bp_pallas import bp_kernel_pallas

        rng = np.random.default_rng(3)
        phi = rng.uniform(0.1, 0.9, (16, 128, 2)).astype(np.float32)
        phi /= phi.sum(-1, keepdims=True)
        a = np.asarray(bp_kernel_pallas(jnp.asarray(phi), 0.6, 0.4, 0.0, 15, interpret=True))
        b = np.asarray(bp_kernel_pallas(jnp.asarray(phi), 0.6, 0.4, 1e-30, 15, check_every=1, interpret=True))
        np.testing.assert_allclose(a, b, atol=1e-6)
