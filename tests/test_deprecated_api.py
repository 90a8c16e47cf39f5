"""The reference's deprecated alignment entry points must either work (as
shims onto the maintained solver) or fail with a pointer to the replacement
(VERDICT r3 #7). Parity: reference deprecated_morpho.py:221 `BA_align`,
deprecated_morpho_sparse.py:147 `BA_align_sparse`."""

import numpy as np
import pandas as pd
import pytest


def _slice_pair(n=120, seed=0):
    import spateo_tpu as st

    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 10, (n, 2)).astype(np.float32)
    X = rng.poisson(2.0, (n, 10)).astype(np.float32)
    th = 0.25
    R = np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]], np.float32)

    def mk(p):
        ad = st.AnnData(
            X=X.copy(),
            obs=pd.DataFrame(index=[str(i) for i in range(n)]),
            var=pd.DataFrame(index=[f"g{i}" for i in range(10)]),
        )
        ad.obsm["spatial"] = p
        st.SKM.init_adata_type(ad, "UMI")
        return ad

    return mk(pts), mk(pts @ R.T + np.array([1.0, -0.5], np.float32))


class TestDeprecatedMorphoAPI:
    def test_ba_align_shim_runs_and_writes_reference_keys(self):
        from spateo_tpu.alignment.methods.deprecated_morpho import BA_align

        A, B = _slice_pair()
        (outA, outB), P = BA_align(
            sampleA=A, sampleB=B, max_iter=30, vecfld_key_added="VecFld", verbose=False
        )
        # reference side effects: deprecated_morpho.py:620-652
        assert "align_spatial_nonrigid" in outB.obsm and "align_spatial_rigid" in outB.obsm
        assert "VecFld" in outB.uns
        assert P.shape == (B.n_obs, A.n_obs)
        assert np.isfinite(P).all() and P.sum() > 0
        # the rigid result must bring B's coords closer to A's than the input
        dA = np.asarray(A.obsm["spatial"])
        before = np.abs(np.asarray(B.obsm["spatial"]).mean(0) - dA.mean(0)).sum()
        after = np.abs(np.asarray(outB.obsm["align_spatial_rigid"]).mean(0) - dA.mean(0)).sum()
        assert after < before

    def test_ba_align_sparse_module_path(self):
        """The reference's direct module import path must resolve."""
        from spateo_tpu.alignment.methods.deprecated_morpho_sparse import BA_align_sparse

        A, B = _slice_pair(seed=1)
        (_, outB), P = BA_align_sparse(sampleA=A, sampleB=B, max_iter=20, verbose=False)
        assert "align_spatial_rigid" in outB.obsm
        assert P.shape == (B.n_obs, A.n_obs)
