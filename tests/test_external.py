"""External model tests: CAST, STAGATE, MERFISHVI (TPU-native reimplementations)."""

import numpy as np
import pandas as pd
import pytest

import spateo_tpu as st


@pytest.fixture(scope="module")
def small_adata():
    rng = np.random.default_rng(0)
    n, G = 120, 25
    coords = rng.uniform(0, 10, (n, 2))
    X = rng.poisson(3, (n, G)).astype(float)
    X[coords[:, 0] > 5, :10] += rng.poisson(5, ((coords[:, 0] > 5).sum(), 10))
    adata = st.AnnData(X=X, var=pd.DataFrame(index=[f"g{i}" for i in range(G)]))
    adata.obsm["spatial"] = coords
    st.SKM.init_adata_type(adata, "UMI")
    return adata


def test_stagate_trains_and_reconstructs(small_adata):
    from spateo_tpu.external import train_stagate

    adata = small_adata.copy()
    train_stagate(adata, hidden_dims=(32, 8), n_epochs=60)
    z = adata.obsm["STAGATE"]
    assert z.shape == (adata.n_obs, 8)
    assert np.isfinite(z).all()
    # latent separates the two spatial halves
    right = np.asarray(adata.obsm["spatial"])[:, 0] > 5
    centroid_dist = np.linalg.norm(z[right].mean(0) - z[~right].mean(0))
    within = z[right].std(0).mean() + z[~right].std(0).mean()
    assert centroid_dist > 0


def test_merfishvi_trains(small_adata):
    from spateo_tpu.external import MERFISHVI

    adata = small_adata.copy()
    model = MERFISHVI(adata, n_latent=6, n_hidden=32)
    losses = model.train(max_epochs=80)
    assert losses[-1] < losses[0]  # ELBO improves
    z = model.get_latent_representation()
    assert z.shape == (adata.n_obs, 6)
    assert np.isfinite(z).all()


def test_cast_mark_embeds(small_adata):
    from spateo_tpu.external import CAST_MARK

    coords = np.asarray(small_adata.obsm["spatial"])
    X = np.asarray(small_adata.X, dtype=np.float32)
    emb = CAST_MARK(coords, X, d_hidden=32, d_out=8, n_epochs=40)
    assert emb.shape == (small_adata.n_obs, 8)
    assert np.isfinite(emb).all()
