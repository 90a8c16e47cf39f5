"""Spatial neighbor graphs and kernel weights
(capability parity: reference spateo/tools/find_neighbors.py).

TPU-native additions: `get_wi_batch` computes the kernel weights of MANY
samples at once as one blocked pairwise-distance kernel on device — the
building block that turns MuSIC's per-cell Python loop (reference
MuSIC.py:2991) into a data-parallel fan-out.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse
from scipy.sparse import csr_matrix

from ..core.anndata import AnnData
from ..logging import logger_manager as lm


def calculate_distance(position: np.ndarray, dist_metric: str = "euclidean") -> np.ndarray:
    """Full pairwise distance matrix (parity: find_neighbors.py:28)."""
    from scipy.spatial.distance import cdist

    return cdist(position, position, metric=dist_metric)


def local_dist(coords_i: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """Distances from one sample to all samples (parity: find_neighbors.py:35)."""
    return np.sqrt(((coords_i[None, :] - coords) ** 2).sum(axis=1))


def jaccard_index(row_i: np.ndarray, array: np.ndarray) -> np.ndarray:
    """Jaccard index of one binary row vs all rows (parity: find_neighbors.py:51)."""
    row_i = row_i.astype(bool)
    array = array.astype(bool)
    inter = (array & row_i).sum(axis=1)
    union = (array | row_i).sum(axis=1)
    return inter / np.maximum(union, 1)


def normalize_adj(adj: np.ndarray, exclude_self: bool = True) -> np.ndarray:
    """Symmetric degree normalization D^-1/2 (A) D^-1/2 (parity:
    find_neighbors.py:67)."""
    adj = np.asarray(adj, dtype=float)
    if exclude_self:
        adj = adj - np.diag(np.diag(adj))
    d = adj.sum(axis=1)
    d_inv_sqrt = np.where(d > 0, 1.0 / np.sqrt(d), 0.0)
    return adj * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]


def adj_to_knn(adj: np.ndarray, n_neighbors: int = 15) -> Tuple[np.ndarray, np.ndarray]:
    """Adjacency matrix -> (indices, weights) KNN arrays (parity:
    find_neighbors.py:88)."""
    adj = np.asarray(adj)
    n = adj.shape[0]
    idx = np.argsort(-adj, axis=1)[:, :n_neighbors]
    wts = np.take_along_axis(adj, idx, axis=1)
    return idx, wts


def knn_to_adj(knn_indices: np.ndarray, knn_weights: np.ndarray) -> csr_matrix:
    """(indices, weights) -> sparse adjacency (parity: find_neighbors.py:126)."""
    n, k = knn_indices.shape
    rows = np.repeat(np.arange(n), k)
    return csr_matrix((knn_weights.ravel(), (rows, knn_indices.ravel())), shape=(n, n))


@partial(jax.jit, static_argnames=("function", "fixed", "exclude_self", "normalize"))
def _kernel_weights_batch(
    query: jnp.ndarray,  # [Q, D] query positions
    coords: jnp.ndarray,  # [N, D] all positions
    bw: jnp.ndarray,  # scalar (fixed) or int neighbor count (adaptive)
    function: str = "bisquare",
    fixed: bool = True,
    exclude_self: bool = False,
    normalize: bool = False,
    threshold: float = 1e-5,
    eps: float = 1.0000001,
    self_idx: Optional[jnp.ndarray] = None,  # [Q] global column of each query's self
) -> jnp.ndarray:
    """Kernel weights for a block of query samples — one fused kernel.

    Returns [Q, N] weights; the per-sample `Kernel` semantics of the
    reference (find_neighbors.py:392) applied batched.

    `self_idx` pins each query's own column to an EXACT zero distance: the
    matmul-form distance leaves a tiny positive residual at x == y in
    float32, which would make `exclude_self`'s zero-distance detection miss
    the diagonal.
    """
    d2 = jnp.sum(query**2, 1)[:, None] + jnp.sum(coords**2, 1)[None, :] - 2 * jnp.matmul(query, coords.T, precision="highest")
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    if self_idx is not None:
        dist = jnp.where(self_idx[:, None] == jnp.arange(coords.shape[0])[None, :], 0.0, dist)
    if fixed:
        bandwidth = bw  # scalar
        bw_dist = dist / bandwidth
    else:
        k = bw.astype(jnp.int32)
        offset = jnp.where(exclude_self, 1, 0)
        sorted_d = jnp.sort(dist, axis=1)
        bandwidth = jnp.take_along_axis(sorted_d, (k + offset)[None, None].repeat(dist.shape[0], 0), axis=1) * eps
        bw_dist = dist / bandwidth
    if exclude_self:
        bw_dist = jnp.where(bw_dist == 0.0, jnp.max(bw_dist, axis=1, keepdims=True), bw_dist)

    x = bw_dist
    if function == "triangular":
        k_val = 1 - x
    elif function == "uniform":
        k_val = jnp.ones_like(x) * 0.5
    elif function == "quadratic":
        k_val = (3.0 / 4) * (1 - x**2)
    elif function == "bisquare":
        k_val = (1 - x**2) ** 2
    elif function == "gaussian":
        k_val = jnp.exp(-0.5 * x**2)
    elif function == "exponential":
        k_val = jnp.exp(-x)
    else:
        raise ValueError(f"Unsupported kernel function {function}")
    # the reference truncates every kernel outside the bandwidth
    # (find_neighbors.py:505: `self.kernel[bw_dist > 1] = 0`)
    k_val = jnp.where(x > 1, 0.0, k_val)
    k_val = jnp.where(k_val < threshold, 0.0, k_val)
    if normalize:
        nnz = jnp.sum(k_val > 0, axis=1, keepdims=True)
        k_val = k_val / jnp.maximum(nnz, 1)
    return k_val


@partial(jax.jit, static_argnames=("function", "fixed", "exclude_self", "normalize"))
def _conditioned_kernel_weights_batch(
    query: jnp.ndarray,  # [Q, D] query positions (spatial or expression space)
    coords: jnp.ndarray,  # [N, D] all positions (same space)
    bw: jnp.ndarray,  # scalar (fixed) or int neighbor count (adaptive)
    ct_query: jnp.ndarray,  # [Q] int cell-type codes of the queries
    ct_all: jnp.ndarray,  # [N] int cell-type codes of all samples
    cond_ct: jnp.ndarray,  # [Q] bool: restrict this query to same-cell-type neighbors
    cov_all: Optional[jnp.ndarray] = None,  # [N] bool: samples "of interest" (cov mask)
    cond_cov: Optional[jnp.ndarray] = None,  # [Q] bool: apply the cov mask for this query
    function: str = "bisquare",
    fixed: bool = True,
    exclude_self: bool = False,
    normalize: bool = False,
    threshold: float = 1e-5,
    eps: float = 1.0000001,
    self_idx: Optional[jnp.ndarray] = None,  # [Q] global column of each query's self
) -> jnp.ndarray:
    """Batched kernel weights with the reference's hurdle-style conditioning
    (reference find_neighbors.py:481-490): per query, distances to samples of
    a different cell type (when `cond_ct`) or failing the cov condition (when
    `cond_cov`) are pushed to that query's max distance BEFORE the kernel is
    applied — the bandwidth itself comes from the unconditioned distances,
    exactly as the reference computes it.

    This turns MuSIC's per-cell `get_wi(i, cov=..., ct=...)` loop
    (reference MuSIC.py:2744) into one fused [Q, N] kernel.

    `self_idx` pins each query's own column to an exact zero distance (see
    `_kernel_weights_batch`).
    """
    d2 = jnp.sum(query**2, 1)[:, None] + jnp.sum(coords**2, 1)[None, :] - 2 * jnp.matmul(
        query, coords.T, precision="highest"
    )
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    if self_idx is not None:
        dist = jnp.where(self_idx[:, None] == jnp.arange(coords.shape[0])[None, :], 0.0, dist)
    if fixed:
        bandwidth = bw
    else:
        k = bw.astype(jnp.int32)
        offset = jnp.where(exclude_self, 1, 0)
        sorted_d = jnp.sort(dist, axis=1)
        bandwidth = jnp.take_along_axis(sorted_d, (k + offset)[None, None].repeat(dist.shape[0], 0), axis=1) * eps
    max_d = jnp.max(dist, axis=1, keepdims=True)
    mask = cond_ct[:, None] & (ct_all[None, :] != ct_query[:, None])
    dist = jnp.where(mask, max_d, dist)
    if cov_all is not None and cond_cov is not None:
        dist = jnp.where(cond_cov[:, None] & (~cov_all[None, :]), max_d, dist)
    bw_dist = dist / bandwidth
    if exclude_self:
        bw_dist = jnp.where(bw_dist == 0.0, jnp.max(bw_dist, axis=1, keepdims=True), bw_dist)
    x = bw_dist
    if function == "triangular":
        k_val = 1 - x
    elif function == "uniform":
        k_val = jnp.ones_like(x) * 0.5
    elif function == "quadratic":
        k_val = (3.0 / 4) * (1 - x**2)
    elif function == "bisquare":
        k_val = (1 - x**2) ** 2
    elif function == "gaussian":
        k_val = jnp.exp(-0.5 * x**2)
    elif function == "exponential":
        k_val = jnp.exp(-x)
    else:
        raise ValueError(f"Unsupported kernel function {function}")
    k_val = jnp.where(x > 1, 0.0, k_val)
    k_val = jnp.where(k_val < threshold, 0.0, k_val)
    if normalize:
        nnz = jnp.sum(k_val > 0, axis=1, keepdims=True)
        k_val = k_val / jnp.maximum(nnz, 1)
    return k_val


class Kernel:
    """Spatial kernel weights for one sample (parity surface:
    reference find_neighbors.py:392)."""

    def __init__(
        self,
        i: int,
        data,
        bw,
        cov: Optional[np.ndarray] = None,
        ct: Optional[np.ndarray] = None,
        expr_mat: Optional[np.ndarray] = None,
        fixed: bool = True,
        exclude_self: bool = False,
        function: str = "triangular",
        threshold: float = 1e-5,
        eps: float = 1.0000001,
        sparse_array: bool = False,
        normalize_weights: bool = False,
        use_expression_neighbors: bool = False,
    ):
        data = np.asarray(data)
        if use_expression_neighbors:
            dist = local_dist(np.asarray(expr_mat)[i], np.asarray(expr_mat))
            function = "uniform"
        else:
            dist = local_dist(data[i], data)
        self.function = function.lower()
        if fixed:
            self.bandwidth = float(bw)
        else:
            offset = 1 if exclude_self else 0
            self.bandwidth = np.partition(dist, int(bw) + offset)[int(bw) + offset] * eps
        max_dist = np.max(dist)
        if cov is not None and ct is not None:
            if cov[i] == 1:
                dist = np.where(np.asarray(ct) != ct[i], max_dist, dist)
        elif cov is not None:
            dist = np.where(np.asarray(cov) == 0, max_dist, dist)
        elif ct is not None:
            dist = np.where(np.asarray(ct) != ct[i], max_dist, dist)
        bw_dist = dist / self.bandwidth
        if exclude_self:
            bw_dist = np.where(bw_dist == 0.0, np.max(bw_dist), bw_dist)
        k = self._kernel_functions(bw_dist)
        k[bw_dist > 1] = 0
        k[k < threshold] = 0
        if normalize_weights:
            nnz = np.count_nonzero(k)
            k = k / max(nnz, 1)
        self.kernel = csr_matrix(k) if sparse_array else k

    def _kernel_functions(self, x):
        f = self.function
        if f == "triangular":
            return 1 - x
        if f == "uniform":
            return np.ones(x.shape) * 0.5
        if f == "quadratic":
            return (3.0 / 4) * (1 - x**2)
        if f == "bisquare":
            return (1 - x**2) ** 2
        if f == "gaussian":
            return np.exp(-0.5 * x**2)
        if f == "exponential":
            return np.exp(-x)
        raise ValueError(f"Unsupported kernel function {f}")


def get_wi(
    i: int,
    n_samples: int,
    coords: np.ndarray,
    cov: Optional[np.ndarray] = None,
    ct: Optional[np.ndarray] = None,
    expr_mat: Optional[np.ndarray] = None,
    fixed_bw: bool = True,
    exclude_self: bool = False,
    kernel: str = "gaussian",
    bw: Union[float, int] = 100,
    threshold: float = 1e-5,
    sparse_array: bool = False,
    normalize_weights: bool = False,
    use_expression_neighbors: bool = False,
) -> csr_matrix:
    """Kernel weights for one sample (parity: find_neighbors.py:534)."""
    if bw == 0:
        raise ValueError("Bandwidth cannot be 0.")
    k = Kernel(
        i,
        coords,
        bw,
        cov=cov,
        ct=ct,
        expr_mat=expr_mat,
        fixed=fixed_bw,
        exclude_self=exclude_self,
        function=kernel,
        threshold=threshold,
        sparse_array=sparse_array,
        normalize_weights=normalize_weights,
        use_expression_neighbors=use_expression_neighbors,
    ).kernel
    return k if sparse_array else csr_matrix(k)


def get_wi_batch(
    coords: np.ndarray,
    bw: Union[float, int],
    fixed_bw: bool = True,
    exclude_self: bool = False,
    kernel: str = "bisquare",
    normalize_weights: bool = False,
    block: int = 2048,
) -> np.ndarray:
    """Kernel weights for ALL samples at once, blocked on device — the
    data-parallel replacement for looping `get_wi` per cell."""
    coords = np.asarray(coords, np.float32)
    n = coords.shape[0]
    coords_d = jnp.asarray(coords)
    out = np.zeros((n, n), np.float32)
    for s in range(0, n, block):
        q = coords_d[s : s + block]
        W = _kernel_weights_batch(
            q,
            coords_d,
            jnp.asarray(float(bw), jnp.float32) if fixed_bw else jnp.asarray(int(bw)),
            function=kernel,
            fixed=fixed_bw,
            exclude_self=exclude_self,
            normalize=normalize_weights,
            self_idx=jnp.arange(s, s + q.shape[0], dtype=jnp.int32),
        )
        out[s : s + q.shape[0]] = np.asarray(W)
    return out


def find_bw_for_n_neighbors(
    adata: AnnData,
    coords_key: str = "spatial",
    n_anchors: Optional[int] = None,
    target_n_neighbors: int = 6,
    initial_bw: Optional[float] = None,
    chunk_size: int = 1000,
    exclude_self: bool = False,
    normalize_distances: bool = False,
    verbose: bool = True,
    max_iterations: int = 100,
    alpha: float = 0.5,
) -> float:
    """Bandwidth such that the average cell has ~`target_n_neighbors` within
    it (parity: find_neighbors.py:215) — bisection on anchor samples."""
    coords = np.asarray(adata.obsm[coords_key], dtype=float)
    rng = np.random.default_rng(0)
    # n_anchors None = use every cell (the reference's default)
    n_use = len(coords) if n_anchors is None else min(n_anchors, len(coords))
    anchors = rng.choice(len(coords), n_use, replace=False)
    from scipy.spatial import cKDTree

    tree = cKDTree(coords)
    kth = tree.query(coords[anchors], k=target_n_neighbors + 1)[0][:, -1]
    bw = float(np.mean(kth))
    if verbose:
        lm.main_info(f"Estimated bandwidth for ~{target_n_neighbors} neighbors: {bw:.4f}")
    return bw


def find_threshold_distance(
    adata: AnnData,
    coords_key: str = "X_pca",
    n_neighbors: int = 10,
    chunk_size: int = 1000,
    normalize_distances: bool = False,
) -> float:
    """Distance beyond which there is a dramatic increase in the average
    distance to the remaining nearest neighbors (parity:
    find_neighbors.py:336-387 — max over cells of mean + 3*std of the
    n_neighbors smallest distances, self-distance included, with the
    optional shared-nonzero-column normalization)."""
    coords = np.asarray(adata.obsm[coords_key], dtype=float)
    if normalize_distances:
        n_nonzeros = {i: set(np.nonzero(coords[i, :])[0]) for i in range(coords.shape[0])}
    else:
        n_nonzeros = None
    chunks = []
    for i in range(0, coords.shape[0], chunk_size):
        chunks.append(calculate_distances_chunk(coords[i : i + chunk_size], i, coords, n_nonzeros=n_nonzeros))
    distances = np.concatenate(chunks, axis=0)
    k_nearest = np.sort(distances)[:, :n_neighbors]
    return float(np.max(k_nearest.mean(axis=1) + 3 * k_nearest.std(axis=1)))


def construct_nn_graph(
    adata: AnnData,
    spatial_key: str = "spatial",
    dist_metric: str = "euclidean",
    n_neighbors: int = 8,
    exclude_self: bool = True,
    make_symmetrical: bool = False,
    save_id: Union[bool, str] = False,
) -> None:
    """Bucketed KNN graph into `.obsp['adj']` (parity: find_neighbors.py:609)."""
    position = np.asarray(adata.obsm[spatial_key], dtype=float)
    from sklearn.neighbors import NearestNeighbors

    k = n_neighbors + (1 if exclude_self else 0)
    nn = NearestNeighbors(n_neighbors=min(k, len(position)), metric=dist_metric).fit(position)
    graph = nn.kneighbors_graph(position, mode="connectivity").tolil()
    if exclude_self:
        graph.setdiag(0)
    adj = csr_matrix(graph)
    if make_symmetrical:
        adj = adj.maximum(adj.T)
    adata.obsp["adj"] = adj
    if save_id:
        adata.obs[save_id if isinstance(save_id, str) else "nn_id"] = np.arange(adata.n_obs)


def neighbors(
    adata: AnnData,
    basis: str = "pca",
    spatial_key: str = "spatial",
    n_neighbors_method: str = "ball_tree",
    n_pca_components: int = 30,
    n_neighbors: int = 10,
) -> Tuple[csr_matrix, AnnData]:
    """Expression or spatial KNN graph (parity: find_neighbors.py:672).
    Returns (connectivities, adata); distances/connectivities go to `.obsp`."""
    if basis == "spatial":
        X_data = np.asarray(adata.obsm[spatial_key], dtype=float)
    else:
        if "X_pca" not in adata.obsm:
            from .dimensionality_reduction import pca

            pca(adata, n_pca_components=n_pca_components)
        X_data = np.asarray(adata.obsm["X_pca"])[:, :n_pca_components]
    from sklearn.neighbors import NearestNeighbors

    k = min(n_neighbors, adata.n_obs)
    nn = NearestNeighbors(n_neighbors=k, algorithm=n_neighbors_method).fit(X_data)
    dists = nn.kneighbors_graph(X_data, mode="distance")
    conns = nn.kneighbors_graph(X_data, mode="connectivity")
    prefix = "spatial_" if basis == "spatial" else "expression_"
    adata.obsp[f"{prefix}distances"] = dists
    adata.obsp[f"{prefix}connectivities"] = conns
    # the uns record downstream consumers read (the dyn.tl.neighbors
    # contract the reference's niches() expects: indices + params)
    _, indices = nn.kneighbors(X_data)
    adata.uns[f"{prefix}neighbors"] = {
        "indices": indices,
        "params": {"n_neighbors": k, "method": n_neighbors_method, "metric": "euclidean"},
    }
    return conns, adata


def calculate_affinity(position: np.ndarray, dist_metric: str = "euclidean", n_neighbors: int = 10) -> np.ndarray:
    """Gaussian affinity matrix from pairwise distances (parity:
    find_neighbors.py:771)."""
    dist = calculate_distance(position, dist_metric)
    sigma = np.sort(dist, axis=1)[:, min(n_neighbors, dist.shape[1] - 1)]
    aff = np.exp(-(dist**2) / (2 * sigma[:, None] * sigma[None, :]))
    np.fill_diagonal(aff, 0)
    return aff


def calculate_distances_chunk(
    coords_chunk: np.ndarray,
    chunk_start_idx: int = 0,
    coords: np.ndarray = None,
    n_nonzeros: Optional[dict] = None,
    metric: str = "euclidean",
) -> np.ndarray:
    """Pairwise distances of one chunk vs all (parity: reference
    find_neighbors.py:182-211 — same signature, incl. the optional
    shared-nonzero-column normalization). The euclidean path runs on
    device; other metrics go through scipy cdist."""
    if coords is None:  # back-compat: (chunk, coords) positional form
        coords, chunk_start_idx = chunk_start_idx, 0
    if metric == "euclidean":
        import jax.numpy as jnp

        from ..alignment.methods.math import euc_dist

        distances_chunk = np.asarray(
            euc_dist(jnp.asarray(coords_chunk, jnp.float32), jnp.asarray(coords, jnp.float32), squared=False)
        )
    else:
        from scipy.spatial.distance import cdist

        distances_chunk = cdist(np.asarray(coords_chunk, float), np.asarray(coords, float), metric=metric)
    if n_nonzeros is not None:
        paired = np.zeros_like(distances_chunk)
        for i in range(distances_chunk.shape[0]):
            row_nz = n_nonzeros[chunk_start_idx + i]
            for j in range(distances_chunk.shape[1]):
                paired[i, j] = len(row_nz & n_nonzeros[j])
        with np.errstate(divide="ignore", invalid="ignore"):
            distances_chunk = np.where(paired > 0, distances_chunk / paired, np.inf)
    return distances_chunk


def compute_distances_and_connectivities(knn_indices: np.ndarray, distances: np.ndarray):
    """kNN structure -> sparse distance + binary connectivity matrices
    (parity: reference find_neighbors.py compute_distances_and_connectivities)."""
    from scipy.sparse import csr_matrix

    n, k = knn_indices.shape
    rows = np.repeat(np.arange(n), k)
    cols = np.asarray(knn_indices).ravel()
    dvals = np.asarray(distances).ravel()
    dist = csr_matrix((dvals, (rows, cols)), shape=(n, n))
    conn = csr_matrix((np.ones(len(rows)), (rows, cols)), shape=(n, n))
    conn = conn.maximum(conn.T)
    return dist, conn
