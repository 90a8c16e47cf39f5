"""Principal curve/tree algorithms — native implementations.

Capability parity with reference
spateo/tdr/models/models_backbone/backbone_methods.py:146 (ElPiGraph), :220
(SimplePPT), :284 (NLPCA PrinCurve). The external dependencies are replaced
by native algorithms: a jitted soft-assignment principal-tree solver (the
SimplePPT objective), a graph-grammar elastic principal graph (the ElPiGraph
energy of Albergante et al. 2020, grown by bisect-edge / add-leaf operations
scored on optimized elastic energy), and the NLPCA bottleneck autoencoder
(torch loop -> one jitted optax scan).
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


# ---------------------------------------------------------------------------
# ElPiGraph: elastic principal graphs (Albergante et al. 2020)
# ---------------------------------------------------------------------------
def _elastic_matrix(k: int, edges: np.ndarray, Lambda: float, Mu: float) -> Tuple[np.ndarray, np.ndarray]:
    """Quadratic-form matrices of the elastic energy: the edge term
    Lambda * sum ||phi_u - phi_v||^2 and the star harmonicity term
    Mu * sum_stars ||phi_c - mean(neighbors)||^2."""
    A_E = np.zeros((k, k))
    deg = np.zeros(k, int)
    nbrs: list = [[] for _ in range(k)]
    for a, b in edges:
        A_E[a, a] += Lambda
        A_E[b, b] += Lambda
        A_E[a, b] -= Lambda
        A_E[b, a] -= Lambda
        deg[a] += 1
        deg[b] += 1
        nbrs[a].append(b)
        nbrs[b].append(a)
    A_R = np.zeros((k, k))
    for c in range(k):
        if deg[c] >= 2:
            vec = np.zeros(k)
            vec[c] = 1.0
            for l in nbrs[c]:
                vec[l] -= 1.0 / deg[c]
            A_R += Mu * np.outer(vec, vec)
    return A_E, A_R


def _optimize_elastic(
    X: np.ndarray,
    nodes: np.ndarray,
    edges: np.ndarray,
    Lambda: float,
    Mu: float,
    alpha: float = 0.0,
    n_iter: int = 10,
    tol: float = 1e-5,
    final_energy: str = "Penalized",
) -> Tuple[np.ndarray, float]:
    """EM optimization of node positions for a fixed graph topology: assign
    each point to its nearest node, then solve the normal equations of the
    elastic energy (per coordinate, one k x k solve). Returns (nodes,
    energy); energy includes the branching penalty when
    `final_energy='Penalized'` (the alpha term of reference
    ElPiGraph_method, backbone_methods.py:152)."""
    N, D = X.shape
    k = len(nodes)
    A_E, A_R = _elastic_matrix(k, edges, Lambda, Mu)
    part = None
    for _ in range(n_iter):
        d2 = ((X[:, None, :] - nodes[None, :, :]) ** 2).sum(-1)
        part_new = d2.argmin(1)
        counts = np.bincount(part_new, minlength=k).astype(float)
        sums = np.zeros((k, D))
        np.add.at(sums, part_new, X)
        A = np.diag(counts / N) + A_E + A_R
        new_nodes = np.linalg.solve(A + 1e-9 * np.eye(k), sums / N)
        shift = float(np.abs(new_nodes - nodes).max())
        nodes = new_nodes
        if part is not None and np.array_equal(part, part_new) and shift < tol:
            part = part_new
            break
        part = part_new
    d2 = ((X[:, None, :] - nodes[None, :, :]) ** 2).sum(-1)
    u_approx = float(d2.min(1).mean())
    diffs = nodes[edges[:, 0]] - nodes[edges[:, 1]]
    u_e = Lambda * float((diffs**2).sum())
    deg = np.bincount(edges.ravel(), minlength=k)
    u_r = 0.0
    nbrs: list = [[] for _ in range(k)]
    for a, b in edges:
        nbrs[a].append(b)
        nbrs[b].append(a)
    for c in range(k):
        if deg[c] >= 2:
            u_r += Mu * float(((nodes[c] - nodes[nbrs[c]].mean(0)) ** 2).sum())
    energy = u_approx + u_e + u_r
    if final_energy.lower() == "penalized" and alpha > 0:
        # branching penalty: excess degree beyond 2 at each star
        energy += alpha * float(np.maximum(deg - 2, 0).sum()) * (u_e / max(len(edges), 1))
    return nodes, energy


def ElPiGraph_tree(
    X: np.ndarray,
    NumNodes: int = 50,
    topology: str = "tree",
    Lambda: float = 0.01,
    Mu: float = 0.1,
    alpha: float = 0.0,
    FinalEnergy: str = "Penalized",
    n_iter: int = 10,
    **kwargs,
) -> Tuple[np.ndarray, np.ndarray]:
    """Elastic principal graph (native re-derivation of Albergante et al.
    2020; parity: reference backbone_methods.py:146 `ElPiGraph_method`,
    which calls elpigraph-python). The graph grows by graph-grammar
    operations — 'bisect edge' everywhere and 'add node to node' (a new
    leaf) — each candidate scored by the optimized elastic energy
    U = mean squared point-to-node distance + Lambda * edge lengths
    + Mu * star harmonicity, and the best operation is kept, until NumNodes.

    topology='tree' allows branching; 'curve' grows only at path endpoints;
    'circle' starts from a closed triangle and only bisects edges.
    Returns (nodes [K, D], edges [E, 2])."""
    X = np.asarray(X, float)
    topology = str(topology).lower()
    mean = X.mean(0)
    _, _, Vt = np.linalg.svd(X - mean, full_matrices=False)
    pc1 = Vt[0] * X.std(0).max()
    if topology == "circle":
        pc2 = Vt[1] * X.std(0).max() if len(Vt) > 1 else np.roll(pc1, 1)
        nodes = np.stack([mean + pc1, mean - 0.5 * pc1 + 0.8 * pc2, mean - 0.5 * pc1 - 0.8 * pc2])
        edges = np.array([[0, 1], [1, 2], [2, 0]])
    else:
        nodes = np.stack([mean - pc1, mean + pc1])
        edges = np.array([[0, 1]])
    nodes, _ = _optimize_elastic(X, nodes, edges, Lambda, Mu, alpha, n_iter, final_energy=FinalEnergy)

    while len(nodes) < min(NumNodes, len(X)):
        k = len(nodes)
        deg = np.bincount(edges.ravel(), minlength=k)
        candidates = []
        # bisect edge: u - w - v
        for ei, (a, b) in enumerate(edges):
            new_nodes = np.vstack([nodes, (nodes[a] + nodes[b]) / 2])
            new_edges = np.vstack([np.delete(edges, ei, axis=0), [[a, k], [k, b]]])
            candidates.append((new_nodes, new_edges))
        # add node to node (new leaf)
        if topology != "circle":
            grow_at = range(k) if topology == "tree" else [i for i in range(k) if deg[i] == 1]
            d2 = ((X[:, None, :] - nodes[None, :, :]) ** 2).sum(-1)
            part = d2.argmin(1)
            for v in grow_at:
                assigned = X[part == v]
                if len(assigned) >= 2:
                    offset = assigned.mean(0) - nodes[v]
                else:
                    nb = [b for a, b in edges if a == v] + [a for a, b in edges if b == v]
                    offset = nodes[v] - nodes[nb].mean(0) if nb else np.zeros(X.shape[1])
                new_nodes = np.vstack([nodes, nodes[v] + offset])
                new_edges = np.vstack([edges, [[v, k]]])
                candidates.append((new_nodes, new_edges))
        best = None
        for cand_nodes, cand_edges in candidates:
            opt_nodes, energy = _optimize_elastic(
                X, cand_nodes, cand_edges, Lambda, Mu, alpha, n_iter=max(3, n_iter // 2), final_energy=FinalEnergy
            )
            if best is None or energy < best[0]:
                best = (energy, opt_nodes, cand_edges)
        nodes, edges = best[1], best[2]
    nodes, _ = _optimize_elastic(X, nodes, edges, Lambda, Mu, alpha, n_iter=2 * n_iter, final_energy=FinalEnergy)
    return np.asarray(nodes), np.asarray(edges)


class NLPCA:
    """Neural-network nonlinear PCA principal-curve solver (parity:
    reference backbone_methods.py:40 — a sigmoid autoencoder with a
    1-unit bottleneck trained on the summed reconstruction error; the torch
    training loop becomes one jitted `lax.scan` over Adam steps).

    Attributes after `fit`: `params` (the network weights) and
    `fit_points` after `project` (the reconstructed curve points)."""

    def __init__(self):
        self.params = None
        self.fit_points = None
        self._num_dim = None
        self._nodes = None

    @staticmethod
    def _forward(params, x):
        import jax.numpy as jnp

        h = jax.nn.sigmoid(x @ params["w1"] + params["b1"])
        bottleneck = jax.nn.sigmoid(h @ params["w2"] + params["b2"])  # [N, 1]
        h2 = jax.nn.sigmoid(bottleneck @ params["w3"] + params["b3"])
        out = h2 @ params["w4"] + params["b4"]
        return out, bottleneck

    def fit(self, data: np.ndarray, epochs: int = 500, nodes: int = 25, lr: float = 0.01, verbose: int = 0):
        import jax.numpy as jnp
        import optax

        data = np.asarray(data, np.float32)
        num_dim = data.shape[1]
        self._num_dim, self._nodes = num_dim, nodes
        rng = np.random.default_rng(0)

        def init(shape, scale):
            return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32))

        params = dict(
            w1=init((num_dim, nodes), 1.0 / np.sqrt(num_dim)),
            b1=jnp.zeros(nodes),
            w2=init((nodes, 1), 1.0 / np.sqrt(nodes)),
            b2=jnp.zeros(1),
            w3=init((1, nodes), 1.0),
            b3=jnp.zeros(nodes),
            w4=init((nodes, num_dim), 1.0 / np.sqrt(nodes)),
            b4=jnp.zeros(num_dim),
        )
        X = jnp.asarray(data)
        opt = optax.adam(lr)

        def loss_fn(p):
            out, _ = self._forward(p, X)
            # summed (not mean) orthogonal distance, as the reference's
            # orth_dist (backbone_methods.py:31)
            return jnp.sum((X - out) ** 2)

        @jax.jit
        def train(p, opt_state):
            def step(carry, _):
                p, s = carry
                g = jax.grad(loss_fn)(p)
                updates, s = opt.update(g, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), None

            (p, opt_state), _ = jax.lax.scan(step, (p, opt_state), None, length=epochs)
            return p, loss_fn(p)

        self.params, final_loss = train(params, opt.init(params))
        if verbose:
            lm.main_info(f"NLPCA final loss: {float(final_loss):.4f}")
        return self

    def project(self, data: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Project points onto the fitted curve; returns (projection index
        [N, 1], data sorted by projection index [N, D+1])."""
        import jax.numpy as jnp

        data = np.asarray(data, np.float32)
        out, bottleneck = self._forward(self.params, jnp.asarray(data))
        pts = np.asarray(out)
        proj = np.asarray(bottleneck)
        self.fit_points = pts
        all_data = np.concatenate([pts, proj], axis=1)
        all_sorted = all_data[all_data[:, data.shape[1]].argsort()]
        return proj, all_sorted


def PrinCurve(
    X: np.ndarray, NumNodes: int = 50, epochs: int = 500, lr: float = 0.01, scale_factor: float = 1, **kwargs
) -> Tuple[np.ndarray, np.ndarray]:
    """Principal curve via the NLPCA autoencoder (parity: reference
    backbone_methods.py:284 `PrinCurve_method`): min-shift the data, fit the
    bottleneck autoencoder, project, sort by the 1-d bottleneck coordinate
    and subsample the reconstructed curve to NumNodes chain nodes."""
    raw_X = np.asarray(X, float)
    dims = raw_X.shape[1]
    new_X = raw_X.copy() / scale_factor
    trans = []
    for i in range(dims):
        sub = new_X[:, i].min()
        new_X[:, i] = new_X[:, i] - sub
        trans.append(sub)
    solver = NLPCA()
    solver.fit(new_X, epochs=epochs, nodes=NumNodes, lr=lr)
    _, curve_pts = solver.project(new_X)
    curve_pts = np.unique(curve_pts, axis=0)
    curve_pts = curve_pts[curve_pts[:, -1].argsort(), :]
    for i in range(dims):
        curve_pts[:, i] = curve_pts[:, i] + trans[i]
    nodes = curve_pts[:, :dims] * scale_factor
    if len(nodes) > NumNodes:
        idx = np.linspace(0, len(nodes) - 1, NumNodes).astype(int)
        nodes = nodes[idx]
    n_nodes = nodes.shape[0]
    edges = np.stack([np.arange(n_nodes - 1), np.arange(1, n_nodes)], axis=1)
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


def orth_dist(y_true, y_pred) -> float:
    """Summed squared distance between tensors — the NLPCA training loss
    (parity: reference backbone_methods.py:31 orth_dist)."""
    import numpy as _np

    return float(((_np.asarray(y_true, float) - _np.asarray(y_pred, float)) ** 2).sum())
