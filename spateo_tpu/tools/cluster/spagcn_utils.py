"""SpaGCN building blocks (capability parity: reference
tools/cluster/spagcn_utils.py — torch GCN replaced by jax; the adjacency /
search helpers are direct numpy equivalents)."""

from __future__ import annotations

from typing import Optional

import numpy as np


def calculate_adj_matrix(x, y, x_pixel=None, y_pixel=None, image=None, beta: int = 49, alpha: int = 1, histology: bool = False) -> np.ndarray:
    """Spatial (optionally histology-augmented) squared-distance matrix
    (parity: reference spagcn_utils.py calculate_adj_matrix)."""
    pts = np.stack([np.asarray(x, float), np.asarray(y, float)], 1)
    if histology and image is not None and x_pixel is not None:
        xp = np.asarray(x_pixel, int)
        yp = np.asarray(y_pixel, int)
        r = beta // 2
        img = np.asarray(image, float)
        cols = []
        for cx, cy in zip(xp, yp):
            patch = img[max(cx - r, 0): cx + r + 1, max(cy - r, 0): cy + r + 1]
            cols.append(patch.reshape(-1, img.shape[-1]).mean(0) if patch.size else np.zeros(img.shape[-1]))
        z = np.asarray(cols)
        z = (z - z.mean(0)) / (z.std(0) + 1e-9)
        z = z * alpha * np.std(pts) / max(np.std(z), 1e-9)
        pts = np.concatenate([pts, z], axis=1)
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    return np.sqrt(d2)


def calculate_p(adj: np.ndarray, l: float) -> float:
    """Mean fraction of neighborhood weight (excluding self) at length
    scale l (parity: spagcn_utils.py calculate_p)."""
    W = np.exp(-(np.asarray(adj) ** 2) / (2 * l**2))
    return float((W.sum(1) - 1).mean() / max(len(W) - 1, 1))


def search_l(p: float, adj: np.ndarray, start: float = 0.01, end: float = 1000, tol: float = 0.01, max_run: int = 100) -> float:
    """Bisection for the l giving target neighborhood fraction p
    (parity: spagcn_utils.py search_l)."""
    for _ in range(max_run):
        mid = (start + end) / 2
        pm = calculate_p(adj, mid)
        if abs(pm - p) < tol:
            return mid
        if pm > p:
            end = mid
        else:
            start = mid
    return (start + end) / 2


def get_cluster_num(labels) -> int:
    return len(set(map(str, labels)))


def refine(sample_id, pred, dis, shape: str = "hexagon") -> list:
    """Majority-vote label refinement over spatial neighbors
    (parity: spagcn_utils.py refine)."""
    num_nbs = 6 if shape == "hexagon" else 4
    pred = list(pred)
    dis = np.asarray(dis)
    refined = []
    for i in range(len(sample_id)):
        nbr = np.argsort(dis[i])[1 : num_nbs + 1]
        nbr_pred = [pred[j] for j in nbr]
        self_pred = pred[i]
        counts = {p: nbr_pred.count(p) for p in set(nbr_pred)}
        best = max(counts, key=counts.get)
        if counts.get(self_pred, 0) < num_nbs / 2 and counts[best] > num_nbs / 2:
            refined.append(best)
        else:
            refined.append(self_pred)
    return refined


def search_res(adata, adj, l: float, target_num: int, start: float = 0.4, step: float = 0.1, tol: float = 5e-3, lr: float = 0.05, max_epochs: int = 10, r_seed: int = 100, max_run: int = 10) -> float:
    """Search the louvain resolution yielding target_num clusters
    (parity: spagcn_utils.py search_res; the GCN embedding step is the
    framework's spagcn_pyg)."""
    from .find_clusters import scc

    res = start
    for _ in range(max_run):
        try:
            scc(adata, resolution=res, key_added="_spagcn_res_probe")
            n = get_cluster_num(adata.obs["_spagcn_res_probe"])
        except Exception:
            return res
        if n == target_num:
            return res
        res += step if n < target_num else -step
        res = max(res, 0.01)
    return res


class GraphConvolution:
    """Single GCN layer (parity surface: spagcn_utils.py GraphConvolution;
    jax forward)."""

    def __init__(self, in_features: int, out_features: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        bound = 1.0 / np.sqrt(out_features)
        self.weight = rng.uniform(-bound, bound, (in_features, out_features)).astype(np.float32)

    def __call__(self, x, adj):
        import jax.numpy as jnp

        return jnp.asarray(adj) @ (jnp.asarray(x) @ jnp.asarray(self.weight))


class simple_GC_DEC:
    """GCN + DEC clustering head (parity surface: spagcn_utils.py
    simple_GC_DEC — the trained model in this framework is the jax GCN in
    find_clusters.spagcn_pyg; this class provides the same predict API over
    a precomputed embedding)."""

    def __init__(self, nfeat: int, nhid: int, alpha: float = 0.2):
        self.gc = GraphConvolution(nfeat, nhid)
        self.alpha = alpha
        self.mu = None

    def fit(self, X, adj, n_clusters: int = 10, **kwargs):
        import numpy as np
        from sklearn.cluster import KMeans

        emb = np.asarray(self.gc(X, adj))
        km = KMeans(n_clusters=n_clusters, n_init=10, random_state=0).fit(emb)
        self.mu = km.cluster_centers_
        self._emb = emb
        return self

    def predict(self):
        d2 = ((self._emb[:, None, :] - self.mu[None, :, :]) ** 2).sum(-1)
        q = (1.0 + d2 / self.alpha) ** (-(self.alpha + 1.0) / 2.0)
        q = q / q.sum(1, keepdims=True)
        return q, np.argmax(q, axis=1)


class SpaGCN:
    """SpaGCN driver class (parity surface: spagcn_utils.py SpaGCN)."""

    def __init__(self):
        self.l = None

    def set_l(self, l: float):
        self.l = l

    def train(self, adata, adj, num_pcs: int = 50, n_clusters: int = 7, **kwargs):
        from .find_clusters import spagcn_pyg

        spagcn_pyg(adata, n_clusters=n_clusters, seed=kwargs.get("r_seed", 100))
        self._adata = adata
        return self

    def predict(self):
        pred = np.asarray(self._adata.obs["spagcn_pred"])
        return pred, None
