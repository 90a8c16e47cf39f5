"""PASTE alignment: fused Gromov-Wasserstein pairwise + NMF center alignment.

Capability parity with reference spateo/alignment/methods/paste.py:26-380
(`paste_pairwise_align` via POT `ot.gromov.cg`, `paste_center_align`,
`generalized_procrustes_analysis`). TPU-native: the FGW solve is the entropic
mirror-descent kernel in `spateo_tpu.ops.ot` (eps-regularized; converges to
the exact plan as eps -> 0) instead of exact-EMD conditional gradient.
"""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np
from scipy import sparse

from ...core.anndata import AnnData
from ...logging import logger_manager as lm
from ...ops.ot import fgw
from .math import calc_distance, euc_dist
from .morpho import filter_common_genes, get_rep


def _pairwise_prep(sampleA, sampleB, genes, layer):
    common = filter_common_genes(sampleA.var.index, sampleB.var.index)
    if genes is not None:
        common = sorted(set(common) & set(genes))
    X_A = get_rep(sampleA, layer, "layer", common)
    X_B = get_rep(sampleB, layer, "layer", common)
    return X_A, X_B, common


def paste_pairwise_align(
    sampleA: AnnData,
    sampleB: AnnData,
    layer: str = "X",
    genes: Optional[List[str]] = None,
    spatial_key: str = "spatial",
    alpha: float = 0.1,
    dissimilarity: str = "kl",
    G_init=None,
    a_distribution=None,
    b_distribution=None,
    norm: bool = False,
    numItermax: int = 200,
    eps: float = 5e-3,
    dtype: str = "float32",
    device: str = "tpu",
    verbose: bool = True,
    method: str = "entropic",
) -> Tuple[np.ndarray, Optional[float]]:
    """Optimal FGW alignment of two slices (parity: reference paste.py:26).

    `method='entropic'` (default) runs the device mirror-descent Sinkhorn
    solver; `method='exact'` runs conditional-gradient FGW with exact LP
    subproblems — the same solver family as the POT
    `ot.gromov.fused_gromov_wasserstein` the reference calls (intended for
    small pairs / validation)."""
    import jax.numpy as jnp

    X_A, X_B, common = _pairwise_prep(sampleA, sampleB, genes, layer)
    coordsA = np.asarray(sampleA.obsm[spatial_key], dtype=np.float32)
    coordsB = np.asarray(sampleB.obsm[spatial_key], dtype=np.float32)
    # all three [n, n] matrices stay on device (pulling them costs GBs of
    # tunnel transfer at scale); fgw consumes jnp arrays directly
    D_A = euc_dist(jnp.asarray(coordsA), jnp.asarray(coordsA), squared=False)
    D_B = euc_dist(jnp.asarray(coordsB), jnp.asarray(coordsB), squared=False)
    [M] = calc_distance(X_A, X_B, metric=dissimilarity)

    a = np.ones(sampleA.n_obs) / sampleA.n_obs if a_distribution is None else np.asarray(a_distribution)
    b = np.ones(sampleB.n_obs) / sampleB.n_obs if b_distribution is None else np.asarray(b_distribution)
    if norm:
        D_A = D_A / jnp.min(jnp.where(D_A > 0, D_A, jnp.inf))
        D_B = D_B / jnp.min(jnp.where(D_B > 0, D_B, jnp.inf))
    if method == "exact":
        from ...ops.ot import fgw_exact

        pi, obj = fgw_exact(
            np.asarray(M), np.asarray(D_A), np.asarray(D_B), a, b, alpha=alpha, G_init=G_init, max_iter=numItermax
        )
    else:
        pi, obj = fgw(M, D_A, D_B, a, b, alpha=alpha, eps=eps, G_init=G_init, max_iter=numItermax)
    return pi, obj


def center_NMF(n_components: int, random_seed: int, dissimilarity: str = "kl"):
    from sklearn.decomposition import NMF

    if dissimilarity.lower() in ("kl", "kullback-leibler"):
        return NMF(n_components=n_components, solver="mu", beta_loss="kullback-leibler", init="random", random_state=random_seed)
    return NMF(n_components=n_components, init="random", random_state=random_seed)


def paste_center_align(
    init_center_sample: AnnData,
    samples: List[AnnData],
    layer: str = "X",
    genes: Optional[List[str]] = None,
    spatial_key: str = "spatial",
    lmbda: Optional[np.ndarray] = None,
    alpha: float = 0.1,
    n_components: int = 15,
    threshold: float = 0.001,
    max_iter: int = 10,
    numItermax: int = 200,
    dissimilarity: str = "kl",
    norm: bool = False,
    random_seed: Optional[int] = None,
    pis_init: Optional[List[np.ndarray]] = None,
    distributions=None,
    dtype: str = "float32",
    device: str = "tpu",
    verbose: bool = True,
) -> Tuple[AnnData, List[np.ndarray]]:
    """Infer a center slice + mappings to all slices by alternating NMF and
    FGW (parity: reference paste.py:164)."""
    if lmbda is None:
        lmbda = len(samples) * [1 / len(samples)]
    if distributions is None:
        distributions = len(samples) * [None]

    # common genes across all samples + center
    common = filter_common_genes(init_center_sample.var.index, *[s.var.index for s in samples])
    if genes is not None:
        common = sorted(set(common) & set(genes))
    center = init_center_sample[:, np.asarray(common)].copy()
    samples_sub = [s[:, np.asarray(common)] for s in samples]

    center_coords = np.asarray(center.obsm[spatial_key], dtype=np.float32)
    B = get_rep(center, layer, "layer", None).astype(np.float64)

    nmf_model = center_NMF(n_components, random_seed or 0, dissimilarity)
    W = nmf_model.fit_transform(np.maximum(B, 0))
    H = nmf_model.components_

    pis = pis_init if pis_init is not None else [None] * len(samples_sub)
    R = 0.0
    R_diff = np.inf
    it = 0
    while R_diff > threshold and it < max_iter:
        new_pis = []
        r = []
        center_expr = W @ H
        center_view = AnnData(X=np.maximum(center_expr, 1e-10), var=center.var.copy(), obs=center.obs.copy())
        center_view.obsm[spatial_key] = center_coords
        for i, s in enumerate(samples_sub):
            pi, obj = paste_pairwise_align(
                center_view,
                s,
                layer="X",
                spatial_key=spatial_key,
                alpha=alpha,
                dissimilarity=dissimilarity,
                norm=norm,
                numItermax=numItermax,
                b_distribution=distributions[i],
                verbose=False,
            )
            new_pis.append(pi)
            r.append(obj)
        # NMF update of the center expression from the barycentric projections
        agg = np.zeros_like(B)
        for i, (pi, s) in enumerate(zip(new_pis, samples_sub)):
            X_s = get_rep(s, layer, "layer", None).astype(np.float64)
            agg += lmbda[i] * (pi @ X_s) * len(samples_sub)
        W = nmf_model.fit_transform(np.maximum(agg, 0))
        H = nmf_model.components_
        pis = new_pis
        R_new = float(np.dot(r, lmbda))
        R_diff = abs(R - R_new)
        R = R_new
        it += 1
        if verbose:
            lm.main_info(f"center align iter {it}: objective {R:.6f} (diff {R_diff:.2e})")

    center.X = W @ H
    center.uns["paste_W"] = W
    center.uns["paste_H"] = H
    return center, pis


def generalized_procrustes_analysis(X, Y, pi):
    """Align Y onto X by the Procrustes rotation weighted by the mapping pi
    (parity: reference paste.py:323). Returns (X_shifted, Y_aligned, mapping_dict)."""
    X = np.asarray(X, dtype=float)
    Y = np.asarray(Y, dtype=float)
    pi = np.asarray(pi, dtype=float)
    tX = pi.sum(axis=1) @ X / pi.sum()
    tY = pi.sum(axis=0) @ Y / pi.sum()
    X = X - tX
    Y = Y - tY
    H = Y.T @ pi.T @ X
    U, S, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    Y = Y @ R.T
    mapping_dict = {"tX": tX, "tY": tY, "R": R}
    return X, Y, mapping_dict
