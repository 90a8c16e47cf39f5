"""Alignment math kernels: pairwise distances, probabilities, SE kernels.

TPU-native re-derivation of reference spateo/alignment/methods/utils.py:
`calc_distance`:866 (euc/kl/sym_kl/cos/label), `calc_probability`:944,
`get_P_core`:993 (the E-step core), `con_K`:1132, `inlier_from_NN`:1220,
`voxel_data`:1283, `_init_guess_sigma2`:1339. Everything is jnp and jittable;
pairwise distances are expressed as matmuls so XLA maps them onto the MXU.

Metric naming follows the reference exactly: metric "euc" returns SQUARED
euclidean distances (reference `_euc_distance_backend(..., squared=True)`),
which is what the Gaussian probabilities expect.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("squared",))
def euc_dist(X: jnp.ndarray, Y: jnp.ndarray, squared: bool = True) -> jnp.ndarray:
    """Pairwise (squared) euclidean distance via the matmul expansion
    ||x||^2 + ||y||^2 - 2 x.y (one MXU GEMM for the cross term).

    Jitted at the definition: these kernels are also called eagerly from
    host-side init paths, where per-op dispatch latency dominates."""
    x2 = jnp.sum(X * X, axis=1)[:, None]
    y2 = jnp.sum(Y * Y, axis=1)[None, :]
    cross = jnp.matmul(X, Y.T, precision="highest")
    d2 = jnp.maximum(x2 + y2 - 2.0 * cross, 0.0)
    return d2 if squared else jnp.sqrt(d2)


@partial(jax.jit, static_argnames=("probabilistic",))
def kl_dist(X: jnp.ndarray, Y: jnp.ndarray, probabilistic: bool = True, eps: float = 1e-8) -> jnp.ndarray:
    """Pairwise KL(X_i || Y_j): rows shifted by +0.01 and normalized, then
    KL = sum_d x log x - x log y — the cross term is one GEMM."""
    X = X + 0.01
    Y = Y + 0.01
    if probabilistic:
        X = X / jnp.sum(X, axis=1, keepdims=True)
        Y = Y / jnp.sum(Y, axis=1, keepdims=True)
    log_X = jnp.log(X + eps)
    log_Y = jnp.log(Y + eps)
    entropy = jnp.sum(X * log_X, axis=1)[:, None]
    cross = jnp.matmul(X, log_Y.T, precision="highest")
    return entropy - cross


@jax.jit
def cosine_dist(X: jnp.ndarray, Y: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    Xn = X / (jnp.linalg.norm(X, axis=1, keepdims=True) + eps)
    Yn = Y / (jnp.linalg.norm(Y, axis=1, keepdims=True) + eps)
    return 0.5 - 0.5 * jnp.matmul(Xn, Yn.T, precision="highest")


def label_dist(X_labels: jnp.ndarray, Y_labels: jnp.ndarray, label_transfer: jnp.ndarray) -> jnp.ndarray:
    """Pairwise label-transfer cost: lookup into a (K, L) cost matrix."""
    return label_transfer[X_labels[:, None], Y_labels[None, :]]


def calc_distance(
    X,
    Y,
    metric: Union[List[str], str] = "euc",
    label_transfer: Optional[jnp.ndarray] = None,
) -> List[jnp.ndarray]:
    """Pairwise distances for (lists of) representations (parity:
    reference methods/utils.py:866)."""
    if not isinstance(X, list):
        X = [X]
    if not isinstance(Y, list):
        Y = [Y]
    if not isinstance(metric, list):
        metric = [metric] * len(X)
    out = []
    for x, y, m in zip(X, Y, metric):
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        if m == "label":
            assert label_transfer is not None, "label_transfer must be provided for metric 'label'."
            out.append(label_dist(x.astype(jnp.int32), y.astype(jnp.int32), label_transfer))
        elif m in ("euc", "euclidean"):
            out.append(euc_dist(x, y, squared=True))
        elif m in ("square_euc", "square_euclidean"):
            out.append(euc_dist(x, y, squared=False))
        elif m == "kl":
            out.append(kl_dist(x, y))
        elif m == "sym_kl":
            out.append((kl_dist(x, y) + kl_dist(y, x).T) / 2)
        elif m in ("cos", "cosine"):
            out.append(cosine_dist(x, y))
        else:
            raise ValueError(f"Unsupported metric {m}")
    return out


def calc_probability(distance_matrix: jnp.ndarray, probability_type: str = "gauss", probability_parameter=None):
    """Distance -> unnormalized probability (parity: methods/utils.py:944)."""
    if probability_type.lower() in ("gauss", "gaussian"):
        if probability_parameter is None:
            raise ValueError("probability_parameter must be provided for 'Gauss' probability type.")
        return jnp.exp(-distance_matrix / (2 * probability_parameter))
    if probability_type.lower() in ("cos", "cosine"):
        return 1 - distance_matrix
    if probability_type.lower() == "prob":
        return distance_matrix
    raise ValueError(f"Unsupported probability type: {probability_type}")


def procrustes_rotation(A: jnp.ndarray) -> jnp.ndarray:
    """argmax_{R in SO(D)} tr(R^T A).

    For D=2 this has the closed form R = [[c,-s],[s,c]] with
    (c, s) ∝ (A00+A11, A10-A01) — replacing `jnp.linalg.svd` inside jitted
    EM loops, where a general SVD is disproportionately expensive to compile
    and run on TPU. D>=3 falls back to the SVD construction with the
    det(+1) correction (the reference always uses the SVD route,
    morpho_class.py:1372-1380)."""
    D = A.shape[0]
    if D == 2:
        a = A[0, 0] + A[1, 1]
        b = A[1, 0] - A[0, 1]
        n = jnp.sqrt(a * a + b * b) + 1e-30
        c, s = a / n, b / n
        return jnp.array([[c, -s], [s, c]])
    svdU, _, svdV = jnp.linalg.svd(A)
    C = jnp.eye(D, dtype=A.dtype).at[-1, -1].set(jnp.linalg.det(svdU @ svdV))
    return svdU @ C @ svdV


def con_K(X: jnp.ndarray, Y: jnp.ndarray, beta: float = 0.01) -> jnp.ndarray:
    """Squared-exponential kernel K(i,j)=exp(-beta ||X_i - Y_j||^2)
    (parity: methods/utils.py:1132)."""
    return jnp.exp(-beta * euc_dist(jnp.asarray(X), jnp.asarray(Y), squared=True))


def get_P_core(
    Dim: float,
    spatial_dist: jnp.ndarray,  # [NA, M] squared distances
    exp_dist: List[jnp.ndarray],  # list of [NA, M]
    sigma2: jnp.ndarray,
    model_mul: jnp.ndarray,  # [NA, 1]: alpha * exp(-SigmaDiag / sigma2)
    gamma: jnp.ndarray,
    samples_s: jnp.ndarray,
    sigma2_variance: jnp.ndarray,
    probability_type: List[str],
    probability_parameters: List,
    eps: float = 1e-8,
):
    """E-step soft-assignment core (parity: reference methods/utils.py:993-1095).

    The outlier model normalizes over COLUMNS (each B cell's assignment mass
    sums to <= 1, the rest going to the outlier component); all reductions are
    axis-0 sums that XLA turns into psum collectives when the NA axis is
    sharded across the mesh.

    Returns (P, K_NA_spatial, K_NA_sigma2, sigma2_related).
    """
    spatial_prob = calc_probability(spatial_dist, "gauss", sigma2 / sigma2_variance)
    outlier_s = samples_s * spatial_dist.shape[0]
    spatial_outlier = jnp.power(2 * jnp.pi * sigma2, Dim / 2) * (1 - gamma) / (gamma * outlier_s)
    spatial_inlier = 1 - spatial_outlier / (spatial_outlier + jnp.sum(spatial_prob, axis=0, keepdims=True))
    spatial_prob = spatial_prob * model_mul

    P = spatial_prob / (spatial_outlier + jnp.sum(spatial_prob, axis=0, keepdims=True))
    K_NA_spatial = P.sum(1)

    spatial_prob = calc_probability(spatial_dist, "gauss", sigma2) * model_mul
    P = spatial_inlier * spatial_prob / (jnp.sum(spatial_prob, axis=0, keepdims=True) + eps)
    K_NA_sigma2 = P.sum(1)
    sigma2_related = (P * spatial_dist).sum()

    for e_d, p_t, p_p in zip(exp_dist, probability_type, probability_parameters):
        spatial_prob = spatial_prob * calc_probability(e_d, p_t, p_p)

    P = spatial_inlier * spatial_prob / (jnp.sum(spatial_prob, axis=0, keepdims=True) + eps)
    return P, K_NA_spatial, K_NA_sigma2, sigma2_related


@partial(jax.jit, static_argnames=("max_iter",))
def _inlier_from_NN_kernel(train_x, train_y, distance, mask, n_valid, max_iter: int = 100):
    """Robust rigid fit from noisy NN matches (parity: methods/utils.py:1220),
    as one jitted fori_loop.

    `mask` [N, 1] marks valid rows and `n_valid` their count: callers pad
    the row count to a fixed bucket (copies of row 0, which leave the
    max/extent statistics unchanged) so that varying NN-pair counts across
    datasets reuse ONE compiled program instead of recompiling per slice
    pair. Masked rows contribute exact zeros to every reduction, so real
    rows get bit-identical results to the unpadded kernel."""
    N, D = train_x.shape
    alpha0 = 1.0
    distance = jnp.maximum(0.0, distance)
    normalize = jnp.max(distance) / (jnp.log(10.0) * 2.0)
    distance = distance / normalize
    weight0 = jnp.exp(-distance * alpha0) * mask
    sigma2_0 = jnp.sum(((train_x - train_y) ** 2) * mask) / (D * n_valid)
    a = jnp.maximum(
        jnp.prod(jnp.max(train_x, axis=0) - jnp.min(train_x, axis=0)),
        jnp.prod(jnp.max(train_y, axis=0) - jnp.min(train_y, axis=0)),
    )
    alpha_end = 0.1
    alpha_decrease = jnp.power(alpha_end / alpha0, 1.0 / (max_iter - 20))

    P0 = weight0 * jnp.ones((N, 1))
    state = dict(
        P=P0,
        R=jnp.eye(D),
        t=jnp.zeros((D,)),
        y_hat=train_x,
        sigma2=sigma2_0,
        gamma=jnp.asarray(0.5),
        alpha=jnp.asarray(alpha0),
        weight=weight0,
        Sp=jnp.sum(P0),
    )

    def body(it, s):
        mu_x = jnp.sum(train_x * s["P"], 0) / s["Sp"]
        mu_y = jnp.sum(train_y * s["P"], 0) / s["Sp"]
        X_mu, Y_mu = train_x - mu_x, train_y - mu_y
        A = (Y_mu.T @ (X_mu * s["P"]))
        R = procrustes_rotation(A)
        t = mu_y - mu_x @ R.T
        y_hat = train_x @ R.T + t
        term1 = jnp.exp(-jnp.sum((train_y - y_hat) ** 2, 1, keepdims=True) / (2 * s["sigma2"])) * s["weight"]
        outlier_part = jnp.max(s["weight"]) * (1 - s["gamma"]) * jnp.power(2 * jnp.pi * s["sigma2"], D / 2) / (
            s["gamma"] * a
        )
        P = term1 / (term1 + outlier_part)
        Sp = jnp.sum(P)
        gamma = jnp.clip(Sp / n_valid, 0.01, 0.99)
        P = jnp.maximum(P, 1e-6) * mask
        sigma2 = jnp.sum((y_hat - train_y) ** 2 * P) / (D * Sp)
        alpha = jnp.where(it > 20, s["alpha"] * alpha_decrease, s["alpha"])
        weight = jnp.where(it > 20, jnp.exp(-distance * alpha) * mask, s["weight"])
        weight = jnp.where(it > 20, weight / jnp.max(weight), weight)
        return dict(P=P, R=R, t=t, y_hat=y_hat, sigma2=sigma2, gamma=gamma, alpha=alpha, weight=weight, Sp=Sp)

    s = jax.lax.fori_loop(0, max_iter, body, state)

    fix_sigma2, fix_gamma = 1e-2, 0.1
    term1 = jnp.exp(-jnp.sum((train_y - s["y_hat"]) ** 2, 1, keepdims=True) / (2 * fix_sigma2)) * s["weight"]
    outlier_part = jnp.max(s["weight"]) * (1 - fix_gamma) * jnp.power(2 * jnp.pi * fix_sigma2, D / 2) / (fix_gamma * a)
    P = term1 / (term1 + outlier_part) * mask
    gamma = jnp.clip(jnp.sum(P) / n_valid, 0.01, 0.99)
    return P, s["R"], s["t"], weight0, s["sigma2"], gamma


@partial(jax.jit, static_argnames=("kth", "metric"))
def min_dist_order_stat(X, Y, kth: int, metric: str = "kl"):
    """kth order statistic of the per-row minimum pairwise distance, fused
    on device (probability-parameter init) — only the scalar crosses the
    tunnel."""
    [D] = calc_distance(X, Y, metric=metric)
    return jnp.sort(jnp.min(D, axis=1))[kth]


@partial(jax.jit, static_argnames=("metric", "top_k"))
def mutual_topk_distance(X, Y, n_x, n_y, metric: str = "kl", top_k: int = 10):
    """Device-side mutual top-K nearest matching on a padded distance
    matrix: per-row and per-column K smallest entries, with the padding
    rows/cols masked out.  Replaces the coarse-init pattern of pulling the
    full [Nx, Ny] matrix to host for `np.argpartition` — over the tunneled
    TPU that pull costs ~100x more than the reduction itself.

    Returns (row_vals [Nx,K], row_idx [Nx,K], col_vals [Ny,K], col_idx
    [Ny,K]): for row i its K nearest columns, for column j its K nearest
    rows."""
    [D] = calc_distance(X, Y, metric=metric)
    big = jnp.finfo(D.dtype).max
    valid = (jnp.arange(D.shape[0])[:, None] < n_x) & (jnp.arange(D.shape[1])[None, :] < n_y)
    Dm = jnp.where(valid, D, big)
    neg_row_vals, row_idx = jax.lax.top_k(-Dm, top_k)
    neg_col_vals, col_idx = jax.lax.top_k(-Dm.T, top_k)
    return -neg_row_vals, row_idx, -neg_col_vals, col_idx


def morton_code(coords: np.ndarray, bits: int = 16) -> np.ndarray:
    """Morton (Z-order) code of each point — quantize each dimension to
    `bits` and interleave. Sorting rows by this code makes consecutive rows
    spatial neighbors, which turns the Pallas E-step's [row-tile, col-tile]
    blocks into spatial neighborhoods so far-apart tiles can be skipped
    (block-sparse E-step; see ops/estep_pallas.py)."""
    c = np.asarray(coords, np.float64)
    mins = c.min(axis=0)
    spans = np.maximum(c.max(axis=0) - mins, 1e-12)
    q = ((c - mins) / spans * (2**bits - 1)).astype(np.uint64)
    D = c.shape[1]
    code = np.zeros(len(c), np.uint64)
    for b in range(bits):
        for d in range(D):
            code |= ((q[:, d] >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * D + d)
    return code


def pad_rows_bucket(arr: np.ndarray, mult: int = 1024) -> np.ndarray:
    """Pad the row count up to a multiple of `mult` with copies of row 0 —
    shape-bucketing so data-dependent sizes (voxel occupancy, NN pair
    counts) hit one jit-compiled program instead of recompiling per pair."""
    arr = np.asarray(arr)
    n = arr.shape[0]
    target = ((n + mult - 1) // mult) * mult
    if target == n or n == 0:
        return arr
    return np.concatenate([arr, np.repeat(arr[:1], target - n, axis=0)], axis=0)


def inlier_from_NN(train_x, train_y, distance) -> Tuple[np.ndarray, ...]:
    """Host-facing wrapper returning numpy (parity signature with reference).
    Rows are padded to a 2048-multiple bucket (masked inside the kernel) so
    every slice pair of similar scale reuses one compiled program."""
    n = np.asarray(train_x).shape[0]
    tx = pad_rows_bucket(np.asarray(train_x, np.float32), 2048)
    ty = pad_rows_bucket(np.asarray(train_y, np.float32), 2048)
    dd = pad_rows_bucket(np.asarray(distance, np.float32), 2048)
    mask = np.zeros((tx.shape[0], 1), np.float32)
    mask[:n] = 1.0
    P, R, t, w, sigma2, gamma = _inlier_from_NN_kernel(
        jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(dd), jnp.asarray(mask), jnp.asarray(float(n))
    )
    return np.asarray(P)[:n], np.asarray(R), np.asarray(t), np.asarray(w)[:n], float(sigma2), float(gamma)


def voxel_data(
    coords: np.ndarray,
    gene_exp: np.ndarray,
    voxel_size: Optional[float] = None,
    voxel_num: Optional[int] = 10000,
) -> Tuple[np.ndarray, np.ndarray]:
    """Mean-pool points and expression into spatial voxels (parity:
    methods/utils.py:1283). Host-side binning + device segment means."""
    coords = np.asarray(coords)
    gene_exp = np.asarray(gene_exp)
    D = coords.shape[1]
    mins, maxs = coords.min(0), coords.max(0)
    if voxel_size is None:
        voxel_size = float(np.prod(maxs - mins + 1e-12) / voxel_num) ** (1.0 / D)
    grid = np.floor((coords - mins) / max(voxel_size, 1e-12)).astype(np.int64)
    dims = grid.max(0) + 1
    flat = np.zeros(len(coords), dtype=np.int64)
    for d in range(D):
        flat = flat * dims[d] + grid[:, d]
    uniq, codes = np.unique(flat, return_inverse=True)
    n = len(uniq)
    counts = np.bincount(codes).astype(float)
    vox_coords = np.zeros((n, D))
    for d in range(D):
        vox_coords[:, d] = np.bincount(codes, weights=coords[:, d]) / counts
    vox_exp = np.zeros((n, gene_exp.shape[1]), dtype=float)
    for g in range(gene_exp.shape[1]):
        vox_exp[:, g] = np.bincount(codes, weights=gene_exp[:, g]) / counts
    return vox_coords, vox_exp


@jax.jit
def _sigma2_sum(XA, XB):
    return jnp.sum(euc_dist(XA, XB, squared=True) ** 2)


def init_guess_sigma2(XA: np.ndarray, XB: np.ndarray, subsample: int = 20000) -> float:
    """Initial sigma2 guess (parity: methods/utils.py:1339). The whole
    distance + square + sum runs as one fused device program; only the
    scalar crosses the tunnel."""
    return float(init_guess_sigma2_dev(XA, XB, subsample=subsample))


def init_guess_sigma2_dev(XA: np.ndarray, XB: np.ndarray, subsample: int = 20000) -> jnp.ndarray:
    """init_guess_sigma2 without the host pull: returns the DEVICE scalar so
    a downstream jitted consumer (the Morpho EM) chains on it asynchronously
    — the blocking float() costs a full tunnel round trip before the EM can
    even be dispatched."""
    rng = np.random.default_rng(0)
    NA, NB, D = XA.shape[0], XB.shape[0], XA.shape[1]
    sa = rng.choice(NA, subsample, replace=False) if NA > subsample else np.arange(NA)
    sb = rng.choice(NB, subsample, replace=False) if NB > subsample else np.arange(NB)
    return _sigma2_sum(jnp.asarray(XA[sa]), jnp.asarray(XB[sb])) / (D * len(sa) * len(sa))


def normalize_coords(
    coords: List[np.ndarray],
    separate_mean: bool = True,
    separate_scale: bool = False,
) -> Tuple[List[np.ndarray], np.ndarray, np.ndarray]:
    """Zero-center and scale-normalize coordinate sets (parity:
    methods/utils.py:516)."""
    D = coords[0].shape[1]
    normalize_means = np.stack([c.mean(0) for c in coords])
    if not separate_mean:
        normalize_means = np.tile(normalize_means.mean(0), (len(coords), 1))
    coords = [c - m for c, m in zip(coords, normalize_means)]
    normalize_scales = np.array([np.sqrt((c**2).sum() / c.shape[0]) for c in coords])
    if not separate_scale:
        normalize_scales = np.full(len(coords), normalize_scales.mean())
    coords = [c / s for c, s in zip(coords, normalize_scales)]
    return coords, normalize_scales, normalize_means


def factorize_distance(
    X: jnp.ndarray,
    Y: jnp.ndarray,
    metric: str = "euc",
    label_transfer: Optional[jnp.ndarray] = None,
    eps: float = 1e-8,
):
    """Factor a pairwise distance as `d_ij = a_i + b_j + (A @ B.T)_ij`.

    Every metric in `calc_distance` is a GEMM plus rank-1 row/col terms, so
    the Morpho EM can evaluate the [NA, B] minibatch distance on the fly
    (one MXU GEMM per iteration) instead of precomputing and gathering the
    full [NA, NB] tensor — O((NA+NB)·G) memory instead of O(NA·NB), and
    ~80 MB/iteration less HBM traffic at 20k cells.

    Returns (a_row [NA], b_col [NB], A_feat [NA, G'], B_feat [NB, G']).
    """
    X = jnp.asarray(X, jnp.float32)
    Y = jnp.asarray(Y, jnp.float32)
    NA, NB = X.shape[0], Y.shape[0]
    if metric in ("euc", "euclidean"):
        return (
            jnp.sum(X * X, axis=1),
            jnp.sum(Y * Y, axis=1),
            -2.0 * X,
            Y,
        )
    if metric == "kl":
        Xp = X + 0.01
        Yp = Y + 0.01
        Xp = Xp / jnp.sum(Xp, axis=1, keepdims=True)
        Yp = Yp / jnp.sum(Yp, axis=1, keepdims=True)
        return (
            jnp.sum(Xp * jnp.log(Xp + eps), axis=1),
            jnp.zeros(NB, jnp.float32),
            Xp,
            -jnp.log(Yp + eps),
        )
    if metric == "sym_kl":
        Xp = X + 0.01
        Yp = Y + 0.01
        Xp = Xp / jnp.sum(Xp, axis=1, keepdims=True)
        Yp = Yp / jnp.sum(Yp, axis=1, keepdims=True)
        lX = jnp.log(Xp + eps)
        lY = jnp.log(Yp + eps)
        A = 0.5 * jnp.concatenate([Xp, lX], axis=1)
        B = jnp.concatenate([-lY, -Yp], axis=1)
        return (
            0.5 * jnp.sum(Xp * lX, axis=1),
            0.5 * jnp.sum(Yp * lY, axis=1),
            A,
            B,
        )
    if metric in ("cos", "cosine"):
        Xn = X / (jnp.linalg.norm(X, axis=1, keepdims=True) + eps)
        Yn = Y / (jnp.linalg.norm(Y, axis=1, keepdims=True) + eps)
        # d = 0.5 - 0.5 * sim (reference methods/utils.py:741)
        return (
            jnp.full(NA, 0.25, jnp.float32),
            jnp.full(NB, 0.25, jnp.float32),
            -0.5 * Xn,
            Yn,
        )
    if metric == "label":
        assert label_transfer is not None
        C1, C2 = label_transfer.shape
        onehot_x = jax.nn.one_hot(X.astype(jnp.int32).ravel(), C1, dtype=jnp.float32)
        onehot_y = jax.nn.one_hot(Y.astype(jnp.int32).ravel(), C2, dtype=jnp.float32)
        return (
            jnp.zeros(NA, jnp.float32),
            jnp.zeros(NB, jnp.float32),
            onehot_x @ label_transfer.astype(jnp.float32),
            onehot_y,
        )
    raise ValueError(f"Unsupported metric {metric}")


def estep_reduced(
    Dim: float,
    XAHat: jnp.ndarray,  # [NA, D]
    coordsA: jnp.ndarray,  # [NA, D] (original, for the M1 cross term)
    coordsB_batch: jnp.ndarray,  # [B, D]
    exp_a_rows,  # tuple of [NA]
    exp_b_batch,  # tuple of [B]
    exp_A_feats,  # tuple of [NA, G_l]
    exp_B_batch,  # tuple of [B, G_l]
    sigma2: jnp.ndarray,
    model_mul_vec: jnp.ndarray,  # [NA]
    gamma: jnp.ndarray,
    samples_s: jnp.ndarray,
    sigma2_variance: jnp.ndarray,
    probability_type,
    probability_parameters,
    n_chunks: int = 8,
    eps: float = 1e-8,
    sparse_top_k: int = 0,
    use_pallas: bool = False,
):
    """Flash-style E-step: every consumer of the [NA, B] assignment matrix
    is a reduction, so P is never materialized (SURVEY §7 'hard part' —
    the online-normalized E-step). Two chunked passes over the NA axis:
    pass 1 accumulates the three column normalizers, pass 2 recomputes the
    probabilities per chunk and reduces them into
    (K_NA, K_NB, Sp, K_NA_spatial, Sp_spatial, K_NA_sigma2, Sp_sigma2,
    sigma2_related, PXB = P @ coordsB_batch, M1 = coordsA^T P coordsB_batch).

    Equivalent math to `get_P_core` + the P-sums in the EM body; HBM
    traffic drops from ~10 [NA, B] materializations to ~2 transient
    chunk-local ones.

    `sparse_top_k > 0` enables the reference's sparse calculation mode
    (reference morpho_class.py:139-140, methods/utils.py:1369
    `_dense_to_sparse(axis=0, topk)`): the assignment matrix P is
    sparsified to the top-k entries of each COLUMN before the M-step
    reductions. The column normalizers and the sigma2 statistics come from
    the dense P (the reference sparsifies after `get_P_core` returns), and
    because the final P shares its per-column denominator with its
    numerator, the top-k threshold is computed on the numerator via a
    streaming per-column running-top-k pass — P itself is still never
    materialized."""
    NA, D = XAHat.shape
    B = coordsB_batch.shape[0]

    # Pallas fused path (single chip, one gauss expression layer, 2-D):
    # every [tile, tile] probability block is computed in VMEM and only the
    # O(NA + B) reductions are written (ops/estep_pallas.py). The kernel
    # streams input blocks from HBM via grid BlockSpecs (Mosaic
    # double-buffers the copies), so there is NO problem-size cap — it
    # covers the reference's own headline 100k+-cell regime. The dense XLA
    # path keeps the fits-in-HBM regime, where removing the HBM traffic
    # doesn't pay for the kernel's second transcendental sweep.
    if (
        use_pallas
        and n_chunks > 1  # dense XLA wins when everything fits HBM; pallas wins the chunked regime (4.7x at 40k x 8k)
        and not sparse_top_k
        and D == 2
        and len(exp_a_rows) == 1
        and list(probability_type) == ["gauss"]
        # the kernel streams [G+1, tile] feature blocks through VMEM; very
        # wide factorizations (e.g. 'kl' over thousands of genes) would not
        # fit the double-buffered working set — those fall back to chunked
        # XLA. (NA/B are unbounded — only the feature width matters.)
        and exp_A_feats[0].shape[1] <= 1024
    ):
        from ...ops.estep_pallas import estep_pallas

        return estep_pallas(
            XAHat, coordsA, coordsB_batch,
            exp_a_rows[0], exp_b_batch[0], exp_A_feats[0], exp_B_batch[0],
            model_mul_vec, sigma2, gamma, samples_s, sigma2_variance,
            probability_parameters[0], eps=eps,
        )

    # Dense fast path: with one chunk the [NA, B] probability tensors fit
    # in HBM, so compute them ONCE and feed both the column normalizers and
    # the reductions — the chunked variant recomputes every GEMM and exp in
    # pass 2 (the memory-bound discipline only pays off when it must).
    if n_chunks <= 1:
        b2d = jnp.sum(coordsB_batch * coordsB_batch, axis=1)[None, :]
        d = jnp.maximum(
            jnp.sum(XAHat * XAHat, 1)[:, None] + b2d - 2.0 * jnp.matmul(XAHat, coordsB_batch.T, precision="highest"),
            0.0,
        )
        prob_v = jnp.exp(-d / (2 * sigma2 / sigma2_variance))
        prob_s = jnp.exp(-d / (2 * sigma2))
        full = prob_s
        for l in range(len(exp_a_rows)):
            e_d = (
                exp_a_rows[l][:, None]
                + exp_b_batch[l][None, :]
                + jnp.matmul(exp_A_feats[l], exp_B_batch[l].T, precision="highest")
            )
            full = full * calc_probability(e_d, probability_type[l], probability_parameters[l])
        mm = model_mul_vec[:, None]
        prob_v_m = prob_v * mm
        prob_s_m = prob_s * mm
        full_m = full * mm

        c1_raw = prob_v.sum(0)
        outlier_s = samples_s * NA
        spatial_outlier = jnp.power(2 * jnp.pi * sigma2, Dim / 2) * (1 - gamma) / (gamma * outlier_s)
        spatial_inlier = 1 - spatial_outlier / (spatial_outlier + c1_raw)
        P1 = prob_v_m / (spatial_outlier + prob_v_m.sum(0))[None, :]
        P2 = spatial_inlier[None, :] * prob_s_m / (prob_s_m.sum(0) + eps)[None, :]
        P3 = spatial_inlier[None, :] * full_m / (full_m.sum(0) + eps)[None, :]
        k_sparse = min(int(sparse_top_k), NA) if sparse_top_k and sparse_top_k > 0 else 0
        if k_sparse and k_sparse < NA:
            topk_vals, _ = jax.lax.top_k(full_m.T, k_sparse)  # [B, k]
            P3 = jnp.where(full_m >= topk_vals[:, -1][None, :], P3, 0.0)
        return dict(
            K_NA=P3.sum(1),
            K_NA_spatial=P1.sum(1),
            K_NA_sigma2=P2.sum(1),
            K_NB=P3.sum(0),
            Sp=P3.sum(),
            sigma2_related=(P2 * d).sum(),
            PXB=jnp.matmul(P3, coordsB_batch, precision="highest"),
            M1=jnp.matmul(coordsA.T, jnp.matmul(P3, coordsB_batch, precision="highest"), precision="highest"),
        )

    # ---- chunked path: iterate over COLUMNS of the [NA, B] block ----
    # The normalizers are per-column sums over the whole NA axis, so a
    # column chunk sees its full denominators immediately: ONE streaming
    # pass computes every reduction (the earlier row-chunked variant needed
    # a second pass that recomputed all GEMMs and transcendentals).
    Bc = -(-B // n_chunks)  # chunk columns
    padB = Bc * n_chunks - B

    def pad_cols(x, fill=0.0):
        if padB == 0:
            return x
        cfg = [(0, padB)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, cfg, constant_values=fill)

    # padded columns sit far away (huge spatial distance -> prob 0); their
    # normalizers degenerate to the outlier-only denominator, giving exact
    # zero contributions to every reduction
    cB_p = pad_cols(coordsB_batch, 1e6).reshape(n_chunks, Bc, D)
    b_p = tuple(pad_cols(b, 0.0).reshape(n_chunks, Bc) for b in exp_b_batch)
    B_p = tuple(pad_cols(Bf, 0.0).reshape(n_chunks, Bc, -1) for Bf in exp_B_batch)

    a2 = jnp.sum(XAHat * XAHat, axis=1)[:, None]  # [NA, 1]
    mm_col = model_mul_vec[:, None]
    outlier_s = samples_s * NA
    spatial_outlier = jnp.power(2 * jnp.pi * sigma2, Dim / 2) * (1 - gamma) / (gamma * outlier_s)
    k_sparse = min(int(sparse_top_k), NA) if sparse_top_k and sparse_top_k > 0 else 0

    def chunk_cols(cb, bb, BB):
        d = jnp.maximum(
            a2 + jnp.sum(cb * cb, 1)[None, :] - 2.0 * jnp.matmul(XAHat, cb.T, precision="highest"), 0.0
        )
        prob_v = jnp.exp(-d / (2 * sigma2 / sigma2_variance))
        prob_s = jnp.exp(-d / (2 * sigma2))
        full = prob_s
        for l in range(len(exp_a_rows)):
            e_d = exp_a_rows[l][:, None] + bb[l][None, :] + jnp.matmul(exp_A_feats[l], BB[l].T, precision="highest")
            full = full * calc_probability(e_d, probability_type[l], probability_parameters[l])
        return d, prob_v, prob_s * mm_col, full * mm_col, prob_v * mm_col

    def body(carry, inp):
        (K_NA, K_NA_sp, K_NA_s2, K_NB, Sp, sig_rel, PXB, M1, idx) = carry
        cb, bb, BB = inp
        d, prob_v, prob_s_m, full_m, prob_v_m = chunk_cols(cb, bb, BB)
        spatial_inlier = 1 - spatial_outlier / (spatial_outlier + prob_v.sum(0))  # [Bc]
        P1 = prob_v_m / (spatial_outlier + prob_v_m.sum(0))[None, :]
        P2 = spatial_inlier[None, :] * prob_s_m / (prob_s_m.sum(0) + eps)[None, :]
        P3 = spatial_inlier[None, :] * full_m / (full_m.sum(0) + eps)[None, :]
        if k_sparse and k_sparse < NA:
            topk_vals, _ = jax.lax.top_k(full_m.T, k_sparse)  # [Bc, k]
            P3 = jnp.where(full_m >= topk_vals[:, -1][None, :], P3, 0.0)
        K_NA = K_NA + P3.sum(1)
        K_NA_sp = K_NA_sp + P1.sum(1)
        K_NA_s2 = K_NA_s2 + P2.sum(1)
        K_NB = jax.lax.dynamic_update_slice(K_NB, P3.sum(0), (idx * Bc,))
        Sp = Sp + P3.sum()
        sig_rel = sig_rel + (P2 * d).sum()
        pxb = jnp.matmul(P3, cb, precision="highest")
        PXB = PXB + pxb
        M1 = M1 + jnp.matmul(coordsA.T, pxb, precision="highest")
        return (K_NA, K_NA_sp, K_NA_s2, K_NB, Sp, sig_rel, PXB, M1, idx + 1), None

    init = (
        jnp.zeros(NA, jnp.float32),
        jnp.zeros(NA, jnp.float32),
        jnp.zeros(NA, jnp.float32),
        jnp.zeros(Bc * n_chunks, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.asarray(0.0, jnp.float32),
        jnp.zeros((NA, D), jnp.float32),
        jnp.zeros((D, D), jnp.float32),
        0,
    )
    (K_NA, K_NA_sp, K_NA_s2, K_NB, Sp, sig_rel, PXB, M1, _), _ = jax.lax.scan(body, init, (cB_p, b_p, B_p))
    return dict(
        K_NA=K_NA,
        K_NA_spatial=K_NA_sp,
        K_NA_sigma2=K_NA_s2,
        K_NB=K_NB[:B],
        Sp=Sp,
        sigma2_related=sig_rel,
        PXB=PXB,
        M1=M1,
    )
