"""Morpho pairwise alignment: Bayesian non-rigid + rigid EM, fully on device.

TPU-native re-derivation of reference spateo/alignment/methods/morpho_class.py
(`Morpho_pairwise`:54 — coarse NN init :898, variational init :683, EM loop
:242-313 with E-step :1071/get_P_core, gamma/alpha :1202/:1226, non-rigid
Nyström M-step :1254, rigid SVD M-step :1300, sigma2 :1410, final Procrustes
:1437, output :1471). Architectural differences from the reference:

- The ENTIRE EM loop runs as one jitted `lax.fori_loop`: no per-iteration
  host round-trips, no torch/numpy dual backend. SVI minibatch indices are
  precomputed as a [max_iter, B] array and gathered per iteration.
- The non-rigid stage gate (iter > nonrigid_start_iter) is a branch-free
  `jnp.where` on a carried flag.
- Pairwise distance + column-softmax E-step are MXU matmuls + VPU reductions.
  When `coordsA`/`exp_A` rows are sharded over the mesh ('data' axis), the
  axis-0 sums in `get_P_core` compile to psum collectives over ICI, giving
  the tensor-parallel E-step described in SURVEY.md §2.12.
- Sparse calculation mode (reference morpho_class.py:139-140 +
  methods/utils.py:1369 `_dense_to_sparse`) keeps only the top-k entries of
  each P column in the M-step reductions — implemented as a streaming
  per-column threshold inside the flash E-step (`math.estep_reduced`
  pass 1.5), so P still never materializes; the exposed `P` becomes a scipy
  CSR top-k matrix as in the reference.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from scipy import sparse as sp

from ...configuration import SKM
from ...core.anndata import AnnData
from ...errors import AlignmentError
from ...logging import logger_manager as lm
from .math import (
    calc_distance,
    estep_reduced,
    con_K,
    euc_dist,
    get_P_core,
    init_guess_sigma2,
    inlier_from_NN,
    normalize_coords,
    procrustes_rotation,
    voxel_data,
)


def get_rep(sample: AnnData, rep: str = "X", rep_field: str = "layer", genes=None) -> np.ndarray:
    """Extract a representation (expression layer / obsm embedding / obs label)
    (parity: reference methods/utils.py:441)."""
    if rep_field == "layer":
        s = sample[:, np.asarray(genes)] if genes is not None else sample
        X = s.X if rep == "X" else s.layers[rep]
        X = X.toarray() if sp.issparse(X) else np.asarray(X)
        return np.asarray(X, dtype=np.float32)
    if rep_field == "obsm":
        return np.asarray(sample.obsm[rep], dtype=np.float32)
    if rep_field == "obs":
        codes = np.asarray(sample.obs[rep].astype("category").cat.codes)
        return codes.astype(np.int32)
    raise AlignmentError(f"Unsupported rep_field {rep_field}")


@jax.jit
def _widen_f32(x):
    return x.astype(jnp.float32)


def _upload_compact(arr) -> jnp.ndarray:
    """Upload an expression array with the narrowest lossless dtype.

    UMI count layers are small non-negative integers stored as float; over
    the tunneled device a uint8/uint16 upload costs 4x/2x less than f32.
    Integer label-code arrays keep their dtype (the label metric indexes
    with them). Anything non-integer-valued falls back to f32."""
    arr = np.asarray(arr)
    if arr.dtype.kind in "iu":
        return jnp.asarray(arr)
    if arr.dtype.kind == "f" and arr.size:
        amax = float(arr.max(initial=0.0))
        amin = float(arr.min(initial=0.0))
        if amin >= 0.0 and amax <= 65535.0 and not np.any(arr != np.floor(arr)):
            narrow = np.uint8 if amax <= 255.0 else np.uint16
            return _widen_f32(jnp.asarray(arr.astype(narrow)))
    return jnp.asarray(arr.astype(np.float32))


def filter_common_genes(*genes_lists, verbose: bool = True) -> List[str]:
    common = set(genes_lists[0])
    for g in genes_lists[1:]:
        common &= set(g)
    common_genes = sorted(common)
    if len(common_genes) == 0:
        raise AlignmentError("No common genes between samples.")
    return common_genes


# ---------------------------------------------------------------------------
# Fused coarse-init matching + robust rigid fit
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("top_k", "metric", "allow_flip"))
def _coarse_match_fit(X_A_p, X_B_p, cA_p, cB_p, n1, n2, *, top_k: int, metric: str, allow_flip: bool):
    """The whole coarse-init chain as ONE device program: expression
    distance -> mutual top-K matching -> NN pair gather -> 100-iteration
    inlier EM (x2 under the flip hypothesis) -> posterior threshold.

    Same math as reference methods/utils.py `inlier_from_NN` driven by
    morpho_class.py:898 `_coarse_rigid_alignment`, but nothing larger than
    R/t crosses the host boundary and sub-threshold NN rows are kept with
    weight 0 instead of sliced away (exactly neutral downstream, and the
    fixed row count means one compiled program across slice pairs).

    Padding semantics: rows/cols >= n1/n2 are masked out of the top-K via
    +inf distances; their gathered coordinates are real voxel coordinates
    (pad rows are row-0 copies), so the EM's extent/max statistics match
    the unpadded reference computation."""
    from .math import _inlier_from_NN_kernel, calc_distance

    n1p, n2p = X_A_p.shape[0], X_B_p.shape[0]
    [Dmat] = calc_distance(X_A_p, X_B_p, metric=metric)
    big = jnp.finfo(Dmat.dtype).max
    valid = (jnp.arange(n1p)[:, None] < n1) & (jnp.arange(n2p)[None, :] < n2)
    Dm = jnp.where(valid, Dmat, big)
    neg_row_vals, row_idx = jax.lax.top_k(-Dm, top_k)  # per A row: K nearest B cols
    neg_col_vals, col_idx = jax.lax.top_k(-Dm.T, top_k)  # per B col: K nearest A rows
    # NN pairs (B index, A index) in the reference's NN1/NN2 order
    b_idx = jnp.concatenate([jnp.repeat(jnp.arange(n2p), top_k), row_idx.ravel()])
    a_idx = jnp.concatenate([col_idx.ravel(), jnp.repeat(jnp.arange(n1p), top_k)])
    dist = jnp.concatenate([(-neg_col_vals).ravel(), (-neg_row_vals).ravel()])
    mask = jnp.concatenate(
        [jnp.repeat(jnp.arange(n2p) < n2, top_k), jnp.repeat(jnp.arange(n1p) < n1, top_k)]
    ).astype(jnp.float32)[:, None]
    dist = jnp.where(mask > 0, dist[:, None], 0.0)
    train_x = cA_p[a_idx]
    train_y = cB_p[b_idx]
    n_valid = (n1 + n2).astype(jnp.float32) * top_k
    P, R, t, _, sigma2, gamma = _inlier_from_NN_kernel(train_x, train_y, dist, mask, n_valid)
    flipped = jnp.asarray(False)
    if allow_flip:
        Dd = train_x.shape[1]
        R_flip = jnp.eye(Dd, dtype=train_x.dtype).at[-1, -1].set(-1.0)
        P2, R2, t2, _, _, gamma_2 = _inlier_from_NN_kernel(train_x @ R_flip, train_y, dist, mask, n_valid)
        better = gamma_2 > gamma
        P = jnp.where(better, P2, P)
        R = jnp.where(better, R2 @ R_flip, R)
        t = jnp.where(better, t2, t)
        flipped = better
    # reference threshold: min(21st-largest posterior, 0.5); keep all rows,
    # zeroing the sub-threshold ones (morpho_class.py inlier_set slicing)
    k_thr = min(20, train_x.shape[0] - 1)
    thr = jnp.minimum(jax.lax.top_k(P[:, 0], k_thr + 1)[0][-1], 0.5)
    inlier_P = jnp.where(P > thr, P, 0.0)
    return train_x, train_y, inlier_P, R, t, flipped


# ---------------------------------------------------------------------------
# The jitted EM core
# ---------------------------------------------------------------------------
@partial(jax.jit, static_argnames=("Dim", "probability_type"))
def _rebuild_P(
    XAHat_n, coordsB, bidx, mm, sigma2, gamma, samples_s, s2v, a_rows, b_cols, A_feats, B_feats, pparams,
    *, Dim: float, probability_type: tuple,
):
    """Lazy reconstruction of the final-batch assignment matrix as one
    fused program (eager evaluation would materialize every [NA, B]
    intermediate separately — ~20 GB at 100k x 10k). Module-level jit so
    the compilation is shared across Morpho instances of the same shape."""
    coordsB_batch = coordsB[bidx]
    exp_dist_batch = [
        a[:, None] + b[bidx][None, :] + A @ Bf[bidx].T
        for a, b, A, Bf in zip(a_rows, b_cols, A_feats, B_feats)
    ]
    spatial_dist = euc_dist(XAHat_n, coordsB_batch, squared=True)
    P, _, _, _ = get_P_core(
        Dim=Dim,
        spatial_dist=spatial_dist,
        exp_dist=exp_dist_batch,
        sigma2=sigma2,
        model_mul=mm,
        gamma=gamma,
        samples_s=samples_s,
        sigma2_variance=s2v,
        probability_type=list(probability_type),
        probability_parameters=list(pparams),
    )
    return P


def _estep_chunks(NA: int, batch_size: int, hbm_fraction: float = 0.25) -> int:
    """Number of batch-axis (column) chunks for the flash E-step, sized to
    the device: ~4 [NA, B/chunks] f32 temporaries live per chunk; budget
    them against a fraction of the accelerator's reported HBM (falls back
    to 16 GB — a v5e chip — when the backend doesn't report memory stats).
    One chunk selects the dense single-pass path."""
    hbm = 16e9
    try:
        stats = jax.devices()[0].memory_stats() or {}
        hbm = float(stats.get("bytes_limit", hbm)) or hbm
    except Exception:
        pass
    budget = hbm_fraction * hbm
    return max(1, int(np.ceil(NA * batch_size * 4 * 4 / budget)))


@partial(
    jax.jit,
    static_argnames=(
        "batch_size",
        "max_iter",
        "n_traces",
        "nonrigid_start_iter",
        "probability_type",
        "update_R",
        "nn_init",
        "guidance_effect",
        "estep_chunks",
        "svi_mode",
        "sparse_top_k",
        "use_pallas_estep",
    ),
)
def _morpho_em(
    coordsA: jnp.ndarray,  # [NA, D] (after coarse init transform)
    coordsB: jnp.ndarray,  # [NB, D]
    exp_a_rows: Tuple[jnp.ndarray, ...],  # per layer: [NA] row terms
    exp_b_cols: Tuple[jnp.ndarray, ...],  # per layer: [NB] col terms
    exp_A_feats: Tuple[jnp.ndarray, ...],  # per layer: [NA, G'_l]
    exp_B_feats: Tuple[jnp.ndarray, ...],  # per layer: [NB, G'_l]
    U: jnp.ndarray,  # [NA, K]
    GammaSparse: jnp.ndarray,  # [K, K]
    batch_perm: jnp.ndarray,  # [NB_pad] int32 cyclic permutation
    morton_rank_B: jnp.ndarray,  # [NB] int32 Morton rank of each fixed-slice cell
    inlier_A: jnp.ndarray,  # [Ni, D]
    inlier_B: jnp.ndarray,  # [Ni, D]
    inlier_P: jnp.ndarray,  # [Ni, 1]
    X_AI: jnp.ndarray,  # [NI, D] guidance points on the moving slice
    X_BI: jnp.ndarray,  # [NI, D] guidance targets on the fixed slice
    U_I: jnp.ndarray,  # [NI, K] kernel of guidance points vs inducing points
    probability_parameters: jnp.ndarray,  # [L]
    sigma2_init: jnp.ndarray,
    samples_s: jnp.ndarray,
    *,
    batch_size: int,
    max_iter: int = 200,
    n_traces: int = 0,
    nonrigid_start_iter: int = 80,
    probability_type: tuple = ("gauss",),
    update_R: bool = True,
    nn_init: bool = True,
    guidance_effect: str = "none",  # 'none' | 'rigid' | 'nonrigid' | 'both'
    guidance_weight: float = 1.0,
    estep_chunks: int = 8,
    gamma_a: float = 1.0,
    gamma_b: float = 1.0,
    kappa: float = 1.0,
    lambdaVF: float = 1e2,
    partial_robust_level: float = 10.0,
    nn_init_weight: float = 1.0,
    SVI_decay: float = 10.0,
    svi_mode: bool = True,
    sparse_top_k: int = 0,
    use_pallas_estep: bool = False,
):
    NA, D = coordsA.shape
    K = U.shape[1]
    B = batch_size
    NBp = batch_perm.shape[0]

    def schedule_at(it):
        # SVI minibatch schedule: one permutation walked cyclically — the
        # [max_iter, B] schedule materialized on device from an [NB] vector
        # instead of uploading the full table. The drawn index SET is then
        # ordered by Morton rank: identical statistics (reductions over the
        # same set), but the batch's column tiles become spatial
        # neighborhoods, enabling tile skipping in the Pallas E-step.
        bidx = batch_perm[(it * B + jnp.arange(B)) % NBp]
        return bidx[jnp.argsort(morton_rank_B[bidx])]
    Dim = float(D)

    sigma2_variance_end = partial_robust_level
    sigma2_variance_decrease = (sigma2_variance_end / 1.0) ** (1.0 / 100.0)
    inlier_sum = jnp.sum(inlier_P)

    state = dict(
        gamma=jnp.asarray(0.5, jnp.float32),
        alpha=jnp.ones((NA,), jnp.float32),
        sigma2=jnp.asarray(sigma2_init, jnp.float32),
        sigma2_variance=jnp.asarray(1.0, jnp.float32),
        VnA=jnp.zeros((NA, D), jnp.float32),
        RnA=coordsA,
        XAHat=coordsA,
        Coff=jnp.zeros((K, D), jnp.float32),
        SigmaDiag=jnp.zeros((NA,), jnp.float32),
        # algorithm trace (reference morpho_class.py:1043 `_save_iter`):
        # with n_traces == max_iter this is the reference's full
        # per-iteration record of XAHat and sigma2; smaller n_traces gives
        # evenly spaced snapshots (slot it*n_traces//max_iter)
        traces=jnp.zeros((max(n_traces, 1), coordsA.shape[0], coordsA.shape[1]), jnp.float32),
        sigma2_traces=jnp.zeros((max(n_traces, 1),), jnp.float32),
        R=jnp.eye(D, dtype=jnp.float32),
        t=jnp.zeros((D,), jnp.float32),
        SigmaInv=jnp.zeros((K, K), jnp.float32),
        PXB_term=jnp.zeros((NA, D), jnp.float32),
        Sp=jnp.asarray(0.0, jnp.float32),
        Sp_spatial=jnp.asarray(0.0, jnp.float32),
        Sp_sigma2=jnp.asarray(0.0, jnp.float32),
        nonrigid_flag=jnp.asarray(False),
        V_AI=jnp.zeros_like(X_AI),
        R_AI=X_AI,
        M1=jnp.zeros((D, D), jnp.float32),
        Sp_raw=jnp.asarray(0.0, jnp.float32),
        K_NA=jnp.zeros((NA,), jnp.float32),
        K_NB=jnp.zeros((B,), jnp.float32),
        batch_idx=schedule_at(0),
    )

    def body(it, s):
        # SVI stochastic-approximation mixing only applies to minibatch mode;
        # full-batch runs take unmixed updates (reference morpho_class.py
        # performs plain updates when SVI_mode=False)
        step_size = jnp.minimum(1.0, SVI_decay / (it + 1.0)) if svi_mode else jnp.asarray(1.0, jnp.float32)
        batch_idx = schedule_at(it)
        coordsB_batch = coordsB[batch_idx]  # [B, D]
        # ---- E-step (flash-style: the [NA, B] assignment matrix is never
        # materialized; every consumer is a reduction computed chunk-wise,
        # see math.estep_reduced) ----
        model_mul_vec = s["alpha"] * jnp.exp(-s["SigmaDiag"] / s["sigma2"])
        red = estep_reduced(
            Dim,
            s["XAHat"],
            coordsA,
            coordsB_batch,
            tuple(a for a in exp_a_rows),
            tuple(b[batch_idx] for b in exp_b_cols),
            tuple(A for A in exp_A_feats),
            tuple(Bf[batch_idx] for Bf in exp_B_feats),
            s["sigma2"],
            model_mul_vec,
            s["gamma"],
            samples_s,
            s["sigma2_variance"],
            list(probability_type),
            [probability_parameters[l] for l in range(len(exp_a_rows))],
            n_chunks=estep_chunks,
            sparse_top_k=sparse_top_k,
            use_pallas=use_pallas_estep,
        )
        K_NA_spatial = red["K_NA_spatial"]
        K_NA_sigma2 = red["K_NA_sigma2"]
        sigma2_related = red["sigma2_related"]
        Sp = red["Sp"]
        Sp_spatial_new = K_NA_spatial.sum()
        Sp_sigma2_new = K_NA_sigma2.sum()
        K_NA = red["K_NA"]
        K_NB = red["K_NB"]
        Sp_spatial = step_size * Sp_spatial_new + (1 - step_size) * s["Sp_spatial"]
        Sp_total = step_size * Sp + (1 - step_size) * s["Sp"]
        Sp_sigma2 = step_size * Sp_sigma2_new + (1 - step_size) * s["Sp_sigma2"]
        sigma2_related = sigma2_related / (Dim * Sp_sigma2)

        # ---- gamma / alpha (variational) ----
        gamma = jnp.exp(jax.scipy.special.digamma(gamma_a + Sp_spatial) - jax.scipy.special.digamma(gamma_a + gamma_b + B))
        gamma = jnp.clip(gamma, 0.01, 0.99)
        alpha_new = jnp.exp(
            jax.scipy.special.digamma(kappa + K_NA_spatial) - jax.scipy.special.digamma(kappa * NA + Sp_spatial)
        )
        alpha = step_size * alpha_new + (1 - step_size) * s["alpha"]

        # ---- non-rigid M-step (gated) ----
        nonrigid_flag = s["nonrigid_flag"] | (it > nonrigid_start_iter)
        SigmaInv_new = s["sigma2"] * lambdaVF * GammaSparse + U.T @ (U * K_NA[:, None])
        PXB_term_new = red["PXB"] - s["RnA"] * K_NA[:, None]
        SigmaInv = step_size * SigmaInv_new + (1 - step_size) * s["SigmaInv"]
        PXB_term = step_size * PXB_term_new + (1 - step_size) * s["PXB_term"]
        UPXB_term = U.T @ PXB_term
        if guidance_effect in ("nonrigid", "both"):
            g_coef = s["sigma2"] * guidance_weight * Sp_total / X_BI.shape[0]
            SigmaInv = SigmaInv + g_coef * (U_I.T @ U_I)
            UPXB_term = UPXB_term + g_coef * (U_I.T @ (X_BI - s["R_AI"]))
        # regularized linear solves replace pinv. SigmaInv is PD by
        # construction (sigma2*lambdaVF*Gamma + U^T diag(K_NA) U) but can be
        # numerically near-rank-1 when beta is small (the SE kernel saturates),
        # so the ridge is scaled to the trace — playing the role of pinv's
        # small-singular-value truncation.
        ridge = 1e-4 * jnp.trace(SigmaInv) / K + 1e-8
        SigmaInv_reg = SigmaInv + ridge * jnp.eye(K, dtype=SigmaInv.dtype)
        Coff_new = jnp.linalg.solve(SigmaInv_reg, UPXB_term)
        VnA_new = U @ Coff_new
        Sigma_UT = jnp.linalg.solve(SigmaInv_reg, U.T)
        # diag(U Sigma U^T) is >= 0 for PD Sigma; clip numerical noise so the
        # E-step's exp(-SigmaDiag/sigma2) stays bounded.
        SigmaDiag_new = s["sigma2"] * jnp.maximum(jnp.einsum("ij,ji->i", U, Sigma_UT), 0.0)

        use_nr = nonrigid_flag
        V_AI = jnp.where(use_nr, U_I @ Coff_new, s["V_AI"]) if guidance_effect != "none" else s["V_AI"]
        Coff = jnp.where(use_nr, Coff_new, s["Coff"])
        VnA = jnp.where(use_nr, VnA_new, s["VnA"])
        SigmaDiag = jnp.where(use_nr, SigmaDiag_new, s["SigmaDiag"])
        SigmaInv = jnp.where(use_nr, SigmaInv, s["SigmaInv"])
        PXB_term = jnp.where(use_nr, PXB_term, s["PXB_term"])

        # ---- rigid M-step ----
        PXA = (K_NA @ coordsA)[None, :]
        PVA = (K_NA @ VnA)[None, :]
        PXB = (K_NB @ coordsB_batch)[None, :]
        mu_XB, mu_XA, mu_Vn = PXB, PXA, PVA
        mu_X_deno = Sp_total
        mu_Vn_deno = Sp_total
        if nn_init:
            nn_coef = s["sigma2"] * nn_init_weight * Sp_total / inlier_sum
            mu_XB = mu_XB + nn_coef * (inlier_P.T @ inlier_B)
            mu_XA = mu_XA + nn_coef * (inlier_P.T @ inlier_A)
            mu_X_deno = mu_X_deno + nn_coef * inlier_sum
        if guidance_effect in ("rigid", "both"):
            NI = X_BI.shape[0]
            gr_coef = s["sigma2"] * guidance_weight * Sp_total / NI
            mu_XB = mu_XB + gr_coef * jnp.mean(X_BI, axis=0)[None, :]
            mu_XA = mu_XA + gr_coef * jnp.mean(X_AI, axis=0)[None, :]
            mu_Vn = mu_Vn + gr_coef * jnp.mean(s["V_AI"], axis=0)[None, :]
            mu_X_deno = mu_X_deno + gr_coef * NI
            mu_Vn_deno = mu_Vn_deno + gr_coef * NI
        mu_XB = mu_XB / mu_X_deno
        mu_XA = mu_XA / mu_X_deno
        mu_Vn = mu_Vn / mu_Vn_deno

        XA_hat = coordsA - mu_XA
        VnA_hat = VnA - mu_Vn
        # XA_hat^T P XB_hat expanded through the E-step reductions
        # (M1 = coordsA^T P coordsB_batch):
        cA_KNA = K_NA @ coordsA  # [D]
        cB_KNB = K_NB @ coordsB_batch  # [D]
        cross = (
            red["M1"]
            - jnp.outer(cA_KNA, mu_XB[0])
            - jnp.outer(mu_XA[0], cB_KNB)
            + Sp * jnp.outer(mu_XA[0], mu_XB[0])
        )
        A_mat = -(XA_hat.T @ (VnA_hat * K_NA[:, None]) - cross).T
        if nn_init:
            inlier_A_hat = inlier_A - mu_XA
            inlier_B_hat = inlier_B - mu_XB
            A_mat = A_mat - nn_coef * ((inlier_A_hat * inlier_P).T @ (-inlier_B_hat)).T
        if guidance_effect in ("rigid", "both"):
            X_AI_hat = X_AI - mu_XA
            X_BI_hat = X_BI - mu_XB
            V_AI_hat = (V_AI if guidance_effect != "none" else s["V_AI"]) - mu_Vn
            A_mat = A_mat - gr_coef * (X_AI_hat.T @ (V_AI_hat - X_BI_hat)).T
        R_new = procrustes_rotation(A_mat)
        if update_R:
            R = jnp.where(step_size < 1, step_size * R_new + (1 - step_size) * s["R"], R_new)
        else:
            R = s["R"]

        t_numerator = PXB - PVA - PXA @ R.T
        t_deno = Sp_total
        if nn_init:
            t_numerator = t_numerator + nn_coef * (inlier_P.T @ (inlier_B - inlier_A @ R.T))
            t_deno = t_deno + nn_coef * inlier_sum
        if guidance_effect in ("rigid", "both"):
            t_numerator = t_numerator + gr_coef * jnp.sum(X_BI - (V_AI if guidance_effect != "none" else s["V_AI"]) - X_AI @ R.T, axis=0)[None, :]
            t_deno = t_deno + gr_coef * X_BI.shape[0]
        t_new = (t_numerator / t_deno)[0]
        t = jnp.where(step_size < 1, step_size * t_new + (1 - step_size) * s["t"], t_new)

        RnA = coordsA @ R.T + t
        # guidance points track the rigid transform (the reference compounds
        # R_AI repeatedly at morpho_class.py:1409 — a bug; transform X_AI)
        R_AI = X_AI @ R.T + t if guidance_effect != "none" else s["R_AI"]
        XAHat = VnA + RnA

        # ---- sigma2 ----
        sigma2 = jnp.maximum(sigma2_related + (K_NA_sigma2 @ SigmaDiag) / Sp_sigma2, 1e-3)
        sigma2 = jnp.where(it < 100, jnp.maximum(sigma2, 1e-2), sigma2)
        sigma2_variance = jnp.minimum(s["sigma2_variance"] * sigma2_variance_decrease, sigma2_variance_end)

        # per-iteration trace saved AFTER the updates, like the reference's
        # end-of-iteration _save_iter (morpho_class.py:281-282)
        traces = (
            jax.lax.dynamic_update_index_in_dim(s["traces"], XAHat, (it * n_traces) // max_iter, 0)
            if n_traces > 0
            else s["traces"]
        )
        sigma2_traces = (
            jax.lax.dynamic_update_index_in_dim(s["sigma2_traces"], sigma2, (it * n_traces) // max_iter, 0)
            if n_traces > 0
            else s["sigma2_traces"]
        )

        return dict(
            gamma=gamma,
            alpha=alpha,
            sigma2=sigma2,
            sigma2_variance=sigma2_variance,
            VnA=VnA,
            RnA=RnA,
            XAHat=XAHat,
            Coff=Coff,
            SigmaDiag=SigmaDiag,
            R=R,
            t=t,
            SigmaInv=SigmaInv,
            PXB_term=PXB_term,
            Sp=Sp_total,
            Sp_spatial=Sp_spatial,
            Sp_sigma2=Sp_sigma2,
            nonrigid_flag=nonrigid_flag,
            V_AI=V_AI if guidance_effect != "none" else s["V_AI"],
            R_AI=R_AI,
            traces=traces,
            sigma2_traces=sigma2_traces,
            M1=red["M1"],
            Sp_raw=Sp,
            K_NA=K_NA,
            K_NB=K_NB,
            batch_idx=batch_idx,
        )

    s = jax.lax.fori_loop(0, max_iter, body, state)

    # final optimal Procrustes on the last batch (reference :1437),
    # decomposed through the stored reductions (no P matrix):
    # (P XnBBar)^T XnABar = M1^T - (K_NB cB) muA^T - muB (K_NA cA)^T + Sp muB muA^T
    coordsB_last = coordsB[s["batch_idx"]]
    mu_XnA = (s["K_NA"] @ coordsA) / s["Sp"]
    mu_XnB = (s["K_NB"] @ coordsB_last) / s["Sp"]
    A_opt = (
        s["M1"].T
        - jnp.outer(s["K_NB"] @ coordsB_last, mu_XnA)
        - jnp.outer(mu_XnB, s["K_NA"] @ coordsA)
        + s["Sp_raw"] * jnp.outer(mu_XnB, mu_XnA)
    )
    optimal_R = procrustes_rotation(A_opt)
    optimal_t = mu_XnB - mu_XnA @ optimal_R.T
    optimal_RnA = coordsA @ optimal_R.T + optimal_t
    return s, optimal_R, optimal_t, optimal_RnA


class Morpho_pairwise:
    """Pairwise spatial-transcriptomics alignment (parity surface:
    reference morpho_class.py:54)."""

    def __init__(
        self,
        sampleA: AnnData,
        sampleB: AnnData,
        rep_layer: Union[str, List[str]] = "X",
        rep_field: Union[str, List[str]] = "layer",
        genes: Optional[List[str]] = None,
        spatial_key: str = "spatial",
        key_added: str = "align_spatial",
        iter_key_added: Optional[str] = None,
        save_concrete_iter: bool = False,
        vecfld_key_added: Optional[str] = None,
        dissimilarity: Union[str, List[str]] = "kl",
        probability_type: Union[str, List[str]] = "gauss",
        probability_parameters: Optional[List] = None,
        label_transfer_dict: Optional[dict] = None,
        use_hvg: bool = True,
        nn_init: bool = True,
        init_transform: bool = True,
        allow_flip: bool = False,
        init_layer: str = "X",
        init_field: str = "layer",
        nn_init_top_K: int = 10,
        nn_init_weight: float = 1.0,
        max_iter: int = 200,
        nonrigid_start_iter: int = 80,
        SVI_mode: bool = True,
        batch_size: Optional[int] = None,
        pre_compute_dist: bool = True,
        sparse_calculation_mode: bool = False,
        sparse_top_k: int = 1024,
        lambdaVF: float = 1e2,
        beta: float = 0.01,
        K: int = 15,
        kernel_type: str = "euc",
        graph: Optional[object] = None,
        graph_knn: int = 10,
        use_pallas_estep: bool = True,
        sigma2_init_scale: float = 0.1,
        sigma2_end: Optional[float] = None,
        gamma_a: float = 1.0,
        gamma_b: float = 1.0,
        kappa: float = 1.0,
        partial_robust_level: float = 10,
        normalize_c: bool = True,
        normalize_g: bool = False,
        separate_mean: bool = True,
        separate_scale: bool = False,
        dtype: str = "float32",
        device: str = "tpu",
        verbose: bool = True,
        guidance_pair=None,
        guidance_effect=False,
        guidance_weight: float = 1.0,
        use_chunk: bool = False,
        chunk_capacity: float = 1.0,
        return_mapping: bool = False,
        update_R: bool = True,
        seed: int = 0,
        mesh=None,
    ):
        self.sparse_calculation_mode = bool(sparse_calculation_mode)
        self.sparse_top_k = int(sparse_top_k)
        if self.sparse_calculation_mode:
            # reference disables the precomputed dense expression-distance
            # matrix in sparse mode (morpho_class.py:439-440); the flash
            # E-step never materializes it either way, but keep the flag
            # consistent for parity of the recorded settings
            pre_compute_dist = False
        self.sampleA = sampleA
        self.sampleB = sampleB
        self.rep_layer = [rep_layer] if isinstance(rep_layer, str) else list(rep_layer)
        self.rep_field = [rep_field] if isinstance(rep_field, str) else list(rep_field)
        if len(self.rep_field) == 1 and len(self.rep_layer) > 1:
            self.rep_field = self.rep_field * len(self.rep_layer)
        self.genes = list(genes) if genes is not None else None
        self.spatial_key = spatial_key
        self.key_added = key_added
        self.iter_key_added = iter_key_added
        self.vecfld_key_added = vecfld_key_added
        diss = [dissimilarity] if isinstance(dissimilarity, str) else list(dissimilarity)
        self.dissimilarity = [d.lower() for d in diss] * (len(self.rep_layer) if len(diss) == 1 else 1)
        ptype = [probability_type] if isinstance(probability_type, str) else list(probability_type)
        self.probability_type = [p.lower() for p in ptype] * (len(self.rep_layer) if len(ptype) == 1 else 1)
        # labels use 'prob' probability in the reference; 'cos' uses cosine prob
        for i, d in enumerate(self.dissimilarity):
            if d == "label":
                self.probability_type[i] = "prob"
        self.probability_parameters = (
            list(probability_parameters) if probability_parameters is not None else [None] * len(self.rep_layer)
        )
        self.label_transfer_dict = label_transfer_dict
        self.use_hvg = use_hvg
        self.nn_init = nn_init
        self.init_transform = init_transform
        self.allow_flip = allow_flip
        self.init_layer = init_layer
        self.init_field = init_field
        self.nn_init_top_K = nn_init_top_K
        self.nn_init_weight = nn_init_weight
        self.guidance_pair = guidance_pair
        if guidance_effect not in (False, None, "rigid", "nonrigid", "both"):
            raise AlignmentError(f"Invalid guidance_effect {guidance_effect}; use False/'rigid'/'nonrigid'/'both'.")
        self.guidance_effect = guidance_effect if guidance_effect else "none"
        self.guidance_weight = guidance_weight
        self.max_iter = max_iter
        self.nonrigid_start_iter = nonrigid_start_iter
        self.SVI_mode = SVI_mode
        self.batch_size = batch_size
        self.pre_compute_dist = pre_compute_dist
        self.lambdaVF = lambdaVF
        self.beta = beta
        self.K = K
        self.kernel_type = kernel_type
        self.graph = graph
        self.graph_knn = graph_knn
        self.use_pallas_estep = use_pallas_estep
        self.sigma2_init_scale = sigma2_init_scale
        self.sigma2_end = sigma2_end
        self.gamma_a = gamma_a
        self.gamma_b = gamma_b
        self.kappa = kappa
        self.partial_robust_level = partial_robust_level
        self.normalize_c = normalize_c
        self.normalize_g = normalize_g
        self.separate_mean = separate_mean
        self.separate_scale = separate_scale
        self.verbose = verbose
        self.return_mapping = return_mapping
        self.update_R = update_R
        self.seed = seed
        # optional jax.sharding.Mesh: shards the moving slice's NA axis over
        # the mesh's first axis inside the EM (multi-chip tensor parallelism)
        self.mesh = mesh
        self.rng = np.random.default_rng(seed)

        self._align_preprocess()
        self._construct_kernel(K)

    # -- preprocessing ------------------------------------------------------
    def _align_preprocess(self):
        if (
            self.use_hvg
            and ("highly_variable" in self.sampleA.var.columns)
            and ("highly_variable" in self.sampleB.var.columns)
        ):
            genes_lists = [
                self.sampleA.var.index[self.sampleA.var["highly_variable"].astype(bool)],
                self.sampleB.var.index[self.sampleB.var["highly_variable"].astype(bool)],
            ]
        else:
            genes_lists = [self.sampleA.var.index, self.sampleB.var.index]
        common_genes = filter_common_genes(*genes_lists, verbose=self.verbose)
        self.genes = common_genes if self.genes is None else sorted(set(common_genes) & set(self.genes))

        self.exp_layers_A = [
            get_rep(self.sampleA, rep, rep_f, self.genes if rep_f == "layer" else None)
            for rep, rep_f in zip(self.rep_layer, self.rep_field)
        ]
        self.exp_layers_B = [
            get_rep(self.sampleB, rep, rep_f, self.genes if rep_f == "layer" else None)
            for rep, rep_f in zip(self.rep_layer, self.rep_field)
        ]

        # label-transfer prior (reference methods/utils.py:264
        # check_label_transfer + morpho_class.py:365): an 'obs' rep layer is
        # a categorical annotation; its pairwise "distance" is the transfer
        # probability looked up from a [catA, catB] matrix (factorized as a
        # one-hot GEMM inside the EM). Codes must index the SAME category
        # order the matrix was built with, so re-encode them here.
        self.label_transfer = None
        for i, rep_f in enumerate(self.rep_field):
            if rep_f != "obs":
                continue
            rep = self.rep_layer[i]
            import pandas as pd

            catA = sorted(map(str, pd.unique(np.asarray(self.sampleA.obs[rep]).astype(str))))
            catB = sorted(map(str, pd.unique(np.asarray(self.sampleB.obs[rep]).astype(str))))
            td = self.label_transfer_dict
            if td is None:
                from ..utils import generate_label_transfer_dict

                td = generate_label_transfer_dict(catA, catB)
            lt = np.zeros((len(catA), len(catB)), np.float32)
            for j, ca in enumerate(catA):
                for k, cb in enumerate(catB):
                    lt[j, k] = td[ca][cb]
            self.label_transfer = lt
            posA = {c: j for j, c in enumerate(catA)}
            posB = {c: k for k, c in enumerate(catB)}
            self.exp_layers_A[i] = np.asarray(
                [posA[str(v)] for v in np.asarray(self.sampleA.obs[rep]).astype(str)], np.int32
            )
            self.exp_layers_B[i] = np.asarray(
                [posB[str(v)] for v in np.asarray(self.sampleB.obs[rep]).astype(str)], np.int32
            )
            self.dissimilarity[i] = "label"
            self.probability_type[i] = "prob"

        self.coordsA = np.asarray(self.sampleA.obsm[self.spatial_key], dtype=np.float32)
        self.coordsB = np.asarray(self.sampleB.obsm[self.spatial_key], dtype=np.float32)
        assert self.coordsA.shape[1] == self.coordsB.shape[1], "Spatial coordinate dimensions are different."
        self.NA, self.NB, self.D = self.coordsA.shape[0], self.coordsB.shape[0], self.coordsA.shape[1]

        if self.normalize_c:
            (coords, self.normalize_scales, self.normalize_means) = normalize_coords(
                [self.coordsA, self.coordsB], self.separate_mean, self.separate_scale
            )
            self.coordsA, self.coordsB = coords
        else:
            self.normalize_scales = np.ones(2)
            self.normalize_means = np.zeros((2, self.D))

        # Morton-order the moving slice's rows (pure relabeling: every
        # row-aligned output is inverse-permuted before it leaves the
        # solver). Consecutive rows become spatial neighbors, so the Pallas
        # E-step's [row-tile, col-tile] blocks are spatial neighborhoods and
        # far-apart tiles are skipped once sigma2 anneals (block-sparse
        # E-step). The fixed slice keeps its order; each SVI minibatch is
        # instead sorted by the precomputed Morton RANK of its members
        # inside the EM (same index set — identical statistics).
        from .math import morton_code

        self._orderA = np.argsort(morton_code(self.coordsA), kind="stable")
        self._invA = np.argsort(self._orderA)
        self.coordsA = self.coordsA[self._orderA]
        self.exp_layers_A = [a[self._orderA] for a in self.exp_layers_A]
        self._morton_rank_B = np.argsort(np.argsort(morton_code(self.coordsB), kind="stable")).astype(np.int32)

        # device residency: the [N, G] expression arrays are the big tunnel
        # uploads — push them once; probability-parameter init, the distance
        # factorization and the EM all reuse the same device buffers.
        # Integer-valued count layers travel as uint8/uint16 (4x/2x less
        # tunnel traffic than f32 — the upload is ~20% of per-pair wall time
        # at 20k cells on the ~40 MB/s tunnel) and widen to f32 on device.
        self._exp_A_dev = [_upload_compact(a) for a in self.exp_layers_A]
        self._exp_B_dev = [_upload_compact(b) for b in self.exp_layers_B]

    def _construct_kernel(self, inducing_variables_num: int):
        unique_coords, unique_idx = np.unique(self.coordsA, return_index=True, axis=0)
        if unique_coords.shape[0] > inducing_variables_num:
            pick = self.rng.choice(unique_coords.shape[0], inducing_variables_num, replace=False)
        else:
            pick = np.arange(unique_coords.shape[0])
        idx = unique_idx[pick]
        self.inducing_variables = self.coordsA[idx, :]
        if self.kernel_type == "euc":
            # device-resident: np.asarray here was a blocking K x K pull in
            # __init__ whose only consumer re-uploaded it into the EM
            self.GammaSparse = con_K(self.inducing_variables, self.inducing_variables, self.beta)
            self._U_precomputed = None
        elif self.kernel_type == "geodist":
            # geodesic deformation kernel (reference morpho_class.py:865 +
            # methods/utils.py:1190 con_K_graph): distances over the KNN
            # graph of the moving slice, Dijkstra from the inducing points
            # (scipy's multi-source dijkstra replaces the reference's
            # networkx per-source Python loop), K = exp(-beta d_geo^2).
            from scipy.sparse import csr_matrix
            from scipy.sparse.csgraph import dijkstra
            from scipy.spatial import cKDTree

            nA = self.coordsA.shape[0]
            if self.graph is not None:
                # precomputed neighbor graph (parity: reference
                # morpho_class.py:145/:867 `graph`): accept a scipy sparse
                # adjacency or a networkx-style graph with weighted edges
                g = self.graph
                if hasattr(g, "edges"):
                    rows, cols, vals = [], [], []
                    for u, v, dd in g.edges(data=True):
                        rows.append(u); cols.append(v)
                        vals.append(float(dd.get("weight", 1.0)))
                    graph = csr_matrix((vals, (rows, cols)), shape=(nA, nA))
                else:
                    graph = csr_matrix(g)
            else:
                k = min(self.graph_knn + 1, nA)
                tree = cKDTree(self.coordsA)
                dists, nbrs = tree.query(self.coordsA, k=k)
                rows = np.repeat(np.arange(nA), k - 1)
                cols = nbrs[:, 1:].ravel()
                vals = dists[:, 1:].ravel()
                graph = csr_matrix((vals, (rows, cols)), shape=(nA, nA))
            D, preds = dijkstra(graph, directed=False, indices=idx, return_predecessors=True)  # [K, NA]
            # first hop from each source point toward each inducing point:
            # the predecessor of i on the path from inducing k IS the next
            # node i steps to (used by the GP morphofield's geodesic kernel
            # to extend distances to new query points)
            first_node = preds.T.astype(np.int64)  # [NA, K]; -9999 = unreachable
            first_node[idx, np.arange(len(idx))] = idx  # the inducing point itself
            first_node[first_node < 0] = -1
            self._geodesic_first_node = first_node
            D = np.where(np.isfinite(D), D, 1e5).T.astype(np.float32)  # [NA, K]
            self._geodesic_distance = D
            U = np.exp(-self.beta * D**2)
            self._U_precomputed = U
            self.GammaSparse = U[idx, :]
        else:
            raise NotImplementedError(f"Kernel type '{self.kernel_type}' is not implemented (use 'euc' or 'geodist').")
        self.K = self.inducing_variables.shape[0]

    def _init_probability_parameters(self, subsample: int = 20000):
        for i, (exp_A, exp_B, d_s, p_t) in enumerate(
            zip(self.exp_layers_A, self.exp_layers_B, self.dissimilarity, self.probability_type)
        ):
            if self.probability_parameters[i] is not None:
                continue
            if p_t == "gauss":
                # reuse the resident device buffers; the distance + row-min +
                # order statistic run fused on device and only a scalar comes
                # back over the tunnel
                from .math import min_dist_order_stat

                exp_A_dev = self._exp_A_dev[i] if hasattr(self, "_exp_A_dev") else jnp.asarray(exp_A)
                exp_B_dev = self._exp_B_dev[i] if hasattr(self, "_exp_B_dev") else jnp.asarray(exp_B)
                if self.NA > subsample:
                    exp_A_dev = exp_A_dev[jnp.asarray(self.rng.choice(self.NA, subsample, replace=False))]
                if self.NB > subsample:
                    exp_B_dev = exp_B_dev[jnp.asarray(self.rng.choice(self.NB, subsample, replace=False))]
                kth = int(exp_A_dev.shape[0] * 0.05)
                stat = min_dist_order_stat(exp_A_dev, exp_B_dev, kth, metric=d_s)
                # keep the estimate ON DEVICE: float(stat) would block on a
                # tunnel round trip before the EM dispatch; every consumer
                # is a jitted program that takes it as a traced scalar
                self.probability_parameters[i] = jnp.maximum(stat / 5, 0.01)
            else:
                self.probability_parameters[i] = 0.0  # unused by 'prob'/'cos'

    def _coarse_rigid_alignment(self, n_sampling: int = 20000):
        top_K = self.nn_init_top_K
        sa = self.rng.choice(self.NA, n_sampling, replace=False) if self.NA > n_sampling else np.arange(self.NA)
        sb = self.rng.choice(self.NB, n_sampling, replace=False) if self.NB > n_sampling else np.arange(self.NB)
        coordsA, coordsB = self.coordsA[sa], self.coordsB[sb]
        # self.coordsA is Morton-sorted; sampleA is not — route the sample
        # indices through _orderA so expression rows pair with their coords
        idxA = self._orderA[sa]
        X_A = get_rep(self.sampleA, self.init_layer, self.init_field, self.genes if self.init_field == "layer" else None)[idxA]
        X_B = get_rep(self.sampleB[sb], self.init_layer, self.init_field, self.genes if self.init_field == "layer" else None)

        N, M = coordsA.shape[0], coordsB.shape[0]
        coordsA, X_A = voxel_data(coordsA, X_A, voxel_num=max(min(int(N / 20), 1000), 100))
        coordsB, X_B = voxel_data(coordsB, X_B, voxel_num=max(min(int(M / 20), 1000), 100))

        # voxel occupancy is data-dependent: bucket the row counts (pad with
        # row-0 copies) so fresh slice pairs reuse ONE compiled program.
        # The whole matching chain — pairwise distance, mutual top-K, NN
        # pair construction, the 100-iteration inlier EM (x2 for the flip
        # hypothesis) and the posterior threshold — runs as a single fused
        # device program (`_coarse_match_fit`); only R/t/scalars cross the
        # tunnel, and the inlier arrays stay device-resident for the EM.
        # (The previous host-orchestrated version cost ~300 ms/pair in
        # device round-trips against ~20 ms of compute.)
        from .math import pad_rows_bucket

        n1, n2 = X_A.shape[0], X_B.shape[0]
        X_A_p = pad_rows_bucket(X_A.astype(np.float32), 256)
        X_B_p = pad_rows_bucket(X_B.astype(np.float32), 256)
        cA_p = pad_rows_bucket(coordsA.astype(np.float32), 256)
        cB_p = pad_rows_bucket(coordsB.astype(np.float32), 256)
        top_K = min(top_K, n1 - 1, n2 - 1)
        train_x, train_y, inlier_P, R, t, flipped = _coarse_match_fit(
            jnp.asarray(X_A_p), jnp.asarray(X_B_p), jnp.asarray(cA_p), jnp.asarray(cB_p),
            jnp.asarray(n1), jnp.asarray(n2),
            top_k=top_K,
            metric="kl" if self.init_field == "layer" else "euc",
            allow_flip=bool(self.allow_flip),
        )
        # NO host sync here: R/t stay device-resident and every consumer —
        # the coarse transform below, init_guess_sigma2_dev, con_K, the EM —
        # is a device program that chains on them asynchronously. The old
        # blocking device_get cost a full tunnel round trip (~60-80 ms)
        # between the coarse program and the EM dispatch. The flip flag is
        # pulled only when allow_flip actually asked for the hypothesis.
        if self.allow_flip and bool(jax.device_get(flipped)):
            lm.main_info("Flipping detected in coarse rigid alignment.")
        # device-resident: consumed as jnp arrays by the EM; sub-threshold
        # rows carry P = 0, which is exactly neutral in every weighted term
        # (same argument as the old pad-to-bucket scheme)
        self.inlier_A = train_x
        self.inlier_B = train_y
        self.inlier_P = inlier_P
        self.init_R, self.init_t = R, t  # device; np-ified in _wrap_output
        if self.init_transform:
            self.inlier_A = self.inlier_A @ R.T + t
            self.coordsA = jnp.asarray(self.coordsA) @ R.T + t
            # inducing points / U follow the transformed coordinates
            self.inducing_variables = jnp.asarray(self.inducing_variables) @ R.T + t

    # -- main ---------------------------------------------------------------
    def run(self) -> np.ndarray:
        self._phase_times = None
        if self.nn_init:
            self._coarse_rigid_alignment()
        else:
            self.init_R, self.init_t = np.eye(self.D), np.zeros(self.D)
            self.inlier_A = np.zeros((1, self.D), np.float32)
            self.inlier_B = np.zeros((1, self.D), np.float32)
            self.inlier_P = np.ones((1, 1), np.float32)

        _phase_mark(self, 'initp_done')
        self._init_probability_parameters()
        from .math import init_guess_sigma2_dev

        sigma2_init = self.sigma2_init_scale * init_guess_sigma2_dev(self.coordsA, self.coordsB)
        # jnp.maximum instead of python max(): coordsA may be a device
        # array chained on the (async) coarse program — float() would block
        samples_s = jnp.maximum(
            jnp.prod(jnp.asarray(self.coordsA).max(0) - jnp.asarray(self.coordsA).min(0)),
            jnp.prod(jnp.asarray(self.coordsB).max(0) - jnp.asarray(self.coordsB).min(0)),
        )

        # device-resident: con_K returns a device array; pulling it to host
        # only to re-upload into the EM costs a [NA, K] tunnel round-trip
        _phase_mark(self, 'sigma2_samples_done')
        U = (
            self._U_precomputed
            if getattr(self, "_U_precomputed", None) is not None
            else con_K(self.coordsA, self.inducing_variables, self.beta)
        )

        # guidance pairs: normalize into the EM frame (same stats as the
        # coords), apply the coarse-init transform that coordsA carries, and
        # precompute their kernel against the inducing points
        # (parity: reference morpho_class.py:561 `_guidance_pair_preprocess`
        # + :860 U_I; the reference's compounding of R_AI at :1409 is fixed
        # here by always transforming the original X_AI)
        if self.guidance_effect != "none" and self.guidance_pair is not None:
            if not isinstance(self.guidance_pair, (list, tuple)) or len(self.guidance_pair) != 2:
                raise AlignmentError("guidance_pair must be [X_BI, X_AI] arrays.")
            X_BI = np.asarray(self.guidance_pair[0], np.float32)
            X_AI = np.asarray(self.guidance_pair[1], np.float32)
            if self.normalize_c:
                X_AI = (X_AI - self.normalize_means[0]) / self.normalize_scales[0]
                X_BI = (X_BI - self.normalize_means[1]) / self.normalize_scales[1]
            X_AI = np.asarray(X_AI @ jnp.asarray(self.init_R).T + jnp.asarray(self.init_t))
            U_I = np.asarray(con_K(X_AI, self.inducing_variables, self.beta))
            guidance_effect = self.guidance_effect
        else:
            X_AI = np.zeros((1, self.D), np.float32)
            X_BI = np.zeros((1, self.D), np.float32)
            U_I = np.zeros((1, self.K), np.float32)
            guidance_effect = "none"

        # expression distances factorized once as a_i + b_j + A @ B.T per
        # layer; the EM evaluates minibatch distances on the fly (no
        # [L, NA, NB] tensor)
        _phase_mark(self, 'U_guidance_done')
        from .math import factorize_distance

        exp_A_src = getattr(self, "_exp_A_dev", None) or [jnp.asarray(a) for a in self.exp_layers_A]
        exp_B_src = getattr(self, "_exp_B_dev", None) or [jnp.asarray(b) for b in self.exp_layers_B]
        factors = [
            factorize_distance(a, b, m, self.label_transfer)
            for a, b, m in zip(exp_A_src, exp_B_src, self.dissimilarity)
        ]
        exp_a_rows = tuple(f[0] for f in factors)
        exp_b_cols = tuple(f[1] for f in factors)
        exp_A_feats = tuple(f[2] for f in factors)
        exp_B_feats = tuple(f[3] for f in factors)

        _phase_mark(self, 'factorize_done')
        if self.batch_size is None:
            batch_size = min(max(int(self.NB / 10), 1000), self.NB)
        else:
            batch_size = min(self.batch_size, self.NB)
        if not self.SVI_mode:
            batch_size = self.NB
        perm = self.rng.permutation(self.NB).astype(np.int32)

        # jnp.stack keeps device-resident estimates async (np.asarray on a
        # device scalar is a blocking pull)
        probability_parameters = jnp.stack(
            [jnp.asarray(p if p is not None else 0.0, jnp.float32) for p in self.probability_parameters]
        )

        # multi-chip: shard the NA axis of the moving slice over the mesh's
        # 'data' axis — the axis-0 reductions inside the flash E-step
        # compile to psums over ICI (tensor-parallel E-step, SURVEY §2.12);
        # everything else replicates
        coordsA_dev = jnp.asarray(self.coordsA)
        exp_a_rows_dev, exp_A_feats_dev = exp_a_rows, exp_A_feats
        if self.mesh is not None and np.prod(list(self.mesh.shape.values())) > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = list(self.mesh.axis_names)[0]
            rows = NamedSharding(self.mesh, P(axis, None))
            vec = NamedSharding(self.mesh, P(axis))
            coordsA_dev = jax.device_put(coordsA_dev, rows)
            exp_a_rows_dev = tuple(jax.device_put(jnp.asarray(a), vec) for a in exp_a_rows)
            exp_A_feats_dev = tuple(jax.device_put(jnp.asarray(A), rows) for A in exp_A_feats)

        _phase_mark(self, 'preem_done')
        s, optimal_R, optimal_t, optimal_RnA = _morpho_em(
            coordsA_dev,
            jnp.asarray(self.coordsB),
            exp_a_rows_dev,
            exp_b_cols,
            exp_A_feats_dev,
            exp_B_feats,
            jnp.asarray(U, jnp.float32),
            jnp.asarray(self.GammaSparse, jnp.float32),
            jnp.asarray(perm),
            jnp.asarray(self._morton_rank_B),
            jnp.asarray(self.inlier_A, jnp.float32),
            jnp.asarray(self.inlier_B, jnp.float32),
            jnp.asarray(self.inlier_P, jnp.float32),
            jnp.asarray(X_AI, jnp.float32),
            jnp.asarray(X_BI, jnp.float32),
            jnp.asarray(U_I, jnp.float32),
            jnp.asarray(probability_parameters),
            jnp.asarray(sigma2_init, jnp.float32),
            jnp.asarray(samples_s, jnp.float32),
            batch_size=batch_size,
            max_iter=self.max_iter,
            # full per-iteration record, like the reference's _save_iter
            # (morpho_class.py:1043); [max_iter, NA, D] — opt-in via
            # iter_key_added because of the memory footprint
            n_traces=self.max_iter if self.iter_key_added else 0,
            nonrigid_start_iter=self.nonrigid_start_iter,
            probability_type=tuple(self.probability_type),
            update_R=self.update_R,
            nn_init=self.nn_init,
            guidance_effect=guidance_effect,
            guidance_weight=float(self.guidance_weight),
            # ~4 [NA, B/chunks] f32 temporaries live per E-step column
            # chunk: size the chunks so they fit a fraction of the device's
            # actual HBM (one chunk selects the dense single-pass path)
            estep_chunks=_estep_chunks(self.NA, batch_size),
            gamma_a=self.gamma_a,
            gamma_b=self.gamma_b,
            kappa=self.kappa,
            lambdaVF=self.lambdaVF,
            partial_robust_level=self.partial_robust_level,
            nn_init_weight=self.nn_init_weight,
            svi_mode=bool(self.SVI_mode),
            sparse_top_k=self.sparse_top_k if self.sparse_calculation_mode else 0,
            # Pallas fused E-step (ops/estep_pallas.py): engages only in
            # the chunked-XLA regime within its VMEM residency cap (see
            # estep_reduced's gate) — 4.7x over chunked XLA at 40k x 8k;
            # the dense XLA path keeps the small-shape regime where it is
            # ~10% faster.
            use_pallas_estep=(
                bool(getattr(self, "use_pallas_estep", True))
                and (self.mesh is None or int(np.prod(list(self.mesh.shape.values()))) <= 1)
                and jax.devices()[0].platform == "tpu"
                and self.D == 2
                and len(exp_a_rows) == 1
                and tuple(self.probability_type) == ("gauss",)
                and not self.sparse_calculation_mode
            ),
        )
        # ONE batched host pull: per-array np.asarray costs a full tunnel
        # round trip each (~20 pulls = seconds); device_get on the pytree
        # pipelines them. The two large arrays (P [NA, B], traces) are
        # excluded unless actually needed.
        # Only the host-facing leaves are pulled; the rest of the EM state
        # (alpha, SigmaDiag, batch_idx, M-step accumulators) stays on device
        # — the lazy P rebuild consumes it there, and each [NA]-sized pull
        # costs real tunnel time.
        _phase_mark(self, 'em_dispatched')
        host_keys = ("sigma2", "gamma", "R", "t", "Coff", "XAHat", "sigma2_variance")
        if self.iter_key_added:
            host_keys = host_keys + ("sigma2_traces",)
        small = {k: s[k] for k in host_keys}
        # RnA/VnA are NOT in the eager pull: nothing downstream reads them by
        # default, and each is a [NA, D] tunnel transfer — they materialize
        # lazily via the properties below. The coarse-init state
        # (init_R/init_t/inducing_variables) rides the same single pull
        # instead of a second round trip inside _wrap_output.
        pulled = jax.device_get((small, optimal_R, optimal_t, optimal_RnA,
                                 s["traces"] if self.iter_key_added else jnp.zeros(()),
                                 (self.init_R, self.init_t, self.inducing_variables)))
        small_np, optimal_R, optimal_t, optimal_RnA, traces_np, coarse_np = pulled
        self.init_R, self.init_t, self.inducing_variables = (np.asarray(x) for x in coarse_np)
        small_np = {**{k: v for k, v in s.items() if k not in ("P", "traces")}, **small_np}
        self.iter_sigma2 = np.asarray(small_np["sigma2_traces"]) if self.iter_key_added else None
        self._state = small_np  # Morton-sorted row space (internal: P rebuild)
        # inverse the Morton relabeling on every row-aligned output
        inv = self._invA
        optimal_RnA = np.asarray(optimal_RnA)[inv]
        if self.iter_key_added:
            traces_np = np.asarray(traces_np)[:, inv]
        self.sigma2 = float(small_np["sigma2"]) if self.sigma2_end is None else self.sigma2_end
        self.gamma = float(small_np["gamma"])
        self.R = small_np["R"]
        self.t = small_np["t"]
        self.Coff = small_np["Coff"]
        self.XAHat = small_np["XAHat"][inv]
        self._RnA_host = None
        self._VnA_host = None
        self.optimal_R = np.asarray(optimal_R)
        self.optimal_t = np.asarray(optimal_t)
        self.optimal_RnA = np.asarray(optimal_RnA)
        self.iter_traces = np.asarray(traces_np) if self.iter_key_added else None
        self.batch_idx = small_np["batch_idx"]
        self.sigma2_variance = float(small_np["sigma2_variance"])
        # P is no longer produced inside the EM (the flash-style E-step only
        # computes reductions); stash what's needed to reconstruct the
        # final-batch assignment lazily on first access
        self._P_cache = None
        self._P_explicit = None
        # pre-denormalization frame, in the SORTED row space (the stored
        # expression factors are sorted too; the P accessors unsort rows)
        self._norm_XAHat = np.asarray(small_np["XAHat"]).copy()
        self._norm_coordsB = np.asarray(self.coordsB).copy()
        self._exp_factors = list(zip(exp_a_rows, exp_b_cols, exp_A_feats, exp_B_feats))
        # device scalar: float() here would block on the upload chain before
        # the batched pull below even dispatches
        self._samples_s = samples_s

        _phase_mark(self, 'pull_done')
        if self.return_mapping:
            # full NA x NB assignment (sorted row space; rows unsorted below)
            model_mul = (self._state["alpha"] * np.exp(-self._state["SigmaDiag"] / self.sigma2))[:, None]
            spatial_dist = euc_dist(jnp.asarray(self._norm_XAHat), jnp.asarray(self.coordsB), squared=True)
            exp_dist_full_list = [
                a[:, None] + b[None, :] + A @ B.T
                for a, b, A, B in zip(exp_a_rows, exp_b_cols, exp_A_feats, exp_B_feats)
            ]
            P_full, _, _, _ = get_P_core(
                Dim=float(self.D),
                spatial_dist=spatial_dist,
                exp_dist=exp_dist_full_list,
                sigma2=jnp.asarray(self.sigma2),
                model_mul=jnp.asarray(model_mul),
                gamma=jnp.asarray(self.gamma),
                samples_s=jnp.asarray(samples_s),
                sigma2_variance=jnp.asarray(self.sigma2_variance),
                probability_type=self.probability_type,
                probability_parameters=[jnp.asarray(p) for p in probability_parameters],
            )
            self.P = self._maybe_sparsify_P(np.asarray(P_full)[self._invA])

        self._wrap_output()
        return self.P

    @property
    def RnA(self):
        """Non-rigid-transformed source coordinates [NA, D], pulled from
        device on first access (lazy: the EM keeps them device-resident so
        the post-solve pull ships only what a caller actually reads)."""
        if getattr(self, "_RnA_host", None) is None:
            arr = np.asarray(self._state["RnA"])[self._invA]
            if self.normalize_c and getattr(self, "_output_denormalized", False):
                arr = arr * self.normalize_scales[1] + self.normalize_means[1]
            self._RnA_host = arr
        return self._RnA_host

    @RnA.setter
    def RnA(self, value):
        self._RnA_host = value

    @property
    def VnA(self):
        """Per-point non-rigid displacement field [NA, D] (lazy pull, same
        contract as :attr:`RnA`; the reference stores VnA on the solver,
        morpho_class.py:1471)."""
        if getattr(self, "_VnA_host", None) is None:
            self._VnA_host = np.asarray(self._state["VnA"])[self._invA]
        return self._VnA_host

    @VnA.setter
    def VnA(self, value):
        self._VnA_host = value

    @property
    def P(self):
        """Final-batch soft assignment [NA, B], reconstructed on demand from
        the converged parameters (the fused EM never materializes it). In
        sparse calculation mode the result is a scipy CSR matrix holding
        only the top-k entries of each column (reference
        morpho_class.py:1493 returns a scipy sparse P)."""
        if getattr(self, "_P_explicit", None) is not None:
            return self._P_explicit
        if getattr(self, "_P_cache", None) is None:
            P_dev = self._compute_final_P()
            if self.sparse_calculation_mode:
                self._P_cache = self._maybe_sparsify_P(np.asarray(P_dev))
            else:
                # stays a DEVICE array: the [NA, B] pull costs ~100s of MB of
                # tunnel transfer; consumers that want host data np.asarray it
                self._P_cache = P_dev
        return self._P_cache

    def _maybe_sparsify_P(self, P: np.ndarray):
        """Column top-k sparsification of an assignment matrix in sparse
        calculation mode (reference methods/utils.py:1369 `_dense_to_sparse`
        with axis=0/topk; scipy output per morpho_class.py:1493)."""
        if not self.sparse_calculation_mode or self.sparse_top_k >= P.shape[0]:
            return P
        from scipy.sparse import csr_matrix

        k = int(self.sparse_top_k)
        rows = np.argpartition(-P, k - 1, axis=0)[:k]  # [k, B]
        cols = np.repeat(np.arange(P.shape[1])[None, :], k, axis=0)
        vals = P[rows, cols]
        return csr_matrix((vals.ravel(), (rows.ravel(), cols.ravel())), shape=P.shape)

    @P.setter
    def P(self, value):
        self._P_explicit = value

    def _compute_final_P(self):
        """Rebuild the final-batch P directly in the sample's ORIGINAL row
        order: the Morton inverse permutation is applied to the [NA]-sized
        row inputs BEFORE the rebuild (the column normalizers sum over all
        rows, so they are permutation-invariant) — permuting the [NA, B]
        output instead would double-buffer a 15 GB array at 200k x 20k."""
        inv = jnp.asarray(self._invA)
        # keep alpha/SigmaDiag/batch_idx device-resident: np.exp / np.asarray
        # on a jax array is a BLOCKING [NA] pull each (serialized tunnel RTTs)
        batch_idx = jnp.asarray(self.batch_idx)
        alpha = jnp.asarray(self._state["alpha"], jnp.float32)
        sigma_diag = jnp.asarray(self._state["SigmaDiag"], jnp.float32)
        model_mul = (alpha * jnp.exp(-sigma_diag / max(self.sigma2, 1e-12)))[:, None]
        model_mul = model_mul[inv]
        a_rows = tuple(jnp.asarray(f[0])[inv] for f in self._exp_factors)
        b_cols = tuple(jnp.asarray(f[1]) for f in self._exp_factors)
        A_feats = tuple(jnp.asarray(f[2])[inv] for f in self._exp_factors)
        B_feats = tuple(jnp.asarray(f[3]) for f in self._exp_factors)
        return _rebuild_P(
            jnp.asarray(self._norm_XAHat, jnp.float32)[inv],
            jnp.asarray(self._norm_coordsB, jnp.float32),
            batch_idx,
            jnp.asarray(model_mul, jnp.float32),
            jnp.asarray(self.sigma2, jnp.float32),
            jnp.asarray(self.gamma, jnp.float32),
            jnp.asarray(self._samples_s, jnp.float32),
            jnp.asarray(self.sigma2_variance, jnp.float32),
            a_rows, b_cols, A_feats, B_feats,
            tuple(jnp.asarray(p if p is not None else 0.0) for p in self.probability_parameters),
            Dim=float(self.D),
            probability_type=tuple(self.probability_type),
        )

    def _wrap_output(self):
        # denormalize
        if self.normalize_c:
            scale_B, mean_B = self.normalize_scales[1], self.normalize_means[1]
            self.XAHat = self.XAHat * scale_B + mean_B
            # RnA denormalizes inside its lazy property; flag that outputs
            # are now in the denormalized frame (if RnA already materialized,
            # denormalize it in place)
            if getattr(self, "_RnA_host", None) is not None:
                self._RnA_host = self._RnA_host * scale_B + mean_B
            self._output_denormalized = True
            self.optimal_RnA = self.optimal_RnA * scale_B + mean_B
            if getattr(self, "iter_traces", None) is not None:
                self.iter_traces = self.iter_traces * scale_B + mean_B
        if self.iter_key_added is not None and getattr(self, "iter_traces", None) is not None:
            # reference shape (morpho_class.py:1043 `_save_iter` filling
            # `iter_added`): {key_added: {it: XAHat_it}, "sigma2": {it: s2}}
            self.iter_added = {
                self.key_added: {i: np.asarray(t) for i, t in enumerate(self.iter_traces)},
                "sigma2": {i: np.asarray(v) for i, v in enumerate(self.iter_sigma2)},
            }
            self.sampleA.uns[self.iter_key_added] = self.iter_added

        norm_dict = {
            "mean_transformed": self.normalize_means[0],
            "mean_fixed": self.normalize_means[1],
            "scale": self.normalize_scales[0],
            "scale_transformed": self.normalize_scales[0],
            "scale_fixed": self.normalize_scales[1],
        }
        # coarse-init state (init_R/init_t/inducing_variables) was np-ified
        # inside run()'s single batched pull; when run() was bypassed (e.g.
        # transform-only paths) fall back to a batched pull here
        if not isinstance(self.init_R, np.ndarray):
            self.init_R, self.init_t, self.inducing_variables = (
                np.asarray(x)
                for x in jax.device_get((self.init_R, self.init_t, self.inducing_variables))
            )
        self.vecfld = {
            "R": self.R,
            "t": self.t,
            "optimal_R": self.optimal_R,
            "optimal_t": self.optimal_t,
            "init_R": self.init_R,
            "init_t": self.init_t,
            "beta": self.beta,
            "Coff": self.Coff,
            "inducing_variables": self.inducing_variables,
            "normalize_scales": self.normalize_scales if self.normalize_c else None,
            "normalize_means": self.normalize_means if self.normalize_c else None,
            "normalize_c": self.normalize_c,
            "dissimilarity": self.dissimilarity,
            "sigma2": self.sigma2,
            "gamma": self.gamma,
            "NA": self.NA,
            "sigma2_variance": self.sigma2_variance,
            "method": "Spateo",
            "norm_dict": norm_dict,
            "kernel_type": self.kernel_type,
        }
        if self.kernel_type == "geodist":
            # everything the GP morphofield needs to evaluate the geodesic
            # kernel at NEW query points (tdr/.../gaussian_process.py
            # `_con_K_geodist`): the normalized source coords, the geodesic
            # distance of every source point to each inducing point, and the
            # first hop on the path toward each inducing point (-1 when in a
            # different graph component)
            self.vecfld["kernel_dict"] = {
                "dist": "geodist",
                "X": np.asarray(self.coordsA),
                "first_node_idx": self._geodesic_first_node,
                "kernel_graph_distance": self._geodesic_distance,
            }


def _phase_mark(self, name):
    import time as _t
    d = getattr(self, "_phase_times", None)
    if d is None:
        d = self._phase_times = {}
        self._phase_t0 = _t.perf_counter()
    d[name] = _t.perf_counter() - self._phase_t0


