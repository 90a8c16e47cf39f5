"""Apply saved alignment transforms to new points
(capability parity: reference spateo/alignment/transform.py:30-275)."""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..core.anndata import AnnData
from .methods.math import calc_distance, con_K, euc_dist, get_P_core
from .methods.morpho import filter_common_genes, get_rep


def paste_transform(
    adata: AnnData,
    adata_ref: AnnData,
    spatial_key: str = "spatial",
    key_added: str = "align_spatial",
    mapping_key: str = "models_align",
) -> AnnData:
    """Align new coords via stored PASTE mapping (parity: transform.py:30)."""
    assert mapping_key in adata_ref.uns, f"`{mapping_key}` not in `adata_ref.uns`."
    tX = adata_ref.uns[mapping_key]["tX"]
    tY = adata_ref.uns[mapping_key]["tY"]
    R = adata_ref.uns[mapping_key]["R"]
    adata_coords = np.asarray(adata.obsm[spatial_key], dtype=float).copy()
    adata.obsm[key_added] = (adata_coords - tY) @ R.T + tX
    return adata


@partial(jax.jit, static_argnames=())
def _ba_transform_kernel(XA, ctrl_pts, Coff, R, t, optimal_R, optimal_t, init_R, init_t, beta, deformation_scale):
    XA = XA @ init_R.T + init_t
    quary_kernel = con_K(XA, ctrl_pts, beta)
    quary_velocities = (quary_kernel @ Coff) * deformation_scale
    quary_similarity = XA @ R.T + t
    quary_optimal_similarity = XA @ optimal_R.T + optimal_t
    XAHat = quary_velocities + quary_similarity
    return XAHat, quary_velocities, quary_optimal_similarity


def BA_transform(
    vecfld: dict,
    quary_points: np.ndarray,
    deformation_scale: float = 1,
    dtype: str = "float32",
    device: str = "tpu",
):
    """Apply a saved Morpho vector field (rigid + Nyström non-rigid) to new
    points (parity: reference transform.py:61).

    Note on conventions: this build stores `inducing_variables` AFTER the
    init rigid transform (reference stores them before); because the SE
    kernel depends only on pairwise distances, applying `init_R/init_t` to
    the query first (as below) yields identical velocities.
    """
    normalize_scale = np.asarray(vecfld["norm_dict"]["scale_transformed"])
    normalize_mean_ref = np.asarray(vecfld["norm_dict"]["mean_fixed"])
    normalize_mean_quary = np.asarray(vecfld["norm_dict"]["mean_transformed"])
    XA = np.asarray(quary_points, dtype=np.float32)
    if vecfld["normalize_c"]:
        XA = (XA - normalize_mean_quary) / normalize_scale

    XAHat, quary_velocities, quary_optimal_similarity = _ba_transform_kernel(
        jnp.asarray(XA),
        jnp.asarray(vecfld["inducing_variables"], jnp.float32),
        jnp.asarray(vecfld["Coff"], jnp.float32),
        jnp.asarray(vecfld["R"], jnp.float32),
        jnp.asarray(vecfld["t"], jnp.float32),
        jnp.asarray(vecfld["optimal_R"], jnp.float32),
        jnp.asarray(vecfld["optimal_t"], jnp.float32),
        jnp.asarray(vecfld["init_R"], jnp.float32),
        jnp.asarray(vecfld["init_t"], jnp.float32),
        jnp.asarray(vecfld["beta"], jnp.float32),
        jnp.asarray(deformation_scale, jnp.float32),
    )
    XAHat = np.asarray(XAHat)
    quary_velocities = np.asarray(quary_velocities)
    quary_optimal_similarity = np.asarray(quary_optimal_similarity)
    if vecfld["normalize_c"]:
        XAHat = XAHat * normalize_scale + normalize_mean_ref
        quary_velocities = quary_velocities * normalize_scale
        quary_optimal_similarity = quary_optimal_similarity * normalize_scale + normalize_mean_ref
    return XAHat, quary_velocities, quary_optimal_similarity


def get_P_chunk(
    XnAHat: np.ndarray,
    XnB: np.ndarray,
    X_A: np.ndarray,
    X_B: np.ndarray,
    sigma2: float,
    beta2: Optional[float] = None,
    alpha: Optional[np.ndarray] = None,
    gamma: float = 0.5,
    Sigma: Optional[np.ndarray] = None,
    samples_s: Optional[float] = None,
    outlier_variance: Optional[float] = None,
    chunk_size: int = 5000,
    dissimilarity: str = "kl",
    sigma2_variance: Optional[float] = None,
    probability_type: str = "gauss",
    probability_parameter: Optional[float] = None,
) -> np.ndarray:
    """Full NA x NB assignment computed in column chunks (parity:
    reference transform.py:206-275 — same positional parameter order incl.
    ``beta2``, the expression-kernel bandwidth exp(-d_gene/(2 beta2)), and
    ``outlier_variance``, which sharpens the spatial inlier weighting to
    exp(-d/(2 sigma2/outlier_variance))). Each chunk is one fused device
    call; chunk_size defaults larger than the reference's 1000 because a
    TPU prefers fewer, bigger dispatches (results are chunk-invariant)."""
    if beta2 is not None:
        probability_parameter = float(beta2)
    if outlier_variance is not None:
        sigma2_variance = float(outlier_variance)
    if sigma2_variance is None:
        sigma2_variance = 1.0
    NA = XnAHat.shape[0]
    NB = XnB.shape[0]
    D = XnAHat.shape[1]
    alpha = np.ones(NA, np.float32) if alpha is None else np.asarray(alpha, np.float32)
    Sigma = np.zeros(NA, np.float32) if Sigma is None else np.asarray(Sigma, np.float32)
    if samples_s is None:
        samples_s = max(
            float(np.prod(XnAHat.max(0) - XnAHat.min(0))),
            float(np.prod(XnB.max(0) - XnB.min(0))),
        )
    model_mul = jnp.asarray((alpha * np.exp(-Sigma / sigma2))[:, None])
    XnAHat_d = jnp.asarray(XnAHat, jnp.float32)
    X_A_d = jnp.asarray(X_A, jnp.float32)
    if probability_parameter is None:
        probability_parameter = float(sigma2)

    chunks = []
    for start in range(0, NB, chunk_size):
        XnB_c = jnp.asarray(XnB[start : start + chunk_size], jnp.float32)
        X_B_c = jnp.asarray(X_B[start : start + chunk_size], jnp.float32)
        spatial_dist = euc_dist(XnAHat_d, XnB_c, squared=True)
        [exp_dist] = calc_distance(X_A_d, X_B_c, metric=dissimilarity)
        P, _, _, _ = get_P_core(
            Dim=float(D),
            spatial_dist=spatial_dist,
            exp_dist=[exp_dist],
            sigma2=jnp.asarray(sigma2),
            model_mul=model_mul,
            gamma=jnp.asarray(gamma),
            samples_s=jnp.asarray(samples_s),
            sigma2_variance=jnp.asarray(sigma2_variance),
            probability_type=[probability_type],
            probability_parameters=[jnp.asarray(probability_parameter)],
        )
        chunks.append(np.asarray(P))
    return np.concatenate(chunks, axis=1)


def BA_transform_and_assignment(
    samples: List[AnnData],
    vecfld: dict,
    layer: str = "X",
    genes=None,
    spatial_key: str = "spatial",
    small_variance: bool = False,
    dtype: str = "float32",
    device: str = "tpu",
    verbose: bool = False,
):
    """Transform new points AND compute their assignment to the reference
    (parity: reference transform.py:119)."""
    XA_raw = np.asarray(samples[0].obsm[spatial_key], dtype=np.float32)
    XB_raw = np.asarray(samples[1].obsm[spatial_key], dtype=np.float32)
    norm = vecfld["norm_dict"]
    if vecfld["normalize_c"]:
        XB = (XB_raw - np.asarray(norm["mean_fixed"])) / np.asarray(norm["scale_fixed"])
    else:
        XB = XB_raw

    XAHat, quary_velocities, quary_optimal_similarity = BA_transform(vecfld, XA_raw, dtype=dtype, device=device)
    # re-normalize transformed coords to the solver's frame for P computation
    if vecfld["normalize_c"]:
        XAHat_n = (XAHat - np.asarray(norm["mean_fixed"])) / np.asarray(norm["scale_fixed"])
    else:
        XAHat_n = XAHat

    new_samples = [s.copy() for s in samples]
    all_genes = [s.var.index for s in new_samples]
    common_genes = filter_common_genes(*all_genes, verbose=verbose)
    if genes is not None:
        common_genes = sorted(set(common_genes) & set(genes))
    X_A = get_rep(new_samples[0], layer, "layer", common_genes)
    X_B = get_rep(new_samples[1], layer, "layer", common_genes)

    sigma2 = 0.01 if small_variance else float(np.asarray(vecfld["sigma2"]))
    P = get_P_chunk(
        XnAHat=XAHat_n,
        XnB=XB,
        X_A=X_A,
        X_B=X_B,
        sigma2=sigma2,
        gamma=float(np.asarray(vecfld["gamma"])),
        sigma2_variance=float(np.asarray(vecfld.get("sigma2_variance", 1.0))),
        dissimilarity=vecfld["dissimilarity"][0] if isinstance(vecfld["dissimilarity"], list) else vecfld["dissimilarity"],
    )
    return XAHat, quary_velocities, quary_optimal_similarity, P.T
