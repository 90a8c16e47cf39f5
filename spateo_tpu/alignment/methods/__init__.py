"""Alignment methods (parity surface: reference spateo/alignment/methods/__init__.py)."""

from .math import (
    calc_distance,
    calc_probability,
    con_K,
    euc_dist,
    get_P_core,
    inlier_from_NN,
    kl_dist,
    normalize_coords,
    voxel_data,
)
from .mesh_correction import Mesh_correction
from .morpho import Morpho_pairwise, filter_common_genes, get_rep
from .paste import center_NMF, generalized_procrustes_analysis, paste_center_align, paste_pairwise_align
from .sampling import sample


def empty_cache(device: str = "tpu"):
    """No-op device-cache clear kept for API parity (the reference calls
    torch.cuda.empty_cache, reference morpho_alignment.py:109; XLA manages
    HBM directly)."""


def calc_exp_dissimilarity(X_A, X_B, dissimilarity: str = "kl"):
    """Expression dissimilarity matrix (parity: reference
    methods/deprecated_utils.py `calc_exp_dissimilarity`, used by paste)."""
    import numpy as np

    [D] = calc_distance(np.asarray(X_A), np.asarray(X_B), metric=dissimilarity)
    return np.asarray(D)
