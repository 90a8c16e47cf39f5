"""Clustering tools (parity: reference spateo/tools/cluster/__init__.py)."""

from .find_clusters import CAST, mclust_py, scc, smooth, spagcn_pyg
from .leiden import calculate_leiden_partition, calculate_louvain_partition
from .utils import (
    compute_pca_components,
    ecp_silhouette,
    integrate,
    pca_spateo,
    pearson_residuals,
    spatial_adj,
)
