"""Tools layer (`st.tl`): clustering, DEGs, spatial statistics, CCI, MuSIC.

Capability parity with reference spateo/tools/__init__.py.
"""

from .architype import (
    archetypes,
    archetypes_genes,
    find_spatial_archetypes,
    find_spatially_related_genes,
    get_genes_from_spatial_archetype,
)
from .cluster_lasso import Lasso
from .live_wire import LiveWireSegmentation, compute_shortest_path, live_wire
from .roi import ROIAnnotator, img_segmentation
from . import cci_fdr
from .CCI_effects_modeling import MuSIC_downstream, MuSIC_upstream, SWR, distributions, regression_utils
from .cluster import cluster_spagcn, find_clusters, leiden, spagcn_utils
from .CCI_effects_modeling import (
    MuSIC,
    MuSIC_Interpreter,
    MuSIC_Molecule_Selector,
    define_spateo_argparse,
)
from .cci_two_cluster import prepare_cci_df, find_cci_two_group, prepare_cci_cellpair_adata
from .cell_communication import niches, predict_ligand_activities, predict_target_genes
from .cluster import (
    CAST,
    calculate_leiden_partition,
    calculate_louvain_partition,
    compute_pca_components,
    ecp_silhouette,
    integrate,
    kmeans_clustering,
    mclust_py,
    pca_spateo,
    pearson_residuals,
    pySTAGATE,
    scc,
    spagcn_pyg,
    spagcn_vanilla,
    spatial_adj,
)
from .cluster.find_clusters import smooth as smooth_labels
from .cluster_degs import (
    find_all_cluster_degs,
    find_cluster_degs,
    find_spatial_cluster_degs,
    top_n_degs,
)
from .coarse_align import AffineTrans, align_slices_pca, pca_align, procrustes
from .dimensionality_reduction import pca, perform_dimensionality_reduction
from .find_neighbors import construct_nn_graph, neighbors
from .gene_expression_variance import (
    compute_gene_groups_p_val,
    compute_variance_decomposition,
    get_highvar_genes,
    get_highvar_genes_sparse,
    genewise_variance_decomposition,
)
from .glm import glm_degs
from .labels import create_label_class, Label, expand_labels, match_label_series, match_labels, row_normalize
from .lisa import GM_lag_model, lisa_geo_df, local_moran_i
from .spatial_correlation import spatial_bv_local_moran, spatial_bv_moran_obs_genes
from .spatial_degs import cellbin_morani, moran_i
from .spatial_smooth import smooth
