"""Alignment layer ("Morpho"/PASTE, `st.align`).

Capability parity with reference spateo/alignment/__init__.py: Morpho
pairwise + serial drivers, PASTE FGW alignment, transform application,
deformation grids, downsampling and rigid/TPS utilities.
"""

from .deformation import grid_deformation
from .methods import (
    Morpho_pairwise,
    Mesh_correction,
    calc_distance,
    calc_exp_dissimilarity,
    empty_cache,
    generalized_procrustes_analysis,
    paste_center_align,
    paste_pairwise_align,
)
from .morpho_alignment import (
    morpho_align,
    morpho_align_apply_transformation,
    morpho_align_ref,
    morpho_align_transformation,
)
from .paste_alignment import paste_align, paste_align_ref
from .transform import BA_transform, BA_transform_and_assignment, get_P_chunk, paste_transform
from .utils import (
    align_preprocess,
    generate_label_transfer_dict,
    mapping_center_coords,
    downsampling,
    generate_label_transfer_prior,
    get_labels_based_on_coords,
    get_optimal_mapping_relationship,
    group_pca,
    mapping_aligned_coords,
    rigid_transformation,
    solve_RT_by_correspondence,
    split_slice,
    tps_deformation,
)
