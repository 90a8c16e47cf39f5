"""3D model construction (parity: reference spateo/tdr/models/)."""

from .mesh_core import Mesh, PointCloud, collect_models, merge_models
from .models_backbone import (
    backbone_scc,
    construct_backbone,
    map_gene_to_backbone,
    map_points_to_backbone,
    update_backbone,
)
from .models_individual import construct_cells, construct_pc, construct_surface, voxelize_mesh, voxelize_pc
from .models_migration import (
    construct_arrow,
    construct_arrows,
    construct_field,
    construct_field_streams,
    construct_genesis,
    construct_genesis_X,
    construct_line,
    construct_lines,
    construct_trajectory,
    construct_trajectory_X,
)
