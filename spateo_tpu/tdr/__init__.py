"""TDR layer (`st.tdr`): 3D reconstruction and morphometrics.

Capability parity with reference spateo/tdr/__init__.py: point clouds,
surfaces, voxels, backbones, migration models, morphofield learning (SparseVFC
/ GP), differential geometry, trajectory integration, interpolation engines,
and widgets.
"""

from .interpolations import (
    deep_intepretation,
    get_X_Y_grid,
    gp_interpolation,
    kernel_interpolation,
    vtk_interpolation,
)
from .models import *  # noqa: F401,F403
from .models.models_backbone.backbone_methods import (
    ElPiGraph_method,
    NLPCA,
    PrinCurve_method,
    SimplePPT_method,
)
from .morphometrics import *  # noqa: F401,F403
from .widgets import clip, pick, slice, utils  # noqa: F401
from .widgets import (
    clip_models,
    interactive_box_clip,
    interactive_pick,
    interactive_rectangle_clip,
    interactive_slice,
    overlap_mesh_pick,
    overlap_pc_pick,
    overlap_pick,
    pick_models,
    slice_models,
    three_d_pick,
    three_d_slice,
)
