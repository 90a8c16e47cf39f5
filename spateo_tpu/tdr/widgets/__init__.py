"""Model editing widgets (capability parity: reference spateo/tdr/widgets/ —
interactive pyvista clip/pick/slice). Headless-first: the same operations
exposed as array-predicate functions; interactive picking is a documented
non-goal without a display server."""

from .ops import (
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
