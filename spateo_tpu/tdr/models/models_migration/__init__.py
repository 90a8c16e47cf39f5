"""Migration/vector-field visualization models (capability parity:
reference spateo/tdr/models/models_migration/ — morphofield_model.py:18,71,
morphopath_model.py:84,274, arrow/line primitives)."""

from .morphofield_model import construct_field, construct_field_plain, construct_field_streams
from .morphopath_model import construct_genesis, construct_genesis_X, construct_trajectory, construct_trajectory_X
from .primitives import (
    construct_align_lines,
    construct_arrow,
    construct_arrows,
    construct_axis_line,
    construct_line,
    construct_lines,
    generate_edges,
)
