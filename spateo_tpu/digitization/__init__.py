"""Digitization layer (`st.dd`): spatial-domain layers/columns via heat PDE.

Capability parity with reference spateo/digitization/__init__.py.
"""

from .borderline import get_borderline, grid_borderline
from .contour import extract_cluster_contours, gen_cluster_image, set_domains
from .grid import digitize, gridit
from .utils import (
    digitize_general,
    domain_heat_eqn_solver,
    field_contours,
    fill_grid_label,
    order_borderline,
    segment_bd_line,
)
