"""st.pl — static plotting (capability parity: reference
spateo/plotting/static/__init__.py:1-39; pyvista/plotly/geopandas
renderers re-done in pure matplotlib over the tpu framework's data
structures)."""

from .agg import box_qc_regions, imshow, qc_regions
from .align import (
    multi_slices,
    optimization_animation,
    overlay_slices_2d,
    plot_deformation_grid,
    slices_2d,
)
from .bbs import delaunay, polygon
from .contour import spatial_domains
from .dotplot import CCDotplot, Dotplot, dotplot
from .geo import color_label, geo, space_polygons
from .glm import glm_fit, glm_heatmap
from .interactions import ligrec, plot_connections
from .lisa import lisa, lisa_quantiles
from .networks import PlotNetwork, plot_network
from .polarity import polarity
from .scatters import plot_vectors, scatters
from .space import plot_cell_signaling, space
from .three_d_plot import (
    acceleration,
    backbone,
    curl,
    curvature,
    deformation,
    divergence,
    jacobian,
    merge_animations,
    multi_models,
    pairwise_iteration,
    pairwise_iteration_panel,
    pairwise_mapping,
    pi_heatmap,
    three_d_animate,
    three_d_multi_plot,
    three_d_plot,
    torsion,
)
from . import colorlabel, interactive
from . import static  # noqa: F401
from .interactive import cellbin_select, contours, select_polygon
from .utils import dendrogram, map2color, save_fig, save_return_show_fig_utils
