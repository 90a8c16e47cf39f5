"""SVG layer (`st.svg`): spatially-variable-gene detection via OT distances.

Capability parity with reference spateo/svg/__init__.py.
"""

from .get_svg import (
    cal_wass_dis_for_genes,
    cal_wass_dis_nobs,
    cal_wass_dis_target_on_genes,
    cal_wass_dist_bs,
    get_std_wasserstein,
    smooth,
    smoothing_and_sampling,
    svg_iden_reg,
)
from .get_svg_between_slice import cal_gro_wass_bs, cal_gw_dis_on_genes
from .utils import (
    add_pos_ratio_to_adata,
    cal_wass_dis,
    cal_wass_dis_batch,
    filter_adata_by_pos_ratio,
    get_genes_by_pos_ratio,
)
