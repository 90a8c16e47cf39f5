"""Preprocessing layer (`st.pp`): filters, normalization, transforms, binning.

Capability parity with reference spateo/preprocessing/__init__.py.
"""

from . import filter, image
from .aggregate import bin_adata
from . import auxseg
from .filter import filter_by_coordinates, filter_cells, filter_genes
from .image import remove_background
from .normalize import (
    calcFactorRLE,
    calcFactorTMM,
    calcFactorTMMwsp,
    calcNormFactors,
    factor_normalization,
    normalize_total,
    select_hvf_seurat,
)
from .transform import log1p, scale
