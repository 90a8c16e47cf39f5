"""Core data model and host<->device bridge."""

from .anndata import AnnData, concat, read_h5ad
from .bridge import csr_to_dense_device, layer_to_device, points_to_raster, segment_sum_device, to_device
