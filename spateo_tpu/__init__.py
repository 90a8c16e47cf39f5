"""Spateo-TPU: a TPU-native spatiotemporal modeling framework.

Re-implementation of the capabilities of aristoteleo/spateo-release (reference
spateo/__init__.py:10-30) as an idiomatic JAX/XLA/Pallas framework: every
compute core (segmentation EM/BP/watershed, Morpho alignment, digitization PDE,
SparseVFC vector fields, MuSIC regression) runs as jit-compiled kernels over
device-resident arrays, sharded across TPU meshes via `spateo_tpu.parallel`.

Public surface mirrors the reference:

    import spateo_tpu as st
    st.io / st.pp / st.cs / st.align / st.dd / st.tl / st.tdr / st.svg / st.pl
"""

from ._lazy_loader import LazyAttribute, LazyLoader
from .configuration import SKM, config
from .get_version import get_version
from .errors import (
    AlignmentError,
    ConfigurationError,
    DigitizationError,
    MeshError,
    PreprocessingError,
    SegmentationError,
    SpateoError,
)
from .logging import logger_manager
from .core.anndata import AnnData, concat, read_h5ad

# anndata-style top-level readers (parity: reference spateo/__init__.py:29
# `from .data_io import *`)
from .data_io import (
    read,
    read_csv,
    read_excel,
    read_hdf,
    read_loom,
    read_mtx,
    read_text,
    read_umi_tools,
    read_zarr,
)

__version__ = get_version(__file__)

# Lazily-loaded public subpackages (parity: reference spateo/__init__.py:10-30)
io = LazyLoader("io", globals(), "spateo_tpu.io")
pp = LazyLoader("pp", globals(), "spateo_tpu.preprocessing")
cs = LazyLoader("cs", globals(), "spateo_tpu.segmentation")
align = LazyLoader("align", globals(), "spateo_tpu.alignment")
dd = LazyLoader("dd", globals(), "spateo_tpu.digitization")
tl = LazyLoader("tl", globals(), "spateo_tpu.tools")
tdr = LazyLoader("tdr", globals(), "spateo_tpu.tdr")
svg = LazyLoader("svg", globals(), "spateo_tpu.svg")
pl = LazyLoader("pl", globals(), "spateo_tpu.plotting")
profiler = LazyLoader("profiler", globals(), "spateo_tpu.profiler")
sample_data = LazyLoader("sample_data", globals(), "spateo_tpu.sample_data")
parallel = LazyLoader("parallel", globals(), "spateo_tpu.parallel")
ops = LazyLoader("ops", globals(), "spateo_tpu.ops")
