"""Interpolation engines: expression -> continuous 3D field
(capability parity: reference spateo/tdr/interpolations/__init__.py —
VTK Shepard/Gaussian, GP, SparseVFC-kernel and deep-MLP engines)."""

from .interpolation_dl import (
    DeepInterpolation,
    cosine_distance,
    deep_intepretation,
    mad,
    mse,
    subset_best_samples,
    weighted_cosine_distance,
    weighted_mad,
    weighted_mean,
    weighted_mse,
)
from .interpolation_gp import gp_interpolation
from .interpolation_sparseVFC import kernel_interpolation
from .interpolation_vtk import vtk_interpolation
from .utils import get_X_Y_grid
