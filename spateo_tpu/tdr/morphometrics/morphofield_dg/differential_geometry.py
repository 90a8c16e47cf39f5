"""AnnData-level differential-geometry wrappers
(capability parity: reference
spateo/tdr/morphometrics/morphofield_dg/differential_geometry.py:42-297)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ....core.anndata import AnnData
from ....logging import logger_manager as lm
from .GPVectorField import GPVectorField


def _get_vf(adata: AnnData, vf_key: str, nonrigid_only: bool = False) -> GPVectorField:
    vf = GPVectorField()
    vf.from_adata(adata, vf_key=vf_key, nonrigid_only=nonrigid_only)
    return vf


def morphofield_velocity(
    adata: AnnData, vf_key: str = "VecFld_morpho", key_added: str = "velocity", inplace: bool = True
) -> Optional[AnnData]:
    """Velocities at the cells' positions (parity: differential_geometry.py:42)."""
    adata = adata if inplace else adata.copy()
    vf = _get_vf(adata, vf_key)
    adata.obsm[key_added] = vf.compute_velocity(vf.get_X())
    return None if inplace else adata

def morphofield_acceleration(
    adata: AnnData, vf_key: str = "VecFld_morpho", key_added: str = "acceleration", inplace: bool = True
) -> Optional[AnnData]:
    """J v acceleration (parity: differential_geometry.py:84)."""
    adata = adata if inplace else adata.copy()
    vf = _get_vf(adata, vf_key)
    acc, acc_norm = vf.compute_acceleration(return_all=True)
    adata.obsm[key_added] = acc
    adata.obs[key_added] = acc_norm
    return None if inplace else adata


def morphofield_curvature(
    adata: AnnData, vf_key: str = "VecFld_morpho", key_added: str = "curvature", formula: int = 2, inplace: bool = True
) -> Optional[AnnData]:
    """Curvature (parity: differential_geometry.py:124)."""
    adata = adata if inplace else adata.copy()
    vf = _get_vf(adata, vf_key)
    kur, kur_norm = vf.compute_curvature(formula=formula)
    adata.obsm[key_added] = kur
    adata.obs[key_added] = kur_norm
    return None if inplace else adata


def morphofield_curl(
    adata: AnnData, vf_key: str = "VecFld_morpho", key_added: str = "curl", inplace: bool = True
) -> Optional[AnnData]:
    """Curl (parity: differential_geometry.py:166)."""
    adata = adata if inplace else adata.copy()
    vf = _get_vf(adata, vf_key)
    curl = vf.compute_curl()
    if curl.ndim == 2:
        adata.obsm[key_added] = curl
        adata.obs[key_added] = np.linalg.norm(curl, axis=1)
    else:
        adata.obs[key_added] = curl
    return None if inplace else adata


def morphofield_torsion(
    adata: AnnData, vf_key: str = "VecFld_morpho", key_added: str = "torsion", inplace: bool = True
) -> Optional[AnnData]:
    """Torsion (parity: differential_geometry.py:205)."""
    adata = adata if inplace else adata.copy()
    vf = _get_vf(adata, vf_key)
    adata.obs[key_added] = vf.compute_torsion()
    return None if inplace else adata


def morphofield_divergence(
    adata: AnnData, vf_key: str = "VecFld_morpho", key_added: str = "divergence", inplace: bool = True,
    vectorize_size: int = 1000,
) -> Optional[AnnData]:
    """Divergence (parity: differential_geometry.py:243)."""
    adata = adata if inplace else adata.copy()
    vf = _get_vf(adata, vf_key)
    adata.obs[key_added] = vf.compute_divergence(vectorize_size=vectorize_size)
    return None if inplace else adata


def morphofield_jacobian(
    adata: AnnData, vf_key: str = "VecFld_morpho", key_added: str = "jacobian", inplace: bool = True
) -> Optional[AnnData]:
    """Per-cell Jacobians (parity: differential_geometry.py:275)."""
    adata = adata if inplace else adata.copy()
    vf = _get_vf(adata, vf_key)
    J = vf.get_Jacobian()(vf.get_X())
    adata.uns[key_added] = J
    adata.obs[key_added + "_det"] = np.linalg.det(J)
    return None if inplace else adata
