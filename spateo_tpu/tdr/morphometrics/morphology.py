"""Model morphology metrics (capability parity: reference
spateo/tdr/morphometrics/morphology.py:11,74)."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple, Union

import numpy as np

from ...logging import logger_manager as lm
from ..models.mesh_core import Mesh, PointCloud


def model_morphology(model: Union[Mesh, PointCloud], pc: Optional[PointCloud] = None) -> Dict[str, Any]:
    """Length/width/height, surface area, volume, V/SA ratio, cell density
    (parity: morphology.py:11)."""
    morphology: Dict[str, Any] = {}
    b = model.bounds
    morphology["Length(x)"] = round(abs(b[1] - b[0]), 5)
    morphology["Width(y)"] = round(abs(b[3] - b[2]), 5)
    morphology["Height(z)"] = round(abs(b[5] - b[4]), 5) if len(b) >= 6 else 0.0
    if isinstance(model, Mesh):
        morphology["Surface_area"] = round(model.area, 5)
        morphology["Volume"] = round(model.volume, 5)
        morphology["V/SA_ratio"] = round(morphology["Volume"] / max(morphology["Surface_area"], 1e-12), 5)
        if pc is not None:
            morphology["cell_density"] = round(pc.n_points / max(morphology["Volume"], 1e-12), 5)
    for k, v in morphology.items():
        lm.main_info(f"{k} of model: {v};")
    return morphology


def pc_KDE(
    pc: PointCloud,
    key_added: str = "kde",
    kernel: str = "gaussian",
    bandwidth: float = 1.0,
    colormap: Union[str, list, dict] = "hot_r",
    alphamap: Union[float, list, dict] = 1.0,
    inplace: bool = False,
) -> Tuple[Optional[PointCloud], Optional[str]]:
    """Kernel density of a 3D point cloud (parity: morphology.py:74)."""
    from sklearn.neighbors import KernelDensity

    pc_out = pc if inplace else pc.copy()
    coords = np.asarray(pc_out.points)
    dens = KernelDensity(kernel=kernel, bandwidth=bandwidth).fit(coords).score_samples(coords)
    dens = np.exp(dens)
    pc_out[key_added] = dens
    return (None if inplace else pc_out), None
