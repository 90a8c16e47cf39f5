"""Physical-space scatter plots (capability parity: reference
spateo/plotting/static/space.py:26 `space` and :155 `plot_cell_signaling`)."""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import matplotlib.pyplot as plt
import numpy as np

from .scatters import plot_vectors, scatters
from .utils import save_return_show_fig_utils


def space(
    adata,
    color: Optional[Union[List[str], str]] = None,
    genes: Optional[List[str]] = None,
    gene_cmaps=None,
    space: str = "spatial",
    width: float = 6,
    marker: str = ".",
    pointsize: Optional[float] = None,
    dpi: int = 100,
    ps_sample_num: int = 1000,
    alpha: float = 0.8,
    stack_genes: bool = False,
    stack_genes_threshold: float = 0.01,
    stack_colors_legend_size: int = 10,
    figsize: Optional[Tuple[float, float]] = None,
    *args,
    **kwargs,
):
    """Scatter in physical coordinates (parity: reference space.py:26).
    Figure aspect follows the data's physical aspect; point size is scaled
    to the typical nearest-neighbor distance."""
    genes = [genes] if isinstance(genes, str) else list(genes or [])
    if color is not None and stack_genes:
        stack_genes = False
    if color is not None:
        color = [color] if isinstance(color, str) else list(color)
        genes = genes + color
    if not genes:
        return None

    space_key = space if space in adata.obsm or f"X_{space}" in adata.obsm else "spatial"
    if f"X_{space_key}" not in adata.obsm and space_key in adata.obsm:
        adata.obsm[f"X_{space_key}"] = adata.obsm[space_key]
    pts = np.asarray(adata.obsm[f"X_{space_key}"])
    ptp = np.ptp(pts, axis=0)
    if figsize is None:
        figsize = (width, float(ptp[1] / max(ptp[0], 1e-9)) * width + 0.3)

    if pointsize is None:
        # estimate from nearest-neighbor spacing on a subsample
        sub = pts[np.random.default_rng(0).choice(len(pts), min(len(pts), ps_sample_num), replace=False)]
        d2 = ((sub[:, None, :2] - sub[None, :, :2]) ** 2).sum(-1)
        np.fill_diagonal(d2, np.inf)
        nn = float(np.sqrt(np.median(d2.min(1))))
        # convert physical spacing to points^2
        px_per_unit = figsize[0] * dpi / max(ptp[0], 1e-9)
        pointsize = max((nn * px_per_unit * 72.0 / dpi) ** 2 * 0.6, 0.3)

    kwargs.setdefault("aspect", "equal")
    return scatters(
        adata,
        basis=space_key,
        color=genes,
        figsize=figsize,
        pointsize=pointsize,
        dpi=dpi,
        alpha=alpha,
        marker=marker,
        stack_colors=stack_genes,
        stack_colors_threshold=stack_genes_threshold,
        stack_colors_legend_size=stack_colors_legend_size,
        stack_colors_cmaps=gene_cmaps,
        **kwargs,
    )


def plot_cell_signaling(
    adata,
    vf_key: str,
    color: Optional[Union[List[str], str]] = None,
    arrow_color: str = "tab:blue",
    edgewidth: float = 0.2,
    space: str = "spatial",
    width: float = 6,
    pointsize: Optional[float] = None,
    dpi: int = 100,
    alpha: float = 0.8,
    plot_method: str = "cell",
    scale: Optional[float] = None,
    grid_density: float = 1,
    figsize: Optional[Tuple[float, float]] = None,
    save_show_or_return: str = "return",
    save_kwargs: Optional[dict] = None,
    **kwargs,
):
    """Overlay a CCI-inferred signaling vector field on the spatial scatter
    (parity: reference space.py:155; COMMOT-style rendering). `plot_method`
    'cell' draws one arrow per cell, 'grid' averages onto a lattice,
    'stream' draws streamlines."""
    key = vf_key if vf_key in adata.obsm else f"vf_{vf_key}"
    V = np.asarray(adata.obsm[key])
    pts = np.asarray(adata.obsm[space])[:, :2]

    ax = None
    if color is not None:
        ax = space_plot_axes(adata, color, space, width, pointsize, dpi, alpha, figsize, **kwargs)
    if ax is None:
        ptp = np.ptp(pts, axis=0)
        figsize = figsize or (width, float(ptp[1] / max(ptp[0], 1e-9)) * width + 0.3)
        fig, ax = plt.subplots(figsize=figsize, dpi=dpi)
        ax.scatter(pts[:, 0], pts[:, 1], s=pointsize or 2, color="#cccccc", alpha=alpha, linewidths=0)
        ax.set_aspect("equal")

    if plot_method == "grid":
        n = max(int(20 * grid_density), 4)
        gx = np.linspace(pts[:, 0].min(), pts[:, 0].max(), n)
        gy = np.linspace(pts[:, 1].min(), pts[:, 1].max(), n)
        XX, YY = np.meshgrid(gx, gy)
        G = np.stack([XX.ravel(), YY.ravel()], 1)
        # kernel-average cell vectors onto the lattice
        h = (gx[1] - gx[0]) * 1.5
        w = np.exp(-((G[:, None, :] - pts[None, :, :]) ** 2).sum(-1) / (2 * h**2))
        wsum = w.sum(1, keepdims=True)
        GV = (w @ V[:, :2]) / np.maximum(wsum, 1e-12)
        keep = wsum.ravel() > 1e-3
        plot_vectors(ax, G[keep], GV[keep], method="cell", color=arrow_color, scale=scale, width=edgewidth / 100)
    else:
        plot_vectors(ax, pts, V[:, :2], method=plot_method, color=arrow_color, scale=scale)

    return save_return_show_fig_utils(save_show_or_return, False, None, "cell_signaling", save_kwargs, 1, ax.figure, ax)


def space_plot_axes(adata, color, space, width, pointsize, dpi, alpha, figsize, **kwargs):
    """Render the base space() panel and hand back its axes for overlays."""
    out = space(
        adata, color=color, space=space, width=width, pointsize=pointsize, dpi=dpi,
        alpha=alpha, figsize=figsize, save_show_or_return="return", **kwargs
    )
    if isinstance(out, list):
        return out[0]
    return out
