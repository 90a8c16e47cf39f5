"""Core embedding/space scatter machinery (capability parity: reference
spateo/plotting/static/scatters.py:51 — multi-panel scatter with
categorical / continuous coloring, stacked-gene rendering, optional vector
overlays)."""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
from matplotlib.axes import Axes

from .utils import (
    _get_adata_color_vec,
    check_colornorm,
    deaxis_all,
    despline_all,
    get_categorical_colors,
    quiver_autoscaler,
    resolve_cmap,
    save_return_show_fig_utils,
)


def _resolve_basis(adata, basis: str) -> np.ndarray:
    for key in (f"X_{basis}", basis):
        if key in adata.obsm:
            return np.asarray(adata.obsm[key])
    raise KeyError(f"basis `{basis}` not found in .obsm (looked for X_{basis} and {basis})")


def _panel_scatter(
    ax: Axes,
    pts: np.ndarray,
    vals: np.ndarray,
    cmap,
    pointsize: float,
    alpha: float,
    marker: str,
    show_legend,
    sym_c: bool,
    sort: str,
    adata=None,
    color_key=None,
    title: str = "",
    vmin=None,
    vmax=None,
):
    numeric = np.issubdtype(np.asarray(vals).dtype, np.number)
    if numeric:
        v = np.asarray(vals, dtype=float)
        if sort == "abs":
            order = np.argsort(np.abs(v))
        elif sort == "neg":
            order = np.argsort(-v)
        else:
            order = np.argsort(v)
        if sym_c and np.nanmin(v) < 0 < np.nanmax(v):
            bound = np.nanmax(np.abs(v))
            vmin, vmax = -bound, bound
        norm = check_colornorm(vmin, vmax)
        sc = ax.scatter(pts[order, 0], pts[order, 1], c=v[order], cmap=cmap, norm=norm, s=pointsize, alpha=alpha, marker=marker, linewidths=0)
        if show_legend not in (False, None, "none"):
            plt.colorbar(sc, ax=ax, shrink=0.6, pad=0.01)
    else:
        cats, mapping = (color_key if isinstance(color_key, tuple) else get_categorical_colors(adata, None, values=vals))
        svals = pd.Series(vals).astype(str).values
        for c in cats:
            m = svals == c
            ax.scatter(pts[m, 0], pts[m, 1], color=mapping[c], s=pointsize, alpha=alpha, marker=marker, label=c, linewidths=0)
        if show_legend == "on data":
            for c in cats:
                m = svals == c
                if m.any():
                    ax.text(*pts[m].mean(0)[:2], c, fontsize=8, ha="center", weight="bold")
        elif show_legend not in (False, None, "none"):
            ax.legend(loc="center left", bbox_to_anchor=(1, 0.5), fontsize=7, markerscale=3, frameon=False)
    ax.set_title(title, fontsize=10)


def scatters(
    adata,
    basis: Union[str, list] = "umap",
    x: int = 0,
    y: int = 1,
    color: Union[str, list] = "ntr",
    layer: Union[str, list] = "X",
    cmap: Optional[str] = None,
    color_key: Union[dict, list, None] = None,
    background: Optional[str] = None,
    ncols: int = 4,
    pointsize: Optional[float] = None,
    figsize: tuple = (6, 4),
    show_legend="on data",
    ax: Optional[Axes] = None,
    sort: str = "raw",
    save_show_or_return: str = "return",
    save_kwargs: Optional[Dict] = None,
    sym_c: bool = False,
    dpi: int = 100,
    marker: Optional[str] = None,
    aspect: str = "auto",
    despline: bool = True,
    deaxis: bool = True,
    alpha: float = 0.8,
    stack_colors: bool = False,
    stack_colors_threshold: float = 0.001,
    stack_colors_title: str = "stacked colors",
    stack_colors_legend_size: int = 2,
    stack_colors_cmaps: Optional[List[str]] = None,
    vmin=None,
    vmax=None,
    **kwargs,
) -> Union[None, Axes, List[Axes]]:
    """Multi-panel scatter over an embedding (parity surface:
    reference scatters.py:51). One panel per (color, basis) combination;
    categorical obs columns get a discrete palette + optional on-data
    labels; genes/numeric columns get a colormap + colorbar."""
    bases = [basis] if isinstance(basis, str) else list(basis)
    colors = [color] if isinstance(color, str) else list(color)
    layers = [layer] if isinstance(layer, str) else list(layer)
    marker = marker or "."

    if stack_colors:
        return _stacked_scatter(
            adata, bases[0], colors, layers[0], pointsize, figsize, dpi, alpha, marker,
            stack_colors_threshold, stack_colors_title, stack_colors_legend_size,
            stack_colors_cmaps, save_show_or_return, save_kwargs, ax=ax,
        )

    panels = [(b, c, l) for b in bases for c in colors for l in layers[:1]]
    n = len(panels)
    ncols = min(ncols, n)
    nrows = int(np.ceil(n / ncols))
    if ax is None:
        fig, axes = plt.subplots(nrows, ncols, figsize=(figsize[0] * ncols, figsize[1] * nrows), dpi=dpi, squeeze=False)
        axes_flat = axes.ravel()
    else:
        fig = ax.figure
        axes_flat = np.asarray([ax])

    for i, (b, c, l) in enumerate(panels[: len(axes_flat)]):
        pts = _resolve_basis(adata, b)[:, [x, y]]
        vals = _get_adata_color_vec(adata, l, c)
        ps = pointsize if pointsize is not None else max(0.2, 30000.0 / max(len(pts), 1))
        ck = None
        if isinstance(color_key, dict):
            cats = list(color_key)
            ck = (cats, color_key)
        _panel_scatter(
            axes_flat[i], pts, vals, resolve_cmap(cmap, "viridis" if sort != "abs" else "inferno"),
            ps, alpha, marker, show_legend, sym_c, sort, adata=adata, color_key=ck, title=str(c),
            vmin=vmin, vmax=vmax,
        )
        axes_flat[i].set_aspect("equal" if aspect == "equal" else "auto")
        if despline:
            despline_all(axes_flat[i])
        if deaxis:
            deaxis_all(axes_flat[i])
    for j in range(n, len(axes_flat)):
        axes_flat[j].axis("off")

    out_axes = axes_flat[0] if n == 1 else list(axes_flat[:n])
    return save_return_show_fig_utils(
        save_show_or_return, show_legend not in (False, None, "none"), background,
        "scatters", save_kwargs, n, fig, out_axes,
    )


def _stacked_scatter(
    adata, basis, colors, layer, pointsize, figsize, dpi, alpha, marker,
    threshold, title, legend_size, cmaps, save_show_or_return, save_kwargs, ax=None,
):
    """Overlay several genes on one panel, each with its own colormap,
    drawing only cells above `threshold` (reference scatters.py stack_colors
    path)."""
    pts = _resolve_basis(adata, basis)[:, :2]
    cmaps = cmaps or ["Reds", "Blues", "Greens", "Purples", "Oranges", "Greys"]
    if ax is None:
        fig, ax = plt.subplots(figsize=figsize, dpi=dpi)
    else:
        fig = ax.figure
    ps = pointsize if pointsize is not None else max(0.2, 30000.0 / max(len(pts), 1))
    ax.scatter(pts[:, 0], pts[:, 1], color="#eeeeee", s=ps, marker=marker, linewidths=0)
    handles = []
    for i, g in enumerate(colors):
        v = np.asarray(_get_adata_color_vec(adata, layer, g), dtype=float)
        m = v > threshold
        if not m.any():
            continue
        cm = resolve_cmap(cmaps[i % len(cmaps)])
        vn = (v[m] - v[m].min()) / (np.ptp(v[m]) + 1e-12)
        ax.scatter(pts[m, 0], pts[m, 1], color=cm(0.3 + 0.7 * vn), s=ps, alpha=alpha, marker=marker, linewidths=0)
        handles.append(plt.Line2D([], [], marker="o", ls="", color=cm(0.8), label=g, markersize=legend_size))
    ax.legend(handles=handles, loc="center left", bbox_to_anchor=(1, 0.5), frameon=False, fontsize=7)
    ax.set_title(title)
    deaxis_all(ax)
    despline_all(ax)
    return save_return_show_fig_utils(save_show_or_return, True, None, "scatters", save_kwargs, 1, fig, ax)


def plot_vectors(
    ax: Axes,
    X: np.ndarray,
    V: np.ndarray,
    method: str = "cell",
    color: str = "black",
    **kwargs,
):
    """Vector overlay: per-cell quiver, grid quiver, or streamlines
    (reference utils.py:246 plot_vectors)."""
    X, V = np.asarray(X), np.asarray(V)
    if method == "stream":
        # streamplot needs a regular grid; rasterize the field first
        n = 50
        xi = np.linspace(X[:, 0].min(), X[:, 0].max(), n)
        yi = np.linspace(X[:, 1].min(), X[:, 1].max(), n)
        XX, YY = np.meshgrid(xi, yi)
        from scipy.interpolate import griddata

        U = griddata(X[:, :2], V[:, 0], (XX, YY), method="linear", fill_value=0)
        W = griddata(X[:, :2], V[:, 1], (XX, YY), method="linear", fill_value=0)
        ax.streamplot(XX, YY, U, W, color=color, density=kwargs.pop("density", 1.2), linewidth=kwargs.pop("linewidth", 0.7))
    else:
        scale = kwargs.pop("scale", quiver_autoscaler(X, V))
        ax.quiver(X[:, 0], X[:, 1], V[:, 0], V[:, 1], color=color, scale=scale, angles="xy", **kwargs)
    return ax


def position(adata, color: str = "cluster", basis: str = "position", **kwargs):
    """Scatter on the 'position' basis (parity: reference
    static/position.py:10)."""
    return scatters(adata, basis=basis, color=color, **kwargs)
