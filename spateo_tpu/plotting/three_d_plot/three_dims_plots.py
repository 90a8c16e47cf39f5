"""Top-level 3D plot entry points (capability parity: reference
spateo/plotting/static/three_d_plot/three_dims_plots.py:1-1318 —
`three_d_plot`, `three_d_multi_plot`, `three_d_animate`,
`merge_animations`)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import matplotlib.pyplot as plt
import numpy as np

from .three_dims_plotter import add_legend, add_model, add_model_outline, create_plotter, output_plotter


def _as_model_list(model):
    return list(model) if isinstance(model, (list, tuple)) else [model]


def three_d_plot(
    model,
    key: Union[str, List[str], None] = None,
    filename: Optional[str] = None,
    jupyter: bool = False,
    off_screen: bool = False,
    window_size: Sequence[int] = (512, 512),
    background: str = "white",
    cpo: Union[str, list, None] = None,
    colormap: Union[str, List[str], None] = "rainbow",
    ambient: float = 0.2,
    opacity: Union[float, Sequence[float]] = 1.0,
    model_style: Union[str, Sequence[str]] = "surface",
    model_size: Union[float, Sequence[float]] = 3.0,
    show_legend: bool = True,
    show_outline: bool = False,
    view_up: Sequence[float] = (0.5, 0.5, 1),
    text: Optional[str] = None,
    **kwargs,
):
    """Render one (or a stack of) tdr model(s) into a single 3D panel
    (parity: reference three_dims_plots.py `three_d_plot`)."""
    models = _as_model_list(model)
    keys = key if isinstance(key, (list, tuple)) else [key] * len(models)
    cmaps = colormap if isinstance(colormap, (list, tuple)) else [colormap] * len(models)
    opac = list(opacity) if isinstance(opacity, (list, tuple)) else [opacity] * len(models)
    styles = list(model_style) if isinstance(model_style, (list, tuple)) else [model_style] * len(models)
    sizes = list(model_size) if isinstance(model_size, (list, tuple)) else [model_size] * len(models)

    fig, axes = create_plotter(1, 1, window_size=window_size, background=background)
    ax = axes[0, 0]
    for m, k, cm, op, st, sz in zip(models, keys, cmaps, opac, styles, sizes):
        add_model(ax, m, key=k, colormap=cm, ambient=ambient, opacity=op, model_style=st, model_size=sz)
        if show_outline:
            add_model_outline(ax, m)
    if show_legend:
        add_legend(ax)
    if text:
        ax.set_title(text)
    if cpo == "xy":
        ax.view_init(elev=90, azim=-90)
    elif cpo == "xz":
        ax.view_init(elev=0, azim=-90)
    elif cpo == "yz":
        ax.view_init(elev=0, azim=0)
    return output_plotter(fig, filename=filename, jupyter=jupyter)


def three_d_multi_plot(
    model,
    key: Union[str, List[str], None] = None,
    filename: Optional[str] = None,
    jupyter: bool = False,
    off_screen: bool = False,
    shape: Optional[Sequence[int]] = None,
    window_size: Sequence[int] = (512, 512),
    background: str = "white",
    colormap: Union[str, List[str], None] = "rainbow",
    ambient: float = 0.2,
    opacity: Union[float, Sequence[float]] = 1.0,
    model_style: Union[str, Sequence[str]] = "surface",
    model_size: Union[float, Sequence[float]] = 3.0,
    show_legend: bool = True,
    text: Union[str, List[str], None] = None,
    **kwargs,
):
    """One 3D panel per model (parity: reference `three_d_multi_plot`)."""
    models = _as_model_list(model)
    n = len(models)
    if shape is None:
        ncols = min(4, n)
        nrows = int(np.ceil(n / ncols))
    else:
        nrows, ncols = shape
    keys = key if isinstance(key, (list, tuple)) else [key] * n
    cmaps = colormap if isinstance(colormap, (list, tuple)) else [colormap] * n
    styles = list(model_style) if isinstance(model_style, (list, tuple)) else [model_style] * n
    sizes = list(model_size) if isinstance(model_size, (list, tuple)) else [model_size] * n
    texts = text if isinstance(text, (list, tuple)) else [text] * n

    fig, axes = create_plotter(nrows, ncols, window_size=window_size, background=background)
    flat = axes.ravel()
    for i, m in enumerate(models):
        add_model(flat[i], m, key=keys[i], colormap=cmaps[i], ambient=ambient,
                  opacity=opacity if np.isscalar(opacity) else opacity[i],
                  model_style=styles[i], model_size=sizes[i])
        if texts[i]:
            flat[i].set_title(texts[i], fontsize=9)
        if show_legend:
            add_legend(flat[i])
    for j in range(n, len(flat)):
        flat[j].set_visible(False)
    return output_plotter(fig, filename=filename, jupyter=jupyter)


def three_d_animate(
    models,
    key: Optional[str] = None,
    filename: str = "animate.gif",
    jupyter: bool = False,
    off_screen: bool = False,
    window_size: Sequence[int] = (512, 512),
    background: str = "white",
    colormap: Union[str, None] = "rainbow",
    ambient: float = 0.2,
    opacity: float = 1.0,
    model_style: str = "points",
    model_size: float = 3.0,
    framerate: int = 15,
    **kwargs,
):
    """Animate a sequence of models (e.g. morphopath snapshots) into a GIF
    (parity: reference `three_d_animate`; pyvista movie -> matplotlib
    FuncAnimation + PillowWriter)."""
    from matplotlib import animation

    models = _as_model_list(models)
    fig, axes = create_plotter(1, 1, window_size=window_size, background=background)
    ax = axes[0, 0]

    def update(i):
        ax.clear()
        ax.set_axis_off()
        add_model(ax, models[i], key=key, colormap=colormap, ambient=ambient,
                  opacity=opacity, model_style=model_style, model_size=model_size)
        ax.set_title(f"frame {i}")
        return []

    anim = animation.FuncAnimation(fig, update, frames=len(models), blit=False)
    anim.save(filename, writer=animation.PillowWriter(fps=framerate))
    plt.close(fig)
    return filename


def merge_animations(
    mp4_files: Optional[List[str]] = None,
    gif_files: Optional[List[str]] = None,
    mp4_folder: Optional[str] = None,
    filename: str = "merged.gif",
    **kwargs,
):
    """Concatenate animation files into one GIF (parity: reference
    `merge_animations`; ffmpeg/moviepy replaced by PIL frame stitching)."""
    from PIL import Image, ImageSequence

    files = list(gif_files or []) + list(mp4_files or [])
    if mp4_folder:
        import glob
        import os

        files += sorted(glob.glob(os.path.join(mp4_folder, "*.gif")))
    frames = []
    duration = 100
    for f in files:
        with Image.open(f) as im:
            duration = im.info.get("duration", duration)
            for frame in ImageSequence.Iterator(im):
                frames.append(frame.convert("RGB"))
    if not frames:
        raise ValueError("no frames found to merge")
    frames[0].save(filename, save_all=True, append_images=frames[1:], duration=duration, loop=0)
    return filename


def wrap_to_plotter(ax, model, key=None, **kwargs):
    """Draw a model onto an existing 3D axes (parity surface: reference
    three_dims_plots.py wrap_to_plotter)."""
    from .three_dims_plotter import add_model

    return add_model(ax, model, key=key, **kwargs)


def _adata_pointcloud(adata, spatial_key: str = "spatial", values=None, key: str = "val"):
    from ...tdr.models.mesh_core import PointCloud

    pts = np.asarray(adata.obsm[spatial_key], float)
    if pts.shape[1] == 2:
        pts = np.concatenate([pts, np.zeros((len(pts), 1))], 1)
    pd_data = {key: np.asarray(values)} if values is not None else {}
    return PointCloud(pts[:, :3], pd_data)


def plot_expression_3D(adata, gene: str, spatial_key: str = "spatial", filename=None, **kwargs):
    """3D scatter colored by one gene's expression (parity: reference
    three_dims_plots.py plot_expression_3D)."""
    from scipy.sparse import issparse

    names = list(map(str, adata.var_names))
    X = adata.X.toarray() if issparse(adata.X) else np.asarray(adata.X)
    vals = X[:, names.index(str(gene))]
    pc = _adata_pointcloud(adata, spatial_key, vals, key=str(gene))
    return three_d_plot(pc, key=str(gene), model_style="points", filename=filename, **kwargs)


def plot_multiple_genes_3D(adata, genes, spatial_key: str = "spatial", filename=None, **kwargs):
    """One 3D panel per gene (parity: reference plot_multiple_genes_3D)."""
    from scipy.sparse import issparse

    names = list(map(str, adata.var_names))
    X = adata.X.toarray() if issparse(adata.X) else np.asarray(adata.X)
    models = [_adata_pointcloud(adata, spatial_key, X[:, names.index(str(g))], key="expr") for g in genes]
    return three_d_multi_plot(models, key="expr", text=[str(g) for g in genes], model_style="points", filename=filename, **kwargs)


def quick_plot_3D_celltypes(adata, group_key: str = "cell_type", spatial_key: str = "spatial", filename=None, **kwargs):
    """Categorical 3D cell-type scatter (parity: reference
    quick_plot_3D_celltypes)."""
    pc = _adata_pointcloud(adata, spatial_key, np.asarray(adata.obs[group_key]).astype(str), key=group_key)
    return three_d_plot(pc, key=group_key, model_style="points", filename=filename, **kwargs)


def visualize_3D_increasing_direction_gradient(adata, axis: str = "z", spatial_key: str = "spatial", filename=None, **kwargs):
    """Positional-gradient coloring along an axis (parity: reference
    visualize_3D_increasing_direction_gradient)."""
    pts = np.asarray(adata.obsm[spatial_key], float)
    ax_idx = {"x": 0, "y": 1, "z": 2}[axis]
    vals = pts[:, ax_idx] if pts.shape[1] > ax_idx else pts[:, -1]
    pc = _adata_pointcloud(adata, spatial_key, vals, key=f"{axis}_gradient")
    return three_d_plot(pc, key=f"{axis}_gradient", model_style="points", filename=filename, **kwargs)
