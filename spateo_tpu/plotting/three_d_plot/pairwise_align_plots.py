"""Pairwise alignment diagnostics (capability parity: reference
spateo/plotting/static/three_d_plot/pairwise_align_plots.py:29
`pi_heatmap`, :89 `pairwise_mapping`, :540 `pairwise_iteration`,
:813 `pairwise_iteration_panel`)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import matplotlib.pyplot as plt
import numpy as np

from ..utils import resolve_cmap, save_return_show_fig_utils


def _iter_frames(iter_added) -> List[np.ndarray]:
    """Normalize a Morpho iteration trace into an ordered list of [N, 2]
    frames. Accepts the reference iter_added dict ({key: {it: coords},
    "sigma2": {it: s2}}, morpho_class.py:1043) or a plain sequence."""
    if isinstance(iter_added, dict):
        coord_keys = [k for k in iter_added if k != "sigma2"]
        inner = iter_added[coord_keys[0]]
        frames = [np.asarray(inner[i], dtype=float)[:, :2] for i in sorted(inner)]
    else:
        frames = [np.asarray(f, dtype=float)[:, :2] for f in iter_added]
    return frames


def pi_heatmap(
    pi: np.ndarray,
    model1_name: str = "model1",
    model2_name: str = "model2",
    colormap: str = "hot_r",
    fontsize: int = 12,
    filename: Optional[str] = None,
    robust: bool = True,
    ax=None,
    save_show_or_return: str = "return",
    save_kwargs: Optional[dict] = None,
    **kwargs,
):
    """Heatmap of the alignment transport plan / posterior P
    (parity: reference pairwise_align_plots.py:29)."""
    P = np.asarray(pi, dtype=float)
    if ax is None:
        fig, ax = plt.subplots(figsize=(6, 6))
    else:
        fig = ax.figure
    vmax = np.percentile(P, 99.5) if robust else None
    im = ax.imshow(P, cmap=resolve_cmap(colormap), aspect="auto", vmax=vmax, **kwargs)
    ax.set_xlabel(model2_name, fontsize=fontsize)
    ax.set_ylabel(model1_name, fontsize=fontsize)
    plt.colorbar(im, ax=ax, shrink=0.7)
    if filename:
        fig.savefig(filename, dpi=150, bbox_inches="tight")
    return save_return_show_fig_utils(save_show_or_return, False, None, "pi_heatmap", save_kwargs, 1, fig, ax)


def pairwise_mapping(
    idA=None,
    idB=None,
    adataA=None,
    adataB=None,
    pi: Optional[np.ndarray] = None,
    modelA=None,
    modelB=None,
    layer: str = "X",
    spatial_key: str = "align_spatial",
    keep_all: bool = False,
    distance_threshold: Optional[float] = None,
    n_sampling: int = 300,
    model_color: Sequence[str] = ("tab:red", "tab:blue"),
    line_color: str = "#777777",
    line_alpha: float = 0.4,
    point_size: float = 3.0,
    filename: Optional[str] = None,
    **kwargs,
):
    """3D view of two aligned slices with mapping lines connecting each
    sampled cell in A to its best-matched cell in B under the transport
    plan `pi` (parity: reference pairwise_align_plots.py:89)."""
    ptsA = np.asarray(adataA.obsm[spatial_key], dtype=float)
    ptsB = np.asarray(adataB.obsm[spatial_key], dtype=float)
    if ptsA.shape[1] == 2:
        ptsA = np.concatenate([ptsA, np.zeros((len(ptsA), 1))], 1)
    if ptsB.shape[1] == 2:
        ptsB = np.concatenate([ptsB, np.ones((len(ptsB), 1))], 1)
    P = np.asarray(pi, dtype=float)

    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(ptsA[:, 0], ptsA[:, 1], ptsA[:, 2], s=point_size, color=model_color[0], alpha=0.6, linewidths=0, label=idA or "A")
    ax.scatter(ptsB[:, 0], ptsB[:, 1], ptsB[:, 2], s=point_size, color=model_color[1], alpha=0.6, linewidths=0, label=idB or "B")

    best = np.argmax(P, axis=1)
    conf = P[np.arange(len(P)), best]
    order = np.argsort(-conf)
    idx = order if keep_all else order[: min(n_sampling, len(order))]
    if distance_threshold is not None:
        d = np.linalg.norm(ptsA[idx] - ptsB[best[idx]], axis=1)
        idx = idx[d <= distance_threshold]
    for i in idx:
        j = best[i]
        ax.plot([ptsA[i, 0], ptsB[j, 0]], [ptsA[i, 1], ptsB[j, 1]], [ptsA[i, 2], ptsB[j, 2]],
                color=line_color, alpha=line_alpha, lw=0.5)
    ax.legend(frameon=False, fontsize=8)
    ax.set_axis_off()
    if filename:
        fig.savefig(filename, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return filename
    return fig


def pairwise_exp_similarity(
    adataA,
    adataB,
    cells: Union[int, str, list],
    layer: str = "X",
    spatial_key: str = "spatial",
    dissimilarity: str = "both",
    beta2: float = 0.5,
    colormap: str = "viridis",
    star_cell_color: str = "red",
    model_size: float = 5.0,
    star_cell_size: float = 40.0,
    filename: Optional[str] = None,
    **kwargs,
):
    """For chosen cells of slice A, color slice B by the expression-based
    assignment probability exp(-d/(2*beta2)) under each requested metric
    (parity: reference pairwise_align_plots.py:349 `pairwise_exp_similarity`;
    pyvista scenes become a matplotlib panel grid here). Returns the figure."""
    from ...alignment.methods.math import calc_distance

    def _X(a):
        X = a.layers[layer] if layer != "X" else a.X
        X = X.toarray() if hasattr(X, "toarray") else np.asarray(X)
        return np.asarray(X, dtype=float)

    X_A, X_B = _X(adataA), _X(adataB)
    if isinstance(cells, (int, str)):
        cells = [cells]
    cell_idx = [list(adataA.obs_names).index(c) if isinstance(c, str) else int(c) for c in cells]
    metrics = ["euc", "kl"] if dissimilarity == "both" else [dissimilarity]
    sims = {}
    for m in metrics:
        [D] = calc_distance(X_A[cell_idx], X_B, metric=m)
        sims[m] = np.exp(-np.asarray(D, dtype=float) / (2 * beta2))

    ptsA = np.asarray(adataA.obsm[spatial_key], dtype=float)
    ptsB = np.asarray(adataB.obsm[spatial_key], dtype=float)
    nrow, ncol = len(cell_idx), len(metrics)
    fig, axes = plt.subplots(nrow, ncol, figsize=(4 * ncol, 4 * nrow), squeeze=False)
    for r, ci in enumerate(cell_idx):
        for c, m in enumerate(metrics):
            ax = axes[r][c]
            sc = ax.scatter(ptsB[:, 0], ptsB[:, 1], c=sims[m][r], s=model_size,
                            cmap=resolve_cmap(colormap), linewidths=0, **kwargs)
            ax.scatter([ptsA[ci, 0]], [ptsA[ci, 1]], marker="*", s=star_cell_size,
                       color=star_cell_color, zorder=3)
            ax.set_title(f"cell {ci} ({m})", fontsize=9)
            ax.set_aspect("equal")
            ax.set_axis_off()
            plt.colorbar(sc, ax=ax, shrink=0.7)
    if filename:
        fig.savefig(filename, dpi=150, bbox_inches="tight")
        plt.close(fig)
        return filename
    return fig


def pairwise_iteration(
    adataA=None,
    adataB=None,
    iter_key_added: str = "iter_spatial",
    spatial_key: str = "spatial",
    filename: str = "pairwise_iteration.gif",
    fps: int = 10,
    point_size: float = 3.0,
    **kwargs,
):
    """Animate the moving slice's positions over EM iterations stored in
    `.uns[iter_key_added]` (the reference iter_added dict
    {key: {it: coords}, "sigma2": {it: s2}}, or a plain list of snapshots)
    (parity: reference pairwise_align_plots.py:540)."""
    from matplotlib import animation

    frames = _iter_frames(adataA.uns[iter_key_added])
    fixed = np.asarray(adataB.obsm[spatial_key], dtype=float)[:, :2]
    fig, ax = plt.subplots(figsize=(5, 5))
    allp = np.concatenate([fixed] + frames)
    ax.set_xlim(allp[:, 0].min(), allp[:, 0].max())
    ax.set_ylim(allp[:, 1].min(), allp[:, 1].max())
    ax.set_aspect("equal")
    ax.scatter(fixed[:, 0], fixed[:, 1], s=point_size, color="tab:blue", linewidths=0)
    mv = ax.scatter(frames[0][:, 0], frames[0][:, 1], s=point_size, color="tab:red", linewidths=0)

    def update(i):
        mv.set_offsets(frames[i])
        ax.set_title(f"iteration {i}")
        return (mv,)

    anim = animation.FuncAnimation(fig, update, frames=len(frames), blit=True)
    anim.save(filename, writer=animation.PillowWriter(fps=fps))
    plt.close(fig)
    return filename


def pairwise_iteration_panel(
    adataA=None,
    adataB=None,
    iter_key_added: str = "iter_spatial",
    spatial_key: str = "spatial",
    ncols: int = 4,
    point_size: float = 2.0,
    filename: Optional[str] = None,
    save_show_or_return: str = "return",
    save_kwargs: Optional[dict] = None,
    **kwargs,
):
    """Grid of EM-iteration snapshots (parity: reference
    pairwise_align_plots.py:813)."""
    frames = _iter_frames(adataA.uns[iter_key_added])
    if len(frames) > ncols * ncols:  # subsample a panel-sized selection
        idx = np.linspace(0, len(frames) - 1, ncols * ncols).astype(int)
        frames = [frames[i] for i in idx]
    fixed = np.asarray(adataB.obsm[spatial_key], dtype=float)[:, :2]
    n = len(frames)
    ncols = min(ncols, n)
    nrows = int(np.ceil(n / ncols))
    fig, axes = plt.subplots(nrows, ncols, figsize=(2.5 * ncols, 2.5 * nrows), squeeze=False)
    flat = axes.ravel()
    for i, f in enumerate(frames):
        flat[i].scatter(fixed[:, 0], fixed[:, 1], s=point_size, color="tab:blue", linewidths=0)
        flat[i].scatter(f[:, 0], f[:, 1], s=point_size, color="tab:red", linewidths=0)
        flat[i].set_title(f"iter {i}", fontsize=8)
        flat[i].set_aspect("equal")
        flat[i].set_xticks([])
        flat[i].set_yticks([])
    for j in range(n, len(flat)):
        flat[j].axis("off")
    if filename:
        fig.savefig(filename, dpi=150, bbox_inches="tight")
    return save_return_show_fig_utils(save_show_or_return, False, None, "pairwise_iteration_panel", save_kwargs, n, fig, list(flat[:n]))
