"""Network graph plotting (capability parity: reference
spateo/plotting/static/networks.py:12 `PlotNetwork`, :419 `plot_network` —
the reference renders interactive plotly FigureWidgets; here networkx
layouts are drawn with matplotlib, keeping the size/color/label semantics)."""

from __future__ import annotations

from typing import List, Optional, Union

import matplotlib.pyplot as plt
import numpy as np

from .utils import resolve_cmap, save_return_show_fig_utils

_LAYOUTS = {
    "random": "random_layout",
    "circular": "circular_layout",
    "kamada": "kamada_kawai_layout",
    "planar": "planar_layout",
    "spring": "spring_layout",
    "spectral": "spectral_layout",
    "spiral": "spiral_layout",
}


class PlotNetwork:
    """Stateful network renderer (parity surface: reference networks.py:12)."""

    def __init__(self, G, layout: Optional[str] = None):
        import networkx as nx

        self.G = G
        name = _LAYOUTS.get(layout or "spring", "spring_layout")
        self.pos = getattr(nx, name)(G)

    def _node_attr(self, method, default):
        if isinstance(method, (list, np.ndarray)):
            return list(method)
        if isinstance(method, str) and all(method in self.G.nodes[n] for n in self.G.nodes):
            return [self.G.nodes[n][method] for n in self.G.nodes]
        return [default] * self.G.number_of_nodes()

    def draw(
        self,
        ax=None,
        title: str = "",
        size_method="degree",
        color_method="degree",
        node_label: Optional[str] = None,
        nodefont_size: int = 8,
        edge_label: Optional[str] = None,
        edge_thickness_attr: Optional[str] = None,
        edgefont_size: int = 8,
        titlefont_size: int = 16,
        show_colorbar: bool = True,
        colorscale: str = "YlGnBu",
        colorbar_title: Optional[str] = None,
        node_opacity: float = 0.8,
        arrow_size: float = 2,
    ):
        import networkx as nx

        if ax is None:
            _, ax = plt.subplots(figsize=(7, 6))
        if size_method == "degree":
            sizes = np.asarray([self.G.degree(n) for n in self.G.nodes], float)
        else:
            sizes = np.asarray(self._node_attr(size_method, 1.0), float)
        sizes = 80 + 400 * (sizes - sizes.min()) / (np.ptp(sizes) + 1e-12)
        if color_method == "degree":
            cvals = np.asarray([self.G.degree(n) for n in self.G.nodes], float)
        else:
            cvals = self._node_attr(color_method, 0.5)
        numeric = np.issubdtype(np.asarray(cvals).dtype, np.number)

        widths = 1.0
        if edge_thickness_attr is not None:
            w = np.asarray([self.G.edges[e].get(edge_thickness_attr, 1.0) for e in self.G.edges], float)
            widths = 0.5 + 3.0 * (w - w.min()) / (np.ptp(w) + 1e-12)
        nx.draw_networkx_edges(self.G, self.pos, ax=ax, width=widths, alpha=0.5,
                               arrows=self.G.is_directed(), arrowsize=6 * arrow_size, edge_color="#888888")
        if numeric:
            sc = nx.draw_networkx_nodes(self.G, self.pos, ax=ax, node_size=sizes,
                                        node_color=np.asarray(cvals, float), cmap=resolve_cmap(colorscale),
                                        alpha=node_opacity)
            if show_colorbar:
                cb = plt.colorbar(sc, ax=ax, shrink=0.7)
                if colorbar_title:
                    cb.set_label(colorbar_title)
        else:
            nx.draw_networkx_nodes(self.G, self.pos, ax=ax, node_size=sizes, node_color=list(cvals), alpha=node_opacity)
        if node_label:
            labels = {n: (self.G.nodes[n].get(node_label, n) if node_label != "name" else n) for n in self.G.nodes}
            nx.draw_networkx_labels(self.G, self.pos, labels=labels, ax=ax, font_size=nodefont_size)
        if edge_label:
            elabels = {e: self.G.edges[e].get(edge_label, "") for e in self.G.edges}
            nx.draw_networkx_edge_labels(self.G, self.pos, edge_labels=elabels, ax=ax, font_size=edgefont_size)
        ax.set_title(title, fontsize=titlefont_size)
        ax.axis("off")
        return ax


def plot_network(
    G,
    title: str,
    size_method: Union[str, List[float]] = "degree",
    color_method: Union[str, List[str]] = "degree",
    layout: Optional[str] = None,
    node_label: Optional[str] = None,
    node_label_position: str = "top center",
    node_text: Optional[List[str]] = None,
    nodefont_size: int = 8,
    edge_label: Optional[str] = None,
    edge_thickness_attr: Optional[str] = None,
    edge_label_position: str = "middle center",
    edge_text: Optional[List[str]] = None,
    edgefont_size: int = 8,
    titlefont_size: int = 16,
    show_colorbar: bool = True,
    colorscale: str = "YlGnBu",
    colorbar_title: Optional[str] = None,
    node_opacity: float = 0.8,
    arrow_size: float = 2,
    ax=None,
    save_show_or_return: str = "return",
    save_kwargs: Optional[dict] = None,
    **kwargs,
):
    """Intercellular GRN / interaction network plot (parity: reference
    networks.py:419; plotly interactivity replaced by a static matplotlib
    rendering)."""
    pn = PlotNetwork(G, layout=layout)
    ax = pn.draw(
        ax=ax, title=title, size_method=size_method, color_method=color_method,
        node_label=node_label, nodefont_size=nodefont_size, edge_label=edge_label,
        edge_thickness_attr=edge_thickness_attr, edgefont_size=edgefont_size,
        titlefont_size=titlefont_size, show_colorbar=show_colorbar, colorscale=colorscale,
        colorbar_title=colorbar_title, node_opacity=node_opacity, arrow_size=arrow_size,
    )
    return save_return_show_fig_utils(save_show_or_return, False, None, "network", save_kwargs, 1, ax.figure, ax)
