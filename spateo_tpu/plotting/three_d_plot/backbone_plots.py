"""Backbone visualization (capability parity: reference
spateo/plotting/static/three_d_plot/backbone_plots.py:16 `backbone`)."""

from __future__ import annotations

from typing import Optional, Sequence, Union

from .three_dims_plots import three_d_plot


def backbone(
    backbone_model,
    backbone_model_size: Union[float, Sequence[float]] = 8.0,
    backbone_colormap: Optional[str] = None,
    backbone_model_color: str = "orangered",
    bg_model=None,
    bg_key: Optional[str] = None,
    bg_model_size: Union[float, Sequence[float]] = 2.0,
    bg_colormap: Optional[str] = "rainbow",
    bg_model_color: Optional[str] = None,
    bg_opacity: float = 0.3,
    filename: Optional[str] = None,
    jupyter: Union[bool, str] = False,
    **kwargs,
):
    """Plot a SimplePPT/PrinCurve backbone over its source point cloud
    (parity: reference backbone_plots.py:16). `backbone_model` is the
    LineModel from st.tdr.construct_backbone; `bg_model` the cells."""
    models = []
    styles = []
    sizes = []
    cmaps = []
    keys = []
    opac = []
    if bg_model is not None:
        models.append(bg_model)
        styles.append("points")
        sizes.append(bg_model_size)
        cmaps.append(bg_colormap)
        keys.append(bg_key)
        opac.append(bg_opacity)
    models.append(backbone_model)
    styles.append("wireframe" if hasattr(backbone_model, "faces") else "points")
    sizes.append(backbone_model_size)
    cmaps.append(backbone_colormap)
    keys.append(None)
    opac.append(1.0)
    return three_d_plot(
        models, key=keys, filename=filename, jupyter=jupyter, colormap=cmaps,
        opacity=opac, model_style=styles, model_size=sizes, **kwargs,
    )
