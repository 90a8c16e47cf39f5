"""Label attachment for 3D models (capability parity: reference
tdr/models/utilities/label_utils.py add_model_labels)."""

from __future__ import annotations

from typing import Optional, Union

import numpy as np


def add_model_labels(
    model,
    labels: np.ndarray,
    key_added: str = "groups",
    where: str = "point_data",
    colormap: Union[str, list, dict, None] = "rainbow",
    alphamap: Union[float, list, dict, None] = 1.0,
    mask_color: str = "gainsboro",
    mask_alpha: float = 0.0,
    inplace: bool = False,
):
    """Attach per-point labels (and a resolved RGBA column
    f'{key_added}_rgba') to a model (parity: reference label_utils.py)."""
    import matplotlib.pyplot as plt
    from matplotlib.colors import to_rgba

    m = model if inplace else model.copy()
    labels = np.asarray(labels)
    m.point_data[key_added] = labels

    if np.issubdtype(labels.dtype, np.number):
        lab = labels.astype(float)
        span = np.ptp(lab) + 1e-12
        cmap = plt.get_cmap(colormap if isinstance(colormap, str) else "rainbow")
        rgba = cmap((lab - lab.min()) / span)
    else:
        cats = list(dict.fromkeys(map(str, labels)))
        if isinstance(colormap, dict):
            mapping = {c: to_rgba(colormap.get(c, mask_color)) for c in cats}
        else:
            cmap = plt.get_cmap(colormap if isinstance(colormap, str) else "rainbow")
            mapping = {c: cmap(i / max(len(cats) - 1, 1)) for i, c in enumerate(cats)}
        rgba = np.asarray([mapping[str(l)] for l in labels])
        mask = np.asarray([str(l) == "mask" for l in labels])
        if mask.any():
            rgba[mask] = to_rgba(mask_color, alpha=mask_alpha)
    if isinstance(alphamap, (int, float)):
        rgba[:, 3] = rgba[:, 3] * float(alphamap)
    m.point_data[f"{key_added}_rgba"] = rgba
    return m if not inplace else None
