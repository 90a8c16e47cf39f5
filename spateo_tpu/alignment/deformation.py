"""Deformation-grid visualization data
(capability parity: reference spateo/alignment/deformation.py:24 — warps a
line grid through the learned vector field for deformation plots; pyvista-free:
returns plain line-segment arrays consumable by matplotlib)."""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from ..core.anndata import AnnData
from .transform import BA_transform


def grid_deformation(
    model: AnnData,
    spatial_key: str = "spatial",
    vecfld_key: str = "VecFld_morpho",
    key_added: str = "deformation",
    grid_num: int = 25,
    expand_c: float = 0.05,
    grid_density: int = 100,
) -> dict:
    """Build a regular grid over the slice extent and warp each grid line
    through the saved Morpho vector field.

    Returns a dict with 'grid_lines' (list of (P, 2) polylines before warp)
    and 'deformed_lines' (same, after warp); also stored in
    `model.uns[key_added]`.
    """
    assert vecfld_key in model.uns, f"`{vecfld_key}` not found in `.uns` — run morpho_align first."
    vecfld = model.uns[vecfld_key]
    coords = np.asarray(model.obsm[spatial_key], dtype=float)[:, :2]
    mins, maxs = coords.min(0), coords.max(0)
    span = maxs - mins
    mins = mins - expand_c * span
    maxs = maxs + expand_c * span

    xs = np.linspace(mins[0], maxs[0], grid_num)
    ys = np.linspace(mins[1], maxs[1], grid_num)
    dense_x = np.linspace(mins[0], maxs[0], grid_density)
    dense_y = np.linspace(mins[1], maxs[1], grid_density)

    grid_lines: List[np.ndarray] = []
    for x in xs:
        grid_lines.append(np.c_[np.full(grid_density, x), dense_y])
    for y in ys:
        grid_lines.append(np.c_[dense_x, np.full(grid_density, y)])

    deformed_lines = []
    all_pts = np.concatenate(grid_lines)
    warped, _, _ = BA_transform(vecfld, all_pts)
    offset = 0
    for line in grid_lines:
        deformed_lines.append(warped[offset : offset + len(line)])
        offset += len(line)

    out = {"grid_lines": grid_lines, "deformed_lines": deformed_lines}
    model.uns[key_added] = out
    return out
