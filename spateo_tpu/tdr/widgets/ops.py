"""Headless model-editing operations (capability parity surface: reference
spateo/tdr/widgets/{clip,pick,slice}.py — the pyvista interactive widgets'
underlying geometry ops, applicable without a display)."""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple, Union

import numpy as np

from ..models.mesh_core import Mesh, PointCloud


def _subset(model: PointCloud, keep: np.ndarray) -> PointCloud:
    out = PointCloud(model.points[keep], {k: np.asarray(v)[keep] for k, v in model.point_data.items()})
    return out


def clip_models(
    model: PointCloud,
    plane_origin: Optional[np.ndarray] = None,
    plane_normal: np.ndarray = (1.0, 0.0, 0.0),
    invert: bool = False,
) -> PointCloud:
    """Clip a model by a plane (parity surface: widgets/clip.py:62)."""
    origin = np.asarray(plane_origin if plane_origin is not None else model.points.mean(0), float)
    normal = np.asarray(plane_normal, float)
    side = (model.points - origin) @ normal >= 0
    return _subset(model, ~side if invert else side)


def slice_models(
    model: PointCloud,
    axis: Union[int, str] = 0,
    n_slices: int = 10,
) -> List[PointCloud]:
    """Cut a model into parallel slabs (parity surface: widgets/slice.py:124)."""
    axis = {"x": 0, "y": 1, "z": 2}.get(axis, axis)
    vals = model.points[:, axis]
    edges = np.linspace(vals.min(), vals.max() + 1e-9, n_slices + 1)
    return [_subset(model, (vals >= a) & (vals < b)) for a, b in zip(edges[:-1], edges[1:])]


def pick_models(
    model: PointCloud,
    key: str,
    picked_groups: Union[str, list],
) -> PointCloud:
    """Select sub-model by group labels (parity surface: widgets/pick.py:14)."""
    groups = np.asarray(model.point_data[key]).astype(str)
    picked = [picked_groups] if isinstance(picked_groups, str) else list(picked_groups)
    return _subset(model, np.isin(groups, [str(g) for g in picked]))


def interactive_pick(model: PointCloud, key: str = "groups", predicate: Optional[Callable[[np.ndarray], np.ndarray]] = None) -> PointCloud:
    """Programmatic stand-in for the interactive picker: select by a
    coordinate predicate (the reference's display-based picker is a non-goal
    headless)."""
    if predicate is None:
        return model.copy()
    keep = np.asarray(predicate(model.points), dtype=bool)
    return _subset(model, keep)
