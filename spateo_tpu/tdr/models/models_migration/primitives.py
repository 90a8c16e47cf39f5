"""Line/arrow model primitives (capability parity: reference
spateo/tdr/models/models_migration/ line/arrow builders) — pyvista-free
polyline containers."""

from __future__ import annotations

from typing import List, Optional, Tuple, Union

import numpy as np

from ..mesh_core import PointCloud


class LineModel(PointCloud):
    """Polyline set: points + [E, 2] segment indices."""

    def __init__(self, points, lines, point_data=None):
        super().__init__(points, point_data)
        self.lines = np.asarray(lines, dtype=int)


def construct_line(start_point: np.ndarray, end_point: np.ndarray) -> LineModel:
    pts = np.stack([np.asarray(start_point, float), np.asarray(end_point, float)])
    return LineModel(pts, np.array([[0, 1]]))


def construct_lines(points: np.ndarray, edges: np.ndarray) -> LineModel:
    return LineModel(np.asarray(points, float), np.asarray(edges, int))


def construct_arrow(start_point: np.ndarray, direction: np.ndarray, scale: float = 1.0) -> LineModel:
    """An arrow as a shaft polyline + head segments."""
    start = np.asarray(start_point, float)
    d = np.asarray(direction, float) * scale
    tip = start + d
    # head: two short back-swept segments in a plane orthogonal-ish to d
    norm = np.linalg.norm(d) + 1e-12
    ortho = np.cross(d, [0, 0, 1.0]) if len(d) == 3 else np.array([-d[1], d[0]])
    if np.linalg.norm(ortho) < 1e-9:
        ortho = np.cross(d, [0, 1.0, 0])
    ortho = ortho / (np.linalg.norm(ortho) + 1e-12) * 0.15 * norm
    back = tip - 0.25 * d
    pts = np.stack([start, tip, back + ortho, back - ortho])
    lines = np.array([[0, 1], [1, 2], [1, 3]])
    return LineModel(pts, lines)


def construct_arrows(
    start_points: np.ndarray,
    direction: np.ndarray,
    arrows_scale: Optional[np.ndarray] = None,
    n_sampling: Optional[int] = None,
    sampling_method: str = "random",
    factor: float = 1.0,
    key_added: str = "V",
) -> Tuple[LineModel, Optional[str]]:
    """Arrow field from per-point vectors."""
    start_points = np.asarray(start_points, float)
    direction = np.asarray(direction, float)
    if n_sampling:
        from ....alignment.methods.sampling import sample

        idx = sample(start_points, n_sampling, method=sampling_method)
        start_points, direction = start_points[idx], direction[idx]
    scale = np.ones(len(start_points)) if arrows_scale is None else np.asarray(arrows_scale, float)
    all_pts, all_lines, vmag = [], [], []
    offset = 0
    for p, d, s in zip(start_points, direction, scale):
        a = construct_arrow(p, d, scale=factor * s)
        all_pts.append(a.points)
        all_lines.append(a.lines + offset)
        vmag.extend([np.linalg.norm(d)] * len(a.points))
        offset += len(a.points)
    model = LineModel(np.concatenate(all_pts), np.concatenate(all_lines))
    model[key_added] = np.asarray(vmag)
    return model, None


def generate_edges(points1: np.ndarray, points2: np.ndarray):
    """Pairwise connecting segments between two matched point sets
    (parity: reference models_migration/line_model.py generate_edges)."""
    points1 = np.asarray(points1, float)
    points2 = np.asarray(points2, float)
    assert points1.shape == points2.shape
    n = len(points1)
    pts = np.concatenate([points1, points2], axis=0)
    edges = np.stack([np.arange(n), np.arange(n) + n], axis=1)
    return pts, edges


def construct_align_lines(
    model1_points: np.ndarray,
    model2_points: np.ndarray,
    key_added: str = "check_alignment",
    label: str = "align_mapping",
    **kwargs,
) -> LineModel:
    """Mapping lines between two aligned models (parity: reference
    line_model.py construct_align_lines)."""
    pts, edges = generate_edges(model1_points, model2_points)
    m = LineModel(pts, edges)
    m.point_data[key_added] = np.asarray([label] * len(pts))
    return m


def construct_axis_line(
    axis_points: np.ndarray,
    key_added: str = "axis",
    label: str = "axis_line",
    **kwargs,
) -> LineModel:
    """Polyline through ordered axis points (parity: reference
    line_model.py construct_axis_line)."""
    axis_points = np.asarray(axis_points, float)
    edges = np.stack([np.arange(len(axis_points) - 1), np.arange(1, len(axis_points))], axis=1)
    m = LineModel(axis_points, edges)
    m.point_data[key_added] = np.asarray([label] * len(axis_points))
    return m
