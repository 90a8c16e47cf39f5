"""3D reconstruction correction against a reference mesh
(capability parity: reference spateo/alignment/methods/
morpho_mesh_correction.py:39 `Mesh_correction` + mesh_correction_utils.py).

The per-slice rigid drift left by sequential pairwise alignment is corrected
by registering slice contours to the iso-z sections of a whole-organ mesh:
a 5-variable MRF (3 rotations, z-translation, scaling) over discretized
labels is solved by the native C++ solver in `spateo_tpu.native`
(the reference links a compiled `libfastpd`; ours is exact for this problem
size), inside a simulated-annealing refinement loop.

Note: the reference's `perform_correction` calls an `_eliminate_shift`
helper that does not exist anywhere in its codebase (it would NameError if
reached); here the per-slice correction is completed: each slice contour is
ICP-registered to the corrected mesh's section at its z-height and the
resulting rigid transform is applied to the slice coordinates.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Literal, Optional, Tuple, Union

import numpy as np
from scipy.spatial import cKDTree

from ...logging import logger_manager as lm
from ..utils import _iteration


# ---------------------------------------------------------------------------
# geometry helpers
# ---------------------------------------------------------------------------


def _transform_points(
    points: np.ndarray,
    rotation: Union[np.ndarray, list],
    translation: Union[float, np.ndarray],
    scaling: float,
) -> np.ndarray:
    """Rotate (Euler xyz, degrees) about the centroid, scale, then shift z
    (parity: mesh_correction_utils.py:27)."""
    points = np.asarray(points, float)
    rot = np.deg2rad(np.asarray(rotation, float).ravel())
    cx, cy, cz = np.cos(rot)
    sx, sy, sz = np.sin(rot)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    R = Rz @ Ry @ Rx
    center = points.mean(0)
    out = (points - center) * float(scaling) @ R.T + center
    out[:, 2] += float(np.asarray(translation).ravel()[0] if np.ndim(translation) else translation)
    return out


def _extract_contour_alpha_shape(points: np.ndarray, alpha: float = 0.5) -> List[np.ndarray]:
    """Slice contour via the alpha-shape concave hull
    (parity: mesh_correction_utils.py:159; shapely/alphashape replaced by
    the framework's Delaunay alpha shape)."""
    from ...io.bbs import alpha_shape

    pts = np.asarray(points, float)[:, :2]
    rings, _ = alpha_shape(pts[:, 0], pts[:, 1], alpha=alpha)
    return [np.asarray(r, float) for r in rings if len(r) >= 3]


def _extract_contour_opencv(points: np.ndarray, average_n: float = 0.2, kernel_size: Optional[int] = None) -> List[np.ndarray]:
    """Raster-based contour: bin points to a grid, close/open, trace the
    boundary (parity surface: mesh_correction_utils.py:95 without cv2 —
    boundary pixels of the filled mask are returned as an ordered ring)."""
    pts = np.asarray(points, float)[:, :2]
    mins, maxs = pts.min(0), pts.max(0)
    span = np.maximum(maxs - mins, 1e-9)
    n_px = int(np.sqrt(len(pts) / max(average_n, 1e-6)))
    n_px = max(min(n_px, 512), 16)
    ij = np.clip(((pts - mins) / span * (n_px - 1)).astype(int), 0, n_px - 1)
    grid = np.zeros((n_px, n_px), bool)
    grid[ij[:, 0], ij[:, 1]] = True
    k = kernel_size or max(n_px // 32, 3)
    from scipy import ndimage

    grid = ndimage.binary_closing(grid, structure=np.ones((k, k)))
    grid = ndimage.binary_fill_holes(grid)
    er = ndimage.binary_erosion(grid)
    boundary = grid & ~er
    by, bx = np.nonzero(boundary)
    if len(by) < 3:
        return []
    coords = np.stack([by, bx], 1).astype(float) / (n_px - 1) * span + mins
    # order boundary points by polar angle around the centroid
    c = coords.mean(0)
    order = np.argsort(np.arctan2(coords[:, 1] - c[1], coords[:, 0] - c[0]))
    return [coords[order]]


def _smooth_contours(vertex: List[np.ndarray], window_size: int = 5, iterations: int = 1) -> List[np.ndarray]:
    """Circular moving-average smoothing (parity:
    mesh_correction_utils.py:190)."""
    out = []
    for v in vertex:
        v = np.asarray(v, float)
        for _ in range(iterations):
            if len(v) < window_size:
                break
            pad = window_size // 2
            vp = np.concatenate([v[-pad:], v, v[:pad]])
            kern = np.ones(window_size) / window_size
            v = np.stack([np.convolve(vp[:, d], kern, mode="valid") for d in range(v.shape[1])], 1)
        out.append(v)
    return out


def _extract_contours_from_mesh(points: np.ndarray, faces: np.ndarray, z_values: np.ndarray) -> Tuple[List[np.ndarray], bool]:
    """Iso-z sections of a triangle mesh: each triangle edge crossing the
    plane contributes its interpolated intersection point (parity:
    mesh_correction_utils.py:224, pyvista `.contour` replaced by a
    vectorized edge-plane intersection)."""
    P = np.asarray(points, float)
    F = np.asarray(faces, int)
    tri = P[F]  # [T, 3, 3]
    sections = []
    ok = True
    edges = [(0, 1), (1, 2), (2, 0)]
    for z in np.asarray(z_values, float).ravel():
        pts = []
        for a, b in edges:
            za, zb = tri[:, a, 2], tri[:, b, 2]
            cross = (za - z) * (zb - z) < 0
            if cross.any():
                t = (z - za[cross]) / (zb[cross] - za[cross])
                p = tri[cross, a, :2] + t[:, None] * (tri[cross, b, :2] - tri[cross, a, :2])
                pts.append(p)
        sec = np.concatenate(pts, 0) if pts else np.zeros((0, 2))
        if len(sec) == 0:
            ok = False
        sections.append(sec)
    return sections, ok


def ICP(
    contour_1: np.ndarray,
    contour_2: np.ndarray,
    max_iter: int = 20,
    error_threshold: float = 1e-6,
    inlier_threshold: float = 0.1,
    subsample: int = 500,
    allow_rotation: bool = False,
    seed: int = 0,
) -> Tuple[float, float, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """2D ICP of model points (contour_2) onto data points (contour_1);
    returns (gamma, 0, translation, contour_1, aligned_contour_2, R)
    with gamma the fraction of model points within 0.05 of a data point in
    the normalized frame (parity: mesh_correction_utils.py:404)."""
    rng = np.random.default_rng(seed)
    c1 = np.asarray(contour_1, float)
    c2 = np.asarray(contour_2, float)
    if subsample > 0 and len(c1) > subsample:
        c1 = c1[rng.choice(len(c1), subsample, replace=False)]
    if subsample > 0 and len(c2) > subsample:
        c2 = c2[rng.choice(len(c2), subsample, replace=False)]
    D = c1.shape[1]
    m1 = (c1.max(0) + c1.min(0)) / 2
    m2 = (c2.max(0) + c2.min(0)) / 2
    c1d = c1 - m1
    c2d = c2 - m2
    scale = (np.sqrt((c1d**2).sum() / len(c1d)) + np.sqrt((c2d**2).sum() / len(c2d))) / 2
    scale = max(scale, 1e-12)
    c1d, c2d = c1d / scale, c2d / scale

    T2 = c2d
    R_total = np.eye(D)
    t_total = np.zeros(D)
    prev_err = np.inf
    tree = cKDTree(c1d)
    dist = np.full(len(T2), np.inf)
    for _ in range(max_iter):
        dist, idx = tree.query(T2)
        inl = dist < inlier_threshold
        if inl.sum() < 3:
            break
        src = T2[inl]
        dst = c1d[idx[inl]]
        sm, dm = src.mean(0), dst.mean(0)
        if allow_rotation:
            H = (src - sm).T @ (dst - dm)
            U, _, Vt = np.linalg.svd(H)
            R = Vt.T @ U.T
            if np.linalg.det(R) < 0:
                Vt[-1] *= -1
                R = Vt.T @ U.T
            t = dm - R @ sm
        else:
            R = np.eye(D)
            t = dm - sm
        T2 = T2 @ R.T + t
        R_total = R @ R_total
        t_total = R @ t_total + t
        err = dist[inl].mean()
        if abs(prev_err - err) < error_threshold:
            break
        prev_err = err
    dist, _ = tree.query(T2)
    gamma = float((dist < 0.05).sum() / len(T2))
    aligned = scale * T2 + m1
    return gamma, 0.0, t_total * scale + m1 - m2, c1, aligned, R_total


def _calculate_loss(
    contours: List[np.ndarray],
    mesh_points: np.ndarray,
    mesh_faces: np.ndarray,
    transformation: np.ndarray,
    z_values: np.ndarray,
    method: Literal["CPD", "ICP"] = "ICP",
) -> float:
    """Average (1 - gamma) over slices, 1e6 when any z plane misses the mesh
    (parity: mesh_correction_utils.py:371)."""
    tp = _transform_points(mesh_points, transformation[:3], transformation[3], transformation[4])
    sections, ok = _extract_contours_from_mesh(tp, mesh_faces, z_values)
    if not ok:
        return 1e6
    cost = 0.0
    for c, mc in zip(contours, sections):
        gamma, *_ = ICP(c, mc, allow_rotation=True, subsample=200, max_iter=10)
        cost += 1.0 - gamma
    return cost / max(len(contours), 1)


# ---------------------------------------------------------------------------
# discrete optimization scaffolding
# ---------------------------------------------------------------------------


def _generate_labeling(max_value: float, number_of_steps: int, scale_type: str = "linear") -> np.ndarray:
    """Symmetric label ladder with 0 (or 1, in log scale) first
    (parity: mesh_correction_utils.py:246)."""
    if scale_type == "linear":
        vals = np.linspace(-max_value, max_value, number_of_steps)
        vals = np.concatenate([[0.0], vals[vals != 0]])[:number_of_steps]
    elif scale_type == "log":
        vals = np.exp(np.linspace(-np.log(max_value), np.log(max_value), number_of_steps))
        vals = np.concatenate([[1.0], vals[vals != 1.0]])[:number_of_steps]
    else:
        raise ValueError(f"Unknown scale_type: {scale_type}")
    return vals


def _update_parameter(transformation_labels: np.ndarray, parameters: Dict) -> np.ndarray:
    transformation_labels = np.asarray(transformation_labels, float).copy()
    transformation_labels[:, :3] += np.asarray(parameters["rotation"], float)
    transformation_labels[:, 3] += float(parameters["translation"])
    transformation_labels[:, 4] *= float(parameters["scaling"])
    return transformation_labels


def _make_pairs(nVars: int = 5) -> np.ndarray:
    return np.array(list(itertools.combinations(np.arange(nVars), 2)), np.int32)


def _getUnaries(L: int, N: int = 5) -> np.ndarray:
    return np.ones((L, N), np.float32)


def _get_binary_values(contours, mesh_points, mesh_faces, z_values, pair, transformation_labels) -> np.ndarray:
    L = transformation_labels.shape[0]
    default = transformation_labels[0].copy()
    out = np.zeros((L, L), np.float32)
    for a in range(L):
        for b in range(L):
            params = default.copy()
            params[pair[0]] = transformation_labels[a, pair[0]]
            params[pair[1]] = transformation_labels[b, pair[1]]
            out[a, b] = _calculate_loss(contours, mesh_points, mesh_faces, params, z_values)
    return out


# ---------------------------------------------------------------------------
# the driver class
# ---------------------------------------------------------------------------


class Mesh_correction:
    """Correct per-slice rigid drift in a 3D reconstruction using a
    reference mesh (parity surface: reference morpho_mesh_correction.py:39).

    `mesh` is a `spateo_tpu.tdr.models.mesh_core.Mesh` (points + faces).
    """

    def __init__(
        self,
        slices: List,
        z_heights: Union[List, np.ndarray],
        mesh,
        spatial_key: str = "spatial",
        key_added: str = "align_spatial",
        normalize_spatial: bool = False,
        init_rotation: Optional[np.ndarray] = None,
        init_translation: float = 0.0,
        init_scaling: float = 1.0,
        max_rotation_angle: float = 180,
        max_translation_scale: float = 0.5,
        max_scaling: float = 1.5,
        min_rotation_angle: float = 10,
        min_translation_scale: float = 1,
        min_scaling: float = 1.1,
        label_num: int = 15,
        fastpd_iter: int = 100,
        max_iter: int = 10,
        anneal_rate: float = 0.7,
        multi_processing: bool = False,
        subsample_slices: Optional[int] = None,
        verbose: bool = False,
    ) -> None:
        self.n_slices = len(slices)
        if not all(spatial_key in s.obsm for s in slices):
            raise ValueError("All slices must have the same spatial key in the '.obsm' attribute.")
        self.slices = slices
        self.spatial_key = spatial_key
        self.slices_spatial = [np.asarray(s.obsm[spatial_key], float)[:, :2] for s in slices]

        if z_heights is None:
            raise ValueError("z_heights must be provided.")
        self.z_heights = np.asarray(z_heights, float)
        if len(np.unique(self.z_heights)) != len(self.z_heights):
            raise ValueError("z_heights must be unique value.")
        if len(self.z_heights) != self.n_slices:
            raise ValueError("z_heights must have the same length as the number of slices.")

        self.mesh_points = np.asarray(mesh.points, float).copy()
        self.mesh_faces = np.asarray(mesh.faces, int).copy()
        self.key_added = key_added
        self.normalize_spatial = normalize_spatial
        self.set_init_parameters(init_rotation, init_translation, init_scaling)
        self.normalize_mesh_spatial_coordinates()

        self.max_rotation_angle = max_rotation_angle
        self.max_translation_scale = max_translation_scale
        self.max_scaling = max_scaling
        self.min_rotation_angle = min_rotation_angle
        self.min_translation_scale = min_translation_scale
        self.min_scaling = min_scaling
        self.label_num = label_num
        self.fastpd_iter = fastpd_iter
        self.max_iter = max_iter
        self.anneal_rate = anneal_rate
        self.subsample_slices = subsample_slices
        self.verbose = verbose
        self.contours: List[Optional[np.ndarray]] = [None] * self.n_slices

    def set_init_parameters(self, init_rotation=None, init_translation=0.0, init_scaling=1.0):
        """Apply an initial guess transformation to the mesh
        (parity: morpho_mesh_correction.py:130)."""
        rot = np.zeros(3) if init_rotation is None else np.asarray(init_rotation, float)
        self.mesh_points = _transform_points(self.mesh_points, rot, init_translation, init_scaling)

    def normalize_mesh_spatial_coordinates(self):
        """Scale/center the mesh to the slices' z range
        (parity: morpho_mesh_correction.py:147)."""
        self.slices_scale = self.z_heights.max() - self.z_heights.min()
        if self.normalize_spatial:
            mesh_scale = self.mesh_points[:, 2].max() - self.mesh_points[:, 2].min()
            slices_mean_z = (self.z_heights.max() + self.z_heights.min()) / 2
            xy = np.concatenate(self.slices_spatial, axis=0)
            slices_mean_xy = (xy.max(0) + xy.min(0)) / 2
            mesh_mean = (self.mesh_points.max(0) + self.mesh_points.min(0)) / 2
            self.mesh_points = (self.mesh_points - mesh_mean) * self.slices_scale / max(mesh_scale, 1e-12)
            self.mesh_points[:, :2] += slices_mean_xy
            self.mesh_points[:, 2] += slices_mean_z

    def extract_contours(
        self,
        method: Literal["opencv", "alpha_shape"] = "alpha_shape",
        n_sampling: Optional[int] = None,
        smoothing: bool = True,
        window_size: int = 5,
        filter_contours: bool = True,
        contour_filter_threshold: int = 20,
        opencv_kwargs: Optional[Dict] = None,
        alpha_shape_kwargs: Optional[Dict] = None,
    ):
        """Extract each slice's outer contour (parity:
        morpho_mesh_correction.py:185)."""
        opencv_kwargs = opencv_kwargs or {}
        alpha_shape_kwargs = alpha_shape_kwargs or {}
        rng = np.random.default_rng(0)
        for i in _iteration(n=self.n_slices, progress_name=f"Extract contours ({method})", verbose=self.verbose):
            pts = self.slices_spatial[i]
            if n_sampling and 0 < n_sampling < len(pts):
                pts = pts[rng.choice(len(pts), n_sampling, replace=False)]
            if method == "opencv":
                cur = _extract_contour_opencv(pts, **opencv_kwargs)
            elif method == "alpha_shape":
                cur = _extract_contour_alpha_shape(pts, **alpha_shape_kwargs)
            else:
                raise NotImplementedError(f"Method {method} is not implemented.")
            if filter_contours:
                cur = [c for c in cur if c.shape[0] >= contour_filter_threshold]
            if smoothing:
                cur = _smooth_contours(cur, window_size)
            self.contours[i] = np.concatenate(cur, axis=0) if cur else np.zeros((0, 2))

    def run_discrete_optimization(self) -> None:
        """Annealed discrete search over the 5 transform parameters
        (parity: morpho_mesh_correction.py:241)."""
        self.max_translation = self.max_translation_scale * self.slices_scale
        if self.subsample_slices and 0 < self.subsample_slices < self.n_slices:
            pick = np.random.default_rng(0).choice(self.n_slices, self.subsample_slices, replace=False)
            self.contours_subsample = [self.contours[i] for i in pick]
            self.z_heights_subsample = self.z_heights[pick]
        else:
            self.contours_subsample = self.contours
            self.z_heights_subsample = self.z_heights

        self.losses = []
        self.transformations = []
        self.best_loss = 1e8
        self.best_transformation = {"rotation": np.zeros(3), "translation": 0.0, "scaling": 1.0}
        lm.main_info(f"Run discrete optimization on {len(self.contours_subsample)} contours", indent_level=1)
        for i in _iteration(n=self.max_iter, progress_name="Discrete optimization", verbose=self.verbose, indent_level=1):
            cur_loss, cur_transformation = self.discrete_optimization_step()
            if self.verbose:
                lm.main_info(f"Iteration {i + 1}/{self.max_iter}, current loss: {cur_loss}", indent_level=2)
            if cur_loss < self.best_loss:
                self.best_loss = cur_loss
                self.best_transformation = cur_transformation
            self.losses.append(cur_loss)
            self.transformations.append(cur_transformation)
            self.max_rotation_angle = max(self.max_rotation_angle * self.anneal_rate, self.min_rotation_angle)
            self.max_translation = max(self.max_translation * self.anneal_rate, self.min_translation_scale * self.slices_scale)
            self.max_scaling = max(self.max_scaling * self.anneal_rate, self.min_scaling)
        lm.main_info(f"Optimization finished. Best loss: {self.best_loss}", indent_level=1)

    def discrete_optimization_step(self) -> Tuple[float, Dict]:
        """One MRF solve over the current label ladder (parity:
        morpho_mesh_correction.py:291; the MRF MAP is computed by the native
        solver in spateo_tpu.native)."""
        from ...native import fastpd

        transformation_labels = self.generate_labels()
        pairs = _make_pairs()
        u = _getUnaries(self.label_num)
        blist = [
            _get_binary_values(
                self.contours_subsample, self.mesh_points, self.mesh_faces,
                self.z_heights_subsample, pair, transformation_labels,
            )
            for pair in pairs
        ]
        labels = fastpd(u, blist, pairs, self.fastpd_iter)
        parameters = np.array([transformation_labels[labels[i], i] for i in range(len(labels))])
        loss = _calculate_loss(
            self.contours_subsample, self.mesh_points, self.mesh_faces,
            parameters, self.z_heights_subsample, "ICP",
        )
        return loss, {"rotation": parameters[:3], "translation": parameters[3], "scaling": parameters[4]}

    def generate_labels(self) -> np.ndarray:
        """Label ladders centered on the current best transform
        (parity: morpho_mesh_correction.py:330)."""
        rotation_labels = _generate_labeling(self.max_rotation_angle, self.label_num)
        translation_labels = _generate_labeling(self.max_translation, self.label_num)
        scaling_labels = _generate_labeling(self.max_scaling, self.label_num, "log")
        transformation_labels = np.array(
            [rotation_labels, rotation_labels, rotation_labels, translation_labels, scaling_labels]
        ).T
        return _update_parameter(transformation_labels, self.best_transformation)

    def perform_correction(self):
        """Apply the best mesh transform, then rigidly snap each slice onto
        its mesh section (completes the reference's unfinished
        `perform_correction`, morpho_mesh_correction.py:349)."""
        self.mesh_points = _transform_points(
            self.mesh_points,
            self.best_transformation["rotation"],
            self.best_transformation["translation"],
            self.best_transformation["scaling"],
        )
        sections, ok = _extract_contours_from_mesh(self.mesh_points, self.mesh_faces, self.z_heights)
        for i, (s, contour, section) in enumerate(zip(self.slices, self.contours, sections)):
            pts = np.asarray(s.obsm[self.spatial_key], float)[:, :2]
            if contour is None or len(contour) < 3 or len(section) < 3:
                corrected = pts
            else:
                # register the SLICE contour onto the MESH section; apply the
                # same rigid transform to all cells of the slice
                _, _, t, _, _, R = ICP(section, contour, allow_rotation=True, subsample=500)
                center = (contour.max(0) + contour.min(0)) / 2
                corrected = (pts - center) @ R.T + center + t
            out = np.concatenate([corrected, np.full((len(corrected), 1), self.z_heights[i])], axis=1)
            s.obsm[self.key_added] = out
        return [np.asarray(s.obsm[self.key_added]) for s in self.slices]
