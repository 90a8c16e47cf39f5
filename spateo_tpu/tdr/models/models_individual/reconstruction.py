"""Oriented-point-cloud surface reconstruction: screened Poisson and
ball pivoting (capability parity: reference
tdr/models/models_individual/mesh_methods.py:289 `ball_pivoting_mesh` and
:343 `poisson_mesh`, which delegate to open3d; open3d is not available, so
both algorithms are implemented natively).

Three genuinely different reconstructions now exist side by side:

* alpha shape (mesh.py `_alpha_shape_3d`) — interpolating, Delaunay-based;
* ball pivoting (here) — interpolating, advancing-front with an empty-ball
  invariant (Bernardini et al. 1999), faithful to
  open3d `create_from_point_cloud_ball_pivoting`;
* screened Poisson (here) — *approximating*: integrates an oriented-normal
  field into a smooth indicator function and extracts its isosurface
  (Kazhdan & Hoppe 2013), faithful in spirit to
  open3d `create_from_point_cloud_poisson`. The reference's octree becomes
  a regular voxel grid (resolution adapted to sampling density, bounded by
  2^depth exactly as the reference documents depth as an upper bound), and
  the sparse multigrid solve becomes a conjugate-gradient solve of the
  screened Poisson operator — a 6-point-stencil matvec that XLA fuses into
  a handful of HBM-bandwidth-bound elementwise passes, jitted end to end.

Normal estimation follows Hoppe et al. 1992: per-point PCA over kNN
neighborhoods, orientation propagated along a minimum spanning tree of the
Riemannian graph, then a global outward flip.
"""

from __future__ import annotations

from collections import deque
from functools import partial
from typing import List, Optional, Tuple, Union

import numpy as np

from ..mesh_core import Mesh

__all__ = [
    "estimate_normals",
    "poisson_reconstruction",
    "ball_pivoting_reconstruction",
]


# ---------------------------------------------------------------------------
# Normal estimation (PCA + MST orientation propagation)
# ---------------------------------------------------------------------------


def estimate_normals(points: np.ndarray, k: int = 16) -> np.ndarray:
    """Consistently oriented unit normals for a point cloud.

    PCA normal per point (smallest eigenvector of the kNN covariance),
    orientation propagated over the minimum spanning tree of the kNN graph
    weighted by 1 - |n_i . n_j| (Hoppe et al. 1992), then globally flipped
    so normals point outward on average.
    """
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import breadth_first_order, minimum_spanning_tree
    from scipy.spatial import cKDTree

    pts = np.asarray(points, float)
    n = len(pts)
    k = int(min(max(k, 4), n))
    tree = cKDTree(pts)
    _, knn = tree.query(pts, k=k)

    nbrs = pts[knn]  # [N, k, 3]
    centered = nbrs - nbrs.mean(axis=1, keepdims=True)
    cov = np.einsum("nki,nkj->nij", centered, centered) / k
    _, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    normals = vecs[:, :, 0]  # smallest -> surface normal direction

    # Riemannian graph over kNN edges, weight = 1 - |n_i . n_j|
    rows = np.repeat(np.arange(n), k - 1)
    cols = knn[:, 1:].ravel()
    w = 1.0 - np.abs(np.einsum("ij,ij->i", normals[rows], normals[cols])) + 1e-9
    g = coo_matrix((w, (rows, cols)), shape=(n, n))
    # symmetrize as the UNION of directed kNN edges (maximum keeps an edge
    # present in either direction; the weight 1-|n_i.n_j| is symmetric, so
    # max of the two directed entries is the true weight). minimum() would
    # DROP every non-mutual edge against the implicit zero, fragmenting the
    # graph on uneven-density clouds.
    g = g.maximum(g.T)
    mst = minimum_spanning_tree(g)
    mst = mst + mst.T

    # propagate orientation by BFS over the MST, one pass per connected
    # component (a kNN graph over separated structures can be disconnected;
    # orienting only the first component would leave the rest with
    # arbitrary PCA signs). Each component roots at its highest point,
    # whose normal is forced to point up (+z).
    from scipy.sparse.csgraph import connected_components

    n_comp, comp = connected_components(mst, directed=False)
    for c in range(n_comp):
        members = np.where(comp == c)[0]
        root = int(members[np.argmax(pts[members, 2])])
        if normals[root, 2] < 0:
            normals[root] = -normals[root]
        order, preds = breadth_first_order(mst, root, directed=False, return_predecessors=True)
        for i in order[1:]:
            p = preds[i]
            if p >= 0 and np.dot(normals[i], normals[p]) < 0:
                normals[i] = -normals[i]
        # per-component outward flip (a global flip would mis-orient every
        # component whose majority vote disagrees with the overall one)
        centroid = pts[members].mean(0)
        if np.mean(np.einsum("ij,ij->i", pts[members] - centroid, normals[members])) < 0:
            normals[members] = -normals[members]
    return normals / np.maximum(np.linalg.norm(normals, axis=1, keepdims=True), 1e-12)


# ---------------------------------------------------------------------------
# Screened Poisson reconstruction
# ---------------------------------------------------------------------------


def _splat_and_solve(pts_g, normals, res: int, screen: float, tol: float, maxiter: int):
    """Device program: trilinear splat of the oriented-normal field, box
    blur, divergence, and CG solve of (-Lap + screen*rho) chi = rhs with
    Dirichlet chi=0 at the grid boundary. Returns (chi, rho)."""
    import jax
    import jax.numpy as jnp

    @partial(jax.jit, static_argnames=("res", "maxiter"))
    def run(pts_g, normals, screen, tol, res, maxiter):
        n = pts_g.shape[0]
        i0 = jnp.clip(jnp.floor(pts_g).astype(jnp.int32), 0, res - 2)
        frac = pts_g - i0

        rho = jnp.zeros((res, res, res), jnp.float32)
        V = jnp.zeros((3, res, res, res), jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    wgt = (
                        (frac[:, 0] if dx else 1 - frac[:, 0])
                        * (frac[:, 1] if dy else 1 - frac[:, 1])
                        * (frac[:, 2] if dz else 1 - frac[:, 2])
                    )
                    ii = (i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz)
                    rho = rho.at[ii].add(wgt)
                    V = V.at[(slice(None),) + ii].add(wgt[None, :] * normals.T)

        def blur(a):  # 3-tap box blur per axis (spreads the field one cell)
            for ax in range(a.ndim - 3, a.ndim):
                p = [(0, 0)] * a.ndim
                p[ax] = (1, 1)
                ap = jnp.pad(a, p)
                sl = [slice(None)] * a.ndim
                out = 0.0
                for s in range(3):
                    sl[ax] = slice(s, s + a.shape[ax])
                    out = out + ap[tuple(sl)]
                a = out / 3.0
            return a

        rho = blur(rho)
        V = blur(V)
        # average (not summed) normal per cell -> indicator gradient ~O(1)
        V = V / jnp.maximum(rho, 1e-8)[None]
        occupied = rho > 1e-4
        V = jnp.where(occupied[None], V, 0.0)

        # divergence, central differences, inward-pointing field
        # (chi: ~0 outside, ~1 inside; grad chi = -outward normal * delta)
        def ddx(a, ax):
            ap = jnp.pad(a, [(1, 1) if i == ax else (0, 0) for i in range(3)])
            sl_p = [slice(None)] * 3
            sl_m = [slice(None)] * 3
            sl_p[ax] = slice(2, None)
            sl_m[ax] = slice(0, -2)
            return 0.5 * (ap[tuple(sl_p)] - ap[tuple(sl_m)])

        div = ddx(-V[0], 0) + ddx(-V[1], 1) + ddx(-V[2], 2)
        srho = screen * rho

        def matvec(x):
            p = jnp.pad(x, 1)
            nbr = (
                p[:-2, 1:-1, 1:-1]
                + p[2:, 1:-1, 1:-1]
                + p[1:-1, :-2, 1:-1]
                + p[1:-1, 2:, 1:-1]
                + p[1:-1, 1:-1, :-2]
                + p[1:-1, 1:-1, 2:]
            )
            return (6.0 + srho) * x - nbr

        rhs = -div + srho * 0.5
        chi, _ = jax.scipy.sparse.linalg.cg(matvec, rhs, tol=tol, maxiter=maxiter)
        return chi, rho

    return run(pts_g, normals, float(screen), float(tol), int(res), int(maxiter))


def _trilinear_sample(field: np.ndarray, pts_g: np.ndarray) -> np.ndarray:
    res = field.shape[0]
    i0 = np.clip(np.floor(pts_g).astype(int), 0, res - 2)
    f = pts_g - i0
    out = np.zeros(len(pts_g))
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                w = (
                    (f[:, 0] if dx else 1 - f[:, 0])
                    * (f[:, 1] if dy else 1 - f[:, 1])
                    * (f[:, 2] if dz else 1 - f[:, 2])
                )
                out += w * field[i0[:, 0] + dx, i0[:, 1] + dy, i0[:, 2] + dz]
    return out


def poisson_reconstruction(
    points: np.ndarray,
    normals: Optional[np.ndarray] = None,
    depth: int = 8,
    width: float = 0,
    scale: float = 1.1,
    linear_fit: bool = False,
    density_threshold: Optional[float] = None,
    screen: float = 4.0,
    max_resolution: int = 128,
    cg_tol: float = 1e-5,
) -> Mesh:
    """Screened Poisson surface reconstruction on a regular grid.

    Parity surface: reference mesh_methods.py:343 `poisson_mesh` (open3d
    `create_from_point_cloud_poisson`): `depth` bounds the grid resolution
    at 2^depth (the solver adapts to sampling density below that bound,
    as the reference documents), `width` optionally sets the target cell
    width instead, `scale` is the ratio of the reconstruction cube to the
    samples' bounding cube, and `density_threshold` removes low-support
    vertices by density quantile exactly as the reference does.
    `linear_fit` is accepted for signature parity (iso-vertex placement
    here is always linear interpolation, which is what linear_fit=True
    requests).
    """
    pts = np.asarray(points, float)
    if normals is None:
        normals = estimate_normals(pts)
    normals = np.asarray(normals, float)

    # reconstruction cube
    lo, hi = pts.min(0), pts.max(0)
    center = (lo + hi) / 2
    extent = float((hi - lo).max()) * float(scale)
    extent = max(extent, 1e-9)

    # resolution: adapt to sampling density, bounded by 2^depth (and a hard
    # cap so host-side marching tetrahedra stays tractable)
    from scipy.spatial import cKDTree

    d_nn, _ = cKDTree(pts).query(pts, k=2)
    mean_nn = float(np.mean(d_nn[:, 1])) or extent / 64
    res_density = int(np.ceil(extent / max(mean_nn, 1e-12)))
    if width and width > 0:
        res = int(np.ceil(extent / float(width)))
    else:
        res = res_density
    res = int(np.clip(res, 16, min(2 ** int(depth), int(max_resolution))))

    cell = extent / (res - 3)  # one-cell margin on each side
    origin = center - cell * (res - 1) / 2
    pts_g = (pts - origin) / cell

    import jax.numpy as jnp

    chi, rho = _splat_and_solve(
        jnp.asarray(pts_g, jnp.float32),
        jnp.asarray(normals, jnp.float32),
        res=res,
        screen=screen,
        tol=cg_tol,
        maxiter=8 * res,
    )
    chi = np.asarray(chi, float)
    rho_np = np.asarray(rho, float)

    # isovalue: density-weighted mean of chi at the samples (open3d uses the
    # same sample-mean rule)
    chi_at_pts = _trilinear_sample(chi, pts_g)
    iso = float(np.mean(chi_at_pts))

    from .voxel import _marching_tetrahedra

    mesh = _marching_tetrahedra(chi, iso, origin, cell)
    if mesh.n_points == 0:
        raise ValueError(f"The point cloud cannot generate a surface mesh with `poisson` method and depth == {depth}.")

    density = _trilinear_sample(rho_np, (mesh.points - origin) / cell)
    mesh.point_data["density"] = density
    if density_threshold is not None:
        keep = density >= np.quantile(density, density_threshold)
        remap = -np.ones(mesh.n_points, int)
        remap[keep] = np.arange(keep.sum())
        faces = remap[mesh.faces]
        faces = faces[(faces >= 0).all(axis=1)]
        mesh = Mesh(mesh.points[keep], faces, {"density": density[keep]})
    return mesh


# ---------------------------------------------------------------------------
# Ball pivoting (Bernardini et al. 1999)
# ---------------------------------------------------------------------------


def _ball_center(p0, p1, p2, r):
    """Center of the radius-r ball through three points, on the +normal
    side of the triangle; returns (center, unit_normal) or (None, None)."""
    e1, e2 = p1 - p0, p2 - p0
    n = np.cross(e1, e2)
    nn = np.linalg.norm(n)
    if nn < 1e-12:
        return None, None
    n = n / nn
    # circumcenter via perpendicular bisectors (in-plane)
    l1, l2 = e1 @ e1, e2 @ e2
    d = 2.0 * (e1 @ e1 * e2 @ e2 - (e1 @ e2) ** 2)
    if abs(d) < 1e-18:
        return None, None
    u = (l1 * (e2 @ e2) - l2 * (e1 @ e2)) / d
    v = (l2 * (e1 @ e1) - l1 * (e1 @ e2)) / d
    cc = p0 + u * e1 + v * e2
    rc2 = float(np.dot(cc - p0, cc - p0))
    h2 = r * r - rc2
    if h2 < 0:
        return None, None
    return cc + n * np.sqrt(h2), n


def ball_pivoting_reconstruction(
    points: np.ndarray,
    radii: Union[None, float, List[float]] = None,
    normals: Optional[np.ndarray] = None,
    k_normals: int = 16,
) -> Mesh:
    """True advancing-front ball-pivoting reconstruction.

    Parity surface: reference mesh_methods.py:289 `ball_pivoting_mesh`
    (open3d `create_from_point_cloud_ball_pivoting`): a virtual ball of
    each radius rolls over the cloud; a triangle is created whenever the
    ball settles on three points without containing any other
    (the empty-ball invariant), seeding new fronts when pivoting stalls.
    Radii default to 3x the median nearest-neighbor spacing.
    """
    from scipy.spatial import cKDTree

    pts = np.asarray(points, float)
    n = len(pts)
    if n < 3:
        raise ValueError("ball pivoting needs at least 3 points")
    if normals is None:
        normals = estimate_normals(pts, k=k_normals)
    tree = cKDTree(pts)
    if radii is None:
        d_nn, _ = tree.query(pts, k=2)
        radii = [float(np.median(d_nn[:, 1])) * 3.0]
    radii = sorted(float(r) for r in np.atleast_1d(radii))

    faces: List[Tuple[int, int, int]] = []
    tri_seen = set()
    edge_count: dict = {}
    used = np.zeros(n, bool)
    eps = 1e-7

    def ball_empty(c, r, exclude):
        idx = tree.query_ball_point(c, r * (1 - eps))
        return all(i in exclude for i in idx)

    def add_triangle(i, j, k, nt):
        tri = tuple(sorted((i, j, k)))
        if tri in tri_seen:
            return False
        for e in ((i, j), (j, k), (k, i)):
            if edge_count.get(tuple(sorted(e)), 0) >= 2:
                return False  # would go non-manifold
        tri_seen.add(tri)
        # orient the stored face along nt
        v = np.cross(pts[j] - pts[i], pts[k] - pts[i])
        faces.append((i, j, k) if v @ nt > 0 else (i, k, j))
        for e in ((i, j), (j, k), (k, i)):
            key = tuple(sorted(e))
            edge_count[key] = edge_count.get(key, 0) + 1
        used[[i, j, k]] = True
        return True

    def find_seed(r, tried):
        for i in range(n):
            if used[i] or tried[i]:
                continue
            cand = [j for j in tree.query_ball_point(pts[i], 2 * r) if j != i]
            if len(cand) < 2:
                tried[i] = True  # isolated point: never seedable at this r
                continue
            cand.sort(key=lambda j: float(np.sum((pts[j] - pts[i]) ** 2)))
            for a_idx in range(len(cand)):
                for b_idx in range(a_idx + 1, min(len(cand), a_idx + 12)):
                    j, k = cand[a_idx], cand[b_idx]
                    c, nt = _ball_center(pts[i], pts[j], pts[k], r)
                    if c is None:
                        continue
                    # ball on the outward side: triangle normal must agree
                    # with the vertex normals
                    avg_n = normals[i] + normals[j] + normals[k]
                    if nt @ avg_n < 0:
                        nt = -nt
                        c, _ = _ball_center(pts[i], pts[k], pts[j], r)
                        if c is None:
                            continue
                    if not ball_empty(c, r, {i, j, k}):
                        continue
                    if add_triangle(i, j, k, nt):
                        return (i, j, k, c, nt)
            # no seed triangle at this radius from point i — skip it on
            # every later rescan (otherwise fragmented clouds re-test all
            # permanently un-seedable points per reseed: quadratic)
            tried[i] = True
        return None

    def pivot(a, b, opp, c_old, r):
        """Pivot the ball around edge (a, b) away from `opp`; return
        (k, new_center, new_normal) of the first point hit, or None."""
        pa, pb = pts[a], pts[b]
        m = (pa + pb) / 2
        axis = pb - pa
        alen = np.linalg.norm(axis)
        if alen < 1e-12:
            return None
        axis = axis / alen
        v_old = c_old - m
        v_old_p = v_old - (v_old @ axis) * axis
        if np.linalg.norm(v_old_p) < 1e-12:
            return None
        v_old_p /= np.linalg.norm(v_old_p)
        ref2 = np.cross(axis, v_old_p)

        best = None
        for k in tree.query_ball_point(m, 2 * r):
            if k == a or k == b or k == opp:
                continue
            cc_mid, nrm = _ball_center(pa, pb, pts[k], r)
            if cc_mid is None:
                continue
            # both ball positions (either side of the triangle plane) are
            # valid pivot stops; enumerate them
            for sgn in (1.0, -1.0):
                if sgn > 0:
                    c_cand, n_cand = cc_mid, nrm
                else:
                    # mirror the center across the triangle plane
                    dist = float((cc_mid - pa) @ nrm)
                    c_cand = cc_mid - 2 * dist * nrm
                    n_cand = -nrm
                v_new = c_cand - m
                v_new_p = v_new - (v_new @ axis) * axis
                npn = np.linalg.norm(v_new_p)
                if npn < 1e-12:
                    continue
                v_new_p = v_new_p / npn
                ang = np.arctan2(float(ref2 @ v_new_p), float(v_old_p @ v_new_p))
                ang = ang % (2 * np.pi)
                if ang < 1e-6:
                    continue
                if best is None or ang < best[0]:
                    if ball_empty(c_cand, r, {a, b, k}):
                        best = (ang, k, c_cand, n_cand)
        if best is None:
            return None
        return best[1], best[2], best[3]

    for r in radii:
        # re-seed + expand until no seeds remain at this radius; a larger
        # radius gets a fresh chance at points that failed a smaller one
        tried = np.zeros(n, bool)
        while True:
            seed = find_seed(r, tried)
            if seed is None:
                break
            i, j, k, c0, nt0 = seed
            front = deque()
            # oriented so that pivoting continues outward: edge (x, y) with
            # opposite vertex and current ball center
            front.extend([(i, j, k, c0), (j, k, i, c0), (k, i, j, c0)])
            guard = 0
            while front and guard < 20 * n:
                guard += 1
                a, b, opp, c_old = front.popleft()
                if edge_count.get(tuple(sorted((a, b))), 0) >= 2:
                    continue
                hit = pivot(a, b, opp, c_old, r)
                if hit is None:
                    continue
                k2, c_new, n_new = hit
                if add_triangle(a, b, k2, n_new):
                    for e in ((a, k2, b), (k2, b, a)):
                        if edge_count.get(tuple(sorted((e[0], e[1]))), 0) < 2:
                            front.append((e[0], e[1], e[2], c_new))

    if not faces:
        raise ValueError(f"The point cloud cannot generate a surface mesh with `ball pivoting` method and radii == {radii}.")
    return Mesh(pts, np.asarray(faces, int))
