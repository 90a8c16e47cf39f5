"""Label rasters on device: connected components, watershed, expansion.

TPU-native replacements for the reference's flood-fill-style algorithms
(reference spateo/segmentation/label.py: cv2.connectedComponents,
skimage.segmentation.watershed :85, numba `_expand` :206, and
cv2.distanceTransform label.py:539). These are inherently sequential on CPU;
here they are recast as bounded iterative relaxations (SURVEY.md §7 "hard
parts"):

- connected components: min-label propagation + pointer jumping inside a
  `lax.while_loop` — converges in O(log diameter) jump rounds;
- distance transform: chamfer min-plus relaxation (3-4/5 weights ~ L2);
- watershed: priority-flood approximated by descending elevation levels, each
  level running masked label-adoption passes to a fixed point;
- expand_labels: the reference's area-capped single-unique-neighbor dilation,
  vectorized over the whole raster per step (no row-block joblib).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

N4 = ((-1, 0), (1, 0), (0, -1), (0, 1))
N8 = N4 + ((-1, -1), (-1, 1), (1, -1), (1, 1))


def _shift(arr: jnp.ndarray, dy: int, dx: int, fill):
    out = jnp.roll(arr, (dy, dx), axis=(0, 1))
    H, W = arr.shape[:2]
    if dy > 0:
        out = out.at[:dy].set(fill)
    elif dy < 0:
        out = out.at[dy:].set(fill)
    if dx > 0:
        out = out.at[:, :dx].set(fill)
    elif dx < 0:
        out = out.at[:, dx:].set(fill)
    return out


@partial(jax.jit, static_argnames=("connectivity",))
def _cc_kernel(mask: jnp.ndarray, connectivity: int = 8) -> jnp.ndarray:
    """Connected-component roots: each masked pixel ends with the minimum flat
    index of its component (+1); background is 0."""
    H, W = mask.shape
    idx = (jnp.arange(H * W, dtype=jnp.int32) + 1).reshape(H, W)
    INF = jnp.int32(H * W + 2)
    labels = jnp.where(mask, idx, INF)
    offsets = N8 if connectivity == 8 else N4

    def body(state):
        labels, _ = state
        neigh = labels
        for dy, dx in offsets:
            neigh = jnp.minimum(neigh, _shift(labels, dy, dx, INF))
        new = jnp.where(mask, jnp.minimum(labels, neigh), INF)
        # pointer jumping: label <- label at the pixel the label points to
        flat = new.reshape(-1)
        jumped = jnp.where(new < INF, flat[jnp.clip(new - 1, 0, H * W - 1)].reshape(H, W), INF)
        jumped = jnp.where(mask, jnp.minimum(new, jumped), INF)
        changed = jnp.any(jumped != labels)
        return jumped, changed

    labels, _ = jax.lax.while_loop(lambda s: s[1], lambda s: body(s), (labels, jnp.asarray(True)))
    return jnp.where(mask, labels, 0)


def connected_components(mask, connectivity: int = 8) -> Tuple[np.ndarray, int]:
    """Label connected components of a boolean mask.

    Returns (labels [same shape, consecutive ints from 1], n_components).
    """
    mask = np.asarray(mask).astype(bool)
    roots = np.asarray(_cc_kernel(jnp.asarray(mask), connectivity))
    uniq, relabeled = np.unique(roots, return_inverse=True)
    labels = relabeled.reshape(mask.shape)
    if uniq[0] != 0:  # no background present
        labels = labels + 1
        return labels, len(uniq)
    return labels, len(uniq) - 1


@partial(jax.jit, static_argnames=("max_iter",))
def _chamfer_kernel(mask: jnp.ndarray, max_iter: int = 10_000) -> jnp.ndarray:
    """Distance to the nearest background pixel (chamfer 3-4 metric / 3,
    matching cv2.DIST_L2 with a 3x3 mask)."""
    BIG = jnp.float32(1e9)
    d = jnp.where(mask, BIG, 0.0)
    a, b = 0.955, 1.3693  # cv2's optimal 3x3 chamfer weights for L2

    def body(state):
        d, _ = state
        best = d
        for dy, dx in N4:
            best = jnp.minimum(best, _shift(d, dy, dx, BIG) + a)
        for dy, dx in N8[4:]:
            best = jnp.minimum(best, _shift(d, dy, dx, BIG) + b)
        new = jnp.where(mask, jnp.minimum(d, best), 0.0)
        return new, jnp.any(new != d)

    d, _ = jax.lax.while_loop(lambda s: s[1], body, (d, jnp.asarray(True)))
    return d


def distance_transform(mask) -> np.ndarray:
    """Distance transform of a boolean mask (device chamfer; ~cv2 DIST_L2, 3x3)."""
    return np.asarray(_chamfer_kernel(jnp.asarray(np.asarray(mask).astype(bool))))


@partial(jax.jit, static_argnames=("min_distance",))
def _local_max_kernel(X: jnp.ndarray, min_distance: int) -> jnp.ndarray:
    """Strict local maxima within a (2*min_distance+1)^2 window."""
    k = 2 * min_distance + 1
    neg_inf = jnp.float32(-jnp.inf)
    win_max = jax.lax.reduce_window(
        X.astype(jnp.float32), neg_inf, jax.lax.max, (k, k), (1, 1), "SAME"
    )
    return (X >= win_max) & (X > 0)


def peak_local_max(X, min_distance: int = 1, mask: Optional[np.ndarray] = None) -> np.ndarray:
    """Coordinates-free peak finder: labeled peak raster (each peak plateau
    gets a unique positive id). Replaces skimage.feature.peak_local_max for
    Watershed marker generation (reference label.py:436)."""
    Xd = jnp.asarray(np.asarray(X), jnp.float32)
    peaks = np.asarray(_local_max_kernel(Xd, int(min_distance)))
    if mask is not None:
        peaks &= np.asarray(mask).astype(bool)
    labels, _ = connected_components(peaks, connectivity=8)
    return labels


@partial(jax.jit, static_argnames=("n_levels", "inner_iter"))
def _watershed_kernel(
    elevation: jnp.ndarray,
    markers: jnp.ndarray,
    mask: jnp.ndarray,
    n_levels: int = 64,
    inner_iter: int = 512,
) -> jnp.ndarray:
    """Marker-controlled watershed by descending-level priority flood.

    Levels sweep from the highest elevation down; within each level, masked
    unlabeled pixels adopt the label of their highest-elevation labeled
    neighbor until a fixed point. This reproduces skimage's
    `watershed(-elev, markers, mask)` basins up to plateau tie-breaking.
    """
    e = elevation.astype(jnp.float32)
    emin, emax = jnp.min(e), jnp.max(e)
    e = (e - emin) / jnp.maximum(emax - emin, 1e-30)
    labels0 = jnp.where(mask, markers, 0).astype(jnp.int32)
    NEG = jnp.float32(-1e9)

    def adopt(labels, active):
        # best labeled neighbor by elevation
        best_e = jnp.full_like(e, NEG)
        best_l = jnp.zeros_like(labels)
        for dy, dx in N8:
            nl = _shift(labels, dy, dx, 0)
            ne = jnp.where(nl > 0, _shift(e, dy, dx, NEG), NEG)
            take = ne > best_e
            best_e = jnp.where(take, ne, best_e)
            best_l = jnp.where(take, nl, best_l)
        adoptable = active & (labels == 0) & (best_l > 0)
        return jnp.where(adoptable, best_l, labels)

    def level_body(i, labels):
        thresh = 1.0 - (i + 1.0) / n_levels
        active = mask & (e >= thresh)

        def inner_cond(state):
            labels, changed, j = state
            return changed & (j < inner_iter)

        def inner_body(state):
            labels, _, j = state
            new = adopt(labels, active)
            return new, jnp.any(new != labels), j + 1

        labels, _, _ = jax.lax.while_loop(inner_cond, inner_body, (labels, jnp.asarray(True), 0))
        return labels

    return jax.lax.fori_loop(0, n_levels, level_body, labels0)


@partial(jax.jit, static_argnames=("shape_rows", "shape_cols", "min_distance", "max_labels", "n_levels"))
def _label_cells_fused_kernel(
    mask_bits: jnp.ndarray,  # packed uint8 bits of the boolean mask
    shape_rows: int,
    shape_cols: int,
    min_distance: int,
    max_labels: int,
    n_levels: int = 64,
):
    """The WHOLE labeling chain as one device program: unpack mask ->
    chamfer distance transform -> local-max peak markers -> connected
    components of the peak plateaus -> distance-based watershed -> per-cell
    centroids from the peak plateaus.

    The staged host path (find_peaks_from_mask + watershed through AnnData
    layers) round-trips four full rasters over the host link per slice;
    here only the packed mask goes up and [max_labels]-sized centroid
    accumulators come back — the labels raster stays device-resident for
    downstream chaining. Replaces the reference's
    cv2.distanceTransform + skimage peak_local_max/watershed pipeline
    (reference label.py:62,144,470) at production raster sizes.
    """
    H, W = shape_rows, shape_cols
    mask = jnp.unpackbits(mask_bits)[: H * W].reshape(H, W).astype(bool)
    d = _chamfer_kernel(mask)
    peaks = _local_max_kernel(d, min_distance) & mask
    roots = _cc_kernel(peaks, 8)  # root = min flat index of plateau (+1)
    HW = H * W
    pos = jnp.nonzero(peaks.reshape(-1), size=max_labels, fill_value=HW)[0]
    valid = pos < HW
    rootvals = jnp.where(valid, roots.reshape(-1)[jnp.minimum(pos, HW - 1)], jnp.int32(2**30))
    # compact plateau ids: rank of each root's FIRST occurrence in sorted
    # order — consistent per component, bounded by max_labels
    ids = jnp.searchsorted(jnp.sort(rootvals), rootvals).astype(jnp.int32)
    markers = jnp.zeros(HW, jnp.int32).at[pos].set(ids + 1, mode="drop").reshape(H, W)
    # distance-based watershed: flood basins of -distance (skimage's
    # recommended marker-controlled split for round cells)
    labels = _watershed_kernel(d, markers, mask, n_levels)
    # per-cell centroid from the peak plateau pixels (disk-symmetric cells:
    # the plateau mean IS the cell center); scatter is over <= max_labels
    # peak pixels, not the raster
    yyf = (pos // W).astype(jnp.float32)
    xxf = (pos % W).astype(jnp.float32)
    bins = jnp.where(valid, ids + 1, 0)
    vf = valid.astype(jnp.float32)
    cnt = jnp.zeros(max_labels + 1, jnp.float32).at[bins].add(vf)
    sy = jnp.zeros(max_labels + 1, jnp.float32).at[bins].add(yyf * vf)
    sx = jnp.zeros(max_labels + 1, jnp.float32).at[bins].add(xxf * vf)
    return labels, cnt, sy, sx


def label_cells_from_mask(
    mask: np.ndarray,
    min_distance: int = 3,
    max_labels: Optional[int] = None,
    n_levels: int = 64,
):
    """Fused device labeling: boolean mask -> watershed labels (device
    handle) + per-cell centroids (host [L, 2]).

    One dispatch, one packed-mask upload (~HW/8 bytes) and one
    [max_labels]-sized pull — versus four full-raster host round-trips on
    the staged find_peaks_from_mask/watershed path. Returns
    (labels_device, centroids) where `labels_device` is the device-resident
    int32 label raster (pull with np.asarray when the pixel assignment is
    needed, e.g. for UMI aggregation).
    """
    mask = np.asarray(mask).astype(bool)
    H, W = mask.shape
    if max_labels is None:
        # ceil of the densest packing of min_distance-separated peaks
        max_labels = max(int(H * W / max(min_distance, 1) ** 2), 1024)
    bits = jnp.asarray(np.packbits(mask.reshape(-1)))
    labels, cnt, sy, sx = _label_cells_fused_kernel(bits, H, W, int(min_distance), int(max_labels), n_levels)
    cnt, sy, sx = np.asarray(cnt), np.asarray(sy), np.asarray(sx)
    nz = cnt[1:] > 0
    cents = np.stack([sy[1:][nz] / cnt[1:][nz], sx[1:][nz] / cnt[1:][nz]], axis=1).astype(np.float32)
    return labels, cents


def watershed(elevation, markers, mask, n_levels: int = 64) -> np.ndarray:
    """Flood `mask` from `markers`, descending `elevation` (skimage
    `watershed(-elevation, markers, mask=mask)` semantics)."""
    return np.asarray(
        _watershed_kernel(
            jnp.asarray(np.asarray(elevation), jnp.float32),
            jnp.asarray(np.asarray(markers), jnp.int32),
            jnp.asarray(np.asarray(mask).astype(bool)),
            n_levels,
        )
    )


@partial(jax.jit, static_argnames=("distance", "num_labels"))
def _expand_labels_kernel(
    labels: jnp.ndarray,
    mask: jnp.ndarray,
    areas0: jnp.ndarray,
    max_area: int,
    distance: int,
    num_labels: int,
) -> jnp.ndarray:
    """Area-capped label expansion (reference label.py:183-267 semantics):
    each step, an unlabeled masked pixel adopts a neighboring label iff its
    4-neighborhood contains exactly one unique positive label whose area
    (at the start of the step) is below `max_area`."""
    BIGL = jnp.int32(2**30)

    def step(_, state):
        labels, areas = state
        mx = jnp.zeros_like(labels)
        mn = jnp.full_like(labels, BIGL)
        for dy, dx in N4:
            nl = _shift(labels, dy, dx, 0)
            mx = jnp.maximum(mx, nl)
            mn = jnp.minimum(mn, jnp.where(nl > 0, nl, BIGL))
        unique_one = (mx > 0) & (mn == mx)
        cand = unique_one & (labels == 0) & mask
        label_area = areas[jnp.clip(mx, 0, num_labels - 1)]
        adopt = cand & (label_area < max_area)
        new_labels = jnp.where(adopt, mx, labels)
        added = jnp.zeros_like(areas).at[jnp.where(adopt, mx, 0).reshape(-1)].add(
            adopt.reshape(-1).astype(areas.dtype)
        )
        added = added.at[0].set(0)
        return new_labels, areas + added

    labels, _ = jax.lax.fori_loop(0, distance, step, (labels, areas0))
    return labels


def expand_labels_capped(
    labels: np.ndarray,
    distance: int,
    max_area: int,
    mask: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Expand labels up to `distance` px, capping each label at `max_area`."""
    labels = np.asarray(labels).astype(np.int32)
    masked = labels[mask] if mask is not None else labels
    if (masked > 0).all() or (masked == 0).all():
        return labels
    num_labels = int(labels.max()) + 1
    areas = np.bincount(labels.ravel(), minlength=num_labels).astype(np.int32)
    mask_arr = np.ones(labels.shape, bool) if mask is None else np.asarray(mask).astype(bool)
    out = _expand_labels_kernel(
        jnp.asarray(labels), jnp.asarray(mask_arr), jnp.asarray(areas), int(max_area), int(distance), num_labels
    )
    return np.asarray(out)


def label_overlap(X: np.ndarray, Y: np.ndarray):
    """Sparse overlap-count matrix between two label arrays (parity:
    reference segmentation/utils.py:293, numba) — one 2D bincount."""
    from scipy import sparse

    X = np.asarray(X).ravel()
    Y = np.asarray(Y).ravel()
    if X.shape != Y.shape:
        from ..errors import SegmentationError

        raise SegmentationError(f"Both arrays must have the same shape, but one is {X.shape} and the other is {Y.shape}.")
    nx, ny = int(X.max()) + 1, int(Y.max()) + 1
    flat = X.astype(np.int64) * ny + Y.astype(np.int64)
    counts = np.bincount(flat, minlength=nx * ny).reshape(nx, ny)
    return sparse.csr_matrix(counts.astype(np.uint64))


def find_boundaries(labels: np.ndarray, mode: str = "inner") -> np.ndarray:
    """Inner boundaries of labeled regions (skimage.segmentation.find_boundaries
    equivalent): pixels whose 4-neighborhood contains a different label."""
    L = jnp.asarray(np.asarray(labels))

    @jax.jit
    def kernel(L):
        diff = jnp.zeros(L.shape, bool)
        for dy, dx in N4:
            diff = diff | (_shift(L, dy, dx, -1) != L)
        return diff & (L > 0)

    return np.asarray(kernel(L))
