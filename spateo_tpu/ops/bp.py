"""Sum-product belief propagation on a binary 2D grid MRF — fused on device.

TPU-native replacement for the compiled C++ `fbgbp`
FastBinaryGridBeliefPropagation extension the reference calls through
spateo/segmentation/bp.py:74-92 (OpenMP-threaded message passing until L2
convergence). Here messages for all neighbor directions live as one
[D, H, W, 2] array updated synchronously inside a `lax.while_loop`; each
iteration is a handful of fused VPU element-wise ops + static shifts, and the
convergence check (L2 of message delta) is a device-side reduction — no
host round-trips.

Model: binary states {background, cell}; node potentials = the NB conditional
probabilities; Potts edge potential [[p, q], [q, p]].
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .image import circle


def create_neighbor_offsets(neighborhood: np.ndarray) -> np.ndarray:
    """Neighborhood mask -> (D, 2) array of (dy, dx) offsets (center removed).
    Parity: reference segmentation/bp.py:13."""
    for s in neighborhood.shape:
        if s % 2 == 0:
            raise ValueError("`neighborhood` must have odd dimension sizes")
    neighborhood = np.asarray(neighborhood).astype(bool).copy()
    center = tuple((np.array(neighborhood.shape) - 1) // 2)
    neighborhood[center] = False
    coords = np.argwhere(neighborhood)
    return (coords - np.array(center)).astype(np.int16)


def _use_pallas_bp(offsets) -> bool:
    """The Pallas message kernel handles the standard 4-neighborhood on real
    TPUs (~20% faster than the XLA path by fusing the per-pixel chain in
    VMEM); anything else falls back to the generic XLA kernel."""
    try:
        import jax

        if jax.devices()[0].platform != "tpu":
            return False
    except Exception:
        return False
    from .bp_pallas import OFFSETS4

    return set(map(tuple, offsets)) == set(OFFSETS4)


def _shift2d(arr: jnp.ndarray, dy: int, dx: int, fill: float) -> jnp.ndarray:
    """Shift a [H, W, C] array by (dy, dx), filling vacated cells with `fill`.

    out[y, x] = arr[y - dy, x - dx] — i.e. the value moves BY the offset.
    """
    out = jnp.roll(arr, (dy, dx), axis=(0, 1))
    H, W = arr.shape[0], arr.shape[1]
    yy = jnp.arange(H)[:, None, None]
    xx = jnp.arange(W)[None, :, None]
    invalid = jnp.zeros((H, W, 1), dtype=bool)
    if dy > 0:
        invalid = invalid | (yy < dy)
    elif dy < 0:
        invalid = invalid | (yy >= H + dy)
    if dx > 0:
        invalid = invalid | (xx < dx)
    elif dx < 0:
        invalid = invalid | (xx >= W + dx)
    return jnp.where(invalid, fill, out)


@partial(jax.jit, static_argnames=("offsets", "max_iter"))
def _bp_kernel(
    phi: jnp.ndarray,  # [H, W, 2] node potentials (normalized)
    offsets: Tuple[Tuple[int, int], ...],
    p: float,
    q: float,
    precision: float,
    max_iter: int,
) -> jnp.ndarray:
    H, W, _ = phi.shape
    D = len(offsets)
    rev = tuple(offsets.index((-dy, -dx)) for (dy, dx) in offsets)
    psi = jnp.asarray([[p, q], [q, p]], jnp.float32)

    # M[d] = incoming message INTO each pixel from its neighbor at -offsets[d]
    # (i.e. the neighbor whose message travels BY offsets[d]).
    M0 = jnp.full((D, H, W, 2), 0.5, jnp.float32)

    def one_iter(M):
        # belief product at every pixel (log-free; normalized per step)
        prod = phi * jnp.prod(M, axis=0)  # [H,W,2]

        new_msgs = []
        for d, (dy, dx) in enumerate(offsets):
            # message from pixel i to neighbor j = i + (dy, dx):
            # exclude j's own previous message into i (direction rev[d])
            excl = prod / jnp.maximum(M[rev[d]], 1e-30)  # [H,W,2] over s_i
            out = excl @ psi  # [H,W,2] over s_j
            out = out / jnp.maximum(jnp.sum(out, axis=-1, keepdims=True), 1e-30)
            # deliver: j receives it as incoming from direction d
            new_msgs.append(_shift2d(out, dy, dx, 0.5))
        return jnp.stack(new_msgs)

    def cond(state):
        i, M, delta = state
        return (i < max_iter) & (delta >= precision)

    def body(state):
        i, M, _ = state
        M_new = one_iter(M)
        delta = jnp.sqrt(jnp.sum((M_new - M) ** 2))
        return (i + 1, M_new, delta)

    _, M, _ = jax.lax.while_loop(cond, body, (0, M0, jnp.asarray(jnp.inf, jnp.float32)))
    belief = phi * jnp.prod(M, axis=0)
    belief = belief / jnp.maximum(jnp.sum(belief, axis=-1, keepdims=True), 1e-30)
    return belief[..., 1]


def cell_marginals(
    background_probs: np.ndarray,
    cell_probs: np.ndarray,
    neighborhood: Optional[np.ndarray] = None,
    p: float = 0.6,
    q: float = 0.4,
    precision: float = 1e-5,
    max_iter: int = 100,
) -> np.ndarray:
    """Marginal P(cell) per pixel by loopy BP (parity: reference bp.py:42)."""
    if cell_probs.shape != background_probs.shape:
        raise ValueError("`cell_probs` and `background_probs` must have the same shape")
    neighborhood = (neighborhood > 0) if neighborhood is not None else circle(3).astype(bool)
    if np.asarray(cell_probs).ndim != neighborhood.ndim:
        raise ValueError("`neighborhood` and `cell_probs` must have the same number of dimensions")
    offsets = tuple(map(tuple, create_neighbor_offsets(neighborhood).tolist()))
    phi = jnp.stack(
        [jnp.asarray(np.asarray(background_probs), jnp.float32), jnp.asarray(np.asarray(cell_probs), jnp.float32)],
        axis=-1,
    )
    phi = phi / jnp.maximum(jnp.sum(phi, axis=-1, keepdims=True), 1e-30)
    if _use_pallas_bp(offsets):
        from .bp_pallas import bp_kernel_pallas

        marginals = bp_kernel_pallas(phi, float(p), float(q), float(precision), int(max_iter))
    else:
        marginals = _bp_kernel(phi, offsets, float(p), float(q), float(precision), int(max_iter))
    return np.asarray(marginals)


def run_bp(
    background_cond: np.ndarray,
    cell_cond: np.ndarray,
    k: int = 3,
    square: bool = False,
    p: float = 0.6,
    q: float = 0.4,
    precision: float = 1e-6,
    max_iter: int = 100,
) -> np.ndarray:
    """Marginal P(cell) with a size-k circular/square neighborhood (parity:
    reference bp.py:95)."""
    neighborhood = np.ones((k, k)) if square else circle(k)
    return cell_marginals(
        background_cond, cell_cond, neighborhood=neighborhood, p=p, q=q, precision=precision, max_iter=max_iter
    )
