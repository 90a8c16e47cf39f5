"""Slow pure-Python sum-product belief-propagation oracle for a binary 2D
grid MRF — an executable ground truth for `spateo_tpu.ops.bp`.

The reference delegates this computation to the compiled C++ `fbgbp`
extension (`FastBinaryGridBeliefPropagation`,
/root/reference/spateo/segmentation/bp.py:74-92), which is not installable in
this image.  This oracle re-implements the algorithm from its documented call
contract (bp.py:42-92):

  * binary states {0: background, 1: cell} on an H x W pixel grid;
  * unary (node) potentials = the two conditional-probability rasters passed
    as ``potentials0`` / ``potentials1`` (bp.py:88-89);
  * pairwise Potts potential ``[[p, q], [q, p]]`` on every grid edge implied
    by the neighbor-offset list (bp.py:63-66, 90);
  * synchronous ("flooding") sum-product message updates, each outgoing
    message normalized to sum to one over the two states;
  * convergence when the L2 norm of the difference between the message
    vectors of two consecutive iterations drops below ``precision``
    (bp.py:67-68), bounded by ``max_iter``;
  * marginals = normalized beliefs (node potential times the product of all
    incoming messages).

Implementation style is deliberately naive and independent of the JAX
kernels it validates: explicit per-directed-edge message storage keyed by
(node, neighbor) with boundary-aware neighbor lists built once up front —
no shift/roll tricks, no fill values, no shared helpers.  float64
throughout.  Intended for small seeded grids only.
"""

import numpy as np


def grid_edges(shape, neighbor_offsets):
    """All directed edges (i, j) of the grid MRF, as flat-index pairs.

    Args:
        shape: (H, W) grid shape.
        neighbor_offsets: iterable of (dy, dx) integer offsets (center
            excluded), as produced by ``create_neighbor_offsets``.

    Returns:
        dict mapping flat node index i -> list of flat neighbor indices j,
        in offset order, skipping out-of-bounds neighbors.
    """
    H, W = shape
    neighbors = {}
    for y in range(H):
        for x in range(W):
            i = y * W + x
            lst = []
            for dy, dx in neighbor_offsets:
                ny, nx = y + int(dy), x + int(dx)
                if 0 <= ny < H and 0 <= nx < W:
                    lst.append(ny * W + nx)
            neighbors[i] = lst
    return neighbors


def sum_product_grid_bp(
    potentials0,
    potentials1,
    neighbor_offsets,
    p=0.6,
    q=0.4,
    precision=1e-5,
    max_iter=100,
    return_n_iter=False,
):
    """Run synchronous sum-product BP to convergence; return P(state=1).

    Mirrors ``fbgbp.FastBinaryGridBeliefPropagation(shape, offsets,
    potentials0, potentials1, p, q).run(precision, max_iter)`` followed by
    ``.marginals()`` as invoked by the reference (bp.py:90-92).
    """
    potentials0 = np.asarray(potentials0, dtype=np.float64)
    potentials1 = np.asarray(potentials1, dtype=np.float64)
    if potentials0.shape != potentials1.shape:
        raise ValueError("potential rasters must share a shape")
    H, W = potentials0.shape
    phi = np.stack([potentials0.ravel(), potentials1.ravel()], axis=-1)  # [N, 2]
    psi = np.array([[p, q], [q, p]], dtype=np.float64)

    neighbors = grid_edges((H, W), neighbor_offsets)
    # message store: msgs[(i, j)] = current message from node i to neighbor j,
    # a length-2 vector over j's states; uniform initialization.
    msgs = {}
    for i, nbrs in neighbors.items():
        for j in nbrs:
            msgs[(i, j)] = np.array([0.5, 0.5])

    n_iter = 0
    for n_iter in range(1, max_iter + 1):
        new_msgs = {}
        for (i, j), _ in msgs.items():
            # product of phi_i and every message into i except the one from j
            belief_i = phi[i].copy()
            for k in neighbors[i]:
                if k != j:
                    belief_i = belief_i * msgs[(k, i)]
            out = belief_i @ psi  # sum over s_i of belief_i(s_i) * psi[s_i, s_j]
            total = out.sum()
            if total > 0:
                out = out / total
            else:
                out = np.array([0.5, 0.5])
            new_msgs[(i, j)] = out
        delta_sq = 0.0
        for key in msgs:
            d = new_msgs[key] - msgs[key]
            delta_sq += float(d @ d)
        msgs = new_msgs
        if np.sqrt(delta_sq) < precision:
            break

    marginals = np.empty(H * W, dtype=np.float64)
    for i in range(H * W):
        belief = phi[i].copy()
        for k in neighbors[i]:
            belief = belief * msgs[(k, i)]
        total = belief.sum()
        marginals[i] = belief[1] / total if total > 0 else 0.5
    out = marginals.reshape(H, W)
    if return_n_iter:
        return out, n_iter
    return out
