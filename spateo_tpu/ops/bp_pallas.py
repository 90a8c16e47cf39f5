"""Pallas TPU kernel for the BP message update (the hot inner chain of
`ops/bp.py::_bp_kernel`).

Per iteration the XLA path materializes the belief product, four
exclusion-divided messages, four 2x2 contractions and four normalizations —
~20 HBM-sized intermediates. This kernel fuses the whole per-pixel chain in
VMEM: one read of phi (2 planes) + messages (8 planes), one write of the 8
outgoing planes; the cross-pixel delivery (static shifts) stays in XLA where
it is a fused roll.

Layout: planes-first [C, H, W] so the lane dimension is W (pad to 128) and
the sublane dimension is H — the natural f32 (8, 128) tiling. Message plane
2*d + s holds direction d's incoming message for state s; directions follow
the 4-neighborhood order ((-1,0), (1,0), (0,-1), (0,1)) with reversal
rev = [1, 0, 3, 2].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-30
_REV = (1, 0, 3, 2)
OFFSETS4 = ((-1, 0), (1, 0), (0, -1), (0, 1))


def _msg_kernel(phi_ref, m_ref, out_ref, *, p: float, q: float):
    """One BP message update for a [*, TILE_H, W] block (pre-shift).
    Message storage may be bf16 (halves the HBM traffic that bounds the
    loop); the arithmetic always runs in f32."""
    phi0 = phi_ref[0]
    phi1 = phi_ref[1]
    M = m_ref[:].astype(jnp.float32)
    prod0 = phi0 * M[0] * M[2] * M[4] * M[6]
    prod1 = phi1 * M[1] * M[3] * M[5] * M[7]
    for d in range(4):
        r = _REV[d]
        e0 = prod0 / jnp.maximum(M[2 * r], _EPS)
        e1 = prod1 / jnp.maximum(M[2 * r + 1], _EPS)
        o0 = e0 * p + e1 * q
        o1 = e0 * q + e1 * p
        s = jnp.maximum(o0 + o1, _EPS)
        out_ref[2 * d] = (o0 / s).astype(out_ref.dtype)
        out_ref[2 * d + 1] = (o1 / s).astype(out_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@partial(jax.jit, static_argnames=("p", "q", "interpret"))
def bp_messages_pallas(phi: jnp.ndarray, M: jnp.ndarray, p: float, q: float, interpret: bool = False) -> jnp.ndarray:
    """Compute the outgoing (pre-shift) messages.

    Args:
        phi: [2, H, W] normalized node potentials (state-major planes).
        M:   [8, H, W] incoming messages (direction-state planes).
    Returns:
        [8, H, W] outgoing messages, normalized per pixel.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    msg_dtype = M.dtype
    sub = 16 if msg_dtype == jnp.bfloat16 else 8
    _, H, W = phi.shape
    Wp = _round_up(W, 128)
    Hp = _round_up(H, sub)
    if (Hp, Wp) != (H, W):
        phi = jnp.pad(phi, ((0, 0), (0, Hp - H), (0, Wp - W)), constant_values=0.5)
        M = jnp.pad(M, ((0, 0), (0, Hp - H), (0, Wp - W)), constant_values=0.5)

    # tile H so a block (2+8+8 planes) fits comfortably in VMEM (~16 MB)
    budget_rows = max((6 * 1024 * 1024) // (18 * Wp * 4), sub)
    tile_h = min(Hp, _round_up(min(budget_rows, 512), sub))
    while Hp % tile_h != 0:
        tile_h -= sub
    grid = (Hp // tile_h,)

    out = pl.pallas_call(
        partial(_msg_kernel, p=float(p), q=float(q)),
        out_shape=jax.ShapeDtypeStruct((8, Hp, Wp), msg_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, tile_h, Wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_h, Wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, tile_h, Wp), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        # write the outgoing messages over the incoming buffer: the kernel
        # loads the whole M block before its first store (`M = m_ref[:]`),
        # so aliasing is safe, and it removes a [8, H, W] allocation +
        # loop-carry copy per BP iteration (profiled at ~0.4 ms/iter @2048^2)
        input_output_aliases={1: 0},
        interpret=interpret,
    )(phi.astype(jnp.float32), M)
    return out[:, :H, :W]


def _shift_plane(arr: jnp.ndarray, dy: int, dx: int, fill: float) -> jnp.ndarray:
    """[H, W] shift-with-fill: out[y, x] = arr[y-dy, x-dx]."""
    out = jnp.roll(arr, (dy, dx), axis=(0, 1))
    H, W = arr.shape
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]
    invalid = jnp.zeros((H, W), bool)
    if dy > 0:
        invalid |= yy < dy
    elif dy < 0:
        invalid |= yy >= H + dy
    if dx > 0:
        invalid |= xx < dx
    elif dx < 0:
        invalid |= xx >= W + dx
    return jnp.where(invalid, fill, out)


@partial(jax.jit, static_argnames=("p", "q", "precision", "max_iter", "check_every", "msg_dtype", "interpret"))
def bp_kernel_pallas(
    phi: jnp.ndarray,  # [H, W, 2] node potentials (normalized)
    p: float,
    q: float,
    precision: float,
    max_iter: int,
    check_every: int = 1,
    msg_dtype: str = "float32",
    interpret: bool = False,
) -> jnp.ndarray:
    """Full loopy-BP marginals with the Pallas message kernel in the loop.

    Drop-in for `ops.bp._bp_kernel` restricted to the standard circle(3)
    4-neighborhood; returns the per-pixel P(cell) marginal.

    `check_every` measures the convergence delta only every that many
    iterations (the full-image L2 reduction costs ~0.36 ms per check at
    2048^2, profiled) — early exit then lands within `check_every`
    iterations of the reference's per-iteration check. With
    ``precision <= 0`` the loop runs a fixed `max_iter` iterations with no
    delta computation at all.
    """
    H, W, _ = phi.shape
    phi_pl = jnp.moveaxis(phi, -1, 0).astype(jnp.float32)  # [2, H, W]
    mdt = jnp.dtype(msg_dtype)
    M0 = jnp.full((8, H, W), 0.5, mdt)

    def one_iter(M):
        out = bp_messages_pallas(phi_pl, M, p, q, interpret)
        planes = []
        for d, (dy, dx) in enumerate(OFFSETS4):
            planes.append(_shift_plane(out[2 * d], dy, dx, 0.5))
            planes.append(_shift_plane(out[2 * d + 1], dy, dx, 0.5))
        return jnp.stack(planes)

    if precision <= 0:
        M = jax.lax.fori_loop(0, max_iter, lambda k, A: one_iter(A), M0)
    else:
        check = max(min(int(check_every), int(max_iter)), 1)

        def cond(state):
            i, M, delta = state
            return (i < max_iter) & (delta >= precision)

        def body(state):
            i, M, _ = state
            # advance up to `check` iterations (bounded by max_iter), then
            # measure the delta of the final one
            n_free = jnp.minimum(check - 1, jnp.maximum(max_iter - i - 1, 0))
            M_mid = jax.lax.fori_loop(0, n_free, lambda k, A: one_iter(A), M)
            M_new = one_iter(M_mid)
            delta = jnp.sqrt(jnp.sum((M_new.astype(jnp.float32) - M_mid.astype(jnp.float32)) ** 2))
            return (i + n_free + 1, M_new, delta)

        _, M, _ = jax.lax.while_loop(cond, body, (0, M0, jnp.asarray(jnp.inf, jnp.float32)))
    M = M.astype(jnp.float32)
    belief0 = phi_pl[0] * M[0] * M[2] * M[4] * M[6]
    belief1 = phi_pl[1] * M[1] * M[3] * M[5] * M[7]
    return belief1 / jnp.maximum(belief0 + belief1, _EPS)
