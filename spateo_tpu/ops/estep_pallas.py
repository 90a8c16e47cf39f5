"""Pallas-fused Morpho E-step (single-chip fast path).

The dense XLA E-step (`alignment.methods.math.estep_reduced`, n_chunks==1)
materializes several [NA, B] probability tensors in HBM; at 20k x 2k that
is ~1.3 GB of HBM traffic per EM iteration and the loop is traffic-bound.
This kernel keeps EVERY [tile_A, tile_B] block in VMEM: all inputs are
VMEM-resident, the probability blocks live only in registers/VMEM, and
only the O(NA + B) reduction outputs are written.

Scope: the common Morpho configuration — one expression layer, 'gauss'
probability, 2-D coordinates, no sparse top-k, unsharded (single chip).
`alignment.methods.math.estep_reduced` dispatches here when those hold
(and the caller opted in) and falls back to the XLA path otherwise.

Mosaic layout rules this kernel is built around:
- A VMEM array's LANE (last) dimension pads to 128: a [N, 2] array
  occupies [N, 128] physically (64x blowup). Every input/output therefore
  keeps the LARGE axis (NA or B) last — all small-arity data is stored
  TRANSPOSED ([3, NA], [G, B], [1, NA], [8, NA]).
- No 1-D vectors, no transposes, no scatter (.at[].set) inside the
  kernel. Row reductions of a [TA, TB] block are expressed as MXU
  matvecs producing [1, TA] rows: dot_general(ones [1, TB], X [TA, TB],
  contracting the TB lanes).
- The spatial distance is an augmented dot: u = [x; y; x^2+y^2] rows on
  the A side, v = [-2x'; -2y'; 1] on the B side, d = u.T v + |b|^2 row.
  The model multiplier mm factors out of every per-row quantity and is
  applied to [1, TA] rows after the reduction; for column sums it rides
  an extra matvec (mm-row x prob-block).
- MXU dots run at Precision.HIGHEST to match the XLA path bit-for-bit
  closely (default bf16 passes cost ~2e-3 relative error in the E-step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TA = 512  # row-tile (lane dim of row-indexed quantities)
TB = 256  # column-tile (lane dim of the probability blocks)

_HI = jax.lax.Precision.HIGHEST


def _estep_kernel(
    ut_ref,  # [3, NAp]: x, y, x^2+y^2 of XAHat
    cat_ref,  # [2, NAp]: coordsA rows
    v_ref,  # [3, Bp]: -2x', -2y', 1 of coordsB
    cb2_ref,  # [1, Bp]: |coordsB|^2
    cbt_ref,  # [2, Bp]: coordsB rows
    fat_ref,  # [G1, NAp]: expression features + a-row (augmented)
    fbt_ref,  # [G1, Bp]: expression features + ones-row (augmented)
    bt_ref,  # [1, Bp]: b column terms
    mmt_ref,  # [1, NAp]: model multiplier
    scal_ref,  # [8] SMEM: sigma2, sigma2_variance, spatial_outlier, p_param, eps
    row_out_ref,  # [8, NAp]: K_NA, K_NA_sp, K_NA_s2, PXB_x, PXB_y
    col_out_ref,  # [8, Bp]: K_NB, c1_raw, c1m, c2, c3
    misc_out_ref,  # [8, 128]: [0,0]=Sp, [0,1]=sig_rel, [1:3, 0:2]=M1
    *,
    n_ta: int,
    n_tb: int,
):
    sigma2 = scal_ref[0]
    sigma2_variance = scal_ref[1]
    spatial_outlier = scal_ref[2]
    p_param = scal_ref[3]
    eps = scal_ref[4]

    ones_tb = jnp.ones((1, TB), jnp.float32)

    def probs(i, j):
        """mm-free probability blocks [TA, TB] for row tile i, col tile j.
        Padded rows have u = (0, 0, 1e12) -> d ~ 1e12 -> probs 0; padded
        columns have v = 0, cb2 = -1 with... columns are masked by their
        own zero normalizer contributions (mm-free probs of padded columns
        are killed by d: cb2 pad = 1e12)."""
        u = ut_ref[:, pl.ds(i * TA, TA)]  # [3, TA]
        v = v_ref[:, pl.ds(j * TB, TB)]  # [3, TB]
        d = (
            jax.lax.dot_general(u, v, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_HI)
            + cb2_ref[:, pl.ds(j * TB, TB)]
        )  # [TA, TB]
        d = jnp.maximum(d, 0.0)
        prob_v = jnp.exp(-d / (2 * sigma2 / sigma2_variance))
        prob_s = jnp.exp(-d / (2 * sigma2))
        fa = fat_ref[:, pl.ds(i * TA, TA)]  # [G1, TA]
        fb = fbt_ref[:, pl.ds(j * TB, TB)]  # [G1, TB]
        e_d = (
            jax.lax.dot_general(fa, fb, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_HI)
            + bt_ref[:, pl.ds(j * TB, TB)]
        )
        full = prob_s * jnp.exp(-e_d / (2 * p_param))
        return d, prob_v, prob_s, full

    def rowsum(X):
        """[TA, TB] -> [1, TA] row sums via an MXU matvec (no transposes)."""
        return jax.lax.dot_general(
            ones_tb, X, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=_HI
        )

    # ---- sweep 1 (columns outer): normalizers + closed-form K_NB, Sp ----
    def sweep1_col(j, Sp):
        def body(i, acc):
            c1_raw, c1m, c2, c3 = acc
            _, prob_v, prob_s, full = probs(i, j)
            mm = mmt_ref[:, pl.ds(i * TA, TA)]  # [1, TA]
            # mm-weighted column sums as matvecs: [1, TA] x [TA, TB]
            mv = lambda X: jax.lax.dot_general(
                mm, X, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32, precision=_HI
            )
            return (
                c1_raw + jnp.sum(prob_v, axis=0, keepdims=True),
                c1m + mv(prob_v),
                c2 + mv(prob_s),
                c3 + mv(full),
            )

        z = jnp.zeros((1, TB), jnp.float32)
        c1_raw, c1m, c2, c3 = jax.lax.fori_loop(0, n_ta, body, (z, z, z, z))
        spatial_inlier = 1.0 - spatial_outlier / (spatial_outlier + c1_raw)
        K_NB = spatial_inlier * c3 / (c3 + eps)
        col_out_ref[:, pl.ds(j * TB, TB)] = jnp.concatenate([K_NB, c1_raw, c1m, c2, c3, z, z, z], axis=0)
        return Sp + jnp.sum(K_NB)

    Sp = jax.lax.fori_loop(0, n_tb, sweep1_col, jnp.float32(0.0))

    # ---- sweep 2 (rows outer): row-indexed reductions ----
    def sweep2_row(i, carry):
        sig_rel, M1 = carry
        mm = mmt_ref[:, pl.ds(i * TA, TA)]  # [1, TA]

        def body(j, acc):
            sig_rel, M1, r3, r1, r2, px, py = acc
            c1_raw = col_out_ref[1:2, pl.ds(j * TB, TB)]  # [1, TB]
            c1m = col_out_ref[2:3, pl.ds(j * TB, TB)]
            c2 = col_out_ref[3:4, pl.ds(j * TB, TB)]
            c3 = col_out_ref[4:5, pl.ds(j * TB, TB)]
            spatial_inlier = 1.0 - spatial_outlier / (spatial_outlier + c1_raw)
            d, prob_v, prob_s, full = probs(i, j)
            # mm-free normalized blocks; mm scales the [1, TA] results
            P1t = prob_v / (spatial_outlier + c1m)
            P2t = spatial_inlier * prob_s / (c2 + eps)
            P3t = spatial_inlier * full / (c3 + eps)
            cbt = cbt_ref[:, pl.ds(j * TB, TB)]  # [2, TB]
            # PXB rows as [2, TA]: contract the TB lanes of cbt and P3t
            pxb = jax.lax.dot_general(
                cbt, P3t, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=_HI
            )
            return (
                sig_rel + jnp.sum(mm * rowsum(P2t * d)),
                M1,
                r3 + rowsum(P3t),
                r1 + rowsum(P1t),
                r2 + rowsum(P2t),
                px + pxb[0:1, :],
                py + pxb[1:2, :],
            )

        z = jnp.zeros((1, TA), jnp.float32)
        sig_rel, M1, r3, r1, r2, px, py = jax.lax.fori_loop(
            0, n_tb, body, (sig_rel, M1, z, z, z, z, z)
        )
        r3, r1, r2, px, py = mm * r3, mm * r1, mm * r2, mm * px, mm * py
        # M1 += coordsA_tile^T PXB_tile: contract the TA lanes
        pxs = jnp.concatenate([px, py], axis=0)  # [2, TA]
        ca = cat_ref[:, pl.ds(i * TA, TA)]  # [2, TA]
        M1 = M1 + jax.lax.dot_general(
            ca, pxs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32, precision=_HI
        )
        row_out_ref[:, pl.ds(i * TA, TA)] = jnp.concatenate([r3, r1, r2, px, py, z, z, z], axis=0)
        return sig_rel, M1

    sig_rel, M1 = jax.lax.fori_loop(0, n_ta, sweep2_row, (jnp.float32(0.0), jnp.zeros((2, 2), jnp.float32)))

    # 2-D mask construction: scatter/.at[].set does not lower in Mosaic
    ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def at(r, c, v):
        return jnp.where((ii == r) & (jj == c), v, 0.0)

    misc_out_ref[...] = (
        at(0, 0, Sp)
        + at(0, 1, sig_rel)
        + at(1, 0, M1[0, 0])
        + at(1, 1, M1[0, 1])
        + at(2, 0, M1[1, 0])
        + at(2, 1, M1[1, 1])
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def estep_pallas(
    XAHat,  # [NA, 2]
    coordsA,  # [NA, 2]
    coordsB,  # [B, 2]
    a_rows,  # [NA]
    b_cols,  # [B]
    A_feats,  # [NA, G]
    B_feats,  # [B, G]
    model_mul_vec,  # [NA]
    sigma2,
    gamma,
    samples_s,
    sigma2_variance,
    p_param,
    eps: float = 1e-8,
    interpret: bool = False,
):
    """Fused E-step returning the same reduction dict as `estep_reduced`."""
    NA, D = XAHat.shape
    B = coordsB.shape[0]
    NAp = -(-NA // TA) * TA
    Bp = -(-B // TB) * TB

    def pad_lanes(x, n, fill):
        return jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])], constant_values=fill)

    XAHat = XAHat.astype(jnp.float32)
    # augmented spatial factors: padded A rows get u=(0,0,1e12) -> d huge;
    # padded B cols get v=0 and cb2=1e12 -> d huge
    ut = pad_lanes(jnp.stack([XAHat[:, 0], XAHat[:, 1], jnp.sum(XAHat * XAHat, 1)]), NAp, 0.0)
    ut = jnp.where(
        (jnp.arange(NAp)[None, :] >= NA) & (jnp.arange(3)[:, None] == 2), 1e12, ut
    )
    cB = coordsB.astype(jnp.float32)
    v = pad_lanes(jnp.stack([-2.0 * cB[:, 0], -2.0 * cB[:, 1], jnp.ones(B, jnp.float32)]), Bp, 0.0)
    cb2 = pad_lanes(jnp.sum(cB * cB, 1)[None, :], Bp, 1e12)
    cbt = pad_lanes(cB.T, Bp, 0.0)
    cat = pad_lanes(coordsA.astype(jnp.float32).T, NAp, 0.0)
    # augmented expression factors: fa gets the a-row, fb gets a ones-row
    fat = pad_lanes(jnp.concatenate([A_feats.astype(jnp.float32).T, a_rows.astype(jnp.float32)[None, :]]), NAp, 0.0)
    fbt = pad_lanes(
        jnp.concatenate([B_feats.astype(jnp.float32).T, jnp.ones((1, B), jnp.float32)]), Bp, 0.0
    )
    bt = pad_lanes(b_cols.astype(jnp.float32)[None, :], Bp, 0.0)
    mmt = pad_lanes(model_mul_vec.astype(jnp.float32)[None, :], NAp, 0.0)

    outlier_s = samples_s * NA
    spatial_outlier = jnp.power(2 * jnp.pi * sigma2, D / 2.0) * (1 - gamma) / (gamma * outlier_s)
    scal = jnp.stack(
        [
            jnp.float32(sigma2),
            jnp.float32(sigma2_variance),
            jnp.float32(spatial_outlier),
            jnp.float32(p_param),
            jnp.float32(eps),
            jnp.float32(0.0),
            jnp.float32(0.0),
            jnp.float32(0.0),
        ]
    )

    kernel = functools.partial(_estep_kernel, n_ta=NAp // TA, n_tb=Bp // TB)
    row_out, col_out, misc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((8, NAp), jnp.float32),
            jax.ShapeDtypeStruct((8, Bp), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(ut, cat, v, cb2, cbt, fat, fbt, bt, mmt, scal)

    return dict(
        K_NA=row_out[0, :NA],
        K_NA_spatial=row_out[1, :NA],
        K_NA_sigma2=row_out[2, :NA],
        K_NB=col_out[0, :B],
        Sp=misc[0, 0],
        sigma2_related=misc[0, 1],
        PXB=row_out[3:5, :NA].T,
        M1=misc[1:3, 0:2],
    )
