"""Pallas-fused coarse-init inlier EM (VALIDATED NEGATIVE RESULT — not
dispatched; the product path uses `math._inlier_from_NN_kernel`).

This kernel runs the robust rigid fit from noisy NN matches (reference
methods/utils.py:1220; a 100-iteration EM over ~20-40k candidate pairs) as
ONE Pallas program: every array VMEM-resident, all EM state (R, t, sigma2,
gamma, alpha, Sp) carried as plain scalars.

Hardware A/B at 20,480 rows: Pallas 4.7 ms vs the plain jitted XLA
fori_loop at 4.3 ms — no win (the round-2 profile's "~185 ms inlier loop"
attribution turned out to be host<->device sync round-trips in the
SURROUNDING coarse phase, fixed by `morpho._coarse_match_fit`, not loop
overhead) — and the Mosaic compile takes ~560 s through the tunneled
toolchain. Kept, with its interpret-mode parity test, as the documented
record of that measurement; wire `inlier_from_NN_pallas` in
`math.inlier_from_NN` if a future toolchain changes the tradeoff.

Mosaic layout rules (same as ops/estep_pallas.py): large axis LAST
([2, N] coordinates, [1, N] rows), no 1-D vectors — per-axis moments are
scalar full-reductions over [1, N] slices, the 2x2 moment matrix is four
scalar dots, and the D=2 Procrustes rotation is the closed form
(c, s) ~ (A00+A11, A10-A01) on scalars.

Scope: D == 2 (the dominant slice-alignment case; D==3 falls back to the
XLA loop in alignment.methods.math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _inlier_kernel(xt, yt, dist, mask, scal, p_out, misc_out, *, max_iter: int):
    """xt/yt: [2, N] train_x/train_y rows; dist: [1, N] normalized distances;
    mask: [1, N] valid-row mask; scal SMEM: [n_valid, a_area, alpha_decrease,
    sigma2_0, eps]. Outputs: p_out [1, N] final posterior, misc_out [8, 128]
    (R, t, sigma2, gamma at fixed slots)."""
    n_valid = scal[0]
    a_area = scal[1]
    alpha_decrease = scal[2]
    sigma2_0 = scal[3]

    x0, x1 = xt[0:1, :], xt[1:2, :]
    y0, y1 = yt[0:1, :], yt[1:2, :]
    d = dist[...]
    m = mask[...]
    two_pi = 6.283185307179586

    weight0 = jnp.exp(-d) * m  # alpha0 = 1
    P0 = weight0

    def body(it, s):
        (P, r00, r01, r10, r11, t0, t1, sigma2, gamma, alpha, weight, Sp) = s
        mu_x0 = jnp.sum(x0 * P) / Sp
        mu_x1 = jnp.sum(x1 * P) / Sp
        mu_y0 = jnp.sum(y0 * P) / Sp
        mu_y1 = jnp.sum(y1 * P) / Sp
        X0, X1 = x0 - mu_x0, x1 - mu_x1
        Y0, Y1 = y0 - mu_y0, y1 - mu_y1
        # A = Y_mu^T (X_mu * P): A[i, j] = sum_n Y_i X_j P
        a00 = jnp.sum(Y0 * X0 * P)
        a01 = jnp.sum(Y0 * X1 * P)
        a10 = jnp.sum(Y1 * X0 * P)
        a11 = jnp.sum(Y1 * X1 * P)
        # closed-form 2-D Procrustes (math.procrustes_rotation)
        ca = a00 + a11
        sb = a10 - a01
        nrm = jnp.sqrt(ca * ca + sb * sb) + 1e-30
        c, sn = ca / nrm, sb / nrm
        r00n, r01n, r10n, r11n = c, -sn, sn, c
        # t = mu_y - R mu_x
        t0n = mu_y0 - (r00n * mu_x0 + r01n * mu_x1)
        t1n = mu_y1 - (r10n * mu_x0 + r11n * mu_x1)
        yh0 = r00n * x0 + r01n * x1 + t0n
        yh1 = r10n * x0 + r11n * x1 + t1n
        resid2 = (y0 - yh0) ** 2 + (y1 - yh1) ** 2
        term1 = jnp.exp(-resid2 / (2 * sigma2)) * weight
        wmax = jnp.max(weight)
        outlier_part = wmax * (1 - gamma) * (two_pi * sigma2) / (gamma * a_area)
        Pn = term1 / (term1 + outlier_part)
        Spn = jnp.sum(Pn)
        gamman = jnp.clip(Spn / n_valid, 0.01, 0.99)
        Pn = jnp.maximum(Pn, 1e-6) * m
        sigma2n = jnp.sum(resid2 * Pn) / (2 * Spn)
        late = it > 20
        alphan = jnp.where(late, alpha * alpha_decrease, alpha)
        wn = jnp.where(late, jnp.exp(-d * alphan) * m, weight)
        wn = jnp.where(late, wn / jnp.max(wn), wn)
        return (Pn, r00n, r01n, r10n, r11n, t0n, t1n, sigma2n, gamman, alphan, wn, Spn)

    one = jnp.float32(1.0)
    zero = jnp.float32(0.0)
    init = (P0, one, zero, zero, one, zero, zero, sigma2_0, jnp.float32(0.5), one, weight0, jnp.sum(P0))
    (P, r00, r01, r10, r11, t0, t1, sigma2, gamma, alpha, weight, Sp) = jax.lax.fori_loop(
        0, max_iter, body, init
    )

    # final posterior at the frozen (fix_sigma2, fix_gamma) temperature
    fix_sigma2, fix_gamma = 1e-2, 0.1
    yh0 = r00 * x0 + r01 * x1 + t0
    yh1 = r10 * x0 + r11 * x1 + t1
    resid2 = (y0 - yh0) ** 2 + (y1 - yh1) ** 2
    term1 = jnp.exp(-resid2 / (2 * fix_sigma2)) * weight
    outlier_part = jnp.max(weight) * (1 - fix_gamma) * (two_pi * fix_sigma2) / (fix_gamma * a_area)
    P_fin = term1 / (term1 + outlier_part) * m
    gamma_fin = jnp.clip(jnp.sum(P_fin) / n_valid, 0.01, 0.99)

    p_out[...] = P_fin
    ii = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def at(r, c_, v):
        return jnp.where((ii == r) & (jj == c_), v, 0.0)

    misc_out[...] = (
        at(0, 0, r00) + at(0, 1, r01) + at(1, 0, r10) + at(1, 1, r11)
        + at(2, 0, t0) + at(2, 1, t1)
        + at(3, 0, sigma2) + at(3, 1, gamma_fin)
    )


@functools.partial(jax.jit, static_argnames=("max_iter", "interpret"))
def inlier_from_NN_pallas(
    train_x,  # [N, 2] padded to a bucket
    train_y,  # [N, 2]
    distance,  # [N, 1]
    mask,  # [N, 1]
    n_valid,  # scalar
    max_iter: int = 100,
    interpret: bool = False,
):
    """Fused inlier EM; same math as `math._inlier_from_NN_kernel` (D=2).
    Returns (P [N, 1], R [2, 2], t [2], weight0 [N, 1], sigma2, gamma)."""
    N, D = train_x.shape
    f32 = jnp.float32
    xt = train_x.astype(f32).T  # [2, N]
    yt = train_y.astype(f32).T
    dist_row = distance.astype(f32).reshape(1, N)
    mask_row = mask.astype(f32).reshape(1, N)

    dist_row = jnp.maximum(dist_row, 0.0)
    normalize = jnp.max(dist_row) / (jnp.log(10.0) * 2.0)
    dist_n = dist_row / normalize
    sigma2_0 = jnp.sum(((xt - yt) ** 2) * mask_row) / (D * n_valid)
    a_area = jnp.maximum(
        jnp.prod(jnp.max(xt, axis=1) - jnp.min(xt, axis=1)),
        jnp.prod(jnp.max(yt, axis=1) - jnp.min(yt, axis=1)),
    )
    alpha_end = 0.1
    alpha_decrease = jnp.power(alpha_end / 1.0, 1.0 / (max_iter - 20))
    scal = jnp.stack(
        [f32(n_valid), a_area.astype(f32), alpha_decrease.astype(f32), sigma2_0.astype(f32),
         f32(1e-8), f32(0.0), f32(0.0), f32(0.0)]
    )

    kernel = functools.partial(_inlier_kernel, max_iter=max_iter)
    p_row, misc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, N), f32),
            jax.ShapeDtypeStruct((8, 128), f32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4 + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.VMEM)),
        interpret=interpret,
    )(xt, yt, dist_n, mask_row, scal)

    R = misc[0:2, 0:2]
    t = misc[2, 0:2]
    sigma2 = misc[3, 0]
    gamma = misc[3, 1]
    weight0 = (jnp.exp(-dist_n) * mask_row).reshape(N, 1)
    return p_row.reshape(N, 1), R, t, weight0, sigma2, gamma
