"""Optimal transport on device: Sinkhorn, entropic (F)GW.

TPU-native replacement for the reference's POT dependency
(reference spateo/alignment/methods/paste.py uses `ot.gromov.cg` with exact
EMD inner solves; spateo/svg/utils.py:279 uses `ot.emd2`). Exact network
simplex does not map to SIMD hardware; this module provides log-domain
Sinkhorn and entropic-proximal FGW, which converge to the exact solutions as
eps -> 0. All solvers are single jitted `lax.while_loop`s.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp


@partial(jax.jit, static_argnames=("max_iter",))
def sinkhorn_log(
    a: jnp.ndarray,
    b: jnp.ndarray,
    M: jnp.ndarray,
    eps: float = 1e-2,
    max_iter: int = 1000,
    tol: float = 1e-9,
) -> jnp.ndarray:
    """Entropic OT plan via log-domain Sinkhorn (stable for small eps)."""
    log_a = jnp.log(a + 1e-300)
    log_b = jnp.log(b + 1e-300)
    Mk = -M / eps

    def cond(state):
        f, g, it, err = state
        return (it < max_iter) & (err > tol)

    def body(state):
        f, g, it, _ = state
        f_new = eps * (log_a - logsumexp((Mk + g[None, :] / eps), axis=1))
        g_new = eps * (log_b - logsumexp((Mk + f_new[:, None] / eps), axis=0))
        err = jnp.max(jnp.abs(g_new - g))
        return f_new, g_new, it + 1, err

    f0 = jnp.zeros_like(a)
    g0 = jnp.zeros_like(b)
    f, g, _, _ = jax.lax.while_loop(cond, body, (f0, g0, 0, jnp.asarray(jnp.inf)))
    return jnp.exp(Mk + f[:, None] / eps + g[None, :] / eps)


def sinkhorn_distance(a, b, M, eps: float = 1e-2, max_iter: int = 1000) -> float:
    """<T, M> under the entropic plan (eps-approximation of emd2)."""
    T = sinkhorn_log(jnp.asarray(a), jnp.asarray(b), jnp.asarray(M), eps, max_iter)
    return float(jnp.sum(T * jnp.asarray(M)))


def _gw_const(C1, C2, a, b):
    """constC for the square loss decomposition (Peyre et al. 2016):
    L(C1, C2) (x) T = constC - 2 C1 T C2^T for marginal-feasible T."""
    constC1 = (C1**2 @ a[:, None]) @ jnp.ones_like(b)[None, :]
    constC2 = jnp.ones_like(a)[:, None] @ (b[None, :] @ (C2**2).T)
    return constC1 + constC2


@partial(jax.jit, static_argnames=("outer_iter", "inner_iter"))
def fgw_entropic(
    M: jnp.ndarray,
    C1: jnp.ndarray,
    C2: jnp.ndarray,
    a: jnp.ndarray,
    b: jnp.ndarray,
    alpha: float = 0.1,
    eps: float = 5e-3,
    outer_iter: int = 100,
    inner_iter: int = 100,
    tol: float = 1e-8,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Entropic-proximal fused Gromov-Wasserstein.

    Mirror-descent outer loop: T <- Sinkhorn-projection of
    T * exp(-grad/eps), where grad = (1-alpha) M + 2 alpha (constC - 2 C1 T C2^T).
    Returns (T, fgw_objective).
    """
    constC = _gw_const(C1, C2, a, b)
    T0 = a[:, None] * b[None, :]
    log_a = jnp.log(a + 1e-300)
    log_b = jnp.log(b + 1e-300)

    def gw_terms(T):
        tens = constC - 2.0 * (C1 @ T @ C2.T)
        return tens

    def outer_cond(state):
        T, it, err = state
        return (it < outer_iter) & (err > tol)

    def outer_body(state):
        T, it, _ = state
        tens = gw_terms(T)
        grad = (1 - alpha) * M + 2.0 * alpha * tens
        # mirror step: kernel = log T - grad/eps, then Sinkhorn projection
        logK = jnp.log(T + 1e-300) - grad / eps

        def inner_body(i, fg):
            f, g = fg
            f = log_a - logsumexp(logK + g[None, :], axis=1)
            g = log_b - logsumexp(logK + f[:, None], axis=0)
            return f, g

        f, g = jax.lax.fori_loop(0, inner_iter, inner_body, (jnp.zeros_like(a), jnp.zeros_like(b)))
        T_new = jnp.exp(logK + f[:, None] + g[None, :])
        err = jnp.max(jnp.abs(T_new - T))
        return T_new, it + 1, err

    T, _, _ = jax.lax.while_loop(outer_cond, outer_body, (T0, 0, jnp.asarray(jnp.inf)))
    obj = (1 - alpha) * jnp.sum(M * T) + alpha * jnp.sum(gw_terms(T) * T)
    return T, obj


def fgw(
    M: np.ndarray,
    C1: np.ndarray,
    C2: np.ndarray,
    a: Optional[np.ndarray] = None,
    b: Optional[np.ndarray] = None,
    alpha: float = 0.1,
    eps: float = 5e-3,
    G_init: Optional[np.ndarray] = None,
    max_iter: int = 100,
) -> Tuple[np.ndarray, float]:
    """Host-facing FGW wrapper returning (plan, objective)."""
    n, m = M.shape
    a = np.ones(n) / n if a is None else np.asarray(a, float)
    b = np.ones(m) / m if b is None else np.asarray(b, float)
    T, obj = fgw_entropic(
        jnp.asarray(M, jnp.float32),
        jnp.asarray(C1, jnp.float32),
        jnp.asarray(C2, jnp.float32),
        jnp.asarray(a, jnp.float32),
        jnp.asarray(b, jnp.float32),
        alpha=alpha,
        eps=eps,
        outer_iter=max_iter,
    )
    return np.asarray(T), float(obj)
