"""Negative-binomial mixture EM — fused, batched, on device.

TPU-native re-derivation of the reference's `nbn_em` (reference
spateo/segmentation/em.py:83-161: 2-component NB mixture fit by EM with the
lambda/theta parameterization of Chen et al., E-step :117-129, M-step
:131-141, NaN/invalid fallback :142-161). Redesign:

- ALL density bins fit simultaneously: sample vectors are padded to one
  [B, S] array with a mask, and a single `lax.while_loop` updates [B, 2]
  parameters — replacing the reference's joblib process pool (em.py:310-319).
- NB pmf is evaluated in log space with `gammaln` (VPU transcendentals),
  convergence is per-bin with already-converged bins frozen.
- The reference's guard (revert to previous params on NaN/Inf/invalid and
  stop) is reproduced exactly but branch-free.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import digamma, gammaln

from ..errors import SegmentationError


def lamtheta_to_r(lam, theta):
    return -lam / jnp.log(theta)


def muvar_to_lamtheta(mu, var):
    r = mu**2 / (var - mu)
    theta = mu / var
    lam = -r * jnp.log(theta)
    return lam, theta


def lamtheta_to_muvar(lam, theta):
    r = lamtheta_to_r(lam, theta)
    mu = r / theta - r
    var = mu + mu**2 / r
    return mu, var


def nb_logpmf(x, r, p):
    """log NB pmf with scipy's (n, p) convention: support k successes with
    failure prob 1-p."""
    return gammaln(x + r) - gammaln(r) - gammaln(x + 1.0) + r * jnp.log(p) + x * jnp.log1p(-p)


def nbn_pmf(n, p, X):
    """NB pmf (parity helper; reference em.py:74)."""
    return np.asarray(jnp.exp(nb_logpmf(jnp.asarray(X, jnp.float32), float(n), float(p))))


@partial(jax.jit, static_argnames=("max_iter",))
def _nbn_em_batched(
    X: jnp.ndarray,  # [B, S] padded samples
    mask: jnp.ndarray,  # [B, S] True for real samples
    w0: jnp.ndarray,  # [B, 2]
    mu0: jnp.ndarray,  # [B, 2]
    var0: jnp.ndarray,  # [B, 2]
    max_iter: int = 2000,
    precision: float = 1e-6,
):
    """Fit B independent 2-component NB mixtures at once.

    Returns (w, r, theta) each [B, 2], matching the reference's return
    semantics including the use-previous-on-invalid fallback.
    """
    X = X.astype(jnp.float32)
    maskf = mask.astype(jnp.float32)
    lam, theta = muvar_to_lamtheta(mu0, var0)
    w = w0

    def em_step(w, lam, theta):
        r = lamtheta_to_r(lam, theta)  # [B,2]
        # E-step: responsibilities tau [B,2,S]
        logpmf = nb_logpmf(X[:, None, :], r[:, :, None], theta[:, :, None])
        tau = w[:, :, None] * jnp.exp(logpmf)
        tau = jnp.clip(tau, 1e-10, 1e10)
        tau = tau / jnp.sum(tau, axis=1, keepdims=True)
        tau = tau * maskf[:, None, :]

        beta = 1.0 - 1.0 / (1.0 - theta) - 1.0 / jnp.log(theta)  # [B,2]
        delta = r[:, :, None] * (digamma(r[:, :, None] + X[:, None, :]) - digamma(r[:, :, None]))  # [B,2,S]

        tau_sum = jnp.sum(tau, axis=2)  # [B,2]
        w_new = tau_sum / jnp.sum(tau_sum, axis=1, keepdims=True)
        td = jnp.sum(tau * delta, axis=2)  # [B,2]
        lam_new = td / tau_sum
        denom = jnp.sum(tau * (X[:, None, :] - (1.0 - beta)[:, :, None] * delta), axis=2)
        theta_new = beta * td / denom
        return w_new, lam_new, theta_new

    def cond(state):
        i, w, lam, theta, done = state
        return (i < max_iter) & jnp.logical_not(jnp.all(done))

    def body(state):
        i, w, lam, theta, done = state
        w_new, lam_new, theta_new = em_step(w, lam, theta)
        r_new = lamtheta_to_r(lam_new, theta_new)
        invalid = (
            jnp.any(jnp.isnan(r_new) | jnp.isnan(w_new) | jnp.isnan(theta_new), axis=1)
            | jnp.any(jnp.isinf(r_new) | jnp.isinf(w_new) | jnp.isinf(theta_new), axis=1)
            | jnp.any((r_new <= 0) | (theta_new > 1) | (theta_new < 0) | (w_new < 0) | (w_new > 1), axis=1)
        )  # [B]
        delta_max = jnp.maximum(
            jnp.max(jnp.abs(w_new - w), axis=1),
            jnp.maximum(jnp.max(jnp.abs(lam_new - lam), axis=1), jnp.max(jnp.abs(theta_new - theta), axis=1)),
        )
        converged = delta_max < precision
        # frozen bins (done or invalid step) keep previous params
        keep_prev = done | invalid
        w = jnp.where(keep_prev[:, None], w, w_new)
        lam = jnp.where(keep_prev[:, None], lam, lam_new)
        theta = jnp.where(keep_prev[:, None], theta, theta_new)
        done = done | invalid | converged
        return (i + 1, w, lam, theta, done)

    done0 = jnp.zeros(X.shape[0], dtype=bool)
    _, w, lam, theta, _ = jax.lax.while_loop(cond, body, (0, w, lam, theta, done0))
    return w, lamtheta_to_r(lam, theta), theta


def nbn_em(
    X: np.ndarray,
    w: Tuple[float, float] = (0.99, 0.01),
    mu: Tuple[float, float] = (10.0, 300.0),
    var: Tuple[float, float] = (20.0, 400.0),
    max_iter: int = 2000,
    precision: float = 1e-3,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-population NB mixture EM (parity: reference em.py:83)."""
    Xd = jnp.asarray(np.asarray(X, dtype=np.float32).ravel())[None, :]
    mask = jnp.ones_like(Xd, dtype=bool)
    w_, r_, p_ = _nbn_em_batched(
        Xd,
        mask,
        jnp.asarray([w], jnp.float32),
        jnp.asarray([mu], jnp.float32),
        jnp.asarray([var], jnp.float32),
        max_iter=max_iter,
        precision=precision,
    )
    return np.asarray(w_[0]), np.asarray(r_[0]), np.asarray(p_[0])


def run_em(
    X: np.ndarray,
    downsample: Union[int, float] = 0.001,
    params: Union[Dict[str, Tuple[float, float]], Dict[int, Dict[str, Tuple[float, float]]]] = dict(
        w=(0.5, 0.5), mu=(10.0, 300.0), var=(20.0, 400.0)
    ),
    max_iter: int = 2000,
    precision: float = 1e-6,
    bins: Optional[np.ndarray] = None,
    seed: Optional[int] = None,
) -> Union[Tuple, Dict[int, Tuple]]:
    """Downsample-weighted EM over the raster, per density bin (parity:
    reference em.py:240-321). All bins fit in ONE device kernel."""
    samples: Dict[int, np.ndarray] = {}
    if bins is not None:
        for label in np.unique(bins):
            if label > 0:
                samples[int(label)] = np.asarray(X)[bins == label]
                _params = params.get(int(label), params)
                if set(_params.keys()) != {"w", "mu", "var"}:
                    raise SegmentationError("`params` must contain exactly the keys `w`, `mu`, `var`.")
    else:
        samples[0] = np.asarray(X).ravel()
        if set(params.keys()) != {"w", "mu", "var"}:
            raise SegmentationError("`params` must contain exactly the keys `w`, `mu`, `var`.")

    downsample_scale = downsample <= 1
    rng = np.random.default_rng(seed)
    total = sum(len(s) for s in samples.values())
    final_samples: Dict[int, np.ndarray] = {}
    for label, _samples in samples.items():
        n_target = int(len(_samples) * downsample) if downsample_scale else int(downsample * (len(_samples) / total))
        if len(_samples) > n_target:
            weights = np.log1p(_samples + 1)
            _samples = rng.choice(_samples, n_target, replace=False, p=weights / weights.sum())
        final_samples[label] = np.asarray(_samples, dtype=np.float32)

    labels = list(final_samples.keys())
    S = max(len(v) for v in final_samples.values())
    B = len(labels)
    Xb = np.zeros((B, S), dtype=np.float32)
    maskb = np.zeros((B, S), dtype=bool)
    w0 = np.zeros((B, 2), np.float32)
    mu0 = np.zeros((B, 2), np.float32)
    var0 = np.zeros((B, 2), np.float32)
    for i, label in enumerate(labels):
        v = final_samples[label]
        Xb[i, : len(v)] = v
        maskb[i, : len(v)] = True
        p = params.get(label, params)
        w0[i], mu0[i], var0[i] = p["w"], p["mu"], p["var"]

    w, r, theta = _nbn_em_batched(
        jnp.asarray(Xb), jnp.asarray(maskb), jnp.asarray(w0), jnp.asarray(mu0), jnp.asarray(var0),
        max_iter=max_iter, precision=precision,
    )
    w, r, theta = np.asarray(w), np.asarray(r), np.asarray(theta)
    results = {label: (tuple(w[i]), tuple(r[i]), tuple(theta[i])) for i, label in enumerate(labels)}
    return results if bins is not None else results[0]


@jax.jit
def _conditionals_kernel(X, r, p):
    return jnp.exp(nb_logpmf(X, r, p))


def conditionals(
    X: np.ndarray,
    em_results,
    bins: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-pixel P(observed UMI | background) and P(observed UMI | cell)
    (parity: reference em.py:164). Per-bin evaluation is one vectorized
    select over stacked bin parameters."""
    X = jnp.asarray(np.asarray(X), jnp.float32)
    if isinstance(em_results, dict):
        if bins is None:
            raise SegmentationError("`em_results` indicate binning was used, but `bins` was not provided")
        bins_dev = jnp.asarray(np.asarray(bins))
        background_cond = jnp.ones_like(X)
        cell_cond = jnp.zeros_like(X)
        for label, (_, r, p) in em_results.items():
            m = bins_dev == label
            background_cond = jnp.where(m, _conditionals_kernel(X, float(r[0]), float(p[0])), background_cond)
            cell_cond = jnp.where(m, _conditionals_kernel(X, float(r[1]), float(p[1])), cell_cond)
    else:
        _, r, p = em_results
        background_cond = _conditionals_kernel(X, float(r[0]), float(p[0]))
        cell_cond = _conditionals_kernel(X, float(r[1]), float(p[1]))
    return np.asarray(background_cond), np.asarray(cell_cond)


def confidence(
    X: np.ndarray,
    em_results,
    bins: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Posterior P(cell | UMI) per pixel (parity: reference em.py:206)."""
    bp_cond, cp_cond = conditionals(X, em_results, bins)
    tau0 = np.zeros(np.asarray(X).shape)
    tau1 = np.zeros(np.asarray(X).shape)
    if isinstance(em_results, dict):
        for label, (w, _, _) in em_results.items():
            m = np.asarray(bins) == label
            tau0[m] = w[0] * bp_cond[m]
            tau1[m] = w[1] * cp_cond[m]
    else:
        w, _, _ = em_results
        tau0 = w[0] * bp_cond
        tau1 = w[1] * cp_cond
    return tau1 / (tau0 + tau1)
