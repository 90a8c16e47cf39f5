"""Variational inference for (zero-inflated) negative-binomial mixtures.

Capability parity with reference spateo/segmentation/vi.py:22-273, which fits
the mixture with Pyro SVI (TraceEnum_ELBO + AutoDelta guide == MAP of the
marginalized mixture). Here the same MAP objective — the exact marginal
log-likelihood of the (ZI)NB mixture — is minimized with optax Adam under
`jax.jit`, with the same parameterization (softmax weights, total_count/logits
NB, gate logits for zero inflation).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.scipy.special import gammaln, logsumexp

from ..errors import SegmentationError


def _nb_logpmf_count_logits(x, total_count, logits):
    """log NB pmf with (total_count, logits) parameterization:
    logits = log(p_success/(1-p_success)) where mean = count * exp(logits)."""
    log_p = -jax.nn.softplus(-logits)  # log sigmoid(logits)
    log_1mp = -jax.nn.softplus(logits)
    return (
        gammaln(x + total_count)
        - gammaln(total_count)
        - gammaln(x + 1.0)
        + total_count * log_1mp
        + x * log_p
    )


def _zinb_logpmf(x, total_count, logits, gate_logits):
    nb = _nb_logpmf_count_logits(x, total_count, logits)
    log_gate = -jax.nn.softplus(-gate_logits)
    log_1mgate = -jax.nn.softplus(gate_logits)
    zero_case = jnp.logaddexp(log_gate, log_1mgate + nb)
    return jnp.where(x == 0, zero_case, log_1mgate + nb)


@partial(jax.jit, static_argnames=("n_epochs", "zero_inflated"))
def _fit_mixture(x, w0, counts0, logits0, z0, n_epochs: int, zero_inflated: bool, lr: float = 0.1):
    params = {"w": w0, "counts": counts0, "logits": logits0}
    if zero_inflated:
        params["z"] = z0

    def nll(params):
        log_w = jax.nn.log_softmax(params["w"])
        counts = jnp.exp(params["counts"])
        if zero_inflated:
            comp = _zinb_logpmf(x[:, None], counts[None, :], params["logits"][None, :], params["z"][None, :])
        else:
            comp = _nb_logpmf_count_logits(x[:, None], counts[None, :], params["logits"][None, :])
        return -jnp.mean(logsumexp(log_w[None, :] + comp, axis=1))

    opt = optax.adam(lr)
    state = opt.init(params)

    def step(carry, _):
        params, state = carry
        loss, grads = jax.value_and_grad(nll)(params)
        updates, state = opt.update(grads, state)
        params = optax.apply_updates(params, updates)
        return (params, state), loss

    (params, _), losses = jax.lax.scan(step, (params, state), None, length=n_epochs)
    return params, losses


class NegativeBinomialMixture:
    """(Zero-inflated) NB mixture fit by SVI/MAP (parity: reference vi.py:22)."""

    def __init__(
        self,
        x: np.ndarray,
        n: int = 2,
        n_init: int = 5,
        w: Optional[np.ndarray] = None,
        mu: Optional[np.ndarray] = None,
        var: Optional[np.ndarray] = None,
        zero_inflated: bool = False,
        seed: Optional[int] = None,
    ):
        if not ((w is None) == (mu is None) and (w is None) == (var is None)):
            raise SegmentationError("All or none of `w`, `mu`, `var` must be provided.")
        if (w is not None) and (n != len(w) or n != len(mu) or n != len(var)):
            raise SegmentationError(f"`w`, `mu`, `var` must have length {n}.")
        self.x = np.asarray(x, dtype=np.float32).ravel()
        self.n = n
        self.zero_inflated = zero_inflated
        rng = np.random.default_rng(seed)
        if w is not None:
            w = np.asarray(w, float)
            mu = np.asarray(mu, float)
            var = np.asarray(var, float)
            var = np.maximum(var, mu * 1.01 + 1e-6)
            # mean = counts * p/(1-p); var = mean / (1-p)  =>  p = 1 - mean/var
            p = 1 - mu / var
            counts = mu * (1 - p) / np.maximum(p, 1e-6)
            self._w0 = np.log(np.maximum(w, 1e-6))
            self._counts0 = np.log(np.maximum(counts, 1e-6))
            self._logits0 = np.log(np.maximum(p, 1e-6)) - np.log(np.maximum(1 - p, 1e-6))
        else:
            self._w0 = rng.normal(size=n)
            self._counts0 = rng.normal(size=n)
            self._logits0 = rng.normal(size=n)
        self._z0 = rng.normal(size=n) if zero_inflated else np.zeros(n)
        self._params = None

    def train(self, n_epochs: int = 500):
        params, losses = _fit_mixture(
            jnp.asarray(self.x),
            jnp.asarray(self._w0, jnp.float32),
            jnp.asarray(self._counts0, jnp.float32),
            jnp.asarray(self._logits0, jnp.float32),
            jnp.asarray(self._z0, jnp.float32),
            n_epochs,
            self.zero_inflated,
        )
        self._params = {k: np.asarray(v) for k, v in params.items()}
        return float(losses[-1])

    def get_params(self) -> Dict[str, np.ndarray]:
        if self._params is None:
            self.train()
        out = {"w": self._params["w"], "counts": np.exp(self._params["counts"]), "logits": self._params["logits"]}
        if self.zero_inflated:
            out["z"] = self._params["z"]
        return out

    @staticmethod
    def conditionals(params, x, use_weights: bool = False):
        """Per-component pmfs sorted by component mean (parity: vi.py:151)."""
        x = jnp.asarray(np.asarray(x, dtype=np.float32))
        w = np.asarray(params["w"], float)
        counts = np.asarray(params["counts"], float)
        logits = np.asarray(params["logits"], float)
        n = len(w)
        z = np.asarray(params.get("z", np.full(n, -np.inf)), float)
        gate = 1 / (1 + np.exp(-z))
        means = (1 - gate) * counts * np.exp(logits)
        weights = np.exp(w - w.max())
        weights = weights / weights.sum()
        conds = []
        for i in sorted(range(n), key=lambda i: means[i]):
            if np.isfinite(z[i]):
                lp = _zinb_logpmf(x, counts[i], logits[i], z[i])
            else:
                lp = _nb_logpmf_count_logits(x, counts[i], logits[i])
            cond = np.asarray(jnp.exp(lp))
            if use_weights:
                cond = cond * weights[i]
            conds.append(cond)
        return tuple(conds)


def conditionals(
    X: np.ndarray,
    vi_results: Union[Dict[int, Dict[str, np.ndarray]], Dict[str, np.ndarray]],
    bins: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Background/cell conditional pmfs from VI results (parity: vi.py:176)."""
    if "counts" not in vi_results:
        if bins is None:
            raise SegmentationError("`vi_results` indicate binning was used, but `bins` was not provided")
        background_cond = np.ones(X.shape)
        cell_cond = np.zeros(X.shape)
        for label, params in vi_results.items():
            mask = bins == label
            conds = NegativeBinomialMixture.conditionals(params, X[mask])
            background_cond[mask], cell_cond[mask] = conds[0], conds[-1]
    else:
        conds = NegativeBinomialMixture.conditionals(vi_results, X)
        background_cond, cell_cond = conds[0], conds[-1]
    return background_cond, cell_cond


def run_vi(
    X: np.ndarray,
    downsample: Union[int, float] = 0.01,
    n_epochs: int = 500,
    bins: Optional[np.ndarray] = None,
    params: Union[Dict[str, Tuple[float, float]], Dict[int, Dict[str, Tuple[float, float]]]] = dict(
        w=(0.5, 0.5), mu=(10.0, 300.0), var=(20.0, 400.0)
    ),
    zero_inflated: bool = False,
    seed: Optional[int] = None,
) -> Union[Dict, Dict[int, Dict]]:
    """NB/ZINB mixture VI over the raster, per density bin (parity: vi.py:214)."""
    samples = {}
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
    results = {}
    for label, _samples in samples.items():
        n_target = int(len(_samples) * downsample) if downsample_scale else int(downsample * (len(_samples) / total))
        if len(_samples) > n_target:
            _samples = rng.choice(_samples, n_target, replace=False)
        nbm = NegativeBinomialMixture(
            np.asarray(_samples), zero_inflated=zero_inflated, seed=seed, **params.get(label, params)
        )
        nbm.train(n_epochs)
        results[label] = nbm.get_params()
    return results if bins is not None else results[0]
