"""Deep-learning interpolation (MLP / SIREN)
(capability parity: reference spateo/tdr/interpolations/interpolation_dl.py:13
+ interpolation_deeplearn/deep_interpolation.py:20 — torch training loop with
A/B/h blocks, interpolation_nn.py:220). TPU-native: a jitted optax training
loop over a SIREN-style coordinate network."""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ...core.anndata import AnnData
from ...logging import logger_manager as lm
from .utils import get_X_Y_grid


def _init_siren(key, sizes, w0: float = 5.0):
    params = []
    keys = jax.random.split(key, len(sizes) - 1)
    for i, (k, (a, b)) in enumerate(zip(keys, zip(sizes[:-1], sizes[1:]))):
        bound = (1.0 / a) if i == 0 else (jnp.sqrt(6.0 / a) / w0)
        W = jax.random.uniform(k, (a, b), minval=-bound, maxval=bound)
        params.append({"W": W, "b": jnp.zeros(b)})
    return params


def _siren_forward(params, x, w0: float = 5.0):
    h = x
    for i, layer in enumerate(params[:-1]):
        h = jnp.sin(w0 * (h @ layer["W"] + layer["b"])) if i == 0 else jnp.sin(h @ layer["W"] + layer["b"])
    return h @ params[-1]["W"] + params[-1]["b"]


class DeepInterpolation:
    """Coordinate-network interpolator (parity surface: reference
    deep_interpolation.py:20)."""

    def __init__(
        self,
        model=None,
        data_sampler=None,
        sirens: bool = True,
        enforce_positivity: bool = True,
        hidden: int = 256,
        depth: int = 4,
        seed: int = 0,
        **kwargs,
    ):
        self.sirens = sirens
        self.enforce_positivity = enforce_positivity
        self.hidden = hidden
        self.depth = depth
        self.seed = seed
        self.params = None
        self.norm = None

    def train(self, X: np.ndarray, Y: np.ndarray, max_iter: int = 1000, lr: float = 1e-4, batch_size: int = 4096):
        X = np.asarray(X, np.float32)
        Y = np.asarray(Y, np.float32)
        x_mean, x_std = X.mean(0), X.std(0) + 1e-8
        y_mean, y_std = Y.mean(0), Y.std(0) + 1e-8
        self.norm = (x_mean, x_std, y_mean, y_std)
        Xn = (X - x_mean) / x_std
        Yn = (Y - y_mean) / y_std
        sizes = [X.shape[1]] + [self.hidden] * self.depth + [Y.shape[1]]
        key = jax.random.PRNGKey(self.seed)
        params = _init_siren(key, sizes)

        import optax

        opt = optax.adam(lr)

        @partial(jax.jit, static_argnames=("n",))
        def fit(params, Xd, Yd, key, n):
            state = opt.init(params)

            def loss_fn(params, idx):
                pred = _siren_forward(params, Xd[idx])
                return jnp.mean((pred - Yd[idx]) ** 2)

            def step(carry, _):
                params, state, key = carry
                key, sub = jax.random.split(key)
                idx = jax.random.randint(sub, (min(batch_size, Xd.shape[0]),), 0, Xd.shape[0])
                loss, grads = jax.value_and_grad(loss_fn)(params, idx)
                updates, state = opt.update(grads, state)
                params = optax.apply_updates(params, updates)
                return (params, state, key), loss

            (params, _, _), losses = jax.lax.scan(step, (params, state, key), None, length=n)
            return params, losses

        self.params, losses = fit(params, jnp.asarray(Xn), jnp.asarray(Yn), key, max_iter)
        lm.main_info(f"DeepInterpolation trained: mse {float(losses[0]):.4f} -> {float(losses[-1]):.4f}")
        return np.asarray(losses)

    def predict(self, Xnew: np.ndarray) -> np.ndarray:
        x_mean, x_std, y_mean, y_std = self.norm
        Xn = (np.asarray(Xnew, np.float32) - x_mean) / x_std
        pred = np.asarray(_siren_forward(self.params, jnp.asarray(Xn))) * y_std + y_mean
        if self.enforce_positivity:
            pred = np.maximum(pred, 0)
        return pred


# -- network building blocks + data plumbing (parity: reference
# interpolation_deeplearn/interpolation_nn.py SineLayer/MainFlow and
# deep_interpolation.py:371 DataSampler — torch modules become
# parameter-dict callables) -------------------------------------------------


class SineLayer:
    """One SIREN layer sin(w0 (xW + b)) with the SIREN init scheme (parity
    surface: reference interpolation_nn.py SineLayer)."""

    def __init__(self, in_features: int, out_features: int, is_first: bool = False, omega_0: float = 30.0, seed: int = 0):
        self.in_features = in_features
        self.out_features = out_features
        self.is_first = is_first
        self.omega_0 = omega_0
        key = jax.random.PRNGKey(seed)
        bound = (1.0 / in_features) if is_first else (float(jnp.sqrt(6.0 / in_features)) / omega_0)
        self.params = {
            "W": jax.random.uniform(key, (in_features, out_features), minval=-bound, maxval=bound),
            "b": jnp.zeros(out_features),
        }

    def __call__(self, x, params=None):
        p = params or self.params
        return jnp.sin(self.omega_0 * (jnp.asarray(x) @ p["W"] + p["b"]))


class _LeakyMLP:
    """Shared machinery for the reference's A/B lift/head blocks
    (interpolation_nn.py:10 `A`, :49 `B`): Linear -> hidden Linears ->
    out Linear with leaky-relu activations, as parameter-dict callables."""

    def __init__(self, in_dim: int, out_dim: int, hidden_features: int, hidden_layers: int, seed: int):
        keys = jax.random.split(jax.random.PRNGKey(seed), hidden_layers + 2)
        sizes = [in_dim] + [hidden_features] * (hidden_layers + 1) + [out_dim]
        self.params = [
            {
                "W": jax.random.normal(k, (a, b)) * (2.0 / (a + b)) ** 0.5,
                "b": jnp.zeros(b),
            }
            for k, a, b in zip(keys, sizes[:-1], sizes[1:])
        ]

    def __call__(self, x, params=None):
        p = params or self.params
        out = jnp.asarray(x)
        for i, layer in enumerate(p):
            out = out @ layer["W"] + layer["b"]
            if i < len(p) - 1:
                out = jax.nn.leaky_relu(out, negative_slope=0.2)
        return out


class A(_LeakyMLP):
    """Input lift data_dim -> network_dim (parity surface: reference
    interpolation_nn.py:10 `A`; defaults match: 256 hidden features, one
    hidden layer, leaky-relu)."""

    def __init__(self, network_dim: int, data_dim: int, hidden_features: int = 256, hidden_layers: int = 1, seed: int = 0):
        super().__init__(data_dim, network_dim, hidden_features, hidden_layers, seed)
        self.name = "model/A"


class B(_LeakyMLP):
    """Output head network_dim -> data_dim (parity surface: reference
    interpolation_nn.py:49 `B`; defaults match: 256 hidden features, three
    hidden layers, leaky-relu)."""

    def __init__(self, network_dim: int, data_dim: int, hidden_features: int = 256, hidden_layers: int = 3, seed: int = 0):
        super().__init__(network_dim, data_dim, hidden_features, hidden_layers, seed)
        self.name = "model/B"


class h:
    """The main coordinate network (parity surface: reference
    interpolation_nn.py:132 `h`): SIREN sine layers when ``sirens=True``
    (first layer at first_omega_0), otherwise a leaky-relu MLP."""

    def __init__(
        self,
        input_network_dim: int,
        output_network_dim: int,
        hidden_features: int = 256,
        hidden_layers: int = 3,
        sirens: bool = False,
        first_omega_0: float = 30.0,
        hidden_omega_0: float = 30.0,
        seed: int = 0,
    ):
        self.sirens = bool(sirens)
        self.name = "model/h"
        if self.sirens:
            self.layers = [SineLayer(input_network_dim, hidden_features, is_first=True, omega_0=first_omega_0, seed=seed)]
            self.layers += [
                SineLayer(hidden_features, hidden_features, is_first=False, omega_0=hidden_omega_0, seed=seed + 1 + i)
                for i in range(hidden_layers)
            ]
            key = jax.random.PRNGKey(seed + 99)
            bound = float(jnp.sqrt(6.0 / hidden_features)) / hidden_omega_0
            self.out = {
                "W": jax.random.uniform(key, (hidden_features, output_network_dim), minval=-bound, maxval=bound),
                "b": jnp.zeros(output_network_dim),
            }
        else:
            self._mlp = _LeakyMLP(input_network_dim, output_network_dim, hidden_features, hidden_layers, seed)

    def __call__(self, x):
        return self.forward(x)

    def forward(self, x):
        if not self.sirens:
            return self._mlp(x)
        out = jnp.asarray(x)
        for layer in self.layers:
            out = layer(out)
        return out @ self.out["W"] + self.out["b"]


class MainFlow:
    """The A -> h -> B composed flow of the deep interpolator (parity
    surface: reference interpolation_nn.py:220 `MainFlow`: optional input
    lift A, main coordinate network h, optional output head B)."""

    def __init__(self, h, A=None, B=None):
        self.h = h
        self.A = A
        self.B = B

    def __call__(self, t=None, x=None, freeze=None):
        out = jnp.asarray(x)
        if self.A is not None:
            out = self.A(out)
        out = self.h(out)
        if self.B is not None:
            out = self.B(out)
        return out


class DataSampler:
    """Holds (X, Y) training pairs and yields random minibatches (parity
    surface: reference deep_interpolation.py:371 `DataSampler`, which loads
    from a .mat file or AnnData; here from arrays or an AnnData + keys)."""

    def __init__(self, path_to_data=None, data=None, skey: str = "spatial", ekey: str = "M_s", wkey=None, normalize_data: bool = False, number_of_random_points: int = 100, seed: int = 0):
        if path_to_data is not None:
            from scipy.io import loadmat

            mat = loadmat(path_to_data)
            X, Y = np.asarray(mat["X"]), np.asarray(mat["Y"])
        elif isinstance(data, dict):
            X, Y = np.asarray(data["X"]), np.asarray(data["Y"])
        elif data is not None:  # AnnData
            X = np.asarray(data.obsm[skey])
            Y = np.asarray(data.layers[ekey] if ekey in getattr(data, "layers", {}) else data.X)
            if hasattr(Y, "toarray"):
                Y = Y.toarray()
        else:
            raise ValueError("provide `path_to_data` or `data`")
        assert X.shape[0] == Y.shape[0], "X and Y must have equal rows"
        self.data = {"X": np.asarray(X, np.float32), "Y": np.asarray(Y, np.float32)}
        self.normalize_data = normalize_data
        if normalize_data:
            self.norm = (self.data["X"].mean(0), self.data["X"].std(0) + 1e-8)
            self.data["X"] = (self.data["X"] - self.norm[0]) / self.norm[1]
        self.number_of_random_points = number_of_random_points
        self._rng = np.random.default_rng(seed)

    def generate_batch(self, batch_size: Optional[int] = None):
        n = self.data["X"].shape[0]
        b = min(batch_size or self.number_of_random_points, n)
        idx = self._rng.choice(n, b, replace=False)
        return self.data["X"][idx], self.data["Y"][idx]


# -- trainer loss factories (parity: reference
# interpolation_deeplearn/nn_losses.py:4-40 — torch lambdas become jnp) -----


def weighted_mean(x, weights):
    """Weighted mean; plain mean when weights is None (parity: nn_losses.py:4)."""
    x = jnp.asarray(x)
    if weights is None:
        return jnp.mean(x)
    weights = jnp.asarray(weights)
    return jnp.sum(weights * x) / jnp.sum(weights)


def weighted_mad():
    """Mean absolute difference (weighted) factory (parity: nn_losses.py:11)."""
    return lambda source, target, weights: weighted_mean(jnp.abs(jnp.asarray(source) - jnp.asarray(target)), weights)


def weighted_mse():
    """Mean squared error (weighted) factory (parity: nn_losses.py:16)."""
    return lambda source, target, weights: weighted_mean(
        jnp.linalg.norm(jnp.asarray(source) - jnp.asarray(target), axis=1) ** 2, weights
    )


def weighted_cosine_distance():
    """Cosine distance (weighted) factory (parity: nn_losses.py:21)."""

    def _loss(source, target, weights):
        s = jnp.asarray(source)
        t = jnp.asarray(target)
        cos = jnp.sum(s * t, axis=-1) / (jnp.linalg.norm(s, axis=-1) * jnp.linalg.norm(t, axis=-1) + 1e-12)
        return 1 - weighted_mean(cos, weights)

    return _loss


def mad():
    """Mean absolute difference factory (parity: nn_losses.py:28)."""
    return lambda source, target: jnp.mean(jnp.abs(jnp.asarray(source) - jnp.asarray(target)))


def mse():
    """Mean squared error factory (parity: nn_losses.py:33)."""
    return lambda source, target: jnp.mean(jnp.linalg.norm(jnp.asarray(source) - jnp.asarray(target), axis=1) ** 2)


def cosine_distance():
    """Cosine distance factory (parity: nn_losses.py:38)."""

    def _loss(source, target):
        s = jnp.asarray(source)
        t = jnp.asarray(target)
        cos = jnp.sum(s * t, axis=-1) / (jnp.linalg.norm(s, axis=-1) * jnp.linalg.norm(t, axis=-1) + 1e-12)
        return 1 - jnp.mean(cos)

    return _loss


def subset_best_samples(best_sample_fraction, y_hat, y, loss_func):
    """Indices of the best-fit fraction of samples under `loss_func`
    (parity: reference deep_interpolation.py:339). Each sample is passed as
    a [1, D] row so the row-wise factories (`mse`, `weighted_*` with their
    axis=1 norms) work per sample; the weighted factories still need their
    3-argument signature bound first (same contract as the reference)."""
    y_hat = np.asarray(y_hat)
    y = np.asarray(y)
    assert y_hat.shape == y.shape, "The shape of the two arrays y_hat and y must be the same."
    diff = np.asarray([float(loss_func(y_hat[i : i + 1], y[i : i + 1])) for i in range(y.shape[0])])
    return np.argsort(diff)[: int(best_sample_fraction * y.shape[0])]


def deep_intepretation(
    source_adata: Optional[AnnData] = None,
    target_points: Optional[np.ndarray] = None,
    keys: Union[str, list, None] = None,
    spatial_key: str = "spatial",
    layer: str = "X",
    max_iter: int = 1000,
    **kwargs,
) -> AnnData:
    """Learn a deep continuous expression field and evaluate it at target
    points (parity: interpolation_dl.py:13; the reference's spelling of
    'interpretation' is preserved)."""
    from scipy.sparse import issparse

    X = np.asarray(source_adata.obsm[spatial_key], dtype=np.float32)
    keys = [keys] if isinstance(keys, str) else (list(keys) if keys else list(source_adata.var_names))
    V = source_adata[:, np.asarray(keys)].X if layer == "X" else source_adata[:, np.asarray(keys)].layers[layer]
    Y = (V.toarray() if issparse(V) else np.asarray(V)).astype(np.float32)

    model = DeepInterpolation(**kwargs)
    model.train(X, Y, max_iter=max_iter)
    target_points = np.asarray(target_points, dtype=np.float32)
    pred = model.predict(target_points)
    interp_adata = AnnData(
        X=pred,
        obs=pd.DataFrame(index=[f"target_{i}" for i in range(len(target_points))]),
        var=pd.DataFrame(index=keys),
    )
    interp_adata.obsm[spatial_key] = target_points
    interp_adata.uns["__type"] = "UMI"
    return interp_adata
