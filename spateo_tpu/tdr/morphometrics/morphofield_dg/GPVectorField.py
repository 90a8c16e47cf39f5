"""Differential geometry of learned vector fields — autodiff on device.

Capability parity with reference
spateo/tdr/morphometrics/morphofield_dg/GPVectorField.py:12-260 (acceleration
:12, curvature :35, curl :55, torsion :74, divergence :97, sensitivity :124,
analytic `Jacobian_GP_gaussian_kernel`:143, `GPVectorField`:193).

TPU-native redesign: instead of the hand-derived Gauss-kernel Jacobian, every
differential operator comes from `jax.jacfwd` of the field function — exact to
machine precision for ANY kernel, vmapped over batches of points."""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ....logging import logger_manager as lm


def _field_fn_from_dict(vf_dict: dict) -> Callable:
    """Single-point jittable field evaluation for either field flavor."""
    method = vf_dict.get("method", "sparsevfc")
    if method == "gaussian_process":
        norm = vf_dict["norm_dict"]
        mean_t = jnp.asarray(np.asarray(norm["mean_transformed"]), jnp.float32)
        scale_t = jnp.asarray(np.asarray(norm["scale_transformed"]), jnp.float32)
        mean_f = jnp.asarray(np.asarray(norm["mean_fixed"]), jnp.float32)
        scale_f = jnp.asarray(np.asarray(norm["scale_fixed"]), jnp.float32)
        inducing = jnp.asarray(np.asarray(vf_dict["inducing_variables"]), jnp.float32)
        Coff = jnp.asarray(np.asarray(vf_dict["Coff"]), jnp.float32)
        R = jnp.asarray(np.asarray(vf_dict["R"]), jnp.float32)
        t = jnp.asarray(np.asarray(vf_dict["t"]), jnp.float32)
        beta = float(vf_dict["beta"])
        nonrigid_only = bool(vf_dict.get("nonrigid_only", False))

        def fn(x):
            norm_x = (x - mean_t) / scale_t
            K = jnp.exp(-beta * jnp.sum((norm_x[None, :] - inducing) ** 2, axis=1))
            vel = K @ Coff
            if nonrigid_only:
                out = vel * scale_f + (scale_f - scale_t) * norm_x
            else:
                rigid = norm_x @ R.T + t
                out = (vel + rigid) * scale_f + mean_f - x
            return out / 10000.0

        return fn

    ctrl = jnp.asarray(np.asarray(vf_dict["X_ctrl"]), jnp.float32)
    C = jnp.asarray(np.asarray(vf_dict["C"]), jnp.float32)
    beta = float(vf_dict["beta"])

    def fn(x):
        K = jnp.exp(-beta * jnp.sum((x[None, :] - ctrl) ** 2, axis=1))
        return K @ C

    return fn


def _batched(fn):
    return jax.jit(jax.vmap(fn))


def compute_acceleration(vf, f_jac, X, Js=None, return_all: bool = False):
    """a = J v (parity: GPVectorField.py:12)."""
    X = np.asarray(X, np.float32)
    V = vf(X)
    J = f_jac(X)
    acc = np.einsum("nij,nj->ni", J, V)
    if return_all:
        return acc, np.linalg.norm(acc, axis=1)
    return acc


def compute_curvature(vf, f_jac, X, Js=None, formula: int = 2):
    """kappa = (J v x v) terms (parity: GPVectorField.py:35)."""
    X = np.asarray(X, np.float32)
    V = vf(X)
    a = compute_acceleration(vf, f_jac, X)
    v_norm2 = np.sum(V**2, axis=1, keepdims=True)
    if formula == 1:
        kur = a / np.maximum(v_norm2, 1e-12)
    else:
        proj = np.sum(a * V, axis=1, keepdims=True) * V / np.maximum(v_norm2, 1e-12)
        kur = (a - proj) / np.maximum(v_norm2, 1e-12)
    return kur, np.linalg.norm(kur, axis=1)


def compute_curl(f_jac, X):
    """3D curl from the Jacobian (parity: GPVectorField.py:55)."""
    J = f_jac(np.asarray(X, np.float32))
    if J.shape[1] == 2:
        return J[:, 1, 0] - J[:, 0, 1]
    curl = np.stack(
        [
            J[:, 2, 1] - J[:, 1, 2],
            J[:, 0, 2] - J[:, 2, 0],
            J[:, 1, 0] - J[:, 0, 1],
        ],
        axis=1,
    )
    return curl


def compute_torsion(vf, f_jac, X):
    """Per-cell torsion matrices (parity: GPVectorField.py:74-95 — the
    reference's tau_i = outer(v,a)·(J a)/||outer(v,a)||² vector row-broadcast
    into a [D, D] block; we reproduce that output contract exactly)."""
    X = np.asarray(X, np.float32)
    if X.shape[1] != 3:
        raise ValueError("torsion is only defined in 3 dimensions.")
    V = vf(X)
    J = f_jac(X)
    a = np.einsum("nij,nj->ni", J, V)
    Ja = np.einsum("nij,nj->ni", J, a)
    outer = V[:, :, None] * a[:, None, :]  # outer(v, a) per cell
    vec = np.einsum("nij,nj->ni", outer, Ja)  # outer(v,a) @ (J a)
    denom = np.maximum(np.sum(outer**2, axis=(1, 2)), 1e-12)  # ||outer||_F^2
    tau_vec = vec / denom[:, None]
    # row-broadcast [n, 3] -> [n, 3, 3], matching tor[i] = vec in the reference
    return np.broadcast_to(tau_vec[:, None, :], (len(X), 3, 3)).copy()


def compute_divergence(f_jac, X: np.ndarray, Js=None, vectorize_size: Optional[int] = 1000) -> np.ndarray:
    """div = tr(J) (parity: GPVectorField.py:97), blocked.
    vectorize_size=None vectorizes all samples at once (reference contract)."""
    X = np.asarray(X, np.float32)
    if vectorize_size is None:
        vectorize_size = len(X)
    out = np.zeros(len(X), np.float32)
    for s in range(0, len(X), vectorize_size):
        J = f_jac(X[s : s + vectorize_size])
        out[s : s + J.shape[0]] = np.trace(J, axis1=1, axis2=2)
    return out


def compute_sensitivity(f_jac, X):
    """Element-wise response sensitivity from the Jacobian (parity:
    GPVectorField.py:124)."""
    J = f_jac(np.asarray(X, np.float32))
    # S_ij = |J_ij| / sum_k |J_ik| : relative influence of x_j on v_i
    absJ = np.abs(J)
    return absJ / np.maximum(absJ.sum(axis=2, keepdims=True), 1e-12)


def Jacobian_GP_gaussian_kernel(X: np.ndarray, vf_dict: dict, vectorize: bool = False) -> np.ndarray:
    """Jacobian of the GP field (parity surface: GPVectorField.py:143; here
    exact autodiff instead of the hand-derived RBF formula)."""
    fn = _field_fn_from_dict(vf_dict)
    jac = _batched(jax.jacfwd(fn))
    return np.asarray(jac(jnp.asarray(np.atleast_2d(X), jnp.float32)))


class GPVectorField:
    """Vector field + differential geometry (parity surface:
    GPVectorField.py:193)."""

    def __init__(self):
        self.vf_dict = {}

    def from_adata(self, adata, vf_key: str = "VecFld", nonrigid_only: bool = False):
        if vf_key not in adata.uns:
            raise KeyError(f"`{vf_key}` not found in `.uns`. Run a morphofield function first.")
        self.vf_dict = dict(adata.uns[vf_key])
        if nonrigid_only:
            self.vf_dict["nonrigid_only"] = True
        self._fn = _field_fn_from_dict(self.vf_dict)
        self._vf = _batched(self._fn)
        self._jac = _batched(jax.jacfwd(self._fn))
        self.data = {
            "X": np.asarray(self.vf_dict.get("X")),
            "V": np.asarray(self.vf_dict.get("V")),
        }

    def get_data(self) -> Tuple[np.ndarray, np.ndarray]:
        return self.data["X"], self.data["V"]

    def get_X(self):
        return self.data["X"]

    def get_V(self):
        return self.data["V"]

    def compute_velocity(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(self._vf(jnp.asarray(np.atleast_2d(X), jnp.float32)))

    def get_Jacobian(self, method: str = "analytical", **kwargs) -> Callable:
        """'analytical' = forward-mode autodiff (exact for any kernel);
        'numerical' = vmapped central finite differences — the reference's
        numdifftools route (GPVectorField.py:236-249), kept so results can be
        cross-checked between independent differentiation schemes."""
        if method == "numerical":
            fn = self._fn
            step = kwargs.get("step", 1e-2)

            def num_jac_single(x):
                # TPUs lower f32 matmuls to bf16 by default — fatal for
                # finite differences (the bf16 rounding noise, ~1e-2
                # relative, divides by 2*step). Force true f32 here.
                with jax.default_matmul_precision("highest"):
                    eye = jnp.eye(x.shape[0], dtype=x.dtype) * step
                    plus = jax.vmap(lambda e: fn(x + e))(eye)   # rows: f(x+h e_j)
                    minus = jax.vmap(lambda e: fn(x - e))(eye)
                    return ((plus - minus) / (2 * step)).T      # J_ij = d f_i / d x_j

            num_jac = _batched(num_jac_single)
            return lambda X: np.asarray(num_jac(jnp.asarray(np.atleast_2d(X), jnp.float32)))
        return lambda X: np.asarray(self._jac(jnp.asarray(np.atleast_2d(X), jnp.float32)))

    def compute_acceleration(self, X: Optional[np.ndarray] = None, method: str = "analytical", **kwargs):
        X = self.data["X"] if X is None else X
        return compute_acceleration(self.compute_velocity, self.get_Jacobian(method=method), X, **kwargs)

    def compute_curvature(
        self, X: Optional[np.ndarray] = None, formula: int = 2, method: str = "analytical", **kwargs
    ):
        X = self.data["X"] if X is None else X
        return compute_curvature(self.compute_velocity, self.get_Jacobian(method=method), X, formula=formula, **kwargs)

    def compute_curl(self, X: Optional[np.ndarray] = None, method: str = "analytical", **kwargs):
        X = self.data["X"] if X is None else X
        return compute_curl(self.get_Jacobian(method=method), X)

    def compute_torsion(self, X: Optional[np.ndarray] = None, method: str = "analytical", **kwargs) -> np.ndarray:
        X = self.data["X"] if X is None else X
        return compute_torsion(self.compute_velocity, self.get_Jacobian(method=method), X)

    def compute_divergence(self, X: Optional[np.ndarray] = None, method: str = "analytical", **kwargs) -> np.ndarray:
        X = self.data["X"] if X is None else X
        return compute_divergence(self.get_Jacobian(method=method), X, **kwargs)

    def compute_sensitivity(self, X: Optional[np.ndarray] = None, method: str = "analytical", **kwargs) -> np.ndarray:
        X = self.data["X"] if X is None else X
        return compute_sensitivity(self.get_Jacobian(method=method), X)
