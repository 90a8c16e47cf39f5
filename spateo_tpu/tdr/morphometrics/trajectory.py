"""Cell-fate trajectory integration through the morphofield
(capability parity: reference spateo/tdr/morphometrics/morphofield/trajectory.py:11
— scipy ODE integration through the field). TPU-native: fixed-step RK4 inside
a jitted `lax.scan` for all cells at once."""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...core.anndata import AnnData
from ...logging import logger_manager as lm
from .morphofield_dg.GPVectorField import _field_fn_from_dict


@partial(jax.jit, static_argnames=("n_steps", "fn"))
def _rk4_integrate(fn, X0: jnp.ndarray, dt: float, n_steps: int):
    vf = jax.vmap(fn)

    def step(x, _):
        k1 = vf(x)
        k2 = vf(x + dt / 2 * k1)
        k3 = vf(x + dt / 2 * k2)
        k4 = vf(x + dt * k3)
        x_new = x + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
        return x_new, x_new

    _, traj = jax.lax.scan(step, X0, None, length=n_steps)
    return traj  # [n_steps, N, D]


def morphopath(
    adata: AnnData,
    vf_key: str = "VecFld_morpho",
    key_added: str = "fate_morpho",
    layer: str = "X",
    direction: str = "forward",
    interpolation_num: int = 250,
    t_end: Optional[float] = None,
    average: bool = False,
    cores: int = 1,
    inplace: bool = True,
    **kwargs,
) -> Optional[AnnData]:
    """Integrate trajectories of all cells through the learned field
    (parity: trajectory.py:11)."""
    adata = adata if inplace else adata.copy()
    vf_dict = adata.uns[vf_key]
    fn = _field_fn_from_dict(dict(vf_dict))
    X0 = np.asarray(vf_dict["X"], dtype=np.float32)
    if t_end is None:
        # heuristic: traverse the data diameter at the median speed
        V = np.asarray(vf_dict["V"])
        speed = np.median(np.linalg.norm(V, axis=1)) + 1e-12
        diameter = np.linalg.norm(X0.max(0) - X0.min(0))
        t_end = float(diameter / speed)
    dt = t_end / interpolation_num
    sign = -1.0 if direction == "backward" else 1.0
    traj = np.asarray(_rk4_integrate(fn, jnp.asarray(X0), sign * dt, interpolation_num))
    traj = np.concatenate([X0[None], traj], axis=0)  # [T+1, N, D]
    t = np.linspace(0, t_end, interpolation_num + 1)
    adata.uns[key_added] = {
        "t": t,
        "prediction": [traj[:, i, :].T for i in range(traj.shape[1])],
        "X": X0,
        "direction": direction,
    }
    if average:
        adata.uns[key_added]["average"] = traj.mean(axis=1)
    return None if inplace else adata
