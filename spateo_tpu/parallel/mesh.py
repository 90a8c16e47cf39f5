"""Device-mesh construction and sharding helpers.

This is the framework's distribution layer — the TPU-native replacement for
what the reference left vestigial (an mpi4py design in MuSIC, reference
spateo/tools/CCI_effects_modeling/MuSIC.py:44,2940, and single-node
thread/process pools elsewhere; see SURVEY.md §2.12). All cross-chip traffic
in this framework rides XLA collectives over ICI inside jit; multi-host
extends over DCN via `jax.distributed.initialize`.

Design:
- one global `Mesh` (from `spateo_tpu.configuration.config.mesh`) with named
  axes, default `("data",)` over all devices;
- `shard_rows(x)` — batch/row sharding for embarrassingly-parallel fan-outs
  (pixel tiles in segmentation, cells in MuSIC local fits, genes in SVG);
- `shard_pairwise(P)` — 2D sharding of NA x NB assignment/distance blocks in
  the alignment E-step (rows on 'data', cols on 'model');
- `pad_to_multiple` — static-shape padding so sharded dims divide evenly.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..errors import MeshError


def create_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("data", "model"),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a device mesh.

    If `shape` is None, all devices go on the first axis and remaining axes
    get size 1. Raises MeshError if shape does not match the device count.
    """
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if math.prod(shape) != n:
        raise MeshError(f"mesh shape {shape} does not cover {n} devices")
    if len(shape) != len(axis_names):
        raise MeshError(f"mesh shape {shape} has {len(shape)} axes but {len(axis_names)} names given")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def mesh_axis_size(mesh: Mesh, axis: str) -> int:
    return mesh.shape[axis]


def row_sharding(mesh: Mesh, axis: str = "data", ndim: int = 2) -> NamedSharding:
    """Shard dim 0 on `axis`, replicate the rest."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def pairwise_sharding(mesh: Mesh, row_axis: str = "data", col_axis: str = "model") -> NamedSharding:
    """2D sharding for NA x NB pairwise blocks (alignment E-step)."""
    return NamedSharding(mesh, P(row_axis, col_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    """Smallest multiple of m that is >= n (static-shape padding helper)."""
    return ((n + m - 1) // m) * m


def pad_rows(x, multiple: int, fill=0.0):
    """Pad dim 0 of `x` up to a multiple, returning (padded, original_n)."""
    import jax.numpy as jnp

    n = x.shape[0]
    target = pad_to_multiple(max(n, 1), multiple)
    if target == n:
        return x, n
    pad_widths = [(0, target - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_widths, constant_values=fill), n


def shard_rows(x, mesh: Optional[Mesh] = None, axis: str = "data"):
    """Place `x` on the mesh with dim 0 sharded over `axis` (padding as needed).

    Returns (sharded_array, original_n). The pad rows are zero; kernels mask
    by original_n.
    """
    from ..configuration import config

    mesh = mesh or config.mesh
    size = mesh.shape[axis]
    x, n = pad_rows(x, size)
    sharding = row_sharding(mesh, axis, x.ndim)
    return jax.device_put(x, sharding), n


def local_device_count() -> int:
    return jax.local_device_count()


def device_count() -> int:
    return jax.device_count()
