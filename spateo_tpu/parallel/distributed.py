"""Multi-host (DCN) initialization and cross-host utilities.

The reference has no distributed backend at all — its MuSIC engine is
*designed* for MPI but runs serially (reference
spateo/tools/CCI_effects_modeling/MuSIC.py:44 docstring, `mpi_fit` :2940).
Here distribution is a first-class layer (SURVEY §2.12/§5.8): single-host
multi-chip scaling goes through `create_mesh` + NamedSharding (ICI
collectives compiled by GSPMD); THIS module adds the multi-host story —
`jax.distributed.initialize` bootstrapping, global mesh construction over
all hosts, and host-local array assembly for data too large to replicate.

Typical multi-host entry (same program on every host, e.g. one per TPU
slice worker):

    import spateo_tpu as st
    st.parallel.initialize_distributed()          # env-driven (TPU pods)
    mesh = st.parallel.global_mesh(("data",))     # all chips on all hosts
    # ... device_put host-local shards with make_global_array ...

Test-coverage honesty: this environment has ONE host, so CI exercises the
single-host path only (initialize_distributed's no-op branch, global_mesh
over local devices, make_global_array's single-host assembly). The
env-driven `jax.distributed.initialize` branch and true cross-host
`make_global_array` assembly follow the documented upstream API but have
not executed on real multi-host hardware here.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

from ..logging import logger_manager as lm

_initialized = False


def is_distributed() -> bool:
    """Whether multi-host JAX has been initialized in this process."""
    return _initialized


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Initialize JAX multi-host (DCN) execution.

    On TPU pods all arguments resolve automatically from the environment
    (`jax.distributed.initialize()` with no args); for manual clusters pass
    the coordinator `host:port`, the world size and this process's rank.
    Safe to call more than once (subsequent calls are no-ops) and safe to
    call single-host (falls back to a no-op with a log line)."""
    global _initialized
    if _initialized:
        return
    import jax

    try:
        if coordinator_address is None and num_processes is None and "COORDINATOR_ADDRESS" not in os.environ:
            # TPU-pod autodetection path — decide from the environment ONLY:
            # touching the backend (jax.process_count) before
            # jax.distributed.initialize() would lock it single-process
            workers = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
            if len(workers) > 1 or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"):
                jax.distributed.initialize()
            else:
                lm.main_debug("single-host environment: distributed initialization not needed")
                return
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address or os.environ.get("COORDINATOR_ADDRESS"),
                num_processes=num_processes,
                process_id=process_id,
                local_device_ids=local_device_ids,
            )
        _initialized = jax.process_count() > 1
        lm.main_info(
            f"distributed: {jax.process_count()} process(es), "
            f"{jax.local_device_count()} local / {jax.device_count()} global devices"
        )
    except Exception as e:  # pragma: no cover - environment-specific
        lm.main_warning(f"distributed initialization skipped: {e}")


def global_mesh(axis_names: Tuple[str, ...] = ("data",), shape: Optional[Tuple[int, ...]] = None):
    """A Mesh over ALL devices of ALL hosts (DCN-spanning when
    multi-host). With one axis the full device count lands on it; an
    explicit `shape` must multiply out to `jax.device_count()`.

    Axis-order convention follows the scaling playbook: the FIRST axis is
    the slowest (DCN-adjacent) axis — shard the batch/cell dimension over
    it; later axes stay within a host/slice where ICI is fastest."""
    import jax
    from jax.sharding import Mesh

    n = jax.device_count()
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    if int(np.prod(shape)) != n:
        from ..errors import MeshError

        raise MeshError(f"mesh shape {shape} does not multiply out to {n} devices")
    devices = np.asarray(jax.devices()).reshape(shape)
    return Mesh(devices, axis_names)


def make_global_array(local_rows: np.ndarray, mesh, axis_name: str = "data"):
    """Assemble a row-sharded global array from each host's local rows
    (`jax.make_array_from_process_local_data`) — the host-side bridge for
    data too large to replicate (SURVEY §5.8 'zero-copy sparse
    aggregation'). Single-host this is just a device_put with a row
    sharding."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axis_name, *([None] * (np.ndim(local_rows) - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(local_rows), sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(local_rows))


def process_allgather(x: np.ndarray):
    """All-gather a small host-local array across processes (returns the
    [num_processes, ...] stack on every host). Used for host-side metadata
    (per-shard row counts, convergence flags); single-host returns
    x[None]."""
    import jax

    if jax.process_count() == 1:
        return np.asarray(x)[None]
    # multihost_utils handles hosts with any local device count (a
    # hand-rolled mesh over all devices cannot split a [num_processes]
    # axis across num_devices > num_processes shards)
    from jax.experimental import multihost_utils

    # tiled=False adds the leading [num_processes] axis, matching the
    # single-host x[None] contract
    return np.asarray(multihost_utils.process_allgather(np.asarray(x), tiled=False))
