"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is not available in CI; sharding/collective paths are
validated on XLA's host platform with 8 virtual devices (same approach the
driver uses for `dryrun_multichip`).
"""

import os

# Must run before the first JAX backend initialization. The image's
# sitecustomize imports jax at interpreter start (latching JAX_PLATFORMS=axon),
# so we switch via jax.config rather than the environment variable.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pandas as pd
import pytest
from scipy import sparse


@pytest.fixture
def rng():
    return np.random.default_rng(2021)


def make_random_adata(shape=(50, 30), seed=2021, adata_type="UMI", sparse_x=True):
    import spateo_tpu as st

    rng = np.random.default_rng(seed)
    X = rng.poisson(0.6, size=shape).astype(np.float32)
    if sparse_x:
        X = sparse.csr_matrix(X)
    adata = st.AnnData(
        X=X,
        obs=pd.DataFrame(index=[str(i) for i in range(shape[0])]),
        var=pd.DataFrame(index=[f"gene_{i}" for i in range(shape[1])]),
    )
    st.SKM.init_adata_type(adata, adata_type)
    return adata


@pytest.fixture
def random_adata():
    return make_random_adata()


@pytest.fixture
def random_agg_adata():
    return make_random_adata(shape=(64, 64), adata_type="AGG", sparse_x=False)


def pytest_addoption(parser):
    parser.addoption(
        "--slow-shard",
        default=None,
        help="Run ONE balanced shard of the slow tests, e.g. --slow-shard=1/3 "
        "(1-indexed). Non-slow tests are deselected; shards are packed "
        "greedily by the durations recorded in tests/_slow_manifest.py so "
        "each completes in a bounded wall time (CI-shaping, VERDICT r4 #8).",
    )


def pytest_collection_modifyitems(config, items):
    """Mark tests listed in tests/_slow_manifest.py as slow (>= 3 s on the
    CI host) so `-m "not slow"` gives a <3-minute fast path. The manifest is
    regenerated from `--durations=0` output; parametrized tests match by
    their bracket-free base node id. With --slow-shard=k/n, keep only the
    k-th duration-balanced shard of the slow tests."""
    from _slow_manifest import SLOW_TESTS

    for item in items:
        if item.nodeid.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)

    shard = config.getoption("--slow-shard")
    if not shard:
        return
    k, n = (int(x) for x in shard.split("/"))
    if not (1 <= k <= n):
        raise pytest.UsageError(f"--slow-shard index out of range: {shard}")
    durations = SLOW_TESTS if isinstance(SLOW_TESTS, dict) else {t: 10.0 for t in SLOW_TESTS}
    # group by base id (parametrized variants travel together), then pack
    # groups onto shards longest-first (greedy LPT)
    groups = {}
    for item in items:
        base = item.nodeid.split("[")[0]
        if base in durations:
            groups.setdefault(base, []).append(item)
    loads = [0.0] * n
    assign = {}
    for base in sorted(groups, key=lambda b: -durations.get(b, 10.0)):
        tgt = loads.index(min(loads))
        loads[tgt] += durations.get(base, 10.0) * len(groups[base])
        assign[base] = tgt
    keep = []
    deselect = []
    for item in items:
        base = item.nodeid.split("[")[0]
        if assign.get(base) == k - 1:
            keep.append(item)
        else:
            deselect.append(item)
    if deselect:
        config.hook.pytest_deselected(items=deselect)
    items[:] = keep
