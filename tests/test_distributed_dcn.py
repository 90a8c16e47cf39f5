"""True multi-process (DCN) integration test (VERDICT r3 #6).

Spawns TWO real OS processes, each with 2 virtual CPU devices, bootstraps
them through `spateo_tpu.parallel.initialize_distributed`
(`jax.distributed.initialize` with an explicit coordinator), builds the
global 4-device mesh with `global_mesh`, assembles row-sharded global
arrays from per-process local rows with `make_global_array`, and runs
(1) a cross-process global reduction (GSPMD psum over the process
boundary), (2) a `process_allgather` of host metadata, and (3) one real
sharded Morpho E-step (the `__graft_entry__.entry()` forward fn with
row-sharded coordsA/expA/alpha). Skips, not fails, on timeout — the
coordination service can be slow on loaded CI hosts.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
rank = int(sys.argv[1]); port = sys.argv[2]
sys.path.insert(0, sys.argv[3])
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import spateo_tpu.parallel as par

par.initialize_distributed(coordinator_address=f"127.0.0.1:{port}", num_processes=2, process_id=rank)
assert jax.process_count() == 2, f"process_count {jax.process_count()}"
assert jax.device_count() == 4, f"device_count {jax.device_count()}"
assert par.is_distributed()

mesh = par.global_mesh(("data",))
assert mesh.devices.size == 4

# 1) row-sharded global array from per-process local rows + global reduction
# (GSPMD compiles the sum over the process-spanning sharded axis into a
# cross-host all-reduce)
local = np.full((2, 8), float(rank + 1), np.float32)
g = par.make_global_array(local, mesh)
assert g.shape == (4, 8)
total = float(jax.jit(lambda a: a.sum())(g))
assert abs(total - (1.0 + 2.0) * 2 * 8) < 1e-5, total

# 2) host-metadata allgather
counts = par.process_allgather(np.asarray([10 * (rank + 1)], np.int32))
assert counts.shape[0] == 2 and int(counts.sum()) == 30, counts

# 3) one sharded Morpho E-step: the real entry() forward fn, coordsA rows
# sharded across the two processes
import importlib.util
spec = importlib.util.spec_from_file_location("graft_entry", os.path.join(sys.argv[3], "__graft_entry__.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
fn, args = mod.entry()
(coordsA, coordsB, expA, expB, inducing, batch_idx, sigma2, gamma, alpha, R, t, Coff) = args
from jax.sharding import NamedSharding, PartitionSpec as P

NA = coordsA.shape[0]
lo, hi = rank * NA // 2, (rank + 1) * NA // 2
gA = par.make_global_array(np.asarray(coordsA)[lo:hi], mesh)
gE = par.make_global_array(np.asarray(expA)[lo:hi], mesh)
gal = par.make_global_array(np.asarray(alpha)[lo:hi], mesh)
repl = NamedSharding(mesh, P())
rep = lambda x: jax.make_array_from_process_local_data(repl, np.asarray(x))
out = jax.jit(fn)(gA, rep(coordsB), gE, rep(expB), rep(inducing), rep(batch_idx),
                  sigma2, gamma, gal, R, t, Coff)
jax.block_until_ready(out)
P_mat = out[0]
assert P_mat.shape == (NA, np.asarray(batch_idx).shape[0]), P_mat.shape
for s in P_mat.addressable_shards:
    assert np.isfinite(np.asarray(s.data)).all()
s2 = float(out[-1])
assert np.isfinite(s2) and s2 > 0
print(f"WORKER_OK rank={rank} sigma2={s2:.6f}", flush=True)
"""


@pytest.mark.slow
def test_two_process_dcn_bootstrap_psum_and_estep(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    script = tmp_path / "dcn_worker.py"
    script.write_text(_WORKER)

    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("JAX_PLATFORMS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), str(port), REPO],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for rank in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            try:
                out, _ = p.communicate(timeout=300)
            except subprocess.TimeoutExpired:
                for q in procs:
                    q.kill()
                pytest.skip("DCN coordination timed out on this host")
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"WORKER_OK rank={rank}" in out, out
    # both processes observed the SAME replicated sigma2 (one global program)
    s2 = {line.split("sigma2=")[1] for out in outs for line in out.splitlines() if "WORKER_OK" in line}
    assert len(s2) == 1, s2
