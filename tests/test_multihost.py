"""Two-process multi-host test on CPU (jax.distributed over localhost).

The TPU-pod data-feeding path (parallel/mesh._place_sharded +
make_array_from_single_device_arrays) cannot be exercised by the
single-process virtual mesh, so this test spawns two real processes,
each with 2 virtual CPU devices, forming one 4-device mesh — the
multi-process analog of the fake backend the reference lacks
(SURVEY.md §4).

Each process loads the SAME host batch (loaders are deterministic),
feeds only its addressable shards, runs one partitioned SpMM, and
process 0 checks the result against the dense oracle.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = r"""
import os, sys
import numpy as np

pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4

sys.path.insert(0, os.getcwd())
import jax.numpy as jnp
from graphgym_tpu.parallel.mesh import make_mesh, shard_batch
from graphgym_tpu.parallel.partition import (partitioned_spmm,
                                             plan_edge_partition)
from graphgym_tpu.graphs.container import build_graph_batch

rng = np.random.default_rng(0)
n, e, d = 64, 300, 8
s = rng.integers(0, n - 1, size=e).astype(np.int32)
r = rng.integers(0, n - 1, size=e).astype(np.int32)
x = rng.normal(size=(n - 1, d)).astype(np.float32)
batch = build_graph_batch(s, r, x, pad_nodes_to=n, pad_edges_to=512)

mesh = make_mesh((4,), axis_names=("edge",))
plan = plan_edge_partition(np.asarray(batch.senders),
                           np.asarray(batch.receivers),
                           np.asarray(batch.edge_weight), n, 4)
batch = batch.replace(plans={"plain": plan})
placed = shard_batch(batch, mesh, layout="node")
with mesh:
    out = jax.jit(lambda x_: partitioned_spmm(plan, x_, mesh))(
        placed.node_feat)
# gather the global result on every process for checking
from jax.sharding import NamedSharding, PartitionSpec as P
rep = jax.jit(lambda a: a,
              out_shardings=NamedSharding(mesh, P()))(out)
local = np.asarray(rep.addressable_data(0))
ref = np.zeros((n, d), np.float32)
w = np.asarray(batch.edge_weight)
np.add.at(ref, np.asarray(batch.receivers),
          np.asarray(placed.node_feat.addressable_data(0)).shape
          and np.concatenate([x, np.zeros((1, d), np.float32)])[
              np.asarray(batch.senders)] * w[:, None])
np.testing.assert_allclose(local, ref, rtol=1e-4, atol=1e-4)
print(f"WORKER_{pid}_OK", flush=True)
"""


@pytest.mark.skipif(os.environ.get("GRAPHGYM_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_cpu_mesh(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-process workers timed out:\n"
                    + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        assert f"WORKER_{pid}_OK" in out, out[-2000:]
