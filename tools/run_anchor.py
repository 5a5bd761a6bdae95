"""Anchor measurement for the scaling projection (docs/SCALING.md).

Measures, on the real single TPU chip:
  * the plain packed-kernel SpMM forward rate, and
  * the partitioned_spmm local reduction at 1 shard (same code path
    the multi-chip projection scales from),
with the chained-iteration methodology (bench.py) and writes
ANCHOR.json, which tools/run_scaling.py uses to replace the HBM byte
model for t_local — anchoring projected_efficiency_v5e to a measured
number.

Usage:  python tools/run_anchor.py [--edges 2000000] [--iters 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=131072)
    p.add_argument("--edges", type=int, default=2_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--out", default="ANCHOR.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import make_graph
    from graphgym_tpu.ops.pallas import spmm_kernel as K
    from graphgym_tpu.parallel.mesh import make_mesh
    from graphgym_tpu.parallel.partition import (partitioned_spmm,
                                                 plan_edge_partition)

    n, e, d = args.nodes, args.edges, args.dim
    s, r, w, x = make_graph(n, e, d)

    def timed(step, x0):
        o = step(x0)
        np.asarray(o)
        t0 = time.perf_counter()
        g = x0
        for _ in range(args.iters):
            g = step(g)
        np.asarray(g[:1])
        return e * args.iters / (time.perf_counter() - t0)

    # plain packed kernel fwd
    pack = K.pack_bidir(s, r, w, n)
    plain = timed(jax.jit(lambda x_: K.spmm_bidir(pack, x_, n)),
                  jnp.asarray(x))

    # partitioned path at 1 shard (shard_map over a 1-device mesh)
    mesh = make_mesh((1,), axis_names=("edge",),
                     devices=jax.devices()[:1])
    plan = plan_edge_partition(s, r, w, n, 1)
    with mesh:
        part = timed(
            jax.jit(lambda x_: partitioned_spmm(plan, x_, mesh)),
            jnp.asarray(x))

    out = {
        "backend": jax.devices()[0].platform,
        "nodes": n, "edges": e, "dim": d, "iters": args.iters,
        "plain_kernel_fwd_edges_per_s": round(plain, 1),
        "partitioned_fwd_edges_per_s": round(part, 1),
        "partition_overhead": round(plain / max(part, 1.0), 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
