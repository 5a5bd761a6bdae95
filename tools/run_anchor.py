"""Anchor measurement for the scaling projection (docs/SCALING.md).

Measures, on the real single TPU chip, with k paired repeats (median +
IQR so tunnel drift is visible in the artifact):
  * the plain packed-kernel SpMM forward rate,
  * the partitioned_spmm local reduction at 1 shard on the PRODUCT
    path — plan built with pack=True, run with use_kernel=True, i.e.
    the packed Pallas kernel inside shard_map exactly as the loader
    wires it (data/loaders.py partition plan pack/use_kernel), and
  * the partitioned XLA-scatter formulation (use_kernel=False) for
    reference — this is NOT the product path; it exists to explain
    historical overhead numbers (VERDICT r3: 26x was this path).

Writes ANCHOR.json; tools/run_scaling.py uses
`partitioned_fwd_edges_per_s` to replace the HBM byte model for
t_local — anchoring projected_efficiency_v5e to a measured number.

Usage:  python tools/run_anchor.py [--edges 2000000] [--iters 10]
                                   [--repeats 5]
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


def _stats(vals):
    v = sorted(vals)
    q1, med, q3 = (float(np.percentile(v, q)) for q in (25, 50, 75))
    return {"median": round(med, 1), "iqr": round(q3 - q1, 1),
            "n": len(v), "all": [round(x, 1) for x in v]}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--nodes", type=int, default=131072)
    p.add_argument("--edges", type=int, default=2_000_000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--repeats", type=int, default=5)
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

    def rate_once(step, x0):
        t0 = time.perf_counter()
        g = x0
        for _ in range(args.iters):
            g = step(g)
        np.asarray(g[:1])
        return e * args.iters / (time.perf_counter() - t0)

    # compile + build all three steps first so the repeats are paired
    # (each repeat measures all paths back to back — tunnel drift then
    # shifts every path together instead of biasing one)
    pack = K.pack_bidir(s, r, w, n)
    step_plain = jax.jit(lambda x_: K.spmm_bidir(pack, x_, n))

    mesh = make_mesh((1,), axis_names=("edge",),
                     devices=jax.devices()[:1])
    plan_k = plan_edge_partition(s, r, w, n, 1, pack=True)
    plan_x = plan_edge_partition(s, r, w, n, 1, pack=False)
    with mesh:
        step_part = jax.jit(
            lambda x_: partitioned_spmm(plan_k, x_, mesh,
                                        use_kernel=True))
        step_xla = jax.jit(
            lambda x_: partitioned_spmm(plan_x, x_, mesh))
        x0 = jnp.asarray(x)
        for st in (step_plain, step_part, step_xla):
            np.asarray(st(x0)[:1])   # warm up / compile

        plain, part, xla = [], [], []
        for _ in range(args.repeats):
            plain.append(rate_once(step_plain, x0))
            part.append(rate_once(step_part, x0))
            xla.append(rate_once(step_xla, x0))

    sp, sk, sx = _stats(plain), _stats(part), _stats(xla)
    out = {
        "backend": jax.devices()[0].platform,
        "nodes": n, "edges": e, "dim": d, "iters": args.iters,
        "repeats": args.repeats,
        "plain_kernel_fwd_edges_per_s": sp["median"],
        "plain_kernel_fwd_stats": sp,
        # product path: packed Pallas kernel inside shard_map
        "partitioned_fwd_edges_per_s": sk["median"],
        "partitioned_fwd_stats": sk,
        # non-product XLA scatter formulation, for the record
        "partitioned_xla_fwd_edges_per_s": sx["median"],
        "partitioned_xla_fwd_stats": sx,
        "partition_overhead": round(
            sp["median"] / max(sk["median"], 1.0), 3),
        "partition_overhead_xla": round(
            sp["median"] / max(sx["median"], 1.0), 3),
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
