"""Scaling-efficiency harness (BASELINE.md: >=80% edges/s scaling from
1 chip -> N).

With one physical TPU chip in this environment, the harness runs the
full partitioned pipeline on the virtual CPU mesh to validate the
machinery and reports the communication model (halo fractions) that
determines multi-chip efficiency; on a real pod slice the same script
measures edges/s per chip directly.

Usage: python tools/run_scaling.py [--devices 8] [--graph ego|powerlaw]
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


def build_graph(kind: str):
    if kind == "ego":
        import pickle

        from graphgym_tpu.data.hostgraph import from_networkx
        from graphgym_tpu.data.transforms import ego_nets

        with open("/root/reference/run/datasets/ws.pkl", "rb") as f:
            graphs = pickle.load(f)
        ss, rs, off = [], [], 0
        for g in graphs[:80]:
            hg = ego_nets(from_networkx(g), radius=3)
            ss.append(hg.senders + off)
            rs.append(hg.receivers + off)
            off += hg.num_nodes
        s = np.concatenate(ss).astype(np.int32)
        r = np.concatenate(rs).astype(np.int32)
        n = off
    else:
        rng = np.random.default_rng(0)
        n, e = 131072, 2_000_000
        s = np.minimum((rng.random(e) ** 2 * n).astype(np.int32), n - 1)
        r = np.minimum((rng.random(e) ** 2 * n).astype(np.int32), n - 1)
    return s, r, n


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--graph", default="ego",
                   choices=["ego", "powerlaw"])
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    # must happen before the first jax backend initialization
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count="
            f"{args.devices}").strip()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from graphgym_tpu.parallel.mesh import make_mesh
    from graphgym_tpu.parallel.partition import (halo_stats,
                                                 partitioned_spmm,
                                                 plan_edge_partition)

    s, r, n = build_graph(args.graph)
    e = len(s)
    devices = jax.devices()[:args.devices]
    n_pad = ((n + 8 * args.devices - 1)
             // (8 * args.devices)) * 8 * args.devices
    results = {"graph": args.graph, "nodes": n, "edges": e,
               "devices": len(devices),
               "backend": devices[0].platform}

    # single-device reference timing
    x = np.random.default_rng(1).normal(size=(n_pad, args.dim)).astype(
        np.float32)
    from graphgym_tpu.ops import sparse as sp
    sj, rj, xj = jnp.asarray(s), jnp.asarray(r), jnp.asarray(x)
    f1 = jax.jit(lambda x_: sp.spmm(sj, rj, None, x_, n_pad))
    o = f1(xj)
    jax.block_until_ready(o)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        o = f1(xj)
    jax.block_until_ready(o)
    t_single = (time.perf_counter() - t0) / args.iters
    results["single_device_s"] = round(t_single, 4)

    # partitioned timing
    mesh = make_mesh((len(devices),), axis_names=("edge",),
                     devices=devices)
    plan = plan_edge_partition(s, r, None, n_pad, len(devices))
    results["halo"] = halo_stats(plan)
    with mesh:
        xs = jax.device_put(xj, NamedSharding(mesh, P("edge")))
        f2 = jax.jit(lambda x_: partitioned_spmm(plan, x_, mesh))
        o = f2(xs)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            o = f2(xs)
        jax.block_until_ready(o)
        t_part = (time.perf_counter() - t0) / args.iters
    results["partitioned_s"] = round(t_part, 4)
    results["edges_per_s_partitioned"] = round(e / t_part, 1)
    # scaling efficiency proxy: ideal time = single / P
    ideal = t_single / len(devices)
    results["scaling_efficiency"] = round(ideal / t_part, 4)
    if devices[0].platform == "cpu":
        results["note"] = (
            "cpu virtual mesh: timings validate the machinery only — "
            "host-shared cores and emulated collectives make the "
            "efficiency number meaningless; the halo fraction is the "
            "hardware-independent communication model")
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
