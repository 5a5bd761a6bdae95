"""Multi-chip execution: device mesh + sharding layout for
edge-partitioned GNN training.

No reference counterpart (the reference is single-process; SURVEY.md
§2 parallelism table) — this module is mandated by BASELINE.json's
north star: edge-partition the graph across chips and let XLA insert
the collectives (GSPMD recipe: pick a mesh, annotate shardings,
compile).

Layout (round-1 design):
  * mesh axes ("edge", "feature"):
      - edge axis: 1-D partition of the COO edge arrays — each chip owns
        a contiguous slice of edges, computes partial segment-sums into
        its replica of the node table, and XLA reduces the partials with
        an all-reduce over the edge axis (the halo-exchange equivalent
        for a replicated node table).
      - feature axis: tensor parallelism — weight matrices are
        column-sharded, node features column-sharded to match, so each
        chip holds D/F of every activation and the MXU matmuls shrink
        accordingly.
  * Parameters: kernels P(None, "feature"); biases P("feature").
  * Graph structure (senders/receivers/weights/masks): P("edge").
  * Node features / labels: P(None, "feature") / replicated.

Scaling beyond a replicated node table (node-sharded tables with
all_to_all boundary exchange) is the planned follow-up in
parallel/partition.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphgym_tpu.graphs.container import GraphBatch


def make_mesh(mesh_shape: Optional[Sequence[int]] = None,
              axis_names: Sequence[str] = ("edge", "feature"),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if not mesh_shape:
        mesh_shape = (n, 1)
    if int(np.prod(mesh_shape)) != n:
        raise ValueError(f"mesh_shape {mesh_shape} != {n} devices")
    arr = np.asarray(devices).reshape(tuple(mesh_shape))
    return Mesh(arr, tuple(axis_names[:arr.ndim]))


BATCH_SPECS = {
    "senders": P("edge"), "receivers": P("edge"),
    "edge_weight": P("edge"), "edge_mask": P("edge"),
    "edge_feat": P("edge", None),
    "node_feat": P(None, "feature"),
}


def batch_shardings(mesh: Mesh):
    """Field name -> PartitionSpec for the standard layout (fields not
    listed are replicated)."""
    return {k: NamedSharding(mesh, s) for k, s in BATCH_SPECS.items()}


def shard_batch(batch: GraphBatch, mesh: Mesh) -> GraphBatch:
    """Place a host GraphBatch onto the mesh with the standard layout."""
    import dataclasses

    rep = NamedSharding(mesh, P())
    updates = {}
    for f in dataclasses.fields(batch):
        v = getattr(batch, f.name)
        if v is None or not hasattr(v, "ndim"):
            continue
        spec = BATCH_SPECS.get(f.name, P())
        if len(spec) > v.ndim:
            spec = P(*spec[:v.ndim])
        # only shard dims that divide evenly; else replicate
        ok = True
        for dim, part in enumerate(spec):
            if part is not None and v.shape[dim] % mesh.shape[part] != 0:
                ok = False
        s = NamedSharding(mesh, spec) if ok else rep
        updates[f.name] = jax.device_put(v, s)
    return batch.replace(**updates)


def param_shardings(params, mesh: Mesh):
    """Column-shard every rank-2 'kernel' over the feature axis; shard
    rank-1 biases over feature when divisible; replicate the rest."""
    fsize = mesh.shape.get("feature", 1)

    def spec(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if leaf.ndim == 2 and leaf.shape[1] % fsize == 0 \
                and "kernel" in name:
            return NamedSharding(mesh, P(None, "feature"))
        if leaf.ndim == 1 and leaf.shape[0] % fsize == 0 \
                and ("bias" in name or "scale" in name):
            return NamedSharding(mesh, P("feature"))
        return NamedSharding(mesh, P())

    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [spec(path, leaf) for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_params(params, mesh: Mesh):
    return jax.tree_util.tree_map(
        lambda p, s: jax.device_put(p, s), params,
        param_shardings(params, mesh))
