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

# 'node' partition layout: node tables row-sharded over the edge axis
# to match the halo-exchange plans (parallel.partition).
NODE_BATCH_SPECS = dict(
    BATCH_SPECS,
    node_feat=P("edge", None),
    node_mask=P("edge"),
    node_label=P("edge"),
    graph_ids=P("edge"),
)


def _specs_for(mesh: Mesh, layout: str):
    """Rename the canonical 'edge'/'feature' spec axes to the mesh's
    actual axis names (axis 0 = graph partition, axis 1 = tensor)."""
    ax = mesh.axis_names
    ren = {"edge": ax[0],
           "feature": ax[1] if len(ax) > 1 else None}
    base = NODE_BATCH_SPECS if layout == "node" else BATCH_SPECS
    return {k: P(*(ren.get(p, p) if isinstance(p, str) else p
                   for p in s))
            for k, s in base.items()}


def batch_shardings(mesh: Mesh, layout: str = "replicated"):
    """Field name -> NamedSharding for the layout (fields not listed
    are replicated)."""
    return {k: NamedSharding(mesh, s)
            for k, s in _specs_for(mesh, layout).items()}


def _place_sharded(v, sharding: NamedSharding, multiprocess: bool):
    """Place a full host array under `sharding`.

    Single-process: one bulk device_put.  Multi-process (jax.distributed
    initialized, mesh spanning processes): every process holds the same
    full host array (loaders are deterministic and replicated), but only
    this process's ADDRESSABLE shards may be materialized — slice them
    out per local device and assemble the global array with
    make_array_from_single_device_arrays.  This is the multi-host data
    feeding path (SURVEY.md §5.8; no reference counterpart)."""
    if not multiprocess:
        return jax.device_put(v, sharding)
    idx_map = sharding.addressable_devices_indices_map(v.shape)
    arrs = [jax.device_put(v[idx], d) for d, idx in idx_map.items()]
    return jax.make_array_from_single_device_arrays(
        v.shape, sharding, arrs)


def shard_batch(batch: GraphBatch, mesh: Mesh,
                layout: str = "replicated") -> GraphBatch:
    """Place a host GraphBatch onto the mesh.  layout='replicated'
    shards edges + feature columns with a replicated node table;
    layout='node' additionally row-shards the node tables and the
    attached EdgePartitionPlans (leading axis = shard).  Works for
    multi-host meshes: each process feeds only its addressable shards
    (see _place_sharded)."""
    import dataclasses

    if layout not in ("node", "replicated"):
        # 'auto' is resolved by GraphLoader._collate's first batch; a
        # path that reaches here without loader collation must not
        # silently degrade to the replicated specs (advisor r4 low)
        raise ValueError(
            f"shard_batch layout must be 'node' or 'replicated', got "
            f"{layout!r} — cfg.tpu.partition='auto' is resolved during "
            f"loader collation; call _resolve_auto_layout (or pass an "
            f"explicit layout) for batches that bypass the loader")
    multiprocess = jax.process_count() > 1
    specs = _specs_for(mesh, layout)
    rep = NamedSharding(mesh, P())
    updates = {}
    for f in dataclasses.fields(batch):
        v = getattr(batch, f.name)
        if v is None or not hasattr(v, "ndim"):
            continue
        spec = specs.get(f.name, P())
        if len(spec) > v.ndim:
            spec = P(*spec[:v.ndim])
        # only shard dims that divide evenly; else replicate
        ok = True
        for dim, part in enumerate(spec):
            if part is not None and v.shape[dim] % mesh.shape[part] != 0:
                ok = False
        s = NamedSharding(mesh, spec) if ok else rep
        updates[f.name] = _place_sharded(np.asarray(v), s, multiprocess)
    if batch.plans:
        shard0 = NamedSharding(mesh, P(mesh.axis_names[0]))

        def place(a):
            if a is None or not hasattr(a, "ndim"):
                return a
            return _place_sharded(np.asarray(a), shard0, multiprocess)

        updates["plans"] = {
            kind: jax.tree_util.tree_map(place, plan)
            for kind, plan in batch.plans.items()}
    return batch.replace(**updates)


def param_shardings(params, mesh: Mesh):
    """Column-shard every rank-2 'kernel' over the feature (tensor)
    axis — mesh axis 1; shard rank-1 biases over it when divisible;
    replicate the rest."""
    feat = mesh.axis_names[1] if len(mesh.axis_names) > 1 else None
    fsize = mesh.shape.get(feat, 1) if feat else 1

    def spec(path, leaf):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if feat and leaf.ndim == 2 and leaf.shape[1] % fsize == 0 \
                and "kernel" in name:
            return NamedSharding(mesh, P(None, feat))
        if feat and leaf.ndim == 1 and leaf.shape[0] % fsize == 0 \
                and ("bias" in name or "scale" in name):
            return NamedSharding(mesh, P(feat))
        return NamedSharding(mesh, P())

    flat = jax.tree_util.tree_flatten_with_path(params)
    specs = [spec(path, leaf) for path, leaf in flat[0]]
    return jax.tree_util.tree_unflatten(flat[1], specs)


def shard_params(params, mesh: Mesh):
    multiprocess = jax.process_count() > 1
    return jax.tree_util.tree_map(
        lambda p, s: _place_sharded(np.asarray(p), s, multiprocess),
        params, param_shardings(params, mesh))
