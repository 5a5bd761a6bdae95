"""Static-shape graph containers for TPU execution.

The device-side replacement for the reference's DeepSNAP ``Batch`` protocol
(reference: graphgym/loader.py:247-260, graphgym/models/head.py:27-37).

Design (TPU-first, not a port):
  * All arrays have **static shapes**: nodes are padded to ``num_nodes``
    slots and edges to ``num_edges`` slots so XLA compiles one program per
    shape bucket instead of one per graph.
  * Padding convention: every padded edge has ``senders == receivers ==
    num_nodes - 1`` (the *padding node* slot) and ``edge_weight == 0``.
    Because aggregation targets the padding row, no mask is needed in the
    hot SpMM path — padded contributions land in a row nobody reads.
  * Padded nodes carry zero features and ``node_mask == False``.  Only
    statistics (BatchNorm), losses, and metrics consult the masks.
  * Messages flow ``senders -> receivers``; an edge (s, r) contributes
    x[s] to the aggregation at r.  This matches the reference SpMM
    ``gather(col) -> scale -> segment_sum(row)`` (sparse_adj.py:91-97)
    with row=receivers, col=senders.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphBatch:
    """A (possibly disjoint-union) batch of graphs with static shapes.

    Attributes:
      senders:    [E] int32, source node of each edge (col in A[r, s]).
      receivers:  [E] int32, destination node of each edge (row).
      edge_weight:[E] f32, 0.0 on padded edges.  Plays the role of the
                  reference SparseAdj.edge_weight.
      node_feat:  [N, D] node features (zeros on padded rows).
      edge_feat:  [E, De] optional edge features.
      node_mask:  [N] bool, True for real nodes.
      edge_mask:  [E] bool, True for real edges.
      graph_ids:  [N] int32, which graph each node belongs to (pooling
                  segment ids).  Padded nodes point at ``num_graphs - 1``
                  padding graph slot when graph-level tasks are used,
                  else 0.
      num_graphs: static int, number of graph slots (incl. padding slot).
      node_label: [N] or [N, C] labels aligned with node slots.
      node_label_index: [L] int32 padded index list of supervised nodes.
      label_mask: [L] bool mask over node_label_index slots.
      edge_label: [Le] labels for edge/link tasks.
      edge_label_index: [2, Le] node pairs for edge/link tasks.
      graph_label: [G] labels for graph tasks.
      node_id_index: [K] int32 ego-net center slots (ID-GNN Full),
                  reference: models/transform.py:38.
      id_mask:    [K] bool mask over node_id_index slots.
    """

    senders: jnp.ndarray
    receivers: jnp.ndarray
    edge_weight: jnp.ndarray
    node_feat: jnp.ndarray
    node_mask: jnp.ndarray
    edge_mask: jnp.ndarray
    edge_feat: Optional[jnp.ndarray] = None
    graph_ids: Optional[jnp.ndarray] = None
    num_graphs: int = _field(default=1, metadata=dict(static=True))
    node_label: Optional[jnp.ndarray] = None
    node_label_index: Optional[jnp.ndarray] = None
    label_mask: Optional[jnp.ndarray] = None
    edge_label: Optional[jnp.ndarray] = None
    edge_label_index: Optional[jnp.ndarray] = None
    edge_label_mask: Optional[jnp.ndarray] = None
    graph_label: Optional[jnp.ndarray] = None
    graph_mask: Optional[jnp.ndarray] = None
    node_id_index: Optional[jnp.ndarray] = None
    id_mask: Optional[jnp.ndarray] = None
    # Optional Pallas-kernel edge layouts (ops.pallas.spmm_kernel):
    # dict kind -> (fwd PackedCSR, bwd PackedCSR); kinds: 'gcn'
    # (sym-normalized A+I), 'plain' (raw A), 'mean' (D^-1 A).
    packs: Optional[dict] = None
    # Optional multi-chip edge-partition plans
    # (parallel.partition.EdgePartitionPlan): dict kind -> plan, same
    # kind vocabulary as packs.  Built by the loader when
    # cfg.tpu.partition == 'node'; layers dispatch partitioned_spmm /
    # partitioned_attention when a mesh is active.
    plans: Optional[dict] = None

    # ---------------------------------------------------------------- sizes
    @property
    def num_nodes(self) -> int:
        return self.node_feat.shape[0]

    @property
    def num_edges(self) -> int:
        return self.senders.shape[0]

    @property
    def padding_node(self) -> int:
        return self.num_nodes - 1

    def count_real_nodes(self):
        # np.sum works for both host (numpy) and device leaves and
        # avoids a device dispatch when called on host batches
        if isinstance(self.node_mask, np.ndarray):
            return np.sum(self.node_mask.astype(np.int32))
        return jnp.sum(self.node_mask.astype(jnp.int32))

    def count_real_edges(self):
        if isinstance(self.edge_mask, np.ndarray):
            return np.sum(self.edge_mask.astype(np.int32))
        return jnp.sum(self.edge_mask.astype(jnp.int32))

    def replace(self, **kw) -> "GraphBatch":
        return dataclasses.replace(self, **kw)

    # ------------------------------------------------------------ structure
    def with_self_loops(self, fill_weight: float = 1.0) -> "GraphBatch":
        """Append one self-loop per node slot (static shape: E + N edges).

        Mirrors SparseAdj.add_self_loop (reference sparse_adj.py:58-63) but
        keeps static shapes: self-loops are added for *every* node slot;
        loops on padded slots only affect padded rows.  Real nodes that
        already have an explicit self-loop get an extra one, matching the
        semantics of tf_geometric's add_self_loop_edge only when loops were
        removed first — callers that need `add_remaining_self_loops`
        semantics should use ops.norm.gcn_norm which handles it.
        """
        n = self.num_nodes
        loop = jnp.arange(n, dtype=self.senders.dtype)
        senders = jnp.concatenate([self.senders, loop])
        receivers = jnp.concatenate([self.receivers, loop])
        loop_w = jnp.where(self.node_mask, fill_weight, 0.0).astype(
            self.edge_weight.dtype)
        edge_weight = jnp.concatenate([self.edge_weight, loop_w])
        edge_mask = jnp.concatenate([self.edge_mask, self.node_mask])
        edge_feat = None
        if self.edge_feat is not None:
            pad = jnp.zeros((n,) + self.edge_feat.shape[1:],
                            self.edge_feat.dtype)
            edge_feat = jnp.concatenate([self.edge_feat, pad])
        return self.replace(senders=senders, receivers=receivers,
                            edge_weight=edge_weight, edge_mask=edge_mask,
                            edge_feat=edge_feat)

    def transpose(self) -> "GraphBatch":
        """Reverse message direction (SparseAdj.transpose,
        sparse_adj.py:124-127)."""
        return self.replace(senders=self.receivers, receivers=self.senders)


def permute_nodes(batch: GraphBatch, new_id: np.ndarray) -> GraphBatch:
    """Relabel node slots by the permutation ``new_id[old] -> new``.

    Node-aligned arrays are scattered to their new rows; node-index
    arrays (senders/receivers/label indexes) are mapped through the
    permutation.  Labels move with their nodes, so downstream gathers
    (heads, loss masks) are unaffected.  Used by the multi-chip 'node'
    partition layout to install a locality-improving BFS order before
    EdgePartitionPlans are built.
    """
    new_id = np.asarray(new_id)
    n = batch.num_nodes
    assert new_id.shape == (n,)

    def reorder(a):
        if a is None:
            return None
        a = np.asarray(a)
        out = np.empty_like(a)
        out[new_id] = a
        return out

    def remap(a):
        if a is None:
            return None
        a = np.asarray(a)
        return new_id[a].astype(a.dtype)

    kw = dict(
        senders=remap(batch.senders),
        receivers=remap(batch.receivers),
        node_feat=reorder(batch.node_feat),
        node_mask=reorder(batch.node_mask),
        graph_ids=reorder(batch.graph_ids),
        node_label_index=remap(batch.node_label_index),
        node_id_index=remap(batch.node_id_index),
        edge_label_index=remap(batch.edge_label_index),
    )
    if batch.node_label is not None \
            and batch.node_label.shape[0] == n:
        kw["node_label"] = reorder(batch.node_label)
    return batch.replace(**{k: v for k, v in kw.items()
                            if getattr(batch, k) is not None})


def pad_to(x: np.ndarray, n: int, fill=0) -> np.ndarray:
    """Pad axis 0 of ``x`` to length ``n`` with ``fill``."""
    if x.shape[0] > n:
        raise ValueError(f"cannot pad length {x.shape[0]} down to {n}")
    if x.shape[0] == n:
        return x
    pad_shape = (n - x.shape[0],) + x.shape[1:]
    return np.concatenate([x, np.full(pad_shape, fill, dtype=x.dtype)])


def round_up(x: int, multiple: int) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def bucket_size(n: int, multiple: int = 8, min_size: int = 8) -> int:
    """Quarter-step bucketing to bound XLA recompilations.

    Returns the smallest value >= n of the form m * 2^k with
    m in {4, 5, 6, 7}, i.e. powers of two refined by quarter steps.
    Worst-case padding is 25% (a loader compiles one shape for all its
    batches, so finer buckets cost no extra compilations — they only
    improve cross-loader shape reuse odds vs exact sizing).  The old
    pure power-of-two buckets padded up to 2x, which at the ID-GAT
    ego-union shapes doubled every [E, D] message buffer and pushed
    the batch over HBM (round-4 OOM, docs/PARITY_NOTES.md)."""
    n = max(n, min_size)
    size = min_size
    while size < n:
        size *= 2
    # refine: walk back down in quarter steps of the bracket
    for m in (4, 5, 6, 7):
        cand = size // 8 * m
        if cand >= n:
            return round_up(max(cand, min_size), multiple)
    return round_up(size, multiple)


def build_graph_batch(
    senders: np.ndarray,
    receivers: np.ndarray,
    node_feat: np.ndarray,
    *,
    edge_weight: Optional[np.ndarray] = None,
    edge_feat: Optional[np.ndarray] = None,
    graph_ids: Optional[np.ndarray] = None,
    num_graphs: int = 1,
    node_label: Optional[np.ndarray] = None,
    node_label_index: Optional[np.ndarray] = None,
    edge_label: Optional[np.ndarray] = None,
    edge_label_index: Optional[np.ndarray] = None,
    edge_label_mask: Optional[np.ndarray] = None,
    graph_label: Optional[np.ndarray] = None,
    node_id_index: Optional[np.ndarray] = None,
    pad_nodes_to: Optional[int] = None,
    pad_edges_to: Optional[int] = None,
    bucket: bool = False,
) -> GraphBatch:
    """Host-side constructor: pads numpy arrays into a GraphBatch.

    One extra padding node slot is always reserved (the scatter target for
    padded edges), so ``pad_nodes_to`` must exceed the real node count.
    """
    n_real = int(node_feat.shape[0])
    e_real = int(senders.shape[0])

    if pad_nodes_to is None:
        pad_nodes_to = bucket_size(n_real + 1) if bucket else n_real + 1
    if pad_edges_to is None:
        pad_edges_to = bucket_size(max(e_real, 1)) if bucket else max(e_real, 1)
    if pad_nodes_to < n_real + 1:
        pad_nodes_to = n_real + 1
    if pad_edges_to < e_real:
        pad_edges_to = e_real

    pad_node = pad_nodes_to - 1

    senders = pad_to(np.asarray(senders, np.int32), pad_edges_to, pad_node)
    receivers = pad_to(np.asarray(receivers, np.int32), pad_edges_to, pad_node)
    if edge_weight is None:
        edge_weight = np.ones((e_real,), np.float32)
    edge_weight = pad_to(np.asarray(edge_weight, np.float32), pad_edges_to, 0.0)
    node_feat = pad_to(np.asarray(node_feat, np.float32), pad_nodes_to, 0.0)

    node_mask = pad_to(np.ones((n_real,), bool), pad_nodes_to, False)
    edge_mask = pad_to(np.ones((e_real,), bool), pad_edges_to, False)

    if edge_feat is not None:
        edge_feat = pad_to(np.asarray(edge_feat, np.float32), pad_edges_to, 0.0)

    if graph_ids is None:
        graph_ids = np.zeros((n_real,), np.int32)
    graph_ids = pad_to(np.asarray(graph_ids, np.int32), pad_nodes_to,
                       max(num_graphs - 1, 0))

    kw: dict[str, Any] = {}
    if node_label is not None:
        node_label = np.asarray(node_label)
        kw["node_label"] = pad_to(node_label, pad_nodes_to, 0)
    if node_label_index is not None:
        li = np.asarray(node_label_index, np.int32)
        l_pad = pad_nodes_to if not bucket else bucket_size(max(len(li), 1))
        l_pad = max(l_pad, len(li))
        kw["node_label_index"] = pad_to(li, l_pad, pad_node)
        kw["label_mask"] = pad_to(np.ones((len(li),), bool), l_pad, False)
    if edge_label is not None:
        kw["edge_label"] = np.asarray(edge_label)
    if edge_label_index is not None:
        kw["edge_label_index"] = np.asarray(edge_label_index, np.int32)
    if edge_label_mask is not None:
        kw["edge_label_mask"] = np.asarray(edge_label_mask, bool)
    if graph_label is not None:
        kw["graph_label"] = pad_to(np.asarray(graph_label), num_graphs, 0)
        g_real = int(np.asarray(graph_label).shape[0])
        kw["graph_mask"] = pad_to(np.ones((g_real,), bool), num_graphs, False)
    if node_id_index is not None:
        ii = np.asarray(node_id_index, np.int32)
        i_pad = max(len(ii), 1)
        kw["node_id_index"] = pad_to(ii, i_pad, pad_node)
        kw["id_mask"] = pad_to(np.ones((len(ii),), bool), i_pad, False)

    # Leaves stay NUMPY on the host: one bulk jax.device_put per batch
    # (Trainer._place) replaces a per-field host->device dispatch storm
    # — critical when device dispatch latency is high (remote TPU).
    return GraphBatch(
        senders=senders,
        receivers=receivers,
        edge_weight=edge_weight,
        node_feat=node_feat,
        node_mask=node_mask,
        edge_mask=edge_mask,
        edge_feat=edge_feat,
        graph_ids=graph_ids,
        num_graphs=num_graphs,
        **kw,
    )
