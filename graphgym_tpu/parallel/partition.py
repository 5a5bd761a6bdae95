"""Edge-partitioned SpMM with node sharding + halo exchange.

The north-star distributed design (BASELINE.json; no reference
counterpart — the reference is single-process, SURVEY.md §2/§5.8):

  * Nodes are partitioned contiguously across the mesh's 'edge' axis:
    chip k owns rows [k*n_loc, (k+1)*n_loc).
  * Edges are assigned to the OWNER OF THEIR RECEIVER, so every edge's
    output row is local and the segment-sum never crosses chips.
  * Each chip needs the features of remote senders (the halo).  A
    host-side planner computes, per (src, dst) chip pair, the exact
    boundary node set; at step time one `all_to_all` moves just those
    rows over ICI — O(boundary) communication instead of the O(N x D)
    all-reduce of the replicated-table layout in parallel.mesh.
  * Reduction order within a chip is fixed by the plan (deterministic
    across runs and mesh sizes up to float reassociation of the final
    local sums).

Gradients flow through shard_map + all_to_all automatically (the VJP of
an all_to_all is the reverse all_to_all).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from graphgym_tpu.ops import segment as S


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EdgePartitionPlan:
    """Host-built partition plan; leading axis = shard.

    senders_ext [Pn, E_loc] int32 — sender position in the chip's
        extended table [x_local (n_loc rows) ++ halo (Pn*H rows)].
    receivers_loc [Pn, E_loc] int32 — local output row of each edge.
    edge_weight [Pn, E_loc] f32 — 0 on padded edge slots.
    send_idx [Pn, Pn, H] int32 — rows of shard p's local x to ship to
        each destination shard (padded with 0 — never referenced).
    n_local: static rows per shard; num_shards: static Pn.
    """
    senders_ext: jnp.ndarray
    receivers_loc: jnp.ndarray
    edge_weight: jnp.ndarray
    send_idx: jnp.ndarray
    halo_counts: jnp.ndarray = None   # [Pn, Pn] real boundary rows
    # optional per-shard packed-chunk layouts (ops.pallas) for running
    # the single-chip SpMM kernel inside the shard_map body:
    # [Pn, NC, C] senders(ext-table)/weights/local plus [Pn, NC] tiles
    pack_senders: Optional[jnp.ndarray] = None
    pack_weights: Optional[jnp.ndarray] = None
    pack_local: Optional[jnp.ndarray] = None
    pack_tiles: Optional[jnp.ndarray] = None
    n_local: int = _field(metadata=dict(static=True), default=0)
    num_shards: int = _field(metadata=dict(static=True), default=1)


def bfs_ordering(senders: np.ndarray, receivers: np.ndarray,
                 num_nodes: int) -> np.ndarray:
    """Locality-improving node permutation: BFS order (component by
    component), so contiguous row blocks correspond to graph
    neighborhoods and the partition boundary shrinks.  Returns
    new_id[old_id]."""
    indptr = np.zeros(num_nodes + 1, np.int64)
    np.add.at(indptr, np.asarray(senders) + 1, 1)
    indptr = np.cumsum(indptr)
    order = np.argsort(senders, kind="stable")
    indices = np.asarray(receivers)[order]
    new_id = np.full(num_nodes, -1, np.int64)
    nxt = 0
    for seed in range(num_nodes):
        if new_id[seed] >= 0:
            continue
        queue = [seed]
        new_id[seed] = nxt
        nxt += 1
        head = 0
        while head < len(queue):
            u = queue[head]
            head += 1
            for v in indices[indptr[u]:indptr[u + 1]]:
                v = int(v)
                if new_id[v] < 0:
                    new_id[v] = nxt
                    nxt += 1
                    queue.append(v)
    return new_id


def balanced_partition_order(senders: np.ndarray,
                             receivers: np.ndarray,
                             edge_weight: Optional[np.ndarray],
                             num_real: int, num_nodes: int,
                             num_shards: int) -> np.ndarray:
    """Node permutation ``new_id[old]`` for the 'node' partition layout:

    * real nodes are BFS-ordered (locality: neighborhoods land in the
      same contiguous shard range, shrinking the halo), and
    * spread EVENLY across shards (each shard owns ~num_real/Pn real
      rows — without this, padding would pile onto the last shards and
      the first shards would own all the edges), with
    * padding slots filling each shard's tail; the global padding node
      (num_nodes - 1, the scatter target of padded edges) stays last.
    """
    senders = np.asarray(senders)
    receivers = np.asarray(receivers)
    if edge_weight is not None:
        real = np.asarray(edge_weight) != 0
        senders, receivers = senders[real], receivers[real]
    bfs = bfs_ordering(senders, receivers, num_real)  # rank[old_real]
    n_loc = num_nodes // num_shards
    r_loc = -(-num_real // num_shards)                # ceil
    assert r_loc <= n_loc, (num_real, num_nodes, num_shards)
    new_id = np.empty(num_nodes, np.int64)
    new_id[:num_real] = (bfs // r_loc) * n_loc + (bfs % r_loc)
    taken = np.zeros(num_nodes, bool)
    taken[new_id[:num_real]] = True
    new_id[num_real:] = np.nonzero(~taken)[0]
    return new_id


def build_plans(senders: np.ndarray, receivers: np.ndarray,
                edge_weight: np.ndarray, node_mask: np.ndarray,
                num_nodes: int, num_shards: int,
                kinds=("gcn",), pack: bool = False,
                bucket: bool = True) -> dict:
    """Kind-weighted EdgePartitionPlans for a collated batch — the
    multi-chip counterpart of graphs.packing.build_packs (same kind
    vocabulary and normalization formulas; reference weights:
    TfgIDLayer.py:528-566 gcn sym-norm, idconv.py mean/plain aggs)."""
    from graphgym_tpu.graphs.packing import _gcn_weights, _mean_weights

    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    edge_weight = np.asarray(edge_weight, np.float32)
    node_mask = np.asarray(node_mask, bool)
    out = {}
    for kind in kinds:
        if kind == "gcn":
            s, r, w = _gcn_weights(senders, receivers, edge_weight,
                                   node_mask, num_nodes)
        elif kind == "plain":
            s, r, w = senders, receivers, edge_weight
        elif kind == "mean":
            s, r, w = _mean_weights(senders, receivers, edge_weight,
                                    num_nodes)
        elif kind == "att":
            loop = np.arange(num_nodes, dtype=senders.dtype)
            s = np.concatenate([senders, loop])
            r = np.concatenate([receivers, loop])
            w = np.concatenate([(edge_weight != 0).astype(np.float32),
                                node_mask.astype(np.float32)])
        else:
            raise ValueError(f"Unknown plan kind {kind}")
        out[kind] = plan_edge_partition(s, r, w, num_nodes, num_shards,
                                        pack=pack, bucket=bucket)
    return out


def plan_edge_partition(senders: np.ndarray, receivers: np.ndarray,
                        edge_weight: Optional[np.ndarray],
                        num_nodes: int, num_shards: int,
                        pack: bool = False,
                        bucket: bool = False) -> EdgePartitionPlan:
    """Build the partition plan on the host (numpy).  With pack=True,
    also build per-shard packed-chunk layouts so partitioned_spmm can
    run the Pallas kernel per chip (scatter-free local reduction).
    bucket=True rounds the per-shard edge and halo capacities up to
    power-of-two-ish buckets so plans from different batches share
    shapes (one compiled program per split)."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    e = len(senders)
    if edge_weight is None:
        edge_weight = np.ones(e, np.float32)
    edge_weight = np.asarray(edge_weight, np.float32)
    assert num_nodes % num_shards == 0, (
        f"padded node count {num_nodes} must divide by {num_shards}")
    n_loc = num_nodes // num_shards

    owner = receivers // n_loc
    # per-shard edge lists (receiver-owned)
    per_shard_edges = [np.nonzero(owner == k)[0]
                       for k in range(num_shards)]
    e_max = max((len(ix) for ix in per_shard_edges), default=1)
    e_max = max(e_max, 1)
    if bucket:
        from graphgym_tpu.graphs.container import bucket_size
        e_max = bucket_size(e_max)

    # boundary sets: remote senders needed by shard k from shard s
    needed = [[None] * num_shards for _ in range(num_shards)]
    h_max = 1
    for k in range(num_shards):
        s_k = senders[per_shard_edges[k]]
        src = s_k // n_loc
        for s in range(num_shards):
            if s == k:
                needed[k][s] = np.zeros(0, np.int64)
                continue
            ids = np.unique(s_k[src == s])
            needed[k][s] = ids
            h_max = max(h_max, len(ids))
    if bucket:
        from graphgym_tpu.graphs.container import bucket_size
        h_max = bucket_size(h_max)

    send_idx = np.zeros((num_shards, num_shards, h_max), np.int32)
    halo_counts = np.zeros((num_shards, num_shards), np.int64)
    for s in range(num_shards):
        for k in range(num_shards):
            ids = needed[k][s]
            send_idx[s, k, :len(ids)] = (ids - s * n_loc).astype(
                np.int32)
            halo_counts[s, k] = len(ids)

    # extended-table positions: [0, n_loc) local; halo block from shard
    # s occupies [n_loc + s*h_max, n_loc + (s+1)*h_max)
    senders_ext = np.zeros((num_shards, e_max), np.int32)
    receivers_loc = np.full((num_shards, e_max), n_loc - 1, np.int32)
    w_out = np.zeros((num_shards, e_max), np.float32)
    for k in range(num_shards):
        ix = per_shard_edges[k]
        s_k = senders[ix]
        r_k = receivers[ix]
        pos = np.empty(len(ix), np.int64)
        src = s_k // n_loc
        local = src == k
        pos[local] = s_k[local] - k * n_loc
        for s in range(num_shards):
            if s == k:
                continue
            m = src == s
            if not m.any():
                continue
            lookup = {int(v): j for j, v in enumerate(needed[k][s])}
            pos[m] = np.asarray(
                [n_loc + s * h_max + lookup[int(v)]
                 for v in s_k[m]], np.int64)
        senders_ext[k, :len(ix)] = pos
        receivers_loc[k, :len(ix)] = (r_k - k * n_loc).astype(np.int32)
        w_out[k, :len(ix)] = edge_weight[ix]

    kw = {}
    if pack:
        from graphgym_tpu.ops.pallas.spmm_kernel import pack_csr, pad_pack

        packs = [pack_csr(senders_ext[k], receivers_loc[k], w_out[k],
                          n_loc) for k in range(num_shards)]
        nc_max = max(p.senders.shape[0] for p in packs)
        packs = [pad_pack(p, nc_max, n_loc) for p in packs]
        kw = dict(
            pack_senders=np.stack([p.senders for p in packs]),
            pack_weights=np.stack([p.weights for p in packs]),
            pack_local=np.stack([p.local_rows for p in packs]),
            pack_tiles=np.stack([p.tiles for p in packs]))
    # numpy leaves: plans travel as batch-pytree fields and are placed
    # on devices in one bulk transfer (mesh.shard_batch)
    return EdgePartitionPlan(
        senders_ext=senders_ext,
        receivers_loc=receivers_loc,
        edge_weight=w_out,
        send_idx=send_idx,
        halo_counts=halo_counts,
        n_local=n_loc, num_shards=num_shards, **kw)


def partitioned_spmm(plan: EdgePartitionPlan, x: jnp.ndarray,
                     mesh: Mesh, axis: str = "edge",
                     use_kernel: bool = False) -> jnp.ndarray:
    """out = A @ x with x, out row-sharded over `axis`; one all_to_all
    of boundary rows per call.  use_kernel=True runs the packed Pallas
    segmented matmul per chip for the local reduction (requires a plan
    built with pack=True) — the single-chip kernel composed with the
    multi-chip halo exchange."""
    pn = plan.num_shards
    n_loc = plan.n_local
    d = x.shape[-1]
    if use_kernel:
        assert plan.pack_senders is not None, (
            "use_kernel needs plan_edge_partition(..., pack=True)")

    def exchange(x_loc, send_idx):
        send_buf = jnp.take(x_loc, send_idx.reshape(-1),
                            axis=0).reshape(pn, -1, d)
        halo = jax.lax.all_to_all(send_buf, axis, split_axis=0,
                                  concat_axis=0, tiled=False)
        # halo[s] = the rows shard s sent to me
        return jnp.concatenate([x_loc, halo.reshape(-1, d)])

    def local_fn(x_loc, senders_ext, receivers_loc, w, send_idx):
        # all inputs arrive with the leading shard axis stripped
        x_ext = exchange(x_loc.reshape(n_loc, d),
                         send_idx.reshape(pn, -1))
        msg = jnp.take(x_ext, senders_ext.reshape(-1), axis=0) \
            * w.reshape(-1)[:, None]
        return S.segment_sum(msg, receivers_loc.reshape(-1), n_loc)

    def local_fn_kernel(x_loc, send_idx, p_send, p_w, p_local, p_tiles):
        from graphgym_tpu.ops.pallas.spmm_kernel import (
            EDGE_GROUP, ROWS_PER_TILE, packed_segment_matmul)

        x_ext = exchange(x_loc.reshape(n_loc, d),
                         send_idx.reshape(pn, -1))
        p_send = p_send.reshape(p_send.shape[-2:])
        msg = jnp.take(x_ext, p_send.reshape(-1), axis=0).reshape(
            p_send.shape + (d,))
        num_tiles = (n_loc + ROWS_PER_TILE - 1) // ROWS_PER_TILE
        out = packed_segment_matmul(
            msg, p_local.reshape(p_send.shape),
            p_tiles.reshape(-1), num_tiles,
            weights=p_w.reshape(p_send.shape), group=EDGE_GROUP)
        return out[:n_loc]

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    if use_kernel:
        # pallas_call doesn't carry varying-mesh-axis metadata yet
        sharded = shard_map(
            local_fn_kernel, mesh=mesh,
            in_specs=(P(axis),) * 6, out_specs=P(axis),
            check_vma=False)
        return sharded(x, plan.send_idx, plan.pack_senders,
                       plan.pack_weights, plan.pack_local,
                       plan.pack_tiles)
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis))
    return sharded(x, plan.senders_ext, plan.receivers_loc,
                   plan.edge_weight, plan.send_idx)


def _coeff_dropout(alpha, rng, rate, axis):
    """Attention-coefficient dropout inside the shard_map body: the
    mask is a per-shard [E_loc, H] scalar draw (same trick as the
    single-chip packed path, nn/layers.py packed_attention); folding
    the axis index into the key makes shards independent."""
    rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
    keep = jax.random.bernoulli(rng, 1.0 - rate, alpha.shape)
    return jnp.where(keep, alpha / (1.0 - rate), 0.0)


def partitioned_attention(plan: EdgePartitionPlan, q: jnp.ndarray,
                          k: jnp.ndarray, v: jnp.ndarray, mesh: Mesh,
                          score_fn=None, axis: str = "edge",
                          node_scores=None, score_transform=None,
                          dropout_rate: float = 0.0, dropout_rng=None
                          ) -> jnp.ndarray:
    """Edge-softmax attention over the partition (the distributed GAT
    path).  Because edges are owned by their *receiver's* chip, every
    row's full incoming edge set is local — the segment softmax needs
    no cross-chip reduction (no ring pass); only the sender-side k/v
    halo moves over ICI.

    q, k: [N, H, d] row-sharded; v: [N, H, dv] row-sharded.
    score_fn(q_e, k_e) -> [E_loc, H]; defaults to scaled dot product.

    node_scores: optional (s_dst [N, H], s_src [N, H]) for scores that
    decompose per endpoint (GAT additive attention) — then q/k are
    ignored, only the [*, H] score *scalars* ride the halo exchange
    alongside v, and alpha = score_transform(s_dst[i] + s_src[j]).
    """
    pn = plan.num_shards
    n_loc = plan.n_local
    H = v.shape[1]
    dv = v.shape[-1]
    if dropout_rate > 0.0 and dropout_rng is None:
        dropout_rate = 0.0
    if node_scores is not None:
        return _partitioned_attention_nodescores(
            plan, node_scores, score_transform, v, mesh, axis,
            dropout_rate, dropout_rng)
    dh = q.shape[2]
    if score_fn is None:
        def score_fn(q_e, k_e):
            return jnp.sum(q_e * k_e, axis=-1) / jnp.sqrt(
                jnp.asarray(dh, q.dtype))
    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)

    def local_fn(q_loc, k_loc, v_loc, senders_ext, receivers_loc, w,
                 send_idx, rng):
        q_loc = q_loc.reshape(n_loc, H, dh)
        k_loc = k_loc.reshape(n_loc, H, dh)
        v_loc = v_loc.reshape(n_loc, H, dv)
        send_idx = send_idx.reshape(pn, -1)
        senders_ext = senders_ext.reshape(-1)
        receivers_loc = receivers_loc.reshape(-1)
        w = w.reshape(-1)

        def exchange(t):
            buf = jnp.take(t, send_idx.reshape(-1), axis=0).reshape(
                (pn, send_idx.shape[1]) + t.shape[1:])
            halo = jax.lax.all_to_all(buf, axis, split_axis=0,
                                      concat_axis=0, tiled=False)
            return jnp.concatenate(
                [t, halo.reshape((-1,) + t.shape[1:])])

        k_ext = exchange(k_loc)
        v_ext = exchange(v_loc)
        q_e = jnp.take(q_loc, receivers_loc, axis=0)
        k_e = jnp.take(k_ext, senders_ext, axis=0)
        alpha = score_fn(q_e, k_e)                        # [E, H]
        valid = (w != 0)[:, None] & jnp.ones_like(alpha, bool)
        alpha = S.segment_softmax(alpha, receivers_loc, n_loc,
                                  mask=valid)
        if dropout_rate > 0.0:
            alpha = _coeff_dropout(alpha, rng, dropout_rate, axis)
        msg = jnp.take(v_ext, senders_ext, axis=0) * alpha[..., None]
        return S.segment_sum(msg, receivers_loc, n_loc)

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis),
                  P(axis), P()),
        out_specs=P(axis))
    return sharded(q, k, v, plan.senders_ext, plan.receivers_loc,
                   plan.edge_weight, plan.send_idx, dropout_rng)


def _partitioned_attention_nodescores(plan: EdgePartitionPlan,
                                      node_scores, score_transform,
                                      v: jnp.ndarray, mesh: Mesh,
                                      axis: str,
                                      dropout_rate: float = 0.0,
                                      dropout_rng=None) -> jnp.ndarray:
    """Additive-attention fast path: the per-edge score is
    s_dst[receiver] + s_src[sender], so only [*, H] scalars (s_src) and
    the values cross chips — the [E, H, d] query/key vector gathers of
    the generic path vanish (same trick as the single-chip
    packed_attention node_scores path)."""
    pn = plan.num_shards
    n_loc = plan.n_local
    s_dst, s_src = node_scores
    H = v.shape[1]
    dv = v.shape[-1]
    if dropout_rng is None:
        dropout_rng = jax.random.PRNGKey(0)

    def local_fn(sd_loc, ss_loc, v_loc, senders_ext, receivers_loc, w,
                 send_idx, rng):
        sd_loc = sd_loc.reshape(n_loc, H)
        ss_loc = ss_loc.reshape(n_loc, H)
        v_loc = v_loc.reshape(n_loc, H, dv)
        send_idx = send_idx.reshape(pn, -1)
        senders_ext = senders_ext.reshape(-1)
        receivers_loc = receivers_loc.reshape(-1)
        w = w.reshape(-1)

        def exchange(t):
            buf = jnp.take(t, send_idx.reshape(-1), axis=0).reshape(
                (pn, send_idx.shape[1]) + t.shape[1:])
            halo = jax.lax.all_to_all(buf, axis, split_axis=0,
                                      concat_axis=0, tiled=False)
            return jnp.concatenate(
                [t, halo.reshape((-1,) + t.shape[1:])])

        ss_ext = exchange(ss_loc)
        v_ext = exchange(v_loc)
        alpha = jnp.take(sd_loc, receivers_loc, axis=0) \
            + jnp.take(ss_ext, senders_ext, axis=0)          # [E, H]
        if score_transform is not None:
            alpha = score_transform(alpha)
        valid = (w != 0)[:, None] & jnp.ones_like(alpha, bool)
        alpha = S.segment_softmax(alpha, receivers_loc, n_loc,
                                  mask=valid)
        if dropout_rate > 0.0:
            alpha = _coeff_dropout(alpha, rng, dropout_rate, axis)
        msg = jnp.take(v_ext, senders_ext, axis=0) * alpha[..., None]
        return S.segment_sum(msg, receivers_loc, n_loc)

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * 7 + (P(),), out_specs=P(axis))
    return sharded(s_dst, s_src, v, plan.senders_ext,
                   plan.receivers_loc, plan.edge_weight, plan.send_idx,
                   dropout_rng)


def halo_stats(plan: EdgePartitionPlan) -> dict:
    """Communication accounting for the scaling analysis: boundary rows
    exchanged vs total rows (the replicated layout moves n_total rows
    per chip per layer via all-reduce)."""
    used = int(np.asarray(plan.halo_counts).sum())
    total = plan.num_shards * plan.n_local
    return {"halo_rows": used, "total_rows": total,
            "halo_fraction": used / max(total, 1)}
