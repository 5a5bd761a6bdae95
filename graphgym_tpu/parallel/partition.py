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
    # Hub replication (round 3): rows whose features are needed by many
    # shards move once via all_gather instead of once per requesting
    # pair through the all_to_all.  hub_send_idx [Pn, Hh] = local rows
    # each shard contributes to the hub block; hub_counts [Pn] real
    # counts.  The extended table becomes
    # [x_local | pair halos (Pn*H) | hub block (Pn*Hh)].
    hub_send_idx: Optional[jnp.ndarray] = None
    hub_counts: Optional[jnp.ndarray] = None
    # Interior/boundary split (round 3): per-shard edge slots with a
    # purely-local sender (interior) separated from slots whose sender
    # rides the halo/hub exchange (boundary), so the local interior
    # segment-sum can overlap the all_to_all (XLA schedules the
    # collective asynchronously when nothing depends on it yet).
    senders_int: Optional[jnp.ndarray] = None   # [Pn, Ei] into x_local
    receivers_int: Optional[jnp.ndarray] = None
    weight_int: Optional[jnp.ndarray] = None
    senders_bnd: Optional[jnp.ndarray] = None   # [Pn, Eb] into ext tab
    receivers_bnd: Optional[jnp.ndarray] = None
    weight_bnd: Optional[jnp.ndarray] = None
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
                        bucket: bool = False,
                        replicate_hubs: bool = True,
                        hub_min_shards: int = 3,
                        hub_cap_frac: float = 0.02,
                        split_interior: bool = True
                        ) -> EdgePartitionPlan:
    """Build the partition plan on the host (numpy).  With pack=True,
    also build per-shard packed-chunk layouts so partitioned_spmm can
    run the Pallas kernel per chip (scatter-free local reduction).
    bucket=True rounds the per-shard edge and halo capacities up to
    power-of-two-ish buckets so plans from different batches share
    shapes (one compiled program per split).

    replicate_hubs: senders needed by >= hub_min_shards other shards
    (capped at hub_cap_frac of nodes, highest-multiplicity first) are
    lifted out of the pairwise halo into a hub block that moves once
    per layer via all_gather — on Zipf/hub-heavy graphs this removes
    the duplicate per-pair copies of high-out-degree rows that dominate
    boundary traffic.  split_interior: emit separate interior (local
    sender) and boundary edge arrays so the interior segment-sum can
    overlap the collectives."""
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
    for k in range(num_shards):
        s_k = senders[per_shard_edges[k]]
        src = s_k // n_loc
        for s in range(num_shards):
            if s == k:
                needed[k][s] = np.zeros(0, np.int64)
                continue
            needed[k][s] = np.unique(s_k[src == s])

    # ---- hub selection: multiplicity = #shards that need each sender
    hub_ids = np.zeros(0, np.int64)
    if replicate_hubs and num_shards > 2:
        all_needed = np.concatenate(
            [needed[k][s] for k in range(num_shards)
             for s in range(num_shards)])
        if len(all_needed):
            uniq, mult = np.unique(all_needed, return_counts=True)
            cand = uniq[mult >= hub_min_shards]
            cand_mult = mult[mult >= hub_min_shards]
            cap = max(int(hub_cap_frac * num_nodes), 1)
            if len(cand) > cap:
                top = np.argsort(-cand_mult, kind="stable")[:cap]
                cand = np.sort(cand[top])
            hub_ids = cand
    hub_set = set(int(v) for v in hub_ids)
    hubs_of = [np.sort(hub_ids[(hub_ids // n_loc) == s])
               for s in range(num_shards)]
    hh_max = max([len(h) for h in hubs_of] + [1])
    if bucket and len(hub_ids):
        from graphgym_tpu.graphs.container import bucket_size
        hh_max = bucket_size(hh_max)
    if len(hub_ids):
        for k in range(num_shards):
            for s in range(num_shards):
                ids = needed[k][s]
                needed[k][s] = ids[~np.isin(ids, hubs_of[s])]

    h_max = max([len(needed[k][s]) for k in range(num_shards)
                 for s in range(num_shards)] + [1])
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
    hub_send_idx = np.zeros((num_shards, hh_max), np.int32)
    hub_counts = np.zeros(num_shards, np.int64)
    for s in range(num_shards):
        hub_send_idx[s, :len(hubs_of[s])] = (
            hubs_of[s] - s * n_loc).astype(np.int32)
        hub_counts[s] = len(hubs_of[s])

    # extended-table positions: [0, n_loc) local; halo block from shard
    # s occupies [n_loc + s*h_max, n_loc + (s+1)*h_max); hub block from
    # shard s occupies [n_loc + Pn*h_max + s*hh_max, ... + (s+1)*hh_max)
    hub_base = n_loc + num_shards * h_max
    senders_ext = np.zeros((num_shards, e_max), np.int32)
    receivers_loc = np.full((num_shards, e_max), n_loc - 1, np.int32)
    w_out = np.zeros((num_shards, e_max), np.float32)
    interior_mask = []
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
            hub_lookup = {int(v): j for j, v in enumerate(hubs_of[s])}
            pos[m] = np.asarray(
                [n_loc + s * h_max + lookup[int(v)]
                 if int(v) not in hub_set
                 else hub_base + s * hh_max + hub_lookup[int(v)]
                 for v in s_k[m]], np.int64)
        senders_ext[k, :len(ix)] = pos
        receivers_loc[k, :len(ix)] = (r_k - k * n_loc).astype(np.int32)
        w_out[k, :len(ix)] = edge_weight[ix]
        interior_mask.append(local)

    kw = {}
    if len(hub_ids):
        kw.update(hub_send_idx=hub_send_idx, hub_counts=hub_counts)
    if split_interior:
        # interior = sender local to the shard; boundary = sender in
        # the halo/hub blocks.  Padded slots (weight 0) go interior —
        # they point at local row n_loc - 1.
        ei = max(max((int(m.sum()) for m in interior_mask), default=0),
                 1)
        eb = max(max((len(ix) - int(m.sum())
                      for ix, m in zip(per_shard_edges, interior_mask)),
                     default=0), 1)
        if bucket:
            from graphgym_tpu.graphs.container import bucket_size
            ei, eb = bucket_size(ei), bucket_size(eb)
        s_int = np.full((num_shards, ei), n_loc - 1, np.int32)
        r_int = np.full((num_shards, ei), n_loc - 1, np.int32)
        w_int = np.zeros((num_shards, ei), np.float32)
        s_bnd = np.full((num_shards, eb), n_loc - 1, np.int32)
        r_bnd = np.full((num_shards, eb), n_loc - 1, np.int32)
        w_bnd = np.zeros((num_shards, eb), np.float32)
        for k in range(num_shards):
            ne = len(per_shard_edges[k])
            m = interior_mask[k]
            pos_k = senders_ext[k, :ne]
            r_k = receivers_loc[k, :ne]
            wk = w_out[k, :ne]
            s_int[k, :m.sum()] = pos_k[m]
            r_int[k, :m.sum()] = r_k[m]
            w_int[k, :m.sum()] = wk[m]
            nb = ne - int(m.sum())
            s_bnd[k, :nb] = pos_k[~m]
            r_bnd[k, :nb] = r_k[~m]
            w_bnd[k, :nb] = wk[~m]
        kw.update(senders_int=s_int, receivers_int=r_int,
                  weight_int=w_int, senders_bnd=s_bnd,
                  receivers_bnd=r_bnd, weight_bnd=w_bnd)
    if pack:
        from graphgym_tpu.ops.pallas.spmm_kernel import pack_csr, pad_pack

        packs = [pack_csr(senders_ext[k], receivers_loc[k], w_out[k],
                          n_loc) for k in range(num_shards)]
        nc_max = max(p.senders.shape[0] for p in packs)
        packs = [pad_pack(p, nc_max, n_loc) for p in packs]
        kw.update(
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


def _exchange_parts(x_loc, send_idx, hub_idx, pn, axis):
    """Collect the remote parts of the extended table: pairwise halo
    rows via all_to_all plus (when hub replication is on) the hub block
    via all_gather.  Returns a list of [*, d]-shaped blocks ORDERED to
    match plan_edge_partition's extended-table positions."""
    d = x_loc.shape[-1]
    send_buf = jnp.take(x_loc, send_idx.reshape(-1),
                        axis=0).reshape(pn, -1, d)
    halo = jax.lax.all_to_all(send_buf, axis, split_axis=0,
                              concat_axis=0, tiled=False)
    parts = [halo.reshape(-1, d)]
    if hub_idx is not None:
        hub_rows = jnp.take(x_loc, hub_idx.reshape(-1), axis=0)
        hubs = jax.lax.all_gather(hub_rows, axis, axis=0,
                                  tiled=False)           # [pn, Hh, d]
        parts.append(hubs.reshape(-1, d))
    return parts


def partitioned_spmm(plan: EdgePartitionPlan, x: jnp.ndarray,
                     mesh: Mesh, axis: str = "edge",
                     use_kernel: bool = False) -> jnp.ndarray:
    """out = A @ x with x, out row-sharded over `axis`; one all_to_all
    of boundary rows (+ one hub all_gather when the plan replicates
    hubs) per call.  use_kernel=True runs the packed Pallas segmented
    matmul per chip for the local reduction (requires a plan built with
    pack=True) — the single-chip kernel composed with the multi-chip
    halo exchange.

    Plans built with split_interior carry separate interior/boundary
    edge arrays: the collectives are issued first, the interior
    segment-sum (which depends only on local rows) runs while they are
    in flight, and only the boundary segment-sum waits for the halo —
    XLA's async collective scheduling overlaps the all_to_all with the
    interior compute."""
    pn = plan.num_shards
    n_loc = plan.n_local
    d = x.shape[-1]
    has_hubs = plan.hub_send_idx is not None
    split = plan.senders_int is not None and not use_kernel
    if use_kernel:
        assert plan.pack_senders is not None, (
            "use_kernel needs plan_edge_partition(..., pack=True)")

    def exchange(x_loc, send_idx, hub_idx):
        parts = _exchange_parts(x_loc, send_idx, hub_idx, pn, axis)
        return jnp.concatenate([x_loc] + parts)

    def local_fn(x_loc, senders_ext, receivers_loc, w, send_idx,
                 *hub):
        # all inputs arrive with the leading shard axis stripped
        x_ext = exchange(x_loc.reshape(n_loc, d),
                         send_idx.reshape(pn, -1),
                         hub[0] if has_hubs else None)
        msg = jnp.take(x_ext, senders_ext.reshape(-1), axis=0) \
            * w.reshape(-1)[:, None]
        return S.segment_sum(msg, receivers_loc.reshape(-1), n_loc)

    def local_fn_split(x_loc, s_int, r_int, w_int, s_bnd, r_bnd,
                       w_bnd, send_idx, *hub):
        x_loc = x_loc.reshape(n_loc, d)
        # issue the collectives first — nothing below depends on them
        # until the boundary pass, so the interior segment-sum overlaps
        parts = _exchange_parts(x_loc, send_idx.reshape(pn, -1),
                                hub[0] if has_hubs else None, pn, axis)
        msg_i = jnp.take(x_loc, s_int.reshape(-1), axis=0) \
            * w_int.reshape(-1)[:, None]
        interior = S.segment_sum(msg_i, r_int.reshape(-1), n_loc)
        x_ext = jnp.concatenate([x_loc] + parts)
        msg_b = jnp.take(x_ext, s_bnd.reshape(-1), axis=0) \
            * w_bnd.reshape(-1)[:, None]
        boundary = S.segment_sum(msg_b, r_bnd.reshape(-1), n_loc)
        return interior + boundary

    def local_fn_kernel(x_loc, send_idx, p_send, p_w, p_local, p_tiles,
                        *hub):
        from graphgym_tpu.ops.pallas.spmm_kernel import (
            EDGE_GROUP, ROWS_PER_TILE, packed_segment_matmul)

        x_ext = exchange(x_loc.reshape(n_loc, d),
                         send_idx.reshape(pn, -1),
                         hub[0] if has_hubs else None)
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

    hub_args = (plan.hub_send_idx,) if has_hubs else ()
    if use_kernel:
        # pallas_call doesn't carry varying-mesh-axis metadata yet
        sharded = shard_map(
            local_fn_kernel, mesh=mesh,
            in_specs=(P(axis),) * (6 + len(hub_args)),
            out_specs=P(axis), check_vma=False)
        return sharded(x, plan.send_idx, plan.pack_senders,
                       plan.pack_weights, plan.pack_local,
                       plan.pack_tiles, *hub_args)
    if split:
        sharded = shard_map(
            local_fn_split, mesh=mesh,
            in_specs=(P(axis),) * (8 + len(hub_args)),
            out_specs=P(axis))
        return sharded(x, plan.senders_int, plan.receivers_int,
                       plan.weight_int, plan.senders_bnd,
                       plan.receivers_bnd, plan.weight_bnd,
                       plan.send_idx, *hub_args)
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * (5 + len(hub_args)), out_specs=P(axis))
    return sharded(x, plan.senders_ext, plan.receivers_loc,
                   plan.edge_weight, plan.send_idx, *hub_args)


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
        # never silently train without the requested attention dropout
        # — callers must thread an rng when they ask for a rate
        raise ValueError(
            "partitioned_attention: dropout_rate > 0 requires a "
            "dropout_rng (pass one, or set the rate to 0)")
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

    has_hubs = plan.hub_send_idx is not None

    def local_fn(q_loc, k_loc, v_loc, senders_ext, receivers_loc, w,
                 send_idx, rng, *hub):
        q_loc = q_loc.reshape(n_loc, H, dh)
        k_loc = k_loc.reshape(n_loc, H, dh)
        v_loc = v_loc.reshape(n_loc, H, dv)
        send_idx = send_idx.reshape(pn, -1)
        senders_ext = senders_ext.reshape(-1)
        receivers_loc = receivers_loc.reshape(-1)
        w = w.reshape(-1)

        def exchange(t):
            flat = t.reshape(t.shape[0], -1)
            parts = _exchange_parts(flat, send_idx,
                                    hub[0] if has_hubs else None, pn,
                                    axis)
            return jnp.concatenate([flat] + parts).reshape(
                (-1,) + t.shape[1:])

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

    hub_args = (plan.hub_send_idx,) if has_hubs else ()
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * 7 + (P(),) + (P(axis),) * len(hub_args),
        out_specs=P(axis))
    return sharded(q, k, v, plan.senders_ext, plan.receivers_loc,
                   plan.edge_weight, plan.send_idx, dropout_rng,
                   *hub_args)


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

    has_hubs = plan.hub_send_idx is not None

    def local_fn(sd_loc, ss_loc, v_loc, senders_ext, receivers_loc, w,
                 send_idx, rng, *hub):
        sd_loc = sd_loc.reshape(n_loc, H)
        ss_loc = ss_loc.reshape(n_loc, H)
        v_loc = v_loc.reshape(n_loc, H, dv)
        send_idx = send_idx.reshape(pn, -1)
        senders_ext = senders_ext.reshape(-1)
        receivers_loc = receivers_loc.reshape(-1)
        w = w.reshape(-1)

        def exchange(t):
            flat = t.reshape(t.shape[0], -1)
            parts = _exchange_parts(flat, send_idx,
                                    hub[0] if has_hubs else None, pn,
                                    axis)
            return jnp.concatenate([flat] + parts).reshape(
                (-1,) + t.shape[1:])

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

    hub_args = (plan.hub_send_idx,) if has_hubs else ()
    sharded = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(axis),) * 7 + (P(),) + (P(axis),) * len(hub_args),
        out_specs=P(axis))
    return sharded(s_dst, s_src, v, plan.senders_ext,
                   plan.receivers_loc, plan.edge_weight, plan.send_idx,
                   dropout_rng, *hub_args)


def halo_stats(plan: EdgePartitionPlan) -> dict:
    """Communication accounting for the scaling analysis: boundary rows
    exchanged vs total rows (the replicated layout moves n_total rows
    per chip per layer via all-reduce).

    halo_rows counts pairwise all_to_all rows (each requested copy);
    hub_rows counts hub-block rows each device RECEIVES via the
    all_gather (total hubs minus its own) — the dedup win of hub
    replication shows up as halo_rows shrinking by more than
    hub_rows * Pn grows."""
    counts = np.asarray(plan.halo_counts)
    used = int(counts.sum())
    total = plan.num_shards * plan.n_local
    # The step-time-relevant quantity is the bottleneck DEVICE's
    # all_to_all load: sends are skewed on hub-heavy graphs (the hub's
    # owner ships one copy per requesting shard), so track per-device
    # send and receive maxima, not just the sum.  Hub replication
    # converts those duplicate sends into one ring all_gather whose
    # per-device cost is ~the total hub block (forwarding included),
    # paid equally by every device.
    send_rows = counts.sum(axis=1)   # rows device s ships out
    recv_rows = counts.sum(axis=0)   # rows device k takes in
    out = {"halo_rows": used, "total_rows": total,
           "halo_fraction": used / max(total, 1),
           "max_send_rows": int(send_rows.max()) if len(send_rows)
           else 0,
           "max_recv_rows": int(recv_rows.max()) if len(recv_rows)
           else 0}
    out["bottleneck_rows"] = max(out["max_send_rows"],
                                 out["max_recv_rows"])
    if plan.hub_counts is not None:
        hub_total = int(np.asarray(plan.hub_counts).sum())
        # ring all_gather: every device sends AND receives ~the whole
        # hub block (minus its own share)
        out["hub_unique"] = hub_total
        out["hub_rows_per_dev"] = hub_total * (plan.num_shards - 1) \
            // max(plan.num_shards, 1)
        out["bottleneck_rows"] += out["hub_rows_per_dev"]
    if plan.weight_int is not None:
        out["interior_edges"] = int(
            (np.asarray(plan.weight_int) != 0).sum())
        out["boundary_edges"] = int(
            (np.asarray(plan.weight_bnd) != 0).sum())
    return out
