"""Sparse adjacency algebra on COO graphs — SpMM, SDDMM, GCN norm.

TPU-native re-design of the reference's SparseAdj (sparse_adj.py:16-161)
and gcn_norm_adj (TfgIDLayer.py:528-566).  Instead of an object wrapping
dynamic tensors, these are pure functions over (senders, receivers,
edge_weight) index arrays with static shapes, so every op traces into a
single fused XLA program (gather -> scale -> scatter-add lowers onto the
TPU as vectorized dynamic-slice / accumulate; the large matmuls around it
run on the MXU).

An optional Pallas kernel path for the hot SpMM lives in
graphgym_tpu.ops.pallas and is dispatched via ``implementation=``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from graphgym_tpu.ops import segment as S


def spmm(senders: jnp.ndarray, receivers: jnp.ndarray,
         edge_weight: Optional[jnp.ndarray], x: jnp.ndarray,
         num_nodes: int, *, reduce: str = "sum",
         edge_mask: Optional[jnp.ndarray] = None,
         implementation: str = "xla") -> jnp.ndarray:
    """out[r] = reduce_{(s,r) in E} edge_weight[s,r] * x[s].

    The reference SpMM: SparseAdj.matmul = gather(col) * w ->
    unsorted_segment_sum(row) (sparse_adj.py:91-97).  ``reduce`` extends it
    with mean/max for the GeneralConv agg options (cfg.gnn.agg,
    contrib/layer/generalconv.py:18).
    """
    if implementation == "pallas" and reduce == "sum":
        import jax.core
        if isinstance(senders, jax.core.Tracer):
            raise ValueError(
                "spmm(implementation='pallas') packs edges on the host "
                "and cannot run on traced indices inside jit; carry "
                "PackedCSR layouts in the GraphBatch instead "
                "(cfg.tpu.spmm_impl='pallas' + graphs.packing)")
        from graphgym_tpu.ops.pallas import spmm_kernel
        return spmm_kernel.spmm_pallas(senders, receivers, edge_weight, x,
                                       num_nodes)
    msg = jnp.take(x, senders, axis=0)
    if edge_weight is not None:
        msg = msg * edge_weight[:, None]
    if reduce == "sum":
        return S.segment_sum(msg, receivers, num_nodes)
    if reduce == "mean":
        return S.segment_mean(msg, receivers, num_nodes, mask=edge_mask)
    if reduce == "max":
        return S.segment_max(msg, receivers, num_nodes, mask=edge_mask)
    raise ValueError(f"Unknown reduce: {reduce}")


def sddmm_dot(senders: jnp.ndarray, receivers: jnp.ndarray,
              a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-edge dot products: out[e] = <a[receivers[e]], b[senders[e]]>.

    The SDDMM companion of edge-softmax attention (reference
    TfgIDLayer.py:338-339: att_score = sum(Q[row] * K[col]) / sqrt(d),
    without the scale).
    """
    return jnp.sum(jnp.take(a, receivers, axis=0) *
                   jnp.take(b, senders, axis=0), axis=-1)


def degree(receivers: jnp.ndarray, edge_weight: Optional[jnp.ndarray],
           num_nodes: int) -> jnp.ndarray:
    """Weighted in-degree (SparseAdj.reduce_sum over rows,
    sparse_adj.py:84-85)."""
    if edge_weight is None:
        edge_weight = jnp.ones(receivers.shape, jnp.float32)
    return S.segment_sum(edge_weight, receivers, num_nodes)


def inv_sqrt_degree(deg: jnp.ndarray) -> jnp.ndarray:
    """deg^-1/2 with the reference's inf/nan guard
    (TfgIDLayer.py:550-555, idconv.py:57-58)."""
    d = jnp.power(deg, -0.5)
    return jnp.where(jnp.isfinite(d), d, 0.0)


def gcn_norm(senders: jnp.ndarray, receivers: jnp.ndarray,
             edge_weight: Optional[jnp.ndarray], num_nodes: int,
             *, improved: bool = False,
             node_mask: Optional[jnp.ndarray] = None,
             add_self_loops: bool = True):
    """GCN renormalization D^-1/2 (A + I) D^-1/2.

    Static-shape version of the reference's two implementations:
      * gcn_norm_adj (TfgIDLayer.py:528-566): add_self_loop then sym-norm.
      * GCNIDConvLayer.norm (idconv.py:132-148): add_remaining_self_loops
        then sym-norm.
    For static shapes we always *append* one self-loop per node slot
    (never dedup): for graphs whose edge list has no explicit self-loops
    (all datasets in the reference corpus) this is numerically identical
    to add_remaining_self_loops.  Padded slots get weight-0 loops via
    ``node_mask``.

    Returns (senders, receivers, normed_edge_weight) with E + N entries.
    """
    e = senders.shape[0]
    if edge_weight is None:
        edge_weight = jnp.ones((e,), jnp.float32)
    fill = 2.0 if improved else 1.0
    if add_self_loops:
        loop = jnp.arange(num_nodes, dtype=senders.dtype)
        if node_mask is not None:
            loop_w = jnp.where(node_mask, fill, 0.0)
        else:
            loop_w = jnp.full((num_nodes,), fill, jnp.float32)
        senders = jnp.concatenate([senders, loop])
        receivers = jnp.concatenate([receivers, loop])
        edge_weight = jnp.concatenate([edge_weight, loop_w])
    deg = degree(receivers, edge_weight, num_nodes)
    dis = inv_sqrt_degree(deg)
    # (D^-1/2 A) D^-1/2 as two diagonal scalings of edge weights
    # (reference sparse_ops.py:6-12, TfgIDLayer.py:558).
    w = dis[receivers] * edge_weight * dis[senders]
    return senders, receivers, w


def scatter_add_rows(x: jnp.ndarray, index: jnp.ndarray,
                     updates: jnp.ndarray,
                     mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x.at[index] += updates — the ID-GNN identity-recombination
    primitive (reference idconv.py:64-67 ``index_add_`` /
    TfgIDLayer.py:107 ``tensor_scatter_nd_add``)."""
    if mask is not None:
        updates = jnp.where(mask[:, None], updates, 0.0)
    return x.at[index].add(updates)


def apply_id_weights(x: jnp.ndarray, id_index: jnp.ndarray,
                     weight: jnp.ndarray, weight_id: jnp.ndarray,
                     id_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """h = x @ W with rows in id_index additionally += x[id] @ W_id.

    The identity-coloring trick shared by all five ID layers (reference
    idconv.py:62-67):
        x_id = x[id] @ weight_id;  x = x @ weight;  x[id] += x_id
    Both matmuls are dense MXU work; the recombination is one scatter-add.
    """
    h = jnp.dot(x, weight, preferred_element_type=x.dtype)
    h_id = jnp.dot(jnp.take(x, id_index, axis=0), weight_id,
                   preferred_element_type=x.dtype)
    return scatter_add_rows(h, id_index, h_id, mask=id_mask)
