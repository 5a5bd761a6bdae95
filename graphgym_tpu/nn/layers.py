"""GNN layer zoo (flax.linen, GraphBatch in -> GraphBatch out).

TPU-native re-design of the reference's layer zoo:
  * graphgym/models/layer.py:16-238 (GeneralLayer wrapper, Linear, MLP,
    GCN/SAGE/GAT/GIN/General convs)
  * graphgym/contrib/layer/generalconv.py:12-218 (GeneralConvLayer with
    agg / self_msg / normalize options, GeneralEdgeConvLayer)
  * TfgIDLayer.py (tfg-style GCN / dot-attention GAT / mean-SAGE / GIN —
    the fork's headline path)

Design differences from the reference (deliberate, TPU-first):
  * No global mutable cfg reads at call time — every option is a module
    attribute wired by the model builder (SURVEY.md §7 "hard parts").
  * Message passing = gather -> (optional per-edge transform) ->
    masked segment reduce, all static-shape; dense projections run on
    the MXU in one fused XLA program.
  * Multi-head attention keeps heads as a tensor axis instead of the
    reference's virtual-node packing (TfgIDLayer.py:333-336) — same
    math, vectorized for the VPU.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from graphgym_tpu.graphs.container import GraphBatch
from graphgym_tpu.nn.act import act_dict
from graphgym_tpu.nn.norm import MaskedBatchNorm, l2_normalize
from graphgym_tpu.ops import segment as S
from graphgym_tpu.ops import sparse as sp

# Kernel initializers.  The reference's torch path re-initializes the
# nn.Linear modules (pre/post-MP stacks, heads, GIN's Sequential MLP)
# with xavier_uniform at gain=calculate_gain('relu')=sqrt(2) and zero
# bias (init.py:6-16 via model.apply(init_weights) in
# model_builder.py) — but ONLY nn.Linear: PyG conv internals
# (GCNConv.weight, GATConv.att, PyG's own Linear class) are plain
# Parameters and keep their gain-1 glorot (advisor r4).  The Tfg/Keras
# path keeps TF glorot (gain 1) everywhere.  The gain is therefore
# threaded per-module (GNNOptions.linear_gain -> Linear/MLP/head
# `gain` attributes) instead of the old process-global switch, which
# leaked across models built before the first init trace (advisor r4
# low, layers.py:43).
glorot = nn.initializers.variance_scaling(1.0, "fan_avg", "uniform")


def xavier_uniform(gain: float = 1.0):
    """torch nn.init.xavier_uniform_ with a gain (variance scale
    gain^2); gain=1 is exactly `glorot`."""
    if gain == 1.0:
        return glorot
    return nn.initializers.variance_scaling(
        float(gain) ** 2, "fan_avg", "uniform")


zeros_init = nn.initializers.zeros


def packed_spmm(graph: GraphBatch, kind: str, h: jnp.ndarray):
    """Use the batch-carried Pallas pack when present (built by the
    loader when cfg.tpu.spmm_impl == 'pallas'); None -> caller falls
    back to the XLA path.

    When a device mesh is active (Trainer wraps its jitted steps in
    parallel.context.use_mesh) and the loader attached
    EdgePartitionPlans (cfg.tpu.partition == 'node'), dispatches the
    halo-exchange partitioned SpMM instead — the multi-chip execution
    path of every SpMM-based layer."""
    mesh = _active_mesh()
    if mesh is not None and graph.plans is not None \
            and kind in graph.plans:
        from graphgym_tpu.parallel.partition import partitioned_spmm
        plan = graph.plans[kind]
        return partitioned_spmm(plan, h, mesh, axis=mesh.axis_names[0],
                                use_kernel=plan.pack_senders is not None)
    if graph.packs is not None and kind in graph.packs:
        from graphgym_tpu.ops.pallas.spmm_kernel import spmm_pack_vjp
        fwd, bwd = graph.packs[kind]
        return spmm_pack_vjp(fwd, bwd, h)
    return None


def _active_mesh():
    from graphgym_tpu.parallel.context import active_mesh
    return active_mesh()


def packed_attention(graph: GraphBatch, h_heads: jnp.ndarray,
                     score_fn=None, values: Optional[jnp.ndarray] = None,
                     keys: Optional[jnp.ndarray] = None,
                     node_scores=None, score_transform=None,
                     dropout_rate: float = 0.0, dropout_rng=None):
    """Fused-layout multi-head attention over the 'att' pack: per-edge
    scores and softmax run on scalars in packed slot order (no [E, D]
    scatters), value aggregation through the differentiable Pallas
    segmented matmul.

    h_heads: [N, H, d] per-head receiver-side (query) features; keys
    defaults to h_heads (sender side); values defaults to h_heads.
    score_fn(h_i, h_j) -> [NC, C, H] raw scores.

    node_scores: optional (s_dst [N, H], s_src [N, H]) pair for scores
    that decompose per node (GAT's additive attention: a . [h_i || h_j]
    = a_l . h_i + a_r . h_j).  When given, only the [E, H] *scalars* are
    gathered per edge — the [E, H, d] query/key vector gathers vanish —
    and alpha = score_transform(s_dst[i] + s_src[j]).
    Returns [N, H, dv] aggregated output, or None when no 'att' pack.
    """
    assert score_fn is not None or node_scores is not None, (
        "packed_attention needs either score_fn or node_scores")
    mesh = _active_mesh()
    if mesh is not None and graph.plans is not None \
            and "att" in graph.plans:
        from graphgym_tpu.parallel.partition import partitioned_attention
        return partitioned_attention(
            graph.plans["att"], h_heads,
            keys if keys is not None else h_heads,
            values if values is not None else h_heads, mesh,
            score_fn=score_fn, axis=mesh.axis_names[0],
            node_scores=node_scores, score_transform=score_transform,
            dropout_rate=dropout_rate, dropout_rng=dropout_rng)
    if graph.packs is None or "att" not in graph.packs:
        return None
    from graphgym_tpu.ops.pallas.spmm_kernel import (
        pack_rows, segment_matmul_headed_vjp)
    fwd, _ = graph.packs["att"]
    n = graph.num_nodes
    H = h_heads.shape[1]
    v = values if values is not None else h_heads
    dv = v.shape[-1]
    rows = pack_rows(fwd)                       # [NC, C]
    valid = fwd.weights > 0

    def take_padded(arr, idx):
        # pack padding slots gather from index n (the extra pad row) —
        # append it so jnp.take never goes out of bounds (NaN fill)
        padded = jnp.concatenate(
            [arr, jnp.zeros((1,) + arr.shape[1:], arr.dtype)])
        return jnp.take(padded, idx.reshape(-1), axis=0).reshape(
            idx.shape + arr.shape[1:])

    if node_scores is not None:
        s_dst, s_src = node_scores
        alpha = (take_padded(s_dst, rows)
                 + take_padded(s_src, fwd.senders))  # [NC, C, H]
        if score_transform is not None:
            alpha = score_transform(alpha)
    else:
        k = keys if keys is not None else h_heads
        h_j = take_padded(k, fwd.senders)       # [NC, C, H, d]
        h_i = take_padded(h_heads, rows)
        alpha = score_fn(h_i, h_j)              # [NC, C, H]
    flat = alpha.reshape(-1, H)
    flat_rows = rows.reshape(-1)
    mask = valid.reshape(-1)[:, None] & jnp.ones_like(flat, bool)
    alpha_sm = S.segment_softmax(flat, flat_rows, n, mask=mask)
    alpha_sm = alpha_sm.reshape(alpha.shape)
    if dropout_rate > 0.0 and dropout_rng is not None:
        # attention-coefficient dropout (reference attconv.py
        # att_dropout): scalar [*, H] mask on the softmax'd
        # coefficients — rides the per-head weighted kernel, so the
        # packed path no longer bails out when att_dropout > 0
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    alpha_sm.shape)
        alpha_sm = jnp.where(keep, alpha_sm / (1.0 - dropout_rate), 0.0)
    # raw value gather; the per-head alpha multiply runs inside the
    # kernel (segment_matmul_headed_vjp) — no [E, H*dv] XLA multiply
    v_j = take_padded(v, fwd.senders).reshape(
        fwd.senders.shape + (H * dv,))
    out = segment_matmul_headed_vjp(v_j, alpha_sm, fwd.local_rows,
                                    fwd.tiles, n, H)
    return out.reshape(n, H, dv)


# --------------------------------------------------------------------------
# Basic node-feature layers
# --------------------------------------------------------------------------

class Linear(nn.Module):
    """Linear layer on node features (reference layer.py:72-82).

    ``gain``: xavier gain for the kernel — sqrt(2) replicates the
    reference torch path's init_weights on nn.Linear (init.py:6-16);
    conv-internal kernels keep gain 1 (see the initializer note)."""
    dim_out: int
    use_bias: bool = False
    gain: float = 1.0

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        w = self.param("kernel", xavier_uniform(self.gain),
                       (x.shape[-1], self.dim_out))
        h = jnp.dot(x, w, preferred_element_type=x.dtype)
        if self.use_bias:
            h = h + self.param("bias", zeros_init, (self.dim_out,))
        return graph.replace(node_feat=h)


class GeneralLayer(nn.Module):
    """conv + BatchNorm + dropout + act wrapper (reference layer.py:16-47)."""
    layer: nn.Module
    dim_out: int
    has_act: bool = True
    has_bn: bool = True
    has_l2norm: bool = False
    dropout: float = 0.0
    act: str = "relu"
    bn_eps: float = 1e-5
    bn_mom: float = 0.1

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        graph = self.layer(graph, train)
        x = graph.node_feat
        if self.has_bn:
            x = MaskedBatchNorm(self.dim_out, eps=self.bn_eps,
                                momentum=self.bn_mom)(
                x, graph.node_mask, train)
        if self.dropout > 0:
            x = nn.Dropout(rate=self.dropout, deterministic=not train)(x)
        if self.has_act:
            if self.act == "prelu":
                from graphgym_tpu.nn.act import PReLU
                x = PReLU()(x)
            else:
                x = act_dict[self.act](x)
        if self.has_l2norm:
            x = l2_normalize(x, axis=-1)
        return graph.replace(node_feat=x)


class MLP(nn.Module):
    """MLP on node features (reference layer.py:109-132): num_layers-1
    hidden Linear+BN+act blocks followed by a plain Linear."""
    dim_out: int
    num_layers: int = 2
    dim_inner: Optional[int] = None
    use_bias: bool = True
    has_bn: bool = True
    dropout: float = 0.0
    act: str = "relu"
    gain: float = 1.0

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        dim_inner = self.dim_inner
        for i in range(self.num_layers - 1):
            d = dim_inner if dim_inner is not None else graph.node_feat.shape[-1]
            graph = GeneralLayer(
                Linear(d, use_bias=not self.has_bn, gain=self.gain), d,
                has_act=True, has_bn=self.has_bn, dropout=self.dropout,
                act=self.act)(graph, train)
        return Linear(self.dim_out, use_bias=self.use_bias,
                      gain=self.gain)(graph, train)


# --------------------------------------------------------------------------
# Message-passing convolutions
# --------------------------------------------------------------------------

class GCNConv(nn.Module):
    """GCN with renormalization trick: h = D^-1/2 (A+I) D^-1/2 (x W) + b.

    Matches pyg GCNConv / tfg gcn (reference layer.py:135-142,
    TfgIDLayer.py:478-525 without the id kernel).
    """
    dim_out: int
    use_bias: bool = False
    improved: bool = False
    spmm_impl: str = "xla"

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        w = self.param("kernel", glorot, (x.shape[-1], self.dim_out))
        h = jnp.dot(x, w, preferred_element_type=x.dtype)
        packed = None if self.improved else packed_spmm(graph, "gcn", h)
        if packed is not None:
            h = packed
        else:
            s, r, wgt = sp.gcn_norm(graph.senders, graph.receivers,
                                    graph.edge_weight, graph.num_nodes,
                                    improved=self.improved,
                                    node_mask=graph.node_mask)
            h = sp.spmm(s, r, wgt, h, graph.num_nodes)
        if self.use_bias:
            h = h + self.param("bias", zeros_init, (self.dim_out,))
        return graph.replace(node_feat=h)


class SAGEConv(nn.Module):
    """GraphSAGE with mean aggregation.

    combine='concat' matches tfg MeanGraphSage / IDSAGE
    (TfgIDLayer.py:86-120): h = [x @ W_self || mean_nb @ W_nb];
    combine='sum' matches pyg SAGEConv (reference layer.py:145-152):
    h = x @ W_self + mean_nb @ W_nb.
    """
    dim_out: int
    use_bias: bool = False
    combine: str = "sum"  # 'sum' | 'concat'

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        if self.combine == "concat":
            assert self.dim_out % 2 == 0, (
                "SAGEConv concat needs an even dim_out (tfg: 'units "
                "must be an even number if concat is True')")
        d = self.dim_out // 2 if self.combine == "concat" else self.dim_out
        w_self = self.param("self_kernel", glorot, (x.shape[-1], d))
        w_nb = self.param("neighbor_kernel", glorot, (x.shape[-1], d))
        # tfg's mean_reducer aggregates x[col] grouped by row=receivers
        # where in its call row/col are (receiver, sender).
        nb = packed_spmm(graph, "mean", x)
        if nb is None:
            nb = sp.spmm(graph.senders, graph.receivers, None, x,
                         graph.num_nodes, reduce="mean",
                         edge_mask=graph.edge_mask)
        h_nb = jnp.dot(nb, w_nb, preferred_element_type=x.dtype)
        h_self = jnp.dot(x, w_self, preferred_element_type=x.dtype)
        if self.combine == "concat":
            h = jnp.concatenate([h_self, h_nb], axis=-1)
        else:
            h = h_self + h_nb
        if self.use_bias:
            h = h + self.param("bias", zeros_init, (self.dim_out,))
        return graph.replace(node_feat=h)


class GATConv(nn.Module):
    """PyG-style additive-attention GAT (reference layer.py:155-162 via
    pyg.nn.GATConv; math also in contrib/layer/idconv.py:317-332):

      e_ij = leakyrelu(a_l . (W x_i) + a_r . (W x_j))
      alpha = segment_softmax_j(e_ij) over receivers i
      h_i = sum_j alpha_ij W x_j          (heads concatenated)

    Self-loops are appended per node slot before attention
    (idconv.py:302-304).
    """
    dim_out: int
    heads: int = 1
    use_bias: bool = False
    negative_slope: float = 0.2
    att_dropout: float = 0.0
    concat_heads: bool = True

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        n = graph.num_nodes
        h_dim = self.dim_out if not self.concat_heads else self.dim_out
        per_head = h_dim // self.heads if self.concat_heads else h_dim
        if self.concat_heads:
            assert self.dim_out % self.heads == 0
        w = self.param("kernel", glorot, (x.shape[-1],
                                          self.heads * per_head))
        att = self.param("att", glorot, (1, self.heads, 2 * per_head))
        h = jnp.dot(x, w, preferred_element_type=x.dtype)
        h = h.reshape(n, self.heads, per_head)

        # The additive score decomposes per endpoint:
        # a . [h_i || h_j] = a_l . h_i + a_r . h_j — compute the [N, H]
        # halves once on nodes, gather scalars (not vectors) per edge.
        s_dst = jnp.sum(h * att[:, :, :per_head], axis=-1)   # [N, H]
        s_src = jnp.sum(h * att[:, :, per_head:], axis=-1)

        def lrelu(a):
            return jax.nn.leaky_relu(a, negative_slope=self.negative_slope)

        drop = self.att_dropout if train else 0.0
        packed = packed_attention(
            graph, h, None, node_scores=(s_dst, s_src),
            score_transform=lrelu, dropout_rate=drop,
            dropout_rng=self.make_rng("dropout") if drop > 0 else None)
        if packed is not None:
            out = packed.reshape(n, self.heads * per_head) \
                if self.concat_heads else jnp.mean(packed, axis=1)
            if self.use_bias:
                out = out + self.param("bias", zeros_init,
                                       (out.shape[-1],))
            return graph.replace(node_feat=out)

        loop = jnp.arange(n, dtype=graph.senders.dtype)
        senders = jnp.concatenate([graph.senders, loop])
        receivers = jnp.concatenate([graph.receivers, loop])
        mask = jnp.concatenate([graph.edge_mask, graph.node_mask])

        h_j = jnp.take(h, senders, axis=0)     # [E, H, F]
        alpha = lrelu(jnp.take(s_dst, receivers, axis=0)
                      + jnp.take(s_src, senders, axis=0))   # [E, H]
        alpha = S.segment_softmax(alpha, receivers, n,
                                  mask=mask[:, None] & jnp.ones_like(
                                      alpha, bool))
        if self.att_dropout > 0:
            alpha = nn.Dropout(rate=self.att_dropout,
                               deterministic=not train)(alpha)
        msg = h_j * alpha[..., None]
        out = S.segment_sum(msg, receivers, n)   # [N, H, F]
        if self.concat_heads:
            out = out.reshape(n, self.heads * per_head)
        else:
            out = jnp.mean(out, axis=1)
        if self.use_bias:
            out = out + self.param("bias", zeros_init, (out.shape[-1],))
        return graph.replace(node_feat=out)


class TfgGATConv(nn.Module):
    """tf_geometric-style multi-head dot-product attention GAT — the
    fork's Tfg-gat model core (TfgIDLayer.py:269-388 ``gat_id`` without
    the identity kernel):

      Q = relu(x Wq + bq)[receivers],  K = relu(x Wk + bk)[senders]
      score = sum_h(Q_h * K_h) / sqrt(d_h);  alpha = edge-softmax
      h = alpha-SpMM over V = x Wv  (value heads split & re-concatenated)

    Heads live on a tensor axis rather than as virtual nodes.
    """
    dim_out: int
    heads: int = 1
    attention_units: Optional[int] = None
    use_bias: bool = True
    split_value_heads: bool = True
    att_dropout: float = 0.0
    query_act: str = "relu"
    key_act: str = "relu"

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        n = graph.num_nodes
        att_units = self.attention_units or self.dim_out
        assert att_units % self.heads == 0
        dh = att_units // self.heads

        wq = self.param("query_kernel", glorot, (x.shape[-1], att_units))
        bq = self.param("query_bias", zeros_init, (att_units,))
        wk = self.param("key_kernel", glorot, (x.shape[-1], att_units))
        bk = self.param("key_bias", zeros_init, (att_units,))
        wv = self.param("kernel", glorot, (x.shape[-1], self.dim_out))

        q = act_dict[self.query_act](x @ wq + bq).reshape(n, self.heads, dh)
        k = act_dict[self.key_act](x @ wk + bk).reshape(n, self.heads, dh)
        v = jnp.dot(x, wv, preferred_element_type=x.dtype)

        if self.split_value_heads and self.dim_out % self.heads == 0:
            scale = jnp.sqrt(jnp.asarray(dh, x.dtype))

            def score(q_i, k_j):
                return jnp.sum(q_i * k_j, axis=-1) / scale

            drop = self.att_dropout if train else 0.0
            vh = v.reshape(n, self.heads, self.dim_out // self.heads)
            packed = packed_attention(
                graph, q, score, values=vh, keys=k, dropout_rate=drop,
                dropout_rng=self.make_rng("dropout") if drop > 0
                else None)
            if packed is not None:
                out = packed.reshape(n, self.dim_out)
                if self.use_bias:
                    out = out + self.param("bias", zeros_init,
                                           (self.dim_out,))
                return graph.replace(node_feat=out)

        loop = jnp.arange(n, dtype=graph.senders.dtype)
        senders = jnp.concatenate([graph.senders, loop])
        receivers = jnp.concatenate([graph.receivers, loop])
        mask = jnp.concatenate([graph.edge_mask, graph.node_mask])

        score = jnp.sum(jnp.take(q, receivers, axis=0) *
                        jnp.take(k, senders, axis=0), axis=-1)  # [E, H]
        score = score / jnp.sqrt(jnp.asarray(dh, score.dtype))
        alpha = S.segment_softmax(
            score, receivers, n,
            mask=mask[:, None] & jnp.ones_like(score, bool))
        if self.att_dropout > 0:
            alpha = nn.Dropout(rate=self.att_dropout,
                               deterministic=not train)(alpha)

        if self.split_value_heads:
            assert self.dim_out % self.heads == 0
            vh = v.reshape(n, self.heads, self.dim_out // self.heads)
            msg = jnp.take(vh, senders, axis=0) * alpha[..., None]
            out = S.segment_sum(msg, receivers, n)
            out = out.reshape(n, self.dim_out)
        else:
            msg = jnp.take(v, senders, axis=0)[:, None, :] * alpha[..., None]
            out = S.segment_sum(msg, receivers, n)
            out = jnp.mean(out, axis=1)
        if self.use_bias:
            out = out + self.param("bias", zeros_init, (self.dim_out,))
        return graph.replace(node_feat=out)


class GINConv(nn.Module):
    """GIN: h = MLP((1 + eps) x + sum_neighbors x)
    (reference layer.py:165-174; TfgIDLayer.py:123-167).

    ``agg`` is an ablation switch (cfg.gnn.gin_agg) probing the
    reference's UNPINNED 2021 tf_geometric GIN internals (VERDICT r3
    task 8: ginconv/ba trains to 0.733 here vs the reference artifact
    0.639, and the reference's GIN also loses to its own GCN 0.695 —
    consistent with a normalized, degree-blind aggregation):
      'sum'        — correct GIN neighbor sum (default, shipped)
      'gcn'        — D^-1/2 (A+I) D^-1/2 renormalized aggregation
      'gcn_noself' — symmetric normalization without self-loops
      'mean'       — mean over neighbors
    All variants keep the (1+eps)x skip term and the MLP."""
    dim_out: int
    eps: float = 0.0
    train_eps: bool = False
    mlp_bn: bool = False
    agg: str = "sum"
    mlp_gain: float = 1.0

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        nb = (packed_spmm(graph, "plain", x)
              if self.agg == "sum" else None)
        if nb is None:
            s, r, w = (graph.senders, graph.receivers,
                       graph.edge_weight)
            if self.agg in ("gcn", "gcn_noself"):
                s, r, w = sp.gcn_norm(
                    s, r, w, graph.num_nodes,
                    node_mask=graph.node_mask,
                    add_self_loops=self.agg == "gcn")
            nb = sp.spmm(s, r, w, x, graph.num_nodes)
            if self.agg == "mean":
                deg = sp.degree(graph.receivers, graph.edge_weight,
                                graph.num_nodes)
                nb = nb / jnp.maximum(deg, 1.0)[:, None]
        if self.train_eps:
            eps = self.param("eps", zeros_init, ())
        else:
            eps = self.eps
        h = (1.0 + eps) * x + nb
        h = _gin_mlp(self, h, "mlp", self.dim_out, self.mlp_bn,
                     graph.node_mask, train, gain=self.mlp_gain)
        return graph.replace(node_feat=h)


def _gin_mlp(mod: nn.Module, h: jnp.ndarray, prefix: str, dim_out: int,
             with_bn: bool, node_mask, train: bool,
             gain: float = 1.0) -> jnp.ndarray:
    """2-layer GIN MLP: Dense->ReLU->Dense (reference layer.py:168-169;
    the Tfg variant appends BN+ReLU, main_zd.py:181-186).  Weight names
    contain 'kernel' so the Tfg L2 regularizer covers them (reference
    loss.py:65 matches tf Dense kernels).  The torch path's GIN MLP is
    built from nn.Linear, so init_weights re-inits it at gain sqrt(2)
    (the only conv-internal kernels that are nn.Linear)."""
    init = xavier_uniform(gain)
    w1 = mod.param(f"{prefix}_kernel1", init, (h.shape[-1], dim_out))
    b1 = mod.param(f"{prefix}_bias1", zeros_init, (dim_out,))
    w2 = mod.param(f"{prefix}_kernel2", init, (dim_out, dim_out))
    b2 = mod.param(f"{prefix}_bias2", zeros_init, (dim_out,))
    h = jax.nn.relu(jnp.dot(h, w1, preferred_element_type=h.dtype) + b1)
    h = jnp.dot(h, w2, preferred_element_type=h.dtype) + b2
    if with_bn:
        h = MaskedBatchNorm(dim_out, name=f"{prefix}_bn")(h, node_mask, train)
        h = jax.nn.relu(h)
    return h


class SplineConv(nn.Module):
    """Linear B-spline conv over 1-D edge pseudo-coordinates with
    kernel_size=2 — the configuration the reference instantiates
    (layer.py:177-186, pyg SplineConv(dim=1, kernel_size=2)):

      u = edge_feat[:, 0] in [0, 1]
      msg_e = ((1-u) W_0 + u W_1) x_j;  out_i = sum_e msg_e + W_root x_i
    """
    dim_out: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        e = graph.edge_feat
        assert e is not None, "splineconv needs edge pseudo-coordinates"
        u = jnp.clip(e[:, 0], 0.0, 1.0)
        w0 = self.param("kernel0", glorot, (x.shape[-1], self.dim_out))
        w1 = self.param("kernel1", glorot, (x.shape[-1], self.dim_out))
        w_root = self.param("root_kernel", glorot,
                            (x.shape[-1], self.dim_out))
        h0 = jnp.dot(x, w0, preferred_element_type=x.dtype)
        h1 = jnp.dot(x, w1, preferred_element_type=x.dtype)
        m0 = jnp.take(h0, graph.senders, axis=0) * (1 - u)[:, None]
        m1 = jnp.take(h1, graph.senders, axis=0) * u[:, None]
        msg = jnp.where(graph.edge_mask[:, None], m0 + m1, 0.0)
        out = S.segment_sum(msg, graph.receivers, graph.num_nodes)
        out = out + jnp.dot(x, w_root, preferred_element_type=x.dtype)
        if self.use_bias:
            out = out + self.param("bias", zeros_init, (self.dim_out,))
        return graph.replace(node_feat=out)


class GeneralConv(nn.Module):
    """GraphGym's configurable conv (contrib/layer/generalconv.py:12-114):

      msg = norm * (x W)[senders]   (norm = GCN sym-norm if normalize_adj)
      agg in {add, mean, max} over receivers
      self_msg in {none, add, concat}: out = msg | msg + x | msg + x W_self
    """
    dim_out: int
    use_bias: bool = False
    agg: str = "add"
    self_msg: str = "concat"
    normalize_adj: bool = False
    improved: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        w = self.param("kernel", glorot, (x.shape[-1], self.dim_out))
        h = jnp.dot(x, w, preferred_element_type=x.dtype)
        if self.self_msg == "concat":
            w_self = self.param("self_kernel", glorot,
                                (x.shape[-1], self.dim_out))
            h_self = jnp.dot(x, w_self, preferred_element_type=x.dtype)

        if self.normalize_adj:
            s, r, wgt = sp.gcn_norm(graph.senders, graph.receivers,
                                    graph.edge_weight, graph.num_nodes,
                                    improved=self.improved,
                                    node_mask=graph.node_mask)
            mask = jnp.concatenate([graph.edge_mask, graph.node_mask])
        else:
            s, r, wgt = graph.senders, graph.receivers, graph.edge_weight
            mask = graph.edge_mask
        reduce = {"add": "sum", "mean": "mean", "max": "max"}[self.agg]
        h_msg = sp.spmm(s, r, wgt, h, graph.num_nodes, reduce=reduce,
                        edge_mask=mask)
        if self.use_bias:
            h_msg = h_msg + self.param("bias", zeros_init, (self.dim_out,))
        if self.self_msg == "none":
            out = h_msg
        elif self.self_msg == "add":
            out = h_msg + h
        elif self.self_msg == "concat":
            out = h_msg + h_self
        else:
            raise ValueError(f"self_msg {self.self_msg} not defined")
        return graph.replace(node_feat=out)


class GeneralEdgeConv(nn.Module):
    """GeneralConv with edge features in the message
    (contrib/layer/generalconv.py:117-218):
      msg_e = Linear([x_j, e] or [x_i, x_j, e]);  agg over receivers;
      self_msg as in GeneralConv.
    With sample_rate < 1, a random subset of edges is used per call
    (GeneralSampleEdgeConv, reference layer.py:210-221).
    """
    dim_out: int
    use_bias: bool = False
    agg: str = "add"
    self_msg: str = "concat"
    normalize_adj: bool = False
    msg_direction: str = "single"
    sample_rate: float = 1.0

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        e = graph.edge_feat
        assert e is not None, "GeneralEdgeConv requires edge features"
        senders, receivers = graph.senders, graph.receivers
        edge_mask = graph.edge_mask
        if self.sample_rate < 1.0 and train:
            rng = self.make_rng("dropout")
            keep = (jax.random.uniform(rng, edge_mask.shape)
                    < self.sample_rate)
            edge_mask = edge_mask & keep

        x_j = jnp.take(x, senders, axis=0)
        if self.msg_direction == "both":
            x_i = jnp.take(x, receivers, axis=0)
            feat = jnp.concatenate([x_i, x_j, e], axis=-1)
        else:
            feat = jnp.concatenate([x_j, e], axis=-1)
        w_msg = self.param("msg_kernel", glorot,
                           (feat.shape[-1], self.dim_out))
        msg = jnp.dot(feat, w_msg, preferred_element_type=x.dtype)
        if self.normalize_adj:
            # sym-norm weighting of messages (reference
            # generalconv.py:203-209 scales msg by norm; computed over
            # the existing edge set — self-loops are not appended here
            # because edge features for them don't exist)
            deg = sp.degree(receivers,
                            edge_mask.astype(msg.dtype),
                            graph.num_nodes)
            dis = sp.inv_sqrt_degree(deg)
            norm = dis[receivers] * dis[senders]
            msg = msg * norm[:, None]
        msg = jnp.where(edge_mask[:, None], msg, 0.0)
        reduce = {"add": "sum", "mean": "mean", "max": "max"}[self.agg]
        h_msg = S.segment_sum(msg, receivers, graph.num_nodes) \
            if reduce == "sum" else (
                S.segment_mean(msg, receivers, graph.num_nodes,
                               mask=edge_mask) if reduce == "mean"
                else S.segment_max(msg, receivers, graph.num_nodes,
                                   mask=edge_mask))
        if self.use_bias:
            h_msg = h_msg + self.param("bias", zeros_init, (self.dim_out,))
        if self.self_msg == "none":
            out = h_msg
        elif self.self_msg == "add":
            out = x + h_msg if x.shape[-1] == h_msg.shape[-1] else h_msg
        elif self.self_msg == "concat":
            w_self = self.param("self_kernel", glorot,
                                (x.shape[-1], self.dim_out))
            out = jnp.dot(x, w_self,
                          preferred_element_type=x.dtype) + h_msg
        else:
            raise ValueError(f"self_msg {self.self_msg} not defined")
        return graph.replace(node_feat=out)
