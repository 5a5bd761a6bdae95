"""ID-GNN Full layers: identity-colored heterogeneous message passing.

Every layer carries two weight matrices: ``kernel`` applied to all nodes
and ``id_kernel`` additionally applied to the ego-net center rows listed
in ``graph.node_id_index`` — the identity-coloring trick of "Identity-
Aware Graph Neural Networks" (reference contrib/layer/idconv.py:62-67 and
TfgIDLayer.py:103-107).  The recombination is a single scatter-add
(ops.sparse.apply_id_weights) over MXU matmuls.

Covers both reference families:
  * torch path (idconv.py:16-448): GeneralIDConv, GCNIDConv, SAGEIDConv,
    GATIDConv, GINIDConv — registered as idconv/gcnidconv/sageidconv/
    gatidconv/ginidconv.
  * tfg path (TfgIDLayer.py:15-525): IDGCN (== GCNIDConv here), IDSAGE
    (3-kernel concat variant), IDGAT (dot-product attention), IDGIN.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from graphgym_tpu.graphs.container import GraphBatch
from graphgym_tpu.nn.act import act_dict
from graphgym_tpu.nn.layers import glorot, zeros_init, _gin_mlp
from graphgym_tpu.nn.norm import MaskedBatchNorm, l2_normalize
from graphgym_tpu.ops import segment as S
from graphgym_tpu.ops import sparse as sp


def _id_index(graph: GraphBatch):
    assert graph.node_id_index is not None, (
        "ID layers need graph.node_id_index (run the 'ego' transform; "
        "reference models/transform.py:38)")
    return graph.node_id_index, graph.id_mask


class GCNIDConv(nn.Module):
    """ID-GCN: id-colored projection then renormalized SpMM.

    h = x @ W; h[id] += x[id] @ W_id; h = D^-1/2(A+I)D^-1/2 h + b
    (reference idconv.py:104-189 GCNIDConvLayer == TfgIDLayer.py:478-525
    gcn_id).
    """
    dim_out: int
    use_bias: bool = True
    improved: bool = False
    spmm_impl: str = "xla"

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        idx, id_mask = _id_index(graph)
        w = self.param("kernel", glorot, (x.shape[-1], self.dim_out))
        w_id = self.param("id_kernel", glorot, (x.shape[-1], self.dim_out))
        h = sp.apply_id_weights(x, idx, w, w_id, id_mask)
        from graphgym_tpu.nn.layers import packed_spmm
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


class GeneralIDConv(nn.Module):
    """ID version of GeneralConv (reference idconv.py:16-101): id-colored
    projection, optional sym-norm, configurable aggregation."""
    dim_out: int
    use_bias: bool = False
    agg: str = "add"
    normalize_adj: bool = False
    improved: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        idx, id_mask = _id_index(graph)
        w = self.param("kernel", glorot, (x.shape[-1], self.dim_out))
        w_id = self.param("id_kernel", glorot, (x.shape[-1], self.dim_out))
        h = sp.apply_id_weights(x, idx, w, w_id, id_mask)
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
        h = sp.spmm(s, r, wgt, h, graph.num_nodes, reduce=reduce,
                    edge_mask=mask)
        if self.use_bias:
            h = h + self.param("bias", zeros_init, (self.dim_out,))
        return graph.replace(node_feat=h)


class SAGEIDConv(nn.Module):
    """torch-style ID-SAGE (reference idconv.py:192-263): mean-aggregate
    neighbors, concat with self, then dual-kernel id projection on the
    concatenation:

      a = [x || mean_nb(x)];  h = a @ W;  h[id] += a[id] @ W_id; + b
    """
    dim_out: int
    use_bias: bool = True
    concat_self: bool = True
    normalize: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        idx, id_mask = _id_index(graph)
        senders, receivers = graph.senders, graph.receivers
        edge_mask = graph.edge_mask
        if not self.concat_self:
            # add_remaining_self_loops (idconv.py:231-233)
            loop = jnp.arange(graph.num_nodes, dtype=senders.dtype)
            senders = jnp.concatenate([senders, loop])
            receivers = jnp.concatenate([receivers, loop])
            edge_mask = jnp.concatenate([edge_mask, graph.node_mask])
        nb = sp.spmm(senders, receivers, None, x, graph.num_nodes,
                     reduce="mean", edge_mask=edge_mask)
        a = jnp.concatenate([x, nb], axis=-1) if self.concat_self else nb
        w = self.param("kernel", glorot, (a.shape[-1], self.dim_out))
        w_id = self.param("id_kernel", glorot, (a.shape[-1], self.dim_out))
        h = sp.apply_id_weights(a, idx, w, w_id, id_mask)
        if self.use_bias:
            h = h + self.param("bias", zeros_init, (self.dim_out,))
        if self.normalize:
            h = l2_normalize(h, axis=-1)
        return graph.replace(node_feat=h)


class TfgIDSAGE(nn.Module):
    """tfg-style ID-SAGE (reference TfgIDLayer.py:15-120): three kernels —
    self, id, neighbor:

      h = x @ W_self;  h[id] += x[id] @ W_id
      out = [h || mean_nb(x) @ W_nb]  (or sum if concat=False); + b
    """
    dim_out: int
    use_bias: bool = True
    concat: bool = True
    normalize: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        idx, id_mask = _id_index(graph)
        d = self.dim_out // 2 if self.concat else self.dim_out
        w_self = self.param("self_kernel", glorot, (x.shape[-1], d))
        w_id = self.param("id_kernel", glorot, (x.shape[-1], d))
        w_nb = self.param("neighbor_kernel", glorot, (x.shape[-1], d))
        from graphgym_tpu.nn.layers import packed_spmm
        nb = packed_spmm(graph, "mean", x)
        if nb is None:
            nb = sp.spmm(graph.senders, graph.receivers, None, x,
                         graph.num_nodes, reduce="mean",
                         edge_mask=graph.edge_mask)
        h_nb = jnp.dot(nb, w_nb, preferred_element_type=x.dtype)
        h = sp.apply_id_weights(x, idx, w_self, w_id, id_mask)
        if self.concat:
            h = jnp.concatenate([h, h_nb], axis=-1)
        else:
            h = h + h_nb
        if self.use_bias:
            h = h + self.param("bias", zeros_init, (self.dim_out,))
        if self.normalize:
            h = l2_normalize(h, axis=-1)
        return graph.replace(node_feat=h)


class GATIDConv(nn.Module):
    """torch-style ID-GAT (reference idconv.py:266-347): additive
    attention over id-colored features:

      h = x @ W; h[id] += x[id] @ W_id  (per-head reshape)
      alpha = softmax_j leakyrelu(a . [h_i || h_j]);  out = sum alpha h_j
    """
    dim_out: int
    heads: int = 1
    use_bias: bool = True
    negative_slope: float = 0.2
    att_dropout: float = 0.0
    concat_heads: bool = True

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        n = graph.num_nodes
        idx, id_mask = _id_index(graph)
        assert self.dim_out % self.heads == 0
        per_head = self.dim_out // self.heads
        w = self.param("kernel", glorot, (x.shape[-1], self.dim_out))
        w_id = self.param("id_kernel", glorot, (x.shape[-1], self.dim_out))
        att = self.param("att", glorot, (1, self.heads, 2 * per_head))
        h = sp.apply_id_weights(x, idx, w, w_id, id_mask)
        h = h.reshape(n, self.heads, per_head)

        # additive score decomposed per endpoint (see layers.GATConv):
        # a . [h_i || h_j] = a_l . h_i + a_r . h_j
        s_dst = jnp.sum(h * att[:, :, :per_head], axis=-1)   # [N, H]
        s_src = jnp.sum(h * att[:, :, per_head:], axis=-1)

        def lrelu(a):
            return jax.nn.leaky_relu(a, negative_slope=self.negative_slope)

        from graphgym_tpu.nn.layers import packed_attention

        drop = self.att_dropout if train else 0.0
        packed = packed_attention(
            graph, h, None, node_scores=(s_dst, s_src),
            score_transform=lrelu, dropout_rate=drop,
            dropout_rng=self.make_rng("dropout") if drop > 0 else None)
        if packed is not None:
            out = packed.reshape(n, self.dim_out) \
                if self.concat_heads else jnp.mean(packed, axis=1)
            if self.use_bias:
                out = out + self.param("bias", zeros_init,
                                       (out.shape[-1],))
            return graph.replace(node_feat=out)

        loop = jnp.arange(n, dtype=graph.senders.dtype)
        senders = jnp.concatenate([graph.senders, loop])
        receivers = jnp.concatenate([graph.receivers, loop])
        mask = jnp.concatenate([graph.edge_mask, graph.node_mask])

        h_j = jnp.take(h, senders, axis=0)
        alpha = lrelu(jnp.take(s_dst, receivers, axis=0)
                      + jnp.take(s_src, senders, axis=0))
        alpha = S.segment_softmax(
            alpha, receivers, n,
            mask=mask[:, None] & jnp.ones_like(alpha, bool))
        if self.att_dropout > 0:
            alpha = nn.Dropout(rate=self.att_dropout,
                               deterministic=not train)(alpha)
        out = S.segment_sum(h_j * alpha[..., None], receivers, n)
        if self.concat_heads:
            out = out.reshape(n, self.dim_out)
        else:
            out = jnp.mean(out, axis=1)
        if self.use_bias:
            out = out + self.param("bias", zeros_init, (out.shape[-1],))
        return graph.replace(node_feat=out)


class TfgIDGAT(nn.Module):
    """tfg-style ID-GAT (reference TfgIDLayer.py:269-388 ``gat_id``):
    dot-product attention with the identity coloring applied to V only."""
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
        idx, id_mask = _id_index(graph)
        att_units = self.attention_units or self.dim_out
        assert att_units % self.heads == 0
        dh = att_units // self.heads

        wq = self.param("query_kernel", glorot, (x.shape[-1], att_units))
        bq = self.param("query_bias", zeros_init, (att_units,))
        wk = self.param("key_kernel", glorot, (x.shape[-1], att_units))
        bk = self.param("key_bias", zeros_init, (att_units,))
        wv = self.param("kernel", glorot, (x.shape[-1], self.dim_out))
        wv_id = self.param("id_kernel", glorot, (x.shape[-1], self.dim_out))

        q = act_dict[self.query_act](x @ wq + bq).reshape(n, self.heads, dh)
        k = act_dict[self.key_act](x @ wk + bk).reshape(n, self.heads, dh)
        v = sp.apply_id_weights(x, idx, wv, wv_id, id_mask)

        if self.split_value_heads and self.dim_out % self.heads == 0:
            from graphgym_tpu.nn.layers import packed_attention
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
                        jnp.take(k, senders, axis=0), axis=-1)
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
            out = S.segment_sum(
                jnp.take(vh, senders, axis=0) * alpha[..., None],
                receivers, n).reshape(n, self.dim_out)
        else:
            out = S.segment_sum(
                jnp.take(v, senders, axis=0)[:, None, :] * alpha[..., None],
                receivers, n)
            out = jnp.mean(out, axis=1)
        if self.use_bias:
            out = out + self.param("bias", zeros_init, (self.dim_out,))
        return graph.replace(node_feat=out)


class GINIDConv(nn.Module):
    """ID-GIN (reference idconv.py:350-382 == TfgIDLayer.py:123-167):

      h = (1 + eps) x + sum_nb x
      out = MLP(h);  out[id] += MLP_id(h[id])
    """
    dim_out: int
    eps: float = 0.0
    train_eps: bool = False
    mlp_bn: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        idx, id_mask = _id_index(graph)
        from graphgym_tpu.nn.layers import packed_spmm
        nb = packed_spmm(graph, "plain", x)
        if nb is None:
            nb = sp.spmm(graph.senders, graph.receivers,
                         graph.edge_weight, x, graph.num_nodes)
        eps = self.param("eps", zeros_init, ()) if self.train_eps else self.eps
        h = (1.0 + eps) * x + nb
        out = _gin_mlp(self, h, "mlp", self.dim_out, self.mlp_bn,
                       graph.node_mask, train)
        h_id = jnp.take(h, idx, axis=0)
        out_id = _gin_mlp(self, h_id, "mlp_id", self.dim_out, self.mlp_bn,
                          graph.id_mask if id_mask is not None else None,
                          train)
        out = sp.scatter_add_rows(out, idx, out_id, mask=id_mask)
        return graph.replace(node_feat=out)
