"""Contrib attention layer family + GeneralConv v2 + SAGE-init conv.

Re-implements the reference's contrib layer zoo:
  * contrib/layer/attconv.py:14-543 — additive attention
    (GeneralAddAttConv), multiplicative/dot attention
    (GeneralMulAttConv), and the edge-feature attention convs v1/v2
    (message from [x_j (, x_i), e] with attention over a learned
    per-edge score, optional final linear/BN).
  * contrib/layer/generalconv_v2.py:12-242 — GeneralConv with
    message-flow direction and directed-graph normalization.
  * contrib/layer/sageinitconv.py:12-115 — SAGE with glorot init and
    concat-self update.

Registered under the reference names in nn.model.make_conv.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from graphgym_tpu.graphs.container import GraphBatch
from graphgym_tpu.nn.layers import glorot, zeros_init
from graphgym_tpu.nn.norm import MaskedBatchNorm
from graphgym_tpu.ops import segment as S
from graphgym_tpu.ops import sparse as sp


def _with_self_loops(graph: GraphBatch):
    n = graph.num_nodes
    loop = jnp.arange(n, dtype=graph.senders.dtype)
    senders = jnp.concatenate([graph.senders, loop])
    receivers = jnp.concatenate([graph.receivers, loop])
    mask = jnp.concatenate([graph.edge_mask, graph.node_mask])
    return senders, receivers, mask


class GeneralAddAttConv(nn.Module):
    """Additive (GAT-style) attention on projected features (reference
    attconv.py:14-112): per-edge multi-head
    alpha = softmax(leakyrelu(a . [h_i || h_j])), message = alpha * h_j."""
    dim_out: int
    heads: int = 1
    use_bias: bool = False
    negative_slope: float = 0.2
    att_dropout: float = 0.0

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        n = graph.num_nodes
        assert self.dim_out % self.heads == 0
        ph = self.dim_out // self.heads
        w = self.param("kernel", glorot, (x.shape[-1], self.dim_out))
        att = self.param("att", glorot, (1, self.heads, 2 * ph))
        h = (x @ w).reshape(n, self.heads, ph)
        # decomposed additive score (a . [h_i||h_j] = a_l.h_i + a_r.h_j):
        # per-node [N, H] halves, scalar gathers per edge
        s_dst = jnp.sum(h * att[:, :, :ph], axis=-1)
        s_src = jnp.sum(h * att[:, :, ph:], axis=-1)
        senders, receivers, mask = _with_self_loops(graph)
        h_j = jnp.take(h, senders, axis=0)
        alpha = jax.nn.leaky_relu(
            jnp.take(s_dst, receivers, axis=0)
            + jnp.take(s_src, senders, axis=0), self.negative_slope)
        alpha = S.segment_softmax(alpha, receivers, n,
                                  mask=mask[:, None]
                                  & jnp.ones_like(alpha, bool))
        if self.att_dropout > 0:
            alpha = nn.Dropout(self.att_dropout,
                               deterministic=not train)(alpha)
        out = S.segment_sum(h_j * alpha[..., None], receivers, n)
        out = out.reshape(n, self.dim_out)
        if self.use_bias:
            out = out + self.param("bias", zeros_init, (self.dim_out,))
        return graph.replace(node_feat=out)


class GeneralMulAttConv(nn.Module):
    """Dot-product attention (reference attconv.py:115-214):
    alpha = softmax((h_i . h_j + bias) / sqrt(d))."""
    dim_out: int
    heads: int = 1
    use_bias: bool = False
    att_dropout: float = 0.0

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        n = graph.num_nodes
        assert self.dim_out % self.heads == 0
        ph = self.dim_out // self.heads
        w = self.param("kernel", glorot, (x.shape[-1], self.dim_out))
        score_bias = self.param("att_bias", zeros_init,
                                (1, self.heads))
        h = (x @ w).reshape(n, self.heads, ph)
        senders, receivers, mask = _with_self_loops(graph)
        h_i = jnp.take(h, receivers, axis=0)
        h_j = jnp.take(h, senders, axis=0)
        alpha = (jnp.sum(h_i * h_j, -1) + score_bias) / jnp.sqrt(
            jnp.asarray(ph, x.dtype))
        alpha = S.segment_softmax(alpha, receivers, n,
                                  mask=mask[:, None]
                                  & jnp.ones_like(alpha, bool))
        if self.att_dropout > 0:
            alpha = nn.Dropout(self.att_dropout,
                               deterministic=not train)(alpha)
        out = S.segment_sum(h_j * alpha[..., None], receivers, n)
        out = out.reshape(n, self.dim_out)
        if self.use_bias:
            out = out + self.param("bias", zeros_init, (self.dim_out,))
        return graph.replace(node_feat=out)


class GeneralEdgeAttConv(nn.Module):
    """Edge-feature attention conv (reference attconv.py:243-375 v1 and
    :378+ v2): message = Linear([x_j (, x_i), e]); attention score from
    a second projection of the same concat; optional final linear (+BN)
    after head concat (cfg.gnn.att_final_linear[_bn])."""
    dim_out: int
    heads: int = 1
    use_bias: bool = False
    msg_direction: str = "single"
    att_dropout: float = 0.0
    final_linear: bool = False
    final_linear_bn: bool = False
    version: int = 1

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        e = graph.edge_feat
        assert e is not None, "edge attention conv needs edge features"
        n = graph.num_nodes
        assert self.dim_out % self.heads == 0
        ph = self.dim_out // self.heads
        senders, receivers = graph.senders, graph.receivers
        mask = graph.edge_mask

        x_j = jnp.take(x, senders, axis=0)
        if self.msg_direction == "both":
            x_i = jnp.take(x, receivers, axis=0)
            feat = jnp.concatenate([x_i, x_j, e], -1)
        else:
            feat = jnp.concatenate([x_j, e], -1)

        w_msg = self.param("msg_kernel", glorot,
                           (feat.shape[-1], self.dim_out))
        msg = (feat @ w_msg).reshape(-1, self.heads, ph)
        if self.version == 1:
            # v1: attention from the message itself (attconv.py:345-358)
            w_att = self.param("att_kernel", glorot,
                               (1, self.heads, ph))
            alpha = jnp.sum(msg * w_att, -1)
        else:
            # v2: separate key projection of the raw concat
            w_key = self.param("key_kernel", glorot,
                               (feat.shape[-1], self.heads))
            alpha = feat @ w_key
        alpha = jax.nn.leaky_relu(alpha, 0.2)
        alpha = S.segment_softmax(alpha, receivers, n,
                                  mask=mask[:, None]
                                  & jnp.ones_like(alpha, bool))
        if self.att_dropout > 0:
            alpha = nn.Dropout(self.att_dropout,
                               deterministic=not train)(alpha)
        out = S.segment_sum(msg * alpha[..., None], receivers, n)
        out = out.reshape(n, self.dim_out)
        if self.final_linear:
            wf = self.param("final_kernel", glorot,
                            (self.dim_out, self.dim_out))
            out = out @ wf
        if self.final_linear_bn:
            out = MaskedBatchNorm(self.dim_out, name="final_bn")(
                out, graph.node_mask, train)
        if self.use_bias:
            out = out + self.param("bias", zeros_init, (self.dim_out,))
        return graph.replace(node_feat=out)


class GeneralConvV2(nn.Module):
    """GeneralConv with flow direction + directed norm (reference
    generalconv_v2.py:12-242): flow='target_to_source' reverses message
    direction; norm uses in-degree of the aggregation side only
    (directed D^-1 A rather than symmetric)."""
    dim_out: int
    use_bias: bool = False
    agg: str = "add"
    self_msg: str = "concat"
    normalize_adj: bool = False
    flow: str = "source_to_target"

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        w = self.param("kernel", glorot, (x.shape[-1], self.dim_out))
        h = jnp.dot(x, w, preferred_element_type=x.dtype)
        if self.self_msg == "concat":
            w_self = self.param("self_kernel", glorot,
                                (x.shape[-1], self.dim_out))
            h_self = x @ w_self
        senders, receivers = graph.senders, graph.receivers
        if self.flow == "target_to_source":
            senders, receivers = receivers, senders
        wgt = graph.edge_weight
        if self.normalize_adj:
            deg = sp.degree(receivers, wgt, graph.num_nodes)
            inv = jnp.where(deg > 0, 1.0 / jnp.maximum(deg, 1e-12), 0.0)
            wgt = wgt * inv[receivers]
        reduce = {"add": "sum", "mean": "mean", "max": "max"}[self.agg]
        h_msg = sp.spmm(senders, receivers, wgt, h, graph.num_nodes,
                        reduce=reduce, edge_mask=graph.edge_mask)
        if self.use_bias:
            h_msg = h_msg + self.param("bias", zeros_init,
                                       (self.dim_out,))
        if self.self_msg == "none":
            out = h_msg
        elif self.self_msg == "add":
            out = h_msg + h
        else:
            out = h_msg + h_self
        return graph.replace(node_feat=out)


class SAGEInitConv(nn.Module):
    """SAGE with glorot init + concat-self update (reference
    sageinitconv.py:12-115): h = [x || mean_nb(x)] @ W + b, optional L2
    normalize."""
    dim_out: int
    use_bias: bool = True
    normalize: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        nb = sp.spmm(graph.senders, graph.receivers, None, x,
                     graph.num_nodes, reduce="mean",
                     edge_mask=graph.edge_mask)
        a = jnp.concatenate([x, nb], -1)
        w = self.param("kernel", glorot, (a.shape[-1], self.dim_out))
        h = a @ w
        if self.use_bias:
            h = h + self.param("bias", zeros_init, (self.dim_out,))
        if self.normalize:
            from graphgym_tpu.nn.norm import l2_normalize
            h = l2_normalize(h, axis=-1)
        return graph.replace(node_feat=h)


class GeneralOGBConv(nn.Module):
    """OGB bond-encoder conv (reference contrib/layer/
    generalconv_ogb.py:38-127): embed integer bond features per edge,
    message = norm * (x_j W + e_emb), aggregation + self message."""
    dim_out: int
    use_bias: bool = False
    agg: str = "add"
    self_msg: str = "concat"
    normalize_adj: bool = False

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        from graphgym_tpu.nn.encoders import BOND_FEATURE_DIMS
        x = graph.node_feat
        e = graph.edge_feat
        assert e is not None, "generalogbconv needs integer edge features"
        w = self.param("kernel", glorot, (x.shape[-1], self.dim_out))
        h = x @ w
        emb = jnp.zeros((e.shape[0], self.dim_out))
        for i, nvals in enumerate(BOND_FEATURE_DIMS):
            if i >= e.shape[1]:
                break
            table = self.param(f"bond_emb{i}", glorot,
                               (nvals, self.dim_out))
            emb = emb + jnp.take(table, e[:, i].astype(jnp.int32),
                                 axis=0)
        if self.self_msg == "concat":
            w_self = self.param("self_kernel", glorot,
                                (x.shape[-1], self.dim_out))
            h_self = x @ w_self
        senders, receivers = graph.senders, graph.receivers
        wgt = graph.edge_weight
        if self.normalize_adj:
            s2, r2, wgt2 = sp.gcn_norm(senders, receivers, wgt,
                                       graph.num_nodes,
                                       node_mask=graph.node_mask)
            # self-loop messages have no bond features; restrict to the
            # original edges for the embedded term
            wgt = wgt2[:senders.shape[0]]
        msg = (jnp.take(h, senders, axis=0) + emb) * wgt[:, None]
        if self.agg == "add":
            h_msg = S.segment_sum(msg, receivers, graph.num_nodes)
        elif self.agg == "mean":
            h_msg = S.segment_mean(msg, receivers, graph.num_nodes,
                                   mask=graph.edge_mask)
        else:
            h_msg = S.segment_max(msg, receivers, graph.num_nodes,
                                  mask=graph.edge_mask)
        if self.use_bias:
            h_msg = h_msg + self.param("bias", zeros_init,
                                       (self.dim_out,))
        if self.self_msg == "none":
            out = h_msg
        elif self.self_msg == "add":
            out = h_msg + h
        else:
            out = h_msg + h_self
        return graph.replace(node_feat=out)


class ExampleConv(nn.Module):
    """Contrib extension example (reference contrib/layer/
    example.py:16-122): plain linear + sum aggregation + self add —
    kept as the template users copy to add layers."""
    dim_out: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        w = self.param("kernel", glorot, (x.shape[-1], self.dim_out))
        h = x @ w
        agg = sp.spmm(graph.senders, graph.receivers, graph.edge_weight,
                      h, graph.num_nodes)
        out = h + agg
        if self.use_bias:
            out = out + self.param("bias", zeros_init, (self.dim_out,))
        return graph.replace(node_feat=out)


class APPNP(nn.Module):
    """APPNP propagation (reference Tfg zoo, main_zd.py:245-257 via
    tfg.layers.APPNP): h0 = MLP(x); h_{t+1} = (1-alpha) Anorm h_t +
    alpha h0, K iterations."""
    dims: tuple
    alpha: float = 0.1
    num_iterations: int = 10

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        h = x
        for i, d in enumerate(self.dims):
            w = self.param(f"kernel{i}", glorot, (h.shape[-1], d))
            b = self.param(f"bias{i}", zeros_init, (d,))
            h = h @ w + b
            if i < len(self.dims) - 1:
                h = jax.nn.relu(h)
        s, r, wgt = sp.gcn_norm(graph.senders, graph.receivers,
                                graph.edge_weight, graph.num_nodes,
                                node_mask=graph.node_mask)
        h0 = h

        def body(h_t, _):
            nxt = (1 - self.alpha) * sp.spmm(s, r, wgt, h_t,
                                             graph.num_nodes) \
                + self.alpha * h0
            return nxt, None

        h, _ = jax.lax.scan(body, h, None, length=self.num_iterations)
        return graph.replace(node_feat=h)
