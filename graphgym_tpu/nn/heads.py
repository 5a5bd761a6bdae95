"""Task heads and graph pooling (reference graphgym/models/head.py:19-130,
models/pooling.py:12-42).

Heads map a GraphBatch to ``(pred, label, mask)`` — the extra mask (absent
in the reference, which never pads) marks which prediction slots are real
so the loss/metrics ignore padding.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from graphgym_tpu.graphs.container import GraphBatch
from graphgym_tpu.nn.layers import MLP
from graphgym_tpu.ops import segment as S

HeadOut = Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]]


def global_pool(x, graph_ids, num_graphs, kind="add", node_mask=None,
                id_index=None, id_mask=None):
    """Global add/mean/max pooling; with ``id_index`` set, pools only the
    ego-net centers (reference pooling.py:12-33 'ego' branch).  Custom
    poolings resolve from register.pooling_dict."""
    from graphgym_tpu import register

    if kind in register.pooling_dict:
        return register.pooling_dict[kind](
            x, graph_ids, num_graphs, node_mask=node_mask,
            id_index=id_index, id_mask=id_mask)
    if id_index is not None:
        x = jnp.take(x, id_index, axis=0)
        graph_ids = jnp.take(graph_ids, id_index, axis=0)
        node_mask = id_mask
    if node_mask is not None:
        x = jnp.where(node_mask[:, None], x, 0.0)
    if kind == "add":
        return S.segment_sum(x, graph_ids, num_graphs)
    if kind == "mean":
        return S.segment_mean(x, graph_ids, num_graphs, mask=node_mask)
    if kind == "max":
        return S.segment_max(x, graph_ids, num_graphs, mask=node_mask)
    raise ValueError(f"Unknown pooling {kind}")


class GNNNodeHead(nn.Module):
    """Node prediction head (reference head.py:19-37): post-MP MLP then a
    gather of the supervised node slots."""
    dim_out: int
    layers_post_mp: int = 1
    dim_inner: Optional[int] = None
    act: str = "relu"
    gain: float = 1.0

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> HeadOut:
        graph = MLP(self.dim_out, num_layers=self.layers_post_mp,
                    dim_inner=self.dim_inner, use_bias=True,
                    act=self.act, gain=self.gain)(graph, train)
        idx = graph.node_label_index
        if idx is None:
            return graph.node_feat, graph.node_label, graph.node_mask
        pred = jnp.take(graph.node_feat, idx, axis=0)
        label = jnp.take(graph.node_label, idx, axis=0)
        return pred, label, graph.label_mask


class GNNEdgeHead(nn.Module):
    """Edge / link prediction head (reference head.py:40-90): decode node
    pair embeddings via dot / cosine / concat+MLP."""
    dim_out: int
    decoding: str = "dot"
    layers_post_mp: int = 1
    dim_inner: Optional[int] = None
    act: str = "relu"
    gain: float = 1.0

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> HeadOut:
        eli = graph.edge_label_index
        assert eli is not None, "edge head requires edge_label_index"
        if self.decoding == "concat":
            v1 = jnp.take(graph.node_feat, eli[0], axis=0)
            v2 = jnp.take(graph.node_feat, eli[1], axis=0)
            # pseudo-graph over edge pairs: the MLP's BatchNorm must
            # mask padded pair slots, not node slots
            pair_mask = graph.edge_label_mask
            if pair_mask is None:
                pair_mask = jnp.ones(eli.shape[1], bool)
            pair = graph.replace(
                node_feat=jnp.concatenate([v1, v2], -1),
                node_mask=pair_mask)
            pair = MLP(self.dim_out, num_layers=self.layers_post_mp,
                       dim_inner=self.dim_inner, use_bias=True,
                       act=self.act, gain=self.gain)(pair, train)
            pred = pair.node_feat
        else:
            graph = MLP(graph.node_feat.shape[-1],
                        num_layers=self.layers_post_mp,
                        dim_inner=self.dim_inner, use_bias=True,
                        act=self.act, gain=self.gain)(graph, train)
            v1 = jnp.take(graph.node_feat, eli[0], axis=0)
            v2 = jnp.take(graph.node_feat, eli[1], axis=0)
            if self.decoding == "dot":
                pred = jnp.sum(v1 * v2, axis=-1)
            elif self.decoding == "cosine_similarity":
                num = jnp.sum(v1 * v2, axis=-1)
                den = (jnp.linalg.norm(v1, axis=-1) *
                       jnp.linalg.norm(v2, axis=-1))
                pred = num / jnp.maximum(den, 1e-8)
            else:
                raise ValueError(
                    f"Unknown edge decoding {self.decoding}")
        return pred, graph.edge_label, graph.edge_label_mask


class GNNGraphHead(nn.Module):
    """Graph prediction head (reference head.py:93-119): global pooling
    (centers-only under the ego transform) then MLP."""
    dim_out: int
    pooling: str = "add"
    ego: bool = False
    layers_post_mp: int = 1
    dim_inner: Optional[int] = None
    act: str = "relu"
    gain: float = 1.0

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> HeadOut:
        emb = global_pool(
            graph.node_feat, graph.graph_ids, graph.num_graphs,
            kind=self.pooling, node_mask=graph.node_mask,
            id_index=graph.node_id_index if self.ego else None,
            id_mask=graph.id_mask if self.ego else None)
        # pseudo-graph over pooled embeddings: BatchNorm masks graph
        # slots (incl. the padding-graph slot), not node slots
        gmask = graph.graph_mask
        if gmask is None:
            gmask = jnp.ones(graph.num_graphs, bool)
        g = graph.replace(node_feat=emb, node_mask=gmask)
        g = MLP(self.dim_out, num_layers=self.layers_post_mp, gain=self.gain,
                dim_inner=self.dim_inner, use_bias=True,
                act=self.act)(g, train)
        return g.node_feat, graph.graph_label, graph.graph_mask
