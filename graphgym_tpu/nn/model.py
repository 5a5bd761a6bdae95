"""Model composition: stages + full GNN + config-driven builder.

Re-designs the reference's model stack (graphgym/models/gnn.py:19-168,
model_builder.py) as explicit flax modules: every config read happens
once in ``build_model``; the modules themselves are pure.

GNN = encoder? -> pre_mp MLP stack -> message-passing stage -> task head,
with L2 feature normalization after the stage (gnn.py:79-80) and
stack / skipsum / skipconcat stage wiring (gnn.py:30-118).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from graphgym_tpu import register
from graphgym_tpu.graphs.container import GraphBatch
from graphgym_tpu.nn import att_layers as att
from graphgym_tpu.nn import id_layers as idl
from graphgym_tpu.nn import layers as L
from graphgym_tpu.nn.act import act_dict
from graphgym_tpu.nn.heads import (GNNEdgeHead, GNNGraphHead, GNNNodeHead,
                                   HeadOut)
from graphgym_tpu.nn.norm import l2_normalize


# --------------------------------------------------------------------------
# Layer factory
# --------------------------------------------------------------------------

def make_conv(name: str, dim_out: int, gnn_cfg, use_bias: bool) -> nn.Module:
    """Instantiate a conv layer by registry name with options drawn from
    the gnn config group (the explicit replacement for the reference's
    cfg-at-construction reads, layer.py:224-238 + idconv.py:444-448)."""
    heads = gnn_cfg.att_heads
    att_drop = getattr(gnn_cfg, "att_dropout", 0.0)
    # the torch path's nn.Linear-backed layers ('linear', 'mlp', GIN's
    # internal MLP) follow the reference init_weights gain; PyG-conv
    # internals keep gain 1 (see layers.py initializer note)
    gain = getattr(gnn_cfg, "linear_gain", 1.0)
    common = dict(dim_out=dim_out, use_bias=use_bias)
    table: Dict[str, Callable[[], nn.Module]] = {
        "linear": lambda: L.Linear(dim_out, use_bias=use_bias,
                                   gain=gain),
        "mlp": lambda: L.MLP(dim_out, use_bias=use_bias,
                             act=gnn_cfg.act, gain=gain),
        "gcnconv": lambda: L.GCNConv(**common),
        "sageconv": lambda: L.SAGEConv(**common, combine="sum"),
        "gatconv": lambda: L.GATConv(**common, heads=heads,
                                     att_dropout=att_drop),
        "ginconv": lambda: L.GINConv(
            dim_out, agg=getattr(gnn_cfg, "gin_agg", "sum"),
            mlp_gain=gain),
        "splineconv": lambda: L.SplineConv(**common),
        "generalconv": lambda: L.GeneralConv(
            **common, agg=gnn_cfg.agg, self_msg=gnn_cfg.self_msg,
            normalize_adj=gnn_cfg.normalize_adj),
        "generaledgeconv": lambda: L.GeneralEdgeConv(
            **common, agg=gnn_cfg.agg, self_msg=gnn_cfg.self_msg,
            normalize_adj=gnn_cfg.normalize_adj,
            msg_direction=gnn_cfg.msg_direction),
        "generalsampleedgeconv": lambda: L.GeneralEdgeConv(
            **common, agg=gnn_cfg.agg, self_msg=gnn_cfg.self_msg,
            normalize_adj=gnn_cfg.normalize_adj,
            msg_direction=gnn_cfg.msg_direction,
            sample_rate=gnn_cfg.keep_edge),
        # ---- ID-GNN Full (torch path names, idconv.py:444-448)
        "idconv": lambda: idl.GeneralIDConv(
            **common, agg=gnn_cfg.agg,
            normalize_adj=gnn_cfg.normalize_adj),
        "gcnidconv": lambda: idl.GCNIDConv(**common),
        "sageidconv": lambda: idl.SAGEIDConv(**common, concat_self=True),
        "gatidconv": lambda: idl.GATIDConv(**common, heads=heads,
                                           att_dropout=att_drop),
        "ginidconv": lambda: idl.GINIDConv(dim_out),
        # ---- contrib attention family (attconv.py:538-543 names)
        "gaddconv": lambda: att.GeneralAddAttConv(**common, heads=heads),
        "gmulconv": lambda: att.GeneralMulAttConv(**common, heads=heads),
        "generaledgeattconvv1": lambda: att.GeneralEdgeAttConv(
            **common, heads=heads, msg_direction=gnn_cfg.msg_direction,
            final_linear=gnn_cfg.att_final_linear,
            final_linear_bn=gnn_cfg.att_final_linear_bn, version=1),
        "generaledgeattconvv2": lambda: att.GeneralEdgeAttConv(
            **common, heads=heads, msg_direction=gnn_cfg.msg_direction,
            final_linear=gnn_cfg.att_final_linear,
            final_linear_bn=gnn_cfg.att_final_linear_bn, version=2),
        "generalconv_v2": lambda: att.GeneralConvV2(
            **common, agg=gnn_cfg.agg, self_msg=gnn_cfg.self_msg,
            normalize_adj=gnn_cfg.normalize_adj, flow=gnn_cfg.flow),
        "sageinitconv": lambda: att.SAGEInitConv(dim_out),
        "generalogbconv": lambda: att.GeneralOGBConv(
            **common, agg=gnn_cfg.agg, self_msg=gnn_cfg.self_msg,
            normalize_adj=gnn_cfg.normalize_adj),
        "exampleconv1": lambda: att.ExampleConv(dim_out),
        "exampleconv2": lambda: att.ExampleConv(dim_out, use_bias=False),
        # ---- tfg path layer types (main_zd.py:299-308, 'Tfg-' prefix)
        "Tfg-gcnconv": lambda: L.GCNConv(dim_out, use_bias=True),
        "Tfg-sageconv": lambda: L.SAGEConv(dim_out, use_bias=True,
                                           combine="concat"),
        "Tfg-gatconv": lambda: L.TfgGATConv(dim_out, heads=heads,
                                            att_dropout=att_drop),
        "Tfg-ginconv": lambda: L.GINConv(
            dim_out, mlp_bn=True,
            agg=getattr(gnn_cfg, "gin_agg", "sum")),
        "Tfg-idgcn": lambda: idl.GCNIDConv(dim_out, use_bias=True),
        "Tfg-idsage": lambda: idl.TfgIDSAGE(dim_out, use_bias=True),
        "Tfg-idgat": lambda: idl.TfgIDGAT(dim_out, heads=heads,
                                          att_dropout=att_drop),
        "Tfg-idgin": lambda: idl.GINIDConv(dim_out, mlp_bn=True),
    }
    if name in register.layer_dict:
        return register.layer_dict[name](dim_out=dim_out, use_bias=use_bias,
                                         gnn_cfg=gnn_cfg)
    if name not in table:
        raise ValueError(f"Unknown layer type: {name}")
    return table[name]()


@dataclasses.dataclass(frozen=True)
class GNNOptions:
    """Static snapshot of the cfg groups the model needs."""
    layer_type: str
    stage_type: str = "stack"
    layers_pre_mp: int = 0
    layers_mp: int = 2
    layers_post_mp: int = 1
    dim_inner: int = 16
    skip_every: int = 1
    batchnorm: bool = True
    act: str = "relu"
    dropout: float = 0.0
    agg: str = "add"
    normalize_adj: bool = False
    msg_direction: str = "single"
    self_msg: str = "concat"
    att_heads: int = 1
    att_dropout: float = 0.0
    gin_agg: str = "sum"
    att_final_linear: bool = False
    att_final_linear_bn: bool = False
    linear_gain: float = 1.0   # xavier gain for nn.Linear-equivalents
    flow: str = "source_to_target"
    l2norm: bool = True
    keep_edge: float = 0.5
    bn_eps: float = 1e-5
    bn_mom: float = 0.1
    task: str = "node"
    graph_pooling: str = "add"
    edge_decoding: str = "dot"
    ego: bool = False
    dim_out: int = 2
    tfg_head: bool = False
    remat: bool = False            # rematerialize MP layers (memory)
    node_encoder: str = ""         # '' = none; else encoder name
    node_encoder_bn: bool = True
    edge_encoder: str = ""
    edge_encoder_bn: bool = True
    encoder_dim: int = 128


def _gnn_layer(opts: GNNOptions, dim_out: int, has_act: bool = True):
    conv = make_conv(opts.layer_type, dim_out, opts,
                     use_bias=not opts.batchnorm)
    cls = L.GeneralLayer
    if opts.remat:
        # trade recompute for activation memory (jax.checkpoint over
        # each MP layer — useful for deep stacks / big ego unions)
        cls = nn.remat(L.GeneralLayer, static_argnums=(2,))
    return cls(conv, dim_out, has_act=has_act,
               has_bn=opts.batchnorm, dropout=opts.dropout,
               act=opts.act, bn_eps=opts.bn_eps,
               bn_mom=opts.bn_mom)


class GNNStackStage(nn.Module):
    """Plain stack of MP layers + optional L2 norm (gnn.py:65-81)."""
    opts: GNNOptions

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        for _ in range(self.opts.layers_mp):
            graph = _gnn_layer(self.opts, self.opts.dim_inner)(graph, train)
        if self.opts.l2norm:
            graph = graph.replace(
                node_feat=l2_normalize(graph.node_feat, axis=-1))
        return graph


class GNNSkipStage(nn.Module):
    """skipsum / skipconcat stage (gnn.py:30-109): blocks of
    ``skip_every`` layers with residual sum or concat, activation after
    the merge."""
    opts: GNNOptions

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        opts = self.opts
        assert opts.layers_mp % opts.skip_every == 0
        num_blocks = opts.layers_mp // opts.skip_every
        act = act_dict[opts.act]
        for b in range(num_blocks):
            x_in = graph.node_feat
            g = graph
            for i in range(opts.skip_every):
                has_act = i < opts.skip_every - 1
                g = _gnn_layer(opts, opts.dim_inner, has_act=has_act)(
                    g, train)
            if opts.stage_type == "skipsum":
                assert x_in.shape[-1] == g.node_feat.shape[-1], (
                    "Sum skip needs matching dims; set dim_inner == dim_in")
                merged = x_in + g.node_feat
            elif opts.stage_type == "skipconcat":
                merged = jnp.concatenate([x_in, g.node_feat], axis=-1)
            else:
                raise ValueError(opts.stage_type)
            graph = g.replace(node_feat=act(merged))
        if opts.l2norm:
            graph = graph.replace(
                node_feat=l2_normalize(graph.node_feat, axis=-1))
        return graph


stage_dict: Dict[str, Any] = {
    "stack": GNNStackStage,
    "skipsum": GNNSkipStage,
    "skipconcat": GNNSkipStage,
}


class TfgMLPHead(nn.Module):
    """The Tfg models' inference head: Dense(256, relu) -> Dense(C)
    (reference main_zd.py:37-39), followed by the node-label gather."""
    dim_out: int

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> HeadOut:
        x = graph.node_feat
        w1 = self.param("head_kernel1", L.glorot, (x.shape[-1], 256))
        b1 = self.param("head_bias1", L.zeros_init, (256,))
        w2 = self.param("head_kernel2", L.glorot, (256, self.dim_out))
        b2 = self.param("head_bias2", L.zeros_init, (self.dim_out,))
        h = jnp.maximum(x @ w1 + b1, 0.0)
        h = h @ w2 + b2
        idx = graph.node_label_index
        if idx is None:
            return h, graph.node_label, graph.node_mask
        pred = jnp.take(h, idx, axis=0)
        label = jnp.take(graph.node_label, idx, axis=0)
        return pred, label, graph.label_mask


class GNN(nn.Module):
    """Full model (gnn.py:123-168): pre_mp MLP stack -> MP stage -> head.

    Feature-augmentation concat (the reference's Preprocess module,
    feature_augment.py:314-333) happens in the data pipeline, so
    node_feat arrives fully assembled.
    """
    opts: GNNOptions

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> HeadOut:
        from graphgym_tpu.nn import encoders as enc
        from graphgym_tpu.nn.norm import MaskedBatchNorm

        opts = self.opts
        if opts.node_encoder:
            table = {**enc.node_encoder_dict,
                     **register.node_encoder_dict}
            graph = table[opts.node_encoder](opts.encoder_dim,
                                             name="node_encoder")(
                graph, train)
            if opts.node_encoder_bn:
                graph = graph.replace(node_feat=MaskedBatchNorm(
                    opts.encoder_dim, name="node_encoder_bn")(
                    graph.node_feat, graph.node_mask, train))
        if opts.edge_encoder:
            table = {**enc.edge_encoder_dict,
                     **register.edge_encoder_dict}
            graph = table[opts.edge_encoder](opts.encoder_dim,
                                             name="edge_encoder")(
                graph, train)
            if opts.edge_encoder_bn:
                graph = graph.replace(edge_feat=MaskedBatchNorm(
                    opts.encoder_dim, name="edge_encoder_bn")(
                    graph.edge_feat, graph.edge_mask, train))
        if opts.layers_pre_mp > 0:
            # GNNPreMP (reference gnn.py:23-25): EXACTLY layers_pre_mp
            # Linear+BN+dropout+act blocks (GeneralMultiLayer 'linear'
            # with final_act=True).  Round <=4 built layers_pre_mp + 1
            # Linears (an MLP with a bare trailing Linear plus a
            # bolted-on act) — one phantom dim_inner^2 layer in every
            # torch-path model with pre-MP, which also inflated the
            # link-sweep budget target (run_parity protocol v4).
            for i in range(opts.layers_pre_mp):
                graph = L.GeneralLayer(
                    L.Linear(opts.dim_inner,
                             use_bias=not opts.batchnorm,
                             gain=opts.linear_gain),
                    opts.dim_inner, has_act=True,
                    has_bn=opts.batchnorm, dropout=opts.dropout,
                    act=opts.act, bn_eps=opts.bn_eps,
                    bn_mom=opts.bn_mom,
                    name=f"pre_mp_{i}")(graph, train)
        if opts.layers_mp > 0:
            stage = stage_dict.get(opts.stage_type)
            if stage is None:
                stage = register.stage_dict[opts.stage_type]
            graph = stage(opts, name="mp")(graph, train)
        if opts.task in register.head_dict:
            head = register.head_dict[opts.task](opts, name="post_mp")
        elif opts.tfg_head:
            head = TfgMLPHead(opts.dim_out, name="post_mp")
        elif opts.task == "node":
            head = GNNNodeHead(opts.dim_out,
                               layers_post_mp=opts.layers_post_mp,
                               dim_inner=opts.dim_inner, act=opts.act,
                               gain=opts.linear_gain, name="post_mp")
        elif opts.task in ("edge", "link_pred"):
            head = GNNEdgeHead(opts.dim_out, decoding=opts.edge_decoding,
                               layers_post_mp=opts.layers_post_mp,
                               dim_inner=opts.dim_inner, act=opts.act,
                               gain=opts.linear_gain, name="post_mp")
        elif opts.task == "graph":
            head = GNNGraphHead(opts.dim_out, pooling=opts.graph_pooling,
                                ego=opts.ego,
                                layers_post_mp=opts.layers_post_mp,
                                dim_inner=opts.dim_inner, act=opts.act,
                                gain=opts.linear_gain, name="post_mp")
        else:
            raise ValueError(f"Unknown task {opts.task}")
        return head(graph, train)


def options_from_cfg(cfg) -> GNNOptions:
    """Snapshot cfg into the static GNNOptions dataclass.

    The Tfg model family (main_zd.py:28-257) is plain conv+relu stacks
    with a Dense(256)->Dense(C) head — no pre-MP, no BatchNorm wrapper,
    no post-stage L2 norm — regardless of those cfg flags, so the Tfg
    path overrides them.
    """
    tfg = cfg.gnn.layer_type.startswith("Tfg-")
    if tfg:
        return GNNOptions(
            layer_type=cfg.gnn.layer_type,
            stage_type="stack",
            layers_pre_mp=0,
            layers_mp=cfg.gnn.layers_mp,
            layers_post_mp=1,
            dim_inner=cfg.gnn.dim_inner,
            batchnorm=False,
            act=cfg.gnn.act,
            dropout=0.0,
            att_heads=cfg.gnn.att_heads,
            att_dropout=cfg.gnn.att_dropout,
            gin_agg=getattr(cfg.gnn, "gin_agg", "sum"),
            l2norm=False,
            bn_eps=cfg.bn.eps,
            bn_mom=cfg.bn.mom,
            task=cfg.dataset.task,
            graph_pooling=cfg.model.graph_pooling,
            edge_decoding=cfg.model.edge_decoding,
            ego=cfg.dataset.transform == "ego",
            dim_out=cfg.share.dim_out,
            tfg_head=True,
        )
    import math

    return GNNOptions(
        layer_type=cfg.gnn.layer_type,
        # reference init_weights (init.py:6-16) re-inits nn.Linear at
        # gain sqrt(2) on the torch path; conv internals stay gain 1
        linear_gain=math.sqrt(2),
        stage_type=cfg.gnn.stage_type,
        layers_pre_mp=cfg.gnn.layers_pre_mp,
        layers_mp=cfg.gnn.layers_mp,
        layers_post_mp=max(cfg.gnn.layers_post_mp, 1),
        dim_inner=cfg.gnn.dim_inner,
        skip_every=cfg.gnn.skip_every,
        batchnorm=cfg.gnn.batchnorm,
        act=cfg.gnn.act,
        dropout=cfg.gnn.dropout,
        agg=cfg.gnn.agg,
        normalize_adj=cfg.gnn.normalize_adj,
        msg_direction=cfg.gnn.msg_direction,
        self_msg=cfg.gnn.self_msg,
        att_heads=cfg.gnn.att_heads,
        att_dropout=cfg.gnn.att_dropout,
        gin_agg=getattr(cfg.gnn, "gin_agg", "sum"),
        att_final_linear=cfg.gnn.att_final_linear,
        att_final_linear_bn=cfg.gnn.att_final_linear_bn,
        flow=cfg.gnn.flow,
        l2norm=cfg.gnn.l2norm,
        keep_edge=cfg.gnn.keep_edge,
        remat=bool(cfg.tpu.get("remat", False)),
        bn_eps=cfg.bn.eps,
        bn_mom=cfg.bn.mom,
        task=cfg.dataset.task,
        graph_pooling=cfg.model.graph_pooling,
        edge_decoding=cfg.model.edge_decoding,
        ego=cfg.dataset.transform == "ego",
        dim_out=cfg.share.dim_out,
        tfg_head=False,
        node_encoder=(cfg.dataset.node_encoder_name
                      if cfg.dataset.node_encoder else ""),
        node_encoder_bn=cfg.dataset.node_encoder_bn,
        edge_encoder=(cfg.dataset.edge_encoder_name
                      if cfg.dataset.edge_encoder else ""),
        edge_encoder_bn=cfg.dataset.edge_encoder_bn,
        encoder_dim=cfg.dataset.encoder_dim,
    )


class TfgAPPNPNet(nn.Module):
    """The Tfg APPNP model (reference main_zd.py:245-257): one APPNP
    block [64, num_labels] with alpha=0.1, K=10, logits gathered at the
    supervised nodes — no MLP head."""
    opts: GNNOptions

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> HeadOut:
        graph = att.APPNP(dims=(64, self.opts.dim_out), alpha=0.1,
                          num_iterations=10)(graph, train)
        idx = graph.node_label_index
        if idx is None:
            return graph.node_feat, graph.node_label, graph.node_mask
        pred = jnp.take(graph.node_feat, idx, axis=0)
        label = jnp.take(graph.node_label, idx, axis=0)
        return pred, label, graph.label_mask


def build_model(cfg) -> nn.Module:
    """create_model equivalent (reference model_builder.py:15).

    Kernel init gain follows the backend being replicated: the torch
    path re-initializes every nn.Linear (pre/post-MP, heads, GIN MLP)
    with xavier_uniform at gain=sqrt(2) (reference init.py:6-16 via
    model.apply(init_weights)) while PyG conv internals keep gain-1
    glorot; the Tfg/Keras path keeps TF glorot everywhere.  The gain is
    carried in GNNOptions.linear_gain (per-module, no global state)."""
    if cfg.model.type in register.network_dict:
        return register.network_dict[cfg.model.type](options_from_cfg(cfg))
    if cfg.gnn.layer_type == "Tfg-appnp":
        return TfgAPPNPNet(options_from_cfg(cfg))
    return GNN(options_from_cfg(cfg))
