"""Tests for encoders, contrib attention layers, samplers, budget
matcher, grid generator, runner utilities."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphgym_tpu.config import get_cfg
from graphgym_tpu.data.hostgraph import HostGraph
from graphgym_tpu.data import samplers as smp
from graphgym_tpu.graphs.container import build_graph_batch
from graphgym_tpu.nn import att_layers as att
from graphgym_tpu.nn import encoders as enc
from graphgym_tpu.nn.model import GNN, GNNOptions, build_model


def make_batch(n=10, e=30, d=6, seed=0, int_feats=False,
               edge_feats=False):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    x = (rng.integers(0, 3, size=(n, 9)).astype(np.float32)
         if int_feats else rng.normal(size=(n, d)).astype(np.float32))
    return build_graph_batch(
        s, r, x,
        edge_feat=(rng.integers(0, 2, size=(e, 3)).astype(np.float32)
                   if edge_feats else None),
        node_label=rng.integers(0, 3, size=n),
        node_label_index=np.arange(n), pad_nodes_to=16, pad_edges_to=32)


def host_graph(n=20, seed=0):
    rng = np.random.default_rng(seed)
    e = n * 3
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = rng.integers(0, n, size=e).astype(np.int32)
    g = HostGraph(n, np.stack([s, r]))
    g["node_feature"] = rng.normal(size=(n, 4)).astype(np.float32)
    g["node_label"] = rng.integers(0, 3, size=n)
    g["node_label_index"] = np.arange(n)
    return g


class TestEncoders:
    def test_atom_encoder(self):
        b = make_batch(int_feats=True)
        m = enc.AtomEncoder(16)
        params = m.init(jax.random.PRNGKey(0), b, False)
        out = m.apply(params, b, False)
        assert out.node_feat.shape == (16, 16)

    def test_bond_encoder(self):
        b = make_batch(int_feats=True, edge_feats=True)
        m = enc.BondEncoder(16)
        params = m.init(jax.random.PRNGKey(0), b, False)
        out = m.apply(params, b, False)
        assert out.edge_feat.shape == (32, 16)

    def test_encoder_in_full_model(self):
        b = make_batch(int_feats=True)
        opts = GNNOptions(layer_type="gcnconv", layers_mp=1,
                          dim_inner=8, dim_out=3, node_encoder="Atom",
                          encoder_dim=16)
        model = GNN(opts)
        variables = model.init(jax.random.PRNGKey(0), b, False)
        pred, _, _ = model.apply(variables, b, False)
        assert np.all(np.isfinite(np.asarray(pred)))


class TestAttLayers:
    @pytest.mark.parametrize("layer", [
        att.GeneralAddAttConv(8, heads=2),
        att.GeneralMulAttConv(8, heads=2),
        att.GeneralConvV2(8, flow="target_to_source",
                          normalize_adj=True),
        att.SAGEInitConv(8),
        att.ExampleConv(8),
    ])
    def test_forward_finite(self, layer):
        b = make_batch()
        params = layer.init(jax.random.PRNGKey(0), b, False)
        out = layer.apply(params, b, False)
        o = np.asarray(out.node_feat)
        assert o.shape[-1] == 8 and np.all(np.isfinite(o))

    def test_edge_att_conv(self):
        b = make_batch(edge_feats=True)
        for v in (1, 2):
            layer = att.GeneralEdgeAttConv(8, heads=2, version=v,
                                           final_linear=True)
            params = layer.init(jax.random.PRNGKey(0), b, False)
            out = layer.apply(params, b, False)
            assert np.all(np.isfinite(np.asarray(out.node_feat)))

    def test_ogb_conv(self):
        b = make_batch(edge_feats=True)
        layer = att.GeneralOGBConv(8)
        params = layer.init(jax.random.PRNGKey(0), b, False)
        out = layer.apply(params, b, False)
        assert np.all(np.isfinite(np.asarray(out.node_feat)))

    def test_appnp_model(self):
        cfg = get_cfg()
        cfg.gnn.layer_type = "Tfg-appnp"
        cfg.share.dim_out = 3
        b = make_batch()
        model = build_model(cfg)
        params = model.init(jax.random.PRNGKey(0), b, False)
        pred, label, mask = model.apply(params, b, False)
        assert pred.shape[-1] == 3


class TestSamplers:
    def test_induced_subgraph(self):
        g = host_graph()
        sub = smp.induced_subgraph(g, np.array([0, 1, 2, 3, 4]))
        assert sub.num_nodes == 5
        assert sub.senders.max() < 5 if sub.num_edges else True
        # all edges in sub exist in g between kept nodes
        kept = {0, 1, 2, 3, 4}
        orig = set(zip(g.senders.tolist(), g.receivers.tolist()))
        sub_edges = set(zip(sub.senders.tolist(),
                            sub.receivers.tolist()))
        assert len(sub_edges) <= len(
            [1 for a, b in orig if a in kept and b in kept])

    def test_neighbor_sample_supervises_seeds(self):
        g = host_graph(n=30)
        rng = np.random.default_rng(0)
        sub = smp.neighbor_sample(g, np.array([1, 2, 3]), [5, 5], rng)
        assert len(sub["node_label_index"]) <= 3
        assert sub.num_nodes <= 30

    @pytest.mark.parametrize("sampler", [
        "saint_node", "saint_edge", "saint_rw", "random_node",
        "cluster"])
    def test_make_sampled(self, sampler):
        g = host_graph(n=40)
        cfg = get_cfg()
        cfg.train.sampler = sampler
        cfg.train.iter_per_epoch = 3
        cfg.train.node_per_graph = 4
        out = smp.make_sampled_graphs(g, cfg,
                                      np.random.default_rng(0))
        assert len(out) >= 1
        for sub in out:
            assert sub.num_nodes >= 1

    def test_cluster_parts_cover_all_nodes(self):
        g = host_graph(n=50)
        parts = smp.cluster_parts(g, 4, np.random.default_rng(0))
        total = sum(p.num_nodes for p in parts)
        assert total == 50

    @pytest.mark.parametrize("sampler", ["neighbor", "saint_node",
                                         "cluster"])
    def test_sampler_loader_trains_end_to_end(self, sampler):
        """Regression: SamplerLoader must work through create_loader +
        a real training epoch (was crashing on self.cfg ordering)."""
        import jax

        from graphgym_tpu.data.loaders import (create_dataset,
                                               create_loader)
        from graphgym_tpu.nn.model import build_model
        from graphgym_tpu.train.logger import Logger
        from graphgym_tpu.train.loop import Trainer

        cfg = get_cfg()
        cfg.merge_from_dict({
            "dataset": {"format": "nx", "name": "ws", "task": "node",
                        "transductive": True, "split": [0.8, 0.2],
                        "augment_label": "node_clustering_coefficient",
                        "augment_label_dims": 4},
            "gnn": {"layers_mp": 1, "dim_inner": 8,
                    "layer_type": "gcnconv"},
            "train": {"sampler": sampler, "iter_per_epoch": 2,
                      "batch_size": 2, "node_per_graph": 8,
                      "neighbor_sizes": [3, 3]},
            "optim": {"scheduler": "none"}})
        np.random.seed(0)
        splits = create_dataset(cfg)
        loaders = create_loader([p[:1] for p in splits], cfg)
        tr = Trainer(build_model(cfg), loaders, cfg,
                     rng=jax.random.PRNGKey(0))
        lg = Logger("t")
        tr.train_epoch(lg, 0)
        assert lg._size_current > 0
        assert np.isfinite(lg._loss)


class TestBudget:
    def test_match_computation(self):
        from graphgym_tpu.exp.budget import match_computation, \
            params_count

        cfg = get_cfg()
        cfg.gnn.layer_type = "gcnconv"
        cfg.gnn.dim_inner = 8
        cfg.share.dim_in = 6
        cfg.share.dim_out = 3
        small = params_count(cfg)
        cfg2 = get_cfg()
        cfg2.gnn.layer_type = "gcnconv"
        cfg2.gnn.dim_inner = 64
        cfg2.share.dim_in = 6
        cfg2.share.dim_out = 3
        target = params_count(cfg2)
        achieved = match_computation(cfg, target)
        assert abs(achieved - target) / target < 0.2
        assert cfg.gnn.dim_inner > 8


class TestGrid:
    def test_gen_grid(self, tmp_path):
        from graphgym_tpu.exp.grid import gen_grid, load_search_file

        base = tmp_path / "base.yaml"
        base.write_text("gnn:\n  dim_inner: 16\n")
        grid = tmp_path / "grid.txt"
        grid.write_text(
            "gnn.layers_mp l_mp [2,4]\n"
            "gnn.stage_type stage ['stack','skipsum']\n")
        out = gen_grid(str(base), str(grid), str(tmp_path / "cfgs"))
        assert len(out) == 4
        names = {os.path.basename(p) for p in out}
        assert "base-l_mp=2-stage=stack.yaml" in names
        import yaml
        d = yaml.safe_load(open(out[0]))
        assert d["gnn"]["dim_inner"] == 16
        assert d["gnn"]["layers_mp"] in (2, 4)

    def test_grid_chunks_unioned(self, tmp_path):
        from graphgym_tpu.exp.grid import gen_grid

        base = tmp_path / "base.yaml"
        base.write_text("{}\n")
        grid = tmp_path / "grid.txt"
        grid.write_text("gnn.layers_mp l [1,2]\n\n"
                        "optim.base_lr lr [0.1]\n")
        out = gen_grid(str(base), str(grid), str(tmp_path / "cfgs"))
        assert len(out) == 3  # 2 from chunk 1 + 1 from chunk 2
