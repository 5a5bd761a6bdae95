"""Data pipeline tests: structural features vs networkx, binning,
ego/edge transforms, splits, batching (SURVEY.md §4 (c))."""

import numpy as np
import pytest

from graphgym_tpu.config import get_cfg
from graphgym_tpu.data import structure as st
from graphgym_tpu.data.augment import (FeatureAugment, get_bin_edges,
                                       one_hot, position_encoding)
from graphgym_tpu.data.hostgraph import HostGraph, from_networkx
from graphgym_tpu.data.loaders import (GraphLoader, create_dataset,
                                       create_loader, load_nx,
                                       split_dataset)
from graphgym_tpu.data.transforms import edge_nets, ego_nets


def ring_graph(n=8):
    s = np.arange(n, dtype=np.int32)
    r = (s + 1) % n
    ei = np.stack([np.concatenate([s, r]), np.concatenate([r, s])])
    g = HostGraph(n, ei.astype(np.int32))
    g["node_feature"] = np.ones((n, 1), np.float32)
    g["node_label"] = np.arange(n) % 3
    return g


class TestStructure:
    def test_vs_networkx_on_reference_corpus(self):
        import networkx as nx
        graphs = load_nx("ws", "./datasets")
        hg = graphs[0]
        # rebuild nx graph from edges
        G = nx.Graph()
        G.add_nodes_from(range(hg.num_nodes))
        G.add_edges_from(zip(hg.senders.tolist(), hg.receivers.tolist()))
        np.testing.assert_allclose(
            st.clustering_coefficient(hg),
            [nx.clustering(G, i) for i in range(hg.num_nodes)],
            atol=1e-12)
        np.testing.assert_allclose(
            st.pagerank(hg),
            [nx.pagerank(G)[i] for i in range(hg.num_nodes)], atol=1e-8)
        deg = st.degrees(hg)
        np.testing.assert_array_equal(deg, [G.degree(i)
                                            for i in range(hg.num_nodes)])

    def test_bfs_distances_ring(self):
        g = ring_graph(8)
        dist = st.bfs_all_pairs(g)
        assert dist[0, 4] == 4 and dist[0, 1] == 1 and dist[0, 7] == 1
        assert dist[0, 0] == 0


class TestBinning:
    def test_balanced_binning(self):
        vals = np.concatenate([np.zeros(50), np.ones(25),
                               np.full(25, 2.0)])
        edges = get_bin_edges(vals, 4, "balanced")
        binned = np.digitize(vals, edges) - 1
        assert binned.min() >= 0
        assert len(np.unique(binned)) >= 2

    def test_one_hot(self):
        oh = one_hot(np.array([0, 2, 1]), 3)
        np.testing.assert_array_equal(oh, np.eye(3)[[0, 2, 1]])

    def test_position_encoding_shape(self):
        pe = position_encoding(np.arange(5), 8, scale=1.0)
        assert pe.shape == (5, 8)
        np.testing.assert_allclose(pe[0, :4], 1.0)   # cos(0)
        np.testing.assert_allclose(pe[0, 4:], 0.0, atol=1e-7)  # sin(0)


class TestEgoNets:
    def test_ego_union_structure(self):
        """Centers keep their ids; union has sum of ego sizes nodes;
        every center marked in node_id_index (reference
        transform.py:23-38)."""
        g = ring_graph(8)
        out = ego_nets(g, radius=2)
        # ring radius-2 ego = 5 nodes each; union = 8 + 8*4 = 40
        assert out.num_nodes == 8 + 8 * 4
        np.testing.assert_array_equal(out["node_id_index"], np.arange(8))
        # features/labels copied to every ego member
        assert out["node_feature"].shape == (40, 1)
        assert len(out["node_label"]) == 40
        # each ego is a path of 5 nodes -> 4 undirected edges = 8 directed
        assert out.num_edges == 8 * 8
        # center degree inside its ego should be 2 (ring)
        deg = np.zeros(out.num_nodes, int)
        np.add.at(deg, out.senders, 1)
        np.testing.assert_array_equal(deg[:8], 2)

    def test_ego_radius_gt4_full_graph_copies(self):
        g = ring_graph(6)
        out = ego_nets(g, radius=5)
        assert out.num_nodes == 36
        assert out.num_edges == 6 * g.num_edges


class TestEdgeNets:
    def test_edge_nets_relabeling(self):
        g = ring_graph(4)
        g["edge_label_index"] = np.array([[0, 1], [2, 3]], np.int32)
        g["edge_label"] = np.array([1, 0])
        out = edge_nets(g)
        assert out.num_nodes == 16
        np.testing.assert_array_equal(out["node_id_index"],
                                      [0, 5, 10, 15])
        # supervision: node_label_index = eli[1] + eli[0]*n
        np.testing.assert_array_equal(out["node_label_index"],
                                      [0 * 4 + 2, 1 * 4 + 3])
        lab = out["node_label"]
        assert lab[2] == 1 and lab[7] == 0


class TestSplits:
    def test_transductive_node_split(self):
        cfg = get_cfg()
        cfg.dataset.split = [0.8, 0.2]
        g = ring_graph(10)
        rng = np.random.default_rng(0)
        splits = split_dataset([g], cfg, rng)
        assert len(splits) == 2
        tr = splits[0][0]["node_label_index"]
        va = splits[1][0]["node_label_index"]
        assert len(tr) == 8 and len(va) == 2
        assert set(tr) | set(va) == set(range(10))
        assert not set(tr) & set(va)

    def test_inductive_split(self):
        cfg = get_cfg()
        cfg.dataset.transductive = False
        cfg.dataset.split = [0.8, 0.2]
        graphs = [ring_graph(6) for _ in range(10)]
        splits = split_dataset(graphs, cfg, np.random.default_rng(0))
        assert len(splits[0]) == 8 and len(splits[1]) == 2

    def test_link_pred_split(self):
        cfg = get_cfg()
        cfg.dataset.task = "link_pred"
        cfg.dataset.split = [0.8, 0.2]
        g = ring_graph(20)
        splits = split_dataset([g], cfg, np.random.default_rng(0))
        tr, va = splits[0][0], splits[1][0]
        # message edges in both splits are the train positives (dir both)
        assert tr.num_edges == va.num_edges
        assert tr.num_edges == 2 * 16
        el = tr["edge_label"]
        assert set(np.unique(el)) == {0, 1}

    def test_link_pred_disjoint_split(self):
        """edge_train_mode=disjoint (reference config.py:150-155):
        train messages and supervision positives are disjoint edge sets;
        val messages stay the full train-edge set."""
        cfg = get_cfg()
        cfg.dataset.task = "link_pred"
        cfg.dataset.split = [0.8, 0.2]
        cfg.dataset.edge_train_mode = "disjoint"
        cfg.dataset.edge_message_ratio = 0.75
        g = ring_graph(20)
        splits = split_dataset([g], cfg, np.random.default_rng(0))
        tr, va = splits[0][0], splits[1][0]
        assert va.num_edges == 2 * 16          # all train pairs
        assert tr.num_edges == 2 * 12          # 0.75 of them
        eli, el = tr["edge_label_index"], tr["edge_label"]
        pos = eli[:, el == 1]
        msg = set(zip(tr.senders.tolist(), tr.receivers.tolist()))
        sup = set(zip(pos[0].tolist(), pos[1].tolist()))
        assert not msg & sup, "supervision edges must not pass messages"
        assert len(sup) == 16 - 12

    def test_link_pred_resample_disjoint(self):
        """resample_disjoint re-splits message/supervision per epoch with
        static shapes (reference config.py:159-160)."""
        cfg = get_cfg()
        cfg.dataset.task = "link_pred"
        cfg.dataset.split = [0.8, 0.2]
        cfg.dataset.edge_train_mode = "disjoint"
        cfg.dataset.edge_message_ratio = 0.6
        cfg.dataset.resample_disjoint = True
        g = ring_graph(30)
        g["edge_feature"] = np.arange(g.num_edges, dtype=np.float32)[:, None]
        splits = split_dataset([g], cfg, np.random.default_rng(0))
        loader = GraphLoader(splits[0], cfg, batch_size=1, shuffle=True)
        seen_msgs, shapes = [], set()
        for epoch in range(4):
            (b,) = loader.batches(epoch)
            shapes.add((b.num_nodes, b.num_edges,
                        b.edge_label_index.shape[1]))
            tr = loader.graphs[0]
            seen_msgs.append(frozenset(
                zip(tr.senders.tolist(), tr.receivers.tolist())))
            eli, el = tr["edge_label_index"], tr["edge_label"]
            pos = eli[:, el == 1]
            sup = set(zip(pos[0].tolist(), pos[1].tolist()))
            assert not seen_msgs[-1] & sup
            # edge features stay aligned: feature value identifies the
            # original edge column
            ef = tr["edge_feature"].reshape(-1).astype(np.int64)
            orig = tr["_full_edge_index"]
            for col, (u, v) in zip(ef, zip(tr.senders, tr.receivers)):
                assert orig[0, col] == u and orig[1, col] == v
        assert len(shapes) == 1, "resampling must keep static shapes"
        assert len(set(seen_msgs)) > 1, "message set should change"

    def test_link_pred_inductive_disjoint_holds_out_supervision(self):
        """Inductive disjoint link_pred (the run/grids/IDGNN/link.txt
        protocol: transductive False + edge.yaml's disjoint mode) must
        hold supervision positives OUT of the message graph in EVERY
        split — otherwise an ID layer reads the supervision edge off
        the adjacency and the task degrades to the csv's 'edge' task
        (analysis/idgnn.csv edge rows ~1.0 vs link_pred rows ~0.80)."""
        cfg = get_cfg()
        cfg.dataset.task = "link_pred"
        cfg.dataset.transductive = False
        cfg.dataset.split = [0.8, 0.2]
        cfg.dataset.edge_train_mode = "disjoint"
        cfg.dataset.edge_message_ratio = 0.8
        graphs = [ring_graph(20) for _ in range(10)]
        splits = split_dataset(graphs, cfg, np.random.default_rng(0))
        for part in splits:
            for g in part:
                # ring(20): 20 undirected pairs -> 16 message, 4 sup
                assert g.num_edges == 2 * 16
                eli, el = g["edge_label_index"], g["edge_label"]
                pos = eli[:, el == 1]
                assert pos.shape[1] == 4
                msg = set(zip(g.senders.tolist(), g.receivers.tolist()))
                sup = set(zip(pos[0].tolist(), pos[1].tolist()))
                assert not msg & sup, \
                    "supervision edges must not pass messages"
                # negatives balanced 1:1 and drawn from true non-edges
                neg = eli[:, el == 0]
                assert neg.shape[1] == 4

    def test_link_pred_inductive_all_mode_keeps_full_graph(self):
        """edge_train_mode 'all' inductive: message = supervision =
        full edge set (the leaky 'edge'-task variant the csv also
        reports; reference analysis/idgnn.csv edge rows)."""
        cfg = get_cfg()
        cfg.dataset.task = "link_pred"
        cfg.dataset.transductive = False
        cfg.dataset.split = [0.8, 0.2]
        cfg.dataset.edge_train_mode = "all"
        graphs = [ring_graph(12) for _ in range(5)]
        splits = split_dataset(graphs, cfg, np.random.default_rng(0))
        for part in splits:
            for g in part:
                assert g.num_edges == 2 * 12
                eli, el = g["edge_label_index"], g["edge_label"]
                assert (el == 1).sum() == 12


class TestLoaderBatching:
    def test_batch_shapes_stable_across_epochs(self):
        cfg = get_cfg()
        cfg.dataset.task = "node"
        graphs = [ring_graph(n) for n in (6, 8, 10, 12, 5)]
        for g in graphs:
            g["node_label_index"] = np.arange(g.num_nodes)
        loader = GraphLoader(graphs, cfg, batch_size=2, shuffle=True)
        shapes = set()
        for epoch in range(3):
            for b in loader.batches(epoch):
                shapes.add((b.num_nodes, b.num_edges,
                            b.node_label_index.shape[0]))
        assert len(shapes) == 1, "padding buckets must be stable"

    def test_edge_features_collated(self):
        """Dataset edge_feature arrays must reach GraphBatch.edge_feat
        (consumed by edge-conditioned convs, nn/att_layers.py)."""
        cfg = get_cfg()
        cfg.dataset.task = "node"
        graphs = [ring_graph(n) for n in (6, 8)]
        for g in graphs:
            g["node_label_index"] = np.arange(g.num_nodes)
            g["edge_feature"] = np.full((g.num_edges, 3),
                                        float(g.num_nodes), np.float32)
        loader = GraphLoader(graphs, cfg, batch_size=2, shuffle=False)
        (b,) = loader.batches(0)
        assert b.edge_feat is not None and b.edge_feat.shape[1] == 3
        ef = np.asarray(b.edge_feat)
        em = np.asarray(b.edge_mask)
        assert set(np.unique(ef[em][:, 0])) == {6.0, 8.0}
        assert np.all(ef[~em] == 0)

    def test_full_pipeline_ws(self):
        cfg = get_cfg()
        cfg.merge_from_dict({
            "dataset": {"format": "nx", "name": "ws", "task": "node",
                        "transductive": False, "split": [0.8, 0.2],
                        "augment_label": "node_clustering_coefficient",
                        "augment_label_dims": 10, "transform": "ego"},
            "gnn": {"layers_mp": 2},
            "train": {"batch_size": 128}})
        splits = create_dataset(cfg)
        assert len(splits) == 2
        assert cfg.share.dim_out >= 2
        loaders = create_loader(splits, cfg)
        b = loaders[0].batches(0)[0]
        assert b.node_id_index is not None
        assert int(b.count_real_nodes()) > 0
        lab = np.asarray(b.node_label)
        assert lab.max() < cfg.share.dim_out
