"""OGB raw-directory loading + official split injection, tested on
synthesized fixtures in the standard csv.gz layout (reference
loader_pyg.py:84-138 load_ogb, loader.py:118-124 custom splits)."""

import gzip
import os

import numpy as np
import pytest

from graphgym_tpu.config import assert_cfg, get_cfg
from graphgym_tpu.data import loaders
from graphgym_tpu.data.ogb import index_to_mask, load_ogb


def _write_csv_gz(path, arr, fmt):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        np.savetxt(f, np.atleast_2d(arr), delimiter=",", fmt=fmt)


def make_ogbn_fixture(root, n=30, extra_edges=40, seed=0):
    """ogbn-style single-graph node-prop dataset."""
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "ogbn_toy")
    ring = np.stack([np.arange(n), (np.arange(n) + 1) % n], axis=1)
    rnd = rng.integers(0, n, (extra_edges, 2))
    edges = np.concatenate([ring, rnd])
    _write_csv_gz(f"{d}/raw/edge.csv.gz", edges, "%d")
    _write_csv_gz(f"{d}/raw/num-node-list.csv.gz", [[n]], "%d")
    _write_csv_gz(f"{d}/raw/num-edge-list.csv.gz", [[len(edges)]], "%d")
    feat = rng.normal(size=(n, 5))
    _write_csv_gz(f"{d}/raw/node-feat.csv.gz", feat, "%.6f")
    label = rng.integers(0, 3, (n, 1))
    _write_csv_gz(f"{d}/raw/node-label.csv.gz", label, "%d")
    perm = rng.permutation(n)
    split = {"train": perm[:n // 2], "valid": perm[n // 2:3 * n // 4],
             "test": perm[3 * n // 4:]}
    for part, idx in split.items():
        _write_csv_gz(f"{d}/split/official/{part}.csv.gz",
                      idx.reshape(-1, 1), "%d")
    return split, feat, label.reshape(-1), edges


def make_ogbg_fixture(root, num_graphs=12, seed=0):
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "ogbg_toy")
    nn = rng.integers(6, 12, num_graphs)
    all_edges, ne = [], []
    for n in nn:
        ring = np.stack([np.arange(n), (np.arange(n) + 1) % n], axis=1)
        all_edges.append(ring)
        ne.append(len(ring))
    _write_csv_gz(f"{d}/raw/edge.csv.gz", np.concatenate(all_edges), "%d")
    _write_csv_gz(f"{d}/raw/num-node-list.csv.gz",
                  np.asarray(nn).reshape(-1, 1), "%d")
    _write_csv_gz(f"{d}/raw/num-edge-list.csv.gz",
                  np.asarray(ne).reshape(-1, 1), "%d")
    feat = rng.normal(size=(int(np.sum(nn)), 4))
    _write_csv_gz(f"{d}/raw/node-feat.csv.gz", feat, "%.6f")
    glabel = rng.integers(0, 2, (num_graphs, 1))
    _write_csv_gz(f"{d}/raw/graph-label.csv.gz", glabel, "%d")
    perm = rng.permutation(num_graphs)
    split = {"train": perm[:8], "valid": perm[8:10], "test": perm[10:]}
    for part, idx in split.items():
        _write_csv_gz(f"{d}/split/scaffold/{part}.csv.gz",
                      idx.reshape(-1, 1), "%d")
    return split, nn, glabel.reshape(-1)


def make_ogbl_fixture(root, n=40, seed=0):
    rng = np.random.default_rng(seed)
    d = os.path.join(root, "ogbl_toy")
    ring = np.stack([np.arange(n), (np.arange(n) + 1) % n], axis=1)
    _write_csv_gz(f"{d}/raw/edge.csv.gz", ring, "%d")
    _write_csv_gz(f"{d}/raw/num-node-list.csv.gz", [[n]], "%d")
    _write_csv_gz(f"{d}/raw/num-edge-list.csv.gz", [[len(ring)]], "%d")
    feat = rng.normal(size=(n, 3))
    _write_csv_gz(f"{d}/raw/node-feat.csv.gz", feat, "%.6f")
    splits = {
        "train": ring[:30], "valid": ring[30:35], "test": ring[35:],
        "valid_neg": rng.integers(0, n, (5, 2)),
        "test_neg": rng.integers(0, n, (5, 2)),
    }
    for part, e in splits.items():
        _write_csv_gz(f"{d}/split/target/{part}.csv.gz", e, "%d")
    return splits


class TestOGBNode:
    def test_load_and_split(self, tmp_path):
        split, feat, label, edges = make_ogbn_fixture(str(tmp_path))
        graphs = load_ogb("ogbn-toy", str(tmp_path))
        assert len(graphs) == 1
        g = graphs[0]
        assert g.num_nodes == 30
        np.testing.assert_allclose(g["node_feature"], feat, atol=1e-5)
        np.testing.assert_array_equal(g["node_label"], label)
        # undirected + deduped
        s, r = g.senders, g.receivers
        pairs = set(zip(s.tolist(), r.tolist()))
        for a, b in edges:
            assert (a, b) in pairs and (b, a) in pairs

        cfg = get_cfg()
        cfg.dataset.format = "OGB"
        cfg.dataset.name = "ogbn-toy"
        cfg.dataset.task = "node"
        assert_cfg(cfg)
        parts = loaders.split_dataset(graphs, cfg,
                                      np.random.default_rng(0))
        assert len(parts) == 3
        for part_graphs, key in zip(parts, ("train", "valid", "test")):
            gg = part_graphs[0]
            np.testing.assert_array_equal(
                gg["node_label_index"], np.sort(split[key]))
            assert not any(k.startswith("_ogb") for k in gg.feats)
        # official masks partition the node set
        masks = [index_to_mask(p[0]["node_label_index"], 30)
                 for p in parts]
        total = masks[0].astype(int) + masks[1] + masks[2]
        np.testing.assert_array_equal(total, np.ones(30, int))

    def test_end_to_end_create_dataset(self, tmp_path):
        make_ogbn_fixture(str(tmp_path))
        cfg = get_cfg()
        cfg.dataset.format = "OGB"
        cfg.dataset.name = "ogbn-toy"
        cfg.dataset.dir = str(tmp_path)
        cfg.dataset.task = "node"
        assert_cfg(cfg)
        splits = loaders.create_dataset(cfg)
        assert cfg.share.dim_in == 5
        assert cfg.share.dim_out == 3
        assert cfg.share.num_splits == 3


class TestOGBGraph:
    def test_load_and_split(self, tmp_path):
        split, nn, glabel = make_ogbg_fixture(str(tmp_path))
        graphs = load_ogb("ogbg-toy", str(tmp_path))
        assert len(graphs) == 12
        for g, n in zip(graphs, nn):
            assert g.num_nodes == int(n)
            assert g.num_edges == int(n)     # ring
            assert int(g.senders.max()) < g.num_nodes
        cfg = get_cfg()
        cfg.dataset.format = "OGB"
        cfg.dataset.task = "graph"
        assert_cfg(cfg)
        parts = loaders.split_dataset(graphs, cfg,
                                      np.random.default_rng(0))
        assert [len(p) for p in parts] == [8, 2, 2]
        # graphs land in the official parts (match by node count + label)
        for part_graphs, key in zip(parts, ("train", "valid", "test")):
            got = sorted((g.num_nodes, int(np.asarray(g["graph_label"]).reshape(-1)[0]))
                         for g in part_graphs)
            want = sorted((int(nn[i]), int(glabel[i]))
                          for i in split[key])
            assert got == want


class TestOGBLink:
    def test_load_and_split(self, tmp_path):
        splits = make_ogbl_fixture(str(tmp_path))
        graphs = load_ogb("ogbl-toy", str(tmp_path))
        g = graphs[0]
        # message edges = train positives, both directions
        assert g.num_edges == 60
        cfg = get_cfg()
        cfg.dataset.format = "OGB"
        cfg.dataset.task = "link_pred"
        assert_cfg(cfg)
        parts = loaders.split_dataset(graphs, cfg,
                                      np.random.default_rng(0))
        assert len(parts) == 3
        for part_graphs, key in zip(parts, ("train", "valid", "test")):
            gg = part_graphs[0]
            eli, el = gg["edge_label_index"], gg["edge_label"]
            pos = splits[key]
            np.testing.assert_array_equal(eli[:, :len(pos)], pos.T)
            assert (el[:len(pos)] == 1).all()
            assert (el[len(pos):] == 0).all()
        # valid/test negatives come from the official files
        np.testing.assert_array_equal(
            parts[1][0]["edge_label_index"][:, 5:],
            splits["valid_neg"].T)

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            load_ogb("ogbn-absent", str(tmp_path))
