"""Raw dataset-format parsers tested on synthesized fixtures (the real
Cora/TU downloads are unavailable in CI; the formats are exercised with
small fakes written to tmp)."""

import os
import pickle

import numpy as np
import pytest

from graphgym_tpu.data.loaders import load_planetoid, load_tu


class FakeSparse:
    """Stands in for scipy sparse matrices in the pickles."""

    def __init__(self, arr):
        self.arr = arr

    def todense(self):
        return self.arr


def make_planetoid_fixture(tmp_path, name="cora"):
    """Write a minimal ind.<name>.* set: 10 nodes, 4 test nodes."""
    rng = np.random.default_rng(0)
    n_train, n_test = 6, 4
    d, c = 5, 3
    allx = rng.random((n_train, d)).astype(np.float32)
    tx = rng.random((n_test, d)).astype(np.float32)
    ally = np.eye(c)[rng.integers(0, c, n_train)]
    ty = np.eye(c)[rng.integers(0, c, n_test)]
    x = allx[:3]
    y = ally[:3]
    graph = {i: [(i + 1) % 10, (i + 2) % 10] for i in range(10)}
    test_index = np.arange(6, 10)

    base = tmp_path / "cora_fix"
    base.mkdir()
    for suffix, obj in [("x", FakeSparse(x)), ("tx", FakeSparse(tx)),
                        ("allx", FakeSparse(allx)), ("y", y),
                        ("ty", ty), ("ally", ally), ("graph", graph)]:
        with open(base / f"ind.{name}.{suffix}", "wb") as f:
            pickle.dump(obj, f)
    np.savetxt(base / f"ind.{name}.test.index", test_index, fmt="%d")
    return str(base), allx, tx, ally, ty


def test_planetoid_parser(tmp_path):
    base, allx, tx, ally, ty = make_planetoid_fixture(tmp_path)
    graphs = load_planetoid("cora", base)
    assert len(graphs) == 1
    g = graphs[0]
    assert g.num_nodes == 10
    feat = g["node_feature"]
    np.testing.assert_allclose(feat[:6], allx, rtol=1e-6)
    np.testing.assert_allclose(feat[6:10], tx, rtol=1e-6)
    lab = g["node_label"]
    np.testing.assert_array_equal(lab[:6], ally.argmax(-1))
    np.testing.assert_array_equal(lab[6:10], ty.argmax(-1))
    # symmetric edges
    s, r = g.senders, g.receivers
    pairs = set(zip(s.tolist(), r.tolist()))
    assert all((b, a) in pairs for a, b in pairs)


def make_tu_fixture(tmp_path, name="FAKE"):
    """Two graphs: a triangle (label 0) and a 4-path (label 1)."""
    base = tmp_path / "tu_fix"
    base.mkdir()
    # 1-indexed adjacency rows
    edges = [(1, 2), (2, 1), (2, 3), (3, 2), (1, 3), (3, 1),
             (4, 5), (5, 4), (5, 6), (6, 5), (6, 7), (7, 6)]
    with open(base / f"{name}_A.txt", "w") as f:
        for a, b in edges:
            f.write(f"{a}, {b}\n")
    with open(base / f"{name}_graph_indicator.txt", "w") as f:
        f.write("\n".join(["1"] * 3 + ["2"] * 4))
    with open(base / f"{name}_graph_labels.txt", "w") as f:
        f.write("0\n1\n")
    with open(base / f"{name}_node_labels.txt", "w") as f:
        f.write("\n".join(map(str, [0, 1, 0, 1, 1, 0, 1])))
    return str(base)


def test_tu_parser(tmp_path):
    base = make_tu_fixture(tmp_path)
    graphs = load_tu("FAKE", base)
    assert len(graphs) == 2
    g0, g1 = graphs
    assert g0.num_nodes == 3 and g0.num_edges == 6
    assert g1.num_nodes == 4 and g1.num_edges == 6
    assert int(g0["graph_label"][0]) == 0
    assert int(g1["graph_label"][0]) == 1
    # node labels one-hot encoded into node_feature
    assert g0["node_feature"].shape == (3, 2)
    # edges 0-indexed within each graph
    assert g1.senders.max() < 4


def test_tu_parser_edge_attrs(tmp_path):
    base = make_tu_fixture(tmp_path)
    with open(os.path.join(base, "FAKE_edge_labels.txt"), "w") as f:
        f.write("\n".join(map(str, [0, 0, 1, 1, 0, 0, 1, 1, 0, 0, 1, 1])))
    with open(os.path.join(base, "FAKE_edge_attributes.txt"), "w") as f:
        f.write("\n".join(f"{i}.5" for i in range(12)))
    graphs = load_tu("FAKE", base)
    g0 = graphs[0]
    ef = g0["edge_feature"]
    assert ef.shape == (6, 3)  # 1 attr + 2-way one-hot label
    np.testing.assert_allclose(ef[:, 0], [i + 0.5 for i in range(6)])
    np.testing.assert_array_equal(ef[:, 1:].argmax(-1), [0, 0, 1, 1, 0, 0])


def test_npz_parser(tmp_path):
    """GNN-benchmark npz format (Coauthor/Amazon)."""
    from graphgym_tpu.data.loaders import load_npz_graph

    n, d = 6, 4
    # CSR adjacency of a directed ring incl. one self loop at 0
    indptr = np.array([0, 2, 3, 4, 5, 6, 7])
    indices = np.array([0, 1, 2, 3, 4, 5, 0])
    data = np.ones(7, np.float32)
    attr = np.arange(n * d, dtype=np.float32).reshape(n, d)
    labels = np.arange(n) % 3
    path = tmp_path / "ms_academic_cs.npz"
    np.savez(path, adj_data=data, adj_indices=indices,
             adj_indptr=indptr, adj_shape=np.array([n, n]),
             attr_matrix=attr, labels=labels)
    (g,) = load_npz_graph("ms_academic_cs.npz", str(tmp_path))
    assert g.num_nodes == n
    # ring symmetrized (12 directed edges), self loop dropped
    assert g.num_edges == 12
    assert not np.any(g.senders == g.receivers)
    np.testing.assert_allclose(g["node_feature"], attr)
    np.testing.assert_array_equal(g["node_label"], labels)


def test_ppi_parser(tmp_path):
    import json

    from graphgym_tpu.data.loaders import load_ppi

    base = tmp_path / "PPI" / "raw"
    base.mkdir(parents=True)
    # two graphs of 3 + 4 nodes in the train split
    links = [{"source": 0, "target": 1}, {"source": 1, "target": 2},
             {"source": 3, "target": 4}, {"source": 4, "target": 5},
             {"source": 5, "target": 6}]
    with open(base / "train_graph.json", "w") as f:
        json.dump({"links": links}, f)
    feats = np.arange(7 * 2, dtype=np.float32).reshape(7, 2)
    labels = np.stack([np.arange(7) % 2, np.arange(7) % 3 == 0], 1)
    np.save(base / "train_feats.npy", feats)
    np.save(base / "train_labels.npy", labels.astype(np.int64))
    np.save(base / "train_graph_id.npy", np.array([0, 0, 0, 1, 1, 1, 1]))
    graphs = load_ppi(str(tmp_path))
    assert len(graphs) == 2
    g0, g1 = graphs
    assert g0.num_nodes == 3 and g0.num_edges == 4  # symmetrized
    assert g1.num_nodes == 4 and g1.num_edges == 6
    np.testing.assert_allclose(g1["node_feature"], feats[3:])
    assert g1["node_label"].shape == (4, 2)  # multi-label preserved


def test_qm7b_parser(tmp_path):
    from scipy.io import savemat

    from graphgym_tpu.data.loaders import load_qm7b

    rng = np.random.default_rng(0)
    X = np.zeros((2, 5, 5), np.float32)
    for i in range(2):
        m = rng.random((5, 5)).astype(np.float32)
        X[i] = (m + m.T) * (rng.random((5, 5)) > 0.5)
    T = rng.random((2, 14)).astype(np.float32)
    savemat(tmp_path / "qm7b.mat", {"X": X, "T": T})
    graphs = load_qm7b(str(tmp_path))
    assert len(graphs) == 2
    g = graphs[0]
    assert g.num_nodes == 5
    assert g.num_edges == int((X[0] != 0).sum())
    np.testing.assert_allclose(g["graph_label"], T[0], rtol=1e-6)
    s, r = g.senders, g.receivers
    np.testing.assert_allclose(g["edge_feature"][:, 0], X[0][s, r])


def test_mnist_superpixels_parser(tmp_path):
    import torch

    from graphgym_tpu.data.loaders import load_mnist_superpixels

    def graph_dict(y):
        return {"x": torch.rand(5, 1), "pos": torch.rand(5, 2),
                "edge_index": torch.tensor([[0, 1, 2], [1, 2, 3]]),
                "y": torch.tensor([y])}

    data = [[graph_dict(3), graph_dict(7)], [graph_dict(1)]]
    (tmp_path / "MNIST" / "raw").mkdir(parents=True)
    torch.save(data, tmp_path / "MNIST" / "raw" / "MNISTSuperpixels.pt")
    graphs = load_mnist_superpixels(str(tmp_path))
    assert len(graphs) == 3
    g = graphs[0]
    assert g.num_nodes == 5 and g.num_edges == 3
    assert g["node_feature"].shape == (5, 3)  # x + pos
    assert int(g["graph_label"][0]) == 3
    assert int(graphs[2]["graph_label"][0]) == 1
