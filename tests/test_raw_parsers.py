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
