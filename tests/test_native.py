"""Native C++ runtime vs numpy/python oracles."""

import numpy as np
import pytest

from graphgym_tpu import native
from graphgym_tpu.data import structure as st
from graphgym_tpu.data.hostgraph import HostGraph
from graphgym_tpu.data.transforms import ego_nets


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="no C++ toolchain")


def rand_graph(n=64, seed=0):
    rng = np.random.default_rng(seed)
    # undirected simple graph
    pairs = set()
    while len(pairs) < n * 2:
        u, v = rng.integers(0, n, size=2)
        if u != v:
            pairs.add((min(u, v), max(u, v)))
    arr = np.array(sorted(pairs), np.int32)
    s = np.concatenate([arr[:, 0], arr[:, 1]])
    r = np.concatenate([arr[:, 1], arr[:, 0]])
    g = HostGraph(n, np.stack([s, r]).astype(np.int32))
    g["node_feature"] = rng.normal(size=(n, 3)).astype(np.float32)
    g["node_label"] = rng.integers(0, 3, size=n)
    return g


class TestNative:
    def test_build_csr(self):
        g = rand_graph()
        indptr, indices, order = native.build_csr(
            g.senders, g.receivers, g.num_nodes)
        ref_indptr, ref_indices = g.csr()
        np.testing.assert_array_equal(indptr, ref_indptr)
        # per-row sets equal (order within row may differ)
        for i in range(g.num_nodes):
            np.testing.assert_array_equal(
                np.sort(indices[indptr[i]:indptr[i + 1]]),
                np.sort(ref_indices[ref_indptr[i]:ref_indptr[i + 1]]))

    def test_clustering_matches_python(self):
        g = rand_graph()
        ours = native.clustering_coefficient(g.senders, g.receivers,
                                             g.num_nodes)
        ref = st.clustering_coefficient(g)
        np.testing.assert_allclose(ours, ref, atol=1e-12)

    @pytest.mark.parametrize("radius", [1, 2, 3])
    def test_ego_union_matches_python(self, radius):
        g = rand_graph()
        nat = ego_nets(g.copy(), radius=radius)  # native path
        # force python path by building sets manually
        ego_sets = st.ego_radius_nodes(g, radius)
        n = g.num_nodes
        # same total counts
        total_nodes = n + sum(len(e) - 1 for e in ego_sets)
        assert nat.num_nodes == total_nodes
        np.testing.assert_array_equal(nat["node_id_index"],
                                      np.arange(n))
        # degrees of centers match python implementation's structure:
        # each center's in-ego degree equals its original degree when
        # radius >= 1
        deg_union = np.zeros(nat.num_nodes, np.int64)
        np.add.at(deg_union, nat.senders, 1)
        deg_orig = np.zeros(n, np.int64)
        np.add.at(deg_orig, g.senders, 1)
        if radius >= 2:
            np.testing.assert_array_equal(deg_union[:n], deg_orig)

    def test_pack_matches_python(self):
        from graphgym_tpu.ops.pallas import spmm_kernel as K

        rng = np.random.default_rng(0)
        n, e = 500, 3000
        s = rng.integers(0, n, size=e).astype(np.int32)
        r = rng.integers(0, n, size=e).astype(np.int32)
        w = rng.random(e).astype(np.float32)
        pack = K.pack_csr(s, r, w, n)  # native path inside
        # weight conservation + structure checks
        np.testing.assert_allclose(float(np.asarray(pack.weights).sum()),
                                   float(w.sum()), rtol=1e-5)
        assert int(np.asarray(pack.local_rows).max()) < K.ROWS_PER_TILE
        t = np.asarray(pack.tiles)
        assert np.all(np.diff(t) >= 0)
        # full spmm equality against scatter oracle via interpret kernel
        import jax.numpy as jnp
        x = rng.normal(size=(n, 128)).astype(np.float32)
        out = K.spmm_packed(pack, jnp.asarray(x), n, interpret=True)
        ref = np.zeros((n, 128), np.float32)
        np.add.at(ref, r, x[s] * w[:, None])
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3,
                                   atol=1e-3)
