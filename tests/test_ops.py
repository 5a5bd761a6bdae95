"""Kernel unit tests: segment ops / SpMM / SDDMM / GCN norm vs dense
numpy oracles, forward and gradient (SURVEY.md §4 test pyramid (a))."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgym_tpu.graphs.container import build_graph_batch
from graphgym_tpu.ops import segment as S
from graphgym_tpu.ops import sparse as sp


def random_graph(rng, n=13, e=40, d=7):
    senders = rng.integers(0, n, size=e).astype(np.int32)
    receivers = rng.integers(0, n, size=e).astype(np.int32)
    w = rng.normal(size=e).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return senders, receivers, w, x


def dense_adj(senders, receivers, w, n):
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (receivers, senders), w)
    return a


class TestSegment:
    def test_sum_mean_max_min(self):
        rng = np.random.default_rng(0)
        ids = rng.integers(0, 5, size=30).astype(np.int32)
        data = rng.normal(size=(30, 4)).astype(np.float32)
        out = S.segment_sum(jnp.asarray(data), jnp.asarray(ids), 6)
        for k in range(6):
            np.testing.assert_allclose(out[k], data[ids == k].sum(0),
                                       rtol=1e-5, atol=1e-5)
        mean = S.segment_mean(jnp.asarray(data), jnp.asarray(ids), 6)
        mx = S.segment_max(jnp.asarray(data), jnp.asarray(ids), 6)
        mn = S.segment_min(jnp.asarray(data), jnp.asarray(ids), 6)
        for k in range(5):
            sel = data[ids == k]
            if len(sel):
                np.testing.assert_allclose(mean[k], sel.mean(0), rtol=1e-5)
                np.testing.assert_allclose(mx[k], sel.max(0), rtol=1e-5)
                np.testing.assert_allclose(mn[k], sel.min(0), rtol=1e-5)
        # empty segment 5 -> zeros, not inf
        np.testing.assert_allclose(mx[5], 0.0)
        np.testing.assert_allclose(mn[5], 0.0)
        np.testing.assert_allclose(mean[5], 0.0)

    def test_segment_softmax_matches_dense(self):
        rng = np.random.default_rng(1)
        ids = np.sort(rng.integers(0, 4, size=20)).astype(np.int32)
        logits = rng.normal(size=20).astype(np.float32) * 10
        out = np.asarray(S.segment_softmax(jnp.asarray(logits),
                                           jnp.asarray(ids), 5))
        for k in range(4):
            sel = logits[ids == k]
            if len(sel):
                ref = np.exp(sel - sel.max())
                ref = ref / ref.sum()
                np.testing.assert_allclose(out[ids == k], ref, rtol=1e-5,
                                           atol=1e-6)
        assert np.all(out[ids == 4] == 0) if (ids == 4).any() else True

    def test_segment_softmax_mask(self):
        ids = jnp.asarray(np.zeros(4, np.int32))
        logits = jnp.asarray(np.array([1.0, 2.0, 3.0, 100.0], np.float32))
        mask = jnp.asarray(np.array([True, True, True, False]))
        out = np.asarray(S.segment_softmax(logits, ids, 1, mask=mask))
        assert out[3] == 0.0
        ref = np.exp(np.array([1, 2, 3.0]) - 3.0)
        np.testing.assert_allclose(out[:3], ref / ref.sum(), rtol=1e-5)


class TestSpMM:
    def test_spmm_sum_matches_dense(self):
        rng = np.random.default_rng(2)
        s, r, w, x = random_graph(rng)
        out = sp.spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w),
                      jnp.asarray(x), x.shape[0])
        ref = dense_adj(s, r, w, x.shape[0]) @ x
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=1e-4)

    def test_spmm_grad_matches_dense(self):
        rng = np.random.default_rng(3)
        s, r, w, x = random_graph(rng, n=9, e=25, d=5)
        a = dense_adj(s, r, w, x.shape[0])

        def f_sparse(x_, w_):
            return jnp.sum(sp.spmm(jnp.asarray(s), jnp.asarray(r), w_, x_,
                                   x.shape[0]) ** 2)

        def f_dense(x_, w_):
            adj = jnp.zeros((x.shape[0], x.shape[0]))
            adj = adj.at[r, s].add(w_)
            return jnp.sum((adj @ x_) ** 2)

        gx1, gw1 = jax.grad(f_sparse, argnums=(0, 1))(jnp.asarray(x),
                                                      jnp.asarray(w))
        gx2, gw2 = jax.grad(f_dense, argnums=(0, 1))(jnp.asarray(x),
                                                     jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                                   rtol=1e-4, atol=1e-4)

    def test_sddmm_dot(self):
        rng = np.random.default_rng(4)
        s, r, _, _ = random_graph(rng, n=8, e=20, d=1)
        a = rng.normal(size=(8, 6)).astype(np.float32)
        b = rng.normal(size=(8, 6)).astype(np.float32)
        out = sp.sddmm_dot(jnp.asarray(s), jnp.asarray(r), jnp.asarray(a),
                           jnp.asarray(b))
        ref = np.sum(a[r] * b[s], axis=-1)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5,
                                   atol=1e-5)


class TestGCNNorm:
    def test_matches_reference_formula(self):
        """Replicates graphgym.contrib.transform.identity.norm
        (identity.py:7-22): add self loops, w = d^-1/2[r] * w * d^-1/2[s]."""
        rng = np.random.default_rng(5)
        n, e = 10, 30
        s = rng.integers(0, n, size=e).astype(np.int32)
        r = rng.integers(0, n, size=e).astype(np.int32)
        s2, r2, w = sp.gcn_norm(jnp.asarray(s), jnp.asarray(r), None, n)
        s2, r2, w = map(np.asarray, (s2, r2, w))

        # dense oracle
        s_ref = np.concatenate([s, np.arange(n)])
        r_ref = np.concatenate([r, np.arange(n)])
        w_ref = np.ones(e + n, np.float32)
        deg = np.zeros(n, np.float32)
        np.add.at(deg, r_ref, w_ref)
        dis = deg ** -0.5
        dis[~np.isfinite(dis)] = 0
        expect = dis[r_ref] * w_ref * dis[s_ref]
        np.testing.assert_allclose(w, expect, rtol=1e-5, atol=1e-6)
        # row sums of normalized adjacency ~ <= 1-ish sanity
        a = dense_adj(s2, r2, w, n)
        assert np.all(np.isfinite(a))

    def test_isolated_node_guard(self):
        # node 3 isolated, no self loops -> deg 0 -> inv sqrt guarded to 0
        s = jnp.asarray(np.array([0, 1], np.int32))
        r = jnp.asarray(np.array([1, 0], np.int32))
        _, _, w = sp.gcn_norm(s, r, None, 4, add_self_loops=False)
        assert np.all(np.isfinite(np.asarray(w)))


class TestIDWeights:
    def test_apply_id_weights(self):
        rng = np.random.default_rng(6)
        x = rng.normal(size=(7, 4)).astype(np.float32)
        w = rng.normal(size=(4, 3)).astype(np.float32)
        wid = rng.normal(size=(4, 3)).astype(np.float32)
        idx = np.array([1, 4, 5], np.int32)
        out = sp.apply_id_weights(jnp.asarray(x), jnp.asarray(idx),
                                  jnp.asarray(w), jnp.asarray(wid))
        ref = x @ w
        ref[idx] += x[idx] @ wid
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=1e-5)

    def test_apply_id_weights_masked(self):
        rng = np.random.default_rng(7)
        x = rng.normal(size=(7, 4)).astype(np.float32)
        w = rng.normal(size=(4, 3)).astype(np.float32)
        wid = rng.normal(size=(4, 3)).astype(np.float32)
        idx = np.array([1, 4, 6], np.int32)  # 6 = padding row, masked out
        mask = np.array([True, True, False])
        out = sp.apply_id_weights(jnp.asarray(x), jnp.asarray(idx),
                                  jnp.asarray(w), jnp.asarray(wid),
                                  jnp.asarray(mask))
        ref = x @ w
        ref[idx[:2]] += x[idx[:2]] @ wid
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4,
                                   atol=1e-5)


class TestContainer:
    def test_build_and_padding_invariants(self):
        rng = np.random.default_rng(8)
        n, e = 10, 24
        s = rng.integers(0, n, size=e)
        r = rng.integers(0, n, size=e)
        x = rng.normal(size=(n, 3))
        g = build_graph_batch(s, r, x, pad_nodes_to=16, pad_edges_to=32)
        assert g.num_nodes == 16 and g.num_edges == 32
        assert int(g.count_real_nodes()) == n
        assert int(g.count_real_edges()) == e
        # padded edges target the padding node with zero weight
        sn = np.asarray(g.senders)
        ew = np.asarray(g.edge_weight)
        assert np.all(sn[e:] == 15)
        assert np.all(ew[e:] == 0)
        # spmm on padded graph == dense result on real subgraph
        out = sp.spmm(g.senders, g.receivers, g.edge_weight, g.node_feat,
                      g.num_nodes)
        ref = dense_adj(s.astype(np.int32), r.astype(np.int32),
                        np.ones(e, np.float32), n) @ x.astype(np.float32)
        np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=1e-4,
                                   atol=1e-4)

    def test_self_loops(self):
        s = np.array([0, 1], np.int32)
        r = np.array([1, 2], np.int32)
        x = np.ones((3, 2), np.float32)
        g = build_graph_batch(s, r, x, pad_nodes_to=5, pad_edges_to=4)
        g2 = g.with_self_loops()
        assert g2.num_edges == 4 + 5
        w = np.asarray(g2.edge_weight)
        # loops on real nodes weight 1, padded nodes weight 0
        np.testing.assert_allclose(w[4:4 + 3], 1.0)
        np.testing.assert_allclose(w[4 + 3:], 0.0)

    def test_pytree_roundtrip(self):
        s = np.array([0], np.int32)
        r = np.array([1], np.int32)
        x = np.ones((2, 2), np.float32)
        g = build_graph_batch(s, r, x)
        leaves, treedef = jax.tree_util.tree_flatten(g)
        g2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert g2.num_graphs == g.num_graphs
