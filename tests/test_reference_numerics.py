"""Per-layer numerics vs the reference's ACTUAL kernels.

The reference's Tfg path computes on tf.math.unsorted_segment_sum /
tensor_scatter_nd_add / gather (SURVEY.md §0); TensorFlow is available
in this image, so these tests replicate the reference formulas with
those exact TF ops and require allclose against our JAX implementations
— the "per-layer activations allclose" requirement of BASELINE.json.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
tf.config.set_visible_devices([], "GPU")

import jax
import jax.numpy as jnp
import torch

from graphgym_tpu.ops import segment as S
from graphgym_tpu.ops import sparse as sp


def rand_graph(n=50, e=200, d=16, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = rng.integers(0, n, size=e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return s, r, w, x


class TestVsTensorFlowKernels:
    def test_segment_sum_matches_tf(self):
        s, r, w, x = rand_graph()
        ours = S.segment_sum(jnp.asarray(x[s]), jnp.asarray(r), 50)
        ref = tf.math.unsorted_segment_sum(x[s], r, 50).numpy()
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5,
                                   atol=1e-5)

    def test_spmm_matches_sparseadj_matmul(self):
        """reference sparse_adj.py:91-97: gather(col) * w ->
        unsorted_segment_sum(row)."""
        s, r, w, x = rand_graph()
        repeated = tf.gather(x, s)
        repeated = repeated * tf.expand_dims(w, -1)
        ref = tf.math.unsorted_segment_sum(repeated, r, 50).numpy()
        ours = sp.spmm(jnp.asarray(s), jnp.asarray(r), jnp.asarray(w),
                       jnp.asarray(x), 50)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5,
                                   atol=1e-5)

    def test_segment_softmax_matches_tfg_formula(self):
        """tf_geometric segment_softmax: exp(x - max_seg) normalized
    per segment (used by SparseAdj.softmax, sparse_adj.py:136-151)."""
        s, r, w, x = rand_graph()
        logits = w * 10
        m = tf.math.unsorted_segment_max(logits, r, 50)
        shifted = logits - tf.gather(m, r)
        ex = tf.exp(shifted)
        denom = tf.math.unsorted_segment_sum(ex, r, 50)
        ref = (ex / tf.gather(denom, r)).numpy()
        ours = S.segment_softmax(jnp.asarray(logits), jnp.asarray(r),
                                 50)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5,
                                   atol=1e-6)

    def test_gcn_norm_matches_gcn_norm_adj(self):
        """reference TfgIDLayer.py:528-566: add_self_loop -> deg ->
        pow(-0.5) with inf/nan guard -> D^-1/2 A D^-1/2."""
        s, r, w, x = rand_graph(n=30, e=80)
        n = 30
        # TF replica
        s2 = np.concatenate([s, np.arange(n, dtype=np.int32)])
        r2 = np.concatenate([r, np.arange(n, dtype=np.int32)])
        w2 = np.concatenate([w, np.ones(n, np.float32)])
        deg = tf.math.unsorted_segment_sum(w2, r2, n)
        dis = tf.pow(deg, -0.5)
        dis = tf.where(
            tf.math.logical_or(tf.math.is_inf(dis),
                               tf.math.is_nan(dis)),
            tf.zeros_like(dis), dis)
        ref_w = (tf.gather(dis, r2) * w2 * tf.gather(dis, s2)).numpy()
        os_, or_, ow = sp.gcn_norm(jnp.asarray(s), jnp.asarray(r),
                                   jnp.asarray(w), n)
        np.testing.assert_array_equal(np.asarray(os_), s2)
        np.testing.assert_array_equal(np.asarray(or_), r2)
        np.testing.assert_allclose(np.asarray(ow), ref_w, rtol=1e-5,
                                   atol=1e-6)

    def test_id_recombine_matches_tensor_scatter_nd_add(self):
        """reference TfgIDLayer.py:103-107: h = x@W; h_id = x[id]@W_id;
        h = tensor_scatter_nd_add(h, id, h_id)."""
        rng = np.random.default_rng(1)
        n, d, o = 20, 8, 6
        x = rng.normal(size=(n, d)).astype(np.float32)
        wk = rng.normal(size=(d, o)).astype(np.float32)
        wid = rng.normal(size=(d, o)).astype(np.float32)
        idx = np.arange(0, n, 3).astype(np.int32)
        h = tf.matmul(x, wk)
        h_id = tf.matmul(tf.gather(x, idx), wid)
        ref = tf.tensor_scatter_nd_add(
            h, idx.reshape(-1, 1), h_id).numpy()
        ours = sp.apply_id_weights(jnp.asarray(x), jnp.asarray(idx),
                                   jnp.asarray(wk), jnp.asarray(wid))
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4,
                                   atol=1e-5)

    def test_gcn_id_full_layer_matches_reference_formula(self):
        """Full gcn_id forward (TfgIDLayer.py:478-525) replicated in TF
        vs our GCNIDConv with the same weights."""
        from graphgym_tpu.graphs.container import build_graph_batch
        from graphgym_tpu.nn.id_layers import GCNIDConv

        s, r, w, x = rand_graph(n=25, e=70, d=8)
        n = 25
        idx = np.arange(0, n, 2)
        g = build_graph_batch(s, r, x, edge_weight=w,
                              node_id_index=idx,
                              pad_nodes_to=n + 1, pad_edges_to=70)
        layer = GCNIDConv(6, use_bias=True)
        params = layer.init(jax.random.PRNGKey(0), g, False)
        p = params["params"]
        ours = np.asarray(layer.apply(params, g, False).node_feat)[:n]

        # TF replica with the same weights
        wk = np.asarray(p["kernel"])
        wid = np.asarray(p["id_kernel"])
        b = np.asarray(p["bias"])
        h = tf.matmul(x, wk)
        h_id = tf.matmul(tf.gather(x, idx), wid)
        h = tf.tensor_scatter_nd_add(h, idx.reshape(-1, 1), h_id)
        s2 = np.concatenate([s, np.arange(n, dtype=np.int32)])
        r2 = np.concatenate([r, np.arange(n, dtype=np.int32)])
        w2 = np.concatenate([w, np.ones(n, np.float32)])
        deg = tf.math.unsorted_segment_sum(w2, r2, n)
        dis = tf.pow(deg, -0.5)
        dis = tf.where(tf.math.logical_or(tf.math.is_inf(dis),
                                          tf.math.is_nan(dis)),
                       tf.zeros_like(dis), dis)
        nw = tf.gather(dis, r2) * w2 * tf.gather(dis, s2)
        msg = tf.gather(h, s2) * tf.expand_dims(nw, -1)
        ref = tf.math.unsorted_segment_sum(msg, r2, n).numpy() + b
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TestVsTfgLayerFormulas:
    def test_idsage_matches_reference_formula(self):
        """TfgIDLayer.py:86-120 IDSAGE: mean_reducer + 3 kernels +
        concat, replicated with TF kernels vs our TfgIDSAGE."""
        from graphgym_tpu.graphs.container import build_graph_batch
        from graphgym_tpu.nn.id_layers import TfgIDSAGE

        s, r, w, x = rand_graph(n=25, e=70, d=8)
        n = 25
        idx = np.arange(0, n, 2)
        g = build_graph_batch(s, r, x, node_id_index=idx,
                              pad_nodes_to=n + 1, pad_edges_to=70)
        layer = TfgIDSAGE(8, use_bias=True)
        params = layer.init(jax.random.PRNGKey(0), g, False)
        p = params["params"]
        ours = np.asarray(layer.apply(params, g, False).node_feat)[:n]

        # TF replica (mean_reducer = unsorted_segment_mean over rows)
        nb = tf.math.unsorted_segment_mean(tf.gather(x, s), r, n)
        h_nb = tf.matmul(nb, np.asarray(p["neighbor_kernel"]))
        h = tf.matmul(x, np.asarray(p["self_kernel"]))
        h_id = tf.matmul(tf.gather(x, idx),
                         np.asarray(p["id_kernel"]))
        h = tf.tensor_scatter_nd_add(h, idx.reshape(-1, 1), h_id)
        ref = tf.concat([h, h_nb], axis=1).numpy() + np.asarray(
            p["bias"])
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_gat_dot_attention_matches_reference_formula(self):
        """TfgIDLayer.py:269-388 gat_id (without id): Q/K relu
        projections, dot-score / sqrt(d), edge softmax incl. self
        loops, V aggregation — replicated with TF kernels."""
        from graphgym_tpu.graphs.container import build_graph_batch
        from graphgym_tpu.nn.layers import TfgGATConv

        s, r, w, x = rand_graph(n=20, e=50, d=8)
        n = 20
        g = build_graph_batch(s, r, x, pad_nodes_to=n + 1,
                              pad_edges_to=50)
        layer = TfgGATConv(8, heads=1)
        params = layer.init(jax.random.PRNGKey(0), g, False)
        p = params["params"]
        ours = np.asarray(layer.apply(params, g, False).node_feat)[:n]

        q = tf.nn.relu(tf.matmul(x, np.asarray(p["query_kernel"]))
                       + np.asarray(p["query_bias"]))
        k = tf.nn.relu(tf.matmul(x, np.asarray(p["key_kernel"]))
                       + np.asarray(p["key_bias"]))
        v = tf.matmul(x, np.asarray(p["kernel"]))
        s2 = np.concatenate([s, np.arange(n, dtype=np.int32)])
        r2 = np.concatenate([r, np.arange(n, dtype=np.int32)])
        score = tf.reduce_sum(tf.gather(q, r2) * tf.gather(k, s2),
                              axis=-1) / np.sqrt(8.0)
        m = tf.math.unsorted_segment_max(score, r2, n)
        ex = tf.exp(score - tf.gather(m, r2))
        z = tf.math.unsorted_segment_sum(ex, r2, n)
        alpha = ex / tf.gather(z, r2)
        msg = tf.gather(v, s2) * tf.expand_dims(alpha, -1)
        ref = tf.math.unsorted_segment_sum(msg, r2, n).numpy() \
            + np.asarray(p["bias"])
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


class TestVsTorchKernels:
    def test_index_add_matches(self):
        """reference idconv.py:64-67: x.index_add_(0, id, x_id)."""
        rng = np.random.default_rng(2)
        x = rng.normal(size=(15, 5)).astype(np.float32)
        upd = rng.normal(size=(5, 5)).astype(np.float32)
        idx = np.array([0, 3, 3, 7, 14])
        t = torch.tensor(x.copy())
        t.index_add_(0, torch.tensor(idx), torch.tensor(upd))
        ours = sp.scatter_add_rows(jnp.asarray(x),
                                   jnp.asarray(idx.astype(np.int32)),
                                   jnp.asarray(upd))
        np.testing.assert_allclose(np.asarray(ours), t.numpy(),
                                   rtol=1e-5, atol=1e-6)

    def test_gcn_norm_matches_torch_formula(self):
        """reference contrib/transform/identity.py:7-22 norm()."""
        s, r, w, x = rand_graph(n=20, e=60)
        n = 20
        ei = torch.tensor(np.stack([s, r]).astype(np.int64))
        ew = torch.ones(60)
        # add_remaining_self_loops on a loop-free graph == append loops
        s2 = torch.cat([ei[0], torch.arange(n)])
        r2 = torch.cat([ei[1], torch.arange(n)])
        w2 = torch.cat([ew, torch.ones(n)])
        deg = torch.zeros(n).index_add_(0, r2, w2)
        dis = deg.pow(-0.5)
        dis[dis == float("inf")] = 0
        ref = (dis[r2] * w2 * dis[s2]).numpy()
        _, _, ours = sp.gcn_norm(jnp.asarray(s), jnp.asarray(r), None,
                                 n)
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-5,
                                   atol=1e-6)
