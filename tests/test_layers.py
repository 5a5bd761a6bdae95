"""Per-layer numerics tests vs dense numpy oracles of the reference math
(SURVEY.md §4 test pyramid (b)): GCN renorm formula (TfgIDLayer.py:544-561),
ID scatter semantics (idconv.py:62-67), SAGE/GIN/GAT aggregation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from graphgym_tpu.graphs.container import build_graph_batch
from graphgym_tpu.nn import id_layers as idl
from graphgym_tpu.nn import layers as L
from graphgym_tpu.nn.model import GNN, GNNOptions
from graphgym_tpu.nn.norm import MaskedBatchNorm


def make_graph(n=8, e=20, d=5, pad_n=12, pad_e=32, seed=0, with_id=False):
    rng = np.random.default_rng(seed)
    senders = rng.integers(0, n, size=e)
    receivers = rng.integers(0, n, size=e)
    x = rng.normal(size=(n, d)).astype(np.float32)
    kw = {}
    if with_id:
        kw["node_id_index"] = np.arange(0, n, 2)
    g = build_graph_batch(senders, receivers, x, pad_nodes_to=pad_n,
                          pad_edges_to=pad_e,
                          node_label=rng.integers(0, 3, size=n),
                          node_label_index=np.arange(n), **kw)
    return g, senders, receivers, x


def dense_gcn_norm_adj(senders, receivers, n):
    """Dense oracle of D^-1/2 (A+I) D^-1/2 (row=receiver convention)."""
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (receivers, senders), 1.0)
    a = a + np.eye(n, dtype=np.float32)
    deg = a.sum(1)
    dis = deg ** -0.5
    dis[~np.isfinite(dis)] = 0
    return dis[:, None] * a * dis[None, :]


def run_layer(layer, g, seed=0):
    params = layer.init(jax.random.PRNGKey(seed), g, False)
    out = layer.apply(params, g, False)
    return params, out


class TestGCNConv:
    def test_matches_dense_oracle(self):
        g, s, r, x = make_graph()
        n_real = x.shape[0]
        layer = L.GCNConv(6, use_bias=True)
        params, out = run_layer(layer, g)
        w = np.asarray(params["params"]["kernel"])
        b = np.asarray(params["params"]["bias"])
        # oracle on the PADDED graph: padded nodes get a weight-0 loop
        # so their row is all-zero and real rows equal the real-graph
        # result
        ref = dense_gcn_norm_adj(s, r, n_real) @ (x @ w) + b
        np.testing.assert_allclose(np.asarray(out.node_feat)[:n_real], ref,
                                   rtol=1e-4, atol=1e-4)

    def test_padding_invariance(self):
        """Same graph, different padding -> identical real-row outputs."""
        g1, s, r, x = make_graph(pad_n=12, pad_e=32)
        g2, _, _, _ = make_graph(pad_n=20, pad_e=64)
        layer = L.GCNConv(6)
        params = layer.init(jax.random.PRNGKey(0), g1, False)
        o1 = layer.apply(params, g1, False).node_feat
        o2 = layer.apply(params, g2, False).node_feat
        np.testing.assert_allclose(np.asarray(o1)[:8], np.asarray(o2)[:8],
                                   rtol=1e-4, atol=1e-5)


class TestSAGEConv:
    def test_concat_matches_tfg_oracle(self):
        """tfg MeanGraphSage: [x @ W_self || mean_nb @ W_nb] + b
        (TfgIDLayer.py:86-120 minus id)."""
        g, s, r, x = make_graph()
        n = x.shape[0]
        layer = L.SAGEConv(8, combine="concat", use_bias=True)
        params, out = run_layer(layer, g)
        p = params["params"]
        mean_nb = np.zeros_like(x)
        cnt = np.zeros(n)
        for si, ri in zip(s, r):
            mean_nb[ri] += x[si]
            cnt[ri] += 1
        mean_nb /= np.maximum(cnt, 1)[:, None]
        ref = np.concatenate([x @ np.asarray(p["self_kernel"]),
                              mean_nb @ np.asarray(p["neighbor_kernel"])],
                             axis=1) + np.asarray(p["bias"])
        np.testing.assert_allclose(np.asarray(out.node_feat)[:n], ref,
                                   rtol=1e-4, atol=1e-4)


class TestGINConv:
    def test_matches_oracle(self):
        g, s, r, x = make_graph()
        n = x.shape[0]
        layer = L.GINConv(6)
        params, out = run_layer(layer, g)
        p = params["params"]
        agg = np.zeros_like(x)
        for si, ri in zip(s, r):
            agg[ri] += x[si]
        h = x + agg  # eps=0
        h = np.maximum(h @ np.asarray(p["mlp_kernel1"]) + np.asarray(p["mlp_bias1"]),
                       0)
        ref = h @ np.asarray(p["mlp_kernel2"]) + np.asarray(p["mlp_bias2"])
        np.testing.assert_allclose(np.asarray(out.node_feat)[:n], ref,
                                   rtol=1e-4, atol=1e-4)


class TestGATConv:
    def test_attention_rows_sum_to_one(self):
        g, s, r, x = make_graph()
        layer = L.GATConv(6, heads=2)
        params, out = run_layer(layer, g)
        assert np.all(np.isfinite(np.asarray(out.node_feat)))

    def test_single_head_matches_oracle(self):
        g, s, r, x = make_graph(n=6, e=12, d=4, pad_n=8, pad_e=16)
        n = x.shape[0]
        layer = L.GATConv(4, heads=1)
        params, out = run_layer(layer, g)
        p = params["params"]
        w = np.asarray(p["kernel"])
        att = np.asarray(p["att"])[0, 0]  # [2*F]
        h = x @ w
        # self-loops appended
        s2 = np.concatenate([s, np.arange(n)])
        r2 = np.concatenate([r, np.arange(n)])
        logits = np.array([
            np.dot(att, np.concatenate([h[ri], h[si]]))
            for si, ri in zip(s2, r2)])
        logits = np.where(logits > 0, logits, 0.2 * logits)  # leakyrelu
        out_ref = np.zeros((n, 4), np.float32)
        for i in range(n):
            mask = r2 == i
            if not mask.any():
                continue
            a = np.exp(logits[mask] - logits[mask].max())
            a /= a.sum()
            out_ref[i] = (a[:, None] * h[s2[mask]]).sum(0)
        np.testing.assert_allclose(np.asarray(out.node_feat)[:n], out_ref,
                                   rtol=1e-3, atol=1e-4)


class TestGeneralConv:
    @pytest.mark.parametrize("self_msg", ["none", "add", "concat"])
    @pytest.mark.parametrize("agg", ["add", "mean", "max"])
    def test_oracle(self, self_msg, agg):
        g, s, r, x = make_graph(d=6)
        n = x.shape[0]
        layer = L.GeneralConv(6, agg=agg, self_msg=self_msg)
        params, out = run_layer(layer, g)
        p = params["params"]
        h = x @ np.asarray(p["kernel"])
        msgs = [[] for _ in range(n)]
        for si, ri in zip(s, r):
            msgs[ri].append(h[si])
        red = np.zeros_like(h)
        for i, m in enumerate(msgs):
            if m:
                m = np.stack(m)
                red[i] = {"add": m.sum(0), "mean": m.mean(0),
                          "max": m.max(0)}[agg]
        if self_msg == "none":
            ref = red
        elif self_msg == "add":
            ref = red + h
        else:
            ref = red + x @ np.asarray(p["self_kernel"])
        np.testing.assert_allclose(np.asarray(out.node_feat)[:n], ref,
                                   rtol=1e-4, atol=1e-4)


class TestIDLayers:
    def test_gcnid_matches_colored_oracle(self):
        """gcn_id (TfgIDLayer.py:478-525): id coloring then normed SpMM."""
        g, s, r, x = make_graph(with_id=True)
        n = x.shape[0]
        idx = np.arange(0, n, 2)
        layer = idl.GCNIDConv(6, use_bias=True)
        params, out = run_layer(layer, g)
        p = params["params"]
        h = x @ np.asarray(p["kernel"])
        h[idx] += x[idx] @ np.asarray(p["id_kernel"])
        ref = dense_gcn_norm_adj(s, r, n) @ h + np.asarray(p["bias"])
        np.testing.assert_allclose(np.asarray(out.node_feat)[:n], ref,
                                   rtol=1e-4, atol=1e-4)

    def test_id_equals_plain_when_kernels_tied(self):
        """With id_kernel = 0, GCNIDConv == GCNConv(bias=True)."""
        g, s, r, x = make_graph(with_id=True)
        n = x.shape[0]
        layer = idl.GCNIDConv(6, use_bias=True)
        params, _ = run_layer(layer, g)
        p = {"params": dict(params["params"])}
        p["params"]["id_kernel"] = jnp.zeros_like(p["params"]["id_kernel"])
        out_id = layer.apply(p, g, False).node_feat
        plain = L.GCNConv(6, use_bias=True)
        pp = {"params": {"kernel": p["params"]["kernel"],
                         "bias": p["params"]["bias"]}}
        out_plain = plain.apply(pp, g, False).node_feat
        np.testing.assert_allclose(np.asarray(out_id)[:n],
                                   np.asarray(out_plain)[:n],
                                   rtol=1e-5, atol=1e-6)

    def test_sageid_oracle(self):
        """idconv.py:192-259 SAGEIDConvLayer with concat=True."""
        g, s, r, x = make_graph(with_id=True)
        n = x.shape[0]
        idx = np.arange(0, n, 2)
        layer = idl.SAGEIDConv(6, use_bias=True, concat_self=True)
        params, out = run_layer(layer, g)
        p = params["params"]
        mean_nb = np.zeros_like(x)
        cnt = np.zeros(n)
        for si, ri in zip(s, r):
            mean_nb[ri] += x[si]
            cnt[ri] += 1
        mean_nb /= np.maximum(cnt, 1)[:, None]
        a = np.concatenate([x, mean_nb], axis=1)
        h = a @ np.asarray(p["kernel"])
        h[idx] += a[idx] @ np.asarray(p["id_kernel"])
        ref = h + np.asarray(p["bias"])
        np.testing.assert_allclose(np.asarray(out.node_feat)[:n], ref,
                                   rtol=1e-4, atol=1e-4)

    def test_ginid_and_gatid_finite(self):
        g, s, r, x = make_graph(with_id=True)
        for layer in (idl.GINIDConv(6), idl.GATIDConv(6, heads=2),
                      idl.TfgIDGAT(6, heads=2), idl.TfgIDSAGE(6),
                      idl.GeneralIDConv(6)):
            _, out = run_layer(layer, g)
            o = np.asarray(out.node_feat)
            assert np.all(np.isfinite(o)), layer.__class__.__name__
            assert o.shape[-1] == 6


class TestMaskedBatchNorm:
    def test_stats_exclude_padding(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=(10, 4)).astype(np.float32)
        x[7:] = 100.0  # padded rows with absurd values
        mask = np.array([True] * 7 + [False] * 3)
        bn = MaskedBatchNorm(4)
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x),
                            jnp.asarray(mask), True)
        y, mutated = bn.apply(variables, jnp.asarray(x), jnp.asarray(mask),
                              True, mutable=["batch_stats"])
        y = np.asarray(y)[:7]
        np.testing.assert_allclose(y.mean(0), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std(0), 1.0, atol=1e-2)
        # running stats track the *valid-row* mean (0.1 momentum)
        ra = np.asarray(mutated["batch_stats"]["mean"])
        np.testing.assert_allclose(ra, 0.1 * x[:7].mean(0), rtol=1e-4,
                                   atol=1e-5)


class TestFullModel:
    @pytest.mark.parametrize("layer_type", [
        "gcnconv", "sageconv", "gatconv", "ginconv", "generalconv",
        "Tfg-gcnconv", "Tfg-sageconv", "Tfg-gatconv", "Tfg-ginconv"])
    def test_forward_shapes(self, layer_type):
        g, *_ = make_graph()
        opts = GNNOptions(layer_type=layer_type, layers_pre_mp=1,
                          layers_mp=2, layers_post_mp=1, dim_inner=16,
                          dim_out=3,
                          tfg_head=layer_type.startswith("Tfg-"))
        model = GNN(opts)
        params = model.init(jax.random.PRNGKey(0), g, False)
        pred, label, mask = model.apply(params, g, False)
        assert pred.shape[-1] == 3
        assert np.all(np.isfinite(np.asarray(pred)))

    @pytest.mark.parametrize("layer_type", [
        "gcnidconv", "sageidconv", "gatidconv", "ginidconv", "idconv",
        "Tfg-idgcn", "Tfg-idsage", "Tfg-idgat", "Tfg-idgin"])
    def test_id_forward_shapes(self, layer_type):
        g, *_ = make_graph(with_id=True)
        opts = GNNOptions(layer_type=layer_type, layers_mp=2,
                          dim_inner=16, dim_out=3,
                          tfg_head=layer_type.startswith("Tfg-"))
        model = GNN(opts)
        params = model.init(jax.random.PRNGKey(0), g, False)
        pred, label, mask = model.apply(params, g, False)
        assert pred.shape[-1] == 3
        assert np.all(np.isfinite(np.asarray(pred)))

    @pytest.mark.parametrize("stage", ["stack", "skipsum", "skipconcat"])
    def test_stages(self, stage):
        g, *_ = make_graph(d=16)  # skipsum needs dim_in == dim_inner
        opts = GNNOptions(layer_type="gcnconv", stage_type=stage,
                          layers_mp=2, dim_inner=16, dim_out=3)
        model = GNN(opts)
        params = model.init(jax.random.PRNGKey(0), g, False)
        pred, _, _ = model.apply(params, g, False)
        assert np.all(np.isfinite(np.asarray(pred)))

    def test_train_mode_with_dropout_and_bn(self):
        g, *_ = make_graph()
        opts = GNNOptions(layer_type="gcnconv", layers_mp=2, dim_inner=16,
                          dim_out=3, dropout=0.5)
        model = GNN(opts)
        variables = model.init(jax.random.PRNGKey(0), g, False)
        (pred, _, _), mutated = model.apply(
            variables, g, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        assert np.all(np.isfinite(np.asarray(pred)))
        assert "batch_stats" in mutated


class TestPReLU:
    def test_prelu_learnable_slope(self):
        """prelu carries a learned slope parameter (torch nn.PReLU
        semantics, reference act.py:9), shared and differentiable."""
        import jax
        import jax.numpy as jnp

        from graphgym_tpu.nn.layers import GeneralLayer, Linear  # noqa

        b, *_ = make_graph()
        layer = GeneralLayer(Linear(8), 8, act="prelu", has_bn=False)
        v = layer.init(jax.random.PRNGKey(0), b, False)
        leaves = jax.tree_util.tree_leaves_with_path(v)
        assert any("slope" in jax.tree_util.keystr(k) for k, _ in leaves)

        def loss(p):
            return jnp.sum(layer.apply(p, b, False).node_feat ** 2)

        g = jax.grad(loss)(v)
        gs = [l for k, l in jax.tree_util.tree_leaves_with_path(g)
              if "slope" in jax.tree_util.keystr(k)]
        assert np.any(np.asarray(gs[0]) != 0)
