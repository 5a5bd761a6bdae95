"""Multi-chip tests on the 8-device virtual CPU mesh (SURVEY.md §4 (d)):
sharded execution must match single-device numerics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from graphgym_tpu.graphs.container import build_graph_batch
from graphgym_tpu.nn.model import GNN, GNNOptions
from graphgym_tpu.parallel.mesh import (make_mesh, shard_batch,
                                        shard_params)
from graphgym_tpu.ops import sparse as sp


def make_batch(n=64, e=256, d=16, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, size=e)
    r = rng.integers(0, n, size=e)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return build_graph_batch(
        s, r, x, node_label=rng.integers(0, 3, size=n),
        node_label_index=np.arange(n),
        node_id_index=np.arange(0, n, 2),
        pad_nodes_to=128, pad_edges_to=256)


@pytest.fixture(scope="module")
def devices():
    d = jax.devices()
    if len(d) < 8:
        pytest.skip("needs 8 virtual devices")
    return d


class TestMesh:
    def test_edge_sharded_spmm_matches_single(self, devices):
        mesh = make_mesh((8, 1), devices=devices)
        b = make_batch()
        ref = sp.spmm(b.senders, b.receivers, b.edge_weight, b.node_feat,
                      b.num_nodes)
        with mesh:
            sb = shard_batch(b, mesh)
            out = jax.jit(lambda g: sp.spmm(
                g.senders, g.receivers, g.edge_weight, g.node_feat,
                g.num_nodes))(sb)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
    def test_sharded_train_step_matches_single(self, devices, shape):
        mesh = make_mesh(shape, devices=devices)
        b = make_batch()
        opts = GNNOptions(layer_type="gcnidconv", layers_mp=2,
                          dim_inner=16, dim_out=3)
        model = GNN(opts)
        variables = model.init(jax.random.PRNGKey(0), b, False)
        optimizer = optax.adam(1e-2)

        from graphgym_tpu.train.loop import TrainState, make_train_step
        from graphgym_tpu.train.loss import LossOptions

        def run(batch, params):
            state = TrainState(params=params,
                               batch_stats=variables.get("batch_stats",
                                                         {}),
                               opt_state=optimizer.init(params),
                               step=jnp.zeros((), jnp.int32))
            step = make_train_step(model, optimizer, LossOptions(),
                                   donate=False)
            new_state, loss, *_ = step(state, batch,
                                       jax.random.PRNGKey(1))
            return float(loss), new_state.params

        loss_ref, params_ref = run(b, variables["params"])
        with mesh:
            sb = shard_batch(b, mesh)
            sp_params = shard_params(variables["params"], mesh)
            loss_sh, params_sh = run(sb, sp_params)
        assert np.isclose(loss_ref, loss_sh, rtol=1e-4)
        for a, c in zip(jax.tree_util.tree_leaves(params_ref),
                        jax.tree_util.tree_leaves(params_sh)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=2e-4, atol=2e-5)

    def test_graft_entry_dryrun(self, devices):
        import __graft_entry__ as ge
        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        assert np.all(np.isfinite(np.asarray(out)))
        ge.dryrun_multichip(8)
