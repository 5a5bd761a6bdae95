"""Design-space matrix smoke tests: every layer type x stage x task
combination must construct, run forward+backward, and produce finite
gradients (the reference's core promise is that any point in the design
space trains; reference run/configs_gen.py grids)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from graphgym_tpu.graphs.container import build_graph_batch
from graphgym_tpu.nn.model import GNN, GNNOptions
from graphgym_tpu.train.loop import TrainState, make_train_step
from graphgym_tpu.train.loss import LossOptions


def make_batch(task="node", d=6, edge_feats=True, seed=0):
    rng = np.random.default_rng(seed)
    n_graphs, n, e = 3, 10, 24
    ss, rs, gids = [], [], []
    off = 0
    for gi in range(n_graphs):
        ss.append(rng.integers(0, n, size=e) + off)
        rs.append(rng.integers(0, n, size=e) + off)
        gids.append(np.full(n, gi, np.int32))
        off += n
    x = rng.normal(size=(off, d)).astype(np.float32)
    kw = dict(
        graph_ids=np.concatenate(gids), num_graphs=n_graphs + 1,
        node_label=rng.integers(0, 3, size=off),
        node_label_index=np.arange(off),
        node_id_index=np.arange(0, off, 2),
        edge_feat=(rng.normal(size=(3 * e, 4)).astype(np.float32)
                   if edge_feats else None),
        pad_nodes_to=64, pad_edges_to=128)
    if task in ("edge", "link_pred"):
        kw["edge_label"] = rng.integers(0, 2, size=8)
        kw["edge_label_index"] = np.stack(
            [rng.integers(0, off, 8), rng.integers(0, off, 8)])
    if task == "graph":
        kw["graph_label"] = rng.integers(0, 3, size=n_graphs)
    return build_graph_batch(np.concatenate(ss), np.concatenate(rs), x,
                             **kw)


ALL_LAYERS = [
    "linear", "mlp", "gcnconv", "sageconv", "gatconv", "ginconv",
    "splineconv", "generalconv", "generaledgeconv",
    "generalsampleedgeconv", "idconv", "gcnidconv", "sageidconv",
    "gatidconv", "ginidconv", "gaddconv", "gmulconv",
    "generaledgeattconvv1", "generaledgeattconvv2", "generalconv_v2",
    "sageinitconv", "generalogbconv", "exampleconv1",
    "Tfg-gcnconv", "Tfg-sageconv", "Tfg-gatconv", "Tfg-ginconv",
    "Tfg-idgcn", "Tfg-idsage", "Tfg-idgat", "Tfg-idgin",
]


def run_one_step(opts, batch):
    model = GNN(opts)
    optimizer = optax.adam(1e-2)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=optimizer.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(model, optimizer, LossOptions(),
                           donate=False)
    new_state, loss, *_ = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)), float(loss)
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


@pytest.mark.parametrize("layer", ALL_LAYERS)
def test_every_layer_trains(layer):
    batch = make_batch()
    opts = GNNOptions(layer_type=layer, layers_mp=2, dim_inner=8,
                      layers_post_mp=1, dim_out=3, att_heads=2,
                      tfg_head=layer.startswith("Tfg-"))
    run_one_step(opts, batch)


@pytest.mark.parametrize("stage", ["stack", "skipsum", "skipconcat"])
@pytest.mark.parametrize("task", ["node", "link_pred", "graph"])
def test_stage_task_matrix(stage, task):
    batch = make_batch(task=task, d=8)
    opts = GNNOptions(layer_type="generalconv", stage_type=stage,
                      layers_pre_mp=1, layers_mp=2, layers_post_mp=2,
                      dim_inner=8, dim_out=3 if task != "link_pred"
                      else 2, task=task,
                      edge_decoding="concat" if task == "link_pred"
                      else "dot")
    run_one_step(opts, batch)


@pytest.mark.parametrize("opts_kw", [
    dict(agg="mean", self_msg="none"),
    dict(agg="max", self_msg="add"),
    dict(normalize_adj=True),
    dict(msg_direction="both", layer_type="generaledgeconv"),
    dict(dropout=0.3),
    dict(batchnorm=False, l2norm=False),
    dict(act="prelu"),
    dict(act="swish"),            # contrib-registered activation
    dict(stage_type="skipsum", skip_every=2, layers_mp=4),
])
def test_option_combinations(opts_kw):
    # make sure contrib registrations are loaded (swish)
    from graphgym_tpu.config import get_cfg
    get_cfg()
    batch = make_batch(d=8)
    base = dict(layer_type="generalconv", layers_mp=2, dim_inner=8,
                layers_post_mp=1, dim_out=3)
    base.update(opts_kw)
    run_one_step(GNNOptions(**base), batch)


class TestDesignGrids:
    """Round-5 port of the reference's design-space sweep definitions
    (reference run/grids/design/round1.txt:1-20, run/configs_gen.py:
    144-267, run/scripts/design/*.sh)."""

    def test_round1_grid_parses(self):
        from graphgym_tpu.exp.grid import load_search_file

        chunks = load_search_file("grids/design/round1.txt")
        assert len(chunks) == 5          # TU, PyG-node, 2x nx-node, nx-graph
        aliases = {a for c in chunks for _, a, _ in c}
        assert {"act", "bn", "drop", "agg", "l_mp", "l_pre", "l_post",
                "stage", "batch", "lr", "optim", "epoch"} <= aliases
        # nx chunks are runnable locally
        nx_chunks = [c for c in chunks
                     if any(v == ["nx"] for k, _, v in c
                            if k == "dataset.format")]
        assert len(nx_chunks) == 3

    def test_aliased_sampler_controlled_comparisons(self, tmp_path):
        import yaml
        from graphgym_tpu.exp.grid import (gen_grid_sample_aliased,
                                           load_alias_file)

        aliases = load_alias_file("sample/dimensions.txt")
        assert "act" in aliases and "l_mp" in aliases
        out = gen_grid_sample_aliased(
            "configs/design/design_v1.yaml", "grids/design/round1.txt",
            str(tmp_path), sample_num=5, aliases=["act"], seed=1)
        assert out, "sampler produced no configs"
        # every emitted group perturbs ONLY the sampled alias: configs
        # from one draw differ solely in gnn.act
        groups = {}
        for p in out:
            cfg = yaml.safe_load(open(p))
            key = (cfg["dataset"]["name"], cfg["gnn"]["layers_mp"],
                   cfg["gnn"]["dropout"], cfg["optim"]["base_lr"],
                   cfg["train"]["batch_size"])
            groups.setdefault(key, set()).add(cfg["gnn"]["act"])
        assert any(len(acts) == 3 for acts in groups.values()), (
            "expected a controlled comparison sweeping all 3 act values")

    def test_round1_point_budget_matches(self, tmp_path):
        import yaml
        from graphgym_tpu.config import get_cfg
        from graphgym_tpu.exp.budget import (dict_match_baseline,
                                             params_count)

        base = yaml.safe_load(open("configs/design/design_v1.yaml"))
        baseline = get_cfg()
        baseline.merge_from_dict(base)
        target = params_count(baseline)
        # a cheap grid point (l_mp=8, stack) must be budget-matched to
        # within the reference's tolerance by adjusting dim_inner
        cfg = get_cfg()
        point = dict(base)
        point["gnn"] = dict(point["gnn"], layers_mp=8,
                            stage_type="stack")
        cfg.merge_from_dict(point)
        dict_match_baseline(cfg, baseline)
        got = params_count(cfg)
        assert abs(got - target) / target < 0.15, (got, target)
