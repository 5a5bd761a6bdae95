"""Pallas-vs-XLA training-path equivalence (interpret mode on CPU;
the compiled path is exercised on TPU by bench.py and tools/)."""

import numpy as np
import pytest

import jax

from graphgym_tpu.config import get_cfg
from graphgym_tpu.data.loaders import create_dataset, create_loader
from graphgym_tpu.nn.model import build_model
from graphgym_tpu.train.logger import Logger
from graphgym_tpu.train.loop import Trainer


def run(impl, layer, epochs=2, batchnorm=True):
    cfg = get_cfg()
    cfg.merge_from_dict({
        "dataset": {"format": "nx", "name": "ws", "task": "node",
                    "transductive": False, "split": [0.8, 0.2],
                    "augment_label": "node_clustering_coefficient",
                    "augment_label_dims": 4,
                    "transform": ("ego" if "id" in layer else "none")},
        "gnn": {"layers_mp": 2, "dim_inner": 16, "layer_type": layer,
                "batchnorm": batchnorm},
        "train": {"batch_size": 8},
        "tpu": {"spmm_impl": impl},
        "optim": {"scheduler": "none"}})
    np.random.seed(0)
    splits = create_dataset(cfg)
    splits = [p[:6] for p in splits]
    loaders = create_loader(splits, cfg)
    model = build_model(cfg)
    tr = Trainer(model, loaders, cfg, rng=jax.random.PRNGKey(0))
    lg = Logger("train")
    for ep in range(epochs):
        tr.train_epoch(lg, ep)
    return lg._loss / lg._size_current, tr.eval_epoch(None, 1)


@pytest.mark.parametrize("layer", ["gcnconv", "Tfg-idgcn", "ginconv",
                                   "Tfg-idsage"])
def test_pallas_path_matches_xla(layer):
    loss_x, acc_x = run("xla", layer)
    loss_p, acc_p = run("pallas", layer)
    assert abs(loss_x - loss_p) < 2e-3, (layer, loss_x, loss_p)
    assert abs(acc_x - acc_p) < 5e-3, (layer, acc_x, acc_p)


@pytest.mark.parametrize("layer", ["gatconv", "Tfg-gatconv",
                                   "gatidconv"])
def test_pallas_attention_matches_xla(layer):
    """GAT packed path. BatchNorm disabled: with near-constant input
    features some BN dims have ~0 variance and amplify legitimate
    1e-6 kernel-vs-XLA float noise ~300x per layer, so train-mode
    trajectories diverge chaotically while eval outputs match to
    3e-6 (verified in layer tests)."""
    loss_x, acc_x = run("xla", layer, batchnorm=False)
    loss_p, acc_p = run("pallas", layer, batchnorm=False)
    assert abs(loss_x - loss_p) < 2e-3, (layer, loss_x, loss_p)
    assert abs(acc_x - acc_p) < 5e-3, (layer, acc_x, acc_p)


def test_packs_present_only_when_requested():
    cfg = get_cfg()
    cfg.merge_from_dict({
        "dataset": {"format": "nx", "name": "ws", "task": "node",
                    "transductive": False, "split": [0.8, 0.2],
                    "augment_label": "node_clustering_coefficient",
                    "augment_label_dims": 4},
        "gnn": {"layer_type": "gcnconv"},
        "tpu": {"spmm_impl": "xla"}})
    splits = create_dataset(cfg)
    loaders = create_loader([p[:2] for p in splits], cfg)
    assert loaders[0].batches(0)[0].packs is None
    cfg.tpu.spmm_impl = "pallas"
    loaders = create_loader([p[:2] for p in splits], cfg)
    b = loaders[0].batches(0)[0]
    assert b.packs is not None and "gcn" in b.packs


def test_att_dropout_trains_on_packed_path(monkeypatch):
    """att_dropout > 0 no longer fences off the packed attention path:
    the coefficient-dropout mask rides segment_matmul_headed_vjp
    (reference attconv.py att dropout semantics).  Guard: the packed
    path must actually be taken (packed_attention returns non-None)."""
    import graphgym_tpu.nn.layers as L

    calls = {"packed": 0}
    orig = L.packed_attention

    def spy(*a, **k):
        out = orig(*a, **k)
        if out is not None:
            calls["packed"] += 1
        return out

    monkeypatch.setattr(L, "packed_attention", spy)

    cfg = get_cfg()
    cfg.merge_from_dict({
        "dataset": {"format": "nx", "name": "ws", "task": "node",
                    "transductive": False, "split": [0.8, 0.2],
                    "augment_label": "node_clustering_coefficient",
                    "augment_label_dims": 4, "transform": "none"},
        "gnn": {"layers_mp": 2, "dim_inner": 16,
                "layer_type": "gatconv", "att_dropout": 0.3,
                "batchnorm": False},
        "train": {"batch_size": 8},
        "tpu": {"spmm_impl": "pallas"},
        "optim": {"scheduler": "none"}})
    np.random.seed(0)
    splits = create_dataset(cfg)
    splits = [p[:4] for p in splits]
    loaders = create_loader(splits, cfg)
    tr = Trainer(build_model(cfg), loaders, cfg,
                 rng=jax.random.PRNGKey(0))
    lg = Logger("train")
    tr.train_epoch(lg, 0)
    loss = lg._loss / lg._size_current
    assert np.isfinite(loss)
    assert calls["packed"] > 0, "packed attention path was not used"
