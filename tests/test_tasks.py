"""End-to-end tests for the non-node task types: link prediction (edge
head + negative sampling), graph classification (pooling head), and the
ID-GNN link-prediction path via the 'edge' transform (reference
run/grids/IDGNN/link.txt workload)."""

import numpy as np
import pytest

import jax

from graphgym_tpu.config import get_cfg
from graphgym_tpu.data.loaders import create_dataset, create_loader
from graphgym_tpu.nn.model import build_model
from graphgym_tpu.train.logger import Logger
from graphgym_tpu.train.loop import Trainer


def train_few(cfg, epochs=3, subset=6):
    np.random.seed(cfg.seed)
    splits = create_dataset(cfg)
    splits = [p[:subset] for p in splits]
    loaders = create_loader(splits, cfg)
    model = build_model(cfg)
    tr = Trainer(model, loaders, cfg, rng=jax.random.PRNGKey(0))
    lg = Logger("train")
    losses = []
    for ep in range(epochs):
        tr.train_epoch(lg, ep)
        losses.append(lg._loss / max(lg._size_current, 1))
        lg.reset()
    return tr, losses


class TestLinkPred:
    def test_link_pred_dot_decoder(self):
        cfg = get_cfg()
        cfg.merge_from_dict({
            "dataset": {"format": "nx", "name": "ws",
                        "task": "link_pred",
                        "task_type": "classification",
                        "transductive": True, "split": [0.8, 0.2]},
            "gnn": {"layers_mp": 2, "dim_inner": 16,
                    "layer_type": "gcnconv"},
            "model": {"edge_decoding": "dot"},
            "train": {"batch_size": 4},
            "optim": {"scheduler": "none"}})
        tr, losses = train_few(cfg)
        assert losses[-1] < losses[0]
        acc = tr.eval_epoch(None, 1)
        assert 0.0 <= acc <= 1.0

    @pytest.mark.parametrize("decoding", ["cosine_similarity", "concat"])
    def test_link_pred_other_decoders(self, decoding):
        cfg = get_cfg()
        cfg.merge_from_dict({
            "dataset": {"format": "nx", "name": "ws",
                        "task": "link_pred",
                        "transductive": True, "split": [0.8, 0.2]},
            "gnn": {"layers_mp": 1, "dim_inner": 8,
                    "layer_type": "gcnconv"},
            "model": {"edge_decoding": decoding},
            "train": {"batch_size": 2},
            "optim": {"scheduler": "none"}})
        if decoding == "concat":
            cfg.share.dim_out = 2
        tr, losses = train_few(cfg, epochs=2, subset=2)
        assert np.isfinite(losses[-1])


class TestGraphTask:
    @pytest.mark.parametrize("pooling", ["add", "mean", "max"])
    def test_graph_classification(self, pooling):
        cfg = get_cfg()
        cfg.merge_from_dict({
            "dataset": {"format": "nx", "name": "ws", "task": "graph",
                        "transductive": False, "split": [0.8, 0.2],
                        "augment_label": "graph_clustering_coefficient",
                        "augment_label_dims": 3},
            "gnn": {"layers_mp": 2, "dim_inner": 16,
                    "layer_type": "gcnconv"},
            "model": {"graph_pooling": pooling},
            "train": {"batch_size": 4},
            "optim": {"scheduler": "none"}})
        tr, losses = train_few(cfg, epochs=3, subset=8)
        assert np.isfinite(losses[-1])
        assert losses[-1] <= losses[0] * 1.5

    def test_graph_task_ego_pools_centers_only(self):
        cfg = get_cfg()
        cfg.merge_from_dict({
            "dataset": {"format": "nx", "name": "ws", "task": "graph",
                        "transductive": False, "split": [0.8, 0.2],
                        "augment_label": "graph_clustering_coefficient",
                        "augment_label_dims": 3, "transform": "ego"},
            "gnn": {"layers_mp": 2, "dim_inner": 8,
                    "layer_type": "gcnidconv"},
            "train": {"batch_size": 2},
            "optim": {"scheduler": "none"}})
        tr, losses = train_few(cfg, epochs=2, subset=2)
        assert np.isfinite(losses[-1])


class TestEdgeTransform:
    def test_edge_nets_link_pred_as_node_task(self):
        """The ID-GNN link-prediction recipe: transform: edge turns
        link_pred into conditional node classification (reference
        transform.py:41-65, configs run/configs/IDGNN/edge.yaml)."""
        cfg = get_cfg()
        cfg.merge_from_dict({
            "dataset": {"format": "nx", "name": "ws",
                        "task": "link_pred",
                        "transductive": True, "split": [0.8, 0.2],
                        "transform": "edge"},
            "gnn": {"layers_mp": 2, "dim_inner": 8,
                    "layer_type": "gcnidconv"},
            "train": {"batch_size": 1},
            "optim": {"scheduler": "none"}})
        tr, losses = train_few(cfg, epochs=2, subset=1)
        # after the transform the task must be node classification
        assert cfg.dataset.task == "node"
        assert np.isfinite(losses[-1])


class TestMultiLabelAndMultiTarget:
    """PPI-style multi-label node classification and QM7b-style
    multi-target graph regression must survive the FULL pipeline
    (loader -> collate -> dims -> loss -> metrics), not just parsing."""

    def _write_ppi(self, tmp_path, n_graphs=3, n=8, classes=5):
        import json
        rng = np.random.default_rng(0)
        base = tmp_path / "PPI" / "raw"
        base.mkdir(parents=True)
        links, gids = [], []
        off = 0
        for gi in range(n_graphs):
            for _ in range(2 * n):
                a, b = rng.integers(0, n, 2)
                if a != b:
                    links.append({"source": int(a + off),
                                  "target": int(b + off)})
            gids += [gi] * n
            off += n
        with open(base / "train_graph.json", "w") as f:
            json.dump({"links": links}, f)
        np.save(base / "train_feats.npy",
                rng.normal(size=(off, 4)).astype(np.float32))
        np.save(base / "train_labels.npy",
                (rng.random((off, classes)) > 0.5).astype(np.int64))
        np.save(base / "train_graph_id.npy", np.asarray(gids))

    def test_ppi_multilabel_trains(self, tmp_path):
        self._write_ppi(tmp_path)
        cfg = get_cfg()
        cfg.merge_from_dict({
            "dataset": {"format": "PyG", "name": "PPI",
                        "dir": str(tmp_path), "task": "node",
                        "task_type": "classification_binary",
                        "transductive": False, "split": [0.67, 0.33]},
            "gnn": {"layers_mp": 1, "dim_inner": 8,
                    "layer_type": "gcnconv"},
            "train": {"batch_size": 2},
            "optim": {"scheduler": "none"}})
        tr, losses = train_few(cfg, epochs=3, subset=4)
        assert cfg.share.dim_out == 5
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
        acc = tr.eval_epoch(None, 1)
        assert 0.0 <= acc <= 1.0

    def test_qm7b_multitarget_regression_trains(self, tmp_path):
        from scipy.io import savemat
        rng = np.random.default_rng(0)
        X = np.zeros((4, 6, 6), np.float32)
        for i in range(4):
            m = rng.random((6, 6)).astype(np.float32)
            X[i] = (m + m.T) * (rng.random((6, 6)) > 0.4)
        T = rng.random((4, 14)).astype(np.float32)
        savemat(tmp_path / "qm7b.mat", {"X": X, "T": T})
        cfg = get_cfg()
        cfg.merge_from_dict({
            "dataset": {"format": "PyG", "name": "QM7b",
                        "dir": str(tmp_path), "task": "graph",
                        "task_type": "regression",
                        "split": [0.5, 0.5]},
            "model": {"loss_fun": "mse"},
            "gnn": {"layers_mp": 1, "dim_inner": 8,
                    "layer_type": "gcnconv"},
            "train": {"batch_size": 2},
            "optim": {"scheduler": "none"}})
        tr, losses = train_few(cfg, epochs=3, subset=4)
        assert cfg.share.dim_out == 14
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0], losses
