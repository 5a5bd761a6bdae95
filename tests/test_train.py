"""End-to-end training tests: loss decreases, metrics/stats files,
checkpoint resume (SURVEY.md §4 (c))."""

import json
import os

import numpy as np
import pytest

from graphgym_tpu.config import get_cfg
from graphgym_tpu.train.logger import Logger, _auroc
from graphgym_tpu.train.loss import LossOptions, compute_loss, kernel_l2

import jax
import jax.numpy as jnp


class TestLoss:
    def test_masked_ce_matches_manual(self):
        logits = jnp.asarray(np.array([[2.0, 0.0], [0.0, 3.0],
                                       [9.0, 9.0]], np.float32))
        true = jnp.asarray(np.array([0, 1, 0]))
        mask = jnp.asarray(np.array([True, True, False]))
        loss, score = compute_loss(logits, true, mask, LossOptions())
        import math
        l0 = -math.log(math.exp(2) / (math.exp(2) + 1))
        l1 = -math.log(math.exp(3) / (math.exp(3) + 1))
        np.testing.assert_allclose(float(loss), (l0 + l1) / 2, rtol=1e-5)

    def test_binary_bce(self):
        logits = jnp.asarray(np.array([0.5, -1.0], np.float32))
        true = jnp.asarray(np.array([1, 0]))
        loss, score = compute_loss(logits, true, None, LossOptions())
        import math
        ref = (math.log(1 + math.exp(-0.5)) + math.log(1 + math.exp(-1))) / 2
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(score),
                                   1 / (1 + np.exp(-np.array([0.5, -1]))),
                                   rtol=1e-5)

    def test_mse(self):
        pred = jnp.asarray(np.array([1.0, 2.0], np.float32))
        true = jnp.asarray(np.array([0.0, 0.0], np.float32))
        loss, _ = compute_loss(pred, true, None,
                               LossOptions(loss_fun="mse"))
        np.testing.assert_allclose(float(loss), 2.5, rtol=1e-6)

    def test_kernel_l2_only_kernels(self):
        params = {"layer": {"kernel": jnp.ones((2, 2)),
                            "bias": jnp.ones((2,)) * 100}}
        reg = kernel_l2(params, 5e-4)
        np.testing.assert_allclose(float(reg), 5e-4 * 4 / 2, rtol=1e-6)


class TestLogger:
    def test_auroc_matches_known(self):
        true = np.array([0, 0, 1, 1])
        score = np.array([0.1, 0.4, 0.35, 0.8])
        np.testing.assert_allclose(_auroc(true, score), 0.75)

    def test_stats_json_lines(self, tmp_path):
        lg = Logger("val", task_type="classification_multi",
                    out_dir=str(tmp_path))
        lg.update_stats(np.array([0, 1, 1]),
                        np.array([[0.9, 0.1], [0.2, 0.8], [0.6, 0.4]]),
                        loss=0.5, lr=0.01, time_used=0.1)
        stats = lg.write_epoch(0)
        assert stats["accuracy"] == round(2 / 3, 4)
        lines = open(tmp_path / "val" / "stats.json").read().splitlines()
        assert len(lines) == 1
        assert json.loads(lines[0])["epoch"] == 0


@pytest.fixture(scope="module")
def tiny_cfg():
    cfg = get_cfg()
    cfg.merge_from_dict({
        "dataset": {"format": "nx", "name": "ws", "task": "node",
                    "transductive": False, "split": [0.8, 0.2],
                    "augment_label": "node_clustering_coefficient",
                    "augment_label_dims": 4},
        "gnn": {"layers_mp": 2, "dim_inner": 32, "layers_pre_mp": 1,
                "layers_post_mp": 1, "layer_type": "gcnconv"},
        "train": {"batch_size": 16, "eval_period": 2, "ckpt_period": 4},
        "optim": {"max_epoch": 4, "scheduler": "none"}})
    return cfg


class TestEndToEnd:
    def test_loss_decreases_and_resume(self, tiny_cfg, tmp_path):
        import jax

        from graphgym_tpu.data.loaders import create_dataset, create_loader
        from graphgym_tpu.nn.model import build_model
        from graphgym_tpu.train.loop import Trainer
        from graphgym_tpu.train import checkpoint as ck

        cfg = tiny_cfg
        cfg.out_dir = str(tmp_path)
        # use a subset for speed
        splits = create_dataset(cfg)
        splits = [part[:8] for part in splits]
        loaders = create_loader(splits, cfg)
        model = build_model(cfg)
        trainer = Trainer(model, loaders, cfg)

        losses = []
        for epoch in range(4):
            lg = Logger("train", task_type="classification_multi")
            trainer.train_epoch(lg, epoch)
            losses.append(lg._loss / max(lg._size_current, 1))
        assert losses[-1] < losses[0], losses
        acc = trainer.eval_epoch(None, 1)
        assert 0.0 <= acc <= 1.0

        # checkpoint round-trip
        ck.save_ckpt(trainer.state, cfg.out_dir, 3)
        state2, start = ck.load_ckpt(trainer.state, cfg.out_dir)
        assert start == 4
        p1 = jax.tree_util.tree_leaves(trainer.state.params)
        p2 = jax.tree_util.tree_leaves(state2.params)
        for a, b in zip(p1, p2):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        ck.clean_ckpt(cfg.out_dir)
        assert ck.list_ckpt_epochs(cfg.out_dir) == [3]


class TestMixedPrecision:
    def test_bf16_training_runs_and_learns(self, tiny_cfg, tmp_path):
        """cfg.tpu.dtype=bfloat16: forward/backward in bf16, master
        params stay f32, loss decreases and stays finite."""
        import jax

        from graphgym_tpu.data.loaders import create_dataset, create_loader
        from graphgym_tpu.nn.model import build_model
        from graphgym_tpu.train.loop import Trainer

        cfg = tiny_cfg
        cfg.out_dir = str(tmp_path)
        cfg.tpu.dtype = "bfloat16"
        try:
            splits = create_dataset(cfg)
            splits = [part[:8] for part in splits]
            loaders = create_loader(splits, cfg)
            trainer = Trainer(build_model(cfg), loaders, cfg)
            losses = []
            for epoch in range(4):
                lg = Logger("train", task_type="classification_multi")
                trainer.train_epoch(lg, epoch)
                losses.append(lg._loss / max(lg._size_current, 1))
            assert np.isfinite(losses).all(), losses
            assert losses[-1] < losses[0], losses
            # master params stay f32
            for leaf in jax.tree_util.tree_leaves(trainer.state.params):
                if jnp.issubdtype(leaf.dtype, jnp.floating):
                    assert leaf.dtype == jnp.float32
            acc = trainer.eval_epoch(None, 1)
            assert 0.0 <= acc <= 1.0
        finally:
            cfg.tpu.dtype = "float32"

    def test_bf16_forward_close_to_f32(self, tiny_cfg):
        """One eval forward in bf16 tracks the f32 forward."""
        from graphgym_tpu.data.loaders import create_dataset, create_loader
        from graphgym_tpu.nn.model import build_model
        from graphgym_tpu.train.loop import (TrainState, make_eval_step)
        import optax

        cfg = tiny_cfg
        splits = create_dataset(cfg)
        splits = [part[:8] for part in splits]
        loaders = create_loader(splits, cfg)
        model = build_model(cfg)
        batch = loaders[0].batches(0)[0]
        variables = model.init(jax.random.PRNGKey(0), batch, False)
        state = TrainState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=(), step=jnp.zeros((), jnp.int32))
        opts = LossOptions()
        _, s32, _, m = make_eval_step(model, opts)(state, batch)
        _, s16, _, _ = make_eval_step(model, opts,
                                      compute_dtype=jnp.bfloat16)(
            state, batch)
        valid = np.asarray(m).astype(bool)
        diff = np.abs(np.asarray(s32) - np.asarray(s16))[valid].max()
        assert diff < 5e-2, diff


def test_logger_binary_two_column_scores(tmp_path):
    """link_pred through the concat edge decoder yields [L, 2] logits;
    the binary logger must argmax like the reference _get_pred_int
    (logger.py:85-89) instead of broadcasting against 1-D labels."""
    from graphgym_tpu.train.logger import Logger

    lg = Logger("val", task_type="classification_binary",
                out_dir=str(tmp_path))
    true = np.array([0, 1, 1, 0])
    score = np.array([[2.0, -1.0], [0.0, 3.0], [1.0, 0.5], [0.2, 0.9]])
    lg.update_stats(true=true, pred=score, loss=0.1, lr=0.01,
                    time_used=0.0, params=1)
    stats = lg.write_epoch(0)
    # argmax labels = [0, 1, 0, 1] -> acc 0.5; auc uses column 1
    assert stats["accuracy"] == 0.5
    assert 0.0 <= stats["auc"] <= 1.0
