"""Tests for results aggregation (exp/agg.py: agg_runs / agg_batch /
name_to_dict) and the random grid sampler (exp/grid.gen_grid_sample) —
the reference QA path (SURVEY.md §2.24, §2.26)."""

import csv
import json
import os

import numpy as np

from graphgym_tpu.exp.agg import agg_batch, agg_runs, name_to_dict


def write_run(parent, seed, accs_val, accs_train=None):
    """Synthesize a results/<cfg>/<seed>/{train,val}/stats.json run."""
    accs_train = accs_train or accs_val
    for split, accs in (("train", accs_train), ("val", accs_val)):
        d = os.path.join(parent, str(seed), split)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "stats.json"), "w") as f:
            for ep, acc in enumerate(accs):
                f.write(json.dumps({"epoch": ep, "accuracy": acc,
                                    "loss": 1.0 - acc}) + "\n")


class TestAggRuns:
    def test_mean_std_and_best_epoch(self, tmp_path):
        run = str(tmp_path / "cfg")
        # seed 1 peaks at epoch 2, seed 2 at epoch 1
        write_run(run, 1, [0.1, 0.5, 0.9])
        write_run(run, 2, [0.2, 0.8, 0.6])
        res = agg_runs(run, metric="accuracy")
        assert "val" in res
        # best-val-epoch accuracies: 0.9 (seed 1) and 0.8 (seed 2)
        np.testing.assert_allclose(res["val"]["accuracy"], 0.85)
        np.testing.assert_allclose(res["val"]["accuracy_std"], 0.05)
        # per-epoch aggregate file aligns epochs across seeds
        lines = open(os.path.join(run, "agg", "val",
                                  "stats.json")).read().splitlines()
        assert len(lines) == 3
        ep0 = json.loads(lines[0])
        np.testing.assert_allclose(ep0["accuracy"], 0.15)

    def test_argmin_metric(self, tmp_path):
        run = str(tmp_path / "cfg")
        write_run(run, 1, [0.1, 0.5, 0.9])
        res = agg_runs(run, metric="loss", metric_agg="argmin")
        # lowest loss = highest accuracy epoch
        np.testing.assert_allclose(res["val"]["accuracy"], 0.9)

    def test_no_seed_dirs(self, tmp_path):
        assert agg_runs(str(tmp_path / "empty")) is None


class TestAggBatch:
    def test_csvs_with_grid_params(self, tmp_path):
        batch = tmp_path / "batch"
        write_run(str(batch / "base-l=2-d=64"), 1, [0.3, 0.7])
        write_run(str(batch / "base-l=3-d=64"), 1, [0.4, 0.6])
        agg_batch(str(batch))
        best = list(csv.DictReader(
            open(batch / "agg" / "val_best.csv")))
        assert len(best) == 2
        by_run = {r["run"]: r for r in best}
        assert by_run["base-l=2-d=64"]["l"] == "2"
        np.testing.assert_allclose(
            float(by_run["base-l=2-d=64"]["accuracy"]), 0.7)
        # final-epoch CSV exists with same rows
        final = list(csv.DictReader(open(batch / "agg" / "val.csv")))
        assert len(final) == 2

    def test_name_to_dict(self):
        assert name_to_dict("base-l=2-agg=mean") == \
            {"l": "2", "agg": "mean"}


class TestGridSample:
    def test_gen_grid_sample_perturbs_one_dim(self, tmp_path):
        import yaml

        from graphgym_tpu.exp.grid import gen_grid_sample

        base = tmp_path / "base.yaml"
        base.write_text("gnn:\n  dim_inner: 16\n")
        grid = tmp_path / "grid.txt"
        grid.write_text("gnn.layers_mp l [1,2,3]\n"
                        "gnn.act a ['relu','prelu']\n")
        out = gen_grid_sample(str(base), str(grid),
                              str(tmp_path / "cfgs"), sample_num=4,
                              seed=0)
        assert out, "no configs written"
        for path in out:
            cfg = yaml.safe_load(open(path))
            assert cfg["gnn"]["layers_mp"] in (1, 2, 3)
            assert cfg["gnn"]["act"] in ("relu", "prelu")
            assert cfg["gnn"]["dim_inner"] == 16
        # full sweep of the perturbed dimension is present for at
        # least one fixed assignment of the other dims
        names = [os.path.basename(p) for p in out]
        assert any("l=1" in n for n in names)
        assert any("l=3" in n for n in names)
