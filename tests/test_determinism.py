"""Determinism tests (SURVEY.md §5.2 equivalent for the TPU build):
identical seeds must produce bitwise-identical training trajectories,
and the packed/partitioned reductions must be run-to-run stable."""

import numpy as np

import jax
import jax.numpy as jnp

from graphgym_tpu.config import get_cfg
from graphgym_tpu.data.loaders import create_dataset, create_loader
from graphgym_tpu.nn.model import build_model
from graphgym_tpu.train.logger import Logger
from graphgym_tpu.train.loop import Trainer


def _losses(seed=0, epochs=2):
    cfg = get_cfg()
    cfg.merge_from_dict({
        "dataset": {"format": "nx", "name": "ws", "task": "node",
                    "transductive": False, "split": [0.8, 0.2],
                    "augment_label": "node_clustering_coefficient",
                    "augment_label_dims": 4},
        "gnn": {"layers_mp": 2, "dim_inner": 16,
                "layer_type": "gcnconv"},
        "train": {"batch_size": 4},
        "optim": {"scheduler": "none"}})
    cfg.seed = seed
    np.random.seed(seed)
    splits = create_dataset(cfg)
    loaders = create_loader([p[:4] for p in splits], cfg)
    tr = Trainer(build_model(cfg), loaders, cfg,
                 rng=jax.random.PRNGKey(seed))
    out = []
    for ep in range(epochs):
        lg = Logger("t")
        tr.train_epoch(lg, ep)
        out.append(lg._loss / lg._size_current)
    return out


def test_same_seed_bitwise_identical():
    a = _losses(seed=3)
    b = _losses(seed=3)
    assert a == b, (a, b)


def test_different_seed_differs():
    a = _losses(seed=3)
    b = _losses(seed=4)
    assert a != b


def test_packed_reduction_run_to_run_stable():
    from graphgym_tpu.ops.pallas import spmm_kernel as K

    rng = np.random.default_rng(0)
    n, e = 500, 4000
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = rng.integers(0, n, size=e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = rng.normal(size=(n, 128)).astype(np.float32)
    o1 = np.asarray(K.spmm_pallas(s, r, w, jnp.asarray(x), n,
                                  interpret=True))
    o2 = np.asarray(K.spmm_pallas(s, r, w, jnp.asarray(x), n,
                                  interpret=True))
    np.testing.assert_array_equal(o1, o2)
