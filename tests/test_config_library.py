"""The shipped config library (configs/, tools/gen_configs.py) and the
bare-checkout synthetic fallback: every YAML must merge + validate, and
load_nx must regenerate a known corpus when no pickle exists anywhere
(reference ships pickles, run/datasets/*.pkl; we can rebuild them)."""

import glob
import os

import pytest

from graphgym_tpu.config import assert_cfg, get_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CONFIGS = sorted(glob.glob(os.path.join(REPO, "configs", "*.yaml")))


def test_library_is_complete():
    # 12 models x 8 datasets (reference config/<model>_tf trees)
    assert len(CONFIGS) == 96


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_merges_and_validates(path):
    cfg = get_cfg()
    cfg.merge_from_file(path)
    assert_cfg(cfg)
    assert cfg.gnn.layer_type.startswith("Tfg-")
    assert cfg.optim.max_epoch == 1000


def test_load_nx_regenerates_missing_corpus(tmp_path, monkeypatch):
    import graphgym_tpu.data.loaders as L

    # keep the test fast: tiny corpus instead of the real 256
    import graphgym_tpu.data.synthetic as syn
    real = syn.generate_syn_graphs
    monkeypatch.setattr(
        syn, "generate_syn_graphs",
        lambda kind, num_graphs, n: real(kind=kind, num_graphs=4, n=16))
    # an isolated dir and no search fallback
    monkeypatch.setattr(L, "_SEARCH_DIRS", [str(tmp_path)])
    graphs = L.load_nx("ws", str(tmp_path))
    assert len(graphs) == 4
    assert all(g.num_nodes == 16 for g in graphs)
    # cached for the next load, and reloadable (HostGraph passthrough)
    assert os.path.exists(tmp_path / "ws.pkl")
    again = L.load_nx("ws", str(tmp_path))
    assert len(again) == 4


def test_unknown_nx_dataset_still_errors(tmp_path, monkeypatch):
    import graphgym_tpu.data.loaders as L

    monkeypatch.setattr(L, "_SEARCH_DIRS", [str(tmp_path)])
    with pytest.raises(FileNotFoundError):
        L.load_nx("no_such_corpus", str(tmp_path))
