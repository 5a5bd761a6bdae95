"""Computational-budget matching (reference
graphgym/utils/comp_budget.py:10-79): adjust gnn.dim_inner so every
design variant has ~the same parameter count as a baseline config."""

from __future__ import annotations

import copy


def params_count(cfg) -> int:
    """Parameter count of the model cfg describes (builds + counts,
    reference comp_budget.py:10-17)."""
    import jax
    import numpy as np

    from graphgym_tpu.nn.model import build_model
    from graphgym_tpu.graphs.container import build_graph_batch

    rng = np.random.default_rng(0)
    n, e = 16, 40
    batch = build_graph_batch(
        rng.integers(0, n, size=e), rng.integers(0, n, size=e),
        rng.normal(size=(n, max(cfg.share.dim_in, 1))).astype(
            np.float32),
        node_label=rng.integers(0, max(cfg.share.dim_out, 2), size=n),
        node_label_index=np.arange(n),
        node_id_index=np.arange(0, n, 2),
        edge_feat=(rng.normal(size=(e, cfg.dataset.edge_dim)).astype(
            np.float32)
            if "edge" in cfg.gnn.layer_type
            or cfg.dataset.edge_encoder else None),
        edge_label=np.ones(4),
        edge_label_index=np.stack([np.arange(4), np.arange(4) + 1]),
        graph_label=np.zeros(1))
    model = build_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, False)
    return int(sum(np.prod(p.shape) for p in
                   jax.tree_util.tree_leaves(variables["params"])))


def match_computation(cfg, target_params: int, *, max_steps: int = 100
                      ) -> int:
    """Adjust cfg.gnn.dim_inner until params ~= target (reference
    match_computation, comp_budget.py:20-53: sqrt-scaling phase then
    +/-1 fine-tune)."""
    import math

    current = params_count(cfg)
    # sqrt scaling phase
    for _ in range(10):
        if current == 0:
            break
        ratio = target_params / current
        if 0.9 < ratio < 1.1:
            break
        new_dim = max(int(cfg.gnn.dim_inner * math.sqrt(ratio)), 1)
        if new_dim == cfg.gnn.dim_inner:
            break
        cfg.gnn.dim_inner = new_dim
        current = params_count(cfg)
    # fine-tune phase
    step = 1 if current < target_params else -1
    for _ in range(max_steps):
        nxt = cfg.gnn.dim_inner + step
        if nxt < 1:
            break
        old = cfg.gnn.dim_inner
        cfg.gnn.dim_inner = nxt
        new_params = params_count(cfg)
        if step > 0 and new_params > target_params:
            # keep whichever is closer (match_upper keeps the upper)
            if not cfg.model.match_upper and \
                    abs(current - target_params) <= \
                    abs(new_params - target_params):
                cfg.gnn.dim_inner = old
                new_params = current
            current = new_params
            break
        if step < 0 and new_params <= target_params:
            if cfg.model.match_upper and \
                    abs(current - target_params) <= \
                    abs(new_params - target_params):
                cfg.gnn.dim_inner = old
                new_params = current
            current = new_params
            break
        current = new_params
    return current


def dict_match_baseline(cfg, baseline_cfg) -> int:
    """Match cfg's budget to baseline_cfg's (reference
    dict_match_baseline, comp_budget.py:65-79)."""
    target = params_count(baseline_cfg)
    return match_computation(cfg, target)
