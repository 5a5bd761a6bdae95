"""Experiment entry point (reference run/main.py:21-63 + main_zd.py).

Usage:
    python -m graphgym_tpu.main --cfg configs/example.yaml --repeat 3 \
        [--mark_done] [gnn.dim_inner 64 ...]
"""

from __future__ import annotations

import argparse
import logging
import os
import random
import sys

import numpy as np


def parse_args(argv=None):
    """reference cmd_args.py:5-39."""
    parser = argparse.ArgumentParser(description="graphgym_tpu")
    parser.add_argument("--cfg", dest="cfg_file", required=True,
                        help="The configuration file path.")
    parser.add_argument("--repeat", type=int, default=1,
                        help="Repeated experiment times.")
    parser.add_argument("--mark_done", action="store_true",
                        help="Mark yaml as done after a job finishes.")
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER,
                        help="See graphgym_tpu/config.py for options")
    return parser.parse_args(argv)


def run_single(cfg, out_dir_parent: str, cfg_file: str):
    import jax

    # honor GRAPHGYM_PLATFORM=cpu (same contract as the tools): the
    # axon plugin force-overrides JAX_PLATFORMS, and only one process
    # can hold the TPU tunnel — CPU sweeps must not queue behind it
    plat = os.environ.get("GRAPHGYM_PLATFORM")
    if plat:
        jax.config.update("jax_platforms", plat)

    from graphgym_tpu.config import dump_cfg, update_out_dir
    from graphgym_tpu.data.loaders import create_dataset, create_loader
    from graphgym_tpu.nn.model import build_model
    from graphgym_tpu.train.logger import create_logger, setup_printing
    from graphgym_tpu.train.loop import Trainer

    from graphgym_tpu.parallel.multihost import initialize_multihost
    from graphgym_tpu.utils.device import auto_select_device

    random.seed(cfg.seed)
    np.random.seed(cfg.seed)
    update_out_dir(cfg, out_dir_parent, cfg_file)
    dump_cfg(cfg)
    setup_printing(cfg.print, cfg.out_dir)
    # comm backend + device pinning (reference auto_select_device,
    # utils/device.py:38; multi-host runtime has no reference
    # counterpart — SURVEY.md §5.8)
    initialize_multihost()
    auto_select_device(cfg)

    splits = create_dataset(cfg)
    loaders = create_loader(splits, cfg)
    model = build_model(cfg)
    loggers = create_logger(cfg, len(loaders))
    # custom training-mode hook (reference main.py:55-58 train_dict)
    if cfg.train.mode != "standard":
        from graphgym_tpu import register
        return register.train_dict[cfg.train.mode](
            loggers, loaders, model, cfg)
    trainer = Trainer(model, loaders, cfg,
                      rng=jax.random.PRNGKey(cfg.seed))
    logging.info("params: %d", cfg.params)
    return trainer.run(loggers)


def main(argv=None):
    from graphgym_tpu.config import assert_cfg, load_cfg
    from graphgym_tpu.exp.agg import agg_runs

    args = parse_args(argv)
    results = []
    for i in range(args.repeat):
        cfg = load_cfg(args.cfg_file, args.opts)
        cfg.seed = cfg.seed + i
        assert_cfg(cfg)
        out_dir_parent = cfg.out_dir
        results.append(run_single(cfg, out_dir_parent, args.cfg_file))
    # aggregate across seeds (reference main.py:60-61 agg_runs)
    try:
        from graphgym_tpu.config import get_parent_dir
        metric = cfg.metric_best if cfg.metric_best != "auto" \
            else ("accuracy" if "classification" in cfg.dataset.task_type
                  else "mae")
        agg_runs(get_parent_dir(out_dir_parent, args.cfg_file),
                 metric=metric, metric_agg=cfg.metric_agg,
                 tensorboard=cfg.tensorboard_agg)
    except Exception as e:  # aggregation is best-effort
        logging.warning("agg_runs failed: %s", e)
    if args.mark_done:
        os.rename(args.cfg_file, args.cfg_file + "_done")
    return results


if __name__ == "__main__":
    main()
