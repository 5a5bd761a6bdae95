"""Checkpointing (reference graphgym/checkpoint.py:8-62).

<out_dir>/ckpt/<epoch>.ckpt files holding the full TrainState
(params, batch_stats, optimizer state, step) via flax serialization;
load latest-or-given epoch; clean keeps only the last.
"""

from __future__ import annotations

import os
from typing import Optional

from flax import serialization


def _ckpt_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "ckpt")


def _ckpt_path(out_dir: str, epoch: int) -> str:
    return os.path.join(_ckpt_dir(out_dir), f"{epoch}.ckpt")


def list_ckpt_epochs(out_dir: str):
    d = _ckpt_dir(out_dir)
    if not os.path.isdir(d):
        return []
    return sorted(int(f.split(".")[0]) for f in os.listdir(d)
                  if f.endswith(".ckpt"))


def _as_dict(state):
    return {"params": state.params, "batch_stats": state.batch_stats,
            "opt_state": state.opt_state, "step": state.step}


def save_ckpt(state, out_dir: str, epoch: int) -> None:
    os.makedirs(_ckpt_dir(out_dir), exist_ok=True)
    with open(_ckpt_path(out_dir, epoch), "wb") as f:
        f.write(serialization.to_bytes(_as_dict(state)))


def load_ckpt(state_template, out_dir: str, epoch: int = -1):
    """Returns (state, start_epoch); (template, 0) when nothing to
    resume (reference load_ckpt, checkpoint.py:25-40)."""
    import dataclasses

    epochs = list_ckpt_epochs(out_dir)
    if not epochs:
        return state_template, 0
    if epoch == -1 or epoch not in epochs:
        epoch = epochs[-1]
    with open(_ckpt_path(out_dir, epoch), "rb") as f:
        restored = serialization.from_bytes(_as_dict(state_template),
                                            f.read())
    state = dataclasses.replace(state_template, **restored)
    return state, epoch + 1


def clean_ckpt(out_dir: str) -> None:
    """Keep only the latest checkpoint (checkpoint.py:56-62)."""
    epochs = list_ckpt_epochs(out_dir)
    for e in epochs[:-1]:
        os.remove(_ckpt_path(out_dir, e))


def is_eval_epoch(cur_epoch: int, eval_period: int, max_epoch: int) -> bool:
    """reference utils/epoch.py:4-10."""
    return (cur_epoch % eval_period == 0 or cur_epoch == max_epoch - 1
            or cur_epoch == 0)


def is_ckpt_epoch(cur_epoch: int, ckpt_period: int, max_epoch: int) -> bool:
    """reference utils/epoch.py:13-18."""
    return cur_epoch % ckpt_period == 0 or cur_epoch == max_epoch - 1
