"""Optimizer & LR scheduler construction (reference
graphgym/optimizer.py:9-49) on optax.

torch-Adam semantics: weight_decay adds wd * p to the gradient *before*
the moment updates, so the chain is add_decayed_weights -> scale_by_adam
-> scale by -lr.  Schedulers operate per-epoch (the reference steps the
scheduler once per epoch): none / steps (MultiStepLR) / cos
(CosineAnnealingLR to eta_min=0).
"""

from __future__ import annotations

from typing import Callable

import optax

from graphgym_tpu import register


def make_lr_schedule(optim_cfg, steps_per_epoch: int) -> Callable:
    base = optim_cfg.base_lr
    if optim_cfg.scheduler in register.scheduler_dict:
        return register.scheduler_dict[optim_cfg.scheduler](
            optim_cfg, steps_per_epoch)
    if optim_cfg.scheduler == "none":
        return lambda step: base
    if optim_cfg.scheduler == "steps":
        bounds = [int(e) * steps_per_epoch for e in optim_cfg.steps]
        decay = optim_cfg.lr_decay
        return optax.piecewise_constant_schedule(
            base, {b: decay for b in bounds})
    if optim_cfg.scheduler == "cos":
        total = optim_cfg.max_epoch * steps_per_epoch
        return optax.cosine_decay_schedule(base, max(total, 1))
    raise ValueError(f"Scheduler {optim_cfg.scheduler} not supported")


def create_optimizer(optim_cfg, steps_per_epoch: int,
                     use_loss_l2: bool = False
                     ) -> optax.GradientTransformation:
    """use_loss_l2=True (Tfg path) disables optimizer weight decay —
    regularization lives in the loss instead (main_zd.py:311)."""
    schedule = make_lr_schedule(optim_cfg, steps_per_epoch)
    wd = 0.0 if use_loss_l2 else optim_cfg.weight_decay
    if optim_cfg.optimizer in register.optimizer_dict:
        return register.optimizer_dict[optim_cfg.optimizer](
            optim_cfg, schedule)
    parts = []
    if wd > 0:
        parts.append(optax.add_decayed_weights(wd))
    if optim_cfg.optimizer == "adam":
        parts.append(optax.scale_by_adam())
    elif optim_cfg.optimizer == "sgd":
        if optim_cfg.momentum > 0:
            parts.append(optax.trace(decay=optim_cfg.momentum))
    else:
        raise ValueError(
            f"Optimizer {optim_cfg.optimizer} not supported")
    parts.append(optax.scale_by_learning_rate(schedule))
    return optax.chain(*parts)
