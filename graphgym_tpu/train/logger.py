"""Metrics & logging (reference graphgym/logger.py:16-204).

Reproduces the reference's per-split Logger: accumulates
(true, pred_score, loss, lr, time) per batch; at epoch end computes the
task-appropriate metric set and appends one JSON line to
<out_dir>/<split>/stats.json (the format consumed by agg_runs).  Metric
definitions match sklearn semantics (binary: accuracy / precision /
recall / f1 / auc at thresh; multi: accuracy; regression: mae/mse/rmse)
implemented in numpy to avoid the dependency.
"""

from __future__ import annotations

import json
import logging
import math
import os
import sys
import time
from typing import Dict, List, Optional

import numpy as np


def setup_printing(print_dest: str = "both",
                   out_dir: Optional[str] = None) -> None:
    """Mirror reference setup_printing (logger.py:16-29)."""
    logging.root.handlers = []
    handlers = []
    if out_dir is not None:
        os.makedirs(out_dir, exist_ok=True)
        file_h = logging.FileHandler(os.path.join(out_dir, "logging.log"))
        if print_dest in ("file", "both"):
            handlers.append(file_h)
    if print_dest in ("stdout", "both"):
        handlers.append(logging.StreamHandler(sys.stdout))
    logging.basicConfig(level=logging.INFO, format="%(message)s",
                        handlers=handlers, force=True)


# ------------------------------------------------------------------ metrics

def _accuracy(true, pred_label):
    return float((true == pred_label).mean()) if len(true) else 0.0


def _prf(true, pred_label):
    tp = float(((true == 1) & (pred_label == 1)).sum())
    fp = float(((true == 0) & (pred_label == 1)).sum())
    fn = float(((true == 1) & (pred_label == 0)).sum())
    precision = tp / (tp + fp) if tp + fp > 0 else 0.0
    recall = tp / (tp + fn) if tp + fn > 0 else 0.0
    f1 = (2 * precision * recall / (precision + recall)
          if precision + recall > 0 else 0.0)
    return precision, recall, f1


def _auroc(true, score):
    """Rank-based AUC (equivalent to sklearn roc_auc_score)."""
    pos = score[true == 1]
    neg = score[true == 0]
    if len(pos) == 0 or len(neg) == 0:
        return 0.0
    order = np.argsort(np.concatenate([pos, neg]), kind="mergesort")
    ranks = np.empty(len(order), np.float64)
    ranks[order] = np.arange(1, len(order) + 1)
    # average ranks for ties
    allv = np.concatenate([pos, neg])
    sorted_v = allv[order]
    i = 0
    while i < len(sorted_v):
        j = i
        while j + 1 < len(sorted_v) and sorted_v[j + 1] == sorted_v[i]:
            j += 1
        if j > i:
            ranks[order[i:j + 1]] = ranks[order[i:j + 1]].mean()
        i = j + 1
    r_pos = ranks[:len(pos)].sum()
    return float((r_pos - len(pos) * (len(pos) + 1) / 2)
                 / (len(pos) * len(neg)))


class Logger:
    """Per-split metric accumulator (reference Logger,
    logger.py:34-176)."""

    def __init__(self, name: str = "train", *, task_type: str =
                 "classification_multi", out_dir: Optional[str] = None,
                 round_digits: int = 4, thresh: float = 0.5,
                 tensorboard: bool = False):
        self.name = name
        self.task_type = task_type
        self.out_dir = out_dir
        self.round = round_digits
        self.thresh = thresh
        self._tb = None
        if out_dir is not None:
            os.makedirs(os.path.join(out_dir, name), exist_ok=True)
            if tensorboard:
                try:
                    from tensorboardX import SummaryWriter
                    self._tb = SummaryWriter(
                        os.path.join(out_dir, name))
                except Exception:
                    logging.warning("tensorboardX unavailable")
        self.reset()

    def reset(self):
        self._iter = 0
        self._size_current = 0
        self._loss = 0.0
        self._lr = 0.0
        self._params = 0
        self._time_used = 0.0
        self._true: List[np.ndarray] = []
        self._pred: List[np.ndarray] = []

    def update_stats(self, true, pred, loss, lr, time_used, params=0):
        self._iter += 1
        true = np.asarray(true)
        pred = np.asarray(pred)
        # multi-label (true and score share a trailing class axis, e.g.
        # PPI [L, 121]): micro-average by flattening label/score pairs
        if true.ndim > 1 and pred.shape == true.shape:
            true = true.reshape(-1)
            pred = pred.reshape(-1)
        self._size_current += len(true)
        self._loss += float(loss) * len(true)
        self._lr = float(lr)
        self._params = params
        self._time_used += float(time_used)
        self._true.append(true)
        self._pred.append(pred)

    # ------------------------------------------------------------ epoch end
    def basic(self) -> Dict:
        return {
            "loss": round(self._loss / max(self._size_current, 1),
                          self.round),
            "lr": round(self._lr, self.round),
            "params": self._params,
            "time_iter": round(self._time_used / max(self._iter, 1),
                               self.round),
        }

    def classification_binary(self) -> Dict:
        true = np.concatenate(self._true)
        score = np.concatenate(self._pred)
        if score.ndim > 1 and score.shape[-1] > 1:
            # two-column scores (e.g. link_pred through the concat edge
            # decoder): argmax like the reference _get_pred_int
            # (logger.py:85-89); class-1 column serves as the auc score
            pred_label = score.argmax(-1).astype(true.dtype)
            score = score[..., 1]
        else:
            pred_label = (score > self.thresh).astype(true.dtype)
        p, r, f1 = _prf(true, pred_label)
        return {
            "accuracy": round(_accuracy(true, pred_label), self.round),
            "precision": round(p, self.round),
            "recall": round(r, self.round),
            "f1": round(f1, self.round),
            "auc": round(_auroc(true, score), self.round),
        }

    def classification_multi(self) -> Dict:
        true = np.concatenate(self._true)
        score = np.concatenate(self._pred)
        pred_label = score.argmax(-1) if score.ndim > 1 else score
        return {"accuracy": round(_accuracy(true, pred_label),
                                  self.round)}

    def regression(self) -> Dict:
        true = np.concatenate(self._true).astype(np.float64)
        pred = np.concatenate(self._pred).astype(np.float64)
        mse = float(((true - pred) ** 2).mean()) if len(true) else 0.0
        return {
            "mae": round(float(np.abs(true - pred).mean())
                         if len(true) else 0.0, self.round),
            "mse": round(mse, self.round),
            "rmse": round(math.sqrt(mse), self.round),
        }

    def write_epoch(self, cur_epoch: int) -> Dict:
        stats = self.basic()
        if self.task_type == "regression":
            stats.update(self.regression())
        elif self.task_type == "classification_binary":
            stats.update(self.classification_binary())
        else:
            stats.update(self.classification_multi())
        stats = {"epoch": cur_epoch, **stats}
        if self.out_dir is not None:
            path = os.path.join(self.out_dir, self.name, "stats.json")
            with open(path, "a") as f:
                f.write(json.dumps(stats) + "\n")
        if self._tb is not None:
            for k, v in stats.items():
                if isinstance(v, (int, float)) and k != "epoch":
                    self._tb.add_scalar(k, v, cur_epoch)
        logging.info("%s: %s", self.name, stats)
        self.reset()
        return stats

    def close(self):
        if self._tb is not None:
            self._tb.close()


def infer_task_type(cfg, num_labels: int) -> str:
    """reference infer_task (logger.py:180-196)."""
    if cfg.dataset.task_type == "classification":
        return ("classification_binary" if num_labels <= 2
                and cfg.dataset.task in ("link_pred", "edge")
                else "classification_multi")
    return cfg.dataset.task_type


def create_logger(cfg, num_splits: int) -> List[Logger]:
    names = ["train", "val", "test"][:num_splits]
    task_type = infer_task_type(cfg, cfg.share.dim_out)
    return [Logger(name, task_type=task_type, out_dir=cfg.out_dir,
                   round_digits=cfg.round, thresh=cfg.model.thresh,
                   tensorboard=cfg.tensorboard_each_run)
            for name in names]
