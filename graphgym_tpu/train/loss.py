"""Loss computation (reference graphgym/loss.py:11-67).

All losses are masked: padded prediction slots contribute zero and the
mean divides by the real count.  Covers the torch path (cross_entropy
multi via log_softmax+nll / binary via BCE-with-logits, mse;
loss.py:36-47) and the Tfg path (masked softmax CE + 5e-4 * sum of
l2_loss over 'kernel' variables; loss.py:53-67).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LossOptions:
    loss_fun: str = "cross_entropy"   # cross_entropy | mse
    size_average: str = "mean"        # mean | sum
    l2_kernel: float = 0.0            # Tfg path: 5e-4 on kernels
    thresh: float = 0.5


def compute_loss(pred: jnp.ndarray, true: jnp.ndarray,
                 mask: Optional[jnp.ndarray], opts: LossOptions
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (loss, normalized prediction score).

    pred: [L] or [L, C] logits; true: [L] int labels (or float for
    mse/binary); mask: [L] bool over supervised slots.
    """
    # loss/softmax always in f32 (mixed-precision heads emit bf16)
    pred = pred.astype(jnp.float32)
    if pred.ndim > 1 and pred.shape[-1] == 1:
        pred = pred.squeeze(-1)
    if true.ndim > 1 and true.shape[-1] == 1:
        true = true.squeeze(-1)
    if mask is None:
        mask = jnp.ones(pred.shape[:1], bool)
    count = jnp.maximum(jnp.sum(mask.astype(pred.dtype)), 1.0)

    # custom loss hook (reference loss.py:31-34): first registered
    # function returning non-None wins
    from graphgym_tpu import register
    for func in register.loss_dict.values():
        value = func(pred, true, mask, opts)
        if value is not None:
            return value

    if opts.loss_fun == "cross_entropy":
        # multi-class CE only for integer class labels; same-shape
        # pred/true (binary or multi-label, e.g. PPI [L, 121]) goes to
        # BCE-with-logits — reference loss.py:37-44 branches identically
        if pred.ndim > 1 and true.ndim == 1:
            logp = jax.nn.log_softmax(pred, axis=-1)
            nll = -jnp.take_along_axis(
                logp, true.astype(jnp.int32)[:, None], axis=-1)[:, 0]
            nll = jnp.where(mask, nll, 0.0)
            loss = jnp.sum(nll)
            score = jnp.exp(logp)
        else:
            t = true.astype(pred.dtype)
            per = jnp.maximum(pred, 0) - pred * t + \
                jnp.log1p(jnp.exp(-jnp.abs(pred)))
            if per.ndim > 1:          # multi-label: mean over classes
                per = jnp.mean(per, axis=-1)
            per = jnp.where(mask, per, 0.0)
            loss = jnp.sum(per)
            score = jax.nn.sigmoid(pred)
    elif opts.loss_fun == "mse":
        t = true.astype(pred.dtype)
        per = (pred - t) ** 2
        if per.ndim > 1:
            per = jnp.mean(per, axis=-1)
        per = jnp.where(mask, per, 0.0)
        loss = jnp.sum(per)
        score = pred
    else:
        raise ValueError(f"Loss func {opts.loss_fun} not supported")

    if opts.size_average == "mean":
        loss = loss / count
    return loss, score


def kernel_l2(params, coeff: float) -> jnp.ndarray:
    """5e-4 * sum(tf.nn.l2_loss(w)) over variables whose path contains
    'kernel' (reference loss.py:65-67; l2_loss = sum(x^2)/2)."""
    if coeff == 0.0:
        return jnp.asarray(0.0)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0.0
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if "kernel" in name:
            total = total + jnp.sum(leaf.astype(jnp.float32) ** 2) / 2.0
    return coeff * total
