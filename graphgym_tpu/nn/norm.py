"""Normalization layers aware of node padding.

The reference applies plain nn.BatchNorm1d over node features
(graphgym/models/layer.py:28-29, 85-106).  Under the static-shape padding
scheme the batch statistics must exclude padded rows, so we implement a
masked BatchNorm with running statistics (a concern the reference never
had — SURVEY.md §7 "hard parts": BatchNorm under padding).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class MaskedBatchNorm(nn.Module):
    """BatchNorm1d over valid rows only.

    Matches torch BatchNorm1d semantics: momentum is the weight of the
    *new* batch statistic (cfg.bn.mom, reference config.py:411), biased
    variance used for normalization, running stats used at eval.
    """
    features: int
    eps: float = 1e-5
    momentum: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray],
                 train: bool) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((self.features,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((self.features,)))

        # statistics always in f32: under mixed-precision training x may
        # arrive bf16, and bf16 sums of squares lose too much
        xs = x.astype(jnp.float32)
        if train:
            if mask is not None:
                m = mask.astype(jnp.float32)[:, None]
                count = jnp.maximum(jnp.sum(m), 1.0)
                mean = jnp.sum(xs * m, axis=0) / count
                var = jnp.sum(m * (xs - mean) ** 2, axis=0) / count
                # torch tracks the unbiased variance in running stats
                unbiased = var * count / jnp.maximum(count - 1.0, 1.0)
            else:
                mean = jnp.mean(xs, axis=0)
                var = jnp.var(xs, axis=0)
                n = xs.shape[0]
                unbiased = var * n / max(n - 1, 1)
            if not self.is_initializing():
                ra_mean.value = ((1 - self.momentum) * ra_mean.value
                                 + self.momentum * mean)
                ra_var.value = ((1 - self.momentum) * ra_var.value
                                + self.momentum * unbiased)
        else:
            mean, var = ra_mean.value, ra_var.value

        y = (xs - mean) * jnp.reciprocal(jnp.sqrt(var + self.eps))
        y = y.astype(x.dtype)
        return y * scale + bias


def l2_normalize(x: jnp.ndarray, axis: int = -1,
                 eps: float = 1e-12) -> jnp.ndarray:
    """F.normalize(p=2) equivalent (reference gnn.py:79-80).  The norm
    reduction runs in f32 so bf16 activations don't lose the tail."""
    xs = x.astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(xs * xs, axis=axis, keepdims=True))
    return (xs / jnp.maximum(norm, eps)).astype(x.dtype)
