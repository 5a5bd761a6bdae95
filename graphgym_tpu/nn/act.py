"""Activation table (reference graphgym/models/act.py:6-16).

PReLU is a module (has a learned slope); the rest are pure functions.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _lrelu(slope):
    def f(x):
        return jax.nn.leaky_relu(x, negative_slope=slope)
    return f


class PReLU(nn.Module):
    """Learnable-slope PReLU (torch nn.PReLU semantics: one shared
    parameter, init 0.25 — reference act.py:9)."""

    @nn.compact
    def __call__(self, x):
        slope = self.param("slope",
                           lambda key, shape: jnp.full(shape, 0.25,
                                                       jnp.float32),
                           (1,))
        return jnp.where(x >= 0, x, slope * x)


class _ActDict(dict):
    """Falls back to the plugin registry (register.register_act) so
    contrib activations resolve by name."""

    def __missing__(self, key):
        from graphgym_tpu import register

        if key in register.act_dict:
            return register.act_dict[key]
        raise KeyError(key)

    def __contains__(self, key):
        from graphgym_tpu import register

        return dict.__contains__(self, key) or key in register.act_dict


act_dict = _ActDict({
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "elu": jax.nn.elu,
    "lrelu_01": _lrelu(0.1),
    "lrelu_025": _lrelu(0.25),
    "lrelu_05": _lrelu(0.5),
    # learnable PReLU lives in GeneralLayer (module context); this
    # function fallback covers non-module call sites
    "prelu": _lrelu(0.25),
    "identity": lambda x: x,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
})
