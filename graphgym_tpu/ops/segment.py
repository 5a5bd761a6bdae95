"""Masked segment reductions — the primitive layer of the framework.

These are the TPU-native equivalents of the library kernels the reference
delegates to: tf.math.unsorted_segment_{sum,min,max} and
tf_geometric's segment_softmax (reference sparse_adj.py:84-97,136-151),
torch_scatter.scatter_add (reference contrib/transform/identity.py:18) and
torch_scatter.scatter(reduce=...) (reference models/pooling.py:17-33).

All functions take a static ``num_segments`` so XLA sees fixed shapes.
Under the GraphBatch padding convention, padded elements target the
padding segment and therefore need no masking in sums; reductions that
are sensitive to empty/padded segments (mean, max, min, softmax) accept
an optional mask.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int) -> jnp.ndarray:
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_count(segment_ids: jnp.ndarray, num_segments: int,
                  mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    ones = jnp.ones(segment_ids.shape, jnp.float32)
    if mask is not None:
        ones = jnp.where(mask, ones, 0.0)
    return jax.ops.segment_sum(ones, segment_ids, num_segments=num_segments)


def segment_mean(data: jnp.ndarray, segment_ids: jnp.ndarray,
                 num_segments: int,
                 mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Mean over each segment; empty segments yield 0 (matches
    tf_geometric mean_reducer used by IDSAGE, TfgIDLayer.py:98)."""
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, 0.0)
    total = jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)
    count = segment_count(segment_ids, num_segments, mask)
    count = jnp.maximum(count, 1.0)
    return total / _expand(count, total)


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Max over each segment; empty segments yield 0 (torch_scatter
    'max' semantics fill with 0 for empty outputs in the reference's
    pooling use)."""
    neg_inf = jnp.asarray(-jnp.inf, data.dtype)
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, neg_inf)
    out = jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_min(data: jnp.ndarray, segment_ids: jnp.ndarray,
                num_segments: int,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    pos_inf = jnp.asarray(jnp.inf, data.dtype)
    if mask is not None:
        data = jnp.where(_expand(mask, data), data, pos_inf)
    out = jax.ops.segment_min(data, segment_ids, num_segments=num_segments)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def segment_softmax(logits: jnp.ndarray, segment_ids: jnp.ndarray,
                    num_segments: int,
                    mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Numerically-stable softmax within each segment.

    The GAT edge-softmax (reference sparse_adj.py:136-151 `SparseAdj.softmax`
    via tf_geometric segment_softmax).  Masked-out entries get probability
    0; fully-masked segments produce all-zero probabilities rather than
    NaN (the reference never sees padding, we must).
    """
    in_dtype = logits.dtype
    # softmax internals in f32 (bf16 exp/normalize under mixed precision
    # is too lossy for attention weights)
    logits = logits.astype(jnp.float32)
    neg_inf = jnp.asarray(-1e30, logits.dtype)
    if mask is not None:
        logits = jnp.where(mask, logits, neg_inf)
    seg_max = jax.ops.segment_max(logits, segment_ids,
                                  num_segments=num_segments)
    seg_max = jnp.where(jnp.isfinite(seg_max) & (seg_max > neg_inf / 2),
                        seg_max, 0.0)
    shifted = logits - seg_max[segment_ids]
    exp = jnp.exp(shifted)
    if mask is not None:
        exp = jnp.where(mask, exp, 0.0)
    denom = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    denom = jnp.maximum(denom, jnp.asarray(1e-16, logits.dtype))
    return (exp / denom[segment_ids]).astype(in_dtype)


def _expand(v: jnp.ndarray, like: jnp.ndarray) -> jnp.ndarray:
    """Broadcast a per-row vector against trailing dims of ``like``."""
    while v.ndim < like.ndim:
        v = v[..., None]
    return v
