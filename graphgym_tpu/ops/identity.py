"""ID-GNN Fast identity features: diagonals of normalized-adjacency
powers, computed on device.

Reference: graphgym/contrib/transform/identity.py:25-35
(``compute_identity``): GCN-normalize the adjacency (with self loops),
densify, take diag(A^1..A^k).  diag(A^k)[v] is the weighted count of
closed k-walks at v — the cycle-count augmentation of ID-GNN Fast.

TPU-first: the power iteration is dense MXU matmuls (the reference used
host torch); for the graph sizes in the corpus (n <= ~3k) a dense [N, N]
buffer is tiny and each power is one 128x128-tiled matmul.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from graphgym_tpu.ops import sparse as sp


@partial(jax.jit, static_argnames=("num_nodes", "k"))
def compute_identity(senders: jnp.ndarray, receivers: jnp.ndarray,
                     num_nodes: int, k: int) -> jnp.ndarray:
    """[N, k] array: column j-1 = diag(Anorm^j), Anorm = D^-1/2 (A+I) D^-1/2."""
    s, r, w = sp.gcn_norm(senders, receivers, None, num_nodes)
    adj = jnp.zeros((num_nodes, num_nodes), jnp.float32).at[r, s].add(w)
    def body(carry, _):
        p = carry
        p_next = jnp.dot(p, adj, preferred_element_type=jnp.float32)
        return p_next, jnp.diagonal(p)
    _, diags = jax.lax.scan(body, adj, None, length=k)
    return jnp.transpose(diags)  # [N, k]


def compute_identity_host(edge_index: np.ndarray, num_nodes: int,
                          k: int) -> np.ndarray:
    """Host wrapper used by the data pipeline."""
    s = jnp.asarray(edge_index[0].astype(np.int32))
    r = jnp.asarray(edge_index[1].astype(np.int32))
    return np.asarray(compute_identity(s, r, num_nodes, k))
