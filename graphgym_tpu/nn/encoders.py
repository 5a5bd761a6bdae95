"""Integer feature encoders (reference graphgym/models/feature_encoder.py
:13-118): embed categorical node/edge features before message passing.

AtomEncoder/BondEncoder follow the OGB molecule convention: one
embedding table per feature column, summed (reference
feature_encoder.py:56-118).  Table sizes mirror ogb.utils.features
get_atom/bond_feature_dims.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from graphgym_tpu.graphs.container import GraphBatch

# ogb.utils.features.get_atom_feature_dims() / get_bond_feature_dims()
ATOM_FEATURE_DIMS = [119, 4, 12, 12, 10, 6, 6, 2, 2]
BOND_FEATURE_DIMS = [5, 6, 2]


class IntegerFeatureEncoder(nn.Module):
    """Single nn.Embedding over integer node features (reference
    feature_encoder.py:13-31)."""
    emb_dim: int
    num_classes: int = 256

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        x = graph.node_feat
        idx = x[:, 0].astype(jnp.int32)
        emb = nn.Embed(self.num_classes, self.emb_dim,
                       embedding_init=nn.initializers.glorot_uniform())
        return graph.replace(node_feat=emb(idx))


class SingleAtomEncoder(nn.Module):
    """Embed only the atom-type column (column 0 of the OGB atom
    features; reference feature_encoder.py:34-53)."""
    emb_dim: int

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        idx = graph.node_feat[:, 0].astype(jnp.int32)
        emb = nn.Embed(ATOM_FEATURE_DIMS[0], self.emb_dim)
        return graph.replace(node_feat=emb(idx))


class _MultiColumnEmbed(nn.Module):
    emb_dim: int
    dims: Sequence[int]

    @nn.compact
    def __call__(self, feats: jnp.ndarray) -> jnp.ndarray:
        total = 0
        for i, n in enumerate(self.dims):
            if i >= feats.shape[1]:
                break
            emb = nn.Embed(n, self.emb_dim, name=f"col{i}")
            # clamp: out-of-range ids (jnp.take fill mode) would yield
            # NaN rows instead of an error
            idx = jnp.clip(feats[:, i].astype(jnp.int32), 0, n - 1)
            total = total + emb(idx)
        return total


class AtomEncoder(nn.Module):
    """Sum of per-column atom embeddings (reference
    feature_encoder.py:56-81)."""
    emb_dim: int

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        out = _MultiColumnEmbed(self.emb_dim, ATOM_FEATURE_DIMS)(
            graph.node_feat)
        return graph.replace(node_feat=out)


class BondEncoder(nn.Module):
    """Sum of per-column bond embeddings over edge features (reference
    feature_encoder.py:84-118)."""
    emb_dim: int

    @nn.compact
    def __call__(self, graph: GraphBatch, train: bool = False) -> GraphBatch:
        assert graph.edge_feat is not None
        out = _MultiColumnEmbed(self.emb_dim, BOND_FEATURE_DIMS)(
            graph.edge_feat)
        return graph.replace(edge_feat=out)


node_encoder_dict = {
    "Integer": IntegerFeatureEncoder,
    "SingleAtom": SingleAtomEncoder,
    "Atom": AtomEncoder,
}

edge_encoder_dict = {
    "Bond": BondEncoder,
}
