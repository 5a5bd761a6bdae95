"""Host-side pack construction for the Pallas SpMM training path.

Precomputes, per collated GraphBatch, the normalized edge weights the
layers would otherwise derive in-trace (they are pure functions of the
static graph structure) and the packed chunk layouts for A and A^T:

  'gcn'   — D^-1/2 (A + I) D^-1/2 with the reference's inf guard
            (TfgIDLayer.py:528-566); self-loops only on real nodes.
  'plain' — raw A (GIN sum aggregation).
  'mean'  — D^-1 A (SAGE mean aggregation).

The bwd layout packs the *transpose* with the same weights, giving the
custom-VJP dx = A^T g.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import numpy as np

from graphgym_tpu.ops.pallas.spmm_kernel import PackedCSR, pack_csr


def _gcn_weights(senders: np.ndarray, receivers: np.ndarray,
                 edge_weight: np.ndarray, node_mask: np.ndarray,
                 num_nodes: int):
    """Append weight-1 self loops on real nodes and sym-normalize."""
    loop = np.arange(num_nodes, dtype=senders.dtype)
    s = np.concatenate([senders, loop])
    r = np.concatenate([receivers, loop])
    w = np.concatenate([edge_weight,
                        node_mask.astype(np.float32)])
    deg = np.zeros(num_nodes, np.float64)
    np.add.at(deg, r, w)
    with np.errstate(divide="ignore"):
        dis = deg ** -0.5
    dis[~np.isfinite(dis)] = 0
    return s, r, (dis[r] * w * dis[s]).astype(np.float32)


def _mean_weights(senders, receivers, edge_weight, num_nodes):
    deg = np.zeros(num_nodes, np.float64)
    np.add.at(deg, receivers, (edge_weight != 0).astype(np.float64))
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
    return senders, receivers, (edge_weight * inv[receivers]).astype(
        np.float32)


def build_packs(senders: np.ndarray, receivers: np.ndarray,
                edge_weight: np.ndarray, node_mask: np.ndarray,
                num_nodes: int,
                kinds: Sequence[str] = ("gcn", "plain")
                ) -> Dict[str, Tuple[PackedCSR, PackedCSR]]:
    """num_nodes here is the PADDED node count (packs target padded
    rows; the padding row receives only weight-0 contributions)."""
    senders = np.asarray(senders, np.int64)
    receivers = np.asarray(receivers, np.int64)
    edge_weight = np.asarray(edge_weight, np.float32)
    node_mask = np.asarray(node_mask, bool)
    out = {}
    for kind in kinds:
        if kind == "gcn":
            s, r, w = _gcn_weights(senders, receivers, edge_weight,
                                   node_mask, num_nodes)
        elif kind == "plain":
            s, r, w = senders, receivers, edge_weight
        elif kind == "mean":
            s, r, w = _mean_weights(senders, receivers, edge_weight,
                                    num_nodes)
        elif kind == "att":
            # attention edge set: A + self-loops on real nodes; weights
            # are a validity indicator (1 real / 0 padding) — the
            # actual attention coefficients are computed in-trace
            loop = np.arange(num_nodes, dtype=senders.dtype)
            s = np.concatenate([senders, loop])
            r = np.concatenate([receivers, loop])
            w = np.concatenate([(edge_weight != 0).astype(np.float32),
                                node_mask.astype(np.float32)])
        else:
            raise ValueError(f"Unknown pack kind {kind}")
        fwd = pack_csr(s, r, w, num_nodes)
        bwd = pack_csr(r, s, w, num_nodes)
        # bucket chunk counts to powers of two so multi-batch loaders
        # (TU / ego corpora) share compiled programs across batches
        from graphgym_tpu.graphs.container import bucket_size
        fwd = _pad_to_bucket(fwd, num_nodes, bucket_size)
        bwd = _pad_to_bucket(bwd, num_nodes, bucket_size)
        out[kind] = (fwd, bwd)
    return out


def _pad_to_bucket(pack: PackedCSR, num_nodes: int, bucket_size):
    from graphgym_tpu.ops.pallas.spmm_kernel import pad_pack
    nc = pack.senders.shape[0]
    return pad_pack(pack, bucket_size(nc), num_nodes)


def kinds_for_layer(layer_type: str) -> Tuple[str, ...]:
    """Which precomputed packs a layer type consumes."""
    lt = layer_type.replace("Tfg-", "")
    if lt in ("gcnconv", "gcnidconv", "idgcn"):
        return ("gcn",)
    if lt in ("ginconv", "ginidconv", "idgin"):
        return ("plain",)
    if lt in ("sageconv", "idsage", "sageidconv", "sageinitconv"):
        return ("mean",)
    if lt in ("gatconv", "idgat", "gatidconv", "gaddconv", "gmulconv"):
        return ("att",)
    return ()
