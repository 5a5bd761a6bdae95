"""Host-side graph store: numpy arrays + CSR views.

Replaces the reference's DeepSNAP Graph / networkx representation for the
data pipeline (reference graphgym/loader.py, deepsnap.graph.Graph).  All
structural algorithms in graphgym_tpu.data.structure run on the CSR view
— no per-node Python/networkx loops in the pipeline hot paths (the
reference's CPU hot loops #1/#2, SURVEY.md §3.1).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class HostGraph:
    """A single graph on the host.

    edge_index is directed COO [2, E] (row 0 = senders, row 1 =
    receivers); undirected graphs store both directions.  Arbitrary
    per-node / per-edge / per-graph arrays live in ``feats`` keyed by the
    reference's naming scheme (node_feature, node_label, edge_feature,
    graph_label, node_id_index, ...).
    """
    num_nodes: int
    edge_index: np.ndarray                       # [2, E] int32
    feats: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    # cached CSR (receiver-sorted) view
    _csr_indptr: Optional[np.ndarray] = None
    _csr_indices: Optional[np.ndarray] = None

    def __getitem__(self, key: str) -> np.ndarray:
        return self.feats[key]

    def __setitem__(self, key: str, value: np.ndarray) -> None:
        self.feats[key] = np.asarray(value)
        self._invalidate()

    def __contains__(self, key: str) -> bool:
        return key in self.feats

    def get(self, key, default=None):
        return self.feats.get(key, default)

    def _invalidate(self):
        pass

    @property
    def num_edges(self) -> int:
        return int(self.edge_index.shape[1])

    @property
    def senders(self) -> np.ndarray:
        return self.edge_index[0]

    @property
    def receivers(self) -> np.ndarray:
        return self.edge_index[1]

    # -------------------------------------------------------------- CSR
    def csr(self):
        """(indptr, indices): neighbors of node i (out-edges by sender)
        = indices[indptr[i]:indptr[i+1]].  Built once, cached."""
        if self._csr_indptr is None:
            order = np.argsort(self.senders, kind="stable")
            sorted_s = self.senders[order]
            self._csr_indices = self.receivers[order].astype(np.int32)
            self._csr_indptr = np.zeros(self.num_nodes + 1, np.int64)
            np.add.at(self._csr_indptr, sorted_s + 1, 1)
            self._csr_indptr = np.cumsum(self._csr_indptr)
        return self._csr_indptr, self._csr_indices

    def copy(self) -> "HostGraph":
        return HostGraph(self.num_nodes, self.edge_index.copy(),
                         {k: v.copy() for k, v in self.feats.items()})


def from_networkx(g, keep_attrs=("node_feature", "node_label")) -> HostGraph:
    """Convert an (undirected) networkx graph: every edge becomes two
    directed edges; listed node attributes are stacked into arrays."""
    import networkx as nx  # local import; only used at load time

    n = g.number_of_nodes()
    nodes = list(g.nodes())
    relabel = {v: i for i, v in enumerate(nodes)}
    edges = np.asarray([(relabel[u], relabel[v]) for u, v in g.edges()],
                       dtype=np.int32).reshape(-1, 2)
    if not g.is_directed():
        edges = np.concatenate([edges, edges[:, ::-1]], axis=0)
    # drop self-loop duplicates produced by reversing loops
    if len(edges):
        keep = np.ones(len(edges), bool)
        half = len(edges) // 2
        if not g.is_directed():
            loops = edges[:half][:, 0] == edges[:half][:, 1]
            keep[half:][loops] = False
        edges = edges[keep]
    hg = HostGraph(n, edges.T.copy() if len(edges) else
                   np.zeros((2, 0), np.int32))
    for attr in keep_attrs:
        vals = []
        ok = True
        for v in nodes:
            d = g.nodes[v]
            if attr not in d:
                ok = False
                break
            val = d[attr]
            vals.append(np.asarray(val))
        if ok and vals:
            hg.feats[attr] = np.stack(vals).astype(np.float32) \
                if vals[0].dtype.kind == "f" else np.stack(vals)
    return hg


def to_undirected(hg: HostGraph) -> HostGraph:
    """Symmetrize edge set (cfg.dataset.to_undirected)."""
    s, r = hg.senders, hg.receivers
    pairs = np.unique(np.stack([np.concatenate([s, r]),
                                np.concatenate([r, s])], axis=1), axis=0)
    out = hg.copy()
    out.edge_index = pairs.T.astype(np.int32)
    out._csr_indptr = out._csr_indices = None
    return out
