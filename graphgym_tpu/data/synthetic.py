"""Synthetic graph corpus generator (reference datasets/syn_graph.py:25-87).

ba = powerlaw_cluster_graph(n=64, m=2, p in U[0,1]);
ws = connected_watts_strogatz_graph(n=64, k=4, p in U[0,1e-0.. ]).
Graphs are rejection-sampled into an 8x8 (avg path len x clustering)
histogram with `per_bin` graphs per occupied bin, giving a corpus with
uniform structural coverage.  Node features are constant 1.
"""

from __future__ import annotations

import pickle
from typing import List

import numpy as np

from graphgym_tpu.data.hostgraph import HostGraph, from_networkx


def generate_syn_graphs(kind: str = "ba", num_graphs: int = 256,
                        n: int = 64, seed: int = 0,
                        bins: int = 8) -> List["HostGraph"]:
    import networkx as nx

    rng = np.random.default_rng(seed)
    per_bin = max(num_graphs // (bins * bins), 1)
    # histogram over (avg path len, clustering), bounds as in the
    # reference (syn_graph.py): path len in [1.8, 3.0], clustering in
    # [0, 0.6]
    counts = np.zeros((bins, bins), np.int64)
    pl_edges = np.linspace(1.8, 3.0, bins + 1)
    cc_edges = np.linspace(0.0, 0.6, bins + 1)
    out: List[HostGraph] = []
    attempts = 0
    while len(out) < num_graphs and attempts < num_graphs * 200:
        attempts += 1
        if kind == "ba":
            p = float(rng.uniform(0, 1))
            G = nx.powerlaw_cluster_graph(n, 2, p, seed=int(rng.integers(1 << 31)))
        elif kind == "ws":
            p = float(rng.uniform(0, 1))
            G = nx.connected_watts_strogatz_graph(
                n, 4, p, tries=100, seed=int(rng.integers(1 << 31)))
        else:
            raise ValueError(f"Unknown synthetic kind {kind}")
        if not nx.is_connected(G):
            continue
        pl = nx.average_shortest_path_length(G)
        cc = nx.average_clustering(G)
        i = int(np.clip(np.digitize(pl, pl_edges) - 1, 0, bins - 1))
        j = int(np.clip(np.digitize(cc, cc_edges) - 1, 0, bins - 1))
        if counts[i, j] >= per_bin:
            continue
        counts[i, j] += 1
        for v in G.nodes:
            G.nodes[v]["node_feature"] = np.ones(1, np.float32)
        out.append(from_networkx(G))
    return out


def save_syn(path: str, graphs) -> None:
    with open(path, "wb") as f:
        pickle.dump(graphs, f)
