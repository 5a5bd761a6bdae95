"""Structural graph algorithms in vectorized numpy over CSR.

The native-code replacement layer for the reference's networkx calls in
feature augmentation (reference models/feature_augment.py:51-107:
degree / betweenness_centrality / pagerank / clustering / shortest paths /
laplacian_spectrum) — the pipeline's CPU hot loop #1 (SURVEY.md §3.1).
All-pairs BFS and Brandes betweenness run frontier-at-a-time over the
whole graph instead of per-node Python loops.
"""

from __future__ import annotations

import numpy as np

from graphgym_tpu.data.hostgraph import HostGraph


def degrees(g: HostGraph) -> np.ndarray:
    """Undirected degree per node (networkx G.degree for the symmetric
    edge set = out-degree here)."""
    d = np.zeros(g.num_nodes, np.int64)
    np.add.at(d, g.senders, 1)
    return d


def clustering_coefficient(g: HostGraph) -> np.ndarray:
    """nx.clustering equivalent for undirected simple graphs:
    c_i = 2 T_i / (d_i (d_i - 1)), T_i = triangles through i.

    Triangle counting via neighbor-set intersection on sorted CSR rows.
    """
    n = g.num_nodes
    indptr, indices = g.csr()
    # sort each row for intersection
    rows = [np.sort(indices[indptr[i]:indptr[i + 1]]) for i in range(n)]
    deg = np.array([len(r) for r in rows])
    tri = np.zeros(n, np.int64)
    for i in range(n):
        nb = rows[i]
        nb = nb[nb != i]
        for j in nb:
            if j > i:
                # common neighbors of i and j
                c = np.intersect1d(rows[i], rows[int(j)],
                                   assume_unique=False)
                c = c[(c != i) & (c != j)]
                tri[i] += len(c)
                tri[int(j)] += len(c)
    # tri[i] accumulates 2 per triangle through i (once via each of the
    # two adjacent pairs containing i), so tri == 2 * T_i already.
    denom = deg * (deg - 1)
    out = np.zeros(n, np.float64)
    nz = denom > 0
    out[nz] = tri[nz] / denom[nz]
    return out


def bfs_all_pairs(g: HostGraph, max_dist: int | None = None) -> np.ndarray:
    """All-pairs hop distances via frontier BFS with a dense [N, N]
    boolean reachability matrix; dist = -1 if unreachable.  O(diam * E)
    with vectorized frontier expansion."""
    n = g.num_nodes
    indptr, indices = g.csr()
    dist = np.full((n, n), -1, np.int32)
    np.fill_diagonal(dist, 0)
    reached = np.eye(n, dtype=bool)
    frontier = np.eye(n, dtype=bool)
    d = 0
    limit = max_dist if max_dist is not None else n
    while frontier.any() and d < limit:
        d += 1
        # expand: next[i, v] = any_{u in frontier[i]} v in N(u)
        nxt = np.zeros((n, n), bool)
        src, cur = np.nonzero(frontier)
        for i, u in zip(src, cur):
            nxt[i, indices[indptr[u]:indptr[u + 1]]] = True
        nxt &= ~reached
        dist[nxt] = d
        reached |= nxt
        frontier = nxt
    return dist


def ego_radius_nodes(g: HostGraph, radius: int):
    """For each node i, the sorted array of nodes within hop distance
    <= radius (including i) — the ego-net node sets (reference
    transform.py:21 nx.ego_graph)."""
    dist = bfs_all_pairs(g, max_dist=radius)
    within = (dist >= 0) & (dist <= radius)
    return [np.nonzero(within[i])[0] for i in range(g.num_nodes)]


def avg_shortest_path_len(g: HostGraph) -> np.ndarray:
    """Per-node mean shortest-path length over reachable nodes
    (reference path_len_fun, feature_augment.py:60-63; includes the
    0-distance to self, matching nx.shortest_path_length dict)."""
    dist = bfs_all_pairs(g)
    out = np.zeros(g.num_nodes, np.float64)
    for i in range(g.num_nodes):
        reach = dist[i] >= 0
        out[i] = dist[i][reach].mean() if reach.any() else 0.0
    return out


def graph_avg_path_len(g: HostGraph) -> float:
    """nx.average_shortest_path_length: mean over ordered pairs u != v
    (assumes connected)."""
    dist = bfs_all_pairs(g)
    n = g.num_nodes
    mask = (dist >= 0) & ~np.eye(n, dtype=bool)
    return float(dist[mask].mean()) if mask.any() else 0.0


def pagerank(g: HostGraph, alpha: float = 0.85, tol: float = 1e-6,
             max_iter: int = 100) -> np.ndarray:
    """Power-iteration PageRank matching nx.pagerank defaults
    (alpha=0.85, L1 tolerance 1e-6 * n)."""
    n = g.num_nodes
    s, r = g.senders, g.receivers
    deg_out = np.zeros(n, np.float64)
    np.add.at(deg_out, s, 1.0)
    x = np.full(n, 1.0 / n)
    dangling = deg_out == 0
    for _ in range(max_iter):
        contrib = np.where(dangling, 0.0, x / np.maximum(deg_out, 1))
        nxt = np.zeros(n, np.float64)
        np.add.at(nxt, r, contrib[s])
        nxt = alpha * (nxt + x[dangling].sum() / n) + (1 - alpha) / n
        if np.abs(nxt - x).sum() < n * tol:
            x = nxt
            break
        x = nxt
    return x


def betweenness_centrality(g: HostGraph, normalized: bool = True
                           ) -> np.ndarray:
    """Brandes' algorithm (unweighted), matching
    nx.betweenness_centrality's normalization 2/((n-1)(n-2)) for
    undirected graphs."""
    n = g.num_nodes
    indptr, indices = g.csr()
    bc = np.zeros(n, np.float64)
    for s0 in range(n):
        # BFS
        sigma = np.zeros(n)
        sigma[s0] = 1.0
        dist = np.full(n, -1, np.int64)
        dist[s0] = 0
        order = [s0]
        head = 0
        preds = [[] for _ in range(n)]
        while head < len(order):
            u = order[head]
            head += 1
            for v in indices[indptr[u]:indptr[u + 1]]:
                v = int(v)
                if dist[v] < 0:
                    dist[v] = dist[u] + 1
                    order.append(v)
                if dist[v] == dist[u] + 1:
                    sigma[v] += sigma[u]
                    preds[v].append(u)
        delta = np.zeros(n)
        for v in reversed(order):
            for u in preds[v]:
                delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
            if v != s0:
                bc[v] += delta[v]
    bc /= 2.0  # undirected: each pair counted twice
    if normalized and n > 2:
        bc *= 2.0 / ((n - 1) * (n - 2))
    return bc


def laplacian_spectrum(g: HostGraph) -> np.ndarray:
    """Eigenvalues of the combinatorial Laplacian (nx.laplacian_spectrum:
    ascending eigvalsh of D - A)."""
    n = g.num_nodes
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (g.senders, g.receivers), 1.0)
    a = np.minimum(a, 1.0)  # simple graph
    lap = np.diag(a.sum(1)) - a
    return np.linalg.eigvalsh(lap)


def connected_components(g: HostGraph) -> np.ndarray:
    """Component id per node (label propagation over BFS)."""
    n = g.num_nodes
    indptr, indices = g.csr()
    comp = np.full(n, -1, np.int64)
    c = 0
    for s0 in range(n):
        if comp[s0] >= 0:
            continue
        stack = [s0]
        comp[s0] = c
        while stack:
            u = stack.pop()
            for v in indices[indptr[u]:indptr[u + 1]]:
                v = int(v)
                if comp[v] < 0:
                    comp[v] = c
                    stack.append(v)
        c += 1
    return comp
