"""Graph samplers: neighbor / GraphSAINT / cluster / random-node.

Re-implements the PyG sampler options of the reference
(loader_pyg.py:204-255: full_batch, NeighborSampler, RandomNodeSampler,
GraphSAINT node/edge/random-walk, ClusterLoader) as host-side CSR
sampling that emits induced subgraphs as static-shape GraphBatches.
Each epoch draws cfg.train.iter_per_epoch batches (loader_pyg.py:
iter_per_epoch); padding buckets are fixed per loader so jit compiles
once.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from graphgym_tpu.data.hostgraph import HostGraph


def induced_subgraph(g: HostGraph, nodes: np.ndarray) -> HostGraph:
    """Node-induced subgraph with relabeled ids; node features/labels
    sliced; supervision restricted to the kept nodes."""
    nodes = np.unique(nodes)
    lookup = np.full(g.num_nodes, -1, np.int64)
    lookup[nodes] = np.arange(len(nodes))
    s, r = g.senders, g.receivers
    keep = (lookup[s] >= 0) & (lookup[r] >= 0)
    ei = np.stack([lookup[s[keep]], lookup[r[keep]]]).astype(np.int32)
    out = HostGraph(len(nodes), ei)
    for key, val in g.feats.items():
        val = np.asarray(val)
        if key == "node_label_index":
            sel = lookup[val]
            out[key] = np.sort(sel[sel >= 0])
        elif key.startswith("node_") and len(val) == g.num_nodes:
            out[key] = val[nodes]
        elif not key.startswith(("edge_", "node_")):
            out[key] = val
    if "node_label_index" not in out and "node_label" in out:
        out["node_label_index"] = np.arange(out.num_nodes)
    return out


def neighbor_sample(g: HostGraph, batch_nodes: np.ndarray,
                    sizes: List[int],
                    rng: np.random.Generator) -> HostGraph:
    """Layer-wise neighbor expansion (reference NeighborSampler,
    loader_pyg.py:209-215 with cfg.train.neighbor_sizes): starting from
    the seed nodes, sample up to sizes[l] in-neighbors per node per
    layer; return the induced subgraph over the union, supervising only
    the seeds."""
    indptr, indices = g.csr()
    frontier = np.asarray(batch_nodes)
    all_nodes = [frontier]
    for size in sizes:
        # vectorized per-node sampling without replacement: expand all
        # frontier neighbors, give each a random key, keep each node's
        # `size` smallest keys (rank-within-segment < size)
        cur = frontier.astype(np.int64)
        counts = (indptr[cur + 1] - indptr[cur]).astype(np.int64)
        total = int(counts.sum())
        if total == 0:
            frontier = np.array([], np.int64)
            all_nodes.append(frontier)
            continue
        starts = indptr[cur]
        seg = np.repeat(np.arange(len(cur)), counts)
        run = np.arange(total) - np.repeat(
            np.cumsum(counts) - counts, counts)
        nbrs = indices[np.repeat(starts, counts) + run]
        keys = rng.random(total)
        order = np.lexsort((keys, seg))
        # after the (segment, key) sort, rank-within-segment is the
        # position minus the segment start; rank < size keeps at most
        # `size` random neighbors per node
        rank = np.arange(total) - np.repeat(
            np.cumsum(counts) - counts, counts)
        keep = order[rank < size]
        frontier = np.unique(nbrs[keep])
        all_nodes.append(frontier)
    nodes = np.unique(np.concatenate(all_nodes))
    sub = induced_subgraph(g, nodes)
    # supervise only the seed nodes
    lookup = np.full(g.num_nodes, -1, np.int64)
    lookup[np.unique(nodes)] = np.arange(len(np.unique(nodes)))
    seeds = lookup[np.asarray(batch_nodes)]
    base = g.get("node_label_index")
    if base is not None:
        allowed = np.zeros(g.num_nodes, bool)
        allowed[np.asarray(base)] = True
        seeds = seeds[allowed[np.asarray(batch_nodes)]]
    sub["node_label_index"] = np.sort(seeds[seeds >= 0])
    return sub


def saint_node(g: HostGraph, budget: int,
               rng: np.random.Generator) -> HostGraph:
    """GraphSAINT node sampler: degree-proportional node sampling."""
    deg = np.zeros(g.num_nodes)
    np.add.at(deg, g.senders, 1.0)
    p = (deg + 1) / (deg + 1).sum()
    nodes = rng.choice(g.num_nodes, size=min(budget, g.num_nodes),
                       replace=False, p=p)
    return induced_subgraph(g, nodes)


def saint_edge(g: HostGraph, budget: int,
               rng: np.random.Generator) -> HostGraph:
    """GraphSAINT edge sampler: uniform edge sample, induced over
    endpoints."""
    e = g.num_edges
    sel = rng.choice(e, size=min(budget, e), replace=False)
    nodes = np.unique(np.concatenate([g.senders[sel],
                                      g.receivers[sel]]))
    return induced_subgraph(g, nodes)


def saint_random_walk(g: HostGraph, roots: int, walk_length: int,
                      rng: np.random.Generator) -> HostGraph:
    """GraphSAINT random-walk sampler (cfg.train.walk_length,
    reference config.py:245)."""
    indptr, indices = g.csr()
    starts = rng.integers(0, g.num_nodes, size=roots)
    visited = [starts]
    cur = starts.copy()
    for _ in range(walk_length):
        nxt = np.empty_like(cur)
        for i, u in enumerate(cur):
            nbrs = indices[indptr[u]:indptr[u + 1]]
            nxt[i] = rng.choice(nbrs) if len(nbrs) else u
        visited.append(nxt)
        cur = nxt
    return induced_subgraph(g, np.concatenate(visited))


def random_node_parts(g: HostGraph, num_parts: int,
                      rng: np.random.Generator) -> List[HostGraph]:
    """RandomNodeSampler: random partition into num_parts induced
    subgraphs."""
    perm = rng.permutation(g.num_nodes)
    return [induced_subgraph(g, part)
            for part in np.array_split(perm, num_parts)]


def cluster_parts(g: HostGraph, num_parts: int,
                  rng: np.random.Generator) -> List[HostGraph]:
    """ClusterLoader-style partition without METIS: BFS-grown balanced
    clusters (locality-preserving, deterministic given rng)."""
    indptr, indices = g.csr()
    n = g.num_nodes
    target = (n + num_parts - 1) // num_parts
    assigned = np.full(n, -1, np.int64)
    order = rng.permutation(n)
    part = 0
    count = 0
    for seed in order:
        if assigned[seed] >= 0:
            continue
        # BFS from seed, filling the current part
        queue = [seed]
        while queue and count < target:
            u = queue.pop(0)
            if assigned[u] >= 0:
                continue
            assigned[u] = part
            count += 1
            for v in indices[indptr[u]:indptr[u + 1]]:
                if assigned[int(v)] < 0:
                    queue.append(int(v))
        if count >= target:
            part = min(part + 1, num_parts - 1)
            count = 0
    assigned[assigned < 0] = num_parts - 1
    return [induced_subgraph(g, np.nonzero(assigned == p)[0])
            for p in range(num_parts)
            if np.any(assigned == p)]


def make_sampled_graphs(g: HostGraph, cfg,
                        rng: np.random.Generator,
                        sampler: str = None) -> List[HostGraph]:
    """One epoch's worth of sampled subgraphs for cfg.train.sampler
    (val/test loaders pass cfg.val.sampler instead — reference
    loader_pyg.py:272-283)."""
    sampler = sampler or cfg.train.sampler
    iters = cfg.train.iter_per_epoch
    if sampler == "full_batch":
        return [g]
    if sampler == "neighbor":
        base = np.asarray(g.get("node_label_index",
                                np.arange(g.num_nodes)))
        out = []
        for _ in range(iters):
            seeds = rng.choice(base,
                               size=min(cfg.train.batch_size * 8,
                                        len(base)), replace=False)
            out.append(neighbor_sample(g, seeds,
                                       cfg.train.neighbor_sizes, rng))
        return out
    if sampler == "random_node":
        return random_node_parts(g, max(iters, 1), rng)
    if sampler == "saint_node":
        return [saint_node(g, cfg.train.node_per_graph * 64, rng)
                for _ in range(iters)]
    if sampler == "saint_edge":
        return [saint_edge(g, cfg.train.node_per_graph * 64, rng)
                for _ in range(iters)]
    if sampler == "saint_rw":
        return [saint_random_walk(g, cfg.train.node_per_graph,
                                  cfg.train.walk_length, rng)
                for _ in range(iters)]
    if sampler == "cluster":
        return cluster_parts(g, max(iters, 2), rng)
    raise ValueError(f"Unknown sampler {sampler}")
