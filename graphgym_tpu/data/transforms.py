"""Graph transforms: ego-net extraction (ID-GNN Full), edge-net copies,
shortest-path labels, negative sampling.

Re-implements reference models/transform.py:6-110 over HostGraph using
the all-pairs BFS in data.structure (vectorized frontier expansion)
instead of O(n) networkx ego_graph calls — the reference's CPU hot
loop #2 (SURVEY.md §3.1/§3.5).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from graphgym_tpu.data import structure as st
from graphgym_tpu.data.hostgraph import HostGraph


def remove_node_feature(g: HostGraph) -> None:
    """Constant node features (reference transform.py:6-8)."""
    g["node_feature"] = np.ones((g.num_nodes, 1), np.float32)


def ego_nets(g: HostGraph, radius: int = 2) -> HostGraph:
    """ID-GNN Full data transform (reference transform.py:11-39).

    For every node i extract the radius-r ego-net; build one disjoint
    union graph where center i keeps id i and its other ego members get
    fresh ids >= n.  ``node_id_index = arange(n)`` marks the centers.
    Node features/labels are copied from the original node of each ego
    member; node_label_index (supervised centers) is preserved.

    radius > 4 short-circuits to n copies of the full graph
    (transform.py:18-19).
    """
    n = g.num_nodes
    if radius <= 4:
        # native C++ union extraction when available (the reference's
        # CPU hot loop #2)
        try:
            from graphgym_tpu import native
            packed = native.ego_union(g.senders, g.receivers, n, radius)
        except Exception:
            packed = None
        if packed is not None:
            us, ur, orig_of, total_nodes = packed
            out = HostGraph(total_nodes,
                            np.stack([us, ur]).astype(np.int32))
            for key, val in g.feats.items():
                if key.startswith("node_") and key != "node_label_index" \
                        and len(val) == n:
                    out[key] = np.asarray(val)[orig_of]
                else:
                    out[key] = val
            out["node_id_index"] = np.arange(n)
            return out

    if radius > 4:
        ego_sets = [np.arange(n)] * n
    else:
        ego_sets = st.ego_radius_nodes(g, radius)

    # Per-ego relabeling: center i -> i; the remaining members of ego i
    # get consecutive new ids starting at the running bias (>= n).
    new_ids = []          # per ego: member original ids
    mapped_ids = []       # per ego: member new ids
    bias = n
    for i in range(n):
        members = ego_sets[i]
        others = members[members != i]
        mapped = np.empty(len(members), np.int64)
        # order: center first is not required; keep original member order
        # with center mapped to i
        m = {int(i): i}
        for o in others:
            m[int(o)] = bias
            bias += 1
        mapped = np.array([m[int(v)] for v in members], np.int64)
        new_ids.append(members)
        mapped_ids.append(mapped)

    total_nodes = bias
    # Union edges: induced subgraph edges of each ego, relabeled.
    s_all, r_all = [], []
    senders, receivers = g.senders, g.receivers
    for i in range(n):
        members = new_ids[i]
        member_set = np.zeros(n, bool)
        member_set[members] = True
        emask = member_set[senders] & member_set[receivers]
        lookup = np.full(n, -1, np.int64)
        lookup[members] = mapped_ids[i]
        s_all.append(lookup[senders[emask]])
        r_all.append(lookup[receivers[emask]])
    edge_index = np.stack([np.concatenate(s_all),
                           np.concatenate(r_all)]).astype(np.int32)

    # original node id of each union node
    orig_of = np.empty(total_nodes, np.int64)
    for i in range(n):
        orig_of[mapped_ids[i]] = new_ids[i]

    out = HostGraph(total_nodes, edge_index)
    for key, val in g.feats.items():
        if key.startswith("node_") and key != "node_label_index" \
                and len(val) == n:
            out[key] = np.asarray(val)[orig_of]
        else:
            out[key] = val
    out["node_id_index"] = np.arange(n)
    return out


def edge_nets(g: HostGraph) -> HostGraph:
    """Edge-prediction transform (reference transform.py:41-65): n copies
    of the graph; node j of copy i gets id i*n + j; link prediction
    becomes conditional node classification: node_label = edge_label,
    node_label_index = edge_label_index[1] + edge_label_index[0] * n;
    centers node_id_index = arange(0, n*n, n+1)."""
    n = g.num_nodes
    s, r = g.senders, g.receivers
    offs = (np.arange(n, dtype=np.int64) * n)[:, None]
    s_all = (s[None, :] + offs).reshape(-1)
    r_all = (r[None, :] + offs).reshape(-1)
    out = HostGraph(n * n,
                    np.stack([s_all, r_all]).astype(np.int32))
    for key, val in g.feats.items():
        if key.startswith("node_") and key != "node_label_index" \
                and len(val) == n:
            out[key] = np.tile(np.asarray(val),
                               (n,) + (1,) * (np.asarray(val).ndim - 1))
    out["node_id_index"] = np.arange(0, n * n, n + 1)

    eli = g.get("edge_label_index")
    el = g.get("edge_label")
    if eli is not None:
        out["node_label"] = _scatter_edge_labels(el, eli, n)
        out["node_label_index"] = eli[1] + eli[0] * n
    return out


def _scatter_edge_labels(edge_label, edge_label_index, n):
    """node_label over the n*n union indexed at supervised positions;
    other entries 0 (they are masked by node_label_index)."""
    labels = np.zeros(n * n, dtype=np.asarray(edge_label).dtype)
    pos = edge_label_index[1] + edge_label_index[0] * n
    labels[pos] = edge_label
    return labels


def path_len_labels(g: HostGraph, num_label: int = 1000,
                    rng: Optional[np.random.Generator] = None) -> None:
    """Shortest-path prediction labels (reference transform.py:68-91):
    sample node pairs, label = min(dist, 4), drop unreachable pairs."""
    rng = rng or np.random.default_rng()
    n = g.num_nodes
    pairs = rng.integers(0, n, size=(2, num_label))
    # sparse-frontier BFS from the sampled sources only — O(S * E), not
    # the dense [N, N] all-pairs matrix
    srcs, inv = np.unique(pairs[0], return_inverse=True)
    dist = st.bfs_from_sources(g, srcs, max_dist=None)
    d = dist[inv, pairs[1]]
    keep = d >= 0
    g["edge_label_index"] = pairs[:, keep].astype(np.int32)
    g["edge_label"] = np.minimum(d[keep], 4).astype(np.int64)


def negative_sampling(edge_index: np.ndarray, num_nodes: int,
                      num_samples: int,
                      rng: Optional[np.random.Generator] = None
                      ) -> np.ndarray:
    """Sample non-edges (reference transform.py:101-110 via PyG
    negative_sampling): rejection sampling against the existing edge set."""
    rng = rng or np.random.default_rng()
    n = np.int64(num_nodes)
    edge_keys = np.sort(edge_index[0].astype(np.int64) * n
                        + edge_index[1].astype(np.int64))

    def is_edge(keys):
        if not len(edge_keys):
            return np.zeros(len(keys), bool)
        pos = np.minimum(np.searchsorted(edge_keys, keys),
                         len(edge_keys) - 1)
        return edge_keys[pos] == keys

    # vectorized rejection sampling: draw batches, drop self-loops,
    # existing edges and duplicates (sorted-key membership instead of a
    # python set — no per-candidate loop)
    out = np.zeros(0, np.int64)
    rounds = 0
    while len(out) < num_samples and rounds < 20:
        rounds += 1
        m = max(256, 2 * (num_samples - len(out)))
        u = rng.integers(0, num_nodes, size=m).astype(np.int64)
        v = rng.integers(0, num_nodes, size=m).astype(np.int64)
        keys = u * n + v
        ok = (u != v) & ~is_edge(keys)
        keys = keys[ok]
        # dedupe within batch and against accepted, preserving draw order
        _, first = np.unique(keys, return_index=True)
        keys = keys[np.sort(first)]
        if len(out):
            keys = keys[~np.isin(keys, out)]
        out = np.concatenate([out, keys])[:num_samples]
    # dense graphs can exhaust rejection sampling; keep the count static
    # (callers rely on fixed shapes) by filling with random non-self
    # pairs even if they collide with edges
    while len(out) < num_samples:
        m = num_samples - len(out)
        u = rng.integers(0, num_nodes, size=m).astype(np.int64)
        v = rng.integers(0, num_nodes, size=m).astype(np.int64)
        keys = (u * n + v)[u != v]
        out = np.concatenate([out, keys])[:num_samples]
    pairs = np.stack([out // n, out % n]).astype(np.int32)
    return pairs
