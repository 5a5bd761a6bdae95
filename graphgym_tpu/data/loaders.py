"""Dataset loading, splitting, transforms, and GraphBatch batching.

Re-implements the reference's L2 pipeline (graphgym/loader.py:24-260):
  load raw graphs -> feature augmentation -> label replacement -> split
  -> ego/edge transform per split -> batched loaders
but produces static-shape GraphBatch pytrees ready for jit instead of
DeepSNAP Batches.

Formats (cfg.dataset.format, 'Tfg-' prefixes accepted like
loader.py:111-118): 'nx' = pickled networkx lists (the shipped
ba/ws/scalefree/smallworld corpora), 'Planetoid' / 'PyG' = raw Planetoid
files parsed natively (no torch-geometric dependency), 'TU' = raw TU
format, 'syn' = generated on the fly.
"""

from __future__ import annotations

import logging
import os
import pickle
import time
from typing import List, Optional, Sequence

import numpy as np

from graphgym_tpu import register
from graphgym_tpu.data.augment import FeatureAugment, replace_label
from graphgym_tpu.data.hostgraph import HostGraph, from_networkx
from graphgym_tpu.data.transforms import (edge_nets, ego_nets,
                                          negative_sampling,
                                          path_len_labels,
                                          remove_node_feature)
from graphgym_tpu.graphs.container import (GraphBatch, bucket_size,
                                           build_graph_batch)

# Known locations of the shipped synthetic corpora (read-only reference
# checkout first, then local dirs).
_SEARCH_DIRS = [
    "./datasets", "./run/datasets",
    "/root/reference/run/datasets", "/root/reference/datasets",
]


def _find_file(name: str, dataset_dir: str) -> Optional[str]:
    for d in [dataset_dir] + _SEARCH_DIRS:
        p = os.path.join(d, name)
        if os.path.exists(p):
            return p
    return None


def _find_raw(fname: str, dataset_dir: str, subname: str) -> str:
    """Locate a raw dataset file: probe <dir>/<subname>/raw,
    <dir>/<subname>, and <dir> for every search directory."""
    for d in [dataset_dir] + _SEARCH_DIRS:
        for sub in (os.path.join(d, subname, "raw"),
                    os.path.join(d, subname), d):
            p = os.path.join(sub, fname)
            if os.path.exists(p):
                return p
    raise FileNotFoundError(f"{fname} not found under {dataset_dir}")


# Synthetic corpora we can regenerate from scratch when the shipped
# pickle is absent (bare-checkout support): name -> (generator kind, n).
# scalefree/smallworld are the ID-GNN paper's names for the ba/ws
# corpus families (reference datasets/syn_graph.py:25-87 generates only
# those two processes).
_REGENERABLE = {
    "ba": ("ba", 64), "ws": ("ws", 64),
    "scalefree": ("ba", 64), "smallworld": ("ws", 64),
    "ba500": ("ba", 500), "ws500": ("ws", 500),
}


def load_nx(name: str, dataset_dir: str) -> List[HostGraph]:
    """Pickled networkx graph lists (reference load_nx,
    loader.py:78-92).  Known synthetic corpora are regenerated (and
    cached to dataset_dir) when no pickle exists anywhere, so a bare
    checkout can run the full synthetic config library."""
    path = _find_file(f"{name}.pkl", dataset_dir)
    if path is None and name in _REGENERABLE:
        from graphgym_tpu.data.synthetic import (generate_syn_graphs,
                                                 save_syn)
        kind, n = _REGENERABLE[name]
        logging.warning(
            "%s.pkl not found; regenerating the %s synthetic corpus "
            "(structurally equivalent to the shipped pickle, not "
            "graph-identical)", name, kind)
        graphs = generate_syn_graphs(kind=kind, num_graphs=256, n=n)
        os.makedirs(dataset_dir, exist_ok=True)
        path = os.path.join(dataset_dir, f"{name}.pkl")
        save_syn(path, graphs)
        return graphs
    if path is None:
        raise FileNotFoundError(
            f"{name}.pkl not found under {dataset_dir} or {_SEARCH_DIRS}")
    with open(path, "rb") as f:
        graphs = pickle.load(f)
    if not isinstance(graphs, list):
        graphs = [graphs]
    # regenerated caches hold HostGraphs already; shipped pickles hold nx
    return [g if isinstance(g, HostGraph) else from_networkx(g)
            for g in graphs]


def load_planetoid(name: str, dataset_dir: str) -> List[HostGraph]:
    """Native parser for the raw Planetoid files (ind.<name>.{x,tx,allx,
    y,ty,ally,graph,test.index}) — the format behind PyG's
    Planetoid('Cora'/'CiteSeer'/'PubMed') used at reference
    loader.py:32-33."""
    lname = name.lower()
    base = None
    for d in [dataset_dir] + _SEARCH_DIRS:
        cand = [os.path.join(d, name, "raw"), os.path.join(d, name),
                os.path.join(d, lname, "raw"), d]
        for c in cand:
            if os.path.exists(os.path.join(c, f"ind.{lname}.graph")):
                base = c
                break
        if base:
            break
    if base is None:
        raise FileNotFoundError(
            f"Planetoid raw files for {name} not found (need "
            f"ind.{lname}.* under {dataset_dir})")

    def _load(suffix):
        with open(os.path.join(base, f"ind.{lname}.{suffix}"), "rb") as f:
            return pickle.load(f, encoding="latin1")

    x, tx, allx = _load("x"), _load("tx"), _load("allx")
    y, ty, ally = _load("y"), _load("ty"), _load("ally")
    graph = _load("graph")
    test_idx = np.loadtxt(os.path.join(base, f"ind.{lname}.test.index"),
                          dtype=np.int64)

    def dense(m):
        return np.asarray(m.todense()) if hasattr(m, "todense") \
            else np.asarray(m)

    allx, tx = dense(allx), dense(tx)
    ally, ty = np.asarray(ally), np.asarray(ty)
    test_sorted = np.sort(test_idx)
    n = int(test_idx.max()) + 1
    d = allx.shape[1]
    feat = np.zeros((n, d), np.float32)
    labels = np.zeros((n, ally.shape[1]), np.float32)
    feat[:allx.shape[0]] = allx
    labels[:ally.shape[0]] = ally
    # row i of tx/ty corresponds to node test_idx[i] (CiteSeer has gaps
    # in test_idx; the missing isolated nodes keep zero features)
    del test_sorted
    feat[test_idx] = tx
    labels[test_idx] = ty
    edges = []
    for u, nbrs in graph.items():
        for v in nbrs:
            if u < n and v < n:
                edges.append((u, v))
    edge_index = np.asarray(edges, np.int32).T
    # symmetrize + dedup
    und = np.unique(np.concatenate(
        [edge_index, edge_index[::-1]], axis=1), axis=1)
    hg = HostGraph(n, und.astype(np.int32))
    hg["node_feature"] = feat
    hg["node_label"] = labels.argmax(-1).astype(np.int64)
    return [hg]


def load_tu(name: str, dataset_dir: str) -> List[HostGraph]:
    """Native parser for raw TU datasets (DS_A.txt,
    DS_graph_indicator.txt, DS_graph_labels.txt, optional
    DS_node_labels.txt / DS_node_attributes.txt) — the format behind
    TUDataset at reference loader.py:34-53."""
    base = os.path.dirname(_find_raw(f"{name}_A.txt", dataset_dir, name))

    def maybe(fname):
        p = os.path.join(base, fname)
        return np.loadtxt(p, delimiter=",", ndmin=2) \
            if os.path.exists(p) else None

    a = np.loadtxt(os.path.join(base, f"{name}_A.txt"),
                   delimiter=",").astype(np.int64) - 1   # 1-indexed
    indicator = np.loadtxt(
        os.path.join(base, f"{name}_graph_indicator.txt")).astype(
        np.int64) - 1
    glabels = maybe(f"{name}_graph_labels.txt")
    nlabels = maybe(f"{name}_node_labels.txt")
    nattrs = maybe(f"{name}_node_attributes.txt")
    elabels = maybe(f"{name}_edge_labels.txt")
    eattrs = maybe(f"{name}_edge_attributes.txt")

    graphs = []
    num_graphs = indicator.max() + 1
    node_offsets = np.zeros(num_graphs + 1, np.int64)
    counts = np.bincount(indicator, minlength=num_graphs)
    node_offsets[1:] = np.cumsum(counts)
    edge_graph = indicator[a[:, 0]]
    for gi in range(num_graphs):
        lo, hi = node_offsets[gi], node_offsets[gi + 1]
        em = edge_graph == gi
        ei = (a[em] - lo).T.astype(np.int32)
        hg = HostGraph(int(hi - lo), ei)
        feats = []
        if nattrs is not None:
            feats.append(nattrs[lo:hi].astype(np.float32))
        if nlabels is not None:
            lab = nlabels[lo:hi].astype(np.int64).reshape(-1)
            k = int(nlabels.max()) + 1
            oh = np.zeros((len(lab), k), np.float32)
            oh[np.arange(len(lab)), lab] = 1
            feats.append(oh)
        if not feats:
            feats.append(np.ones((int(hi - lo), 1), np.float32))
        hg["node_feature"] = np.concatenate(feats, axis=1)
        efeats = []
        if eattrs is not None:
            efeats.append(eattrs[em].astype(np.float32))
        if elabels is not None:
            lab = elabels[em].astype(np.int64).reshape(-1)
            k = int(elabels.max()) + 1
            oh = np.zeros((len(lab), k), np.float32)
            oh[np.arange(len(lab)), lab] = 1
            efeats.append(oh)
        if efeats:
            hg["edge_feature"] = np.concatenate(efeats, axis=1)
        if glabels is not None:
            gl = glabels[gi].reshape(-1)[0]
            hg["graph_label"] = np.asarray([int(gl)], np.int64)
        graphs.append(hg)
    return graphs


def tu_simple_filter(graphs: List[HostGraph]) -> List[HostGraph]:
    """Reference loader.py:45-53: for synthetic node tasks on TU data,
    keep the 100 smallest graphs that have > 200 edges."""
    sizes = np.array([g.num_edges if g.num_edges >= 200 else 9999
                      for g in graphs])
    order = np.argsort(sizes, kind="stable")[:100]
    return [graphs[i] for i in order]


def load_karate() -> List[HostGraph]:
    """Zachary's karate club (reference loader.py:54-55 KarateClub):
    34 nodes, 78 undirected edges, community labels."""
    edges = [
        (0, 1), (0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (0, 7), (0, 8),
        (0, 10), (0, 11), (0, 12), (0, 13), (0, 17), (0, 19), (0, 21),
        (0, 31), (1, 2), (1, 3), (1, 7), (1, 13), (1, 17), (1, 19),
        (1, 21), (1, 30), (2, 3), (2, 7), (2, 8), (2, 9), (2, 13),
        (2, 27), (2, 28), (2, 32), (3, 7), (3, 12), (3, 13), (4, 6),
        (4, 10), (5, 6), (5, 10), (5, 16), (6, 16), (8, 30), (8, 32),
        (8, 33), (9, 33), (13, 33), (14, 32), (14, 33), (15, 32),
        (15, 33), (18, 32), (18, 33), (19, 33), (20, 32), (20, 33),
        (22, 32), (22, 33), (23, 25), (23, 27), (23, 29), (23, 32),
        (23, 33), (24, 25), (24, 27), (24, 31), (25, 31), (26, 29),
        (26, 33), (27, 33), (28, 31), (28, 33), (29, 32), (29, 33),
        (30, 32), (30, 33), (31, 32), (31, 33), (32, 33)]
    labels = [1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 1, 1, 1, 1, 0, 0, 1, 1, 0,
              1, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    arr = np.asarray(edges, np.int32)
    ei = np.concatenate([arr, arr[:, ::-1]], axis=0).T
    g = HostGraph(34, ei.astype(np.int32))
    g["node_feature"] = np.eye(34, dtype=np.float32)
    g["node_label"] = np.asarray(labels, np.int64)
    return [g]


def _csr_to_dense(data, indices, indptr, shape) -> np.ndarray:
    out = np.zeros(shape, np.float32)
    rows = np.repeat(np.arange(shape[0]), np.diff(indptr))
    out[rows, indices] = data
    return out


def load_npz_graph(fname: str, dataset_dir: str) -> List[HostGraph]:
    """Parser for the GNN-benchmark npz format behind PyG's
    Coauthor/Amazon datasets (reference loader.py:56-66): CSR adjacency
    (adj_*), CSR or dense attributes (attr_*), integer labels."""
    path = _find_raw(fname, dataset_dir, fname.split(".")[0])
    with np.load(path, allow_pickle=True) as z:
        adj_shape = tuple(int(v) for v in z["adj_shape"])
        n = adj_shape[0]
        rows = np.repeat(np.arange(n), np.diff(z["adj_indptr"]))
        cols = np.asarray(z["adj_indices"], np.int64)
        if "attr_matrix" in z:
            x = np.asarray(z["attr_matrix"], np.float32)
        else:
            x = _csr_to_dense(z["attr_data"], z["attr_indices"],
                              z["attr_indptr"],
                              (n, int(z["attr_shape"][1])))
        labels = np.asarray(z["labels"], np.int64)
    # symmetrize + drop self loops (PyG read_npz: to_undirected,
    # remove_self_loops)
    s = np.concatenate([rows, cols])
    r = np.concatenate([cols, rows])
    keep = s != r
    pairs = np.unique(np.stack([s[keep], r[keep]], axis=1), axis=0)
    g = HostGraph(n, pairs.T.astype(np.int32))
    g["node_feature"] = x
    g["node_label"] = labels
    return [g]


def load_ppi(dataset_dir: str) -> List[HostGraph]:
    """Parser for the GraphSAGE PPI raw files behind PyG's PPI dataset
    (reference loader.py:69-70): per split {split}_graph.json
    (node-link), {split}_feats.npy, {split}_labels.npy (multi-label),
    {split}_graph_id.npy — one HostGraph per protein graph."""
    import json

    base = os.path.dirname(
        _find_raw("train_graph.json", dataset_dir, "PPI"))
    graphs = []
    for split in ("train", "valid", "test"):
        gpath = os.path.join(base, f"{split}_graph.json")
        if not os.path.exists(gpath):
            continue
        with open(gpath) as f:
            gdata = json.load(f)
        feats = np.load(os.path.join(base, f"{split}_feats.npy"))
        labels = np.load(os.path.join(base, f"{split}_labels.npy"))
        gids = np.load(os.path.join(base, f"{split}_graph_id.npy"))
        links = np.asarray([(l["source"], l["target"])
                            for l in gdata["links"]], np.int64)
        links = links.reshape(-1, 2)
        for gid in np.unique(gids):
            nodes = np.where(gids == gid)[0]
            lo, hi = nodes.min(), nodes.max() + 1
            em = (links[:, 0] >= lo) & (links[:, 0] < hi) \
                & (links[:, 1] >= lo) & (links[:, 1] < hi)
            e = links[em] - lo
            # symmetrize (GraphSAGE json stores one direction)
            pairs = np.unique(np.concatenate([e, e[:, ::-1]]), axis=0)
            g = HostGraph(int(hi - lo), pairs.T.astype(np.int32)
                          if len(pairs) else np.zeros((2, 0), np.int32))
            g["node_feature"] = feats[lo:hi].astype(np.float32)
            g["node_label"] = labels[lo:hi].astype(np.int64)
            graphs.append(g)
    return graphs


def load_qm7b(dataset_dir: str) -> List[HostGraph]:
    """Parser for qm7b.mat behind PyG's QM7b (reference loader.py:71-72):
    Coulomb matrices X [N, 23, 23] -> dense weighted graphs with the
    coulomb entry as 1-d edge_feature, targets T [N, 14] as
    graph_label."""
    from scipy.io import loadmat

    path = _find_raw("qm7b.mat", dataset_dir, "QM7b")
    mat = loadmat(path)
    coulomb = np.asarray(mat["X"], np.float32)
    targets = np.asarray(mat["T"], np.float32)
    graphs = []
    for i in range(coulomb.shape[0]):
        adj = coulomb[i]
        s, r = np.nonzero(adj)
        g = HostGraph(adj.shape[0],
                      np.stack([s, r]).astype(np.int32))
        g["edge_feature"] = adj[s, r][:, None]
        g["node_feature"] = np.ones((adj.shape[0], 1), np.float32)
        g["graph_label"] = targets[i]
        graphs.append(g)
    return graphs


def load_mnist_superpixels(dataset_dir: str) -> List[HostGraph]:
    """Parser for MNISTSuperpixels.pt behind PyG MNIST (reference
    loader.py:67-68): a torch-saved [train, test] pair of lists of
    per-graph dicts (x, edge_index, pos, y)."""
    import torch

    path = _find_raw("MNISTSuperpixels.pt", dataset_dir, "MNIST")
    inputs = torch.load(path, weights_only=False)
    graphs = []
    for split in inputs:
        for d in split:
            ei = np.asarray(d["edge_index"], np.int32).reshape(2, -1)
            x = np.asarray(d["x"], np.float32)
            g = HostGraph(x.shape[0], ei)
            pos = d.get("pos")
            g["node_feature"] = x if pos is None else np.concatenate(
                [x, np.asarray(pos, np.float32)], axis=1)
            g["graph_label"] = np.asarray(
                [int(np.asarray(d["y"]).reshape(-1)[0])], np.int64)
            graphs.append(g)
    return graphs


def load_dataset(cfg) -> List[HostGraph]:
    fmt = cfg.dataset.format
    if fmt.startswith("Tfg-"):
        fmt = fmt[4:]
    name = cfg.dataset.name
    for func in register.loader_dict.values():
        graphs = func(fmt, name, cfg.dataset.dir)
        if graphs is not None:
            return graphs
    if fmt == "nx":
        return load_nx(name, cfg.dataset.dir)
    if fmt in ("PyG", "Planetoid"):
        if name in ("Cora", "CiteSeer", "PubMed"):
            return load_planetoid(name, cfg.dataset.dir)
        if name == "Karate":
            return load_karate()
        if name.startswith("TU_"):
            # TU_IMDB -> IMDB-MULTI with constant features
            # (reference loader.py:36-40)
            graphs = load_tu("IMDB-MULTI" if name[3:] == "IMDB"
                             else name[3:], cfg.dataset.dir)
            if cfg.dataset.tu_simple and cfg.dataset.task != "graph":
                graphs = tu_simple_filter(graphs)
            return graphs
        if "Coauthor" in name:
            fname = ("ms_academic_cs.npz" if "CS" in name
                     else "ms_academic_phy.npz")
            return load_npz_graph(fname, cfg.dataset.dir)
        if "Amazon" in name:
            fname = ("amazon_electronics_computers.npz"
                     if "Computers" in name
                     else "amazon_electronics_photo.npz")
            return load_npz_graph(fname, cfg.dataset.dir)
        if name == "PPI":
            return load_ppi(cfg.dataset.dir)
        if name == "QM7b":
            return load_qm7b(cfg.dataset.dir)
        if name == "MNIST":
            return load_mnist_superpixels(cfg.dataset.dir)
        raise ValueError(f"PyG dataset {name} not supported natively; "
                         "provide raw files or use nx format")
    if fmt == "TU":
        graphs = load_tu(name, cfg.dataset.dir)
        if cfg.dataset.tu_simple and cfg.dataset.task != "graph":
            graphs = tu_simple_filter(graphs)
        return graphs
    if fmt == "OGB":
        # native raw-directory parser + official split injection — no
        # `ogb` package / network needed (reference loader_pyg.py:84-138,
        # loader.py:118-124)
        from graphgym_tpu.data.ogb import load_ogb
        return load_ogb(name, cfg.dataset.dir)
    if fmt == "syn":
        from graphgym_tpu.data.synthetic import generate_syn_graphs
        return generate_syn_graphs(name, seed=cfg.seed)
    raise ValueError(f"Unknown data format: {cfg.dataset.format}")


# ----------------------------------------------------------------- splits

def split_dataset(graphs: List[HostGraph], cfg,
                  rng: np.random.Generator) -> List[List[HostGraph]]:
    """DeepSNAP-style random split (reference loader.py:227-230).

    Transductive: each split shares the graphs; supervision indices
    (node_label_index / edge supervision) are partitioned by ratio.
    Inductive: the list of graphs is partitioned.
    """
    from graphgym_tpu.data.ogb import has_ogb_split, ogb_split_dataset
    if has_ogb_split(graphs):
        # official OGB split indices override the random ratio split
        # (reference loader_pyg.py:84-138, loader.py:118-124)
        return ogb_split_dataset(graphs, cfg, rng)

    ratios = list(cfg.dataset.split)
    if cfg.dataset.task == "graph":
        transductive = False
    else:
        transductive = cfg.dataset.transductive

    if not transductive:
        idx = np.arange(len(graphs))
        if cfg.dataset.shuffle_split:
            rng.shuffle(idx)
        bounds = np.cumsum([int(r * len(graphs)) for r in ratios[:-1]])
        parts = np.split(idx, bounds)
        splits = [[graphs[i] for i in part] for part in parts]
        for si, part in enumerate(splits):
            for g in part:
                _default_supervision(g, cfg, rng, split_index=si)
        return splits

    # transductive
    splits = [[] for _ in ratios]
    for g in graphs:
        if cfg.dataset.task == "node":
            n = g.num_nodes
            perm = rng.permutation(n) if cfg.dataset.shuffle_split \
                else np.arange(n)
            bounds = np.cumsum([int(r * n) for r in ratios[:-1]])
            parts = np.split(perm, bounds)
            for si, part in enumerate(parts):
                gg = g.copy()
                gg["node_label_index"] = np.sort(part)
                splits[si].append(gg)
        elif cfg.dataset.task in ("link_pred", "edge"):
            e = g.num_edges
            # split undirected edge pairs (both directions together)
            s, r = g.senders, g.receivers
            upper = s < r
            pairs = np.stack([s[upper], r[upper]], axis=0)
            m = pairs.shape[1]
            perm = rng.permutation(m)
            bounds = np.cumsum([int(rt * m) for rt in ratios[:-1]])
            parts = np.split(perm, bounds)
            train_pairs = pairs[:, parts[0]]
            msg_edges = np.concatenate(
                [train_pairs, train_pairs[::-1]], axis=1)
            disjoint = cfg.dataset.edge_train_mode == "disjoint"
            for si, part in enumerate(parts):
                gg = g.copy()
                if si == 0 and disjoint:
                    # disjoint train mode (reference config.py:150-155 via
                    # DeepSNAP): train positives are re-split into
                    # message-passing edges (edge_message_ratio) and
                    # supervision edges; supervision edges are NOT passed
                    # messages during training
                    msg_pairs, pos = _disjoint_split(
                        train_pairs, cfg.dataset.edge_message_ratio, rng)
                    _set_message_edges(gg, g.edge_index,
                                       g.get("edge_feature"),
                                       np.concatenate(
                                           [msg_pairs, msg_pairs[::-1]],
                                           axis=1))
                else:
                    pos = pairs[:, part]
                    # message edges: train edges for every split
                    _set_message_edges(gg, g.edge_index,
                                       g.get("edge_feature"), msg_edges)
                num_neg = int(pos.shape[1] *
                              (cfg.dataset.edge_negative_sampling_ratio
                               if si == 0 else 1.0))
                neg = negative_sampling(g.edge_index, g.num_nodes,
                                        num_neg, rng)
                eli = np.concatenate([pos, neg], axis=1)
                el = np.concatenate([np.ones(pos.shape[1]),
                                     np.zeros(neg.shape[1])])
                gg["edge_label_index"] = eli.astype(np.int32)
                gg["edge_label"] = el.astype(np.int64)
                if si == 0 and disjoint and cfg.dataset.resample_disjoint:
                    # loader re-splits message/supervision each epoch
                    # (reference config.py:159-160)
                    gg["_train_pairs"] = train_pairs.astype(np.int32)
                    gg["_full_edge_index"] = g.edge_index.astype(np.int32)
                    if "edge_feature" in g:
                        gg["_full_edge_feature"] = np.asarray(
                            g["edge_feature"])
                elif si == 0 and cfg.dataset.resample_negative:
                    # loader re-draws the negative half each epoch
                    # (reference config.py:162-163); redraws exclude the
                    # full edge set, not just the message graph
                    gg["_pos_pairs"] = pos.astype(np.int32)
                    gg["_full_edge_index"] = g.edge_index.astype(np.int32)
                splits[si].append(gg)
        else:
            raise ValueError(
                f"Transductive split undefined for task "
                f"{cfg.dataset.task}")
    return splits


def _default_supervision(g: HostGraph, cfg,
                         rng: Optional[np.random.Generator] = None,
                         split_index: int = 0) -> None:
    """Inductive splits supervise every node (node task); link task
    supervision depends on cfg.dataset.edge_train_mode:

    - 'all': message edges = supervision positives = the full edge set
      (plus 1:1 sampled negatives).  This is the csv's leaky *edge*
      task — an ID layer can read a supervision edge straight off the
      adjacency (reference analysis/idgnn.csv edge rows, ~1.0).
    - 'disjoint' (link_pred only): EVERY split's graphs hold the
      supervision positives OUT of the message graph — message edges =
      edge_message_ratio of the undirected pairs, supervision = the
      rest + negatives (DeepSNAP disjoint edge_train_mode, reference
      config.py:150-155, applied before the transform-'edge' step of
      loader.py:180-186).  This is the protocol behind the csv's
      link_pred rows (~0.80 for ID layers).

    Negative sampling ratio follows reference loader.py:231-233: the
    configured ratio on the train split, 1.0 on eval splits."""
    if cfg.dataset.task == "node" and "node_label_index" not in g:
        g["node_label_index"] = np.arange(g.num_nodes)
    if cfg.dataset.task in ("link_pred", "edge") \
            and "edge_label_index" not in g:
        rng = rng or np.random.default_rng(cfg.seed)
        s, r = g.senders, g.receivers
        upper = s < r
        pairs = np.stack([s[upper], r[upper]], axis=0)
        if pairs.shape[1] == 0:   # directed-only storage; use all edges
            pairs = g.edge_index
        full_edge_index = g.edge_index
        full_edge_feature = (np.asarray(g["edge_feature"])
                             if "edge_feature" in g else None)
        disjoint = (cfg.dataset.task == "link_pred"
                    and cfg.dataset.edge_train_mode == "disjoint")
        if disjoint:
            msg_pairs, pos = _disjoint_split(
                pairs, cfg.dataset.edge_message_ratio, rng)
            if split_index >= 1 and cfg.dataset.get(
                    "link_eval_message_full", False):
                # probe (config.py link_eval_message_full): eval keeps
                # the FULL graph as message — supervision positives
                # visible to message passing ("leaky val" hypothesis)
                pass
            else:
                _set_message_edges(
                    g, full_edge_index, full_edge_feature,
                    np.concatenate([msg_pairs, msg_pairs[::-1]],
                                   axis=1))
        else:
            pos = pairs
        if os.environ.get("GRAPHGYM_LINK_BOTH_DIRS") == "1":
            # protocol probe (docs/PARITY_NOTES.md): DeepSNAP stores
            # undirected supervision edges in both directions — double
            # the positives (and the negative draw scales with them)
            pos = np.concatenate([pos, pos[::-1]], axis=1)
        ratio = (cfg.dataset.edge_negative_sampling_ratio
                 if split_index == 0 else 1.0)
        num_neg = int(pos.shape[1] * ratio)
        neg = negative_sampling(full_edge_index, g.num_nodes,
                                max(num_neg, 1), rng)
        g["edge_label_index"] = np.concatenate(
            [pos, neg], axis=1).astype(np.int32)
        g["edge_label"] = np.concatenate(
            [np.ones(pos.shape[1]), np.zeros(neg.shape[1])]).astype(
            np.int64)
        if split_index == 0 and disjoint \
                and cfg.dataset.resample_disjoint:
            # loader re-splits message/supervision + re-draws negatives
            # each epoch (reference config.py:159-160)
            g["_train_pairs"] = pairs.astype(np.int32)
            g["_full_edge_index"] = full_edge_index.astype(np.int32)
            if full_edge_feature is not None:
                g["_full_edge_feature"] = full_edge_feature
        elif split_index == 0 and cfg.dataset.resample_negative:
            g["_pos_pairs"] = pos.astype(np.int32)
            # per-epoch redraws must exclude the FULL edge set (incl.
            # held-out supervision positives), not just message edges
            g["_full_edge_index"] = full_edge_index.astype(np.int32)
        elif split_index >= 1 and cfg.dataset.get(
                "link_eval_resample_negative", False):
            # probe (config.py link_eval_resample_negative): eval
            # negatives re-drawn at each eval pass — best-val then
            # maxes over negative-set realizations
            g["_pos_pairs"] = pos.astype(np.int32)
            g["_full_edge_index"] = full_edge_index.astype(np.int32)


def _disjoint_split(pairs: np.ndarray, message_ratio: float, rng):
    """Split undirected train pairs [2, M] into (message, supervision)
    (reference cfg.dataset.edge_message_ratio, config.py:152-155)."""
    m = pairs.shape[1]
    k = int(message_ratio * m)
    if m >= 2:
        k = min(max(k, 1), m - 1)  # both halves non-empty
    perm = rng.permutation(m)
    return pairs[:, perm[:k]], pairs[:, perm[k:]]


def _set_message_edges(gg: HostGraph, orig_edge_index: np.ndarray,
                       orig_edge_feature, new_edges: np.ndarray) -> None:
    """Replace gg's edge set, keeping per-edge features aligned by
    looking each new (u, v) up in the original edge list."""
    gg.edge_index = new_edges.astype(np.int32)
    gg._csr_indptr = gg._csr_indices = None
    if orig_edge_feature is None:
        return
    n = np.int64(gg.num_nodes)
    old_key = orig_edge_index[0].astype(np.int64) * n + orig_edge_index[1]
    order = np.argsort(old_key, kind="stable")
    new_key = new_edges[0].astype(np.int64) * n + new_edges[1]
    loc = np.searchsorted(old_key[order], new_key)
    loc = np.clip(loc, 0, max(len(old_key) - 1, 0))
    hit = old_key[order][loc] == new_key
    cols = np.where(hit, order[loc], 0)
    out = np.array(np.asarray(orig_edge_feature)[cols])
    out[~hit] = 0
    gg["edge_feature"] = out


# ------------------------------------------------------------ create_dataset

def _cache_path(cfg) -> str:
    import hashlib
    key = "|".join(str(v) for v in (
        cfg.dataset.name, cfg.dataset.format, cfg.dataset.task,
        cfg.dataset.transform, cfg.dataset.augment_label,
        cfg.dataset.augment_feature, cfg.gnn.layers_mp,
        cfg.dataset.split, cfg.seed))
    digest = hashlib.sha256(key.encode()).hexdigest()[:16]
    return os.path.join(cfg.dataset.dir if os.path.isdir(
        cfg.dataset.dir) else ".", f"cache_{digest}.pkl")


def create_dataset(cfg, rng: Optional[np.random.Generator] = None
                   ) -> List[List[HostGraph]]:
    """Full pipeline (reference create_dataset, loader.py:191-244).
    cfg.dataset.cache_save/cache_load persist the processed splits
    (reference config.py:188-192 caveats apply: the cache key covers
    the main options only)."""
    if cfg.dataset.cache_load:
        path = _cache_path(cfg)
        if os.path.exists(path):
            with open(path, "rb") as f:
                splits = pickle.load(f)
            set_dataset_info(splits, cfg)
            logging.info("Loaded cached dataset from %s", path)
            return splits
    rng = rng or np.random.default_rng(cfg.seed)
    t1 = time.time()
    graphs = load_dataset(cfg)
    # min-node filter (loader.py:129-138)
    min_node = 0 if cfg.dataset.task == "graph" else 5
    graphs = [g for g in graphs if g.num_nodes > min_node]

    t2 = time.time()
    if cfg.dataset.remove_feature:
        for g in graphs:
            remove_node_feature(g)
    aug = FeatureAugment(rng)
    aug.augment(graphs, cfg)
    if cfg.dataset.augment_label:
        for g in graphs:
            replace_label(g, cfg)
    # ID-GNN path-prediction labels (loader.py:162-164)
    if cfg.dataset.task == "edge" and "id" in cfg.gnn.layer_type:
        for g in graphs:
            path_len_labels(g, rng=rng)

    t3 = time.time()
    splits = split_dataset(graphs, cfg, rng)

    t4 = time.time()
    if cfg.dataset.transform == "ego":
        radius = cfg.gnn.layers_mp
        splits = [[ego_nets(g, radius=radius) for g in part]
                  for part in splits]
    elif cfg.dataset.transform == "edge":
        splits = [[edge_nets(g) for g in part] for part in splits]
        cfg.dataset.task = "node"
    t5 = time.time()
    logging.info(
        "Load: %.4fs, Before split: %.4fs, Split: %.4fs, "
        "After split: %.4fs", t2 - t1, t3 - t2, t4 - t3, t5 - t4)

    set_dataset_info(splits, cfg)
    if cfg.dataset.cache_save:
        path = _cache_path(cfg)
        try:
            with open(path, "wb") as f:
                pickle.dump(splits, f)
            logging.info("Cached dataset to %s", path)
        except OSError as exc:
            logging.warning("dataset cache_save failed: %s", exc)
    return splits


def set_dataset_info(splits, cfg) -> None:
    """Fill cfg.share dims (reference loader_pyg.py:165-191)."""
    g0 = splits[0][0]
    dim_in = int(np.asarray(g0["node_feature"]).shape[-1]) \
        if "node_feature" in g0 else 1
    for key in cfg.dataset.augment_feature:
        dim_in += int(np.asarray(g0[key]).shape[-1])
    cfg.share.dim_in = dim_in
    # output dim
    if cfg.dataset.task == "graph":
        labels = np.concatenate(
            [np.asarray(g["graph_label"]).reshape(-1)
             for part in splits for g in part])
    elif cfg.dataset.task in ("edge", "link_pred"):
        labels = np.concatenate(
            [np.asarray(g["edge_label"]).reshape(-1)
             for part in splits for g in part
             if "edge_label" in g]) if any(
            "edge_label" in g for part in splits for g in part) else \
            np.array([0, 1])
    else:
        labels = np.concatenate(
            [np.asarray(g["node_label"]).reshape(-1)
             for part in splits for g in part])
    # multi-label / multi-target label vectors (PPI [n,121], QM7b [14])
    if cfg.dataset.task == "graph":
        label_width = int(np.asarray(g0["graph_label"]).reshape(-1).size)
    elif cfg.dataset.task == "node" and "node_label" in g0:
        nl = np.asarray(g0["node_label"])
        label_width = int(nl.shape[-1]) if nl.ndim > 1 else 1
    else:
        label_width = 1

    if "classification" in cfg.dataset.task_type:
        if label_width > 1:
            # multi-label: one sigmoid per class (PPI)
            cfg.share.dim_out = label_width
        else:
            num = int(labels.max()) + 1 if labels.size else 2
            # binary link prediction decodes to a scalar
            if cfg.dataset.task in ("edge", "link_pred") \
                    and cfg.model.edge_decoding != "concat":
                cfg.share.dim_out = 1
            else:
                cfg.share.dim_out = max(num, 2)
    else:
        cfg.share.dim_out = label_width
    cfg.share.num_splits = len(splits)


# ----------------------------------------------------------------- batching

def graph_to_arrays(g: HostGraph, cfg):
    """Assemble final node features: [augment feats..., node_feature]
    (order of the reference Preprocess dim_dict,
    feature_augment.py:314-333)."""
    feats = []
    for key in cfg.dataset.augment_feature:
        v = np.asarray(g[key], np.float32)
        feats.append(v if v.ndim > 1 else v[:, None])
    if "node_feature" in g:
        v = np.asarray(g["node_feature"], np.float32)
        feats.append(v if v.ndim > 1 else v[:, None])
    if not feats:
        feats.append(np.ones((g.num_nodes, 1), np.float32))
    return np.concatenate(feats, axis=1)


class GraphLoader:
    """Batched loader producing static-shape GraphBatches.

    All batches share one padded (nodes, edges, labels) bucket so jit
    compiles a single program per split; train batches can be
    re-partitioned each epoch with ``shuffle_epoch`` without changing
    shapes (the reference reshuffles via DataLoader, loader.py:247-251).
    """

    def __init__(self, graphs: Sequence[HostGraph], cfg, *,
                 batch_size: int, shuffle: bool,
                 rng: Optional[np.random.Generator] = None):
        self.graphs = list(graphs)
        self.cfg = cfg
        self.batch_size = max(1, min(batch_size, len(self.graphs)))
        self.shuffle = shuffle
        self.rng = rng or np.random.default_rng(cfg.seed)
        self._plan_shapes()

    def _plan_shapes(self):
        bs = self.batch_size
        per_batch_nodes, per_batch_edges, per_batch_labels = [], [], []
        num_batches = (len(self.graphs) + bs - 1) // bs
        sizes = [(g.num_nodes, g.num_edges,
                  len(g.get("node_label_index", []))
                  if "node_label_index" in g else g.num_nodes,
                  g.get("edge_label_index").shape[1]
                  if "edge_label_index" in g
                  and g["edge_label_index"] is not None else 0,
                  len(g.get("node_id_index", []))
                  if "node_id_index" in g else 0)
                 for g in self.graphs]
        # worst-case batch = bs largest graphs
        top_n = sorted((s[0] for s in sizes), reverse=True)[:bs]
        top_e = sorted((s[1] for s in sizes), reverse=True)[:bs]
        top_l = sorted((s[2] for s in sizes), reverse=True)[:bs]
        top_el = sorted((s[3] for s in sizes), reverse=True)[:bs]
        top_id = sorted((s[4] for s in sizes), reverse=True)[:bs]
        bucket = self.cfg.tpu.pad_buckets
        self.pad_nodes = bucket_size(sum(top_n) + 1) if bucket \
            else sum(top_n) + 1
        self.pad_edges = bucket_size(max(sum(top_e), 1)) if bucket \
            else max(sum(top_e), 1)
        self.pad_labels = bucket_size(max(sum(top_l), 1)) if bucket \
            else max(sum(top_l), 1)
        self.pad_edge_labels = bucket_size(max(sum(top_el), 1)) \
            if bucket else max(sum(top_el), 1)
        self.pad_ids = bucket_size(max(sum(top_id), 1)) if bucket \
            else max(sum(top_id), 1)
        if self.cfg.tpu.mesh_shape:
            # multi-chip layouts need evenly divisible shard extents
            from graphgym_tpu.graphs.container import round_up
            shards = int(self.cfg.tpu.mesh_shape[0])
            self.pad_nodes = round_up(self.pad_nodes, shards)
            self.pad_edges = round_up(self.pad_edges, shards)

    def __len__(self):
        return (len(self.graphs) + self.batch_size - 1) // self.batch_size

    def batches(self, epoch: int = 0) -> List[GraphBatch]:
        resample_disjoint = (
            self.shuffle and self.cfg.dataset.resample_disjoint
            and any("_train_pairs" in g for g in self.graphs))
        if resample_disjoint:
            # re-split message/supervision edges + re-draw negatives each
            # epoch (reference config.py:159-160; DeepSNAP resample_disjoint).
            # Counts are ratio-determined so every epoch keeps the same
            # static shapes (no recompilation).
            from graphgym_tpu.data.transforms import negative_sampling
            for g in self.graphs:
                if "_train_pairs" not in g:
                    continue
                msg_pairs, pos = _disjoint_split(
                    g["_train_pairs"],
                    self.cfg.dataset.edge_message_ratio, self.rng)
                _set_message_edges(g, g["_full_edge_index"],
                                   g.get("_full_edge_feature"),
                                   np.concatenate(
                                       [msg_pairs, msg_pairs[::-1]],
                                       axis=1))
                num_neg = int(
                    pos.shape[1]
                    * self.cfg.dataset.edge_negative_sampling_ratio)
                neg = negative_sampling(g["_full_edge_index"],
                                        g.num_nodes, num_neg, self.rng)
                g["edge_label_index"] = np.concatenate(
                    [pos, neg], axis=1).astype(np.int32)
                g["edge_label"] = np.concatenate(
                    [np.ones(pos.shape[1]),
                     np.zeros(neg.shape[1])]).astype(np.int64)
        resample = (((self.shuffle
                      and self.cfg.dataset.resample_negative)
                     or (not self.shuffle
                         and self.cfg.dataset.get(
                             "link_eval_resample_negative", False)))
                    and any("_pos_pairs" in g for g in self.graphs))
        if resample:
            from graphgym_tpu.data.transforms import negative_sampling
            for g in self.graphs:
                if "_pos_pairs" not in g:
                    continue
                pos = g["_pos_pairs"]
                eli = np.asarray(g["edge_label_index"])
                num_neg = eli.shape[1] - pos.shape[1]
                neg = negative_sampling(
                    g.get("_full_edge_index", g.edge_index),
                    g.num_nodes, num_neg, self.rng)
                g["edge_label_index"] = np.concatenate(
                    [pos, neg], axis=1).astype(np.int32)
        # per-epoch node subsampling (reference cfg.train.sample_node /
        # node_per_graph, config.py:218-221; eval-side twin
        # cfg.val.sample_node / node_per_graph, config.py:204-206):
        # supervise a fresh random subset of node_per_graph nodes
        sample_group = self.cfg.train if self.shuffle else self.cfg.val
        sample_node = (sample_group.sample_node
                       and self.cfg.dataset.task == "node")
        if sample_node:
            k = sample_group.node_per_graph
            for g in self.graphs:
                base = g.get("_full_label_index")
                if base is None:
                    base = np.asarray(g.get("node_label_index",
                                            np.arange(g.num_nodes)))
                    g["_full_label_index"] = base
                sel = self.rng.choice(base, size=min(k, len(base)),
                                      replace=False)
                g["node_label_index"] = np.sort(sel)
        # With a single batch per epoch shuffling cannot change batch
        # composition; collate once and reuse (keeps host work out of
        # the epoch loop).
        static = (not self.shuffle or len(self) == 1) and not resample \
            and not sample_node and not resample_disjoint
        if static and getattr(self, "_cached", None) is not None:
            return self._cached
        order = np.arange(len(self.graphs))
        if self.shuffle and len(self.graphs) > 1 and not static:
            order = self.rng.permutation(order)
        out = []
        for i in range(0, len(order), self.batch_size):
            out.append(self._collate([self.graphs[j]
                                      for j in order[i:i + self.batch_size]]))
        if static:
            self._cached = out
        return out

    def _collate(self, graphs: List[HostGraph]) -> GraphBatch:
        cfg = self.cfg
        xs, ss, rs, gids = [], [], [], []
        node_labels, label_idx, id_idx = [], [], []
        edge_labels, edge_label_idx, graph_labels = [], [], []
        edge_feats = []
        offset = 0
        for gi, g in enumerate(graphs):
            xs.append(graph_to_arrays(g, cfg))
            ss.append(g.senders + offset)
            rs.append(g.receivers + offset)
            gids.append(np.full(g.num_nodes, gi, np.int32))
            if "edge_feature" in g:
                ef = np.asarray(g["edge_feature"], np.float32)
                edge_feats.append(ef if ef.ndim > 1 else ef[:, None])
            if "node_label" in g:
                lab = np.asarray(g["node_label"]).reshape(g.num_nodes, -1)
                node_labels.append(lab)
            if "node_label_index" in g:
                label_idx.append(np.asarray(g["node_label_index"]) + offset)
            if "node_id_index" in g:
                id_idx.append(np.asarray(g["node_id_index"]) + offset)
            if "edge_label" in g and g.get("edge_label") is not None:
                edge_labels.append(np.asarray(g["edge_label"]).reshape(-1))
            if "edge_label_index" in g \
                    and g.get("edge_label_index") is not None:
                edge_label_idx.append(
                    np.asarray(g["edge_label_index"]) + offset)
            if "graph_label" in g:
                # keep per-graph shape: scalar class -> (1,), multi-
                # target regression (e.g. QM7b) -> (T,)
                graph_labels.append(
                    np.asarray(g["graph_label"]).reshape(-1))
            offset += g.num_nodes

        x = np.concatenate(xs, axis=0)
        senders = np.concatenate(ss)
        receivers = np.concatenate(rs)
        num_graphs = len(graphs) + 1  # + padding graph slot

        kw = {}
        if node_labels:
            nl = np.concatenate(node_labels, axis=0)
            kw["node_label"] = nl.squeeze(-1) if nl.shape[-1] == 1 else nl
        if label_idx:
            li = np.concatenate(label_idx)
        elif cfg.dataset.task == "node":
            li = np.arange(offset)
        else:
            li = None
        if edge_labels:
            el = np.concatenate(edge_labels)
            kw["edge_label"] = _pad1(el, self.pad_edge_labels, 0)
            kw["edge_label_mask"] = _pad1(
                np.ones(len(el), bool), self.pad_edge_labels, False)
        if edge_label_idx:
            eli = np.concatenate(edge_label_idx, axis=1)
            pad_node = self.pad_nodes - 1
            kw["edge_label_index"] = np.stack([
                _pad1(eli[0], self.pad_edge_labels, pad_node),
                _pad1(eli[1], self.pad_edge_labels, pad_node)])
        if graph_labels:
            gl = np.stack(graph_labels)          # [G, 1] or [G, T]
            kw["graph_label"] = (gl[:, 0] if gl.shape[-1] == 1 else gl)
        if edge_feats and len(edge_feats) == len(graphs):
            kw["edge_feat"] = np.concatenate(edge_feats, axis=0)

        batch = build_graph_batch(
            senders, receivers, x,
            graph_ids=np.concatenate(gids),
            num_graphs=num_graphs,
            node_label_index=li,
            node_id_index=(np.concatenate(id_idx) if id_idx else None),
            pad_nodes_to=self.pad_nodes,
            pad_edges_to=self.pad_edges,
            **kw)
        # Pallas SpMM path: precompute normalized packed-chunk layouts
        impl = cfg.tpu.spmm_impl
        if impl == "auto":
            # pallas on a single TPU chip for full-batch AND multi-batch
            # (TU/ego) loaders — pack chunk counts are bucketed to
            # powers of two (graphs/packing.py) so batches share
            # compiled programs.  Sampler loaders redraw graphs each
            # epoch (fresh host-side packing every epoch), so they stay
            # on the XLA path unless spmm_impl=pallas is set explicitly.
            import jax
            impl = ("pallas"
                    if jax.default_backend() == "tpu"
                    and len(jax.devices()) == 1
                    and cfg.train.sampler == "full_batch"
                    and cfg.val.sampler == "full_batch" else "xla")
        if bool(cfg.tpu.mesh_shape) and cfg.tpu.partition == "auto":
            # Resolve the layout ONCE from this batch's measured halo
            # (VERDICT r3 weak #7: the loader knows halo_stats at plan
            # time — a dense cut, e.g. uniform/Zipf pairs at scale,
            # should take the replicated layout without user action).
            # The resolved value is written back to cfg so the Trainer
            # and later batches see one consistent layout.
            cfg.tpu.partition = _resolve_auto_layout(batch, cfg, offset)
        partition_node = bool(cfg.tpu.mesh_shape) \
            and cfg.tpu.partition == "node"
        if impl == "pallas" and not cfg.tpu.mesh_shape:
            from graphgym_tpu.graphs.packing import (build_packs,
                                                     kinds_for_layer)
            kinds = kinds_for_layer(cfg.gnn.layer_type)
            if kinds:
                packs = build_packs(
                    np.asarray(batch.senders),
                    np.asarray(batch.receivers),
                    np.asarray(batch.edge_weight),
                    np.asarray(batch.node_mask),
                    batch.num_nodes, kinds=kinds)
                batch = batch.replace(packs=packs)
        # re-pad the variable-length index lists to the split-wide bucket
        if batch.node_label_index is not None:
            batch = _repad_index(batch, "node_label_index", "label_mask",
                                 self.pad_labels)
        if batch.node_id_index is not None:
            batch = _repad_index(batch, "node_id_index", "id_mask",
                                 self.pad_ids)
        if partition_node:
            # Multi-chip 'node' layout: BFS-reorder nodes so shard-
            # contiguous row blocks are graph neighborhoods (small
            # halo), then attach per-kind halo-exchange plans that the
            # layers dispatch when the Trainer's mesh is active.
            from graphgym_tpu.graphs.container import permute_nodes
            from graphgym_tpu.graphs.packing import kinds_for_layer
            from graphgym_tpu.parallel.partition import (
                balanced_partition_order, build_plans)

            num_shards = int(cfg.tpu.mesh_shape[0])
            perm = balanced_partition_order(
                np.asarray(batch.senders), np.asarray(batch.receivers),
                np.asarray(batch.edge_weight), num_real=offset,
                num_nodes=batch.num_nodes, num_shards=num_shards)
            batch = permute_nodes(batch, perm)
            kinds = kinds_for_layer(cfg.gnn.layer_type)
            if kinds:
                import jax
                pack = (impl == "pallas"
                        and jax.default_backend() == "tpu")
                plans = build_plans(
                    np.asarray(batch.senders),
                    np.asarray(batch.receivers),
                    np.asarray(batch.edge_weight),
                    np.asarray(batch.node_mask), batch.num_nodes,
                    num_shards, kinds=kinds, pack=pack)
                batch = batch.replace(plans=plans)
        return batch


# Crossover threshold for cfg.tpu.partition == 'auto', calibrated on
# the SCALING_r3 sweeps: the partitioned layout moves bottleneck_rows
# per layer over ICI while the replicated layout all-reduces the full
# node table (~total_rows).  Zipf at 2 shards (ratio 0.50) still
# projects 0.99 partitioned; at 4 shards (ratio 0.76) it collapses to
# 0.40 — the crossover sits between, and 0.6 keeps every healthy sweep
# row partitioned while routing dense-cut graphs to replication.
AUTO_CROSSOVER_FRAC = 0.6


def _resolve_auto_layout(batch, cfg, num_real: int) -> str:
    """Pick 'node' (halo-exchange partition) vs 'replicated' (GSPMD
    all-reduce) from this batch's measured halo at plan time
    (docs/SCALING.md crossover guidance, now automatic)."""
    import logging

    from graphgym_tpu.graphs.container import permute_nodes
    from graphgym_tpu.graphs.packing import kinds_for_layer
    from graphgym_tpu.parallel.partition import (balanced_partition_order,
                                                 build_plans, halo_stats)

    kinds = kinds_for_layer(cfg.gnn.layer_type)
    if not kinds:
        return "replicated"
    num_shards = int(cfg.tpu.mesh_shape[0])
    perm = balanced_partition_order(
        np.asarray(batch.senders), np.asarray(batch.receivers),
        np.asarray(batch.edge_weight), num_real=num_real,
        num_nodes=batch.num_nodes, num_shards=num_shards)
    probe = permute_nodes(batch, perm)
    plans = build_plans(
        np.asarray(probe.senders), np.asarray(probe.receivers),
        np.asarray(probe.edge_weight), np.asarray(probe.node_mask),
        probe.num_nodes, num_shards, kinds=kinds[:1], pack=False)
    stats = halo_stats(next(iter(plans.values())))
    ratio = stats["bottleneck_rows"] / max(stats["total_rows"], 1)
    layout = "node" if ratio < AUTO_CROSSOVER_FRAC else "replicated"
    logging.info(
        "tpu.partition=auto -> %s (bottleneck %d / %d rows = %.3f, "
        "crossover %.2f)", layout, stats["bottleneck_rows"],
        stats["total_rows"], ratio, AUTO_CROSSOVER_FRAC)
    return layout


def _pad1(x, n, fill):
    if len(x) >= n:
        return x[:n]
    return np.concatenate([x, np.full(n - len(x), fill, dtype=x.dtype)])


def _repad_index(batch: GraphBatch, key: str, mask_key: str,
                 target: int) -> GraphBatch:
    idx = np.asarray(getattr(batch, key))
    mask = np.asarray(getattr(batch, mask_key))
    pad_node = batch.num_nodes - 1
    idx = _pad1(idx, target, pad_node)
    mask = _pad1(mask, target, False)
    return batch.replace(**{key: idx, mask_key: mask})


class SamplerLoader(GraphLoader):
    """Train loader drawing fresh sampled subgraphs each epoch
    (reference get_loader, loader_pyg.py:204-255).  Padding buckets are
    sized from an initial draw with 2x slack; oversized draws are
    re-bucketed (one extra compile)."""

    def __init__(self, graphs, cfg, *, batch_size, rng=None,
                 sampler: Optional[str] = None):
        self.base_graphs = list(graphs)
        self.cfg = cfg  # needed by _draw before super().__init__
        self.sampler_kind = sampler or cfg.train.sampler
        self.sample_rng = rng or np.random.default_rng(cfg.seed)
        first = self._draw(0)
        super().__init__(first, cfg, batch_size=batch_size,
                         shuffle=False, rng=self.sample_rng)
        # slack so later draws rarely exceed the bucket
        from graphgym_tpu.graphs.container import bucket_size
        self.pad_nodes = bucket_size(self.pad_nodes * 2)
        self.pad_edges = bucket_size(self.pad_edges * 2)
        self.pad_labels = bucket_size(self.pad_labels * 2)

    def _draw(self, epoch: int):
        from graphgym_tpu.data.samplers import make_sampled_graphs
        out = []
        for g in self.base_graphs:
            out.extend(make_sampled_graphs(g, self.cfg, self.sample_rng,
                                           sampler=self.sampler_kind))
        return out

    def batches(self, epoch: int = 0):
        self.graphs = self._draw(epoch)
        # grow buckets if a draw exceeds them (triggers recompile once)
        for g in self.graphs:
            if g.num_nodes + 1 > self.pad_nodes or \
                    g.num_edges > self.pad_edges:
                from graphgym_tpu.graphs.container import bucket_size
                self.pad_nodes = bucket_size(
                    max(self.pad_nodes, g.num_nodes + 1))
                self.pad_edges = bucket_size(
                    max(self.pad_edges, g.num_edges))
                self.pad_labels = max(self.pad_labels, self.pad_nodes)
        out = []
        for i in range(0, len(self.graphs), self.batch_size):
            out.append(self._collate(
                self.graphs[i:i + self.batch_size]))
        return out


def create_loader(splits: List[List[HostGraph]], cfg) -> List[GraphLoader]:
    """One loader per split; train shuffles; non-full-batch samplers
    draw fresh subgraphs per epoch (reference create_loader,
    loader.py:247-260 + loader_pyg.py:258-285)."""
    # Each loader gets its OWN independently seeded Generator: the
    # trainer's epoch-prefetch worker collates epoch e+1 concurrently
    # with eval_epoch's loaders, and np.random.Generator is not
    # thread-safe — a shared generator would race (and break the
    # bit-identical-to-serial prefetch guarantee) whenever the eval
    # split draws randomness (cfg.val.sampler / sample_node).
    rngs = [np.random.default_rng([cfg.seed, i])
            for i in range(len(splits))]
    if cfg.train.sampler != "full_batch":
        loaders = [SamplerLoader(splits[0], cfg,
                                 batch_size=cfg.train.batch_size,
                                 rng=rngs[0])]
    else:
        loaders = [GraphLoader(splits[0], cfg,
                               batch_size=cfg.train.batch_size,
                               shuffle=True, rng=rngs[0])]
    for i, part in enumerate(splits[1:], start=1):
        # val/test loaders honor cfg.val.sampler (reference
        # loader_pyg.py:272-283 passes cfg.val.sampler, shuffle=False)
        if cfg.val.sampler != "full_batch":
            loaders.append(SamplerLoader(part, cfg,
                                         batch_size=cfg.train.batch_size,
                                         rng=rngs[i],
                                         sampler=cfg.val.sampler))
        else:
            loaders.append(GraphLoader(part, cfg,
                                       batch_size=cfg.train.batch_size,
                                       shuffle=False, rng=rngs[i]))
    return loaders
