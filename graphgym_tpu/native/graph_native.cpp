// Native host-side graph runtime for graphgym_tpu.
//
// The TPU-native equivalents of the data-pipeline hot loops that the
// reference runs in per-node Python/networkx (SURVEY.md §3.1 CPU hot
// loops #1/#2: feature_augment clustering, transform.ego_nets) plus the
// chunk packer feeding the Pallas SpMM kernel.  Exposed as a plain C ABI
// consumed via ctypes (no pybind11 in the image).
//
// All functions except `betweenness` are thread-free and
// allocation-free (callers provide buffers) so they can be driven from
// Python without GIL games; betweenness threads over sources
// internally.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Build CSR from COO: indptr[n+1], indices[e] (receiver-major when
// called with (receivers, senders)).  order_out[e] receives the stable
// permutation that sorts edges by `major`, for carrying edge weights.
void build_csr(int64_t n, int64_t e, const int32_t* major,
               const int32_t* minor, int64_t* indptr,
               int32_t* indices, int64_t* order_out) {
  std::memset(indptr, 0, sizeof(int64_t) * (n + 1));
  for (int64_t i = 0; i < e; ++i) indptr[major[i] + 1]++;
  for (int64_t i = 0; i < n; ++i) indptr[i + 1] += indptr[i];
  std::vector<int64_t> cursor(indptr, indptr + n);
  for (int64_t i = 0; i < e; ++i) {
    int64_t pos = cursor[major[i]]++;
    indices[pos] = minor[i];
    order_out[pos] = i;
  }
}

// Clustering coefficient over an undirected simple graph in CSR
// (reference feature_augment.py:81-82 nx.clustering).  Requires rows
// sorted ascending; sorts in place if needed by caller.
void clustering_coeff(int64_t n, const int64_t* indptr,
                      const int32_t* indices, double* out) {
  std::vector<int32_t> row;
  for (int64_t i = 0; i < n; ++i) {
    int64_t lo = indptr[i], hi = indptr[i + 1];
    int64_t deg = 0;
    row.assign(indices + lo, indices + hi);
    std::sort(row.begin(), row.end());
    // drop self loops & duplicates
    row.erase(std::unique(row.begin(), row.end()), row.end());
    row.erase(std::remove(row.begin(), row.end(), (int32_t)i),
              row.end());
    deg = (int64_t)row.size();
    if (deg < 2) {
      out[i] = 0.0;
      continue;
    }
    int64_t tri = 0;
    for (int32_t j : row) {
      // intersect sorted row with neighbor list of j
      int64_t jlo = indptr[j], jhi = indptr[j + 1];
      std::vector<int32_t> nj(indices + jlo, indices + jhi);
      std::sort(nj.begin(), nj.end());
      size_t a = 0, b = 0;
      while (a < row.size() && b < nj.size()) {
        if (row[a] == nj[b]) {
          if (row[a] != i && row[a] != j) tri++;
          ++a;
          ++b;
        } else if (row[a] < nj[b]) {
          ++a;
        } else {
          ++b;
        }
      }
    }
    // tri counts each triangle twice (once per adjacent pair via j)
    out[i] = (double)tri / (double)(deg * (deg - 1));
  }
}

// --- Ego-net union extraction (reference transform.py:11-39) ----------
//
// Pass 1 (ego_sizes): BFS out to `radius` from every node; writes the
// per-ego node count (incl. center) and the per-ego induced edge count.
// Pass 2 (ego_fill): emits the relabeled union graph.
//
// scratch buffers (caller-allocated): dist[n], queue[n], member[n].

static void bfs_radius(int64_t n, const int64_t* indptr,
                       const int32_t* indices, int64_t center,
                       int64_t radius, int32_t* dist, int32_t* queue,
                       int64_t* count_out) {
  // dist: -1 untouched; BFS within radius
  int64_t head = 0, tail = 0;
  dist[center] = 0;
  queue[tail++] = (int32_t)center;
  while (head < tail) {
    int32_t u = queue[head++];
    if (dist[u] >= radius) continue;
    for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
      int32_t v = indices[k];
      if (dist[v] < 0) {
        dist[v] = dist[u] + 1;
        queue[tail++] = v;
      }
    }
  }
  *count_out = tail;
}

void ego_sizes(int64_t n, int64_t e, const int64_t* indptr,
               const int32_t* indices, int64_t radius,
               int64_t* node_counts, int64_t* edge_counts) {
  std::vector<int32_t> dist(n, -1), queue(n);
  for (int64_t c = 0; c < n; ++c) {
    int64_t cnt = 0;
    bfs_radius(n, indptr, indices, c, radius, dist.data(),
               queue.data(), &cnt);
    node_counts[c] = cnt;
    // induced edge count: sum over members of neighbors inside ego
    int64_t ec = 0;
    for (int64_t qi = 0; qi < cnt; ++qi) {
      int32_t u = queue[qi];
      for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k)
        if (dist[indices[k]] >= 0) ec++;
    }
    edge_counts[c] = ec;
    for (int64_t qi = 0; qi < cnt; ++qi) dist[queue[qi]] = -1;
  }
}

// Fill the union graph.  Outputs (caller-allocated from pass-1 sums):
//   union_senders/union_receivers [sum(edge_counts)]
//   orig_of [n + sum(node_counts - 1)]: original node id of each union
//   node (centers occupy slots 0..n-1; others are appended in ego order)
void ego_fill(int64_t n, int64_t e, const int64_t* indptr,
              const int32_t* indices, int64_t radius,
              int32_t* union_senders, int32_t* union_receivers,
              int64_t* orig_of) {
  std::vector<int32_t> dist(n, -1), queue(n);
  std::vector<int64_t> newid(n, -1);
  for (int64_t i = 0; i < n; ++i) orig_of[i] = i;
  int64_t next_id = n;
  int64_t epos = 0;
  for (int64_t c = 0; c < n; ++c) {
    int64_t cnt = 0;
    bfs_radius(n, indptr, indices, c, radius, dist.data(),
               queue.data(), &cnt);
    // relabel: center keeps id c, others get fresh ids
    for (int64_t qi = 0; qi < cnt; ++qi) {
      int32_t u = queue[qi];
      if (u == (int32_t)c) {
        newid[u] = c;
      } else {
        newid[u] = next_id;
        orig_of[next_id] = u;
        next_id++;
      }
    }
    for (int64_t qi = 0; qi < cnt; ++qi) {
      int32_t u = queue[qi];
      for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
        int32_t v = indices[k];
        if (dist[v] >= 0) {
          union_senders[epos] = (int32_t)newid[u];
          union_receivers[epos] = (int32_t)newid[v];
          epos++;
        }
      }
    }
    for (int64_t qi = 0; qi < cnt; ++qi) {
      dist[queue[qi]] = -1;
      newid[queue[qi]] = -1;
    }
  }
}

// --- Packed-chunk layout for the Pallas SpMM kernel -------------------
//
// Mirrors ops/pallas/spmm_kernel.pack_csr: receiver-sorted edges packed
// into C-edge chunks, each owning one R-row tile.  Pass 1 returns the
// chunk count; pass 2 fills the arrays.

// G > 1 pads each receiver-row's slot span to a multiple of G so every
// aligned G-group of slots belongs to one row — the kernel then
// group-sums G slots on the VPU before the one-hot matmul, cutting the
// MXU contraction depth by G.

int64_t pack_csr_count(int64_t num_nodes, int64_t e,
                       const int32_t* receivers_sorted, int64_t R,
                       int64_t C, int64_t G) {
  int64_t num_tiles = (num_nodes + R - 1) / R;
  if (G < 1) G = 1;
  std::vector<int64_t> tile_slots(num_tiles, 0);
  int64_t i = 0;
  while (i < e) {
    int32_t r = receivers_sorted[i];
    int64_t j = i;
    while (j < e && receivers_sorted[j] == r) j++;
    tile_slots[r / R] += ((j - i) + G - 1) / G * G;
    i = j;
  }
  int64_t nc = 0;
  for (int64_t t = 0; t < num_tiles; ++t) {
    int64_t k = (tile_slots[t] + C - 1) / C;
    nc += k > 0 ? k : 1;
  }
  return nc;
}

void pack_csr_fill(int64_t num_nodes, int64_t e,
                   const int32_t* senders_sorted,
                   const int32_t* receivers_sorted,
                   const float* weights_sorted, int64_t R, int64_t C,
                   int64_t G, int64_t nc, int32_t* out_senders,
                   float* out_weights, int32_t* out_local,
                   int32_t* out_tiles) {
  int64_t num_tiles = (num_nodes + R - 1) / R;
  if (G < 1) G = 1;
  // init padding
  for (int64_t i = 0; i < nc * C; ++i) {
    out_senders[i] = (int32_t)num_nodes;
    out_weights[i] = 0.0f;
    out_local[i] = 0;
  }
  int64_t epos = 0;
  int64_t chunk_base = 0;  // first chunk of the current tile
  std::vector<int64_t> order;
  for (int64_t t = 0; t < num_tiles; ++t) {
    int64_t slot = 0;  // slot within this tile's chunk run
    int64_t k = 0;     // chunks used by this tile
    while (epos < e && receivers_sorted[epos] / R == t) {
      int32_t r = receivers_sorted[epos];
      int64_t row_start = epos;
      while (epos < e && receivers_sorted[epos] == r) epos++;
      int64_t cnt = epos - row_start;
      // sort this row's edges by sender for gather locality (slot
      // order within a row is free — same receiver)
      order.resize(cnt);
      for (int64_t j = 0; j < cnt; ++j) order[j] = row_start + j;
      std::sort(order.begin(), order.end(),
                [&](int64_t x, int64_t y) {
                  return senders_sorted[x] < senders_sorted[y];
                });
      for (int64_t jj = 0; jj < cnt; ++jj) {
        int64_t j = order[jj];
        int64_t pos = (chunk_base + slot / C) * C + slot % C;
        out_senders[pos] = senders_sorted[j];
        out_weights[pos] = weights_sorted[j];
        out_local[pos] = (int32_t)(r - t * R);
        slot++;
      }
      // pad the row span to a multiple of G; padding slots keep the
      // row's local index so their (zero-weight) group sum still
      // targets a well-defined row
      while (slot % G) {
        int64_t pos = (chunk_base + slot / C) * C + slot % C;
        out_local[pos] = (int32_t)(r - t * R);
        slot++;
      }
      k = (slot + C - 1) / C;
    }
    if (k == 0) k = 1;
    for (int64_t ci = 0; ci < k; ++ci)
      out_tiles[chunk_base + ci] = (int32_t)t;
    chunk_base += k;
  }
  // any padding chunks (shouldn't happen; defensive)
  for (; chunk_base < nc; ++chunk_base)
    out_tiles[chunk_base] = (int32_t)(num_tiles - 1);
}

// Multi-source BFS: dist[si * n + v] = hop distance from sources[si]
// to v (-1 unreachable), capped at max_dist when >= 0.  Threads over
// sources.  Replaces the numpy frontier BFS for large graphs
// (data/structure.py bfs_from_sources).
void multi_bfs(int64_t n, const int64_t* indptr, const int32_t* indices,
               int64_t num_sources, const int64_t* sources,
               int64_t max_dist, int64_t num_threads, int32_t* out) {
  int64_t nt = num_threads < 1 ? 1 : num_threads;
  std::atomic<int64_t> next_src(0);
  auto worker = [&]() {
    std::vector<int32_t> order(n);
    for (;;) {
      int64_t si = next_src.fetch_add(1);
      if (si >= num_sources) break;
      int32_t* dist = out + si * n;
      for (int64_t v = 0; v < n; ++v) dist[v] = -1;
      int64_t s0 = sources[si];
      dist[s0] = 0;
      int64_t head = 0, tail = 0;
      order[tail++] = (int32_t)s0;
      while (head < tail) {
        int32_t u = order[head++];
        if (max_dist >= 0 && dist[u] >= max_dist) continue;
        for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
          int32_t v = indices[k];
          if (dist[v] < 0) {
            dist[v] = dist[u] + 1;
            order[tail++] = v;
          }
        }
      }
    }
  };
  std::vector<std::thread> threads;
  for (int64_t t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& th : threads) th.join();
}

// Brandes betweenness centrality (unweighted), multi-threaded over
// sources.  Replaces the per-source Python BFS loops in
// data/structure.py for large graphs (the reference calls
// networkx.betweenness_centrality, feature_augment.py:109-122).
void betweenness(int64_t n, const int64_t* indptr,
                 const int32_t* indices, int64_t num_threads,
                 double* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = 0.0;
  if (n < 3) return;
  int64_t nt = num_threads < 1 ? 1 : num_threads;
  std::vector<std::vector<double>> partial(nt,
                                           std::vector<double>(n, 0.0));
  std::atomic<int64_t> next_src(0);
  auto worker = [&](int64_t tid) {
    std::vector<double> sigma(n), delta(n);
    std::vector<int64_t> dist(n);
    std::vector<int32_t> order(n);
    double* bc = partial[tid].data();
    for (;;) {
      int64_t s0 = next_src.fetch_add(1);
      if (s0 >= n) break;
      std::fill(sigma.begin(), sigma.end(), 0.0);
      std::fill(dist.begin(), dist.end(), -1);
      std::fill(delta.begin(), delta.end(), 0.0);
      sigma[s0] = 1.0;
      dist[s0] = 0;
      int64_t head = 0, tail = 0;
      order[tail++] = (int32_t)s0;
      while (head < tail) {
        int32_t u = order[head++];
        for (int64_t k = indptr[u]; k < indptr[u + 1]; ++k) {
          int32_t v = indices[k];
          if (dist[v] < 0) {
            dist[v] = dist[u] + 1;
            order[tail++] = v;
          }
          if (dist[v] == dist[u] + 1) sigma[v] += sigma[u];
        }
      }
      // dependency accumulation in reverse BFS order; preds are the
      // neighbors one level closer (no pred lists needed)
      for (int64_t i = tail - 1; i > 0; --i) {
        int32_t v = order[i];
        double coef = (1.0 + delta[v]) / sigma[v];
        for (int64_t k = indptr[v]; k < indptr[v + 1]; ++k) {
          int32_t u = indices[k];
          if (dist[u] == dist[v] - 1) delta[u] += sigma[u] * coef;
        }
      }
      for (int64_t v = 0; v < n; ++v)
        if (v != s0) bc[v] += delta[v];
    }
  };
  std::vector<std::thread> threads;
  for (int64_t t = 0; t < nt; ++t) threads.emplace_back(worker, t);
  for (auto& th : threads) th.join();
  for (int64_t t = 0; t < nt; ++t)
    for (int64_t v = 0; v < n; ++v) out[v] += partial[t][v];
  // undirected double-count + nx normalization 2/((n-1)(n-2))
  double norm = 1.0 / ((double)(n - 1) * (double)(n - 2));
  for (int64_t v = 0; v < n; ++v) out[v] *= norm;
}

}  // extern "C"
