// tod_native: C++ runtime components of the tod_tpu framework.
//
// Three pieces, mirroring where the reference keeps native code:
//   1. An exact maximum-clique solver implementing the Konc & Janezic
//      "improved branch and bound algorithm for the maximum clique problem"
//      (MaxCliqueDyn) — the same published algorithm behind the reference's
//      src/common/maximum_clique.{h,cpp}, written from scratch on a dense
//      bitset representation. Same operational semantics: greedy-coloring
//      upper bounds, initial + dynamically re-applied degree sorting gated
//      by Tlimit = 0.025, a 100000-step search cap, and early exit once a
//      clique of the requested minimal size is found.
//   2. A multithreaded brute-force Hamming k-NN matcher — the CPU reference
//      baseline for the TPU matmul matcher (and the measured-CPU side of the
//      ">= 50x OpenCV CPU matching" target, BASELINE.md).
//   3. Plasm graph scheduling: topological ordering with cycle detection for
//      the cell/plasm pipeline runtime (the ecto-scheduler analog).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <string>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// 1. Exact maximum clique (MaxCliqueDyn)
// ---------------------------------------------------------------------------

class DenseGraph {
 public:
  explicit DenseGraph(int n) : n_(n), adj_(static_cast<size_t>(n) * n, 0) {}

  void add_edge(int u, int v) {
    if (u == v || u < 0 || v < 0 || u >= n_ || v >= n_) return;
    adj_[idx(u, v)] = 1;
    adj_[idx(v, u)] = 1;
  }
  void remove_edge(int u, int v) {
    if (u < 0 || v < 0 || u >= n_ || v >= n_) return;
    adj_[idx(u, v)] = 0;
    adj_[idx(v, u)] = 0;
  }
  bool connected(int u, int v) const { return adj_[idx(u, v)] != 0; }
  int degree(int v) const {
    int d = 0;
    for (int u = 0; u < n_; ++u) d += adj_[idx(v, u)];
    return d;
  }
  int size() const { return n_; }

 private:
  size_t idx(int u, int v) const {
    return static_cast<size_t>(u) * n_ + v;
  }
  int n_;
  std::vector<uint8_t> adj_;
};

class MaxCliqueSolver {
 public:
  MaxCliqueSolver(const DenseGraph& g, long step_cap, double t_limit)
      : g_(g), step_cap_(step_cap), t_limit_(t_limit) {}

  // Find a clique of at least `target` vertices (early exit), or the best
  // found within the step budget. Returns the clique vertices.
  std::vector<int> find(unsigned target) {
    steps_ = 1;
    best_.clear();
    const int n = g_.size();
    if (n == 0) return best_;

    std::vector<int> cand(n);
    for (int i = 0; i < n; ++i) cand[i] = i;
    sort_by_degree(cand);

    // Initial color bounds like the published initialization: the first
    // max_degree vertices get colors 1..max_degree, the rest max_degree+1.
    int max_deg = g_.degree(cand[0]);
    std::vector<int> colors(n);
    for (int i = 0; i < n; ++i)
      colors[i] = (i < max_deg) ? i + 1 : max_deg + 1;

    level_steps_.assign(n + 1, 0);
    level_steps_old_.assign(n + 1, 0);
    std::vector<int> current;
    expand(cand, colors, 1, target, current);
    return best_;
  }

 private:
  // Sort descending by degree-within-subgraph (ties stable), so the densest
  // vertices are explored first.
  void sort_by_degree(std::vector<int>& cand) const {
    const int m = static_cast<int>(cand.size());
    std::vector<int> deg(m, 0);
    for (int i = 0; i < m; ++i)
      for (int j = i + 1; j < m; ++j)
        if (g_.connected(cand[i], cand[j])) {
          ++deg[i];
          ++deg[j];
        }
    std::vector<int> order(m);
    for (int i = 0; i < m; ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](int a, int b) { return deg[a] > deg[b]; });
    std::vector<int> out(m);
    for (int i = 0; i < m; ++i) out[i] = cand[order[i]];
    cand = out;
  }

  // Full greedy coloring (Tomita-style): every vertex joins the smallest
  // conflict-free class, so a clique always spans distinct classes and the
  // class number is a sound upper bound on the extension size. Candidates are
  // re-emitted in ascending color order so the main loop (which pops from the
  // back, i.e. highest bound first) can stop at the first failing bound.
  //
  // NOTE: the reference's implementation fuses "skip colors below the useful
  // threshold" INTO the coloring (maximum_clique.cpp ColorSort), which lets
  // two adjacent low-colored vertices share a class — an unsound bound that
  // can miss cliques. We keep the coloring exact.
  void color_sort(std::vector<int>& cand, std::vector<int>& colors) {
    std::vector<std::vector<int>> classes;
    for (int v : cand) {
      size_t k = 0;
      for (; k < classes.size(); ++k) {
        bool conflict = false;
        for (int u : classes[k])
          if (g_.connected(u, v)) {
            conflict = true;
            break;
          }
        if (!conflict) break;
      }
      if (k == classes.size()) classes.emplace_back();
      classes[k].push_back(v);
    }
    cand.clear();
    colors.clear();
    for (size_t k = 0; k < classes.size(); ++k)
      for (int v : classes[k]) {
        cand.push_back(v);
        colors.push_back(static_cast<int>(k) + 1);
      }
  }

  void expand(std::vector<int>& cand, std::vector<int>& colors, int level,
              unsigned target, std::vector<int>& current) {
    if (best_.size() >= target) return;
    if (level >= static_cast<int>(level_steps_.size())) {
      level_steps_.resize(level + 1, 0);
      level_steps_old_.resize(level + 1, 0);
    }
    level_steps_[level] += level_steps_[level - 1] - level_steps_old_[level];
    level_steps_old_[level] = level_steps_[level - 1];

    while (!cand.empty()) {
      const int v = cand.back();
      const int c = colors.back();
      if (current.size() + c <= best_.size()) return;  // bound: cannot improve
      cand.pop_back();
      colors.pop_back();

      current.push_back(v);
      std::vector<int> next;
      next.reserve(cand.size());
      for (int u : cand)
        if (g_.connected(v, u)) next.push_back(u);

      if (!next.empty()) {
        // Dynamic re-sorting by degree near the root of the tree, while this
        // level's share of the total steps stays below Tlimit.
        if (static_cast<double>(level_steps_[level]) / steps_ < t_limit_)
          sort_by_degree(next);
        std::vector<int> next_colors;
        color_sort(next, next_colors);
        ++level_steps_[level];
        if (++steps_ > step_cap_) {
          current.pop_back();
          return;  // search budget exhausted — keep the best found so far
        }
        expand(next, next_colors, level + 1, target, current);
        if (best_.size() >= target || steps_ > step_cap_) {
          current.pop_back();
          return;
        }
      } else if (current.size() > best_.size()) {
        best_ = current;
        if (best_.size() >= target) {
          current.pop_back();
          return;
        }
      }
      current.pop_back();
    }
  }

  const DenseGraph& g_;
  const long step_cap_;
  const double t_limit_;
  long steps_ = 0;
  std::vector<int> best_;
  std::vector<long> level_steps_, level_steps_old_;
};

// ---------------------------------------------------------------------------
// 2. Brute-force Hamming k-NN (CPU baseline)
// ---------------------------------------------------------------------------

inline int hamming32(const uint8_t* a, const uint8_t* b) {
  // 32-byte descriptors = 4 x 64-bit words.
  uint64_t wa[4], wb[4];
  std::memcpy(wa, a, 32);
  std::memcpy(wb, b, 32);
  return __builtin_popcountll(wa[0] ^ wb[0]) +
         __builtin_popcountll(wa[1] ^ wb[1]) +
         __builtin_popcountll(wa[2] ^ wb[2]) +
         __builtin_popcountll(wa[3] ^ wb[3]);
}

void hamming_knn_range(const uint8_t* query, int64_t q_begin, int64_t q_end,
                       const uint8_t* db, int64_t n_db, int k,
                       int32_t* out_idx, int32_t* out_dist) {
  std::vector<std::pair<int32_t, int32_t>> heap;  // (dist, idx) max-heap
  for (int64_t qi = q_begin; qi < q_end; ++qi) {
    const uint8_t* q = query + qi * 32;
    heap.clear();
    for (int64_t di = 0; di < n_db; ++di) {
      const int d = hamming32(q, db + di * 32);
      if (static_cast<int>(heap.size()) < k) {
        heap.emplace_back(d, static_cast<int32_t>(di));
        std::push_heap(heap.begin(), heap.end());
      } else if (d < heap.front().first) {
        std::pop_heap(heap.begin(), heap.end());
        heap.back() = {d, static_cast<int32_t>(di)};
        std::push_heap(heap.begin(), heap.end());
      }
    }
    std::sort_heap(heap.begin(), heap.end());
    for (int j = 0; j < k; ++j) {
      const bool have = j < static_cast<int>(heap.size());
      out_dist[qi * k + j] = have ? heap[j].first : INT32_MAX;
      out_idx[qi * k + j] = have ? heap[j].second : -1;
    }
  }
}

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

}  // namespace

extern "C" {

// Exact clique search on an edge-list graph. Returns the clique size and
// writes the vertices into out_vertices (capacity n_vertices).
// target = minimal size for early exit; pass n_vertices+1 (or more) for the
// true maximum clique. step_cap <= 0 uses the reference's 100000 budget.
int tod_find_clique(int n_vertices, int n_edges, const int32_t* edge_u,
                    const int32_t* edge_v, int target, long step_cap,
                    int32_t* out_vertices) {
  DenseGraph g(n_vertices);
  for (int e = 0; e < n_edges; ++e) g.add_edge(edge_u[e], edge_v[e]);
  MaxCliqueSolver solver(g, step_cap > 0 ? step_cap : 100000,
                         /*t_limit=*/0.025);
  std::vector<int> clique =
      solver.find(target > 0 ? static_cast<unsigned>(target) : ~0u);
  for (size_t i = 0; i < clique.size(); ++i)
    out_vertices[i] = static_cast<int32_t>(clique[i]);
  return static_cast<int>(clique.size());
}

// Parse a DIMACS .clq file ("p edge N M" header, "e u v" 1-based edges).
// First call with edges_capacity=0 to query counts. Returns n_edges or -1.
int tod_load_dimacs(const char* path, int32_t* out_n_vertices,
                    int32_t* edge_u, int32_t* edge_v, int edges_capacity) {
  FILE* f = std::fopen(path, "r");
  if (!f) return -1;
  char line[512];
  int n_vertices = 0;
  int n_edges = 0;
  while (std::fgets(line, sizeof(line), f)) {
    if (line[0] == 'p') {
      int declared_edges = 0;
      std::sscanf(line, "p %*s %d %d", &n_vertices, &declared_edges);
    } else if (line[0] == 'e') {
      int u = 0, v = 0;
      if (std::sscanf(line, "e %d %d", &u, &v) == 2) {
        if (n_edges < edges_capacity) {
          edge_u[n_edges] = u - 1;
          edge_v[n_edges] = v - 1;
        }
        ++n_edges;
      }
    }
  }
  std::fclose(f);
  *out_n_vertices = n_vertices;
  return n_edges;
}

// Brute-force Hamming k-NN over 32-byte descriptors, multithreaded.
void tod_hamming_knn(const uint8_t* query, int64_t n_query, const uint8_t* db,
                     int64_t n_db, int k, int n_threads, int32_t* out_idx,
                     int32_t* out_dist) {
  if (n_threads <= 1) {
    hamming_knn_range(query, 0, n_query, db, n_db, k, out_idx, out_dist);
    return;
  }
  std::vector<std::thread> pool;
  const int64_t per = (n_query + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    const int64_t b = t * per;
    const int64_t e = std::min(n_query, b + per);
    if (b >= e) break;
    pool.emplace_back(hamming_knn_range, query, b, e, db, n_db, k, out_idx,
                      out_dist);
  }
  for (auto& th : pool) th.join();
}

// Topological order of a DAG (Kahn). Returns 0 and fills out_order, or -1 on
// a cycle. Deterministic: ready nodes are popped smallest-id first.
int tod_toposort(int n_nodes, int n_edges, const int32_t* edge_src,
                 const int32_t* edge_dst, int32_t* out_order) {
  std::vector<std::vector<int>> out_adj(n_nodes);
  std::vector<int> indeg(n_nodes, 0);
  for (int e = 0; e < n_edges; ++e) {
    out_adj[edge_src[e]].push_back(edge_dst[e]);
    ++indeg[edge_dst[e]];
  }
  std::priority_queue<int, std::vector<int>, std::greater<int>> ready;
  for (int v = 0; v < n_nodes; ++v)
    if (indeg[v] == 0) ready.push(v);
  int count = 0;
  while (!ready.empty()) {
    const int v = ready.top();
    ready.pop();
    out_order[count++] = v;
    for (int u : out_adj[v])
      if (--indeg[u] == 0) ready.push(u);
  }
  return count == n_nodes ? 0 : -1;
}

}  // extern "C"
