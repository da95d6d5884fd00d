// pointslot_tpu native runtime library.
//
// Host-side runtime structures that the reference implements in C++ and
// that profit from native code here too:
//
//  - CovisGraph: incremental keyframe covisibility from point observations
//    (the role of the reference's KeyFrame::UpdateConnections /
//    GetBestCovisibilityKeyFrames pointer graph, re-designed as an
//    observation-count matrix maintained under insert/erase).
//  - hungarian_solve: O(n^3) Jonker-Volgenant-style assignment (the role of
//    the reference's vendored munkres.cpp used by DeepSORT association).
//  - hamming_knn: popcount brute-force k=1 matcher for small host-side
//    match problems (avoids a device round-trip for tiny inputs).
//
// Exposed as a C ABI consumed via ctypes (pointslot_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <limits>

extern "C" {

// ----------------------------------------------------------------------
// Covisibility graph
// ----------------------------------------------------------------------

struct CovisGraph {
  int max_points;
  int max_kfs;
  // per-point observation sets as sorted small vectors of kf ids
  std::vector<std::vector<int32_t>> point_obs;
  // pairwise shared-point counts, (max_kfs x max_kfs), symmetric
  std::vector<int32_t> weights;
};

CovisGraph* covis_create(int max_points, int max_kfs) {
  auto* g = new CovisGraph();
  g->max_points = max_points;
  g->max_kfs = max_kfs;
  g->point_obs.resize(max_points);
  g->weights.assign((size_t)max_kfs * max_kfs, 0);
  return g;
}

void covis_destroy(CovisGraph* g) { delete g; }

void covis_add_obs(CovisGraph* g, int point, int kf) {
  auto& obs = g->point_obs[point];
  auto it = std::lower_bound(obs.begin(), obs.end(), kf);
  if (it != obs.end() && *it == kf) return;
  for (int other : obs) {
    g->weights[(size_t)other * g->max_kfs + kf] += 1;
    g->weights[(size_t)kf * g->max_kfs + other] += 1;
  }
  obs.insert(it, kf);
}

void covis_remove_obs(CovisGraph* g, int point, int kf) {
  auto& obs = g->point_obs[point];
  auto it = std::lower_bound(obs.begin(), obs.end(), kf);
  if (it == obs.end() || *it != kf) return;
  obs.erase(it);
  for (int other : obs) {
    g->weights[(size_t)other * g->max_kfs + kf] -= 1;
    g->weights[(size_t)kf * g->max_kfs + other] -= 1;
  }
}

void covis_remove_point(CovisGraph* g, int point) {
  auto& obs = g->point_obs[point];
  for (size_t i = 0; i < obs.size(); ++i)
    for (size_t j = i + 1; j < obs.size(); ++j) {
      g->weights[(size_t)obs[i] * g->max_kfs + obs[j]] -= 1;
      g->weights[(size_t)obs[j] * g->max_kfs + obs[i]] -= 1;
    }
  obs.clear();
}

void covis_remove_kf(CovisGraph* g, int kf) {
  for (auto& obs : g->point_obs) {
    auto it = std::lower_bound(obs.begin(), obs.end(), kf);
    if (it != obs.end() && *it == kf) {
      obs.erase(it);
      for (int other : obs) {
        g->weights[(size_t)other * g->max_kfs + kf] -= 1;
        g->weights[(size_t)kf * g->max_kfs + other] -= 1;
      }
    }
  }
}

// weights of kf vs all others -> out (max_kfs,)
void covis_weights_of(CovisGraph* g, int kf, int32_t* out) {
  std::memcpy(out, &g->weights[(size_t)kf * g->max_kfs],
              sizeof(int32_t) * g->max_kfs);
}

// top-n covisible kfs with weight >= min_weight; returns count
int covis_top(CovisGraph* g, int kf, int min_weight, int n,
              int32_t* out_ids, int32_t* out_weights) {
  const int32_t* row = &g->weights[(size_t)kf * g->max_kfs];
  std::vector<std::pair<int32_t, int32_t>> cand;  // (-weight, id)
  for (int i = 0; i < g->max_kfs; ++i)
    if (i != kf && row[i] >= min_weight) cand.push_back({-row[i], i});
  std::sort(cand.begin(), cand.end());
  int cnt = std::min<int>(n, (int)cand.size());
  for (int i = 0; i < cnt; ++i) {
    out_ids[i] = cand[i].second;
    out_weights[i] = -cand[i].first;
  }
  return cnt;
}

// ----------------------------------------------------------------------
// Hungarian (Jonker-Volgenant shortest augmenting path, O(n^3))
// ----------------------------------------------------------------------

// cost: (n_rows x n_cols) float64, n_rows <= n_cols.
// out_col_for_row: (n_rows,) assignment.
int hungarian_solve(const double* cost, int n_rows, int n_cols,
                    int32_t* out_col_for_row) {
  if (n_rows == 0) return 0;
  if (n_rows > n_cols) return -1;
  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> u(n_rows + 1, 0.0), v(n_cols + 1, 0.0);
  std::vector<int> p(n_cols + 1, 0), way(n_cols + 1, 0);
  for (int i = 1; i <= n_rows; ++i) {
    p[0] = i;
    int j0 = 0;
    std::vector<double> minv(n_cols + 1, INF);
    std::vector<char> used(n_cols + 1, false);
    do {
      used[j0] = true;
      int i0 = p[j0], j1 = 0;
      double delta = INF;
      for (int j = 1; j <= n_cols; ++j) {
        if (used[j]) continue;
        double cur = cost[(size_t)(i0 - 1) * n_cols + (j - 1)] - u[i0] - v[j];
        if (cur < minv[j]) { minv[j] = cur; way[j] = j0; }
        if (minv[j] < delta) { delta = minv[j]; j1 = j; }
      }
      for (int j = 0; j <= n_cols; ++j) {
        if (used[j]) { u[p[j]] += delta; v[j] -= delta; }
        else minv[j] -= delta;
      }
      j0 = j1;
    } while (p[j0] != 0);
    do { int j1 = way[j0]; p[j0] = p[j1]; j0 = j1; } while (j0);
  }
  for (int j = 1; j <= n_cols; ++j)
    if (p[j] > 0) out_col_for_row[p[j] - 1] = j - 1;
  return 0;
}

// ----------------------------------------------------------------------
// Host-side brute Hamming nearest neighbor (256-bit packed as 8x uint32)
// ----------------------------------------------------------------------

void hamming_knn(const uint32_t* a, int na, const uint32_t* b, int nb,
                 int32_t* out_idx, int32_t* out_dist) {
  for (int i = 0; i < na; ++i) {
    int best = -1, best_d = 1 << 30;
    const uint32_t* ai = a + (size_t)i * 8;
    for (int j = 0; j < nb; ++j) {
      const uint32_t* bj = b + (size_t)j * 8;
      int d = 0;
      for (int w = 0; w < 8; ++w) d += __builtin_popcount(ai[w] ^ bj[w]);
      if (d < best_d) { best_d = d; best = j; }
    }
    out_idx[i] = best;
    out_dist[i] = best_d;
  }
}

int native_abi_version() { return 1; }

}  // extern "C"
