// Greedy minimum-feedback-arc-set ordering (Eades et al. heuristic).
//
// Native counterpart of gtsfm_tpu/averaging/translation/averaging.py::
// _greedy_mfas_order — mirrors the reference's use of GTSAM's C++ MFAS
// (gtsam.MFAS, /root/reference/gtsfm/averaging/translation/
// averaging_1dsfm.py:216-296). MFAS ordering is inherently sequential, so
// the hot loop lives here; exposed via a C ABI for ctypes.
//
// Build: make -C gtsfm_tpu/native

#include <cstdint>
#include <limits>
#include <vector>

extern "C" {

// src, dst: directed edge endpoints; wgt: edge weights (length n_edges);
// n_nodes: node count. out_order: node ordering (length n_nodes).
void mfas_order(const int64_t* src, const int64_t* dst, const double* wgt,
                int64_t n_edges, int64_t n_nodes, int64_t* out_order) {
  // accumulate out/in sums separately then subtract — matches the numpy
  // fallback's rounding so both implementations produce the same ordering
  std::vector<double> wout(n_nodes, 0.0), win(n_nodes, 0.0);
  std::vector<std::vector<std::pair<int64_t, double>>> out_adj(n_nodes),
      in_adj(n_nodes);
  for (int64_t e = 0; e < n_edges; ++e) {
    out_adj[src[e]].push_back({dst[e], wgt[e]});
    in_adj[dst[e]].push_back({src[e], wgt[e]});
    wout[src[e]] += wgt[e];
    win[dst[e]] += wgt[e];
  }
  std::vector<double> score(n_nodes);
  for (int64_t i = 0; i < n_nodes; ++i) score[i] = wout[i] - win[i];
  std::vector<char> removed(n_nodes, 0);
  for (int64_t k = 0; k < n_nodes; ++k) {
    // pick unremoved node with max (out - in) weight
    int64_t best = -1;
    double best_score = -std::numeric_limits<double>::infinity();
    for (int64_t i = 0; i < n_nodes; ++i) {
      if (!removed[i] && score[i] > best_score) {
        best_score = score[i];
        best = i;
      }
    }
    out_order[k] = best;
    removed[best] = 1;
    for (auto& [v, w] : out_adj[best])
      if (!removed[v]) score[v] += w;
    for (auto& [v, w] : in_adj[best])
      if (!removed[v]) score[v] -= w;
  }
}

}  // extern "C"
