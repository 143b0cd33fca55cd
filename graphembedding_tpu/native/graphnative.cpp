// Native host-runtime helpers for graphembedding_tpu.
//
// The device compute path is JAX/XLA/Pallas; these routines cover the
// host-side preprocessing hot spots (SURVEY.md §3.2's "delegated native
// components" table): per-row alias-table construction over a CSR and the
// struc2vec DTW ground-distance DP. Plain C ABI, consumed via ctypes.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

extern "C" {

// Walker alias-method construction for every CSR row at once.
// row_ptr: [n_rows+1]; weights: [row_ptr[n_rows]] (unnormalized).
// Outputs accept (float32) and alias (int32, local slot ids), flat-aligned
// with `weights`.
void build_row_alias(const int64_t* row_ptr, int64_t n_rows,
                     const double* weights, float* accept, int32_t* alias) {
  std::vector<double> area;
  std::vector<int32_t> small_stack, large_stack;
  for (int64_t v = 0; v < n_rows; ++v) {
    const int64_t s = row_ptr[v], e = row_ptr[v + 1];
    const int64_t n = e - s;
    if (n <= 0) continue;
    double total = 0.0;
    for (int64_t i = s; i < e; ++i) total += weights[i];
    area.resize(n);
    if (total <= 0.0) {
      std::fill(area.begin(), area.end(), 1.0);
    } else {
      const double scale = static_cast<double>(n) / total;
      for (int64_t i = 0; i < n; ++i) area[i] = weights[s + i] * scale;
    }
    small_stack.clear();
    large_stack.clear();
    for (int64_t i = 0; i < n; ++i) {
      if (area[i] < 1.0)
        small_stack.push_back(static_cast<int32_t>(i));
      else
        large_stack.push_back(static_cast<int32_t>(i));
      accept[s + i] = 1.0f;
      alias[s + i] = 0;
    }
    while (!small_stack.empty() && !large_stack.empty()) {
      const int32_t sm = small_stack.back();
      small_stack.pop_back();
      const int32_t lg = large_stack.back();
      large_stack.pop_back();
      accept[s + sm] = static_cast<float>(area[sm]);
      alias[s + sm] = lg;
      area[lg] -= (1.0 - area[sm]);
      if (area[lg] < 1.0)
        small_stack.push_back(lg);
      else
        large_stack.push_back(lg);
    }
    // leftovers (numerical) keep accept = 1.0
  }
}

// Exact DTW with the struc2vec ground cost.
// opt1 != 0: sequences are flattened (degree, count) pairs, length = 2*n,
//   cost = (max/min - 1) * max(count_a, count_b)   [reference cost_max]
// opt1 == 0: plain degree sequences, cost = max/min - 1.
double dtw_rle(const double* a, int64_t na, const double* b, int64_t nb,
               int32_t opt1) {
  const int64_t n = opt1 ? na / 2 : na;
  const int64_t m = opt1 ? nb / 2 : nb;
  if (n == 0 || m == 0) return 0.0;
  const double INF = 1e300;
  std::vector<double> prev(m + 1, INF), cur(m + 1, INF);
  prev[0] = 0.0;
  for (int64_t i = 1; i <= n; ++i) {
    cur[0] = INF;
    const double ad = opt1 ? a[2 * (i - 1)] : a[i - 1];
    const double ac = opt1 ? a[2 * (i - 1) + 1] : 1.0;
    for (int64_t j = 1; j <= m; ++j) {
      const double bd = opt1 ? b[2 * (j - 1)] : b[j - 1];
      const double bc = opt1 ? b[2 * (j - 1) + 1] : 1.0;
      const double mx = std::max(ad, bd);
      const double mn = std::max(std::min(ad, bd), 1e-12);
      double c = mx / mn - 1.0;
      if (opt1) c *= std::max(ac, bc);
      const double best =
          std::min(prev[j], std::min(cur[j - 1], prev[j - 1]));
      cur[j] = c + best;
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

}  // extern "C"
