// Monotonic DTW dynamic program + backtrace (host-side kernel).
//
// Native analogue of the reference's numba-JIT time_warp / align_from_distances
// (reference: ste_gan/emg_encoder/utils.py:24-54), used for silent-EMG loss
// alignment and silent-set evaluation over long utterances where a Python
// loop would dominate. Row-major costs [t1, t2]; same DP semantics as the
// reference: dtw[0][0] = 0, first row/column infinite,
// dtw[i][j] = costs[i][j] + min(up, left, diag); backtrace takes the
// first-minimal predecessor in the order (up, left, diag).
//
// Built as a plain shared library (no Python headers) and bound via ctypes.

#include <cstddef>
#include <cstdint>
#include <limits>
#include <vector>

namespace {
constexpr float kInf = std::numeric_limits<float>::infinity();
}

extern "C" {

// Fills dtw (size t1*t2) with the accumulated-cost matrix.
void ste_gan_dtw_matrix(const float* costs, int64_t t1, int64_t t2, float* dtw) {
  dtw[0] = 0.0f;
  for (int64_t j = 1; j < t2; ++j) dtw[j] = kInf;
  for (int64_t i = 1; i < t1; ++i) dtw[i * t2] = kInf;
  for (int64_t i = 1; i < t1; ++i) {
    const float* cost_row = costs + i * t2;
    float* row = dtw + i * t2;
    const float* prev = dtw + (i - 1) * t2;
    for (int64_t j = 1; j < t2; ++j) {
      float best = prev[j];                       // up
      if (row[j - 1] < best) best = row[j - 1];   // left
      if (prev[j - 1] < best) best = prev[j - 1]; // diag
      row[j] = cost_row[j] + best;
    }
  }
}

// Backtraces the alignment; writes t1 entries into `alignment`
// (alignment[i] = matched column of row i; untouched prefix stays 0).
void ste_gan_dtw_align(const float* costs, int64_t t1, int64_t t2,
                       int32_t* alignment) {
  std::vector<float> dtw(static_cast<size_t>(t1) * t2);
  ste_gan_dtw_matrix(costs, t1, t2, dtw.data());
  for (int64_t i = 0; i < t1; ++i) alignment[i] = 0;
  int64_t i = t1 - 1;
  int64_t j = t2 - 1;
  while (i > 0 && j > 0) {
    alignment[i] = static_cast<int32_t>(j);
    const float up = dtw[(i - 1) * t2 + j];
    const float left = dtw[i * t2 + (j - 1)];
    const float diag = dtw[(i - 1) * t2 + (j - 1)];
    // First-minimal in the order (up, left, diag), matching python min().
    if (up <= left && up <= diag) {
      --i;
    } else if (left <= diag) {
      --j;
    } else {
      --i;
      --j;
    }
  }
}

}  // extern "C"
