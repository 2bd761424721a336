// Host-side data-path kernels for the input pipeline.
//
// The reference's equivalents are torch DataLoader worker processes doing
// numpy fancy-indexing + scaling (data/LRHR_dataset.py). Here the hot
// byte-moving ops run as multithreaded C++ (built by runtime/build.py,
// bound via ctypes in runtime/native.py, numpy fallback if unavailable):
//
//   gather_scale_f32 : batched sample gather + 1/scale normalisation
//   gather_residual_f32 : fused gather of (hr - lms) residual batches
//   u16_to_f32_scale : raw uint16 counts -> normalised float32
//
// All functions take contiguous row-major arrays; `item` is the per-sample
// element count (C*H*W).

#include <cstdint>
#include <thread>
#include <vector>
#include <algorithm>

namespace {

template <typename Fn>
void parallel_for(int64_t n, Fn fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t n_threads = std::min<int64_t>(n, hw ? hw : 4);
  if (n_threads <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int64_t t = 0; t < n_threads; ++t) {
    threads.emplace_back([=] {
      for (int64_t i = t; i < n; i += n_threads) fn(i);
    });
  }
  for (auto& th : threads) th.join();
}

}  // namespace

extern "C" {

void gather_scale_f32(const float* src, const int64_t* idx, int64_t n_idx,
                      int64_t item, float inv_scale, float* out) {
  parallel_for(n_idx, [=](int64_t i) {
    const float* s = src + idx[i] * item;
    float* d = out + i * item;
    for (int64_t j = 0; j < item; ++j) d[j] = s[j] * inv_scale;
  });
}

void gather_residual_f32(const float* hr, const float* lms, const int64_t* idx,
                         int64_t n_idx, int64_t item, float* out) {
  parallel_for(n_idx, [=](int64_t i) {
    const float* a = hr + idx[i] * item;
    const float* b = lms + idx[i] * item;
    float* d = out + i * item;
    for (int64_t j = 0; j < item; ++j) d[j] = a[j] - b[j];
  });
}

void u16_to_f32_scale(const uint16_t* src, int64_t n, float inv_scale,
                      float* out) {
  const int64_t chunk = 1 << 20;
  int64_t n_chunks = (n + chunk - 1) / chunk;
  parallel_for(n_chunks, [=](int64_t c) {
    int64_t lo = c * chunk;
    int64_t hi = std::min(n, lo + chunk);
    for (int64_t j = lo; j < hi; ++j) out[j] = float(src[j]) * inv_scale;
  });
}

}  // extern "C"
