// mhc_host — native host-side runtime for the TPU codec.
//
// Capability parity: the reference's runtime is native C++ (file IO, bit
// IO, driver — SURVEY.md §2b). The TPU framework's device path is
// JAX/XLA/Pallas; this library is the native counterpart for the
// host-side data plane: packing/unpacking the container payload
// (variable-length unit streams <-> fixed-stride word matrices) without
// Python/numpy overhead. Loaded via ctypes (utils/native.py) with a
// numpy fallback when the .so is absent.
//
// Build: make -C native   (g++ -O3 -march=native -pthread)

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

int hw_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(std::min(n, 16u)) : 4;
}

template <typename F>
void parallel_rows(int64_t R, F&& fn) {
  int nt = hw_threads();
  if (R < 1024 || nt <= 1) {
    fn((int64_t)0, R);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (R + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(R, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=, &fn] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

}  // namespace

extern "C" {

// Concatenate R variable-length unit streams (prefix of each fixed-stride
// row) into `out`. `offsets[i]` = destination offset of row i (exclusive
// prefix sum of lens, precomputed by the caller); lens[i] <= row_stride.
void mhc_join(const uint8_t* rows, int64_t R, int64_t row_stride,
              const int64_t* lens, const int64_t* offsets, uint8_t* out) {
  parallel_rows(R, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      std::memcpy(out + offsets[i], rows + i * row_stride,
                  (size_t)lens[i]);
    }
  });
}

// Inverse of mhc_join: scatter the packed payload back into zero-padded
// fixed-stride rows.
void mhc_split(const uint8_t* payload, int64_t R, int64_t row_stride,
               const int64_t* lens, const int64_t* offsets, uint8_t* rows) {
  parallel_rows(R, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      uint8_t* dst = rows + i * row_stride;
      std::memcpy(dst, payload + offsets[i], (size_t)lens[i]);
      std::memset(dst + lens[i], 0, (size_t)(row_stride - lens[i]));
    }
  });
}

// Big-endian u32 byteswap of a word matrix in place (words <-> the
// MSB-first byte stream view), threaded.
void mhc_bswap32(uint32_t* words, int64_t n) {
  parallel_rows(n, [=](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) {
      words[i] = __builtin_bswap32(words[i]);
    }
  });
}

int mhc_version() { return 1; }

}  // extern "C"
