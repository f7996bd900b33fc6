// Parallel weight-file IO + dtype conversion.
//
// Native counterpart of the reference's weight loader
// (reference: src/utils/weight_utils.cu:90-182 — fread into a host vector,
// optional type-converting kernel, cudaMemcpy H2D). On TPU the device copy
// is jax.device_put; what the host owns is reading tens of GB of
// safetensors/.bin and converting fp32/fp16 → bf16 fast enough to not
// dominate model start-up. Python does this single-threaded through numpy;
// this library mmaps the file and fans the convert/copy out over threads —
// a 13 GB fp16 checkpoint converts in seconds instead of minutes.
//
// Exposed through the C API in native_api.cc (ctypes binding:
// llm_inference_tpu/native/__init__.py).

#include "weight_io.h"

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace llmi {

namespace {

inline uint16_t F32ToBf16(float f) {
  uint32_t bits;
  std::memcpy(&bits, &f, 4);
  // NaN guard first: a low-payload NaN (upper-mantissa bits < 0x8000)
  // would carry into the exponent under round-to-nearest-even and come
  // out as Inf; ml_dtypes/XLA preserve NaN (quietened)
  if ((bits & 0x7F800000u) == 0x7F800000u && (bits & 0x007FFFFFu)) {
    return static_cast<uint16_t>((bits >> 16) | 0x0040u);  // quiet NaN
  }
  // round-to-nearest-even, matching XLA/numpy ml_dtypes semantics
  uint32_t rounding = 0x7FFF + ((bits >> 16) & 1);
  return static_cast<uint16_t>((bits + rounding) >> 16);
}

inline float F16ToF32(uint16_t h) {
  uint32_t sign = (h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1F;
  uint32_t mant = h & 0x3FF;
  uint32_t bits;
  if (exp == 0) {
    if (mant == 0) {
      bits = sign;  // zero
    } else {        // subnormal: normalize
      int shift = 0;
      while (!(mant & 0x400)) {
        mant <<= 1;
        ++shift;
      }
      mant &= 0x3FF;
      bits = sign | ((127 - 15 - shift + 1) << 23) | (mant << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7F800000u | (mant << 13);  // inf/nan
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (mant << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

void ParallelFor(int64_t n, int threads, int64_t min_chunk,
                 const std::function<void(int64_t, int64_t)>& fn) {
  if (threads <= 1 || n <= min_chunk) {
    fn(0, n);
    return;
  }
  int nt = static_cast<int>(
      std::min<int64_t>(threads, (n + min_chunk - 1) / min_chunk));
  std::vector<std::thread> ts;
  ts.reserve(nt);
  int64_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    int64_t lo = t * chunk;
    int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back(fn, lo, hi);
  }
  for (auto& t : ts) t.join();
}

}  // namespace

void ConvertF32ToBf16(const float* src, uint16_t* dst, int64_t n,
                      int threads) {
  ParallelFor(n, threads, 1 << 20, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) dst[i] = F32ToBf16(src[i]);
  });
}

void ConvertF16ToBf16(const uint16_t* src, uint16_t* dst, int64_t n,
                      int threads) {
  ParallelFor(n, threads, 1 << 20, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) dst[i] = F32ToBf16(F16ToF32(src[i]));
  });
}

void ConvertF16ToF32(const uint16_t* src, float* dst, int64_t n,
                     int threads) {
  ParallelFor(n, threads, 1 << 20, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) dst[i] = F16ToF32(src[i]);
  });
}

MappedFile::~MappedFile() {
  if (data) munmap(const_cast<uint8_t*>(data), size);
  if (fd >= 0) close(fd);
}

bool MapFile(const char* path, MappedFile* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return false;
  struct stat st;
  if (fstat(fd, &st) != 0) {
    close(fd);
    return false;
  }
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (p == MAP_FAILED) {
    close(fd);
    return false;
  }
  // the loader reads every byte exactly once, front to back per tensor
  madvise(p, st.st_size, MADV_SEQUENTIAL);
  out->fd = fd;
  out->data = static_cast<const uint8_t*>(p);
  out->size = static_cast<int64_t>(st.st_size);
  return true;
}

void ParallelMemcpy(const uint8_t* src, uint8_t* dst, int64_t n,
                    int threads) {
  ParallelFor(n, threads, 4 << 20, [&](int64_t lo, int64_t hi) {
    std::memcpy(dst + lo, src + lo, hi - lo);
  });
}

}  // namespace llmi
