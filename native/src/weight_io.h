// Parallel weight IO / dtype conversion — see weight_io.cc.
#pragma once

#include <cstdint>
#include <functional>

namespace llmi {

void ConvertF32ToBf16(const float* src, uint16_t* dst, int64_t n, int threads);
void ConvertF16ToBf16(const uint16_t* src, uint16_t* dst, int64_t n,
                      int threads);
void ConvertF16ToF32(const uint16_t* src, float* dst, int64_t n, int threads);

struct MappedFile {
  int fd = -1;
  const uint8_t* data = nullptr;
  int64_t size = 0;
  ~MappedFile();
};

bool MapFile(const char* path, MappedFile* out);
void ParallelMemcpy(const uint8_t* src, uint8_t* dst, int64_t n, int threads);

}  // namespace llmi
