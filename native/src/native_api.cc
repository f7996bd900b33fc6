// C API over the native components, consumed via ctypes
// (llm_inference_tpu/native/__init__.py). Plain C ABI — no pybind11.

#include <cstdint>
#include <cstring>
#include <string>

#include "tokenizer.h"
#include "weight_io.h"

extern "C" {

// ---- tokenizer ------------------------------------------------------------

void* llmi_tokenizer_load(const char* path) {
  return llmi::Tokenizer::LoadBinary(path);
}

void llmi_tokenizer_free(void* tok) {
  delete static_cast<llmi::Tokenizer*>(tok);
}

int32_t llmi_tokenizer_vocab_size(void* tok) {
  return static_cast<llmi::Tokenizer*>(tok)->vocab_size();
}

int32_t llmi_tokenizer_bos_id(void* tok) {
  return static_cast<llmi::Tokenizer*>(tok)->bos_id();
}

int32_t llmi_tokenizer_eos_id(void* tok) {
  return static_cast<llmi::Tokenizer*>(tok)->eos_id();
}

// Returns the number of ids (may exceed max_out — caller re-calls with a
// bigger buffer; only min(n, max_out) ids are written).
int32_t llmi_tokenizer_encode(void* tok, const char* text, int32_t add_bos,
                              int32_t* out, int32_t max_out) {
  auto ids = static_cast<llmi::Tokenizer*>(tok)->Encode(text, add_bos != 0);
  int32_t n = static_cast<int32_t>(ids.size());
  int32_t m = n < max_out ? n : max_out;
  std::memcpy(out, ids.data(), m * sizeof(int32_t));
  return n;
}

// Returns the byte length of the decoded text (same re-call contract).
int32_t llmi_tokenizer_decode(void* tok, const int32_t* ids, int32_t n,
                              char* out, int32_t max_out) {
  std::string s = static_cast<llmi::Tokenizer*>(tok)->Decode(ids, n);
  int32_t len = static_cast<int32_t>(s.size());
  int32_t m = len < max_out ? len : max_out;
  std::memcpy(out, s.data(), m);
  return len;
}

// ---- weight IO ------------------------------------------------------------

void llmi_convert_f32_to_bf16(const float* src, uint16_t* dst, int64_t n,
                              int32_t threads) {
  llmi::ConvertF32ToBf16(src, dst, n, threads);
}

void llmi_convert_f16_to_bf16(const uint16_t* src, uint16_t* dst, int64_t n,
                              int32_t threads) {
  llmi::ConvertF16ToBf16(src, dst, n, threads);
}

void llmi_convert_f16_to_f32(const uint16_t* src, float* dst, int64_t n,
                             int32_t threads) {
  llmi::ConvertF16ToF32(src, dst, n, threads);
}

void* llmi_mmap_open(const char* path, const uint8_t** data, int64_t* size) {
  auto* mf = new llmi::MappedFile();
  if (!llmi::MapFile(path, mf)) {
    delete mf;
    return nullptr;
  }
  *data = mf->data;
  *size = mf->size;
  return mf;
}

void llmi_mmap_close(void* handle) {
  delete static_cast<llmi::MappedFile*>(handle);
}

void llmi_parallel_memcpy(const uint8_t* src, uint8_t* dst, int64_t n,
                          int32_t threads) {
  llmi::ParallelMemcpy(src, dst, n, threads);
}

}  // extern "C"
