// BPE tokenizer over the reference binary vocab format — see tokenizer.cc.
#pragma once

#include <cstdint>
#include <string>
#include <unordered_map>
#include <vector>

namespace llmi {

class Tokenizer {
 public:
  // Returns nullptr on failure (message in *err if given).
  static Tokenizer* LoadBinary(const std::string& path,
                               std::string* err = nullptr);

  std::vector<int32_t> Encode(const std::string& text, bool add_bos) const;
  std::string Decode(const int32_t* ids, int n) const;

  int32_t vocab_size() const {
    return static_cast<int32_t>(id_to_token_.size());
  }
  int32_t bos_id() const { return bos_id_; }
  int32_t eos_id() const { return eos_id_; }

 private:
  std::unordered_map<std::string, int32_t> token_to_id_;
  std::unordered_map<std::string, float> scores_;
  std::vector<std::string> id_to_token_;
  int32_t byte_tokens_[256];
  int32_t bos_id_ = 1;
  int32_t eos_id_ = 2;
  int32_t unk_id_ = 0;
};

}  // namespace llmi
