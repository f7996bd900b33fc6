// SentencePiece-style BPE tokenizer over the reference's binary vocab format.
//
// Native counterpart of llm_inference_tpu/engine/tokenizer.py (BPETokenizer)
// and functional equivalent of the reference's C++ trie tokenizer
// (reference: src/models/tokenizer.h:57-348, binary reader at :138-167).
// The merge algorithm mirrors the Python implementation exactly — a doubly
// linked symbol list over unicode codepoints with a max-score heap of
// candidate adjacent merges (leftmost wins ties) and <0xNN> byte fallback —
// so encode() is id-for-id identical to the Python tokenizer (and to HF for
// the llama-2 vocab). Tokenization is a host-side serving hot path; this
// runs ~30-100x faster than the pure-Python version.
//
// Exposed through the C API in native_api.cc (ctypes binding:
// llm_inference_tpu/native/__init__.py).

#include "tokenizer.h"

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <queue>
#include <stdexcept>
#include <string>
#include <unordered_map>
#include <vector>

namespace llmi {

namespace {

constexpr const char* kSpSpace = "\xe2\x96\x81";  // ▁

struct Reader {
  const uint8_t* p;
  size_t n;
  size_t off = 0;

  int32_t ri() {
    if (off + 4 > n) throw std::runtime_error("vocab file truncated");
    int32_t v;
    std::memcpy(&v, p + off, 4);
    off += 4;
    return v;
  }
  float rf() {
    if (off + 4 > n) throw std::runtime_error("vocab file truncated");
    float v;
    std::memcpy(&v, p + off, 4);
    off += 4;
    return v;
  }
  std::string rs() {
    int32_t len = ri();
    if (len < 0 || off + static_cast<size_t>(len) > n)
      throw std::runtime_error("vocab file truncated");
    std::string s(reinterpret_cast<const char*>(p + off), len);
    off += len;
    return s;
  }
};

// UTF-8 codepoint start offsets of s, plus a final offset == s.size().
std::vector<int32_t> CodepointStarts(const std::string& s) {
  std::vector<int32_t> starts;
  starts.reserve(s.size() + 1);
  for (size_t i = 0; i < s.size(); ++i) {
    if ((static_cast<uint8_t>(s[i]) & 0xC0) != 0x80) {
      starts.push_back(static_cast<int32_t>(i));
    }
  }
  starts.push_back(static_cast<int32_t>(s.size()));
  return starts;
}

}  // namespace

Tokenizer* Tokenizer::LoadBinary(const std::string& path, std::string* err) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    if (err) *err = "cannot open " + path;
    return nullptr;
  }
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    if (err) *err = "short read on " + path;
    return nullptr;
  }
  std::fclose(f);

  auto* tok = new Tokenizer();
  try {
    Reader r{buf.data(), buf.size()};
    int32_t version = r.ri();
    if (version >= 1) {
      int32_t n_kv = r.ri();
      for (int32_t i = 0; i < n_kv; ++i) {
        std::string k = r.rs();
        std::string v = r.rs();
        if (k == "bos_token_id") tok->bos_id_ = std::atoi(v.c_str());
        if (k == "eos_token_id") tok->eos_id_ = std::atoi(v.c_str());
      }
    }
    int32_t n_vocab = r.ri();
    int32_t max_id = -1;
    std::vector<std::pair<std::string, std::pair<int32_t, float>>> entries;
    entries.reserve(n_vocab);
    for (int32_t i = 0; i < n_vocab; ++i) {
      int32_t n_chars = r.ri();
      std::string piece;
      piece.reserve(n_chars);
      for (int32_t c = 0; c < n_chars; ++c) {
        piece.push_back(static_cast<char>(r.ri() & 0xFF));
      }
      int32_t tid = r.ri();
      float score = r.rf();
      entries.emplace_back(std::move(piece), std::make_pair(tid, score));
      max_id = std::max(max_id, tid);
    }
    tok->id_to_token_.assign(max_id + 1, std::string());
    for (auto& e : entries) {
      tok->token_to_id_[e.first] = e.second.first;
      tok->scores_[e.first] = e.second.second;
      tok->id_to_token_[e.second.first] = e.first;
    }
    char name[8];
    for (int b = 0; b < 256; ++b) {
      std::snprintf(name, sizeof(name), "<0x%02X>", b);
      auto it = tok->token_to_id_.find(name);
      tok->byte_tokens_[b] = it == tok->token_to_id_.end() ? -1 : it->second;
    }
  } catch (const std::exception& e) {
    if (err) *err = e.what();
    delete tok;
    return nullptr;
  }
  return tok;
}

std::vector<int32_t> Tokenizer::Encode(const std::string& text,
                                       bool add_bos) const {
  // normalize: prepend ▁, every space → ▁ (SentencePiece convention)
  std::string s = kSpSpace;
  for (char c : text) {
    if (c == ' ') {
      s += kSpSpace;
    } else {
      s.push_back(c);
    }
  }

  std::vector<int32_t> ids;
  if (add_bos) ids.push_back(bos_id_);

  const std::vector<int32_t> cp = CodepointStarts(s);
  const int n = static_cast<int>(cp.size()) - 1;  // number of codepoints
  if (n == 0) return ids;

  // doubly-linked symbol list over codepoints; symbol i covers
  // codepoints [start[i], end[i])
  std::vector<int32_t> start(n), end(n), prev(n), nxt(n);
  std::vector<char> alive(n, 1);
  for (int i = 0; i < n; ++i) {
    start[i] = i;
    end[i] = i + 1;
    prev[i] = i - 1;
    nxt[i] = i + 1;
  }
  nxt[n - 1] = -1;

  // heap orders by (-score, left index, size) — exactly the Python heap's
  // tuple order, so merge sequence (and therefore output ids) match.
  struct Cand {
    float neg_score;
    int32_t left;
    int32_t size;  // candidate length in codepoints, for staleness checks
    bool operator>(const Cand& o) const {
      if (neg_score != o.neg_score) return neg_score > o.neg_score;
      if (left != o.left) return left > o.left;
      return size > o.size;
    }
  };
  std::priority_queue<Cand, std::vector<Cand>, std::greater<Cand>> heap;

  auto push = [&](int l) {
    if (l < 0) return;
    int r = nxt[l];
    if (r < 0) return;
    const char* base = s.data();
    std::string cand(base + cp[start[l]], base + cp[end[r]]);
    auto it = scores_.find(cand);
    if (it != scores_.end()) {
      heap.push({-it->second, l, end[r] - start[l]});
    }
  };

  for (int i = 0; i < n - 1; ++i) push(i);

  while (!heap.empty()) {
    Cand c = heap.top();
    heap.pop();
    int l = c.left;
    int r = l >= 0 ? nxt[l] : -1;
    if (l < 0 || r < 0 || !alive[l] || !alive[r] ||
        end[r] - start[l] != c.size) {
      continue;  // stale entry
    }
    end[l] = end[r];
    alive[r] = 0;
    nxt[l] = nxt[r];
    if (nxt[r] >= 0) prev[nxt[r]] = l;
    push(l);
    if (prev[l] >= 0) push(prev[l]);
  }

  for (int i = 0; i != -1; i = nxt[i]) {
    if (!alive[i]) continue;
    std::string piece(s.data() + cp[start[i]], s.data() + cp[end[i]]);
    auto it = token_to_id_.find(piece);
    if (it != token_to_id_.end()) {
      ids.push_back(it->second);
    } else {
      for (unsigned char b : piece) {  // byte fallback
        ids.push_back(byte_tokens_[b] >= 0 ? byte_tokens_[b] : unk_id_);
      }
    }
  }
  return ids;
}

std::string Tokenizer::Decode(const int32_t* ids, int n) const {
  std::string out;
  for (int i = 0; i < n; ++i) {
    int32_t tid = ids[i];
    if (tid < 0 || tid >= static_cast<int32_t>(id_to_token_.size())) continue;
    const std::string& tok = id_to_token_[tid];
    if (tok.size() == 6 && tok.compare(0, 3, "<0x") == 0 && tok[5] == '>') {
      out.push_back(static_cast<char>(std::stoi(tok.substr(3, 2), nullptr, 16)));
    } else if (tok == "<s>" || tok == "</s>" || tok == "<unk>") {
      continue;
    } else {
      out += tok;
    }
  }
  // ▁ → space
  std::string text;
  text.reserve(out.size());
  for (size_t i = 0; i < out.size();) {
    if (out.compare(i, 3, kSpSpace) == 0) {
      text.push_back(' ');
      i += 3;
    } else {
      text.push_back(out[i]);
      ++i;
    }
  }
  if (!text.empty() && text[0] == ' ') text.erase(0, 1);
  return text;
}

}  // namespace llmi
