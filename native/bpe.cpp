// Byte-level BPE tokenizer (GPT-2 / RoBERTa) — native host-path core.
//
// The reference's only native code is external (apex CUDA, ATen conv_tbc,
// torch C++ MHA, the METEOR jar — SURVEY.md §2). Our TPU compute path is
// XLA/Pallas-compiled; the host-side hot loop that remains is tokenizing
// ~800k articles x 512 BPE tokens during dataset preprocessing
// (tell/data/token_indexers/roberta_indexer.py:117-147 does this through
// torch.hub fairseq). This C++ implementation is loaded via ctypes
// (tell_tpu/data/native.py) and parity-tested against the pure-Python
// ByteBPE on arbitrary unicode inputs (tests/test_native_bpe.py).
//
// Pre-tokenization implements GPT-2's regex
//   's|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+
//   |\s+(?!\S)|\s+
// with exact \p{L}/\p{N}/\s codepoint tables generated from Python
// unicodedata (unicode_tables.h), so chunk boundaries match the `regex`
// module character-for-character.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include "unicode_tables.h"

namespace {

bool in_ranges(uint32_t cp, const uint32_t (*ranges)[2], int n) {
  int lo = 0, hi = n - 1;
  while (lo <= hi) {
    int mid = (lo + hi) / 2;
    if (cp < ranges[mid][0]) hi = mid - 1;
    else if (cp > ranges[mid][1]) lo = mid + 1;
    else return true;
  }
  return false;
}

bool is_letter(uint32_t cp) { return in_ranges(cp, kLetterRanges, kLetterRanges_n); }
bool is_number(uint32_t cp) { return in_ranges(cp, kNumberRanges, kNumberRanges_n); }
bool is_space(uint32_t cp) { return in_ranges(cp, kSpaceRanges, kSpaceRanges_n); }

// Decode one UTF-8 codepoint at s[i]; advances *len. Invalid bytes decode as
// U+FFFD with len 1 (matches Python's handling closely enough for class
// checks; raw bytes still flow through the byte encoder untouched).
uint32_t decode_utf8(const unsigned char* s, size_t n, size_t i, int* len) {
  unsigned char c = s[i];
  if (c < 0x80) { *len = 1; return c; }
  int extra; uint32_t cp;
  if ((c >> 5) == 0x6) { extra = 1; cp = c & 0x1F; }
  else if ((c >> 4) == 0xE) { extra = 2; cp = c & 0x0F; }
  else if ((c >> 3) == 0x1E) { extra = 3; cp = c & 0x07; }
  else { *len = 1; return 0xFFFD; }
  if (i + extra >= n) { *len = 1; return 0xFFFD; }
  for (int k = 1; k <= extra; ++k) {
    unsigned char cc = s[i + k];
    if ((cc >> 6) != 0x2) { *len = 1; return 0xFFFD; }
    cp = (cp << 6) | (cc & 0x3F);
  }
  *len = extra + 1;
  return cp;
}

void append_utf8(std::string* out, uint32_t cp) {
  if (cp < 0x80) { out->push_back((char)cp); }
  else if (cp < 0x800) {
    out->push_back((char)(0xC0 | (cp >> 6)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back((char)(0xE0 | (cp >> 12)));
    out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  } else {
    out->push_back((char)(0xF0 | (cp >> 18)));
    out->push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back((char)(0x80 | (cp & 0x3F)));
  }
}

struct BPE {
  std::unordered_map<std::string, int32_t> vocab;
  std::unordered_map<std::string, int32_t> ranks;  // "a\x01b" -> rank
  std::string byte_enc[256];                       // byte -> mapped UTF-8
  std::unordered_map<std::string, std::vector<int32_t>> cache;
  int32_t unk_id;

  void init_byte_encoder() {
    // bytes_to_unicode(): printable ranges map to themselves, the other 68
    // bytes to 256+i (tell_tpu/data/tokenizer.py:28-45).
    bool direct[256] = {false};
    for (int b = '!'; b <= '~'; ++b) direct[b] = true;
    for (int b = 0xA1; b <= 0xAC; ++b) direct[b] = true;
    for (int b = 0xAE; b <= 0xFF; ++b) direct[b] = true;
    int n = 0;
    for (int b = 0; b < 256; ++b) {
      std::string s;
      append_utf8(&s, direct[b] ? (uint32_t)b : (uint32_t)(256 + n));
      if (!direct[b]) ++n;
      byte_enc[b] = s;
    }
  }

  std::vector<std::string> split_codepoints(const std::string& s) {
    std::vector<std::string> out;
    const unsigned char* p = (const unsigned char*)s.data();
    size_t i = 0;
    while (i < s.size()) {
      int len;
      decode_utf8(p, s.size(), i, &len);
      out.emplace_back(s.substr(i, len));
      i += len;
    }
    return out;
  }

  const std::vector<int32_t>& bpe_ids(const std::string& mapped) {
    auto it = cache.find(mapped);
    if (it != cache.end()) return it->second;
    std::vector<std::string> word = split_codepoints(mapped);
    while (word.size() > 1) {
      int best_rank = INT32_MAX, best_i = -1;
      for (size_t i = 0; i + 1 < word.size(); ++i) {
        auto r = ranks.find(word[i] + '\x01' + word[i + 1]);
        if (r != ranks.end() && r->second < best_rank) {
          best_rank = r->second;
          best_i = (int)i;
        }
      }
      if (best_i < 0) break;
      const std::string a = word[best_i], b = word[best_i + 1];
      // merge every (a, b) occurrence, like the Python loop
      std::vector<std::string> merged;
      merged.reserve(word.size());
      for (size_t i = 0; i < word.size();) {
        if (i + 1 < word.size() && word[i] == a && word[i + 1] == b) {
          merged.push_back(a + b);
          i += 2;
        } else {
          merged.push_back(word[i]);
          i += 1;
        }
      }
      word.swap(merged);
    }
    std::vector<int32_t> ids;
    ids.reserve(word.size());
    for (const auto& w : word) {
      auto v = vocab.find(w);
      ids.push_back(v == vocab.end() ? unk_id : v->second);
    }
    if (cache.size() < 500000) {
      return cache.emplace(mapped, std::move(ids)).first->second;
    }
    static thread_local std::vector<int32_t> tmp;
    tmp = std::move(ids);
    return tmp;
  }
};

// GPT-2 pre-tokenizer: yields [start, end) byte offsets of each chunk.
void pretokenize(const unsigned char* s, size_t n,
                 std::vector<std::pair<size_t, size_t>>* chunks) {
  static const char* kContractions[] = {"'s", "'t", "'re", "'ve",
                                        "'m", "'ll", "'d"};
  size_t i = 0;
  while (i < n) {
    // contractions (case-sensitive, pattern order)
    if (s[i] == '\'') {
      bool matched = false;
      for (const char* c : kContractions) {
        size_t len = strlen(c);
        if (i + len <= n && memcmp(s + i, c, len) == 0) {
          chunks->emplace_back(i, i + len);
          i += len;
          matched = true;
          break;
        }
      }
      if (matched) continue;
    }
    // " ?\p{L}+ | " ?\p{N}+ | " ?[^\s\p{L}\p{N}]+  (literal-space prefix)
    size_t j = i + (s[i] == ' ' ? 1 : 0);
    if (j < n) {
      int len;
      uint32_t cp = decode_utf8(s, n, j, &len);
      bool l = is_letter(cp), d = is_number(cp), sp = is_space(cp);
      if (l || d || (!sp)) {
        // pick the class of the first codepoint and consume its run
        size_t k = j;
        while (k < n) {
          int kl;
          uint32_t kc = decode_utf8(s, n, k, &kl);
          bool match = l ? is_letter(kc)
                         : d ? is_number(kc)
                             : (!is_space(kc) && !is_letter(kc) &&
                                !is_number(kc));
          if (!match) break;
          k += kl;
        }
        if (k > j) {
          chunks->emplace_back(i, k);
          i = k;
          continue;
        }
      }
    }
    // whitespace runs: \s+(?!\S) then \s+
    size_t k = i;
    while (k < n) {
      int kl;
      uint32_t kc = decode_utf8(s, n, k, &kl);
      if (!is_space(kc)) break;
      k += kl;
    }
    if (k == i) {  // lone non-space that didn't start a run (defensive)
      int kl;
      decode_utf8(s, n, i, &kl);
      chunks->emplace_back(i, i + kl);
      i += kl;
      continue;
    }
    if (k == n) {
      chunks->emplace_back(i, k);  // trailing whitespace: \s+(?!\S)
      i = k;
    } else {
      // leave the last whitespace char to prefix the next chunk when the
      // run has >1 chars; a 1-char run followed by non-space matches \s+
      int last_len = 1;
      size_t back = k;
      // find byte length of the final whitespace codepoint
      size_t p = i;
      while (p < k) {
        int pl;
        decode_utf8(s, n, p, &pl);
        if (p + pl >= k) { last_len = pl; break; }
        p += pl;
      }
      if (k - i > (size_t)last_len) {
        chunks->emplace_back(i, k - last_len);
        i = k - last_len;
        // the leftover single whitespace joins the next alternative round
      } else {
        chunks->emplace_back(i, k);  // single whitespace, \s+
        i = k;
      }
      (void)back;
    }
  }
}

}  // namespace

extern "C" {

void* tnt_bpe_new(const char* tokens_blob, const int32_t* ids, int n_vocab,
                  const char* merges_blob, int n_merges, int unk_id) {
  BPE* h = new BPE();
  h->unk_id = unk_id;
  h->init_byte_encoder();
  {
    const char* p = tokens_blob;
    for (int i = 0; i < n_vocab; ++i) {
      const char* nl = strchr(p, '\n');
      size_t len = nl ? (size_t)(nl - p) : strlen(p);
      h->vocab.emplace(std::string(p, len), ids[i]);
      p += len + (nl ? 1 : 0);
    }
  }
  {
    const char* p = merges_blob;
    for (int i = 0; i < n_merges; ++i) {
      const char* nl = strchr(p, '\n');
      size_t len = nl ? (size_t)(nl - p) : strlen(p);
      std::string line(p, len);
      size_t sp = line.find(' ');
      h->ranks.emplace(line.substr(0, sp) + '\x01' + line.substr(sp + 1), i);
      p += len + (nl ? 1 : 0);
    }
  }
  return h;
}

void tnt_bpe_free(void* h) { delete (BPE*)h; }

// Returns the number of ids written (<= max_out); -1 on overflow.
int tnt_bpe_encode(void* hv, const char* text, int32_t* out, int max_out) {
  BPE* h = (BPE*)hv;
  const unsigned char* s = (const unsigned char*)text;
  size_t n = strlen(text);
  std::vector<std::pair<size_t, size_t>> chunks;
  chunks.reserve(n / 4 + 4);
  pretokenize(s, n, &chunks);
  int w = 0;
  std::string mapped;
  for (auto [a, b] : chunks) {
    mapped.clear();
    for (size_t i = a; i < b; ++i) mapped += h->byte_enc[s[i]];
    for (int32_t id : h->bpe_ids(mapped)) {
      if (w >= max_out) return -1;
      out[w++] = id;
    }
  }
  return w;
}

}  // extern "C"
