// Native WordPiece tokenizer (C++), exposed through a C ABI for ctypes.
//
// Replaces the reference's dependency on HF's Rust `tokenizers` fast path
// (mmaction/datasets/pipelines/tokenization.py:3-29) with an in-repo native
// implementation. Semantics mirror clover_tpu/data/tokenization.py:
// basic tokenization (lowercase, ASCII accent fold via NFD-equivalent for
// Latin-1, punctuation split, CJK isolation) + greedy longest-match-first
// WordPiece with [UNK] fallback, then [CLS]/[SEP] framing, truncation and
// zero padding.
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -o libwordpiece.so wordpiece.cc

#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
  std::unordered_map<std::string, int32_t> table;
  int32_t pad = 0, unk = 1, cls = 2, sep = 3, mask = 4;
  bool lower_case = true;
  size_t max_chars_per_word = 100;
};

bool is_ascii_punct(unsigned char c) {
  return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
         (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

// Decode one UTF-8 codepoint starting at s[i]; returns length consumed.
int utf8_decode(const std::string& s, size_t i, uint32_t* cp) {
  unsigned char c = s[i];
  if (c < 0x80) { *cp = c; return 1; }
  if ((c >> 5) == 0x6 && i + 1 < s.size()) {
    *cp = ((c & 0x1F) << 6) | (s[i + 1] & 0x3F);
    return 2;
  }
  if ((c >> 4) == 0xE && i + 2 < s.size()) {
    *cp = ((c & 0x0F) << 12) | ((s[i + 1] & 0x3F) << 6) | (s[i + 2] & 0x3F);
    return 3;
  }
  if ((c >> 3) == 0x1E && i + 3 < s.size()) {
    *cp = ((c & 0x07) << 18) | ((s[i + 1] & 0x3F) << 12) |
          ((s[i + 2] & 0x3F) << 6) | (s[i + 3] & 0x3F);
    return 4;
  }
  *cp = 0xFFFD;
  return 1;
}

bool is_cjk(uint32_t cp) {
  return (cp >= 0x4E00 && cp <= 0x9FFF) || (cp >= 0x3400 && cp <= 0x4DBF) ||
         (cp >= 0x20000 && cp <= 0x2A6DF) || (cp >= 0xF900 && cp <= 0xFAFF);
}

// Minimal Latin accent folding (NFD strip for the common Latin-1 range).
uint32_t fold_accent(uint32_t cp) {
  if (cp >= 0xC0 && cp <= 0xC5) return 'a';
  if (cp == 0xC7) return 'c';
  if (cp >= 0xC8 && cp <= 0xCB) return 'e';
  if (cp >= 0xCC && cp <= 0xCF) return 'i';
  if (cp == 0xD1) return 'n';
  if ((cp >= 0xD2 && cp <= 0xD6) || cp == 0xD8) return 'o';
  if (cp >= 0xD9 && cp <= 0xDC) return 'u';
  if (cp == 0xDD) return 'y';
  if (cp >= 0xE0 && cp <= 0xE5) return 'a';
  if (cp == 0xE7) return 'c';
  if (cp >= 0xE8 && cp <= 0xEB) return 'e';
  if (cp >= 0xEC && cp <= 0xEF) return 'i';
  if (cp == 0xF1) return 'n';
  if ((cp >= 0xF2 && cp <= 0xF6) || cp == 0xF8) return 'o';
  if (cp >= 0xF9 && cp <= 0xFC) return 'u';
  if (cp == 0xFD || cp == 0xFF) return 'y';
  return cp;
}

void append_cp(std::string* out, uint32_t cp) {
  if (cp < 0x80) {
    out->push_back(static_cast<char>(cp));
  } else if (cp < 0x800) {
    out->push_back(static_cast<char>(0xC0 | (cp >> 6)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    out->push_back(static_cast<char>(0xE0 | (cp >> 12)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  } else {
    out->push_back(static_cast<char>(0xF0 | (cp >> 18)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 12) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | ((cp >> 6) & 0x3F)));
    out->push_back(static_cast<char>(0x80 | (cp & 0x3F)));
  }
}

std::vector<std::string> basic_tokenize(const Vocab& v, const std::string& text) {
  std::vector<std::string> words;
  std::string cur;
  auto flush = [&]() {
    if (!cur.empty()) {
      words.push_back(cur);
      cur.clear();
    }
  };
  size_t i = 0;
  while (i < text.size()) {
    uint32_t cp;
    int n = utf8_decode(text, i, &cp);
    i += n;
    if (cp == 0 || cp == 0xFFFD) continue;
    if (cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == 0xA0) {
      flush();
      continue;
    }
    if (is_cjk(cp)) {
      flush();
      std::string one;
      append_cp(&one, cp);
      words.push_back(one);
      continue;
    }
    if (v.lower_case) {
      if (cp < 0x80) cp = std::tolower(static_cast<int>(cp));
      else cp = fold_accent(cp);
    }
    if (cp < 0x80 && is_ascii_punct(static_cast<unsigned char>(cp))) {
      flush();
      words.push_back(std::string(1, static_cast<char>(cp)));
      continue;
    }
    append_cp(&cur, cp);
  }
  flush();
  return words;
}

void wordpiece(const Vocab& v, const std::string& word,
               std::vector<int32_t>* out) {
  if (word.size() > v.max_chars_per_word) {
    out->push_back(v.unk);
    return;
  }
  std::vector<int32_t> pieces;
  size_t start = 0;
  while (start < word.size()) {
    size_t end = word.size();
    int32_t found = -1;
    size_t found_end = start;
    while (start < end) {
      std::string sub =
          (start > 0 ? "##" : "") + word.substr(start, end - start);
      auto it = v.table.find(sub);
      if (it != v.table.end()) {
        found = it->second;
        found_end = end;
        break;
      }
      --end;
    }
    if (found < 0) {
      out->push_back(v.unk);
      return;
    }
    pieces.push_back(found);
    start = found_end;
  }
  out->insert(out->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

void* wp_create(const char* vocab_path, int lower_case) {
  auto* v = new Vocab();
  v->lower_case = lower_case != 0;
  std::ifstream f(vocab_path);
  if (!f.is_open()) {
    delete v;
    return nullptr;
  }
  std::string line;
  int32_t idx = 0;
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (!line.empty()) v->table.emplace(line, idx);
    ++idx;
  }
  auto find = [&](const char* tok, int32_t fallback) {
    auto it = v->table.find(tok);
    return it == v->table.end() ? fallback : it->second;
  };
  v->pad = find("[PAD]", 0);
  v->unk = find("[UNK]", 1);
  v->cls = find("[CLS]", 2);
  v->sep = find("[SEP]", 3);
  v->mask = find("[MASK]", 4);
  return v;
}

int wp_vocab_size(void* handle) {
  return static_cast<int>(static_cast<Vocab*>(handle)->table.size());
}

// Encodes text into [CLS] ids [SEP] + zero pad. Writes max_length ids and
// mask entries; returns the unpadded length.
int wp_encode(void* handle, const char* text, int max_length,
              int32_t* out_ids, int32_t* out_mask) {
  const Vocab& v = *static_cast<Vocab*>(handle);
  std::vector<int32_t> ids;
  for (const auto& word : basic_tokenize(v, text)) {
    wordpiece(v, word, &ids);
  }
  if (static_cast<int>(ids.size()) > max_length - 2) {
    ids.resize(max_length - 2);
  }
  int n = 0;
  out_ids[n++] = v.cls;
  for (int32_t id : ids) out_ids[n++] = id;
  out_ids[n++] = v.sep;
  for (int i = 0; i < n; ++i) out_mask[i] = 1;
  for (int i = n; i < max_length; ++i) {
    out_ids[i] = v.pad;
    out_mask[i] = 0;
  }
  return n;
}

void wp_encode_batch(void* handle, const char** texts, int n_texts,
                     int max_length, int32_t* out_ids, int32_t* out_mask) {
  for (int i = 0; i < n_texts; ++i) {
    wp_encode(handle, texts[i], max_length, out_ids + i * max_length,
              out_mask + i * max_length);
  }
}

void wp_destroy(void* handle) { delete static_cast<Vocab*>(handle); }

}  // extern "C"
