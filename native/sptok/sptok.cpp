// sptok — native SentencePiece-compatible tokenizer core.
//
// The reference links against the sentencepiece C++ runtime through its
// Python wrapper (/root/reference/chatglm_q/tokenizer.py:30); this package
// ships its own engine instead.  The Python implementation
// (chatglm_q_tpu/tokenizer/sp_core.py) is the semantic oracle; this C++
// core implements the identical algorithms — unigram Viterbi over a
// prefix trie and greedy best-score BPE merging — for production-rate
// encoding (the Python Viterbi is the serving-side bottleneck for long
// prompts).  Exposed through a minimal C ABI consumed via ctypes
// (chatglm_q_tpu/tokenizer/native.py); no pybind11 dependency.
//
// Model data is passed in pre-parsed (pieces + scores + types) — protobuf
// parsing stays in Python (cold path).

#include <array>
#include <cstdint>
#include <cstring>
#include <functional>
#include <limits>
#include <memory>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int kPieceNormal = 1;
constexpr int kPieceUnknown = 2;
constexpr int kPieceControl = 3;
constexpr int kPieceUserDefined = 4;
constexpr int kPieceUnused = 5;
constexpr int kPieceByte = 6;

constexpr double kUnkPenalty = 10.0;

struct TrieNode {
  // UTF-8 byte-wise trie; piece id at terminal (or -1)
  int32_t piece_id = -1;
  std::unordered_map<uint8_t, std::unique_ptr<TrieNode>> next;
};

struct Model {
  std::vector<std::string> pieces;
  std::vector<float> scores;
  std::vector<int32_t> types;
  std::unordered_map<std::string, int32_t> piece_to_id;
  // pieces raw text may match (BPE merges): NORMAL/USER_DEFINED/UNUSED —
  // never CONTROL/BYTE/UNKNOWN (text must not inject reserved ids)
  std::unordered_map<std::string, int32_t> merge_id;
  int32_t byte_ids[256];
  bool byte_fallback = false;
  int32_t unk_id = 0;
  int model_type = 1;  // 1=unigram, 2=bpe
  TrieNode trie;
  float min_score = 0.f;

  void build() {
    for (auto& b : byte_ids) b = -1;
    min_score = std::numeric_limits<float>::max();
    for (size_t i = 0; i < pieces.size(); i++) {
      piece_to_id.emplace(pieces[i], (int32_t)i);
      if (types[i] == kPieceByte && pieces[i].size() == 6) {
        // "<0xAB>"
        int v = std::stoi(pieces[i].substr(3, 2), nullptr, 16);
        byte_ids[v] = (int32_t)i;
        byte_fallback = true;
      }
      if (types[i] == kPieceNormal || types[i] == kPieceUserDefined ||
          types[i] == kPieceUnused) {
        merge_id.emplace(pieces[i], (int32_t)i);
      }
      if (types[i] == kPieceNormal || types[i] == kPieceUserDefined) {
        if (scores[i] < min_score) min_score = scores[i];
        TrieNode* node = &trie;
        for (unsigned char c : pieces[i]) {
          auto& slot = node->next[c];
          if (!slot) slot = std::make_unique<TrieNode>();
          node = slot.get();
        }
        node->piece_id = (int32_t)i;
      }
    }
    if (min_score == std::numeric_limits<float>::max()) min_score = 0.f;
  }
};

// number of bytes in the UTF-8 character starting at s[i]
inline size_t utf8_len(const std::string& s, size_t i) {
  unsigned char c = s[i];
  size_t n = (c < 0x80) ? 1 : (c < 0xE0) ? 2 : (c < 0xF0) ? 3 : 4;
  if (c >= 0x80 && c < 0xC0) n = 1;  // stray continuation byte
  return std::min(n, s.size() - i);
}

void emit_fallback(const Model& m, const std::string& ch,
                   std::vector<int32_t>* out) {
  if (m.byte_fallback) {
    for (unsigned char b : ch) out->push_back(m.byte_ids[b]);
  } else {
    out->push_back(m.unk_id);
  }
}

// ---------------------------------------------------------------------------
// Unigram: Viterbi over the byte positions (mirrors sp_core._encode_unigram,
// with the lattice advanced per UTF-8 character for the fallback edge)
// ---------------------------------------------------------------------------

void encode_unigram(const Model& m, const std::string& text,
                    std::vector<int32_t>* out) {
  const size_t n = text.size();
  constexpr double kNeg = -1e18;
  std::vector<double> best(n + 1, kNeg);
  // back[i]: (prev_pos, piece_id or -1 for fallback char)
  std::vector<std::pair<int64_t, int64_t>> back(n + 1, {-1, -1});
  std::vector<size_t> char_len(n, 1);
  for (size_t i = 0; i < n;) {
    size_t l = utf8_len(text, i);
    char_len[i] = l;
    i += l;
  }
  best[0] = 0.0;
  const double unk_score = (double)m.min_score - kUnkPenalty;

  for (size_t i = 0; i < n; i++) {
    if (best[i] == kNeg) continue;
    const TrieNode* node = &m.trie;
    bool matched_single = false;
    size_t first_char_end = i + char_len[i];
    for (size_t j = i; j < n;) {
      auto it = node->next.find((uint8_t)text[j]);
      if (it == node->next.end()) break;
      node = it->second.get();
      j++;
      if (node->piece_id >= 0) {
        double sc = best[i] + m.scores[node->piece_id];
        if (sc > best[j]) {
          best[j] = sc;
          back[j] = {(int64_t)i, node->piece_id};
        }
        if (j == first_char_end) matched_single = true;
      }
    }
    if (!matched_single) {
      size_t j = first_char_end;
      double sc = best[i] + unk_score;
      if (sc > best[j]) {
        best[j] = sc;
        back[j] = {(int64_t)i, -1};
      }
    }
  }

  std::vector<int32_t> rev;
  size_t pos = n;
  while (pos > 0) {
    auto [prev, pid] = back[pos];
    if (prev < 0) break;  // should not happen
    if (pid < 0) {
      std::vector<int32_t> fb;
      emit_fallback(m, text.substr(prev, pos - prev), &fb);
      for (auto it = fb.rbegin(); it != fb.rend(); ++it) rev.push_back(*it);
    } else {
      rev.push_back((int32_t)pid);
    }
    pos = (size_t)prev;
  }
  out->assign(rev.rbegin(), rev.rend());
}

// ---------------------------------------------------------------------------
// BPE: greedy highest-score merges (mirrors sp_core._encode_bpe)
// ---------------------------------------------------------------------------

struct MergeCand {
  float score;
  size_t left;      // symbol index
  int32_t piece_id;
  std::string merged;
  bool operator<(const MergeCand& o) const {
    if (score != o.score) return score < o.score;   // max-heap by score
    return left > o.left;                           // leftmost first on tie
  }
};

void encode_bpe(const Model& m, const std::string& text,
                std::vector<int32_t>* out) {
  // initial symbols: utf-8 characters
  std::vector<std::string> syms;
  for (size_t i = 0; i < text.size();) {
    size_t l = utf8_len(text, i);
    syms.push_back(text.substr(i, l));
    i += l;
  }
  const size_t n = syms.size();
  std::vector<size_t> nxt(n), prv(n);
  std::vector<bool> alive(n, true);
  for (size_t i = 0; i < n; i++) {
    nxt[i] = i + 1;
    prv[i] = (i == 0) ? SIZE_MAX : i - 1;
  }

  // merge-history forest (sentencepiece-style UNUSED resegmentation):
  // node_str[t] is the symbol text, kids[t] its two merge constituents
  // (-1,-1 for original-character leaves); tree[i] maps position → node
  std::vector<std::string> node_str(syms.begin(), syms.end());
  std::vector<std::array<int32_t, 2>> kids(n, {-1, -1});
  std::vector<int32_t> tree(n);
  for (size_t i = 0; i < n; i++) tree[i] = (int32_t)i;

  std::priority_queue<MergeCand> heap;
  auto push = [&](size_t i) {
    if (i >= n || nxt[i] >= n) return;
    std::string merged = syms[i] + syms[nxt[i]];
    auto it = m.merge_id.find(merged);
    if (it != m.merge_id.end())
      heap.push({m.scores[it->second], i, it->second, std::move(merged)});
  };
  for (size_t i = 0; i + 1 < n; i++) push(i);

  while (!heap.empty()) {
    MergeCand c = heap.top();
    heap.pop();
    size_t i = c.left;
    if (!alive[i] || nxt[i] >= n || !alive[nxt[i]]) continue;
    if (syms[i] + syms[nxt[i]] != c.merged) continue;  // stale
    size_t j = nxt[i];
    node_str.push_back(c.merged);
    kids.push_back({tree[i], tree[j]});
    tree[i] = (int32_t)(node_str.size() - 1);
    syms[i] = std::move(c.merged);
    alive[j] = false;
    nxt[i] = nxt[j];
    if (nxt[i] < n) prv[nxt[i]] = i;
    push(i);
    if (prv[i] != SIZE_MAX) push(prv[i]);
  }

  // emit: NORMAL/USER_DEFINED piece id; UNUSED resegments into its merge
  // constituents; a leaf with no emittable piece byte/unk-falls back
  std::function<void(int32_t)> emit = [&](int32_t t) {
    const std::string& s = node_str[t];
    auto it = m.merge_id.find(s);
    if (it != m.merge_id.end() && m.types[it->second] != kPieceUnused) {
      out->push_back(it->second);
      return;
    }
    if (kids[t][0] >= 0) {
      emit(kids[t][0]);
      emit(kids[t][1]);
      return;
    }
    emit_fallback(m, s, out);
  };

  for (size_t i = 0; i < n; i = (nxt[i] > i ? nxt[i] : i + 1)) {
    if (alive[i]) emit(tree[i]);
  }
}

}  // namespace

extern "C" {

// Build a model from flat piece data.  Returns an opaque handle.
//   pieces_blob: concatenated utf-8 piece strings
//   piece_lens:  length of each piece
void* sptok_create(const char* pieces_blob, const int32_t* piece_lens,
                   const float* scores, const int32_t* types,
                   int32_t n_pieces, int32_t model_type, int32_t unk_id) {
  auto* m = new Model();
  m->model_type = model_type;
  m->unk_id = unk_id;
  size_t off = 0;
  m->pieces.reserve(n_pieces);
  for (int32_t i = 0; i < n_pieces; i++) {
    m->pieces.emplace_back(pieces_blob + off, (size_t)piece_lens[i]);
    off += piece_lens[i];
  }
  m->scores.assign(scores, scores + n_pieces);
  m->types.assign(types, types + n_pieces);
  m->build();
  return m;
}

void sptok_destroy(void* handle) { delete (Model*)handle; }

// Encode normalized text (caller applies normalization).  Writes up to
// out_cap ids; returns the number of ids produced (or -needed if out_cap is
// too small).
int32_t sptok_encode(void* handle, const char* text, int32_t text_len,
                     int32_t* out_ids, int32_t out_cap) {
  Model* m = (Model*)handle;
  std::string s(text, (size_t)text_len);
  std::vector<int32_t> ids;
  if (m->model_type == 2) {
    encode_bpe(*m, s, &ids);
  } else {
    encode_unigram(*m, s, &ids);
  }
  if ((int32_t)ids.size() > out_cap) return -(int32_t)ids.size();
  std::memcpy(out_ids, ids.data(), ids.size() * sizeof(int32_t));
  return (int32_t)ids.size();
}

}  // extern "C"
