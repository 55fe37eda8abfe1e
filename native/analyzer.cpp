// Native host analyzer: tokenize + FNV-1a64 hash, batch API.
//
// Implements exactly the AnalyzerConfig-default contract of
// document_search_engine_tpu/analyze (tokenizer.py / hashing.py):
// lowercase, tokens = maximal runs of [0-9a-z] after ASCII lowering,
// length-filtered, 64-bit FNV-1a over the token bytes. Only ASCII input
// is handled here — the Python wrapper routes non-ASCII docs to the
// reference Python path, so results are bit-identical overall (tested in
// tests/test_native_analyzer.py).
//
// Build: make -C native   (g++ -O3 -shared; zero dependencies)

#include <algorithm>
#include <cstdint>
#include <cstddef>
#include <vector>

namespace {

constexpr uint64_t kFnvOffset = 14695981039346656037ULL;
constexpr uint64_t kFnvPrime = 1099511628211ULL;

inline bool is_alnum_lower(unsigned char c, unsigned char &lowered) {
  if (c >= '0' && c <= '9') { lowered = c; return true; }
  if (c >= 'a' && c <= 'z') { lowered = c; return true; }
  if (c >= 'A' && c <= 'Z') { lowered = static_cast<unsigned char>(c + 32); return true; }
  return false;
}

}  // namespace

extern "C" {

// Pass 1: count tokens per doc (fills dl[n_docs]); returns total tokens.
// buf: concatenated UTF-8/ASCII text; offs: n_docs+1 byte offsets.
int64_t dse_count_tokens(const char *buf, const int64_t *offs,
                         int32_t n_docs, int32_t min_len, int32_t max_len,
                         int64_t *dl) {
  int64_t total = 0;
  for (int32_t d = 0; d < n_docs; ++d) {
    const char *p = buf + offs[d];
    const char *end = buf + offs[d + 1];
    int64_t count = 0;
    int64_t run = 0;
    unsigned char lowered;
    for (; p < end; ++p) {
      if (is_alnum_lower(static_cast<unsigned char>(*p), lowered)) {
        ++run;
      } else if (run) {
        if (run >= min_len && run <= max_len) ++count;
        run = 0;
      }
    }
    if (run && run >= min_len && run <= max_len) ++count;
    dl[d] = count;
    total += count;
  }
  return total;
}

// Pass 2: emit (hash, doc) per token, in document order.
// out_hash/out_doc must hold the total from pass 1.
void dse_hash_tokens(const char *buf, const int64_t *offs, int32_t n_docs,
                     int32_t min_len, int32_t max_len, uint64_t *out_hash,
                     int32_t *out_doc) {
  int64_t w = 0;
  for (int32_t d = 0; d < n_docs; ++d) {
    const char *p = buf + offs[d];
    const char *end = buf + offs[d + 1];
    uint64_t h = kFnvOffset;
    int64_t run = 0;
    unsigned char lowered;
    for (; p < end; ++p) {
      if (is_alnum_lower(static_cast<unsigned char>(*p), lowered)) {
        h = (h ^ lowered) * kFnvPrime;
        ++run;
      } else if (run) {
        if (run >= min_len && run <= max_len) {
          out_hash[w] = h;
          out_doc[w] = d;
          ++w;
        }
        h = kFnvOffset;
        run = 0;
      }
    }
    if (run && run >= min_len && run <= max_len) {
      out_hash[w] = h;
      out_doc[w] = d;
      ++w;
    }
  }
}

// Pass 2 (preferred): per doc, emit hash-ascending unique (hash, tf) runs
// — exactly the AnalyzedDocs layout (builder.analyze_texts). out_hash /
// out_tf must hold >= total tokens (pass 1's return); n_terms[d] receives
// the doc's unique-term count. Returns total unique terms written.
int64_t dse_analyze_docs(const char *buf, const int64_t *offs,
                         int32_t n_docs, int32_t min_len, int32_t max_len,
                         uint64_t *out_hash, int32_t *out_tf,
                         int64_t *n_terms, int64_t *dl) {
  std::vector<uint64_t> scratch;
  int64_t w = 0;
  for (int32_t d = 0; d < n_docs; ++d) {
    const char *p = buf + offs[d];
    const char *end = buf + offs[d + 1];
    scratch.clear();
    uint64_t h = kFnvOffset;
    int64_t run = 0;
    unsigned char lowered;
    for (; p < end; ++p) {
      if (is_alnum_lower(static_cast<unsigned char>(*p), lowered)) {
        h = (h ^ lowered) * kFnvPrime;
        ++run;
      } else if (run) {
        if (run >= min_len && run <= max_len) scratch.push_back(h);
        h = kFnvOffset;
        run = 0;
      }
    }
    if (run && run >= min_len && run <= max_len) scratch.push_back(h);
    dl[d] = static_cast<int64_t>(scratch.size());
    std::sort(scratch.begin(), scratch.end());
    int64_t uniq = 0;
    size_t i = 0;
    while (i < scratch.size()) {
      size_t j = i + 1;
      while (j < scratch.size() && scratch[j] == scratch[i]) ++j;
      out_hash[w] = scratch[i];
      out_tf[w] = static_cast<int32_t>(j - i);
      ++w;
      ++uniq;
      i = j;
    }
    n_terms[d] = uniq;
  }
  return w;
}

// np.searchsorted(vocab, needles, side="left"), accelerated by a
// prefix table: prefix_start[p] = first vocab index whose top
// `prefix_bits` hash bits are >= p (built once per stats refresh with
// one numpy searchsorted over the 2^prefix_bits boundaries, plus the
// terminating n_vocab entry). FNV hashes are uniform, so each prefix
// bucket holds ~n_vocab / 2^prefix_bits entries and the binary search
// collapses to a couple of probes — ~10x over numpy's full-range
// search on the query-serving hot path.
void dse_lookup_sorted(const uint64_t *vocab, int64_t n_vocab,
                       const int64_t *prefix_start, int32_t prefix_bits,
                       const uint64_t *needles, int64_t n,
                       int64_t *out_idx) {
  (void)n_vocab;
  const int shift = 64 - prefix_bits;
  for (int64_t i = 0; i < n; ++i) {
    const uint64_t x = needles[i];
    const uint64_t p = x >> shift;
    int64_t lo = prefix_start[p];
    int64_t hi = prefix_start[p + 1];
    while (lo < hi) {
      const int64_t mid = (lo + hi) >> 1;
      if (vocab[mid] < x) lo = mid + 1; else hi = mid;
    }
    out_idx[i] = lo;
  }
}

}  // extern "C"
