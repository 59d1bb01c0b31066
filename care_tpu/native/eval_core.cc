// Native evaluation core: the O(n*m) inner loops of caption scoring.
//
// The reference's only native evaluation code is pycocoevalcap's Java METEOR
// jar + Java PTBTokenizer (reference misc/cocoeval.py:4-9). This module is
// the C++ equivalent for our stack: batched longest-common-subsequence
// (ROUGE-L) and greedy METEOR-style unigram alignment, the two quadratic
// host-side loops that dominate corpus scoring. Exposed through a plain C
// ABI consumed via ctypes (care_tpu/native/__init__.py); the pure-python
// implementations remain as fallback.
//
// Build: make -C care_tpu/native  (produces libcare_eval.so)

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

extern "C" {

// Longest common subsequence length of two int32 token-id sequences.
int32_t lcs_len(const int32_t* a, int32_t na, const int32_t* b, int32_t nb) {
  if (na <= 0 || nb <= 0) return 0;
  std::vector<int32_t> prev(nb + 1, 0), cur(nb + 1, 0);
  for (int32_t i = 1; i <= na; ++i) {
    const int32_t ai = a[i - 1];
    for (int32_t j = 1; j <= nb; ++j) {
      cur[j] = (ai == b[j - 1]) ? prev[j - 1] + 1
                                : std::max(cur[j - 1], prev[j]);
    }
    std::swap(prev, cur);
  }
  return prev[nb];
}

// Batched LCS: for one hypothesis vs n_refs references (flattened with
// per-ref lengths), writes per-ref LCS lengths into `out`.
void lcs_len_multi(const int32_t* hyp, int32_t n_hyp,
                   const int32_t* refs_flat, const int32_t* ref_lens,
                   int32_t n_refs, int32_t* out) {
  int32_t offset = 0;
  for (int32_t r = 0; r < n_refs; ++r) {
    out[r] = lcs_len(hyp, n_hyp, refs_flat + offset, ref_lens[r]);
    offset += ref_lens[r];
  }
}

// Greedy stage-wise METEOR alignment over two id views of the same token
// sequences (view 0 = exact ids, view 1 = stem ids). Returns the number of
// matches; writes (hyp_idx, ref_idx) pairs into match_out (size >= 2*n_hyp)
// and returns the chunk count through *chunks_out.
int32_t meteor_align(const int32_t* hyp_exact, const int32_t* hyp_stem,
                     int32_t n_hyp,
                     const int32_t* ref_exact, const int32_t* ref_stem,
                     int32_t n_ref,
                     int32_t* match_out, int32_t* chunks_out) {
  std::vector<char> used_h(n_hyp, 0), used_r(n_ref, 0);
  std::vector<std::pair<int32_t, int32_t>> matches;
  matches.reserve(n_hyp);

  const int32_t* hv[2] = {hyp_exact, hyp_stem};
  const int32_t* rv[2] = {ref_exact, ref_stem};
  for (int stage = 0; stage < 2; ++stage) {
    const int32_t* h = hv[stage];
    const int32_t* r = rv[stage];
    if (h == nullptr || r == nullptr) continue;
    for (int32_t i = 0; i < n_hyp; ++i) {
      if (used_h[i]) continue;
      for (int32_t j = 0; j < n_ref; ++j) {
        if (used_r[j]) continue;
        if (h[i] == r[j]) {
          matches.emplace_back(i, j);
          used_h[i] = 1;
          used_r[j] = 1;
          break;
        }
      }
    }
  }

  std::sort(matches.begin(), matches.end());
  int32_t chunks = matches.empty() ? 0 : 1;
  for (size_t k = 1; k < matches.size(); ++k) {
    if (!(matches[k].first == matches[k - 1].first + 1 &&
          matches[k].second == matches[k - 1].second + 1)) {
      ++chunks;
    }
  }
  for (size_t k = 0; k < matches.size(); ++k) {
    match_out[2 * k] = matches[k].first;
    match_out[2 * k + 1] = matches[k].second;
  }
  *chunks_out = chunks;
  return static_cast<int32_t>(matches.size());
}

}  // extern "C"
