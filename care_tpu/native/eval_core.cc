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

#include <array>
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

// Stage-wise METEOR-1.5-style alignment over two id views of the same
// token sequences (stage 0 = exact ids, stage 1 = stem ids); semantics
// identical to the python `_align` in care_tpu/metrics/meteor.py: one-to-one
// matches per stage in hyp order, ties preferring the ref position that
// continues the previous chunk. Writes (hyp_idx, ref_idx, stage) triples
// into match_out (size >= 3*n_hyp) and returns the number of matches.
int32_t meteor_align(const int32_t* hyp_exact, const int32_t* hyp_stem,
                     int32_t n_hyp,
                     const int32_t* ref_exact, const int32_t* ref_stem,
                     int32_t n_ref,
                     int32_t* match_out) {
  std::vector<char> used_h(n_hyp, 0), used_r(n_ref, 0);
  std::vector<std::array<int32_t, 3>> matches;
  matches.reserve(n_hyp);

  const int32_t* hv[2] = {hyp_exact, hyp_stem};
  const int32_t* rv[2] = {ref_exact, ref_stem};
  for (int32_t stage = 0; stage < 2; ++stage) {
    const int32_t* h = hv[stage];
    const int32_t* r = rv[stage];
    if (h == nullptr || r == nullptr) continue;
    std::vector<int32_t> prev_r(n_hyp + 1, -1);  // prev_r[i+1] set on match
    for (int32_t i = 0; i < n_hyp; ++i) {
      if (used_h[i]) continue;
      int32_t chosen = -1, first = -1;
      const int32_t want = (i > 0) ? prev_r[i] : -1;
      for (int32_t j = 0; j < n_ref; ++j) {
        if (used_r[j] || h[i] != r[j]) continue;
        if (first < 0) first = j;
        if (j == want) { chosen = j; break; }
      }
      if (first < 0) continue;
      if (chosen < 0) chosen = first;
      matches.push_back({i, chosen, stage});
      used_h[i] = 1;
      used_r[chosen] = 1;
      prev_r[i + 1] = chosen + 1;
    }
  }

  for (size_t k = 0; k < matches.size(); ++k) {
    match_out[3 * k] = matches[k][0];
    match_out[3 * k + 1] = matches[k][1];
    match_out[3 * k + 2] = matches[k][2];
  }
  return static_cast<int32_t>(matches.size());
}

}  // extern "C"
