// Test-only shim: compiles the REFERENCE SSW implementation (read-only at
// /root/reference) into an oracle shared object so the from-scratch
// helen_tpu aligner can be validated against the exact binary the reference
// pipeline used. Never shipped; built on demand by tests/test_ssw_oracle.py
// and skipped when the reference checkout is absent.
#include <cstdint>
#include <cstring>
#include <string>

#include "local_reassembly/ssw_cpp.h"

extern "C" {

struct OracleResult {
  int32_t score;
  int32_t ref_begin;
  int32_t ref_end;
  int32_t query_begin;
  int32_t query_end;
  int32_t cigar_len;  // chars written
  int32_t score2;
  int32_t ref_end2;
  int32_t mismatches;
};

int oracle_align(const char* ref, int32_t ref_len, const char* query,
                 int32_t query_len, int32_t match, int32_t mismatch,
                 int32_t gap_open, int32_t gap_extend, int32_t mask_len,
                 OracleResult* out, char* cigar_buf, int32_t cigar_cap) {
  StripedSmithWaterman::Aligner aligner(match, mismatch, gap_open, gap_extend);
  StripedSmithWaterman::Filter filter;
  StripedSmithWaterman::Alignment alignment;
  aligner.SetReferenceSequence(ref, ref_len);
  std::string q(query, query_len);
  if (!aligner.Align_cpp(q.c_str(), filter, &alignment, mask_len)) return 1;
  out->score = alignment.sw_score;
  out->ref_begin = alignment.ref_begin;
  out->ref_end = alignment.ref_end;
  out->query_begin = alignment.query_begin;
  out->query_end = alignment.query_end;
  out->score2 = alignment.sw_score_next_best;
  out->ref_end2 = alignment.ref_end_next_best;
  out->mismatches = alignment.mismatches;
  int32_t n = static_cast<int32_t>(alignment.cigar_string.size());
  if (n >= cigar_cap) return 2;
  std::memcpy(cigar_buf, alignment.cigar_string.c_str(), n + 1);
  out->cigar_len = n;
  return 0;
}

}  // extern "C"
