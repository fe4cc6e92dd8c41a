// helen_stitch: native striped-Smith-Waterman-compatible local aligner.
//
// A from-scratch scalar re-implementation of the alignment semantics the
// reference stitch engine depends on (helen/modules/src/local_reassembly/
// ssw.c, ssw_cpp.cpp — the Zhao et al. SSW library):
//
//  * affine-gap local alignment, H clamped at 0; a length-L gap costs
//    gap_open + (L-1) * gap_extend;
//  * default ACGTN matrix: +match on the 4x4 diagonal, -mismatch elsewhere
//    INCLUDING the N row/column (ssw_cpp.cpp BuildSwScoreMatrix);
//  * best end: scan ref columns left->right, global best updates only on a
//    strictly greater column max (earliest column wins ties); within the best
//    column the smallest read index achieving the max wins (ssw.c
//    sw_sse2_word epilogue);
//  * begin: re-scan with the reversed query prefix against ref columns
//    end->0, terminating at the first column whose max equals the best score
//    (ssw.c ssw_align:858-871);
//  * cigar: banded affine DP over the [begin..end] subrectangle with the
//    reference's exact direction tie-breaks (diagonal wins ties into H; gap
//    extension wins ties into E/F; E beats F only strictly) and the same
//    traceback epilogue that forces the first read base to M
//    (ssw.c banded_sw:571-757).
//
// One deliberate difference, documented: the reference's striped kernel
// updates E from an H value that may include a *partial* lazy-F
// contribution; we use the pre-F H everywhere, i.e. the revised "no
// insertion immediately followed by deletion" semantics the lazy-F comment
// describes. This can only matter for exotic equal-score paths.
//
// Two scan kernels share those semantics bit-for-bit: a scalar reference
// kernel and a striped SSE2 16-bit kernel (Farrar vectorization, like the
// reference's own ssw.c). The SIMD kernel is used when gap_open >
// gap_extend (the lazy-F early break is only exact in that regime) and the
// score fits 16-bit headroom; HELEN_SSW_SCALAR=1 or helen_ssw_set_scalar(1)
// forces the scalar path (used by the equivalence fuzz in tests).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this toolchain).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

#if defined(__SSE2__) || defined(_M_X64)
#define HELEN_SSW_SSE2 1
#include <emmintrin.h>
#endif

namespace {

constexpr int kAlpha = 5;  // A C G T N

const int8_t kBaseTranslation[128] = {
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    //   A     C            G
    4, 0, 4, 1, 4, 4, 4, 2, 4, 4, 4, 4, 4, 4, 4, 4,
    //             T  U(sic: ref maps U->A)
    4, 4, 4, 4, 3, 0, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 0, 4, 1, 4, 4, 4, 2, 4, 4, 4, 4, 4, 4, 4, 4,
    4, 4, 4, 4, 3, 0, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4};

void build_matrix(int32_t match, int32_t mismatch, int32_t* mat) {
  for (int i = 0; i < kAlpha; ++i)
    for (int j = 0; j < kAlpha; ++j)
      mat[i * kAlpha + j] = (i == j && i < 4) ? match : -mismatch;
}

void translate(const char* seq, int32_t len, int8_t* out) {
  for (int32_t i = 0; i < len; ++i)
    out[i] = kBaseTranslation[static_cast<uint8_t>(seq[i]) & 0x7f];
}

struct End {
  int32_t score = 0;
  int32_t ref = 0;
  int32_t read = 0;
};

// Scalar column scan: fills max_column[] and best (score, end column, end
// read index). terminate==0 means "never terminate early".
void scan_core_scalar(const int8_t* ref, int ref_dir, int32_t ref_len,
                      const int8_t* read, int32_t read_len, const int32_t* mat,
                      int32_t gap_open, int32_t gap_extend, int32_t terminate,
                      int32_t* max_column, End* best) {
  std::vector<int32_t> E(read_len, 0), Hprev(read_len, 0), Hcur(read_len, 0),
      Hmax(read_len, 0);
  int32_t max = 0, end_ref = 0;
  int32_t begin = 0, end = ref_len, step = 1;
  if (ref_dir == 1) {
    begin = ref_len - 1;
    end = -1;
    step = -1;
  }
  for (int32_t i = begin; i != end; i += step) {
    const int32_t* prof = mat + ref[i] * kAlpha;
    int32_t f = 0, h_diag = 0, colmax = 0;
    for (int32_t j = 0; j < read_len; ++j) {
      int32_t h = h_diag + prof[read[j]];
      h_diag = Hprev[j];
      if (E[j] > h) h = E[j];
      int32_t h_no_f = h > 0 ? h : 0;  // pre-F value feeds E (see header)
      if (f > h) h = f;
      if (h < 0) h = 0;
      Hcur[j] = h;
      if (h > colmax) colmax = h;
      E[j] = std::max({0, h_no_f - gap_open, E[j] - gap_extend});
      f = std::max({0, h - gap_open, f - gap_extend});
    }
    max_column[i] = colmax;
    if (colmax > max) {
      max = colmax;
      end_ref = i;
      Hmax = Hcur;
    }
    std::swap(Hprev, Hcur);
    if (terminate > 0 && max_column[i] == terminate) break;
  }
  best->score = max;
  best->ref = end_ref;
  best->read = read_len - 1;
  for (int32_t j = 0; j < read_len; ++j) {
    if (Hmax[j] == max) {
      best->read = j;
      break;
    }
  }
}

#ifdef HELEN_SSW_SSE2
// Striped (Farrar) SSE2 16-bit column scan — the same vectorization the
// reference's ssw.c word kernel uses (8 lanes, lazy-F correction), but
// reproducing THIS implementation's scalar semantics exactly (E fed from the
// pre-F H, see file header). Padding lanes (read index >= read_len) carry a
// -30000 profile so their H can never exceed a real cell's column max:
// max_column[], best end and end-read index are bit-identical to
// scan_core_scalar (fuzz-verified in tests/test_ssw_oracle.py).
int32_t hmax_epi16(__m128i v) {
  v = _mm_max_epi16(v, _mm_srli_si128(v, 8));
  v = _mm_max_epi16(v, _mm_srli_si128(v, 4));
  v = _mm_max_epi16(v, _mm_srli_si128(v, 2));
  return static_cast<int16_t>(_mm_extract_epi16(v, 0));
}

void scan_core_striped(const int8_t* ref, int ref_dir, int32_t ref_len,
                       const int8_t* read, int32_t read_len, const int32_t* mat,
                       int32_t gap_open, int32_t gap_extend, int32_t terminate,
                       int32_t* max_column, End* best) {
  const int32_t seg = (read_len + 7) / 8;
  // striped query profile: element (lane l, stripe k) covers read j = l*seg+k
  std::vector<__m128i> prof(kAlpha * seg);
  {
    int16_t* t = reinterpret_cast<int16_t*>(prof.data());
    for (int32_t r = 0; r < kAlpha; ++r)
      for (int32_t k = 0; k < seg; ++k)
        for (int32_t l = 0; l < 8; ++l) {
          int32_t j = l * seg + k;
          *t++ = (j < read_len)
                     ? static_cast<int16_t>(mat[r * kAlpha + read[j]])
                     : static_cast<int16_t>(-30000);
        }
  }
  std::vector<__m128i> pvHStore(seg, _mm_setzero_si128());
  std::vector<__m128i> pvHLoad(seg, _mm_setzero_si128());
  std::vector<__m128i> pvE(seg, _mm_setzero_si128());
  std::vector<__m128i> pvHmax(seg, _mm_setzero_si128());
  const __m128i vGapO = _mm_set1_epi16(static_cast<int16_t>(gap_open));
  const __m128i vGapE = _mm_set1_epi16(static_cast<int16_t>(gap_extend));
  const __m128i vZero = _mm_setzero_si128();

  int32_t max = 0, end_ref = 0;
  int32_t begin = 0, end = ref_len, step = 1;
  if (ref_dir == 1) {
    begin = ref_len - 1;
    end = -1;
    step = -1;
  }
  for (int32_t i = begin; i != end; i += step) {
    const __m128i* vP = prof.data() + ref[i] * seg;
    __m128i vF = vZero;
    __m128i vMaxColumn = vZero;
    // diagonal for (lane l, k=0) is previous column's (lane l-1, k=seg-1)
    __m128i vH = _mm_slli_si128(pvHStore[seg - 1], 2);
    pvHLoad.swap(pvHStore);
    for (int32_t k = 0; k < seg; ++k) {
      vH = _mm_adds_epi16(vH, vP[k]);
      __m128i vE = pvE[k];
      vH = _mm_max_epi16(vH, vE);
      vH = _mm_max_epi16(vH, vZero);  // h_no_f: E merged, F not
      // E update reads the pre-F H (scalar h_no_f semantics)
      vE = _mm_max_epi16(_mm_subs_epi16(vE, vGapE), _mm_subs_epi16(vH, vGapO));
      pvE[k] = _mm_max_epi16(vE, vZero);
      // merge the within-lane F, store H
      vH = _mm_max_epi16(vH, vF);
      pvHStore[k] = vH;
      vMaxColumn = _mm_max_epi16(vMaxColumn, vH);
      // F update reads the post-F H (scalar f semantics)
      vF = _mm_max_epi16(_mm_subs_epi16(vF, vGapE), _mm_subs_epi16(vH, vGapO));
      vF = _mm_max_epi16(vF, vZero);
      vH = pvHLoad[k];
    }
    // lazy-F: propagate F across lane boundaries until it can no longer
    // raise any H (ssw.c sw_sse2_word structure; E is deliberately not
    // re-read — it never sees F in the scalar recurrence either)
    bool done = false;
    for (int32_t l = 0; l < 8 && !done; ++l) {
      vF = _mm_slli_si128(vF, 2);
      for (int32_t k = 0; k < seg; ++k) {
        __m128i vHs = _mm_max_epi16(pvHStore[k], vF);
        pvHStore[k] = vHs;
        vMaxColumn = _mm_max_epi16(vMaxColumn, vHs);
        vF = _mm_subs_epi16(vF, vGapE);
        if (!_mm_movemask_epi8(
                _mm_cmpgt_epi16(vF, _mm_subs_epi16(vHs, vGapO)))) {
          done = true;
          break;
        }
      }
    }
    const int32_t colmax = std::max(0, hmax_epi16(vMaxColumn));
    max_column[i] = colmax;
    if (colmax > max) {
      max = colmax;
      end_ref = i;
      pvHmax = pvHStore;
    }
    if (terminate > 0 && colmax == terminate) break;
  }
  best->score = max;
  best->ref = end_ref;
  best->read = read_len - 1;
  const int16_t* hmax = reinterpret_cast<const int16_t*>(pvHmax.data());
  for (int32_t j = 0; j < read_len; ++j) {
    if (hmax[(j % seg) * 8 + j / seg] == max) {
      best->read = j;
      break;
    }
  }
}
#endif  // HELEN_SSW_SSE2

// -1: consult HELEN_SSW_SCALAR env once; 0/1: forced via helen_ssw_set_scalar
int g_force_scalar = -1;

bool use_scalar_kernel(int32_t ref_len, int32_t read_len, int32_t match,
                       int32_t gap_open, int32_t gap_extend) {
#ifndef HELEN_SSW_SSE2
  return true;
#else
  if (g_force_scalar == -1) {
    const char* env = std::getenv("HELEN_SSW_SCALAR");
    g_force_scalar = (env && env[0] && env[0] != '0') ? 1 : 0;
  }
  if (g_force_scalar) return true;
  // The lazy-F early break (stop once F <= H - gap_open everywhere) is exact
  // only when extension strictly dominates reopening from a just-raised H,
  // i.e. gap_open > gap_extend (fuzz-derived counterexamples exist at
  // go == ge). Stitch uses 8/2; exotic penalty sets take the scalar kernel.
  if (gap_open <= gap_extend) return true;
  // 16-bit headroom: the best local score is bounded by match * min(lens)
  const int64_t cap =
      static_cast<int64_t>(std::min(ref_len, read_len)) * std::max(match, 1);
  return cap > 30000;
#endif
}

void scan_ends(const int8_t* ref, int ref_dir, int32_t ref_len,
               const int8_t* read, int32_t read_len, const int32_t* mat,
               int32_t gap_open, int32_t gap_extend, int32_t terminate,
               int32_t mask_len, End* best, End* second) {
  std::vector<int32_t> max_column(ref_len, 0);
  const int32_t match = mat[0];  // diagonal entry (build_matrix)
  if (use_scalar_kernel(ref_len, read_len, match, gap_open, gap_extend)) {
    scan_core_scalar(ref, ref_dir, ref_len, read, read_len, mat, gap_open,
                     gap_extend, terminate, max_column.data(), best);
  } else {
#ifdef HELEN_SSW_SSE2
    scan_core_striped(ref, ref_dir, ref_len, read, read_len, mat, gap_open,
                      gap_extend, terminate, max_column.data(), best);
#endif
  }
  const int32_t max = best->score;
  const int32_t end_ref = best->ref;
  second->score = 0;
  second->ref = 0;
  second->read = 0;
  // Reference ssw_align reports (score2=0, ref_end2=-1) whenever
  // maskLen < 15 (ssw.c:848-854), so the scan only matters above that.
  if (mask_len >= 15) {
    int32_t lo = std::max(0, end_ref - mask_len);
    int32_t hi = std::min(ref_len, end_ref + mask_len);
    // The reference byte kernel scans from edge+1 (ssw.c:357) but the word
    // kernel — which ssw_align switches to when the byte score saturates at
    // 255 (ssw.c:828-831) — includes the edge column (ssw.c:559). Replicate
    // the kernel the reference would have used for this score.
    int32_t start = (max >= 255) ? hi : hi + 1;
    for (int32_t i = 0; i < lo; ++i)
      if (max_column[i] > second->score) {
        second->score = max_column[i];
        second->ref = i;
      }
    for (int32_t i = start; i < ref_len; ++i)
      if (max_column[i] > second->score) {
        second->score = max_column[i];
        second->ref = i;
      }
  }
}

inline uint32_t cigar_int(uint32_t len, char op) {
  uint32_t code;
  switch (op) {
    case 'M': code = 0; break;
    case 'I': code = 1; break;
    case 'D': code = 2; break;
    case 'S': code = 4; break;
    default: code = 0;
  }
  return (len << 4) | code;
}

// Banded affine DP + traceback over the [0..ref_len) x [0..read_len)
// subrectangle, reproducing the reference's direction codes and tie-breaks
// (ssw.c banded_sw). Returns cigar ops (M/I/D) in forward order, or empty on
// inconsistency.
std::vector<uint32_t> banded_cigar(const int8_t* ref, const int8_t* read,
                                   int32_t ref_len, int32_t read_len,
                                   int32_t score, int32_t gap_open,
                                   int32_t gap_extend, int32_t band_width,
                                   const int32_t* mat) {
  std::vector<uint32_t> ops;
  std::vector<int32_t> h_b, e_b, h_c;
  std::vector<int8_t> direction;
  int32_t width = 0, width_d = 0, max = 0;
  auto set_u = [&](int32_t i, int32_t j) {
    int32_t x = i - band_width;
    x = x > 0 ? x : 0;
    return j - x + 1;
  };
  auto set_d = [&](int32_t i, int32_t j, int32_t p) {
    int32_t x = i - band_width;
    x = x > 0 ? x : 0;
    return (j - x) * 3 + p;
  };
  do {
    max = 0;
    width = band_width * 2 + 3;
    width_d = band_width * 2 + 1;
    h_b.assign(width, 0);
    e_b.assign(width, 0);
    h_c.assign(width, 0);
    direction.assign(static_cast<size_t>(width_d) * read_len * 3, 0);
    int32_t u = 0;
    for (int32_t i = 0; i < read_len; ++i) {
      int32_t beg = std::max(0, i - band_width);
      int32_t end = std::min(ref_len - 1, i + band_width);
      int32_t edge = std::min(end + 1, width - 1);
      int32_t f = 0;
      h_b[0] = e_b[0] = h_b[edge] = e_b[edge] = h_c[0] = 0;
      f = 0;
      int8_t* dline = direction.data() + static_cast<size_t>(width_d) * i * 3;
      for (int32_t j = beg; j <= end; ++j) {
        u = set_u(i, j);
        int32_t e_idx = set_u(i - 1, j);
        int32_t b_idx = set_u(i, j - 1);
        int32_t d_idx = set_u(i - 1, j - 1);
        int32_t de = set_d(i, j, 0), df = set_d(i, j, 1), dh = set_d(i, j, 2);

        int32_t t1 = (i == 0) ? -gap_open : h_b[e_idx] - gap_open;
        int32_t t2 = (i == 0) ? -gap_extend : e_b[e_idx] - gap_extend;
        e_b[u] = std::max(t1, t2);
        dline[de] = t1 > t2 ? 3 : 2;

        t1 = h_c[b_idx] - gap_open;
        t2 = f - gap_extend;
        f = std::max(t1, t2);
        dline[df] = t1 > t2 ? 5 : 4;

        int32_t e1 = std::max(e_b[u], 0);
        int32_t f1 = std::max(f, 0);
        t1 = std::max(e1, f1);
        t2 = h_b[d_idx] + mat[ref[j] * kAlpha + read[i]];
        h_c[u] = std::max(t1, t2);
        if (h_c[u] > max) max = h_c[u];
        if (t1 <= t2)
          dline[dh] = 1;
        else
          dline[dh] = e1 > f1 ? dline[de] : dline[df];
      }
      for (int32_t j = 1; j <= u; ++j) h_b[j] = h_c[j];
    }
    band_width *= 2;
  } while (max < score);
  band_width /= 2;

  // traceback (reverse order; ops reversed at the end)
  std::vector<uint32_t> rev;
  int32_t i = read_len - 1, j = ref_len - 1, run = 0, state = 2;
  char op = 'M', prev_op = 'M';
  const int8_t* dline =
      direction.data() + static_cast<size_t>(width_d) * i * 3;
  while (i > 0) {
    // guard: j must lie inside row i's band or the direction index walks
    // out of the row (even negative for long D runs) and reads garbage —
    // reachable when the band-doubling stop condition (max >= score) was
    // satisfied by a tie elsewhere in the band while the corner cell's
    // own path needs a wider band. Bail to the caller's no-cigar fallback.
    if (j < std::max(0, i - band_width) ||
        j > std::min(ref_len - 1, i + band_width)) {
      return {};
    }
    int32_t idx = set_d(i, j, state);
    switch (dline[idx]) {
      case 1:
        --i; --j; state = 2; dline -= width_d * 3; op = 'M'; break;
      case 2:
        --i; state = 0; dline -= width_d * 3; op = 'I'; break;
      case 3:
        --i; state = 2; dline -= width_d * 3; op = 'I'; break;
      case 4:
        --j; state = 1; op = 'D'; break;
      case 5:
        --j; state = 2; op = 'D'; break;
      default:
        return {};  // traceback inconsistency
    }
    if (op == prev_op) {
      ++run;
    } else {
      rev.push_back(cigar_int(run, prev_op));
      prev_op = op;
      run = 1;
    }
  }
  if (op == 'M') {
    rev.push_back(cigar_int(run + 1, op));
  } else {
    rev.push_back(cigar_int(run, op));
    rev.push_back(cigar_int(1, 'M'));
  }
  ops.assign(rev.rbegin(), rev.rend());
  return ops;
}

}  // namespace

extern "C" {

// Test hook: force the scalar scan kernel (1), force SIMD-eligible (0), or
// reset to the HELEN_SSW_SCALAR env default (-1).
void helen_ssw_set_scalar(int v) { g_force_scalar = v; }

struct HelenAlignment {
  int32_t score;
  int32_t score2;
  int32_t ref_begin;
  int32_t ref_end;
  int32_t query_begin;
  int32_t query_end;
  int32_t ref_end2;
  int32_t cigar_len;  // ops written to cigar_buf; -1 if buffer too small
};

// Local-align query against ref. cigar_buf receives BAM-coded ops (M/I/D
// only, the aligned core); the caller adds soft clips from query_begin /
// query_end. Returns 0 on success.
int helen_ssw_align(const char* ref, int32_t ref_len, const char* query,
                    int32_t query_len, int32_t match, int32_t mismatch,
                    int32_t gap_open, int32_t gap_extend, int32_t mask_len,
                    int32_t report_cigar, HelenAlignment* out,
                    uint32_t* cigar_buf, int32_t cigar_cap) {
  std::memset(out, 0, sizeof(*out));
  out->ref_begin = -1;
  out->query_begin = -1;
  if (ref_len <= 0 || query_len <= 0) return 1;

  int32_t mat[kAlpha * kAlpha];
  build_matrix(match, mismatch, mat);
  std::vector<int8_t> ref_t(ref_len), query_t(query_len);
  translate(ref, ref_len, ref_t.data());
  translate(query, query_len, query_t.data());

  End best, second;
  scan_ends(ref_t.data(), 0, ref_len, query_t.data(), query_len, mat,
            gap_open, gap_extend, /*terminate=*/0, mask_len, &best, &second);
  out->score = best.score;
  out->score2 = second.score;
  out->ref_end = best.ref;
  out->query_end = best.read;
  out->ref_end2 = mask_len >= 15 ? second.ref : -1;
  if (best.score == 0) return 0;  // no alignment; begin/cigar meaningless

  // reverse pass for begin positions (ssw.c ssw_align:858-871)
  std::vector<int8_t> query_rev(best.read + 1);
  for (int32_t k = 0; k <= best.read; ++k)
    query_rev[k] = query_t[best.read - k];
  End rbest, rsecond;
  scan_ends(ref_t.data(), 1, best.ref + 1, query_rev.data(), best.read + 1,
            mat, gap_open, gap_extend, /*terminate=*/best.score, mask_len,
            &rbest, &rsecond);
  out->ref_begin = rbest.ref;
  out->query_begin = best.read - rbest.read;

  if (!report_cigar) return 0;
  int32_t sub_ref = out->ref_end - out->ref_begin + 1;
  int32_t sub_read = out->query_end - out->query_begin + 1;
  int32_t band = std::abs(sub_ref - sub_read) + 1;
  std::vector<uint32_t> ops = banded_cigar(
      ref_t.data() + out->ref_begin, query_t.data() + out->query_begin,
      sub_ref, sub_read, best.score, gap_open, gap_extend, band, mat);
  if (static_cast<int32_t>(ops.size()) > cigar_cap) {
    out->cigar_len = -1;
    return 2;
  }
  std::copy(ops.begin(), ops.end(), cigar_buf);
  out->cigar_len = static_cast<int32_t>(ops.size());
  return 0;
}

// Expand (base, rle) label arrays into sequence bytes using the decode map
// {0:'',1:'A',2:'C',3:'G',4:'T'} x run-length (reference Options.py:3,
// Stitch.py:244-245). Returns bytes written. The stitch hot loop calls this
// instead of building Python strings per position.
int32_t helen_rle_expand(const uint8_t* bases, const uint8_t* rles,
                         int32_t n, char* out, int32_t cap) {
  static const char kDecode[5] = {'\0', 'A', 'C', 'G', 'T'};
  int32_t w = 0;
  for (int32_t i = 0; i < n; ++i) {
    uint8_t b = bases[i];
    uint8_t r = rles[i];
    if (b == 0 || b > 4 || r == 0) continue;
    if (w + r > cap) return -1;
    char c = kDecode[b];
    for (uint8_t k = 0; k < r; ++k) out[w++] = c;
  }
  return w;
}

// Banded Ukkonen edit distance (unit costs) for polishing assessment:
// polished-vs-truth sequences are near-identical, so a diagonal band of
// half-width `band` suffices; returns the edit distance, or -1 when the
// true distance exceeds the band (caller doubles the band and retries).
// Two rolling rows of 2*band+1 cells -> O(max(la,lb) * band) time,
// O(band) memory; int64 throughout (genome-scale lengths).
int64_t helen_banded_edit_distance(const char* a, int64_t la, const char* b,
                                   int64_t lb, int64_t band) {
  if (band < 1) band = 1;
  if (la > lb) {  // ensure la <= lb so the band covers the length gap
    const char* t = a; a = b; b = t;
    int64_t tl = la; la = lb; lb = tl;
  }
  if (lb - la > band) return -1;
  const int64_t w = 2 * band + 1;
  const int64_t INF = INT64_MAX / 4;
  std::vector<int64_t> prev(w, INF), cur(w, INF);
  // row i covers columns j in [i-band, i+band]; cell k = j - (i-band)
  for (int64_t k = 0; k <= band && k < w; ++k) prev[band + k] = k;  // row 0: d(0,j)=j
  for (int64_t i = 1; i <= la; ++i) {
    const int64_t jlo = i - band, jhi = i + band < lb ? i + band : lb;
    std::fill(cur.begin(), cur.end(), INF);
    int64_t row_min = INF;
    for (int64_t j = jlo < 0 ? 0 : jlo; j <= jhi; ++j) {
      const int64_t k = j - jlo;  // 0..w-1
      int64_t best = INF;
      if (j == 0) {
        best = i;  // d(i,0) = i
      } else {
        // prev row's offset is (i-1)-band, one left of this row's:
        // d(i-1, j-1) -> prev[k], d(i-1, j) -> prev[k+1], d(i, j-1) -> cur[k-1]
        const int64_t sub = (k < w ? prev[k] : INF);
        const int64_t del = (k + 1 < w ? prev[k + 1] : INF);
        const int64_t ins = (k >= 1 ? cur[k - 1] : INF);
        const int64_t m = sub + (a[i - 1] == b[j - 1] ? 0 : 1);
        best = m;
        if (del + 1 < best) best = del + 1;
        if (ins + 1 < best) best = ins + 1;
      }
      cur[k] = best;
      if (best < row_min) row_min = best;
    }
    // early-out: DP values never decrease along any path, so once every
    // in-band cell exceeds `band` the answer cannot come back under it —
    // without this, a genuinely divergent pair costs the FULL O(len*band)
    // at every band doubling before the caller learns -1
    if (row_min > band) return -1;
    prev.swap(cur);
  }
  const int64_t k = lb - (la - band);
  const int64_t d = (k >= 0 && k < w) ? prev[k] : INF;
  if (d >= INF || d > band) return -1;  // distance not provably within band
  return d;
}

}  // extern "C"
