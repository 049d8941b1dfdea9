// libms — matching statistics engine for memo_tpu.
//
// Replaces the external MONI dependency of the reference pipeline
// (reference index.sh:69-76: `moni build` + `moni ms`): for each document
// (genome + reverse complements, '$'-terminated records) we need, at every
// pivot position p, the length of the longest prefix of pivot[p:] occurring
// anywhere in the document text.
//
// Design: a generalized suffix automaton built over the REVERSED document
// text. Matching statistics computed by streaming a string through a suffix
// automaton are "longest match ENDING at i"; substring-ness is invariant
// under reversal, so streaming the reversed pivot through the automaton of
// the reversed text and flipping the result yields "longest match STARTING
// at p" — exactly MONI's .lengths semantics. Record terminators ('$', absent
// from the pivot alphabet) prevent matches from spanning records, matching
// the reference's per-record '$' append (index.sh:65).
//
// Complexity: O(|text| * alpha) build, O(|pivot|) amortized per query.
// Memory: ~2 states/char * (8 + 4*alpha) bytes, alpha = the text's exact
// alphabet size (6 for ACGTN$ genomes). This trades memory for
// speed vs MONI's r-index; suitable up to ~hundreds of Mbp of document text
// per build on a large-RAM host. Builds are per-document and embarrassingly
// parallel across documents.
//
// C ABI only (consumed via ctypes from memo_tpu.index.ms) — no pybind11.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <memory>
#include <new>
#include <thread>
#include <vector>

namespace {

// One state = (2 + acap) contiguous int32s: [len, link, next[0..acap)].
// The build's suffix-link walks and the query's failure-link walks touch
// len+link+transitions of one state per step; interleaving puts all of them
// in one cache line for DNA alphabets (stride 7 * 4B = 28B), ~2-3x faster
// than parallel len[]/link[]/next[] arrays on large (cache-cold) automata.
struct Automaton {
  std::vector<int32_t> st;
  int stride;  // 2 + acap
  int16_t code[256];
  int acap;  // transition count per state = exact alphabet size of this text
  int alpha = 0;
  int32_t last = 0;
  int32_t count = 0;
  bool overflow = false;  // alphabet-cap or state-id overflow
  int32_t max_states = INT32_MAX - 2;  // state ids are int32; guard the wrap

  explicit Automaton(int alphabet_cap) : stride(2 + alphabet_cap), acap(alphabet_cap) {
    for (int i = 0; i < 256; ++i) code[i] = -1;
    new_state();  // init state 0
    S(0)[0] = 0;
    S(0)[1] = -1;
  }

  int32_t n_states() const { return count; }

  int32_t* S(int32_t s) { return st.data() + static_cast<size_t>(s) * stride; }
  const int32_t* S(int32_t s) const { return st.data() + static_cast<size_t>(s) * stride; }

  int32_t new_state() {
    if (count >= max_states) {  // int32 id would wrap (~0.5 Gbp text); caller
      overflow = true;          // must partition the document (index/ms.py)
      return 0;
    }
    st.resize(st.size() + stride, -1);
    return count++;
  }

  int32_t len_of(int32_t s) const { return S(s)[0]; }
  int32_t link_of(int32_t s) const { return S(s)[1]; }
  int32_t tr(int32_t s, int c) const { return S(s)[2 + c]; }
  void set_tr(int32_t s, int c, int32_t v) { S(s)[2 + c] = v; }

  int code_of(uint8_t b, bool create) {
    int c = code[b];
    if (c < 0 && create) {
      if (alpha >= acap) {
        overflow = true;
        return -1;
      }
      c = alpha++;
      code[b] = static_cast<int16_t>(c);
    }
    return c;
  }

  void extend(uint8_t b) {
    int c = code_of(b, /*create=*/true);
    if (c < 0) return;  // overflow flagged; caller checks
    int32_t cur = new_state();
    if (overflow) return;
    S(cur)[0] = len_of(last) + 1;
    int32_t p = last;
    while (p != -1 && tr(p, c) == -1) {
      set_tr(p, c, cur);
      p = link_of(p);
    }
    if (p == -1) {
      S(cur)[1] = 0;
    } else {
      int32_t q = tr(p, c);
      if (len_of(p) + 1 == len_of(q)) {
        S(cur)[1] = q;
      } else {
        int32_t clone = new_state();
        if (overflow) return;
        std::memcpy(S(clone), S(q), stride * sizeof(int32_t));
        S(clone)[0] = len_of(p) + 1;
        while (p != -1 && tr(p, c) == q) {
          set_tr(p, c, clone);
          p = link_of(p);
        }
        S(q)[1] = clone;
        S(cur)[1] = clone;
      }
    }
    last = cur;
  }
};

// ---------------------------------------------------------------------------
// SA-IS suffix array construction (Nong/Zhang/Chan induced sorting) and
// LCP-scan matching statistics.
//
// The automaton above needs ~64 B per text char; a chromosome-scale record
// (250 Mbp + RC) would need ~32 GB. This path computes the same MS exactly
// via one suffix array over text ++ 0x01 ++ pivot ++ 0x00 at ~13 B/char
// (SA 4 + rank 4 + LCP 4 + string 1), so whole-chromosome documents fit a
// modest RAM budget. ms[p] = max over text suffixes t of lcp(pivot[p:], t),
// which is the min-LCP to the nearest text suffix above/below the pivot
// suffix in SA order — two linear scans. Separator bytes (0x01/0x00) occur
// nowhere in genomic input (caller-guarded), so matches cannot cross record
// terminators; any overshoot through the single text/pivot separator is
// clipped by the caller's per-record length clamp (index/ms.py).
// ---------------------------------------------------------------------------

template <typename CharT>
static void sais_impl(const CharT* s, int32_t* SA, int32_t n, int32_t K) {
  // n includes a trailing sentinel s[n-1] that is the unique minimum.
  if (n == 1) {
    SA[0] = 0;
    return;
  }
  std::vector<uint8_t> t(n);  // 1 = S-type
  t[n - 1] = 1;
  for (int32_t i = n - 2; i >= 0; --i)
    t[i] = (s[i] < s[i + 1] || (s[i] == s[i + 1] && t[i + 1])) ? 1 : 0;
  auto is_lms = [&](int32_t i) { return i > 0 && t[i] && !t[i - 1]; };

  // Fused (char, type) array: the induce passes make ONE dependent random
  // load per step instead of two (s[j] and t[j]) — worth ~20% end to end.
  // uint16 covers uint8 texts; uint32 covers recursion names (< 2^30).
  // Bucket counts are computed once per level, not re-scanned per pass.
  using CT = std::conditional_t<sizeof(CharT) == 1, uint16_t, uint32_t>;
  std::vector<CT> ct(n);
  for (int32_t i = 0; i < n; ++i)
    ct[i] = (static_cast<CT>(s[i]) << 1) | t[i];
  std::vector<int32_t> cnt(K, 0), bkt(K);
  for (int32_t i = 0; i < n; ++i) cnt[s[i]]++;
  auto get_buckets = [&](bool end) {
    int32_t sum = 0;
    for (int32_t c = 0; c < K; ++c) {
      sum += cnt[c];
      bkt[c] = end ? sum : sum - cnt[c];
    }
  };
  // The induced-sort passes are bound on dependent random loads
  // (SA[i] -> ct[j]); prefetching a few iterations ahead hides most of
  // the miss latency on large (cache-cold) texts.
  constexpr int32_t PF = 32;
  auto induce = [&]() {
    get_buckets(false);  // induce L-types left to right
    for (int32_t i = 0; i < n; ++i) {
      if (i + PF < n && SA[i + PF] > 0) __builtin_prefetch(&ct[SA[i + PF] - 1]);
      int32_t j = SA[i] - 1;
      if (SA[i] > 0) {
        CT c = ct[j];
        if (!(c & 1)) SA[bkt[c >> 1]++] = j;
      }
    }
    get_buckets(true);  // induce S-types right to left
    for (int32_t i = n - 1; i >= 0; --i) {
      if (i - PF >= 0 && SA[i - PF] > 0) __builtin_prefetch(&ct[SA[i - PF] - 1]);
      int32_t j = SA[i] - 1;
      if (SA[i] > 0) {
        CT c = ct[j];
        if (c & 1) SA[--bkt[c >> 1]] = j;
      }
    }
  };

  // Stage 1: bucket-sort LMS positions, induce a full (LMS-substring) order.
  std::fill(SA, SA + n, -1);
  get_buckets(true);
  for (int32_t i = 1; i < n; ++i)
    if (is_lms(i)) SA[--bkt[s[i]]] = i;
  induce();

  // Stage 2: compact the now-sorted LMS positions and name their substrings.
  int32_t n1 = 0;
  for (int32_t i = 0; i < n; ++i)
    if (is_lms(SA[i])) SA[n1++] = SA[i];
  std::fill(SA + n1, SA + n, -1);
  int32_t name = 0, prev = -1;
  for (int32_t i = 0; i < n1; ++i) {
    int32_t pos = SA[i];
    bool diff = false;
    if (prev < 0) {
      diff = true;
    } else {
      // Compare via the fused (char, type) array: one load per side per
      // step instead of s[]+t[], with LMS-ness derived from the previous
      // step's fused values (is_lms(i) == S-type(i) && L-type(i-1)).
      CT a = ct[pos], b = ct[prev];
      if (a != b) {
        diff = true;
      } else {
        for (int32_t d = 1;; ++d) {
          CT a2 = ct[pos + d], b2 = ct[prev + d];
          bool lp = (a2 & 1) && !(a & 1);
          bool lq = (b2 & 1) && !(b & 1);
          if (lp && lq) break;  // both substrings ended together: equal
          if (lp != lq || a2 != b2) {
            diff = true;
            break;
          }
          a = a2;
          b = b2;
        }
      }
    }
    if (diff) {
      ++name;
      prev = pos;
    }
    SA[n1 + pos / 2] = name - 1;  // LMS positions are >= 2 apart: pos/2 unique
  }
  int32_t* s1 = SA + n - n1;
  for (int32_t i = n - 1, j = n - 1; i >= n1; --i)
    if (SA[i] >= 0) SA[j--] = SA[i];

  // Stage 3: order the LMS suffixes (recurse iff names repeat), re-induce.
  if (name < n1) {
    sais_impl<int32_t>(s1, SA, n1, name);
  } else {
    for (int32_t i = 0; i < n1; ++i) SA[s1[i]] = i;
  }
  for (int32_t i = 1, j = 0; i < n; ++i)
    if (is_lms(i)) s1[j++] = i;  // LMS positions in text order
  for (int32_t i = 0; i < n1; ++i) SA[i] = s1[SA[i]];
  std::fill(SA + n1, SA + n, -1);
  get_buckets(true);
  for (int32_t i = n1 - 1; i >= 0; --i) {
    int32_t j = SA[i];
    SA[i] = -1;
    SA[--bkt[s[j]]] = j;
  }
  induce();
}

}  // namespace

extern "C" {

// Suffix array of s[0..n) (no sentinel required; one is appended internally).
// Test/debug surface for the SA-IS core. Returns 0, or -1 if n is too large.
int32_t sais_u8(const uint8_t* s, int64_t n, int32_t* sa_out) {
  if (n + 1 > INT32_MAX - 1) return -1;
  std::vector<uint8_t> buf(static_cast<size_t>(n) + 1);
  std::memcpy(buf.data(), s, static_cast<size_t>(n));
  buf[n] = 0;  // unique minimum sentinel (caller guarantees no 0x00 in s)
  std::vector<int32_t> sa(static_cast<size_t>(n) + 1);
  sais_impl<uint8_t>(buf.data(), sa.data(), static_cast<int32_t>(n + 1), 256);
  std::memcpy(sa_out, sa.data() + 1, static_cast<size_t>(n) * sizeof(int32_t));
  return 0;
}

// Matching statistics of `pivot` (records joined by 0x01) against `text`
// (records + RCs, '$'-terminated) via one SA-IS pass over
// text ++ 0x01 ++ pivot ++ 0x00. out[i] = longest prefix of pivot[i:]
// occurring in text; separator slots of `pivot` get arbitrary values the
// caller discards. Caller must clamp out[i] to its pivot record's remaining
// length (matches through the joining separators overshoot past record ends,
// never within them). Inputs must not contain bytes 0x00/0x01.
// Returns 0, -1 if combined length exceeds int32 indexing, -2 on bad bytes.
int64_t ms_sa(const uint8_t* text, int64_t n, const uint8_t* pivot, int64_t m,
              int32_t* out) {
  const int64_t N = n + m + 2;  // + separator + sentinel
  if (N > INT32_MAX - 1) return -1;
  std::vector<uint8_t> S(static_cast<size_t>(N));
  std::memcpy(S.data(), text, static_cast<size_t>(n));
  S[n] = 0x01;
  std::memcpy(S.data() + n + 1, pivot, static_cast<size_t>(m));
  S[N - 1] = 0x00;
  // Text must be clean of both control bytes; the pivot may contain 0x01
  // (its own record separators — matches crossing them only overshoot past
  // record ends, which the caller clamps) but never 0x00, and never '$'
  // (0x24): a literal '$' in the pivot would let LCP extension run through
  // the text's unit terminators, silently inflating MS — '$'-freedom is the
  // exactness precondition the per-record clamp relies on.
  for (int64_t i = 0; i < n; ++i)
    if (S[i] <= 0x01) return -2;
  for (int64_t i = n + 1; i < N - 1; ++i)
    if (S[i] == 0x00 || S[i] == 0x24) return -2;

  std::vector<int32_t> SA(static_cast<size_t>(N));
  sais_impl<uint8_t>(S.data(), SA.data(), static_cast<int32_t>(N), 256);

  // For each pivot suffix p, ms relative to the text is
  //   max(lcp(p, nearest text suffix above in SA order),
  //       lcp(p, nearest text suffix below)) —
  // nearest suffices because range-min LCP only shrinks with distance.
  // Each direction: one sequential SA pass records the neighbor text
  // position, then a text-order pass computes the lcp with PLCP-style
  // amortization — lcp(p+1, nearest(p+1)) >= lcp(p, nearest(p)) - 1, since
  // dropping the first matched char of (p, u) yields the text suffix u+1
  // still above/below p+1. This replaces Kasai + rank + full LCP (8 B/char
  // and the dominant cache-miss cost) with one int32[m] neighbor array.
  std::vector<int32_t> nbr(static_cast<size_t>(m));
  auto scan = [&](bool above) {
    std::fill(nbr.begin(), nbr.end(), -1);
    int64_t last_text = -1;
    const int64_t step = above ? 1 : -1;
    for (int64_t r = above ? 0 : N - 1; r >= 0 && r < N; r += step) {
      int64_t p = SA[r];
      if (p < n) {
        last_text = p;  // genuine text suffix (p == n is the separator)
      } else if (p > n && p < N - 1) {
        nbr[p - n - 1] = static_cast<int32_t>(last_text);
      }
    }
    int64_t h = 0;
    for (int64_t i = 0; i < m; ++i) {
      if (i + 8 < m && nbr[i + 8] >= 0) __builtin_prefetch(&S[nbr[i + 8]]);
      int64_t u = nbr[i];
      if (u < 0) {
        h = 0;
        continue;
      }
      int64_t p = n + 1 + i;
      while (S[p + h] == S[u + h]) ++h;  // 0x00 sentinel is unique: terminates
      if (h > out[i]) out[i] = static_cast<int32_t>(h);
      // Carry h-1 to the next position: valid because u+1 is still a text
      // suffix on the same side of p+1. When u is the LAST text suffix its
      // successor is the separator, so the carry does not hold — reset.
      if (u == n - 1) h = 0;
      else if (h) --h;
    }
  };
  for (int64_t i = 0; i < m; ++i) out[i] = 0;
  scan(true);
  scan(false);
  return 0;
}

// Colored (generalized-SA) matching statistics: MS of `pivot` against EVERY
// document of a group from ONE suffix array over
// all_units ++ 0x01 ++ pivot ++ 0x00 — instead of one SA per document that
// re-sorts the pivot each time. `unit_ends` are cumulative end offsets of the
// '$'-terminated units inside `text`; `unit_color[u]` maps unit u to its
// document (0..n_colors-1; a document's records and RCs share its color).
//
// Per color, ms is the max lcp to the nearest same-color text suffix
// above/below in SA order (nearest suffices: range-min LCP shrinks with
// distance, and suffixes of other colors between them don't affect the min
// to the NEAREST same-color one — lcp(p, u) depends on p and u alone). A
// per-SA-row color table (built once, prefetched) makes the scans purely
// sequential; the PLCP carry argument of ms_sa holds per color unchanged —
// h > 0 implies S[u] is not a terminator, so u+1 is in the same unit and
// keeps the color.
//
// The API is split build/scan/free so the caller streams color BLOCKS with
// bounded memory (a monolithic [n_colors, m] result is gigabytes at HPRC
// widths): gsa_build sorts once, gsa_scan computes any color range into a
// caller buffer, the Python side folds each block into its per-document
// accumulators immediately (memo_tpu.index.ms.pangenome_ms).

namespace {

struct GsaHandle {
  std::vector<uint8_t> S;        // text ++ 0x01 ++ pivot ++ 0x00
  std::vector<int32_t> SA;       // suffix array of S
  std::vector<uint8_t> col_of_row;  // color / kPivot / 0xFF per SA row
  int64_t n = 0, m = 0, N = 0;
  int32_t n_colors = 0;
};

constexpr uint8_t kPivotMark = 0xFE;

}  // namespace

// Build the shared generalized-SA state for one group. On success returns 0
// and sets *out_handle (free with gsa_free). Errors: -1 length overflow
// (combined length exceeds int32 indexing), -2 bad bytes (0x00/0x01 in text,
// 0x00/'$' in pivot), -3 bad colors (need 0 <= color < n_colors <= 250).
int64_t gsa_build(const uint8_t* text, int64_t n, const int64_t* unit_ends,
                  int64_t n_units, const int32_t* unit_color, int32_t n_colors,
                  const uint8_t* pivot, int64_t m, void** out_handle) {
  *out_handle = nullptr;
  const int64_t N = n + m + 2;  // + separator + sentinel
  if (N > INT32_MAX - 1) return -1;
  if (n_colors < 1 || n_colors > 250) return -3;
  if (n_units > 0 && unit_ends[n_units - 1] != n) return -3;
  auto h = std::make_unique<GsaHandle>();
  h->n = n;
  h->m = m;
  h->N = N;
  h->n_colors = n_colors;
  h->S.resize(static_cast<size_t>(N));
  std::memcpy(h->S.data(), text, static_cast<size_t>(n));
  h->S[n] = 0x01;
  std::memcpy(h->S.data() + n + 1, pivot, static_cast<size_t>(m));
  h->S[N - 1] = 0x00;
  for (int64_t i = 0; i < n; ++i)
    if (h->S[i] <= 0x01) return -2;
  for (int64_t i = n + 1; i < N - 1; ++i)
    if (h->S[i] == 0x00 || h->S[i] == 0x24) return -2;  // no 0x00 / '$' in pivot

  // Per-char color of text positions (temporary — collapsed into the
  // per-SA-row table below).
  std::vector<uint8_t> cc(static_cast<size_t>(n));
  {
    int64_t pos = 0;
    for (int64_t u = 0; u < n_units; ++u) {
      int32_t c = unit_color[u];
      if (c < 0 || c >= n_colors) return -3;
      for (; pos < unit_ends[u]; ++pos) cc[pos] = static_cast<uint8_t>(c);
    }
    if (pos != n) return -3;
  }

  h->SA.resize(static_cast<size_t>(N));
  sais_impl<uint8_t>(h->S.data(), h->SA.data(), static_cast<int32_t>(N), 256);

  // One pass of prefetched random loads turns every later color scan into a
  // sequential read: color (or pivot marker) of each SA row.
  h->col_of_row.resize(static_cast<size_t>(N));
  {
    constexpr int64_t PF = 24;
    const int32_t* SA = h->SA.data();
    for (int64_t r = 0; r < N; ++r) {
      if (r + PF < N) {
        int64_t q = SA[r + PF];
        if (q < n) __builtin_prefetch(&cc[q]);
      }
      int64_t p = SA[r];
      h->col_of_row[r] = p < n ? cc[p] : (p > n && p < N - 1 ? kPivotMark : 0xFF);
    }
  }
  *out_handle = h.release();
  return 0;
}

void gsa_free(void* handle) { delete static_cast<GsaHandle*>(handle); }

// Matching statistics for colors [c0, c1) of a built group, written to
// out[(c - c0) * m + i]. Blocked multi-color neighbor scans: ONE sequential
// SA pass serves a block of up to kBlk colors (a last-seen register per
// color; each pivot row stores the whole block's neighbors contiguously), so
// the full-SA row-visit cost is 2*ceil(C/kBlk)*N instead of 2*C*N — at HPRC
// widths (C~90) these scans, not SA-IS, dominate the pooled build. The LCP
// extension then runs per color with the same PLCP carry as ms_sa. Scratch:
// m*kBlk int32 per thread (the pivot is far smaller than the text in pooled
// groups). `n_threads` parallelizes the independent blocks.
// Returns 0, or -3 on a bad color range.
int64_t gsa_scan(void* handle, int32_t c0, int32_t c1, int32_t* out,
                 int32_t n_threads) {
  GsaHandle& H = *static_cast<GsaHandle*>(handle);
  if (c0 < 0 || c1 <= c0 || c1 > H.n_colors) return -3;
  const int64_t n = H.n, m = H.m, N = H.N;
  const uint8_t* S = H.S.data();
  const int32_t* SA = H.SA.data();
  const uint8_t* col_of_row = H.col_of_row.data();

  constexpr int32_t kBlk = 16;
  auto scan_block = [&](bool above, int32_t b0, int32_t nb, int32_t* nbr_blk) {
    int32_t last[kBlk];
    for (int32_t b = 0; b < nb; ++b) last[b] = -1;
    const int64_t step = above ? 1 : -1;
    const int32_t bhi = b0 + nb;
    for (int64_t r = above ? 0 : N - 1; r >= 0 && r < N; r += step) {
      uint8_t c = col_of_row[r];
      if (c == kPivotMark) {
        // Every pivot row is visited exactly once: no pre-fill needed.
        int32_t* dst = nbr_blk + static_cast<size_t>(SA[r] - n - 1) * nb;
        for (int32_t b = 0; b < nb; ++b) dst[b] = last[b];
      } else if (c >= b0 && c < bhi) {
        last[c - b0] = SA[r];
      }
    }
    // Interleaved LCP extension: ONE pass over pivot positions serves the
    // whole block — each position's nbr row (nb int32, one cache line) is
    // read once instead of once per color, and each color keeps its own
    // PLCP carry. The pivot-side reads S[p+h] stay sequential (p+h is
    // nondecreasing under the carry); the text side prefetches the next
    // rows' S[u+h] with the current carry as the position estimate.
    int64_t hs[kBlk];
    for (int32_t b = 0; b < nb; ++b) hs[b] = 0;
    int32_t* out_base = out + static_cast<size_t>(b0 - c0) * m;
    for (int64_t i = 0; i < m; ++i) {
      if (i + 4 < m) {
        const int32_t* prow = nbr_blk + static_cast<size_t>(i + 4) * nb;
        for (int32_t b = 0; b < nb; ++b) {
          int32_t v = prow[b];
          if (v >= 0) __builtin_prefetch(&S[v + hs[b]]);
        }
      }
      const int32_t* row = nbr_blk + static_cast<size_t>(i) * nb;
      for (int32_t b = 0; b < nb; ++b) {
        int64_t u = row[b];
        int64_t& h = hs[b];
        if (u < 0) {
          h = 0;
          continue;
        }
        int64_t p = n + 1 + i;
        while (S[p + h] == S[u + h]) ++h;  // 0x00 sentinel is unique: terminates
        int32_t* out_c = out_base + static_cast<size_t>(b) * m;
        if (h > out_c[i]) out_c[i] = static_cast<int32_t>(h);
        // Carry h-1 iff u+1 is still a same-color text suffix: h > 0 implies
        // S[u] is not this unit's '$', so u+1 stays inside the unit (same
        // color) — except at the very last text position, as in ms_sa.
        if (u == n - 1) h = 0;
        else if (h) --h;
      }
    }
  };
  std::fill(out, out + static_cast<size_t>(c1 - c0) * m, 0);
  // Blocks align to absolute color multiples of kBlk so any [c0, c1) split
  // of the full range visits identical blocks (scan order is irrelevant to
  // the result; alignment just keeps block sizes regular).
  const int32_t first_blk = c0 / kBlk;
  const int32_t last_blk = (c1 - 1) / kBlk;
  const int32_t n_blocks = last_blk - first_blk + 1;
  const int32_t T = std::max<int32_t>(1, std::min<int32_t>(n_threads, n_blocks));
  auto run_blocks = [&](int32_t t, std::vector<int32_t>& nbr_blk) {
    for (int32_t blk = first_blk + t; blk <= last_blk; blk += T) {
      int32_t b0 = std::max(blk * kBlk, c0);
      int32_t nb = std::min((blk + 1) * kBlk, c1) - b0;
      scan_block(true, b0, nb, nbr_blk.data());
      scan_block(false, b0, nb, nbr_blk.data());
    }
  };
  if (T == 1) {
    std::vector<int32_t> nbr_blk(static_cast<size_t>(m) * kBlk);
    run_blocks(0, nbr_blk);
  } else {
    std::vector<std::thread> pool;
    pool.reserve(T);
    for (int32_t t = 0; t < T; ++t) {
      pool.emplace_back([&, t]() {
        std::vector<int32_t> nbr_blk(static_cast<size_t>(m) * kBlk);
        run_blocks(t, nbr_blk);
      });
    }
    for (auto& th : pool) th.join();
  }
  return 0;
}

// One-shot wrapper (kept for ABI compatibility and small groups): full
// [n_colors, m] result in one call.
int64_t ms_gsa_mt(const uint8_t* text, int64_t n, const int64_t* unit_ends,
                  int64_t n_units, const int32_t* unit_color, int32_t n_colors,
                  const uint8_t* pivot, int64_t m, int32_t* out,
                  int32_t n_threads) {
  void* h = nullptr;
  int64_t rc = gsa_build(text, n, unit_ends, n_units, unit_color, n_colors,
                         pivot, m, &h);
  if (rc != 0) return rc;
  rc = gsa_scan(h, 0, n_colors, out, n_threads);
  gsa_free(h);
  return rc;
}

int64_t ms_gsa(const uint8_t* text, int64_t n, const int64_t* unit_ends,
               int64_t n_units, const int32_t* unit_color, int32_t n_colors,
               const uint8_t* pivot, int64_t m, int32_t* out) {
  return ms_gsa_mt(text, n, unit_ends, n_units, unit_color, n_colors, pivot,
                   m, out, 1);
}

// Build the automaton over reverse(text). Returns nullptr on alphabet
// overflow, state-id (int32) overflow, or allocation failure. `max_states`
// <= 0 means the int32 ceiling; smaller values are a test hook for the
// overflow guard.
void* ms_build_capped(const uint8_t* text, int64_t n, int64_t max_states) {
  // Pre-count the exact alphabet so transition rows are sized to it.
  bool seen[256] = {false};
  int acap = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (!seen[text[i]]) {
      seen[text[i]] = true;
      ++acap;
    }
  }
  if (acap == 0) acap = 1;
  auto* a = new (std::nothrow) Automaton(acap);
  if (!a) return nullptr;
  if (max_states > 0 && max_states < a->max_states)
    a->max_states = static_cast<int32_t>(max_states);
  try {
    if (2 * n + 4 < a->max_states)
      a->st.reserve((2 * n + 4) * static_cast<size_t>(a->stride));
    for (int64_t i = n - 1; i >= 0; --i) {
      a->extend(text[i]);
      if (a->overflow) {
        delete a;
        return nullptr;
      }
    }
  } catch (...) {
    delete a;
    return nullptr;
  }
  return a;
}

void* ms_build(const uint8_t* text, int64_t n) {
  return ms_build_capped(text, n, 0);
}

void ms_free(void* h) { delete static_cast<Automaton*>(h); }

int64_t ms_num_states(void* h) { return static_cast<Automaton*>(h)->n_states(); }

// Matching statistics of `pivot` (one record, no '$') against the built text:
// out[p] = length of the longest prefix of pivot[p:] occurring in the text.
void ms_query(void* h, const uint8_t* pivot, int64_t m, int32_t* out) {
  const Automaton& a = *static_cast<const Automaton*>(h);
  int32_t state = 0;
  int32_t l = 0;
  // Stream reversed pivot; longest match ending at reversed index i is the
  // longest match starting at m-1-i in the forward pivot.
  for (int64_t i = m - 1; i >= 0; --i) {
    int c = a.code[pivot[i]];
    if (c < 0) {
      state = 0;
      l = 0;
    } else {
      while (state != 0 && a.tr(state, c) == -1) {
        state = a.link_of(state);
        l = a.len_of(state);
      }
      int32_t nxt = a.tr(state, c);
      if (nxt != -1) {
        state = nxt;
        ++l;
      } else {
        state = 0;
        l = 0;
      }
    }
    out[i] = l;
  }
}

// MEM-overlap interval extraction from a row-major MS matrix (the DAP).
//
// One streaming pass over ms[P*D] implementing the reference's row loop
// (reference dap_to_bed.py:116-134) including the end-of-record sentinel row
// (pos=L, ms=[L]*D -> intervals ending at min(prev_end, 2L)): position p
// starts a MEM for column c iff p == 0 or ms[p-1][c] <= ms[p][c]; on each new
// MEM emit the overlap [p, min(prev_end, p+ms[p][c]))] with the column's
// previous MEM when non-negative (bookends kept). Emission is row-major —
// the reference's BED print order. Replaces the numpy path in
// memo_tpu.index.intervals, which is memory-bound on (P,D) int64 temporaries;
// this pass reads each ms row once and keeps only prev_end[D] hot.
//
// `cap` = caller-computed bound on emissions (exact count of MEM starts);
// returns the number of intervals written, or -1 if cap was insufficient.
int64_t ms_overlaps(const int32_t* ms, int64_t P, int64_t D, int64_t L,
                    int64_t cap, int64_t* out_s, int64_t* out_e, int32_t* out_o) {
  std::vector<int64_t> prev_end(static_cast<size_t>(D), -1);
  int64_t k = 0;
  bool any_rows = P > 0;
  if (any_rows) {
    // First row of the record: every column emits (no previous MEM yet).
    for (int64_t c = 0; c < D; ++c) prev_end[c] = ms[c];
    for (int64_t p = 1; p < P; ++p) {
      const int32_t* row = ms + p * D;
      const int32_t* prev_row = row - D;
      for (int64_t c = 0; c < D; ++c) {
        if (prev_row[c] <= row[c]) {
          int64_t end = p + row[c];
          int64_t ov_end = prev_end[c] < end ? prev_end[c] : end;
          if (ov_end >= p) {
            if (k == cap) return -1;
            out_s[k] = p;
            out_e[k] = ov_end;
            out_o[k] = static_cast<int32_t>(c + 1);
            ++k;
          }
          prev_end[c] = end;
        }
      }
    }
  }
  // Sentinel end-of-record row (pos=L, ms=[L]*D): unconditional emit.
  if (any_rows) {
    for (int64_t c = 0; c < D; ++c) {
      int64_t ov_end = prev_end[c] < 2 * L ? prev_end[c] : 2 * L;
      if (ov_end >= L) {
        if (k == cap) return -1;
        out_s[k] = L;
        out_e[k] = ov_end;
        out_o[k] = static_cast<int32_t>(c + 1);
        ++k;
      }
    }
  }
  return k;
}

}  // extern "C"
