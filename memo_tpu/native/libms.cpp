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

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <new>
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
  bool overflow = false;  // should never trip: acap is pre-counted

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

}  // namespace

extern "C" {

// Build the automaton over reverse(text). Returns nullptr on alphabet
// overflow or allocation failure.
void* ms_build(const uint8_t* text, int64_t n) {
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
  try {
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
