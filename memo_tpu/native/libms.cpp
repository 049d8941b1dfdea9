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

struct Automaton {
  std::vector<int32_t> len;
  std::vector<int32_t> link;
  std::vector<int32_t> next;  // flat [state][acap]
  int16_t code[256];
  int acap;  // transition stride = exact alphabet size of this text
  int alpha = 0;
  int32_t last = 0;
  bool overflow = false;  // should never trip: acap is pre-counted

  explicit Automaton(int alphabet_cap) : acap(alphabet_cap) {
    for (int i = 0; i < 256; ++i) code[i] = -1;
    new_state();  // init state 0
    len[0] = 0;
    link[0] = -1;
  }

  int32_t n_states() const { return static_cast<int32_t>(len.size()); }

  int32_t new_state() {
    len.push_back(0);
    link.push_back(-1);
    next.resize(next.size() + acap, -1);
    return n_states() - 1;
  }

  int32_t tr(int32_t s, int c) const { return next[static_cast<size_t>(s) * acap + c]; }
  void set_tr(int32_t s, int c, int32_t v) { next[static_cast<size_t>(s) * acap + c] = v; }

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
    len[cur] = len[last] + 1;
    int32_t p = last;
    while (p != -1 && tr(p, c) == -1) {
      set_tr(p, c, cur);
      p = link[p];
    }
    if (p == -1) {
      link[cur] = 0;
    } else {
      int32_t q = tr(p, c);
      if (len[p] + 1 == len[q]) {
        link[cur] = q;
      } else {
        int32_t clone = new_state();
        len[clone] = len[p] + 1;
        link[clone] = link[q];
        std::memcpy(&next[static_cast<size_t>(clone) * acap],
                    &next[static_cast<size_t>(q) * acap], acap * sizeof(int32_t));
        while (p != -1 && tr(p, c) == q) {
          set_tr(p, c, clone);
          p = link[p];
        }
        link[q] = clone;
        link[cur] = clone;
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
    a->len.reserve(2 * n + 4);
    a->link.reserve(2 * n + 4);
    a->next.reserve((2 * n + 4) * static_cast<size_t>(acap));
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
        state = a.link[state];
        l = a.len[state];
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

}  // extern "C"
