"""Matching statistics of a pivot genome against each document.

The MONI replacement (reference index.sh:69-76). Semantics: for each pivot
record P and document text T (= the document's records + their reverse
complements, each '$'-terminated, concatenated — exactly the ``.w_rc`` file
the reference builds at index.sh:63-65),

    ms[p] = length of the longest prefix of P[p:] that is a substring of T.

'$' never occurs in the pivot, so matches cannot span document records.

Backends:
- ``native``: C++ generalized suffix automaton over the reversed text
  (memo_tpu/native/libms.cpp), streamed with the reversed pivot.
- ``python``: same algorithm in pure Python (tests / no-toolchain fallback).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

from memo_tpu.io.fasta import FastaRecord, with_reverse_complements

TERMINATOR = b"$"


def document_text(records: Sequence[FastaRecord], add_rc: bool = True) -> bytes:
    """Concatenated '$'-terminated document text (records + reverse
    complements, originals first — reference index.sh:63-65)."""
    recs = with_reverse_complements(records) if add_rc else list(records)
    return b"".join(r.seq.tobytes() + TERMINATOR for r in recs)


class _PySuffixAutomaton:
    """Suffix automaton with dict transitions (pure-Python fallback)."""

    def __init__(self, text: bytes):
        self.len = [0]
        self.link = [-1]
        self.next: list[dict[int, int]] = [{}]
        last = 0
        for b in reversed(text):  # automaton of reversed text
            last = self._extend(b, last)
        self.last = last

    def _extend(self, c: int, last: int) -> int:
        ln, lk, nx = self.len, self.link, self.next
        cur = len(ln)
        ln.append(ln[last] + 1)
        lk.append(-1)
        nx.append({})
        p = last
        while p != -1 and c not in nx[p]:
            nx[p][c] = cur
            p = lk[p]
        if p == -1:
            lk[cur] = 0
        else:
            q = nx[p][c]
            if ln[p] + 1 == ln[q]:
                lk[cur] = q
            else:
                clone = len(ln)
                ln.append(ln[p] + 1)
                lk.append(lk[q])
                nx.append(dict(nx[q]))
                while p != -1 and nx[p].get(c) == q:
                    nx[p][c] = clone
                    p = lk[p]
                lk[q] = clone
                lk[cur] = clone
        return cur

    def matching_statistics(self, pivot: bytes) -> np.ndarray:
        out = np.zeros(len(pivot), np.int32)
        state, l = 0, 0
        ln, lk, nx = self.len, self.link, self.next
        for i in range(len(pivot) - 1, -1, -1):
            c = pivot[i]
            while state != 0 and c not in nx[state]:
                state = lk[state]
                l = ln[state]
            if c in nx[state]:
                state = nx[state][c]
                l += 1
            else:
                state, l = 0, 0
            out[i] = l
        return out


class MatchingStatisticsIndex:
    """Per-document MS index: build once, query any number of pivot records
    (the ``moni build`` / ``moni ms`` split, reference index.sh:69-76)."""

    def __init__(self, text: bytes, backend: str = "auto"):
        self.text = text
        self._native = None
        self._py = None
        if backend in ("auto", "native"):
            from memo_tpu.native.build import load_libms

            lib = load_libms()
            if lib is not None:
                handle = lib.ms_build(text, len(text))
                if handle:
                    self._native = (lib, handle)
                elif backend == "native":
                    raise RuntimeError("libms build failed (alphabet overflow or OOM)")
            elif backend == "native":
                from memo_tpu.native.build import build_error

                raise RuntimeError(f"libms unavailable: {build_error()}")
        if self._native is None:
            if backend == "python" or backend == "auto":
                self._py = _PySuffixAutomaton(text)
            else:
                raise ValueError(f"unknown backend {backend!r}")

    @property
    def backend(self) -> str:
        return "native" if self._native is not None else "python"

    def query(self, pivot: bytes | np.ndarray) -> np.ndarray:
        if isinstance(pivot, np.ndarray):
            pivot = pivot.tobytes()
        if self._native is not None:
            import ctypes

            lib, handle = self._native
            out = np.zeros(len(pivot), np.int32)
            lib.ms_query(
                handle, pivot, len(pivot), out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            )
            return out
        return self._py.matching_statistics(pivot)

    def __del__(self):
        if getattr(self, "_native", None) is not None:
            lib, handle = self._native
            try:
                lib.ms_free(handle)
            except Exception:
                pass
            self._native = None


def matching_statistics(
    pivot_records: Sequence[FastaRecord],
    documents: Sequence[Sequence[FastaRecord]],
    backend: str = "auto",
    uppercase: bool = True,
) -> list[np.ndarray]:
    """Full DAP: per pivot record r, an int32 array ``[len(r), n_documents]``
    of matching statistics (column j = document j, the reference's dap.txt
    column order, index.sh:83)."""
    pivots = [r.upper() if uppercase else r for r in pivot_records]
    out = [np.zeros((len(r), len(documents)), np.int32) for r in pivots]
    for j, doc in enumerate(documents):
        doc_recs = [r.upper() if uppercase else r for r in doc]
        idx = MatchingStatisticsIndex(document_text(doc_recs), backend=backend)
        for i, piv in enumerate(pivots):
            out[i][:, j] = idx.query(piv.seq)
        del idx
    return out


def naive_matching_statistics(pivot: bytes, text_records: Sequence[bytes]) -> np.ndarray:
    """O(n*m) oracle used by tests: longest prefix of pivot[p:] occurring in
    any single record (matches cannot span records)."""
    m = len(pivot)
    out = np.zeros(m, np.int32)
    for p in range(m):
        best = 0
        hi = m - p
        for rec in text_records:
            # binary search the longest l such that pivot[p:p+l] in rec
            lo_l, hi_l = best, hi
            while lo_l < hi_l:
                mid = (lo_l + hi_l + 1) // 2
                if pivot[p : p + mid] in rec:
                    lo_l = mid
                else:
                    hi_l = mid - 1
            best = lo_l
        out[p] = best
    return out
