"""Interval-extraction semantics, pinned by the golden vectors derived from
the reference in SURVEY.md §Algorithm (verified against the live reference in
test_oracle_parity.py)."""

import numpy as np
import pytest

from memo_tpu.index.intervals import mem_intervals, mem_overlap_intervals

GOLDEN_DAP = np.array(
    [[3, 2, 1], [2, 1, 5], [1, 4, 4], [5, 3, 3], [4, 2, 2]], np.int32
)


def rows(s, e, o):
    return list(zip(s.tolist(), e.tolist(), o.tolist()))


def test_order_overlap_golden():
    s, e, o = mem_overlap_intervals(GOLDEN_DAP, 5, order_sort=True)
    assert rows(s, e, o) == [
        (1, 3, 1), (1, 2, 2), (1, 1, 3),
        (2, 3, 2), (2, 2, 3),
        (3, 6, 1), (3, 3, 3),
        (5, 8, 1), (5, 6, 2), (5, 6, 3),
    ]


def test_membership_overlap_golden():
    s, e, o = mem_overlap_intervals(GOLDEN_DAP, 5, order_sort=False)
    assert rows(s, e, o) == [
        (1, 1, 3), (2, 2, 2), (3, 3, 1),
        (5, 8, 1), (5, 6, 2), (5, 6, 3),
    ]


def test_chunking_invariance():
    rng = np.random.default_rng(7)
    ms = rng.integers(0, 12, size=(200, 4)).astype(np.int32)
    ref = mem_overlap_intervals(ms, 200, order_sort=True)
    for chunk in (1, 3, 7, 64, 200, 1000):
        got = mem_overlap_intervals(ms, 200, order_sort=True, chunk_rows=chunk)
        for a, b in zip(ref, got):
            assert np.array_equal(a, b), f"chunk={chunk}"


def test_bookend_zero_length_emitted():
    # SURVEY §2.3: start == end intervals are emitted (dap_to_bed.py:97)
    ms = np.array([[1], [1]], np.int32)  # MEM [0,1) then MEM [1,2): overlap [1,1)
    s, e, o = mem_overlap_intervals(ms, 2, order_sort=False)
    assert (1, 1, 1) in rows(s, e, o)


def test_sentinel_rows_past_end():
    # SURVEY §2.3: sentinel intervals [L, min(prev_end, 2L)) appear when the
    # last MEM reaches the record end
    ms = np.array([[5], [4], [3], [2], [1]], np.int32)  # MEM [0,5) covers to end
    s, e, o = mem_overlap_intervals(ms, 5, order_sort=False)
    assert rows(s, e, o)[-1] == (5, 5, 1)


def test_non_mem_rows_do_not_emit():
    # strictly decreasing MS -> only first row and sentinel are MEMs
    ms = np.array([[9], [7], [5]], np.int32)
    s, e, o = mem_overlap_intervals(ms, 3, order_sort=False)
    # first row MEM [0,9); sentinel [3, min(9, 6)) = [3, 6)
    assert rows(s, e, o) == [(3, 6, 1)]


def test_mem_intervals_plain():
    s, e, o = mem_intervals(GOLDEN_DAP, 5, order_sort=False)
    got = rows(s, e, o)
    # every row 0 column emits; spot-check MEM rule: col 2 (1-based 3): values
    # 1,5,4,3,2 -> rows 0 (first) and 1 (1<=5) are MEMs, rows 2-4 are not
    col3 = [(a, b) for a, b, c in got if c == 3]
    assert col3 == [(0, 1), (1, 6), (5, 10)]


def test_zero_ms_everywhere():
    # all rows are MEMs (0<=0) of zero length [p,p); consecutive overlaps are
    # (max(p-1... ) = (p, p-1) -> end < start, never emitted; sentinel overlap
    # (4, min(3,8)) also empty -> the index is empty
    ms = np.zeros((4, 2), np.int32)
    s, e, o = mem_overlap_intervals(ms, 4, order_sort=True)
    assert rows(s, e, o) == []


def test_single_row_record():
    ms = np.array([[3, 1]], np.int32)
    s, e, o = mem_overlap_intervals(ms, 1, order_sort=False)
    # row 0 sets prev; sentinel [1, 2): overlap with [0,3): [1, 2); with [0,1): [1,1)
    assert rows(s, e, o) == [(1, 2, 1), (1, 1, 2)]


def test_native_matches_python_backend():
    """The streaming C++ extraction (libms ms_overlaps) is emission-exact with
    the chunked-numpy path on randomized MS, all modes, L != P included."""
    rng = np.random.default_rng(99)
    for P, D, hi in [(1, 1, 5), (2, 3, 4), (64, 4, 9), (500, 7, 40), (333, 2, 1000)]:
        ms = rng.integers(0, hi, size=(P, D)).astype(np.int32)
        for order_sort in (False, True):
            for L in (P, P + 3):
                nat = mem_overlap_intervals(ms, L, order_sort=order_sort, backend="native")
                py = mem_overlap_intervals(ms, L, order_sort=order_sort, backend="python")
                for a, b in zip(nat, py):
                    np.testing.assert_array_equal(a, b)


def test_streaming_extractor_matches_oneshot():
    """StreamingOverlapExtractor (carry-chunked C pass) emits byte-identical
    intervals to mem_overlap_intervals for every chunking, both modes."""
    from memo_tpu.index.intervals import StreamingOverlapExtractor

    rng = np.random.default_rng(42)
    for trial in range(30):
        P = int(rng.integers(1, 200))
        D = int(rng.integers(1, 7))
        L = P
        ms = rng.integers(0, 25, size=(P, D)).astype(np.int32)
        for order_sort in (False, True):
            want = mem_overlap_intervals(ms, L, order_sort=order_sort)
            for chunk in (1, 3, 7, P):
                ex = StreamingOverlapExtractor(D, L, order_sort=order_sort)
                got_s, got_e, got_o = [], [], []
                for lo in range(0, P, chunk):
                    s, e, o = ex.feed(ms[lo : lo + chunk])
                    got_s.append(s); got_e.append(e); got_o.append(o)
                s, e, o = ex.finish()
                got_s.append(s); got_e.append(e); got_o.append(o)
                np.testing.assert_array_equal(np.concatenate(got_s), want[0])
                np.testing.assert_array_equal(np.concatenate(got_e), want[1])
                np.testing.assert_array_equal(np.concatenate(got_o), want[2])


def test_streaming_extractor_numpy_fallback_matches():
    from memo_tpu.index import intervals as I

    rng = np.random.default_rng(7)
    ms = rng.integers(0, 12, size=(60, 3)).astype(np.int32)
    want = I.mem_overlap_intervals(ms, 60, order_sort=True)
    ex = I.StreamingOverlapExtractor(3, 60, order_sort=True)
    ex._lib = None  # force the numpy carry path
    ex._carry = I._ColumnCarry.fresh(3)
    outs = [ex.feed(ms[lo : lo + 17]) for lo in range(0, 60, 17)] + [ex.finish()]
    np.testing.assert_array_equal(np.concatenate([o[0] for o in outs]), want[0])
    np.testing.assert_array_equal(np.concatenate([o[1] for o in outs]), want[1])
    np.testing.assert_array_equal(np.concatenate([o[2] for o in outs]), want[2])


def test_store_from_doc_columns_equals_store_from_ms():
    """The streamed-DAP store path is bit-identical to the materialized-DAP
    path for both kinds and multi-record pivots."""
    from memo_tpu.index.builder import store_from_doc_columns, store_from_ms

    rng = np.random.default_rng(9)
    lens = [300, 97]
    D = 5
    ms_by_record = [
        rng.integers(0, 30, size=(L, D)).astype(np.int32) for L in lens
    ]
    cols_by_doc = [[ms[:, j].copy() for ms in ms_by_record] for j in range(D)]
    for kind in ("conservation", "membership"):
        a = store_from_ms(ms_by_record, ["r1", "r2"], lens, D + 1, kind)
        b = store_from_doc_columns(
            cols_by_doc, ["r1", "r2"], lens, D + 1, kind, chunk_rows=64
        )
        np.testing.assert_array_equal(a.start, b.start)
        np.testing.assert_array_equal(a.end, b.end)
        np.testing.assert_array_equal(a.order, b.order)
        np.testing.assert_array_equal(a.rec_id, b.rec_id)
