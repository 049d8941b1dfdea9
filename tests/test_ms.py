"""Matching-statistics engine: python automaton vs naive oracle vs native."""

import numpy as np
import pytest

from memo_tpu.index import ms as msmod
from memo_tpu.io.fasta import FastaRecord


def _rec(name, s):
    return FastaRecord(name, np.frombuffer(s.encode(), np.uint8).copy())


def _rand_dna(rng, n):
    return "".join(rng.choice(list("ACGT")) for _ in range(n))


def test_py_automaton_simple():
    # text "ACGT$": ms of "GTT" = [2,1,0] (GT, T, then T... wait T occurs)
    idx = msmod._PySuffixAutomaton(b"ACGT$")
    out = idx.matching_statistics(b"GTT")
    assert out.tolist() == [2, 1, 1]


def test_py_vs_naive_random():
    import random

    rng = random.Random(42)
    for trial in range(20):
        recs = [_rand_dna(rng, rng.randint(5, 60)) for _ in range(rng.randint(1, 3))]
        pivot = _rand_dna(rng, rng.randint(5, 80))
        text = b"".join(r.encode() + b"$" for r in recs)
        auto = msmod._PySuffixAutomaton(text)
        got = auto.matching_statistics(pivot.encode())
        want = msmod.naive_matching_statistics(pivot.encode(), [r.encode() for r in recs])
        assert got.tolist() == want.tolist(), f"trial {trial}"


def test_matches_cannot_span_records():
    # "AB" split across records must not match
    auto = msmod._PySuffixAutomaton(b"CA$TG$")
    out = auto.matching_statistics(b"AT")
    assert out.tolist() == [1, 1]


@pytest.fixture(scope="module")
def native_available():
    from memo_tpu.native.build import load_libms

    lib = load_libms()
    if lib is None:
        from memo_tpu.native.build import build_error

        pytest.skip(f"libms unavailable: {build_error()}")
    return lib


def test_native_vs_python(native_available):
    import random

    rng = random.Random(7)
    for trial in range(15):
        recs = [_rand_dna(rng, rng.randint(10, 200)) for _ in range(rng.randint(1, 4))]
        pivot = _rand_dna(rng, rng.randint(10, 300))
        text = b"".join(r.encode() + b"$" for r in recs)
        nat = msmod.MatchingStatisticsIndex(text, backend="native")
        py = msmod.MatchingStatisticsIndex(text, backend="python")
        assert nat.backend == "native"
        assert np.array_equal(nat.query(pivot.encode()), py.query(pivot.encode())), trial


def test_native_unseen_chars(native_available):
    nat = msmod.MatchingStatisticsIndex(b"ACGT$", backend="native")
    assert nat.query(b"AXGT").tolist() == [1, 0, 2, 1]


def test_matching_statistics_full_dap():
    pivot = [_rec("p1", "ACGTACGT"), _rec("p2", "TTTT")]
    docs = [[_rec("a", "ACGTAA")], [_rec("b", "AAAATTT")]]
    out = msmod.matching_statistics(pivot, docs, backend="python")
    assert len(out) == 2
    assert out[0].shape == (8, 2)
    assert out[1].shape == (4, 2)
    # doc a contains ACGTA: ms of ACGTACGT vs (ACGTAA + rc TTACGT)
    want0 = msmod.naive_matching_statistics(b"ACGTACGT", [b"ACGTAA", b"TTACGT"])
    assert out[0][:, 0].tolist() == want0.tolist()
    # doc b: TTTT vs AAAATTT / rc AAATTTT -> TTTT has TTT matches
    want1 = msmod.naive_matching_statistics(b"TTTT", [b"AAAATTT", b"AAATTTT"])
    assert out[1][:, 1].tolist() == want1.tolist()


def test_reverse_complement_included():
    # pivot matches only the rc of the document
    pivot = [_rec("p", "AAAACCC")]
    docs = [[_rec("d", "GGGTTTT")]]  # rc = AAAACCC
    out = msmod.matching_statistics(pivot, docs, backend="python")
    assert out[0][:, 0].tolist() == [7, 6, 5, 4, 3, 2, 1]


def test_uppercase_normalization():
    pivot = [_rec("p", "acgt")]
    docs = [[_rec("d", "ACGT")]]
    out = msmod.matching_statistics(pivot, docs, backend="python", uppercase=True)
    assert out[0][:, 0].tolist() == [4, 3, 2, 1]
