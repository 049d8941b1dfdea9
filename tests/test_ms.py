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


# --- suffix-array (SA-IS) engine and memory-bounded partitioning -----------


def test_sais_vs_naive_suffix_array(native_available):
    import ctypes
    import random

    rng = random.Random(11)
    for trial in range(100):
        n = rng.randint(1, 120)
        s = bytes(rng.choice(b"ACGTN$ab\x7f") for _ in range(n))
        sa = np.zeros(n, np.int32)
        rc = native_available.sais_u8(
            s, n, sa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        assert rc == 0
        assert sa.tolist() == sorted(range(n), key=lambda i: s[i:]), (trial, s)


def test_sa_ms_vs_automaton_and_naive(native_available):
    import random

    from memo_tpu.io.fasta import with_reverse_complements

    rng = random.Random(5)
    for trial in range(60):
        alpha = rng.choice(["AC", "ACGT", "ACGTN", "ACGTacgtn"])
        doc = [
            _rec(f"d{i}", "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60))))
            for i in range(rng.randint(1, 4))
        ]
        piv = [
            _rec(f"p{i}", "".join(rng.choice(alpha) for _ in range(rng.randint(0, 50))))
            for i in range(rng.randint(1, 3))
        ]
        units = with_reverse_complements(doc)
        text = msmod.document_text(units, add_rc=False)
        cols = msmod.sa_matching_statistics(text, piv)
        auto = msmod.MatchingStatisticsIndex(text, backend="native")
        for i, p in enumerate(piv):
            want = auto.query(p.seq)
            assert np.array_equal(cols[i], want), (trial, i, p.seq.tobytes())
            naive = msmod.naive_matching_statistics(
                p.seq.tobytes(), [u.seq.tobytes() for u in units]
            )
            assert np.array_equal(want, naive), (trial, i)


def test_partitioned_equals_monolithic():
    """The chromosome-scale path: per-record groups max-merged == one build."""
    import random

    rng = random.Random(9)
    for trial in range(20):
        doc = [
            _rec(f"d{i}", _rand_dna(rng, rng.randint(0, 50)))
            for i in range(rng.randint(1, 5))
        ]
        piv = [_rec("p", _rand_dna(rng, 48))]
        mono = msmod.document_ms(piv, doc, backend="auto")
        for be in ("sa", "native", "python"):
            if be != "python":
                from memo_tpu.native.build import load_libms

                if load_libms() is None:
                    continue
            # ~200-char groups: forces several partitions per document
            part = msmod.document_ms(piv, doc, backend=be, budget_bytes=200 * 13)
            assert np.array_equal(mono[0], part[0]), (trial, be)


def test_partition_units_respects_cap():
    units = [_rec(str(i), "A" * n) for i, n in enumerate([5, 5, 5, 20, 3])]
    groups = msmod.partition_units(units, 12)
    assert [len(g) for g in groups] == [2, 1, 1, 1]  # 20-char unit alone
    assert sum(len(g) for g in groups) == len(units)


def test_automaton_int32_state_guard(native_available):
    """State ids are int32; a capped build must fail instead of wrapping."""
    assert not native_available.ms_build_capped(b"ABCDEFGH" * 10, 80, 20)
    h = native_available.ms_build_capped(b"ABCDEFGH" * 10, 80, 0)
    assert h
    native_available.ms_free(h)


def test_sa_backend_through_build(tmp_path):
    """`--ms-backend sa` end-to-end: same store as the automaton backend."""
    from memo_tpu.native.build import load_libms

    if load_libms() is None:
        pytest.skip("libms unavailable")
    import random

    from memo_tpu.index.builder import BuildConfig, build_index
    from memo_tpu.io.fasta import write_fasta

    rng = random.Random(3)
    paths = []
    for i in range(3):
        p = tmp_path / f"g{i}.fa"
        recs = [_rec(f"g{i}r{j}", _rand_dna(rng, 120)) for j in range(2)]
        write_fasta(str(p), recs)
        paths.append(str(p))
    a = build_index(paths, BuildConfig(backend="native", workdir=None))
    b = build_index(paths, BuildConfig(backend="sa", workdir=None))
    assert np.array_equal(a.start, b.start)
    assert np.array_equal(a.end, b.end)
    assert np.array_equal(a.order, b.order)
    assert np.array_equal(a.rec_id, b.rec_id)


# --- colored generalized-SA path ------------------------------------------


def test_pangenome_gsa_equals_per_document_sa():
    """pangenome_ms (one colored SA per group, pivot sorted once) must equal
    the per-document SA path bit-for-bit on random multi-record pangenomes,
    across group partitions (budget floor) and thread counts."""
    from memo_tpu.index.ms import document_ms, pangenome_ms
    from memo_tpu.io.fasta import FastaRecord
    from memo_tpu.native.build import load_libms

    if load_libms() is None:
        pytest.skip("libms unavailable")
    rng = np.random.default_rng(99)
    lut = np.frombuffer(b"ACGTN", np.uint8)
    for trial in range(4):
        pivot = [
            FastaRecord(f"p{i}", lut[rng.integers(0, 5, int(rng.integers(5, 300)))])
            for i in range(int(rng.integers(1, 3)))
        ]
        docs = [
            [
                FastaRecord(f"d{j}_{r}", lut[rng.integers(0, 5, int(rng.integers(3, 250)))])
                for r in range(int(rng.integers(1, 3)))
            ]
            for j in range(int(rng.integers(1, 5)))
        ]
        want = [document_ms(pivot, d, backend="sa") for d in docs]
        for kwargs in ({}, {"jobs": 3}, {"budget_bytes": 1}):
            got = pangenome_ms(pivot, docs, **kwargs)
            for j in range(len(docs)):
                for i in range(len(pivot)):
                    assert np.array_equal(got[j][i], want[j][i]), (trial, kwargs, j, i)


def test_dollar_in_pivot_rejected(native_available):
    """A literal '$' in the pivot would let LCP extension cross unit
    terminators ('$'-freedom is the exactness precondition); ms_sa/ms_gsa
    must refuse it instead of silently inflating MS."""
    doc = [_rec("d", "ACGTACGT")]
    bad = [FastaRecord("p", np.frombuffer(b"AC$T", np.uint8).copy())]
    text = msmod.document_text(doc)
    with pytest.raises(ValueError, match="reserved"):
        msmod.sa_matching_statistics(text, bad)
    with pytest.raises(ValueError, match="reserved"):
        msmod.gsa_matching_statistics(doc, [0], 1, bad)


def test_fwd_only_conversion_and_fallback(native_available):
    """sa_matching_statistics_fwd (forward text + P/RC(P) queries) must equal
    the classic RC-text layout; inputs containing 'U' (the one non-involutive
    complement) must auto-fall back in pangenome_ms and stay exact."""
    import random

    from memo_tpu.index.ms import (
        _rc_exact,
        document_ms,
        pangenome_ms,
        sa_matching_statistics,
        sa_matching_statistics_fwd,
    )
    from memo_tpu.io.fasta import with_reverse_complements

    rng = random.Random(31)
    for trial in range(25):
        alpha = rng.choice(["AC", "ACGT", "ACGTN", "ACGTRYKM"])
        doc = [
            _rec(f"d{i}", "".join(rng.choice(alpha) for _ in range(rng.randint(0, 80))))
            for i in range(rng.randint(1, 3))
        ]
        piv = [
            _rec(f"p{i}", "".join(rng.choice(alpha) for _ in range(rng.randint(0, 60))))
            for i in range(rng.randint(1, 3))
        ]
        classic = sa_matching_statistics(
            msmod.document_text(with_reverse_complements(doc), add_rc=False), piv
        )
        fwd = sa_matching_statistics_fwd(
            msmod.document_text(doc, add_rc=False), piv
        )
        for i in range(len(piv)):
            assert np.array_equal(classic[i], fwd[i]), (trial, i)

    # 'U' forces the fallback and results still match the per-document path.
    docs_u = [[_rec("d", "ACGUUGCA")], [_rec("e", "GGUACC")]]
    piv_u = [_rec("p", "ACGUUG")]
    assert not _rc_exact(piv_u[0].seq, docs_u[0][0].seq)
    got = pangenome_ms(piv_u, docs_u)
    want = [document_ms(piv_u, d, backend="sa") for d in docs_u]
    for j in range(2):
        assert np.array_equal(got[j][0], want[j][0])


def test_gsa_scan_threads_equal(native_available):
    """Threaded per-color scans (ms_gsa_mt) == single-threaded, bit-exact."""
    import random

    rng = random.Random(12)
    units, colors = [], []
    for j in range(6):
        for r in range(rng.randint(1, 3)):
            units.append(_rec(f"u{j}_{r}", _rand_dna(rng, rng.randint(5, 120))))
            colors.append(j)
    piv = [_rec("p", _rand_dna(rng, 200))]
    a = msmod.gsa_matching_statistics(units, colors, 6, piv, scan_threads=1)
    b = msmod.gsa_matching_statistics(units, colors, 6, piv, scan_threads=4)
    for c in range(6):
        assert np.array_equal(a[c][0], b[c][0]), c


def test_pooled_build_equals_per_document_build(tmp_path):
    """build_index with pooled colored-GSA groups must produce the identical
    store as the per-document path, and its per-document cache entries must
    be interchangeable with the per-document builder's (shared resume
    state)."""
    import random

    from memo_tpu.index.builder import BuildConfig, build_index
    from memo_tpu.io.fasta import write_fasta
    from memo_tpu.native.build import load_libms

    if load_libms() is None:
        pytest.skip("libms unavailable")
    rng = random.Random(7)
    paths = []
    for i in range(5):
        p = tmp_path / f"g{i}.fa"
        recs = [_rec(f"g{i}r{j}", _rand_dna(rng, 150)) for j in range(2)]
        write_fasta(str(p), recs)
        paths.append(str(p))

    a = build_index(paths, BuildConfig(backend="sa", workdir=None, pooled=False))
    cache = tmp_path / "work"
    b = build_index(
        paths, BuildConfig(backend="sa", workdir=str(cache), pooled=True, jobs=2)
    )
    for field in ("start", "end", "order", "rec_id"):
        assert np.array_equal(getattr(a, field), getattr(b, field)), field

    # The pooled build's cache entries satisfy a per-document rebuild.
    c = build_index(
        paths, BuildConfig(backend="sa", workdir=str(cache), pooled=False)
    )
    assert np.array_equal(a.start, c.start)
    n_cache = len(list(cache.glob("ms-*.npz")))
    assert n_cache == len(paths) - 1  # one entry per non-pivot document


def test_auto_pooled_heuristic(tmp_path):
    """Auto mode pools at pangenome widths (many docs, small pivot share)
    and stays per-document for few huge documents."""
    from memo_tpu.index.builder import BuildConfig, _auto_pooled
    from memo_tpu.native.build import load_libms

    if load_libms() is None:
        pytest.skip("libms unavailable")
    docs = []
    for i in range(20):
        p = tmp_path / f"d{i}.fa"
        p.write_bytes(b"A" * 10000)
        docs.append(str(p))
    assert _auto_pooled(docs, pivot_chars=10_000, cfg=BuildConfig())
    # Two docs: below the >=3 doc floor.
    assert not _auto_pooled(docs[:2], pivot_chars=10_000, cfg=BuildConfig())
    # Explicit per-doc backends never auto-pool.
    assert not _auto_pooled(docs, 10_000, BuildConfig(backend="native"))


def test_pooled_narrow_scan_blocks_equal(native_available, monkeypatch):
    """A tiny scratch budget forces 1-2-color scan blocks (the
    chromosome-scale-pivot regime: narrow plane strides, partial-row
    stores) — results must stay bit-identical to the full-width scan."""
    import random

    rng = random.Random(31)
    piv = [_rec("p", _rand_dna(rng, 400))]
    docs = [[_rec(f"d{j}", _rand_dna(rng, 300))] for j in range(20)]
    want = msmod.pangenome_ms(piv, docs)
    monkeypatch.setenv("MEMO_TPU_GSA_SCRATCH_BYTES", "1")  # -> 1-color blocks
    got = msmod.pangenome_ms(piv, docs)
    for j in range(len(docs)):
        assert np.array_equal(got[j][0], want[j][0]), j
    # mid-width blocks too (aligned and unaligned color spans)
    monkeypatch.setenv(
        "MEMO_TPU_GSA_SCRATCH_BYTES", str(12 * (2 * 401) * 1 * 3)
    )  # -> ~3-color blocks
    got3 = msmod.pangenome_ms(piv, docs)
    for j in range(len(docs)):
        assert np.array_equal(got3[j][0], want[j][0]), j
