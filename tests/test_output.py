"""Output-formatting byte contracts (reference memo_query.py:65-71)."""

import numpy as np

from memo_tpu.query.output import format_conservation, format_membership


def _naive_conservation(values) -> bytes:
    # The reference's print(*rec, sep='\n') bytes (memo_query.py:70-71).
    return b"".join(str(int(v)).encode() + b"\n" for v in values)


def test_format_conservation_matches_naive_random():
    rng = np.random.default_rng(3)
    for vmax in (1, 5, 9, 10, 42, 99, 100, 1234):
        vals = rng.integers(0, vmax + 1, 4097)
        assert format_conservation(vals) == _naive_conservation(vals), vmax


def test_format_conservation_edges():
    assert format_conservation(np.zeros(0, np.int64)) == b""
    assert format_conservation(np.array([0])) == b"0\n"
    assert format_conservation(np.array([10, 0, 9, 100, 1])) == b"10\n0\n9\n100\n1\n"
    # negative values never occur in query output; fallback stays correct
    assert format_conservation(np.array([-1, 3])) == b"-1\n3\n"


def test_format_conservation_large_is_fast():
    # 8M values in well under a second normally (the old per-value loop took
    # ~10 s/8M; a whole chromosome is 128M). Bound is generous because this
    # 2-core host shows +-30% noise under concurrent pytest (CLAUDE.md); best
    # of 2 guards against a single descheduling spike.
    import time

    vals = np.random.default_rng(0).integers(0, 90, 1 << 23)
    dt = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = format_conservation(vals)
        dt = min(dt, time.perf_counter() - t0)
    assert out.endswith(b"\n") and dt < 4.0


def test_format_membership_bytes():
    mat = np.array([[1, 0, 1], [0, 1, 1]], np.int8)
    assert format_membership(mat) == b"1 0 1\n0 1 1\n"
