"""Property-based parity against the live reference implementation.

Random DAPs are pushed through BOTH pipelines:

  reference: dap.txt -> dap_to_bed.py -> parquet -> memo_query.py   (subprocess)
  ours:      MS array -> store_from_ms -> QueryEngine               (in-process)

and the BED index bytes and query output bytes must match exactly.
Skipped when /root/reference is not mounted.
"""

import io
import pathlib

import numpy as np
import pytest

from memo_tpu.index.builder import store_from_ms
from memo_tpu.io import compat
from memo_tpu.query.engine import QueryEngine
from memo_tpu.query.output import format_conservation, format_membership

from tests.oracle import runner

pytestmark = [
    pytest.mark.oracle,
    pytest.mark.skipif(not runner.available(), reason="reference repo not mounted"),
]


def _compare_case(tmp_path, ms_by_record, names_lens, region, k, n, membership, backend):
    bed_ref, out_ref = runner.full_query(
        tmp_path, ms_by_record, names_lens, region, k, n, membership
    )
    kind = "membership" if membership else "conservation"
    store = store_from_ms(
        [np.asarray(m) for m in ms_by_record],
        [nm for nm, _ in names_lens],
        [ln for _, ln in names_lens],
        n_docs=n,
        kind=kind,
    )
    buf = io.BytesIO()
    compat.write_bed(store, buf)
    assert buf.getvalue() == bed_ref, "BED index bytes differ"

    eng = QueryEngine(store, backend=backend)
    record = region.split(":")[0]
    qs, qe = map(int, region.split(":")[1].split("-"))
    if membership:
        ours = format_membership(np.asarray(eng.membership(record, qs, qe, k)))
    else:
        ours = format_conservation(np.asarray(eng.conservation(record, qs, qe, k)))
    assert ours == out_ref, "query output bytes differ"


def test_golden_dap_conservation(tmp_path):
    ms = np.array([[3, 2, 1], [2, 1, 5], [1, 4, 4], [5, 3, 3], [4, 2, 2]])
    _compare_case(tmp_path, [ms], [("chrA", 5)], "chrA:0-5", 3, 4, False, "numpy")


def test_golden_dap_membership(tmp_path):
    ms = np.array([[3, 2, 1], [2, 1, 5], [1, 4, 4], [5, 3, 3], [4, 2, 2]])
    _compare_case(tmp_path, [ms], [("chrA", 5)], "chrA:0-5", 3, 4, True, "numpy")


@pytest.mark.parametrize("seed", range(8))
@pytest.mark.parametrize("membership", [False, True])
def test_random_dap_parity(tmp_path, seed, membership):
    rng = np.random.default_rng(seed)
    n_rec = int(rng.integers(1, 3))
    D = int(rng.integers(1, 6))
    ms_by_record = []
    names_lens = []
    for r in range(n_rec):
        P = int(rng.integers(3, 60))
        # skewed distribution: plenty of 0s and long runs
        ms = rng.integers(0, rng.integers(2, 25), size=(P, D)).astype(np.int64)
        ms_by_record.append(ms)
        names_lens.append((f"rec{r}", P))
    rec = int(rng.integers(0, n_rec))
    P = names_lens[rec][1]
    qs = int(rng.integers(0, P))
    qe = int(rng.integers(qs + 1, P + 1))
    k = int(rng.integers(1, 12))
    _compare_case(
        tmp_path,
        ms_by_record,
        names_lens,
        f"rec{rec}:{qs}-{qe}",
        k,
        D + 1,
        membership,
        "jax" if seed % 2 else "numpy",
    )


@pytest.mark.parametrize("k", [1, 2, 3, 5, 21])
def test_k_sweep_parity(tmp_path, k):
    rng = np.random.default_rng(99)
    ms = rng.integers(0, 30, size=(80, 4)).astype(np.int64)
    _compare_case(tmp_path, [ms], [("c", 80)], "c:10-70", k, 5, False, "jax")
