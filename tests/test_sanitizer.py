"""ASAN/UBSAN build of libms, exercised for real (SURVEY §5 sanitizer row).

MEMO_TPU_ASAN=1 makes memo_tpu.native.build compile libms with
``-fsanitize=address,undefined``. A sanitized .so aborts unless the ASAN
runtime is loaded first, so the exercise runs in a subprocess with
LD_PRELOAD pointing at the toolchain's libasan/libubsan (leak detection is
off — CPython itself "leaks" at interpreter exit by design).

The subprocess drives every exported libms entry point (automaton build +
query, SA-IS matching statistics, the streaming overlap extractor) on
random inputs and asserts against the naive oracle — a sanitizer hit
aborts with a non-zero exit and the report lands in captured stderr.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

import pytest

_EXERCISE = r"""
import numpy as np
from memo_tpu.native.build import load_libms, build_error
lib = load_libms()
assert lib is not None, f"sanitized libms failed to load: {build_error()}"

from memo_tpu.index.intervals import mem_overlap_intervals
from memo_tpu.index.ms import (
    MatchingStatisticsIndex,
    naive_matching_statistics,
    sa_matching_statistics,
)
from memo_tpu.io.fasta import FastaRecord

rng = np.random.default_rng(7)
lut = np.frombuffer(b"ACGT", np.uint8)
for trial in range(3):
    n_doc, n_piv = int(rng.integers(200, 4000)), int(rng.integers(100, 1500))
    doc = bytes(lut[rng.integers(0, 4, n_doc)]) + b"$"
    piv = bytes(lut[rng.integers(0, 4, n_piv)])
    want = naive_matching_statistics(piv, [doc[:-1]])

    idx = MatchingStatisticsIndex(doc, backend="native")
    assert idx.backend == "native"
    assert np.array_equal(idx.query(piv), want), "automaton vs oracle"
    del idx

    cols = sa_matching_statistics(doc, [FastaRecord("p", np.frombuffer(piv, np.uint8))])
    assert np.array_equal(cols[0], want), "SA-IS vs oracle"

    ms = rng.integers(0, 40, (int(rng.integers(50, 500)), 3)).astype(np.int32)
    mem_overlap_intervals(ms, ms.shape[0])  # C streaming overlap pass

    # colored generalized-SA path
    from memo_tpu.index.ms import pangenome_ms

    docs = [
        [FastaRecord(f"d{j}", np.frombuffer(bytes(lut[rng.integers(0, 4, 300)]), np.uint8))]
        for j in range(3)
    ]
    pivr = [FastaRecord("p", np.frombuffer(piv[:500], np.uint8))]
    got = pangenome_ms(pivr, docs)
    for j, d in enumerate(docs):
        w = naive_matching_statistics(
            pivr[0].seq.tobytes(),
            [d[0].seq.tobytes(), bytes(reversed(d[0].seq.tobytes().translate(
                bytes.maketrans(b"ACGT", b"TGCA"))))],
        )
        assert np.array_equal(got[j][0], w), f"gsa vs oracle doc {j}"
print("sanitized libms OK")
"""


def _lib(name: str) -> str | None:
    try:
        p = subprocess.run(
            ["g++", f"-print-file-name={name}"], capture_output=True, text=True, check=True
        ).stdout.strip()
    except (OSError, subprocess.CalledProcessError):
        return None
    return p if os.path.isabs(p) and os.path.exists(p) else None


def test_libms_under_asan_ubsan(tmp_path):
    if shutil.which("g++") is None:
        pytest.skip("no C++ toolchain")
    asan, ubsan = _lib("libasan.so"), _lib("libubsan.so")
    if not asan or not ubsan:
        pytest.skip("sanitizer runtimes not found")
    env = dict(os.environ)
    env.update(
        {
            "MEMO_TPU_ASAN": "1",
            "LD_PRELOAD": f"{asan}:{ubsan}",
            "ASAN_OPTIONS": "detect_leaks=0,abort_on_error=1",
            "UBSAN_OPTIONS": "halt_on_error=1",
            "JAX_PLATFORMS": "cpu",
            # fresh cache dir so the sanitized .so never shadows the normal one
            "MEMO_TPU_CACHE": str(tmp_path),
        }
    )
    proc = subprocess.run(
        [sys.executable, "-c", _EXERCISE],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, f"sanitizer run failed:\n{proc.stdout}\n{proc.stderr}"
    assert "sanitized libms OK" in proc.stdout
    assert "AddressSanitizer" not in proc.stderr
    assert "runtime error" not in proc.stderr  # UBSAN report marker
