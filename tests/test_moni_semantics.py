"""MONI `.lengths` semantics goldens (VERDICT r1 item 2).

The reference's entire string-indexing layer is `moni build`/`moni ms`
(reference index.sh:69-76). Real MONI cannot be built here (source not
vendored; no network egress — see tests/oracle/gen_moni_semantics.py, which
documents the attempt and regenerates these goldens from actual MONI output
bytes when a `moni` binary is available). These tests pin the `.lengths`
semantics the pipeline depends on, as frozen fixture bytes:

  * multi-record pivots are independent queries (no cross-record matches),
    one .lengths entry per record in input order;
  * '$' terminators stop matches at document record (and RC) boundaries;
  * reverse complements are part of the indexed text;
  * N and case are byte-literal.

Every memo_tpu MS backend must reproduce the frozen bytes exactly.
"""

from __future__ import annotations

import pathlib
import subprocess
import sys

import numpy as np
import pytest

from memo_tpu.index.ms import document_ms
from memo_tpu.io.fasta import read_fasta

DATA = pathlib.Path(__file__).parent / "data" / "moni_semantics"
CASES = sorted(p.name for p in DATA.iterdir() if p.is_dir())
GEN = pathlib.Path(__file__).parent / "oracle" / "gen_moni_semantics.py"


def _lengths_text(case: str, backend: str) -> str:
    pivot = read_fasta(DATA / case / "pivot.fa")
    doc = read_fasta(DATA / case / "doc.fa")
    # Byte-literal (MONI) semantics: no case normalization anywhere —
    # document_ms is called directly, as matching_statistics(uppercase=False)
    # would.
    if backend in ("gsa", "gsa_rc_text"):
        from memo_tpu.index.ms import pangenome_ms

        cols = pangenome_ms(pivot, [doc], fwd_only=None if backend == "gsa" else False)[0]
    else:
        cols = document_ms(pivot, doc, backend=backend)
    return "".join(
        f">{r.name}\n" + " ".join(map(str, c.tolist())) + "\n"
        for r, c in zip(pivot, cols)
    )


@pytest.mark.parametrize("case", CASES)
@pytest.mark.parametrize("backend", ["python", "native", "sa", "gsa", "gsa_rc_text"])
def test_lengths_goldens(case: str, backend: str):
    if backend != "python":
        from memo_tpu.native.build import load_libms

        if load_libms() is None:
            pytest.skip("libms unavailable")
    golden = (DATA / case / "expected.lengths").read_text()
    assert _lengths_text(case, backend) == golden


def test_goldens_match_generator():
    """The frozen fixture bytes are exactly what the checked-in generator
    produces — so a future regeneration against real MONI either confirms
    them or fails loudly here."""
    before = {c: (DATA / c / "expected.lengths").read_bytes() for c in CASES}
    subprocess.run([sys.executable, str(GEN)], check=True, capture_output=True)
    after = {c: (DATA / c / "expected.lengths").read_bytes() for c in CASES}
    assert before == after


def test_uppercase_normalization_is_a_deliberate_divergence():
    """The default pipeline (BuildConfig.uppercase=True) uppercases pivot and
    documents before MS — soft-masked runs then match. MONI parity mode is
    uppercase=False (byte-literal), which the `lowercase` golden pins."""
    from memo_tpu.index.ms import matching_statistics

    pivot = read_fasta(DATA / "lowercase" / "pivot.fa")
    doc = read_fasta(DATA / "lowercase" / "doc.fa")
    literal = matching_statistics(pivot, [doc], uppercase=False)[0][:, 0]
    folded = matching_statistics(pivot, [doc], uppercase=True)[0][:, 0]
    # Byte-literal: the matches stop at case flips (golden: 6 5 4 3 2 1 ...).
    assert literal.tolist() == [6, 5, 4, 3, 2, 1, 6, 5, 4, 3, 2, 1]
    # Case-folded: the 8-mer ACGTACGT straddling the doc's case flips matches.
    assert folded.tolist() == [8, 7, 6, 5, 8, 7, 6, 5, 4, 3, 2, 1]
