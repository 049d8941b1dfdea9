#!/usr/bin/env python3
"""A/B harness for libms SA-IS matching-statistics throughput.

Times ms_sa on a genome-like (1% divergence) doc+RC+pivot layout at a given
size — the exact per-document workload of the index builder. Run from the
repo root on an otherwise-idle host:

    python tests/oracle/bench_sais_ab.py [mbp]

Compares nothing by itself; run it once per libms variant (the .so cache is
keyed by source hash, so editing libms.cpp and re-running measures the new
code) and diff the printed numbers.
"""

from __future__ import annotations

import sys
import time

import numpy as np

from memo_tpu.index.ms import document_text, sa_matching_statistics
from memo_tpu.io.fasta import FastaRecord, with_reverse_complements


def main() -> int:
    n = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 8_000_000
    rng = np.random.default_rng(1)
    lut = np.frombuffer(b"ACGT", np.uint8)
    base = rng.integers(0, 4, n, dtype=np.uint8)
    piv = [FastaRecord("p", lut[base].copy())]
    mut = base.copy()
    flips = rng.random(n) < 0.01
    mut[flips] = rng.integers(0, 4, int(flips.sum()), dtype=np.uint8)
    doc = FastaRecord("d", lut[mut].copy())
    text = document_text(with_reverse_complements([doc]), add_rc=False)
    chars = (len(text) + n) / 1e6
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        cols = sa_matching_statistics(text, piv)
        best = min(best, time.perf_counter() - t0)
    print(
        f"ms_sa {chars:.0f}M chars: {best:.2f}s  "
        f"{chars / best:.2f} Mchar/s  doc={n / 1e6:.0f} Mbp "
        f"({n / best / 1e6:.2f} doc-Mbp/s)  mean_ms={float(cols[0].mean()):.1f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
