#!/usr/bin/env python3
"""A/B harness for the pooled colored-GSA matching-statistics path.

Times pangenome_ms (pooled) and the per-document document_ms loop on the
same synthetic pangenome (1% divergence per doc), median-of-3 per arm, and
verifies the results are identical. The libms .so cache is keyed by source
hash, so editing libms.cpp and re-running measures the new code.

    PYTHONPATH=. python tools/bench_pooled_ab.py [n_docs] [doc_mbp] [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

import numpy as np

from memo_tpu.index.ms import document_ms, pangenome_ms
from memo_tpu.io.fasta import FastaRecord


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 33
    n = int(float(sys.argv[2]) * 1e6) if len(sys.argv) > 2 else 1_000_000
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    rng = np.random.default_rng(1)
    lut = np.frombuffer(b"ACGT", np.uint8)
    base = rng.integers(0, 4, n, dtype=np.uint8)
    piv = [FastaRecord("p", lut[base].copy())]
    docs = []
    for j in range(n_docs - 1):
        mut = base.copy()
        flips = rng.random(n) < 0.01
        mut[flips] = rng.integers(0, 4, int(flips.sum()), dtype=np.uint8)
        docs.append([FastaRecord(f"d{j}", lut[mut].copy())])

    total_mbp = (n_docs - 1) * n / 1e6
    walls = {"pooled": [], "perdoc": []}
    results = {}
    for _ in range(reps):
        for mode in ("pooled", "perdoc"):
            t0 = time.perf_counter()
            if mode == "pooled":
                out = pangenome_ms(piv, docs, jobs=2)
            else:
                # Mirror the builder's per-doc arm: 2 worker threads across
                # documents (index/builder.py build_index jobs path).
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=2) as pool:
                    out = list(
                        pool.map(lambda d: document_ms(piv, d, backend="sa"), docs)
                    )
            walls[mode].append(time.perf_counter() - t0)
            if mode not in results:
                results[mode] = out
    same = all(
        np.array_equal(results["pooled"][j][0], results["perdoc"][j][0])
        for j in range(n_docs - 1)
    )
    med = {m: statistics.median(w) for m, w in walls.items()}
    print(
        f"C={n_docs} doc={n/1e6:.1f}Mbp reps={reps}  "
        f"pooled {med['pooled']:.2f}s ({total_mbp/med['pooled']:.2f} Mbp/s)  "
        f"perdoc {med['perdoc']:.2f}s ({total_mbp/med['perdoc']:.2f} Mbp/s)  "
        f"speedup {med['perdoc']/med['pooled']:.2f}x  identical={same}"
    )
    print("walls:", {m: [round(x, 2) for x in w] for m, w in walls.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
