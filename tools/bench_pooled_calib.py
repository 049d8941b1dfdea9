"""Pooled-GSA stage calibration (VERDICT r4 weak #3 / task #3).

The bench pangenome A/B records pooled 0.9x at 33 docs x 1 Mbp while
`_auto_pooled`'s char-count model predicts 0.37x the work — so a pooled
"char" must cost ~2.4x a per-doc "char" at this shape. This harness
breaks the pooled path into its real stages (GsaGroup build = SA-IS +
Kasai LCP + col_of_row; per-color scans; RC/merge postprocessing) by
monkeypatching timers around GsaGroup, runs both arms at a configurable
shape, and prints per-stage walls + derived per-char costs. Run it on an
otherwise-idle host (2-core VM: alternate arms, median of --reps).

    python tools/bench_pooled_calib.py --docs 33 --mbp 1 --reps 3 --jobs 2
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_genomes(td: str, n_docs: int, n: int, seed: int = 12345) -> list[str]:
    rng = np.random.default_rng(seed)
    lut = np.frombuffer(b"ACGT", np.uint8)
    base = rng.integers(0, 4, n, dtype=np.uint8)
    paths = []
    for j in range(n_docs):
        seq = base
        if j:
            seq = base.copy()
            flips = rng.random(n) < 0.01
            seq[flips] = rng.integers(0, 4, int(flips.sum()), dtype=np.uint8)
        p = os.path.join(td, f"g{j}.fa")
        with open(p, "wb") as fh:
            fh.write(b">chr1\n" + lut[seq].tobytes() + b"\n")
        paths.append(p)
    return paths


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=33)
    ap.add_argument("--mbp", type=float, default=1.0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--jobs", type=int, default=2)
    args = ap.parse_args()
    n = int(args.mbp * (1 << 20))

    import memo_tpu.index.ms as M
    from memo_tpu.index.builder import BuildConfig, build_index

    stage = {"gsa_build_s": 0.0, "gsa_scan_s": 0.0, "gsa_scan_calls": 0,
             "gsa_chars": 0, "scan_colors": 0}

    class TimedGsaGroup(M.GsaGroup):
        def __init__(self, units, colors, n_colors, query_records):
            t0 = time.perf_counter()
            super().__init__(units, colors, n_colors, query_records)
            stage["gsa_build_s"] += time.perf_counter() - t0
            stage["gsa_chars"] += sum(len(u) + 1 for u in units)

        def scan(self, c0, c1, n_threads=1):
            t0 = time.perf_counter()
            out = super().scan(c0, c1, n_threads=n_threads)
            stage["gsa_scan_s"] += time.perf_counter() - t0
            stage["gsa_scan_calls"] += 1
            stage["scan_colors"] += c1 - c0
            return out

    M_orig = M.GsaGroup

    walls = {"pooled": [], "perdoc": []}
    stages_per_rep = []
    with tempfile.TemporaryDirectory() as td:
        paths = make_genomes(td, args.docs, n)
        for rep in range(args.reps):
            for mode in ("pooled", "perdoc"):
                if mode == "pooled":
                    for k in stage:
                        stage[k] = 0
                    M.GsaGroup = TimedGsaGroup
                else:
                    M.GsaGroup = M_orig
                t0 = time.perf_counter()
                build_index(
                    paths,
                    BuildConfig(
                        backend="sa", workdir=None, jobs=args.jobs,
                        pooled=(mode == "pooled"),
                    ),
                )
                walls[mode].append(time.perf_counter() - t0)
                if mode == "pooled":
                    stages_per_rep.append(dict(stage))
    M.GsaGroup = M_orig

    med = {m: statistics.median(w) for m, w in walls.items()}
    mid = sorted(range(len(stages_per_rep)),
                 key=lambda i: walls["pooled"][i])[len(stages_per_rep) // 2]
    st = stages_per_rep[mid]
    other = med["pooled"] - st["gsa_build_s"] - st["gsa_scan_s"]
    out = {
        "docs": args.docs,
        "doc_mbp": round(n / 1e6, 2),
        "jobs": args.jobs,
        "pooled_wall_s": round(med["pooled"], 2),
        "perdoc_wall_s": round(med["perdoc"], 2),
        "pooled_speedup": round(med["perdoc"] / med["pooled"], 3),
        "pooled_stages_s": {
            "gsa_build (SA-IS+Kasai+colors)": round(st["gsa_build_s"], 2),
            "gsa_scan (per-color LCP min passes)": round(st["gsa_scan_s"], 2),
            "other (IO, RC fold, max-merge, intervals)": round(other, 2),
        },
        "gsa_chars_total": st["gsa_chars"],
        "scan_calls": st["gsa_scan_calls"],
        "scan_colors": st["scan_colors"],
        "walls": {m: [round(x, 2) for x in w] for m, w in walls.items()},
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
