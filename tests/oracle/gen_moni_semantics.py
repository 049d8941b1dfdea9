#!/usr/bin/env python3
"""Generate (or regenerate) the MONI `.lengths` semantics goldens.

The reference delegates all matching-statistics compute to MONI
(reference index.sh:69-76): for each non-pivot genome it builds
``g.w_rc`` = seqtk-normalized records + reverse complements, appends a
literal ``$`` to every sequence line, runs ``moni build`` / ``moni ms -p
PIVOT``, and consumes the resulting ``.lengths`` file (FASTA-like: one
header + one line of space-separated per-position match lengths per pivot
record, verticalized at index.sh:79).

MONI itself cannot be built in this environment (its source is not vendored
in /root/reference — the reference Dockerfile:22-28 clones it from GitHub,
and this environment has no network egress). This script therefore encodes
MONI's *documented* semantics as executable goldens:

  ms[p] = length of the longest prefix of PIVOT_RECORD[p:] that occurs as a
          substring of the indexed text (doc records + RCs, '$'-terminated)

with the parity-critical corner cases pinned explicitly:

  * multi-record pivots: each pivot FASTA record is an independent query —
    matches never continue across pivot record boundaries, and the
    .lengths file carries one entry per record in input order;
  * multi-record documents: the literal '$' terminators prevent matches
    from spanning document records (or a record and its RC);
  * reverse complements: the indexed text contains every record's RC
    (samtools faidx -i, index.sh:64), so reverse-strand matches count;
  * N / ambiguous bases: matching is byte-literal — 'N' matches 'N' and
    nothing else;
  * case: matching is byte-literal — the reference pipeline (seqtk seq -S,
    samtools faidx -i, sed) never changes case, so soft-masked lowercase
    text only matches lowercase.

The expected lengths are computed here with a brute-force O(n*m) scan that
shares no code with memo_tpu (tests/test_moni_semantics.py then checks every
memo_tpu MS backend against the frozen bytes).

Regenerating against REAL MONI: on a machine with the reference toolchain
(build per /root/reference/Dockerfile:22-28, or any `moni` >= the author's
fork), run

    python tests/oracle/gen_moni_semantics.py --moni /path/to/moni

and the goldens are rewritten from actual `moni build`/`moni ms` output
bytes (the w_rc prep is reproduced exactly as index.sh:63-65 does it). Any
divergence from the brute-force semantics above would then show up as a
test failure — that is the point of keeping the generator checked in.
"""

from __future__ import annotations

import argparse
import pathlib
import subprocess
import sys
import tempfile

OUT_DIR = pathlib.Path(__file__).resolve().parents[1] / "data" / "moni_semantics"

COMPLEMENT = str.maketrans(
    "ACGTacgtNnRYKMrykmSsWwBbVvDdHh", "TGCAtgcaNnYRMKyrmkSsWwVvBbHhDd"
)


def revcomp(seq: str) -> str:
    return seq.translate(COMPLEMENT)[::-1]


def parse_fasta(text: str) -> list[tuple[str, str]]:
    records: list[tuple[str, str]] = []
    name, chunks = None, []
    for line in text.splitlines():
        if line.startswith(">"):
            if name is not None:
                records.append((name, "".join(chunks)))
            name, chunks = line[1:].split()[0], []
        elif line.strip():
            chunks.append(line.strip())
    if name is not None:
        records.append((name, "".join(chunks)))
    return records


def w_rc_units(doc_records: list[tuple[str, str]]) -> list[str]:
    """The '$'-terminated text units of a .w_rc file (index.sh:63-65):
    original records first, then every record's reverse complement."""
    seqs = [s for _, s in doc_records]
    return [s + "$" for s in seqs] + [revcomp(s) + "$" for s in seqs]


def brute_ms(pivot: str, units: list[str]) -> list[int]:
    """Longest prefix of pivot[p:] occurring in any single unit (the '$'
    inside units never matches pivot text, so per-unit search == search of
    the concatenated text)."""
    m = len(pivot)
    out = []
    for p in range(m):
        best = 0
        for u in units:
            while best < m - p and pivot[p : p + best + 1] in u:
                best += 1
        out.append(best)
    return out


def lengths_text(pivot_records: list[tuple[str, str]], units: list[str]) -> str:
    """MONI .lengths file shape: '>name' + space-separated ints per record."""
    parts = []
    for name, seq in pivot_records:
        parts.append(">" + name + "\n" + " ".join(map(str, brute_ms(seq, units))) + "\n")
    return "".join(parts)


# ---------------------------------------------------------------- fixtures
# Sequences are original to this repo (not copied from the reference).

CASES: dict[str, tuple[str, str]] = {
    # Forward-strand matches of varying length, single records.
    "basic": (
        ">piv\nGATTACAGATTACACCGGT\n",
        ">doc\nTTGATTACATT\n",
    ),
    # Pivot record 2 starts with the suffix of record 1's best match: if
    # records were concatenated, ms at the end of record 1 would overshoot.
    "multi_record_pivot": (
        ">p1\nACGTACGT\n>p2\nACGTTTTT\n",
        ">doc\nACGTACGTACGTTTTT\n",
    ),
    # The pivot contains doc_rec1+doc_rec2 glued together: matches must stop
    # at the '$' between document records.
    "multi_record_doc": (
        ">piv\nAAAACCCCGGGG\n",
        ">d1\nAAAACC\n>d2\nCCGGGG\n",
    ),
    # The pivot only matches the reverse complement of the document.
    "rc_match": (
        ">piv\nAAGGCCTTAGT\n",
        ">doc\nACTAAGGCCTT\n",
    ),
    # N is byte-literal: pivot NN region matches the doc's NN run only.
    "n_bases": (
        ">piv\nACGNNACGT\n",
        ">doc\nTTACGNNACTT\n",
    ),
    # Case is byte-literal: soft-masked doc matches only same-case pivot text.
    "lowercase": (
        ">piv\nACGTacgtACGT\n",
        ">doc\nggACGTacGTtt\n",
    ),
    # IUPAC ambiguity codes beyond N are byte-literal on the forward strand
    # AND complement correctly on the reverse strand (R<->Y, K<->M, S/W
    # self, B<->V, D<->H — the samtools faidx -i table, index.sh:64): the
    # pivot's RYSWKM run only matches the doc's RC of its YRSWMK run.
    "iupac_codes": (
        ">piv\nACRYSWKMBDHVGT\n",
        ">doc\nTTKMSWRYGGAC\n",
    ),
    # Degenerate record lengths: 1-bp pivot records, a 1-bp doc record, and
    # a pivot record SHORTER than the doc's matching run (the k-overshoot
    # regime: ms is clamped by the record's remaining length, never beyond).
    "tiny_records": (
        ">p1\nA\n>p2\nTG\n>p3\nACG\n",
        ">d1\nA\n>d2\nACGTACGT\n",
    ),
    # Empty records: a zero-length pivot record (header with no sequence)
    # contributes an empty .lengths row; a zero-length doc record indexes
    # as a bare '$' unit and matches nothing.
    "empty_records": (
        ">p1\n>p2\nACGT\n",
        ">d1\n>d2\nACGTT\n",
    ),
    # EVERY pivot record is a proper substring of a document record, so
    # every ms value is clamped by its record's remaining length (the
    # k-overshoot-at-record-end regime, VERDICT r3 #8): each row must read
    # len(rec), len(rec)-1, ..., 1 — never the longer document match.
    "short_pivot_every_match_overshoots": (
        ">p1\nCCGGTT\n>p2\nGTTAAC\n>p3\nAC\n",
        ">doc\nAACCGGTTAACCGGTTAA\n",
    ),
    # Document records that are exact substrings of each other (nested and
    # repeated): the automaton/SA dedup of shared suffixes must not change
    # max-match semantics, and the '$' of the short record must not
    # truncate matches inside the long one.
    "nested_substring_doc_records": (
        ">piv\nTAGGCATAGGCA\n",
        ">d1\nGGTAGGCATAGGCAGG\n>d2\nTAGGCATAGGCA\n>d3\nGCATAG\n>d4\nTAGGCATAGGCA\n",
    ),
    # Pivot N-runs LONGER than whole document records: byte-literal N
    # matching caps at the longest doc N-run; the run also spans the
    # boundary where a doc record is shorter than the remaining run.
    "pivot_n_run_longer_than_records": (
        ">piv\nACNNNNNNNNNNNNGT\n",
        ">d1\nNNNN\n>d2\nANNNNNC\n>d3\nGT\n",
    ),
}


def _random_case(seed: int = 20260820, n: int = 1000) -> tuple[str, str]:
    """Randomized 1 kbp case with genome-like shared splices (seeded — the
    golden bytes are frozen; regeneration is deterministic)."""
    import random

    rng = random.Random(seed)
    alpha = "ACGT"
    doc = [rng.choice(alpha) for _ in range(n)]
    piv = [rng.choice(alpha) for _ in range(n)]
    for _ in range(12):  # shared segments, some reverse-complemented
        ln = rng.randint(8, 120)
        src = rng.randint(0, n - ln)
        dst = rng.randint(0, n - ln)
        seg = "".join(doc[src : src + ln])
        if rng.random() < 0.4:
            seg = revcomp(seg)
        piv[dst : dst + ln] = list(seg)
    piv[rng.randint(0, n - 1)] = "N"
    return (
        ">piv\n" + "".join(piv) + "\n",
        ">doc\n" + "".join(doc) + "\n",
    )


CASES["random_1kbp"] = _random_case()


def write_goldens_bruteforce() -> None:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    for name, (pivot_fa, doc_fa) in CASES.items():
        d = OUT_DIR / name
        d.mkdir(exist_ok=True)
        (d / "pivot.fa").write_text(pivot_fa)
        (d / "doc.fa").write_text(doc_fa)
        golden = lengths_text(parse_fasta(pivot_fa), w_rc_units(parse_fasta(doc_fa)))
        (d / "expected.lengths").write_text(golden)
        print(f"{name}: wrote {len(golden)} golden bytes (brute force)")


def write_goldens_moni(moni: str) -> None:
    """Rewrite goldens from real `moni build` + `moni ms` output, preparing
    the .w_rc exactly like reference index.sh:63-65."""
    for name, (pivot_fa, doc_fa) in CASES.items():
        d = OUT_DIR / name
        with tempfile.TemporaryDirectory() as td:
            tdp = pathlib.Path(td)
            (tdp / "pivot.fa").write_text(pivot_fa)
            recs = parse_fasta(doc_fa)
            w_rc = "".join(
                f">{n}\n{s}$\n" for n, s in recs
            ) + "".join(f">{n}/rc\n{revcomp(s)}$\n" for n, s in recs)
            (tdp / "doc.w_rc").write_text(w_rc)
            subprocess.run(
                [moni, "build", "-r", str(tdp / "doc.w_rc"), "-f", "-o", str(tdp / "doc.w_rc")],
                check=True,
            )
            subprocess.run(
                [moni, "ms", "-i", str(tdp / "doc.w_rc"), "-p", str(tdp / "pivot.fa"),
                 "-o", str(tdp / "doc.w_rc")],
                check=True,
            )
            golden = (tdp / "doc.w_rc.lengths").read_text()
        (d / "expected.lengths").write_text(golden)
        print(f"{name}: wrote {len(golden)} golden bytes (real MONI)")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--moni", help="path to a real `moni` binary; if given, goldens "
                    "are regenerated from its actual output bytes")
    args = ap.parse_args()
    if args.moni:
        write_goldens_moni(args.moni)
    else:
        write_goldens_bruteforce()
    return 0


if __name__ == "__main__":
    sys.exit(main())
