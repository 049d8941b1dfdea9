"""Run the reference MEMO Python stages as a black-box oracle.

The reference repo (read-only at /root/reference) is executed via subprocess
— its code is never imported or copied. A numba stub is injected on
PYTHONPATH because numba is not installed (the jitted loop runs as plain
Python, which is fine at test sizes). Tests using this must be marked
``oracle`` and skip when the reference is absent.
"""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

import numpy as np

REFERENCE_SRC = pathlib.Path("/root/reference/src")
_STUBS = pathlib.Path(__file__).resolve().parent / "numba_stub"


def available() -> bool:
    return REFERENCE_SRC.exists()


def _run(script: str, args: list[str], **kw) -> subprocess.CompletedProcess:
    env = dict(os.environ)
    env["PYTHONPATH"] = str(_STUBS) + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.run(
        [sys.executable, str(REFERENCE_SRC / script), *args],
        check=True,
        capture_output=True,
        env=env,
        **kw,
    )


_PLOTNINE_STUB = pathlib.Path(__file__).resolve().parent / "plotnine_stub"


def preprocess_data(cons_path: pathlib.Path, n_docs: int, n_bins: int) -> np.ndarray:
    """Execute the reference's REAL preprocess_data (plot_conservation.py:46-65)
    on a conservation text file, through the plotnine import stub (plotnine is
    not installed; only inert plot-spec objects go through it — the pandas
    binning math runs for real). Returns the melted dataframe as a float
    array of (bin, order, value) rows, already filtered of order == n."""
    env = dict(os.environ)
    env["PYTHONPATH"] = (
        str(_PLOTNINE_STUB) + os.pathsep + str(_STUBS) + os.pathsep + env.get("PYTHONPATH", "")
    )
    env.setdefault("MPLBACKEND", "Agg")
    code = (
        "import sys; sys.path.insert(0, sys.argv[1])\n"
        "import plot_conservation as pc\n"
        "df = pc.preprocess_data(sys.argv[2], int(sys.argv[3]), int(sys.argv[4]))\n"
        "for b, o, v in df.itertuples(index=False):\n"
        "    print(f'{b} {o} {v!r}')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code, str(REFERENCE_SRC), str(cons_path), str(n_docs), str(n_bins)],
        check=True,
        capture_output=True,
        text=True,
        env=env,
    )
    rows = [line.split() for line in proc.stdout.splitlines() if line.strip()]
    return np.array([[float(a), float(b), float(c)] for a, b, c in rows])


def write_dap(ms_by_record: list[np.ndarray], path: pathlib.Path) -> None:
    """dap.txt rows: ``pos ms_g2 ms_g3 ...`` (reference index.sh:83)."""
    with open(path, "w") as out:
        pos = 0
        for ms in ms_by_record:
            for row in np.asarray(ms).tolist():
                out.write(" ".join(map(str, [pos] + list(row))) + "\n")
                pos += 1


def write_fai(records: list[tuple[str, int]], path: pathlib.Path) -> None:
    """Minimal .fai (only name/length are read by dap_to_bed.parse_fai)."""
    with open(path, "w") as out:
        off = 0
        for name, length in records:
            out.write(f"{name}\t{length}\t{off}\t{length}\t{length+1}\n")
            off += length + len(name) + 3


def dap_to_bed(
    dap_path: pathlib.Path, fai_path: pathlib.Path, order: bool, overlap: bool = True
) -> bytes:
    args = ["--mem", "--fai", str(fai_path), "--dap", str(dap_path)]
    if order:
        args.insert(1, "--order")
    if overlap:
        args.insert(1, "--overlap")
    return _run("dap_to_bed.py", args).stdout


def bed_to_parquet(bed_path: pathlib.Path, pq_path: pathlib.Path) -> None:
    _run("parquet_compress_bed.py", ["-f", str(bed_path), "-o", str(pq_path)])


def memo_query(
    pq_path: pathlib.Path,
    region: str,
    k: int,
    n: int,
    out_path: pathlib.Path,
    membership: bool = False,
) -> bytes:
    args = [
        "-b", str(pq_path),
        "-r", region,
        "-k", str(k),
        "-n", str(n),
        "-o", str(out_path),
    ]
    if membership:
        args.append("-m")
    _run("memo_query.py", args)
    return out_path.read_bytes()


def full_query(
    tmpdir: pathlib.Path,
    ms_by_record: list[np.ndarray],
    record_names_lens: list[tuple[str, int]],
    region: str,
    k: int,
    n: int,
    membership: bool,
) -> tuple[bytes, bytes]:
    """DAP -> BED -> Parquet -> query via the reference; returns
    (bed_bytes, output_bytes)."""
    dap = tmpdir / "dap.txt"
    fai = tmpdir / "pivot.fa.fai"
    bed = tmpdir / "idx.bed"
    pq = tmpdir / "idx.parquet"
    out = tmpdir / "out.txt"
    write_dap(ms_by_record, dap)
    write_fai(record_names_lens, fai)
    bed_bytes = dap_to_bed(dap, fai, order=not membership)
    bed.write_bytes(bed_bytes)
    bed_to_parquet(bed, pq)
    out_bytes = memo_query(pq, region, k, n, out, membership)
    return bed_bytes, out_bytes
