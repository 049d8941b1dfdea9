"""The MEMO-TPU index: an HBM-friendly sorted struct-of-arrays interval store.

Replaces the reference's on-disk BED -> ZSTD Parquet index
(reference parquet_compress_bed.py:16-39) with in-memory int arrays sorted by
(record, start), ready to be placed on device. Window extraction becomes a
``searchsorted`` over a composite (record, start) key instead of Parquet
predicate pushdown (reference memo_query.py:19-36).

Compat importers/exporters for the reference's BED and Parquet formats are in
:mod:`memo_tpu.io.compat` — this module is the native format (.npz).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np

_MAGIC = "memo-tpu-interval-store-v1"


@dataclass
class IntervalStore:
    """Sorted MEM-overlap interval index over a pivot genome.

    ``kind`` is "conservation" (order-MEMs, reference index.sh:96-102) or
    "membership" (per-document MEMs, index.sh:88-93). ``order`` columns are
    1-based: document j+1 for membership, j-th largest MS for conservation.
    """

    record_names: list[str]
    record_lens: np.ndarray  # int64[R]
    n_docs: int  # total genomes in the pangenome INCLUDING the pivot
    kind: str  # "conservation" | "membership"
    rec_id: np.ndarray  # int32[M]
    start: np.ndarray  # int64[M]  (BED f1)
    end: np.ndarray  # int64[M]  (BED f2)
    order: np.ndarray  # int32[M] (BED f3)
    rec_offsets: np.ndarray = field(default=None)  # int64[R+1]
    max_interval_len: np.ndarray = field(default=None)  # int64[R]

    def __post_init__(self):
        self.record_lens = np.asarray(self.record_lens, np.int64)
        self.rec_id = np.asarray(self.rec_id, np.int32)
        self.start = np.asarray(self.start, np.int64)
        self.end = np.asarray(self.end, np.int64)
        self.order = np.asarray(self.order, np.int32)
        if self.rec_offsets is None:
            self.rec_offsets = self._compute_offsets()
        else:
            self.rec_offsets = np.asarray(self.rec_offsets, np.int64)
        if self.max_interval_len is None:
            self.max_interval_len = self._compute_max_len()
        else:
            self.max_interval_len = np.asarray(self.max_interval_len, np.int64)

    # ------------------------------------------------------------------ core
    @property
    def num_records(self) -> int:
        return len(self.record_names)

    @property
    def num_intervals(self) -> int:
        return int(self.start.shape[0])

    def _compute_offsets(self) -> np.ndarray:
        counts = np.bincount(self.rec_id, minlength=self.num_records)
        return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)

    def _compute_max_len(self) -> np.ndarray:
        out = np.zeros(self.num_records, np.int64)
        lens = self.end - self.start
        for r in range(self.num_records):
            lo, hi = self.rec_offsets[r], self.rec_offsets[r + 1]
            if hi > lo:
                out[r] = lens[lo:hi].max()
        return out

    def record_index(self, name: str) -> int:
        try:
            return self.record_names.index(name)
        except ValueError:
            raise KeyError(f"record {name!r} not in index ({self.record_names})") from None

    def window_bounds(self, record: str, qs: int, qe: int, k: int) -> tuple[int, int]:
        """Row range [lo, hi) guaranteed to contain every interval relevant to
        query window [qs, qe) at k-mer size k.

        The reference's Parquet filters select rows with
        (f1<=qs & f2>qs) | (qs<f1<qe+k) (memo_query.py:22-28). Any superset is
        output-equivalent because out-of-window rows clip to empty
        (memo_query.py:46-49) — so we take f1 in [qs - max_interval_len, qe+k),
        a contiguous run of the sorted store found by binary search.
        """
        r = self.record_index(record)
        lo0, hi0 = int(self.rec_offsets[r]), int(self.rec_offsets[r + 1])
        seg = self.start[lo0:hi0]
        lo = lo0 + int(np.searchsorted(seg, qs - int(self.max_interval_len[r]), side="left"))
        hi = lo0 + int(np.searchsorted(seg, qe + k, side="left"))
        return lo, hi

    # ------------------------------------------------------------- serialization
    def save(self, path: str | os.PathLike) -> None:
        meta = {
            "magic": _MAGIC,
            "record_names": self.record_names,
            "n_docs": self.n_docs,
            "kind": self.kind,
        }
        np.savez_compressed(
            path,
            meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
            record_lens=self.record_lens,
            rec_id=self.rec_id,
            start=self.start,
            end=self.end,
            order=self.order,
            rec_offsets=self.rec_offsets,
            max_interval_len=self.max_interval_len,
        )

    @classmethod
    def load(cls, path: str | os.PathLike) -> "IntervalStore":
        with np.load(path) as z:
            meta = json.loads(z["meta"].tobytes().decode())
            if meta.get("magic") != _MAGIC:
                raise ValueError(f"{path}: not a memo-tpu interval store")
            return cls(
                record_names=list(meta["record_names"]),
                record_lens=z["record_lens"],
                n_docs=int(meta["n_docs"]),
                kind=meta["kind"],
                rec_id=z["rec_id"],
                start=z["start"],
                end=z["end"],
                order=z["order"],
                rec_offsets=z["rec_offsets"],
                max_interval_len=z["max_interval_len"],
            )

    # ------------------------------------------------------------------ misc
    def stats(self) -> dict:
        return {
            "records": self.num_records,
            "intervals": self.num_intervals,
            "n_docs": self.n_docs,
            "kind": self.kind,
            "bytes": int(
                self.rec_id.nbytes + self.start.nbytes + self.end.nbytes + self.order.nbytes
            ),
        }
