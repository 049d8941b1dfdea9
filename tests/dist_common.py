"""Shared fixture for the two-process distributed test: a deterministic
store + window batch that every process reconstructs identically (the
multi-controller contract — same program, same host data, sharded arrays)."""

from __future__ import annotations

import numpy as np

from memo_tpu.index.builder import store_from_ms

K = 5
N_DOCS = 6
PIVOT_LEN = 1 << 10
WIN = 1 << 8


def build_fixture_store(n_windows: int = PIVOT_LEN // WIN):
    """``n_windows`` must be a multiple of the mesh's dp size (window batches
    shard over dp); windows wrap around the pivot when more are asked for
    than fit."""
    rng = np.random.default_rng(1234)
    ms = rng.integers(0, 30, (PIVOT_LEN, N_DOCS - 1)).astype(np.int32)
    # enforce the MS law ms[p] <= ms[p+1] + 1 so the store is genome-shaped
    idx = np.arange(PIVOT_LEN, dtype=np.int64)[:, None]
    ms = (np.minimum.accumulate((ms + idx)[::-1])[::-1] - idx).astype(np.int32)
    store = store_from_ms([ms], ["chr1"], [PIVOT_LEN], N_DOCS, "conservation")
    slots = PIVOT_LEN // WIN
    windows = [
        ("chr1", (i % slots) * WIN, (i % slots) * WIN + WIN) for i in range(n_windows)
    ]
    return store, windows, K


def gather_windows(store, windows, k, mesh):
    """Padded [W, M] candidate arrays (ShardedQuery._gather, standalone so
    the worker does not need a mesh-bound ShardedQuery for host-side prep)."""
    rows = []
    for record, qs, qe in windows:
        lo, hi = store.window_bounds(record, qs, qe, k)
        r = store.record_index(record)
        hi = min(hi, int(store.rec_offsets[r + 1]))
        rows.append((lo, hi))
    n_sp = mesh.shape["sp"]
    m_needed = max(hi - lo for lo, hi in rows)
    M = (max(m_needed, n_sp) + n_sp - 1) // n_sp * n_sp
    W = len(windows)
    starts = np.zeros((W, M), np.int32)
    ends = np.zeros((W, M), np.int32)
    orders = np.full((W, M), -1, np.int32)
    for i, (lo, hi) in enumerate(rows):
        m = hi - lo
        starts[i, :m] = store.start[lo:hi]
        ends[i, :m] = store.end[lo:hi]
        orders[i, :m] = store.order[lo:hi]
    qs = np.asarray([s for _, s, _ in windows], np.int32)
    L = max(qe - qs_ for _, qs_, qe in windows)
    return starts, ends, orders, qs, L
