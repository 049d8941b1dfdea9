"""Query orchestration: interval store -> device -> conservation/membership.

Replaces the reference's single-process CPU stack (memo_query.py main,
filter_pq -> memo_init -> numba memo_query -> print_res) with:

1. host-side binary search for a candidate row range (store.window_bounds —
   the Parquet predicate-pushdown replacement),
2. a jitted device program per (window-length, interval-bucket) shape:
   dynamic-slice the device-resident store, cast/clip/shadow-cast, dense
   difference-array coverage, conservation/membership reduction
   (memo_tpu.ops.query_ops; optionally the fused Pallas kernel),
3. bit-exact text formatting (memo_tpu.query.output).

Large windows are processed in fixed-size position chunks: marking of a
position depends only on intervals covering it (proof in ops/query_ops.py),
so chunked results concatenate exactly — the same property the multi-chip
position sharding relies on (memo_tpu/parallel).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from memo_tpu.index.store import IntervalStore
from memo_tpu.utils.logging import get_logger

log = get_logger(__name__)


def _next_pow2(n: int) -> int:
    return 1 if n <= 1 else 1 << (n - 1).bit_length()


def _elementwise_min(a, b):
    import jax.numpy as jnp

    return jnp.minimum(a, b)


@dataclasses.dataclass
class QueryStats:
    """Per-query observability counters (the reference has none; SURVEY §5)."""

    candidate_intervals: int = 0
    chunks: int = 0
    positions: int = 0

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


class QueryEngine:
    """Arbitrary-k membership/conservation queries over an IntervalStore.

    backend:
      - "jax": jnp ops on the default device (TPU when present)
      - "pallas": fused Pallas TPU kernel for the coverage scan
      - "numpy": host fallback / cross-check
    """

    def __init__(
        self,
        store: IntervalStore,
        backend: str = "auto",
        chunk_positions: int | None = None,
        max_intervals_per_chunk: int | None = None,
        device_output: bool = False,
        kernel_version: str | None = None,
        stratify: bool | str = "auto",
    ):
        """``device_output=True`` keeps results on device (jax arrays, no
        host transfer) — for pipelines that feed them onward (binning, another
        kernel) or benchmarks that time device throughput.

        Chunk defaults are device-aware: on a real TPU, big position chunks
        (2M) and interval buckets (32M ~ 0.8 GB of event slices) amortize
        per-dispatch latency and measure 5-10x faster at HPRC-scale stores
        (bench.py large_store); hosts/CPU get small shapes for fast compiles
        and hermetic tests.
        """
        if store.kind not in ("conservation", "membership"):
            raise ValueError(f"bad store kind {store.kind!r}")
        self.store = store
        if backend == "auto":
            # The fused Pallas kernel is the true-completion A/B winner at
            # every measured shape on real TPUs (docs/BENCH_local_r04.json);
            # it needs Mosaic, so other platforms resolve to the XLA path.
            try:
                import jax

                backend = "pallas" if jax.default_backend() == "tpu" else "jax"
            except Exception:
                backend = "numpy"
        self.backend = backend
        # Fused-kernel generation. "v1" is the default at EVERY measured
        # shape once length stratification removes the dense dead work
        # (r5 true-sync A/B, docs/KERNEL_NOTES.md: large 43.6 vs 29.4,
        # wide 12.5 vs 12.3, kernel-only 119 vs 106 Mbp/s) — the v2
        # transposed/band kernel only approached v1 in the pre-
        # stratification ultra-dense regime that no longer reaches the
        # kernel. MEMO_TPU_PALLAS_KERNEL=v2 keeps the alternative
        # measurable round over round.
        import os as _os

        self.kernel_version = (
            kernel_version or _os.environ.get("MEMO_TPU_PALLAS_KERNEL") or "v1"
        )
        if self.kernel_version not in ("v1", "v2"):
            raise ValueError(f"unknown kernel_version {self.kernel_version!r}")
        if chunk_positions is None or max_intervals_per_chunk is None:
            on_tpu = False
            if backend in ("jax", "pallas"):
                import jax

                on_tpu = jax.default_backend() == "tpu"
            if chunk_positions is None:
                chunk_positions = (1 << 21) if on_tpu else (1 << 17)
            if max_intervals_per_chunk is None:
                max_intervals_per_chunk = (1 << 25) if on_tpu else (1 << 22)
        self.chunk_positions = int(chunk_positions)
        self.max_intervals = int(max_intervals_per_chunk)
        self.device_output = bool(device_output) and backend != "numpy"
        self.n_docs = store.n_docs
        self.last_stats = QueryStats()

        # Length stratification (r5): an interval only marks positions when
        # its length < k-1 (reference memo_query.py:49), yet the kernel pays
        # for every candidate row. Dense HPRC-like stores are ~92% invalid
        # at the default k=31 (measured on the bench large-store class), so
        # the engine partitions such stores into length buckets — each a
        # fully independent sub-engine over a sub-store — and a query only
        # dispatches buckets whose length range can contain valid intervals
        # at its k. Piece outputs combine with elementwise MIN (mark-union;
        # the _query_interval_pieces proof). Sparse stores (mostly-valid at
        # k=31) skip stratification: extra dispatches would cost more than
        # the few dead rows.
        self._children: list[tuple[int, "QueryEngine"]] | None = None
        if stratify == "auto":
            stratify = (
                backend in ("jax", "pallas")
                and store.num_intervals >= (1 << 20)
                and float(np.mean((store.end - store.start) < 30)) < 0.5
            )
        if stratify and backend in ("jax", "pallas"):
            self._init_stratified(store)
            return

        if backend in ("jax", "pallas"):
            import jax.numpy as jnp

            # Device-resident store, padded with sentinel rows (order=-1 is
            # dropped by the kernels) so dynamic_slice never clamps/shifts.
            # The pad only needs to cover the largest slice bucket, which is
            # bounded by the store size.
            pad = min(self.max_intervals, _next_pow2(max(store.num_intervals, 1)))

            def dev(a, fill):
                # Transfer the exact int32 array and pad on DEVICE: the host
                # transient is n*4 bytes, not (n+pad)*8 — a 39M-interval store
                # no longer doubles host memory per engine instance.
                return jnp.concatenate(
                    [jnp.asarray(a.astype(np.int32)), jnp.full((pad,), fill, jnp.int32)]
                )

            self._d_start = dev(store.start, 0)
            self._d_end = dev(store.end, 0)
            self._d_order = dev(store.order, -1)
            if backend == "pallas":
                # Pre-sorted event streams for the fused kernel (no per-query
                # sort — see ops/pallas_query.py).
                lay = store.query_layout()
                self._layout = lay
                self._d_end_s = dev(lay.end_sorted, 0)
                self._d_start_by_end = dev(lay.start_by_end, 0)
                self._d_order_by_end = dev(lay.order_by_end, -1)
                import jax

                # Mosaic only compiles on TPU; elsewhere run interpreted
                # (useful for hermetic kernel tests on the CPU mesh).
                self._interpret = jax.default_backend() != "tpu"
        elif backend != "numpy":
            raise ValueError(f"unknown backend {backend!r}")

    # Bucket edges: upper length bounds (exclusive). Chosen so the default
    # k=31 touches ONLY bucket 0 (len < 32 covers len < 30 exactly plus the
    # thin 30..31 shell), the k-sweep 51/101 adds one bucket, and huge-k
    # queries still prune nothing worse than the unstratified engine.
    STRATA_EDGES = (32, 128, 512, 2048)

    def _init_stratified(self, store) -> None:
        from memo_tpu.index.store import IntervalStore

        ln = np.asarray(store.end - store.start)
        b_id = np.searchsorted(np.asarray(self.STRATA_EDGES, np.int64), ln, side="right")
        children: list[tuple[int, QueryEngine]] = []
        for b in range(len(self.STRATA_EDGES) + 1):
            rows = np.flatnonzero(b_id == b)
            if rows.size == 0:
                continue
            sub = IntervalStore(
                record_names=store.record_names,
                record_lens=store.record_lens,
                n_docs=store.n_docs,
                kind=store.kind,
                rec_id=store.rec_id[rows],  # stable subset: (rec, start) order kept
                start=store.start[rows],
                end=store.end[rows],
                order=store.order[rows],
            )
            lb = 0 if b == 0 else self.STRATA_EDGES[b - 1]
            children.append(
                (
                    lb,
                    QueryEngine(
                        sub,
                        backend=self.backend,
                        chunk_positions=self.chunk_positions,
                        max_intervals_per_chunk=self.max_intervals,
                        device_output=True,
                        kernel_version=self.kernel_version,
                        stratify=False,
                    ),
                )
            )
        self._children = children

    def _query_stratified(self, record, qs, qe, k, membership):
        """Union of per-bucket marks == elementwise MIN of per-bucket
        outputs (same argument as _query_interval_pieces); buckets whose
        minimum length >= k-1 hold no valid interval and are skipped."""
        L = qe - qs
        n = self.n_docs
        stats = QueryStats(positions=L)
        acc = None
        for lb, child in self._children:
            if lb >= k - 1:
                continue  # every interval in this bucket is too long at this k
            out = child._query(record, qs, qe, k, membership)
            stats.candidate_intervals += child.last_stats.candidate_intervals
            stats.chunks += child.last_stats.chunks
            acc = out if acc is None else _elementwise_min(acc, out)
        self.last_stats = stats
        if acc is None:  # k too small for ANY stored interval: nothing marks
            import jax.numpy as jnp

            if membership:
                acc = jnp.ones((L, n), jnp.int8)
            else:
                acc = jnp.full((L,), n, jnp.int32)
        return acc if self.device_output else np.asarray(acc)

    # ------------------------------------------------------------------ public
    def conservation(self, record: str, qs: int, qe: int, k: int) -> np.ndarray:
        """int array [qe-qs] of per-position conservation values in [0, n]."""
        return self._query(record, qs, qe, k, membership=False)

    def membership(self, record: str, qs: int, qe: int, k: int) -> np.ndarray:
        """int8 array [qe-qs, n] presence/absence matrix (col 0 = pivot = 1)."""
        return self._query(record, qs, qe, k, membership=True)

    def query_region(self, region: str, k: int, membership: bool = False) -> np.ndarray:
        record, qs, qe = parse_region(region)
        return self._query(record, qs, qe, k, membership=membership)

    def conservation_batch(self, record: str, windows, k: int) -> list[np.ndarray]:
        """N windows in ONE device dispatch: an on-device ``fori_loop`` runs
        the fused kernel per window and writes into a [Q, L] output, so a
        regions-file batch pays one dispatch + one sync instead of N of
        each (~35 ms tunnel round trip per sync on this host — the
        dominant cost of small-window batches; VERDICT r4 #5). Windows are
        padded to the longest length and a pow2 window count (inert pad
        windows), keeping the compiled-program set small. Exact: the loop
        body IS the single-window kernel."""
        return self._query_batch(record, windows, k, membership=False)

    def membership_batch(self, record: str, windows, k: int) -> list[np.ndarray]:
        return self._query_batch(record, windows, k, membership=True)

    # ----------------------------------------------------------------- internals
    def _query_batch(self, record: str, windows, k: int, membership: bool):
        windows = [(int(qs), int(qe)) for qs, qe in windows]
        for qs, qe in windows:
            if qe < qs:
                raise ValueError(f"empty/negative window {qs}-{qe}")
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if not windows:
            return []
        if self._children is not None:
            accs = None
            for lb, child in self._children:
                if lb >= k - 1:
                    continue
                outs = child._query_batch(record, windows, k, membership)
                accs = (
                    outs
                    if accs is None
                    else [_elementwise_min(a, o) for a, o in zip(accs, outs)]
                )
            if accs is None:
                import jax.numpy as jnp

                n = self.n_docs
                accs = [
                    jnp.ones((qe - qs, n), jnp.int8)
                    if membership
                    else jnp.full((qe - qs,), n, jnp.int32)
                    for qs, qe in windows
                ]
            if self.device_output:
                return accs
            return [np.asarray(a) for a in accs]
        L = max((qe - qs for qs, qe in windows), default=1)
        fallback = self.backend != "pallas" or L > self.chunk_positions
        params = None
        if not fallback:
            params = [
                self._window_params(record, qs, qs + L, k) for qs, _ in windows
            ]
            count = max(max(p[1] - p[0], p[3] - p[2]) for p in params)
            if count > self.max_intervals:
                fallback = True
        if fallback:
            # Oversized windows/candidate sets (or the XLA/numpy backends):
            # per-window queries, still exact.
            outs = [self._query(record, qs, qe, k, membership) for qs, qe in windows]
            return outs
        import jax.numpy as jnp

        n = self.n_docs
        M = min(_next_pow2(max(count, 1)), self.max_intervals)
        Q = len(windows)
        Q_pad = _next_pow2(Q)
        if self.kernel_version == "v2":
            pshape = (max((n + 7) // 8 * 8, 8), 1)
        else:
            pshape = (1, max((n + 127) // 128 * 128, 128))
        mlos = np.zeros(Q_pad, np.int32)
        mhis = np.zeros(Q_pad, np.int32)
        plos = np.zeros(Q_pad, np.int32)
        phis = np.zeros(Q_pad, np.int32)
        qss = np.zeros(Q_pad, np.int32)
        prefs = np.zeros((Q_pad,) + pshape, np.int32)
        for i, ((qs, _), p) in enumerate(zip(windows, params)):
            mlos[i], mhis[i], plos[i], phis[i] = p[:4]
            qss[i] = qs
            if pshape[0] == 1:
                prefs[i, 0, :n] = p[4]
            else:
                prefs[i, :n, 0] = p[4]
        run = _batched_query_fn(
            Q_pad, M, L, n, membership, self.kernel_version, self._interpret, pshape
        )
        out = run(
            self._d_start,
            self._d_end,
            self._d_order,
            self._d_end_s,
            self._d_start_by_end,
            self._d_order_by_end,
            jnp.asarray(mlos),
            jnp.asarray(mhis),
            jnp.asarray(plos),
            jnp.asarray(phis),
            jnp.asarray(qss),
            jnp.asarray(prefs),
            jnp.int32(k),
        )
        self.last_stats = QueryStats(
            candidate_intervals=int(
                sum(max(p[1] - p[0], p[3] - p[2]) for p in params)
            ),
            chunks=Q,
            positions=sum(qe - qs for qs, qe in windows),
        )
        outs = [out[i, : qe - qs] for i, (qs, qe) in enumerate(windows)]
        if self.device_output:
            return outs
        host = np.asarray(out)
        return [host[i, : qe - qs] for i, (qs, qe) in enumerate(windows)]

    def _window_params(self, record: str, qs: int, qe: int, k: int):
        """Host-side kernel parameters for one window (candidate ranges in
        the two sorted streams + the position-0 prefix counts)."""
        st = self.store
        lay = self._layout
        L = qe - qs
        r = st.record_index(record)
        rec_lo, rec_hi = int(st.rec_offsets[r]), int(st.rec_offsets[r + 1])
        seg_s = st.start[rec_lo:rec_hi]
        seg_e = lay.end_sorted[rec_lo:rec_hi]
        mlo = rec_lo + int(np.searchsorted(seg_s, qs, side="right"))
        mhi = rec_lo + int(np.searchsorted(seg_s, qs + L, side="left"))
        plo = rec_lo + int(np.searchsorted(seg_e, qs + k - 1, side="right"))
        phi = rec_lo + int(np.searchsorted(seg_e, qs + L + k - 1, side="left"))
        prefix = lay.prefix_counts(st, r, qs, k)
        return mlo, mhi, plo, phi, prefix

    def _query(self, record: str, qs: int, qe: int, k: int, membership: bool) -> np.ndarray:
        if qe < qs:
            raise ValueError(f"empty/negative region {record}:{qs}-{qe}")
        if k < 1:
            raise ValueError(f"k must be >= 1, got {k}")
        if self._children is not None:
            return self._query_stratified(record, qs, qe, k, membership)
        L_total = qe - qs
        n = self.n_docs
        stats = QueryStats(positions=L_total)
        outputs: list[np.ndarray] = []
        for c_qs in range(qs, qe, self.chunk_positions):
            c_qe = min(c_qs + self.chunk_positions, qe)
            outputs.append(self._query_chunk(record, c_qs, c_qe, k, membership, stats))
            stats.chunks += 1
        self.last_stats = stats
        if self.device_output:
            import jax.numpy as jnp

            if not outputs:
                return jnp.zeros((0, n), jnp.int8) if membership else jnp.zeros(0, jnp.int32)
            return jnp.concatenate(outputs, axis=0) if len(outputs) > 1 else outputs[0]
        if membership:
            return (
                np.concatenate(outputs, axis=0)
                if outputs
                else np.zeros((0, n), np.int8)
            )
        return np.concatenate(outputs) if outputs else np.zeros(0, np.int64)

    def _cat(self, left, right):
        if self.device_output:
            import jax.numpy as jnp

            return jnp.concatenate([left, right], axis=0)
        return np.concatenate([left, right], axis=0)

    def _query_chunk(
        self, record: str, qs: int, qe: int, k: int, membership: bool, stats: QueryStats
    ) -> np.ndarray:
        if self.backend == "pallas":
            return self._query_chunk_pallas(record, qs, qe, k, membership, stats)
        lo, hi = self.store.window_bounds(record, qs, qe, k)
        count = hi - lo
        L = qe - qs
        n = self.n_docs

        if self.backend == "numpy":
            from memo_tpu.ops import query_ops as Q

            stats.candidate_intervals += count
            s = self.store.start[lo:hi]
            e = self.store.end[lo:hi]
            o = self.store.order[lo:hi]
            marks = Q.coverage_marks_np(s, e, o, qs, k, L, n)
            return Q.membership_np(marks) if membership else Q.conservation_np(marks, n)

        # jax path: pad candidate count to a bucket for jit reuse.
        M = min(_next_pow2(max(count, 1)), self.max_intervals)
        if count > M:
            # More candidates than the bucket cap: fall back to smaller
            # position chunks (halving preserves exactness). Candidates are
            # counted at dispatch points only (the recursion re-derives them).
            mid = (qs + qe) // 2
            if mid == qs:
                return self._query_interval_pieces(
                    record, qs, qe, k, membership, lo, hi, stats
                )
            left = self._query_chunk(record, qs, mid, k, membership, stats)
            right = self._query_chunk(record, mid, qe, k, membership, stats)
            return self._cat(left, right)

        stats.candidate_intervals += count
        return self._run_device_range(record, qs, k, membership, lo, M, L)

    def _run_device_range(
        self, record: str, qs: int, k: int, membership: bool, lo: int, M: int, L: int
    ):
        r = self.store.record_index(record)
        rec_end = int(self.store.rec_offsets[r + 1])
        import jax.numpy as jnp

        run = _device_query_fn(M, L, self.n_docs, membership, False)
        out = run(
            self._d_start,
            self._d_end,
            self._d_order,
            jnp.int32(lo),
            jnp.int32(rec_end),
            jnp.int32(qs),
            jnp.int32(k),
        )
        return out if self.device_output else np.asarray(out)

    def _query_interval_pieces(
        self,
        record: str,
        qs: int,
        qe: int,
        k: int,
        membership: bool,
        lo: int,
        hi: int,
        stats: QueryStats,
    ):
        """Pathological fallback: more covering intervals on a single position
        than the bucket cap. Coverage is additive over interval subsets (each
        subset's diff-array counts are non-negative), so marks distribute as a
        union — combine per-piece outputs with elementwise MIN (conservation:
        min marked order; membership: AND of presence)."""
        L = qe - qs
        M = self.max_intervals
        acc = None
        for piece_lo in range(lo, hi, M):
            # Keep --stats honest on exactly the pathological queries where
            # observability matters most: each piece is a real dispatch.
            stats.candidate_intervals += min(piece_lo + M, hi) - piece_lo
            stats.chunks += 1
            out = self._run_device_range(record, qs, k, membership, piece_lo, M, L)
            if acc is None:
                acc = out
            elif self.device_output:
                import jax.numpy as jnp

                acc = jnp.minimum(acc, out)
            else:
                acc = np.minimum(acc, out)
        return acc

    def _query_chunk_pallas(
        self, record: str, qs: int, qe: int, k: int, membership: bool, stats: QueryStats
    ) -> np.ndarray:
        """Fused-kernel chunk: exact in-window event ranges from the two
        pre-sorted streams + host prefix counts (ops/pallas_query.py)."""
        import jax.numpy as jnp

        from memo_tpu.ops.pallas_query import kernel_constants_for, memo_query_pallas

        st = self.store
        lay = self._layout
        L = qe - qs
        n = self.n_docs
        r = st.record_index(record)
        rec_lo, rec_hi = int(st.rec_offsets[r]), int(st.rec_offsets[r + 1])
        seg_s = st.start[rec_lo:rec_hi]
        seg_e = lay.end_sorted[rec_lo:rec_hi]
        mlo = rec_lo + int(np.searchsorted(seg_s, qs, side="right"))
        mhi = rec_lo + int(np.searchsorted(seg_s, qs + L, side="left"))
        plo = rec_lo + int(np.searchsorted(seg_e, qs + k - 1, side="right"))
        phi = rec_lo + int(np.searchsorted(seg_e, qs + L + k - 1, side="left"))
        count = max(mhi - mlo, phi - plo)

        M = min(_next_pow2(max(count, 1)), self.max_intervals)
        if count > M:
            mid = (qs + qe) // 2
            if mid == qs:
                # Single position over the cap: accumulate over interval
                # pieces via the dense-jax program (the kernel's dual event
                # streams don't partition by interval subset).
                lo, hi = st.window_bounds(record, qs, qe, k)
                return self._query_interval_pieces(
                    record, qs, qe, k, membership, lo, hi, stats
                )
            left = self._query_chunk_pallas(record, qs, mid, k, membership, stats)
            right = self._query_chunk_pallas(record, mid, qe, k, membership, stats)
            return self._cat(left, right)
        stats.candidate_intervals += count
        if self.kernel_version == "v2":
            from memo_tpu.ops.pallas_query_v2 import (
                kernel_constants_v2,
                memo_query_pallas_v2,
            )

            tile, ev_rows = kernel_constants_v2(M, L)
            C_sub = max((n + 7) // 8 * 8, 8)
            prefix = np.zeros((C_sub, 1), np.int32)
            prefix[:n, 0] = lay.prefix_counts(st, r, qs, k)
            out = memo_query_pallas_v2(
                self._d_start,
                self._d_end,
                self._d_order,
                self._d_end_s,
                self._d_start_by_end,
                self._d_order_by_end,
                jnp.asarray(prefix),
                jnp.int32(mlo),
                jnp.int32(mhi),
                jnp.int32(plo),
                jnp.int32(phi),
                jnp.int32(qs),
                jnp.int32(k),
                M=M,
                L=L,
                C=n,
                n_docs=n,
                membership=membership,
                interpret=self._interpret,
                tile=tile,
                ev_rows=ev_rows,
            )
            return out if self.device_output else np.asarray(out)
        # Tile/DMA-row constants by event density: M is the pow2 bucket the
        # candidate count landed in, so the compiled-program set stays small.
        tile, ev_rows = kernel_constants_for(M, L)

        C_pad = max((n + 127) // 128 * 128, 128)
        prefix = np.zeros((1, C_pad), np.int32)
        prefix[0, :n] = lay.prefix_counts(st, r, qs, k)
        out = memo_query_pallas(
            self._d_start,
            self._d_end,
            self._d_order,
            self._d_end_s,
            self._d_start_by_end,
            self._d_order_by_end,
            jnp.asarray(prefix),
            jnp.int32(mlo),
            jnp.int32(mhi),
            jnp.int32(plo),
            jnp.int32(phi),
            jnp.int32(qs),
            jnp.int32(k),
            M=M,
            L=L,
            C=n,
            n_docs=n,
            membership=membership,
            interpret=self._interpret,
            tile=tile,
            ev_rows=ev_rows,
        )
        return out if self.device_output else np.asarray(out)


@functools.lru_cache(maxsize=32)
def _batched_query_fn(
    Q: int,
    M: int,
    L: int,
    n: int,
    membership: bool,
    kernel_version: str,
    interpret: bool,
    pshape: tuple,
):
    """One compiled N-window program per (count, bucket, window, mode) shape:
    an on-device fori_loop dispatches the fused kernel per window and packs
    the outputs — one host dispatch + one sync for the whole batch."""
    import jax
    import jax.numpy as jnp

    if kernel_version == "v2":
        from memo_tpu.ops.pallas_query_v2 import (
            kernel_constants_v2 as _kc,
            memo_query_pallas_v2 as _kern,
        )
    else:
        from memo_tpu.ops.pallas_query import (
            kernel_constants_for as _kc,
            memo_query_pallas as _kern,
        )
    tile, rows = _kc(M, L)

    @jax.jit
    def run(ds, de, do, des, dsbe, dobe, mlos, mhis, plos, phis, qss, prefs, k):
        init = (
            jnp.zeros((Q, L, n), jnp.int8)
            if membership
            else jnp.zeros((Q, L), jnp.int32)
        )

        def body(i, acc):
            out = _kern(
                ds,
                de,
                do,
                des,
                dsbe,
                dobe,
                jax.lax.dynamic_slice(
                    prefs, (i,) + (0,) * len(pshape), (1,) + pshape
                )[0],
                mlos[i],
                mhis[i],
                plos[i],
                phis[i],
                qss[i],
                k,
                M=M,
                L=L,
                C=n,
                n_docs=n,
                membership=membership,
                interpret=interpret,
                tile=tile,
                ev_rows=rows,
            )
            if membership:
                return jax.lax.dynamic_update_slice(acc, out[None], (i, 0, 0))
            return jax.lax.dynamic_update_slice(
                acc, out[None].astype(jnp.int32), (i, 0)
            )

        return jax.lax.fori_loop(0, Q, body, init)

    return run


@functools.lru_cache(maxsize=256)
def _device_query_fn(M: int, L: int, n: int, membership: bool, use_pallas: bool = False):
    """One compiled device program per (bucket, window, mode) shape."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from memo_tpu.ops import query_ops as Q

    @jax.jit
    def run(d_start, d_end, d_order, lo, rec_end, qs, k):
        s = lax.dynamic_slice(d_start, (lo,), (M,))
        e = lax.dynamic_slice(d_end, (lo,), (M,))
        o = lax.dynamic_slice(d_order, (lo,), (M,))
        # Rows past the record boundary belong to another record's coordinate
        # space; mask them out (rows past `hi` but before the boundary clip to
        # empty and are harmless — see query_ops).
        idx = lo + jnp.arange(M, dtype=jnp.int32)
        o = jnp.where(idx < rec_end, o, -1)
        marks = Q.coverage_marks(s, e, o, qs, k, L=L, C=n)
        if membership:
            return Q.membership_from_marks(marks)
        return Q.conservation_from_marks(marks, n)

    return run


def parse_region(region: str) -> tuple[str, int, int]:
    """Parse ``chr:start-end`` (0-indexed half-open, reference query.sh:24)."""
    record, _, start_end = region.rpartition(":")
    if not record:
        raise ValueError(f"bad region {region!r}, expected chr:start-end")
    start_s, _, end_s = start_end.partition("-")
    return record, int(start_s), int(end_s)
