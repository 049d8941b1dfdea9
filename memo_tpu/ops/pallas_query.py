"""Fused Pallas TPU kernel for the MEMO query.

The query's hot transform is "interval set -> per-position absence marks ->
conservation/membership" (reference memo_query.py:42-71). The dense XLA
formulation (ops/query_ops.py) pays for a serialized scatter; the first
Pallas version paid for a per-query argsort of the event set. This kernel
eliminates both with three observations:

1. **Shadow casting preserves order.** The query-time transforms are
   ``st = start - qs`` and ``ce = end - qs - (k-1)`` — rank-preserving in
   ``start`` and ``end`` respectively. So the interval store pre-sorts its
   rows once by start AND (via a permutation) by end, and every (qs, k)
   query reads two already-sorted event streams: −1 events at ``st`` in
   start order, +1 events at ``ce`` in end order. No per-query sort.

2. **Out-of-window events are a prefix count.** Coverage at window position
   p is ``#{valid i: ce_i <= p} − #{valid i: st_i <= p}``. Events left of
   the window contribute the constant ``prefix[c] = #{i: ce_i <= 0 < st_i}``
   (validity is implied), which the host computes with a handful of
   searchsorteds (store.QueryLayout). Events right of the window contribute
   nothing. The kernel therefore touches ONLY in-window events.

3. **The ragged scan is dense matrix work.** Each grid step owns a TILE of
   positions; its event slice (found by searchsorted of tile boundaries into
   the sorted streams) is DMA'd HBM->VMEM in (8, 512) blocks and folded in
   as one-hot matmuls on the MXU:

       A[T, E] = (tile_position >= event_position)   # step functions
       B[C, E] = delta * onehot(event_column)
       coverage += A @ B.T                            # bf16 in, f32 acc

   Running coverage carries across tiles through a VMEM scratch (the
   previous tile's last row). Rows of a block with no in-range events are
   skipped with pl.when. bf16 operands are exact here: entries are 0/±1.

The reduction to output happens in-kernel (coverage never round-trips to
HBM): conservation = min(first marked column, n) per position
(== reference argmax-with-sentinel, memo_query.py:70), membership =
NOT marked as int8 (memo_query.py:67-68).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Kernel tile constants are chosen PER QUERY by event density (on-chip
# sweeps on the v5e, two rounds each, repo-root CLAUDE.md has the method):
# sparse windows (~1-2 events/position, the whole-genome conservation case)
# run ~20% faster at small tiles, dense HPRC-width stores (tens of
# events/position) at wide DMA rows. MEMO_TPU_PALLAS_TILE / _EV_ROWS force a
# fixed pair for sweeps; bench.py records the pair the headline used.
# Events per HBM row. 512 is the shipped default; MEMO_TPU_PALLAS_EV_LANES
# overrides for sweeps (the step/one-hot operand construction scales with
# T x lanes, so narrower rows trade less per-fold VPU work against more
# fold dispatches — see docs/KERNEL_NOTES.md r5 ledger).
EV_LANES = int(os.environ.get("MEMO_TPU_PALLAS_EV_LANES", "512"))
SPARSE_TILE_ROWS = (256, 16)  # measured best, headline config (2.2M intervals)
DENSE_TILE_ROWS = (512, 8)  # measured best, large_store config (75M intervals)
DENSE_EVENTS_PER_POS = 8  # stream events per window position at the switch

_ENV_TILE = os.environ.get("MEMO_TPU_PALLAS_TILE")
_ENV_ROWS = os.environ.get("MEMO_TPU_PALLAS_EV_ROWS")
# Timing-only lab probe (tools/kernel_lab.py --nodma): compile the kernel
# with every event-block DMA removed, so the wall isolates compute from HBM
# traffic. Results are GARBAGE in this mode — never set it outside the lab.
_LAB_SKIP_DMA = os.environ.get("MEMO_TPU_PALLAS_LAB_SKIP_DMA") == "1"


def kernel_constants_for(n_events: int, length: int) -> tuple[int, int]:
    """(tile, ev_rows) for a window of ``length`` positions whose larger
    event stream holds ``n_events`` events."""
    auto = (
        DENSE_TILE_ROWS
        if n_events >= DENSE_EVENTS_PER_POS * max(length, 1)
        else SPARSE_TILE_ROWS
    )
    if _ENV_TILE or _ENV_ROWS:
        # A half-set pair keeps the density-selected value for the unset
        # variable, so single-variable sweeps hold the other constant at
        # what the query would have used anyway.
        tile = int(_ENV_TILE) if _ENV_TILE else auto[0]
        rows = int(_ENV_ROWS) if _ENV_ROWS else auto[1]
    else:
        tile, rows = auto
    if tile % 8 or tile < 8 or rows % 8 or rows < 8:
        raise ValueError("TILE and EV_ROWS must be positive multiples of 8")
    return tile, rows


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_kernel(n_docs: int, membership: bool, ev_rows: int):
    EV_ROWS = ev_rows
    EV_CHUNK = EV_ROWS * EV_LANES
    def kernel(
        offm_ref,  # (nt+1,) scalar prefetch: minus-stream event offsets per tile
        offp_ref,  # (nt+1,) scalar prefetch: plus-stream event offsets per tile
        pos_m,  # HBM (rows, EV_LANES) int32: minus event positions (sorted)
        val_m,  # HBM (rows, EV_LANES) int32: column+1, 0 = inert
        pos_p,  # HBM: plus event positions (sorted)
        val_p,
        prefix_ref,  # VMEM (1, C_pad) int32: coverage entering position 0
        out_ref,  # (TILE, 1) int32 conservation | (TILE, C_pad) int8 membership
        pos_m_buf,  # VMEM (EV_ROWS, EV_LANES) int32 scratch, minus stream
        val_m_buf,
        pos_p_buf,  # plus-stream pair (separate so cached blocks survive the
        val_p_buf,  # other stream's loads)
        sem,  # DMA semaphores (2,)
        cov_ref,  # VMEM (TILE, C_pad) f32: coverage accumulator
        carry,  # VMEM (1, C_pad) f32: running coverage across tiles
        blk_cache,  # SMEM (2,) int32: first row of the block each stream holds
    ):
        t = pl.program_id(0)
        T, C = cov_ref.shape
        base = t * T

        @pl.when(t == 0)
        def _():
            carry[...] = prefix_ref[...].astype(jnp.float32)
            blk_cache[0] = -1
            blk_cache[1] = -1

        cov_ref[...] = jnp.broadcast_to(carry[0:1, :], (T, C))

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, EV_LANES), 1)
        pos_iota = jax.lax.broadcasted_iota(jnp.int32, (T, EV_LANES), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (C, EV_LANES), 0)

        for s_idx, (sign, off_ref, pos_hbm, val_hbm, pos_buf, val_buf) in enumerate((
            (-1.0, offm_ref, pos_m, val_m, pos_m_buf, val_m_buf),
            (1.0, offp_ref, pos_p, val_p, pos_p_buf, val_p_buf),
        )):
            lo = off_ref[t]
            hi = off_ref[t + 1]
            blk_lo = lo // EV_CHUNK
            # hi==lo must yield 0 chunks: with pad-free event arrays a dummy
            # chunk at lo==n_events would DMA past the last row.
            n_chunks = jnp.where(hi > lo, pl.cdiv(hi, EV_CHUNK) - blk_lo, 0)

            def chunk_body(i, _, lo=lo, hi=hi, blk_lo=blk_lo, sign=sign,
                           pos_hbm=pos_hbm, val_hbm=val_hbm, s_idx=s_idx,
                           pos_buf=pos_buf, val_buf=val_buf):
                row0 = pl.multiple_of((blk_lo + i) * EV_ROWS, EV_ROWS)

                # Consecutive tiles usually need the SAME event block (an
                # average tile holds far fewer events than a block); per-
                # stream VMEM block caching skips the redundant DMAs — the
                # dominant HBM traffic at sparse-event shapes.
                if not _LAB_SKIP_DMA:

                    @pl.when(blk_cache[s_idx] != row0)
                    def _(row0=row0):
                        cp_p = pltpu.make_async_copy(
                            pos_hbm.at[pl.ds(row0, EV_ROWS), :], pos_buf, sem.at[0]
                        )
                        cp_v = pltpu.make_async_copy(
                            val_hbm.at[pl.ds(row0, EV_ROWS), :], val_buf, sem.at[1]
                        )
                        cp_p.start()
                        cp_v.start()
                        cp_p.wait()
                        cp_v.wait()
                        blk_cache[s_idx] = row0

                for j in range(EV_ROWS):
                    row_first = (row0 + j) * EV_LANES

                    @pl.when((row_first < hi) & (row_first + EV_LANES > lo))
                    def _(j=j, row_first=row_first):
                        e_idx = row_first + lane
                        in_range = (e_idx >= lo) & (e_idx < hi)
                        p_local = pos_buf[j : j + 1, :] - base  # (1, E)
                        v = val_buf[j : j + 1, :]
                        live = in_range & (v > 0)
                        # Build 0/±1 operands in f32 and downcast: Mosaic
                        # cannot relayout i1 masks straight into bf16 tiles.
                        delta = jnp.where(live, sign, 0.0)  # (1, E) f32
                        col = v - 1
                        # A[p, e] = 1 iff event e at or before tile position p.
                        a = jnp.where(pos_iota >= p_local, 1.0, 0.0).astype(
                            jnp.bfloat16
                        )  # (T, E)
                        b = jnp.where(col_iota == col, delta, 0.0).astype(
                            jnp.bfloat16
                        )  # (C, E)
                        cov_ref[...] = cov_ref[...] + jax.lax.dot_general(
                            a,
                            b,
                            dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )

                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        # Every event of this tile affects its last position: the last row IS
        # the running coverage entering the next tile.
        carry[...] = cov_ref[T - 1 : T, :]

        marked = cov_ref[...] > 0.5
        if membership:
            out_ref[...] = jnp.where(marked, 0, 1).astype(jnp.int8)
        else:
            cols = jax.lax.broadcasted_iota(jnp.int32, (T, C), 1)
            vals = jnp.where(marked, cols, jnp.int32(n_docs))
            out_ref[...] = jnp.min(vals, axis=1, keepdims=True)

    return kernel


def _to_event_rows(pos, val, l_pad: int, ev_chunk: int):
    """Pad 1-D event arrays to [rows, EV_LANES] with inert tail events."""
    n = pos.shape[0]
    rows = _round_up(max(n, 1), ev_chunk) // EV_LANES
    pad = rows * EV_LANES - n
    pos = jnp.concatenate([pos, jnp.full((pad,), l_pad, jnp.int32)]).reshape(
        rows, EV_LANES
    )
    val = jnp.concatenate([val, jnp.zeros((pad,), jnp.int32)]).reshape(rows, EV_LANES)
    return pos, val


@functools.partial(
    jax.jit,
    static_argnames=("M", "L", "C", "n_docs", "membership", "interpret", "tile", "ev_rows"),
)
def memo_query_pallas(
    d_start,  # device store, start order: start / end / order (int32, padded)
    d_end,
    d_order,
    d_end_s,  # device store, end order: end / start / order (int32, padded)
    d_start_by_end,
    d_order_by_end,
    prefix,  # (1, C_pad) int32 coverage entering window position 0
    mlo,  # minus-stream candidate rows [mlo, mhi): start in (qs, qs+L)
    mhi,
    plo,  # plus-stream candidate rows [plo, phi): end in (qs+k-1, qs+L+k-1)
    phi,
    qs,
    k,
    *,
    M: int,  # static candidate bucket (>= max stream count)
    L: int,  # static window length
    C: int,  # static column count (= n_docs)
    n_docs: int,
    membership: bool,
    interpret: bool = False,
    tile: int = 256,
    ev_rows: int = 16,
):
    """One query window, fused: returns int32[L] conservation values or
    int8[L, C] membership. Candidate ranges and prefix come from the host
    (IntervalStore.query_layout); (tile, ev_rows) from
    :func:`kernel_constants_for`; see module docstring for the math."""
    TILE = tile
    EV_ROWS = ev_rows
    EV_CHUNK = EV_ROWS * EV_LANES
    L_pad = _round_up(max(L, 1), TILE)
    C_pad = _round_up(max(C, 1), 128)
    nt = L_pad // TILE
    idx = jnp.arange(M, dtype=jnp.int32)

    # Minus stream: −1 at st = start − qs, start order. In-range rows have
    # st in (0, L); masked tail rows park at L_pad (keeps the array sorted).
    s = jax.lax.dynamic_slice(d_start, (mlo,), (M,))
    e_al = jax.lax.dynamic_slice(d_end, (mlo,), (M,))
    o = jax.lax.dynamic_slice(d_order, (mlo,), (M,))
    live = idx < (mhi - mlo)
    pos_m = jnp.where(live, s - qs, jnp.int32(L_pad))
    ok = live & (e_al - s < k - 1) & (o >= 0) & (o < C)
    val_m = jnp.where(ok, o + 1, 0)

    # Plus stream: +1 at ce = end − qs − (k−1), end order.
    e2 = jax.lax.dynamic_slice(d_end_s, (plo,), (M,))
    s2 = jax.lax.dynamic_slice(d_start_by_end, (plo,), (M,))
    o2 = jax.lax.dynamic_slice(d_order_by_end, (plo,), (M,))
    live2 = idx < (phi - plo)
    pos_p = jnp.where(live2, e2 - qs - (k - 1), jnp.int32(L_pad))
    ok2 = live2 & (e2 - s2 < k - 1) & (o2 >= 0) & (o2 < C)
    val_p = jnp.where(ok2, o2 + 1, 0)

    boundaries = jnp.arange(nt + 1, dtype=jnp.int32) * TILE
    offm = jnp.searchsorted(pos_m, boundaries, side="left").astype(jnp.int32)
    offp = jnp.searchsorted(pos_p, boundaries, side="left").astype(jnp.int32)
    pos_m, val_m = _to_event_rows(pos_m, val_m, L_pad, EV_CHUNK)
    pos_p, val_p = _to_event_rows(pos_p, val_p, L_pad, EV_CHUNK)

    if membership:
        out_shape = jax.ShapeDtypeStruct((L_pad, C_pad), jnp.int8)
        out_specs = pl.BlockSpec((TILE, C_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((L_pad, 1), jnp.int32)
        out_specs = pl.BlockSpec((TILE, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            # Event streams stay in HBM; the kernel DMAs aligned 8-row blocks.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, C_pad), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((EV_ROWS, EV_LANES), jnp.int32),  # minus pos block
            pltpu.VMEM((EV_ROWS, EV_LANES), jnp.int32),  # minus val block
            pltpu.VMEM((EV_ROWS, EV_LANES), jnp.int32),  # plus pos block
            pltpu.VMEM((EV_ROWS, EV_LANES), jnp.int32),  # plus val block
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((TILE, C_pad), jnp.float32),
            pltpu.VMEM((1, C_pad), jnp.float32),
            pltpu.SMEM((2,), jnp.int32),  # cached block id per stream
        ],
    )
    n_rows = pos_m.shape[0] + pos_p.shape[0]
    out = pl.pallas_call(
        _make_kernel(n_docs, membership, EV_ROWS),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (nt + n_rows // EV_ROWS) * TILE * C_pad * EV_CHUNK,
            bytes_accessed=n_rows * EV_LANES * 8 + L_pad * (C_pad if membership else 4),
            transcendentals=0,
        ),
    )(offm, offp, pos_m, val_m, pos_p, val_p, prefix)
    if membership:
        return out[:L, :C]
    return out[:L, 0]
