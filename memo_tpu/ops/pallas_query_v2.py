"""Fused Pallas TPU query kernel, v2 — transposed layout + band folds.

Same math contract as ops/pallas_query.py (v1): two pre-sorted event
streams (−1 at st = start−qs in start order, +1 at ce = end−qs−(k−1) in end
order), per-tile running coverage, conservation = min marked column
(reference memo_query.py:57-71 semantics, bit-exact). What changed and why
— the r5 kernel-only measurement (tools/kernel_lab.py, docs/KERNEL_NOTES.md)
showed the wall is VPU *operand construction*, not DMA (a no-DMA compile of
v1 ran within 2% of the real one) and not the MXU: every 512-event row
folded as a matmul first builds a (TILE, 512) step matrix A and a
(C_pad=128·k, 512) one-hot matrix B on the VPU, ~3 element-ops each —
3·T·E per row dominates at every measured shape. v2 attacks exactly that:

1. **C lives on sublanes, not lanes.** Coverage is (C_sub, TILE) with
   C_sub = round_up(n_docs, 8). At the headline width (n=16) every
   C-dimension operand/accumulate shrinks 8x vs the old C_pad=128 lanes;
   wide stores (C=90 -> 96, C=160 -> 160) stop paying lane round-up to
   128/256.

2. **B is block-cached.** The ±1 one-hot B depends only on the event
   block, not the tile, once the tile's in-range mask moves into A (v1
   folded it into B, forcing a rebuild per fold). One build per (stream,
   block) DMA; sparse windows re-fold the same block from many consecutive
   tiles for free.

3. **Narrow-span sub-rows take a band fold.** In dense stores (HPRC
   C=90/160: tens of events per position) a 128-event sub-row spans only a
   few positions. Its contribution then needs NO (T,128) step matrix:
   positions t >= p_last get the full row sum and only W = p_last - p0 < 16
   positions need partial prefixes. Per 1024-event row both parts become
   two chained matmuls with tiny selector operands,

       tmp  = B_row (C_sub,1024) @ SelA^T (128,1024)  # band prefixes + row sums
       cov += tmp   (C_sub,128)  @ SelP   (128,T)     # one-hot placement + step

   where sub-row j owns SelA[16j:16j+16, 128j:128j+128] (block-diagonal;
   the off-diagonal is zeroed once at t==0 and never written) and SelP
   rows are [t == p0+s] (s < W) / [t >= p_last] (s == 15). Selector
   construction is O(16·E + 16·T) per sub-row instead of O(T·E) — ~10x
   less VPU work at dense shapes. Wide-span sub-rows (sparse windows) keep
   the full (T,E)-step fold, which the transposed layout already made
   cheaper. Sub-rows pick their mode independently, so mixed-density
   windows need no global heuristic.

All accumulation is f32 over exact 0/±1 bf16 operands (counts < 2^24):
bit-exact. Cited reference behavior: memo_query.py:42-71 (shadow cast,
clip, first-marked-column reduction).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SUB = 128  # events per sub-row (one lane group)
N_SUB = 8  # sub-rows per 1024-event row
ROW_EV = SUB * N_SUB  # 1024 events per row / per batched-matmul contraction
BLOCK_ROWS = 8  # rows per DMA block (dim-0 tile alignment)
EV_CHUNK = ROW_EV * BLOCK_ROWS  # 8192 events per DMA
# Selector columns per sub-row: 15 band positions + 1 step/rowsum. 16 keeps
# every partial-sublane scratch write aligned to the bf16 (16, 128) tile.
BAND_S = 16

_ENV_TILE = os.environ.get("MEMO_TPU_PALLAS_TILE")
_LAB_SKIP_DMA = os.environ.get("MEMO_TPU_PALLAS_LAB_SKIP_DMA") == "1"


def kernel_constants_v2(n_events: int, length: int) -> tuple[int, int]:
    """(tile, ev_rows) — ev_rows is fixed by the block geometry; tile is
    lane-width-bound (multiples of 128). Density adaptivity is per sub-row
    inside the kernel (band vs full fold), so one tile size serves both
    regimes; 256 measured best at the headline shape (docs/KERNEL_NOTES.md
    r5 ledger)."""
    tile = int(_ENV_TILE) if _ENV_TILE else 256
    if tile % 128 or tile < 128:
        raise ValueError("v2 TILE must be a positive multiple of 128")
    return tile, BLOCK_ROWS


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _make_kernel_v2(n_docs: int, membership: bool, c_sub: int, tile: int):
    C = c_sub
    T = tile

    def kernel(
        offm_ref,  # (nt+1,) scalar prefetch: minus-stream event offsets per tile
        offp_ref,  # (nt+1,) scalar prefetch: plus-stream offsets
        pos_m,  # HBM (rows, 1024) int32 minus event positions (sorted)
        val_m,  # HBM (rows, 1024) int32 column+1, 0 = inert
        pos_p,  # HBM plus stream
        val_p,
        prefix_ref,  # VMEM (C_sub, 1) int32 coverage entering position 0
        out_ref,  # (1, T) int32 conservation | (C_sub, T) int8 membership
        pos_m_buf,  # VMEM (8, 1024) int32 scratch: one DMA block
        val_m_buf,
        pos_p_buf,
        val_p_buf,
        b_m_buf,  # VMEM (C_sub, 8192) bf16: cached ±1 one-hot, minus stream
        b_p_buf,
        selA,  # VMEM (128, 1024) bf16 block-diagonal band selectors
        selP,  # VMEM (128, T) f32 placement selectors
        sem,  # DMA semaphores (2,)
        cov_ref,  # VMEM (C_sub, T) f32 coverage accumulator
        carry,  # VMEM (C_sub, 1) f32 running coverage across tiles
        blk_cache,  # SMEM (2,) int32 block id each stream's buffers hold
    ):
        t = pl.program_id(0)
        base = t * T

        @pl.when(t == 0)
        def _():
            carry[...] = prefix_ref[...].astype(jnp.float32)
            blk_cache[0] = -1
            blk_cache[1] = -1
            # The off-diagonal of selA is never written again: sub-row j owns
            # exactly selA[16j:16j+16, 128j:128j+128].
            selA[...] = jnp.zeros(selA.shape, selA.dtype)

        cov_ref[...] = jnp.broadcast_to(carry[...], (C, T))

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, SUB), 1)
        t_sub = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0)  # positions, sublanes
        t_lane = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)  # positions, lanes
        s_col = jax.lax.broadcasted_iota(jnp.int32, (BAND_S, 1), 0)
        col_blk = jax.lax.broadcasted_iota(jnp.int32, (C, ROW_EV), 0)

        for s_idx, sign, off_ref, pos_hbm, val_hbm, pos_buf, val_buf, b_buf in (
            (0, -1.0, offm_ref, pos_m, val_m, pos_m_buf, val_m_buf, b_m_buf),
            (1, 1.0, offp_ref, pos_p, val_p, pos_p_buf, val_p_buf, b_p_buf),
        ):
            lo = off_ref[t]
            hi = off_ref[t + 1]
            blk_lo = lo // EV_CHUNK
            n_chunks = jnp.where(hi > lo, pl.cdiv(hi, EV_CHUNK) - blk_lo, 0)

            def chunk_body(i, _, lo=lo, hi=hi, blk_lo=blk_lo, sign=sign,
                           pos_hbm=pos_hbm, val_hbm=val_hbm, s_idx=s_idx,
                           pos_buf=pos_buf, val_buf=val_buf, b_buf=b_buf):
                blk = blk_lo + i
                row0 = pl.multiple_of(blk * BLOCK_ROWS, BLOCK_ROWS)

                if not _LAB_SKIP_DMA:

                    @pl.when(blk_cache[s_idx] != blk)
                    def _(blk=blk, row0=row0):
                        cp_p = pltpu.make_async_copy(
                            pos_hbm.at[pl.ds(row0, BLOCK_ROWS), :], pos_buf, sem.at[0]
                        )
                        cp_v = pltpu.make_async_copy(
                            val_hbm.at[pl.ds(row0, BLOCK_ROWS), :], val_buf, sem.at[1]
                        )
                        cp_p.start()
                        cp_v.start()
                        cp_p.wait()
                        cp_v.wait()
                        # ±1 one-hot over the whole block, built ONCE per DMA
                        # (tile-independent: the tile's in-range masking
                        # lives in the A/selector operands instead). Row r's
                        # events live at lanes [r*1024, (r+1)*1024).
                        for rr in range(BLOCK_ROWS):
                            vr = val_buf[rr : rr + 1, :]  # (1, 1024)
                            b_buf[:, rr * ROW_EV : (rr + 1) * ROW_EV] = jnp.where(
                                col_blk == vr - 1, jnp.float32(sign), 0.0
                            ).astype(jnp.bfloat16)
                        blk_cache[s_idx] = blk

                for r in range(BLOCK_ROWS):
                    row_first = (blk * BLOCK_ROWS + r) * ROW_EV

                    @pl.when((row_first < hi) & (row_first + ROW_EV > lo))
                    def _(r=r, row_first=row_first, lo=lo, hi=hi, b_buf=b_buf,
                          pos_buf=pos_buf):
                        # Pass 1: per sub-row span stats (lane reductions).
                        stats = []
                        n_band = jnp.int32(0)
                        for j in range(N_SUB):
                            e0 = row_first + j * SUB
                            p = pos_buf[r : r + 1, j * SUB : (j + 1) * SUB] - base
                            in_r = (e0 + lane >= lo) & (e0 + lane < hi)
                            p0 = jnp.min(jnp.where(in_r, p, jnp.int32(T)))
                            p_last = jnp.max(jnp.where(in_r, p, jnp.int32(-1)))
                            W = p_last - p0  # < 0 iff no in-range event
                            is_band = (W >= 0) & (W < BAND_S)
                            stats.append((p, in_r, p0, p_last, W, is_band))
                            n_band += is_band.astype(jnp.int32)

                        # Pass 2: folds; selector writes only if any band.
                        for j, (p, in_r, p0, p_last, W, is_band) in enumerate(stats):
                            lane_lo = r * ROW_EV + j * SUB

                            @pl.when(W >= BAND_S)
                            def _(j=j, p=p, in_r=in_r, lane_lo=lane_lo):
                                # Classic fold: (T, SUB) step matrix on
                                # sublanes x lanes; B from the block cache.
                                a = jnp.where(
                                    (t_sub >= p) & in_r, jnp.float32(1), 0.0
                                ).astype(jnp.bfloat16)
                                cov_ref[...] += jax.lax.dot_general(
                                    b_buf[:, lane_lo : lane_lo + SUB],
                                    a,
                                    dimension_numbers=(((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                )

                            @pl.when(is_band)
                            def _(j=j, p=p, in_r=in_r, p0=p0, p_last=p_last, W=W):
                                # Band selector: cols s<15 prefix-count
                                # events with p_e <= p0+s; col 15 = row sum.
                                sa = jnp.where(
                                    ((s_col == BAND_S - 1) | (p0 + s_col >= p))
                                    & in_r,
                                    jnp.float32(1),
                                    0.0,
                                ).astype(jnp.bfloat16)
                                selA[
                                    j * BAND_S : (j + 1) * BAND_S,
                                    j * SUB : (j + 1) * SUB,
                                ] = sa
                                # Placement: s<15 -> one-hot at t = p0+s
                                # (only s < W); s==15 -> step [t >= p_last].
                                sp = jnp.where(
                                    s_col == BAND_S - 1,
                                    jnp.where(t_lane >= p_last, jnp.float32(1), 0.0),
                                    jnp.where(
                                        (t_lane == p0 + s_col) & (s_col < W),
                                        jnp.float32(1),
                                        0.0,
                                    ),
                                )
                                selP[j * BAND_S : (j + 1) * BAND_S, :] = sp

                            @pl.when((n_band > 0) & jnp.logical_not(is_band))
                            def _(j=j):
                                selA[
                                    j * BAND_S : (j + 1) * BAND_S,
                                    j * SUB : (j + 1) * SUB,
                                ] = jnp.zeros((BAND_S, SUB), jnp.bfloat16)
                                selP[j * BAND_S : (j + 1) * BAND_S, :] = jnp.zeros(
                                    (BAND_S, T), jnp.float32
                                )

                        @pl.when(n_band > 0)
                        def _(r=r, b_buf=b_buf):
                            tmp = jax.lax.dot_general(
                                b_buf[:, r * ROW_EV : (r + 1) * ROW_EV],
                                selA[...],
                                dimension_numbers=(((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # (C_sub, 128) exact f32 counts
                            cov_ref[...] += jax.lax.dot_general(
                                tmp,
                                selP[...],
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )

                return 0

            jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

        carry[...] = cov_ref[:, T - 1 : T]

        marked = cov_ref[...] > 0.5
        if membership:
            out_ref[...] = jnp.where(marked, 0, 1).astype(jnp.int8)
        else:
            cols = jax.lax.broadcasted_iota(jnp.int32, (C, T), 0)
            vals = jnp.where(marked, cols, jnp.int32(n_docs))
            out_ref[...] = jnp.min(vals, axis=0, keepdims=True)

    return kernel


def _to_event_rows_v2(pos, val, l_pad: int):
    """Pad 1-D event arrays to [rows, 1024] (rows a multiple of 8, so DMA
    blocks slice tile-aligned) with inert tail events."""
    n = pos.shape[0]
    rows = _round_up(max(n, 1), EV_CHUNK) // ROW_EV
    pad = rows * ROW_EV - n
    pos = jnp.concatenate([pos, jnp.full((pad,), l_pad, jnp.int32)]).reshape(
        rows, ROW_EV
    )
    val = jnp.concatenate([val, jnp.zeros((pad,), jnp.int32)]).reshape(rows, ROW_EV)
    return pos, val


@functools.partial(
    jax.jit,
    static_argnames=(
        "M", "L", "C", "n_docs", "membership", "interpret", "tile", "ev_rows"
    ),
)
def memo_query_pallas_v2(
    d_start,
    d_end,
    d_order,
    d_end_s,
    d_start_by_end,
    d_order_by_end,
    prefix,  # (C_sub, 1) int32 coverage entering window position 0
    mlo,
    mhi,
    plo,
    phi,
    qs,
    k,
    *,
    M: int,
    L: int,
    C: int,
    n_docs: int,
    membership: bool,
    interpret: bool = False,
    tile: int = 256,
    ev_rows: int = BLOCK_ROWS,  # accepted for engine symmetry; geometry fixed
):
    """One query window, fused (v2): int32[L] conservation or int8[L, C]
    membership. Same candidate-range/prefix contract as v1
    (IntervalStore.query_layout); see module docstring for the kernel."""
    del ev_rows
    TILE = tile
    L_pad = _round_up(max(L, 1), TILE)
    C_sub = _round_up(max(C, 1), 8)
    nt = L_pad // TILE
    idx = jnp.arange(M, dtype=jnp.int32)

    s = jax.lax.dynamic_slice(d_start, (mlo,), (M,))
    e_al = jax.lax.dynamic_slice(d_end, (mlo,), (M,))
    o = jax.lax.dynamic_slice(d_order, (mlo,), (M,))
    live = idx < (mhi - mlo)
    pos_m = jnp.where(live, s - qs, jnp.int32(L_pad))
    ok = live & (e_al - s < k - 1) & (o >= 0) & (o < C)
    val_m = jnp.where(ok, o + 1, 0)

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
    pos_m, val_m = _to_event_rows_v2(pos_m, val_m, L_pad)
    pos_p, val_p = _to_event_rows_v2(pos_p, val_p, L_pad)

    if membership:
        out_shape = jax.ShapeDtypeStruct((C_sub, L_pad), jnp.int8)
        out_specs = pl.BlockSpec(
            (C_sub, TILE), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        )
    else:
        out_shape = jax.ShapeDtypeStruct((1, L_pad), jnp.int32)
        out_specs = pl.BlockSpec(
            (1, TILE), lambda i, *_: (0, i), memory_space=pltpu.VMEM
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((C_sub, 1), lambda i, *_: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((BLOCK_ROWS, ROW_EV), jnp.int32),  # minus pos block
            pltpu.VMEM((BLOCK_ROWS, ROW_EV), jnp.int32),  # minus val block
            pltpu.VMEM((BLOCK_ROWS, ROW_EV), jnp.int32),  # plus pos block
            pltpu.VMEM((BLOCK_ROWS, ROW_EV), jnp.int32),  # plus val block
            pltpu.VMEM((C_sub, EV_CHUNK), jnp.bfloat16),  # minus one-hot cache
            pltpu.VMEM((C_sub, EV_CHUNK), jnp.bfloat16),  # plus one-hot cache
            pltpu.VMEM((N_SUB * BAND_S, ROW_EV), jnp.bfloat16),  # selA
            pltpu.VMEM((N_SUB * BAND_S, TILE), jnp.float32),  # selP
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((C_sub, TILE), jnp.float32),  # coverage
            pltpu.VMEM((C_sub, 1), jnp.float32),  # carry
            pltpu.SMEM((2,), jnp.int32),  # cached block id per stream
        ],
    )
    n_rows = pos_m.shape[0] + pos_p.shape[0]
    out = pl.pallas_call(
        _make_kernel_v2(n_docs, membership, C_sub, TILE),
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * (nt + n_rows) * TILE * C_sub * SUB,
            bytes_accessed=n_rows * ROW_EV * 8
            + L_pad * (C_sub if membership else 4),
            transcendentals=0,
        ),
    )(offm, offp, pos_m, val_m, pos_p, val_p, prefix)
    if membership:
        return out[:C, :L].T
    return out[0, :L]
