"""Fused Pallas TPU kernel for the MEMO coverage scan.

The query's hot transform is "N interval diff-events -> dense per-position
coverage" (see ops/query_ops.py). XLA lowers the scatter-add to a serialized
scatter loop on TPU; this kernel replaces it with a single sequential-grid
pass that is MXU/VPU friendly:

1. (host/XLA side) each valid interval becomes two events
   (+1 at casted_end, -1 at start) tagged with its column; events are sorted
   by position once per window (O(M log M) on device).
2. The kernel walks position tiles in grid order, DMA-streaming each tile's
   event slice HBM->VMEM in fixed-size chunks. A chunk's contribution to the
   tile is computed as ONE-HOT MATMULS on the MXU:

       A[T, E] = (tile_position >= event_position)      # step functions
       B[E, C] = delta * onehot(event_column)
       contribution = A @ B                             # (T, C) coverage

   so the ragged scatter becomes dense matrix work.
3. Running coverage carries across tiles through a VMEM scratch that is
   simply the previous tile's last row (coverage is a prefix sum over
   events, and every event of a tile affects its last position).

Counts are exact in f32 (deltas are ±1, coverage < 2^24).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from memo_tpu.ops.query_ops import cast_and_clip

TILE = 256  # positions per grid step
EVENT_LANES = 512  # events per HBM row
EVENT_ROWS = 8  # rows per DMA block — sublane tiling requires 8-aligned slices
EVENT_CHUNK = EVENT_ROWS * EVENT_LANES  # events DMA'd per inner-loop step


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _coverage_kernel(off_ref, pos_hbm, val_hbm, out_ref, pos_buf, val_buf, sem, carry):
    t = pl.program_id(0)
    T, C = out_ref.shape
    base = t * T

    @pl.when(t == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)

    # Start the tile at the running coverage from all previous tiles.
    out_ref[...] = jnp.broadcast_to(carry[0:1, :], (T, C)).astype(jnp.float32)

    lo = off_ref[t]
    hi = off_ref[t + 1]
    # Events live in [rows, EVENT_LANES] HBM arrays; DMA 8-row blocks (the
    # sublane tile — arbitrary row offsets are not sliceable) and mask each
    # block's flat event range to this tile's [lo, hi).
    blk_lo = lo // EVENT_CHUNK
    n_chunks = pl.cdiv(hi, EVENT_CHUNK) - blk_lo

    def chunk_body(i, _):
        row0 = pl.multiple_of((blk_lo + i) * EVENT_ROWS, EVENT_ROWS)
        cp_p = pltpu.make_async_copy(
            pos_hbm.at[pl.ds(row0, EVENT_ROWS), :], pos_buf, sem.at[0]
        )
        cp_v = pltpu.make_async_copy(
            val_hbm.at[pl.ds(row0, EVENT_ROWS), :], val_buf, sem.at[1]
        )
        cp_p.start()
        cp_v.start()
        cp_p.wait()
        cp_v.wait()

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, EVENT_LANES), 1)
        pos_iota = jax.lax.broadcasted_iota(jnp.int32, (T, EVENT_LANES), 0)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (C, EVENT_LANES), 0)
        contrib = jnp.zeros((T, C), jnp.float32)
        for j in range(EVENT_ROWS):
            e_idx = (row0 + j) * EVENT_LANES + lane
            in_tile = (e_idx >= lo) & (e_idx < hi)  # mask overread into other tiles
            p_local = pos_buf[j : j + 1, :] - base  # (1, E)
            v = val_buf[j : j + 1, :]
            delta = jnp.where(in_tile, jnp.sign(v), 0).astype(jnp.float32)  # (1, E)
            col = jnp.abs(v) - 1  # (1, E); invalid events have v=0 -> col=-1

            # A_T[p, e] = 1 iff event e is at or before tile position p.
            a_t = (pos_iota >= p_local).astype(jnp.float32)  # (T, E)
            # B_T[c, e] = delta_e iff event e targets column c.
            b_t = jnp.where(col_iota == col, delta, 0.0)  # (C, E)

            contrib = contrib + jax.lax.dot_general(
                a_t,
                b_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T, C)
        out_ref[...] = out_ref[...] + contrib
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)

    # Every event of this tile affects its last position, so the last row IS
    # the running coverage entering the next tile.
    carry[...] = out_ref[T - 1 : T, :]


@functools.partial(jax.jit, static_argnames=("L", "C", "interpret"))
def coverage_marks_pallas(starts, ends, orders, qs, k, *, L: int, C: int, interpret: bool = False):
    """bool[L, C] absence marks — drop-in for query_ops.coverage_marks."""
    st, ce, valid = cast_and_clip(starts, ends, qs, L, k)
    order = orders.astype(jnp.int32)
    ok = valid & (order >= 0) & (order < C)

    L_pad = _round_up(max(L, 1), TILE)
    C_pad = _round_up(max(C, 1), 128)
    nt = L_pad // TILE

    # Events: +1 at ce, -1 at st; column encoded in |val|-1, delta in sign.
    big = jnp.int32(L_pad)
    pos = jnp.concatenate(
        [
            jnp.where(ok, ce.astype(jnp.int32), big),
            jnp.where(ok, st.astype(jnp.int32), big),
        ]
    )
    val = jnp.concatenate(
        [
            jnp.where(ok, order + 1, 0),
            jnp.where(ok, -(order + 1), 0),
        ]
    )
    sort_idx = jnp.argsort(pos)
    pos_s = pos[sort_idx]
    val_s = val[sort_idx]
    boundaries = jnp.arange(nt + 1, dtype=jnp.int32) * TILE
    offsets = jnp.searchsorted(pos_s, boundaries, side="left").astype(jnp.int32)
    # Reshape events to [rows, EVENT_LANES] (rows padded to the 8-row sublane
    # tile) so the kernel DMAs whole aligned blocks; the tail is padded with
    # inert events (pos=big, val=0).
    n_events = pos_s.shape[0]
    n_rows = _round_up(n_events, EVENT_CHUNK) // EVENT_LANES
    pad = n_rows * EVENT_LANES - n_events
    pos_s = jnp.concatenate([pos_s, jnp.full((pad,), big, jnp.int32)]).reshape(
        n_rows, EVENT_LANES
    )
    val_s = jnp.concatenate([val_s, jnp.zeros((pad,), jnp.int32)]).reshape(
        n_rows, EVENT_LANES
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            # Events stay in HBM and are DMA'd row-by-row: arbitrary-row
            # slicing of a VMEM-resident ref violates sublane tiling.
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec((TILE, C_pad), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((EVENT_ROWS, EVENT_LANES), jnp.int32),
            pltpu.VMEM((EVENT_ROWS, EVENT_LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, C_pad), jnp.float32),
        ],
    )
    cov = pl.pallas_call(
        _coverage_kernel,
        out_shape=jax.ShapeDtypeStruct((L_pad, C_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * nt * TILE * C_pad * EVENT_CHUNK,
            bytes_accessed=L_pad * C_pad * 4 + pos_s.size * 8,
            transcendentals=0,
        ),
    )(offsets, pos_s, val_s)
    return cov[:L, :C] > 0.5
