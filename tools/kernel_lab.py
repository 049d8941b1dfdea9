"""Kernel-only (tunnel-free) timing lab for the fused Pallas query kernel.

The r4 measurement correction exposed that every e2e number on this host
carries the axon-tunnel round trip (~35 ms) INSIDE it: a single query's
true_sync wall = dispatch + device work + digest RTT. This lab separates
device work from transport (VERDICT r4 item 6): it runs Q back-to-back
queries inside ONE on-device ``lax.fori_loop``, each consuming its output
into a running int32 digest, and times the whole loop with a single digest
pull. Two loop lengths (Q and 2Q) give a slope that cancels the constant
dispatch+RTT term:

    per_query_device_s = (wall(2Q) - wall(Q)) / Q

Windows use staggered starts (distinct traced qs / event offsets per
iteration) so XLA cannot hoist a loop-invariant kernel call.

Usage (each invocation is one arm; keep the TPU single-tenant):

    python tools/kernel_lab.py --shape headline [--q 16] [--reps 3]
    MEMO_TPU_PALLAS_TILE=128 MEMO_TPU_PALLAS_EV_ROWS=8 python tools/kernel_lab.py ...
    python tools/kernel_lab.py --shape dense_small --nodma   # DMA-vs-compute probe

Shapes: headline (2 Mbp, n=16, ~2.2M intervals), dense_small (256 Kbp,
C=90, headline-large density — small enough to upload quickly), wide_small
(128 Kbp, C=160), large / wide (the full bench shapes).

Output: one JSON line {shape, kernel, tile, rows, q, window_mbp,
per_query_ms, kernel_mbp_s, loop_wall_s, exact, ...}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE_DIR = "/tmp/memo_tpu_lab"


def get_store(shape: str):
    from memo_tpu.index.store import IntervalStore

    os.makedirs(CACHE_DIR, exist_ok=True)
    path = os.path.join(CACHE_DIR, f"store_{shape}.npz")
    if os.path.exists(path):
        return IntervalStore.load(path)
    import bench
    from memo_tpu.index.builder import store_from_ms

    rng = np.random.default_rng(0)
    if shape == "headline":
        store = bench.build_store(rng)
    elif shape == "large":
        store = bench.build_large_store(rng)
    elif shape == "dense_small":
        # Same per-position event density as the bench large_store (C=90,
        # gap=25) on a 256 Kbp pivot: ~9M intervals, ~230 MB on device.
        pivot = 1 << 18
        ms = bench.synth_ms(rng, pivot, 89, bench.K, gap=25)
        store = store_from_ms([ms], ["chr1"], [pivot], 90, "conservation")
    elif shape == "wide_small":
        pivot = 1 << 17
        ms = bench.synth_ms(rng, pivot, 159, bench.K, gap=30)
        store = store_from_ms([ms], ["chr1"], [pivot], 160, "conservation")
    elif shape == "wide":
        pivot = 1 << 19
        ms = bench.synth_ms(rng, pivot, 159, bench.K, gap=30)
        store = store_from_ms([ms], ["chr1"], [pivot], 160, "conservation")
    elif shape == "tiny":  # CPU/interpret smoke config
        pivot = 1 << 14
        ms = bench.synth_ms(rng, pivot, 7, bench.K, gap=15)
        store = store_from_ms([ms], ["chr1"], [pivot], 8, "conservation")
    else:
        raise SystemExit(f"unknown shape {shape}")
    store.save(path)
    return store


def window_params(engine, store, record, qs, L, k):
    """Host-side per-window kernel parameters (mirrors
    engine._query_chunk_pallas)."""
    lay = engine._layout
    r = store.record_index(record)
    rec_lo, rec_hi = int(store.rec_offsets[r]), int(store.rec_offsets[r + 1])
    seg_s = store.start[rec_lo:rec_hi]
    seg_e = lay.end_sorted[rec_lo:rec_hi]
    mlo = rec_lo + int(np.searchsorted(seg_s, qs, side="right"))
    mhi = rec_lo + int(np.searchsorted(seg_s, qs + L, side="left"))
    plo = rec_lo + int(np.searchsorted(seg_e, qs + k - 1, side="right"))
    phi = rec_lo + int(np.searchsorted(seg_e, qs + L + k - 1, side="left"))
    prefix = lay.prefix_counts(store, r, qs, k)
    return mlo, mhi, plo, phi, prefix


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="headline")
    ap.add_argument("--q", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--k", type=int, default=31)
    ap.add_argument("--kernel", default="v1", help="v1 (shipped) | v2")
    ap.add_argument("--nodma", action="store_true", help="timing-only: skip event DMAs")
    ap.add_argument("--no-exact", action="store_true", help="skip the numpy cross-check")
    ap.add_argument("--e2e", action="store_true", help="also time one engine.conservation + true_sync")
    ap.add_argument(
        "--stratified-e2e",
        action="store_true",
        help="also time a length-stratified engine (full conservation + true_sync)",
    )
    args = ap.parse_args()
    if args.nodma:
        os.environ["MEMO_TPU_PALLAS_LAB_SKIP_DMA"] = "1"

    import bench

    bench._enable_persistent_compile_cache()
    import jax
    import jax.numpy as jnp

    from memo_tpu.query.engine import QueryEngine, _next_pow2

    t0 = time.time()
    store = get_store(args.shape)
    pivot_len = int(store.record_lens[0])
    record = store.record_names[0]
    # stratify=False: the lab times the RAW kernel over the full candidate
    # streams; the engine's length-stratified mode is measured via --e2e
    # (--stratified-e2e) against exactly this baseline.
    engine = QueryEngine(
        store,
        backend="pallas",
        chunk_positions=pivot_len,
        max_intervals_per_chunk=1 << 25,
        device_output=True,
        stratify=False,
    )
    build_s = time.time() - t0

    k = args.k
    Q = args.q
    L = max(pivot_len // 2, 1 << 14)
    span = pivot_len - L
    qss = [int(round(i * span / max(Q - 1, 1))) for i in range(Q)]
    params = [window_params(engine, store, record, qs, L, k) for qs in qss]
    M = min(
        _next_pow2(max(max(max(p[1] - p[0], p[3] - p[2]) for p in params), 1)),
        engine.max_intervals,
    )
    C = store.n_docs

    if args.kernel == "v1":
        from memo_tpu.ops.pallas_query import kernel_constants_for, memo_query_pallas

        tile, rows = kernel_constants_for(M, L)
        pshape = (1, max((C + 127) // 128 * 128, 128))  # (1, C_pad)
        kern_fn = memo_query_pallas
    else:
        from memo_tpu.ops.pallas_query_v2 import kernel_constants_v2, memo_query_pallas_v2

        tile, rows = kernel_constants_v2(M, L)
        pshape = (max((C + 7) // 8 * 8, 8), 1)  # (C_sub, 1)
        kern_fn = memo_query_pallas_v2

    # The store arrays MUST be jit arguments, not closed-over constants —
    # captured device arrays get serialized into the compile request (a
    # dense store is hundreds of MB -> remote-compile HTTP 413).
    store_args = (
        engine._d_start,
        engine._d_end,
        engine._d_order,
        engine._d_end_s,
        engine._d_start_by_end,
        engine._d_order_by_end,
    )
    kern = lambda *dev, **kw: kern_fn(
        *dev,
        M=M,
        L=L,
        C=C,
        n_docs=C,
        membership=False,
        interpret=engine._interpret,
        tile=tile,
        ev_rows=rows,
        **kw,
    )

    prefixes = np.zeros((Q,) + pshape, np.int32)
    for i, p in enumerate(params):
        if pshape[0] == 1:
            prefixes[i, 0, :C] = p[4]
        else:
            prefixes[i, :C, 0] = p[4]
    mlos = jnp.asarray([p[0] for p in params], jnp.int32)
    mhis = jnp.asarray([p[1] for p in params], jnp.int32)
    plos = jnp.asarray([p[2] for p in params], jnp.int32)
    phis = jnp.asarray([p[3] for p in params], jnp.int32)
    qs_arr = jnp.asarray(qss, jnp.int32)
    pref_arr = jnp.asarray(prefixes)

    def make_loop(n_iter: int):
        @jax.jit
        def loop(dev, mlos, mhis, plos, phis, qs_arr, pref_arr):
            def body(i, acc):
                j = i % Q
                out = kern(
                    *dev,
                    prefix=jax.lax.dynamic_slice(pref_arr, (j, 0, 0), (1,) + pshape)[0],
                    mlo=mlos[j],
                    mhi=mhis[j],
                    plo=plos[j],
                    phi=phis[j],
                    qs=qs_arr[j],
                    k=jnp.int32(k),
                )
                return acc + jnp.sum(out.astype(jnp.int32))

            return jax.lax.fori_loop(0, n_iter, body, jnp.int32(0))

        return loop

    loop_q = make_loop(Q)
    loop_2q = make_loop(2 * Q)
    arrs = (store_args, mlos, mhis, plos, phis, qs_arr, pref_arr)

    tc = time.time()
    d1 = int(np.asarray(loop_q(*arrs)))  # compile + run (digest pull = sync)
    compile_s = time.time() - tc
    tc = time.time()
    d2 = int(np.asarray(loop_2q(*arrs)))
    compile2_s = time.time() - tc

    w1 = w2 = 1e9
    for _ in range(args.reps):
        t = time.perf_counter()
        r1 = int(np.asarray(loop_q(*arrs)))
        w1 = min(w1, time.perf_counter() - t)
        t = time.perf_counter()
        r2 = int(np.asarray(loop_2q(*arrs)))
        w2 = min(w2, time.perf_counter() - t)
    per_query = max((w2 - w1) / Q, 1e-9)

    out = {
        "shape": args.shape,
        "kernel": args.kernel,
        "tile": tile,
        "rows": rows,
        "q": Q,
        "k": k,
        "window_mbp": round(L / 1e6, 3),
        "intervals": store.num_intervals,
        "n_docs": C,
        "M": M,
        "nodma": bool(args.nodma),
        "loop_wall_q_s": round(w1, 4),
        "loop_wall_2q_s": round(w2, 4),
        "per_query_ms": round(per_query * 1e3, 3),
        "kernel_mbp_s": round(L / per_query / 1e6, 1),
        "digest_consistent": d1 * 2 == d2 and r1 == d1 and r2 == d2,
        "build_s": round(build_s, 1),
        "compile_s": round(compile_s, 1),
        "compile2_s": round(compile2_s, 1),
        "device": jax.devices()[0].platform,
    }

    if not args.no_exact and not args.nodma:
        # Cross-check one window's kernel output on a subwindow vs the
        # reference loop (cheap on host even for dense stores).
        sub = min(1 << 14, L)
        got = np.asarray(
            kern(
                *store_args,
                prefix=jnp.asarray(prefixes[0]),
                mlo=mlos[0],
                mhi=mhis[0],
                plo=plos[0],
                phi=phis[0],
                qs=qs_arr[0],
                k=jnp.int32(k),
            )
        )[:sub]
        want = bench.reference_query_np(store, qss[0], qss[0] + sub, k)
        out["exact"] = bool(np.array_equal(got, want))

    if args.e2e:
        bench.true_sync(engine.conservation(record, 0, pivot_len, k))
        best = 1e9
        for _ in range(args.reps):
            t = time.perf_counter()
            o = engine.conservation(record, 0, pivot_len, k)
            bench.true_sync(o)
            best = min(best, time.perf_counter() - t)
        out["e2e_full_ms"] = round(best * 1e3, 1)
        out["e2e_full_mbp_s"] = round(pivot_len / best / 1e6, 1)

    if args.stratified_e2e:
        s_eng = QueryEngine(
            store,
            backend="pallas",
            chunk_positions=pivot_len,
            max_intervals_per_chunk=1 << 25,
            device_output=True,
            stratify=True,
        )
        first = s_eng.conservation(record, 0, pivot_len, k)
        bench.true_sync(first)
        sub = min(1 << 14, pivot_len)
        out["stratified_exact"] = bool(
            np.array_equal(
                np.asarray(first)[:sub], bench.reference_query_np(store, 0, sub, k)
            )
        )
        best = 1e9
        for _ in range(args.reps):
            t = time.perf_counter()
            o = s_eng.conservation(record, 0, pivot_len, k)
            bench.true_sync(o)
            best = min(best, time.perf_counter() - t)
        out["stratified_e2e_ms"] = round(best * 1e3, 1)
        out["stratified_e2e_mbp_s"] = round(pivot_len / best / 1e6, 1)
        out["stratified_buckets"] = len(s_eng._children or [])

    print(json.dumps(out))


if __name__ == "__main__":
    main()
