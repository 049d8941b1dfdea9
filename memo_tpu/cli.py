"""memo-tpu CLI: ``memo {index, query, view}``.

Preserves the reference's user-facing flag contract exactly
(reference src/memo:29-49, index.sh:30-49, query.sh:36-61, view.sh:34-56) so
reference walkthroughs transfer verbatim, and adds TPU-era knobs
(--backend, --emit-compat, --profile, --devices).

Run as ``python -m memo_tpu <cmd>`` or via the installed ``memo-tpu`` script.
"""

from __future__ import annotations

import argparse
import os
import sys

from memo_tpu.utils.logging import get_logger
from memo_tpu.utils.profiling import GLOBAL_TIMES, trace_context

log = get_logger(__name__)


def _add_index(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser(
        "index", help="index pangenome into MEMO membership or conservation indexes"
    )
    p.add_argument("-g", dest="genome_list", required=True, help="document list (line 1 = pivot)")
    p.add_argument("-o", dest="output_dir", default=".", help="output directory ['.']")
    p.add_argument("-p", dest="prefix", required=True, help="output file prefix")
    p.add_argument(
        "-m", dest="membership", action="store_true", help="make membership index"
    )
    p.add_argument(
        "--ms-backend",
        default="auto",
        choices=["auto", "native", "python", "sa"],
        help="matching-statistics engine: auto (automaton when the document "
        "fits the RAM budget, else partitioned suffix-array groups), "
        "native/python (automaton), sa (suffix array) [auto]",
    )
    p.add_argument(
        "--ms-budget-mb",
        type=int,
        default=None,
        metavar="MB",
        help="RAM budget per matching-statistics group build; documents "
        "larger than the budget are partitioned at record boundaries and "
        "max-merged (exact) [8192]",
    )
    p.add_argument(
        "--ms-pooled",
        default="auto",
        choices=["auto", "on", "off"],
        help="pool documents into shared colored-GSA suffix-array groups "
        "(one SA per RAM-budget group serves every document in it; fastest "
        "at pangenome widths). auto estimates from input sizes [auto]",
    )
    p.add_argument(
        "--emit-compat",
        action="store_true",
        help="also write reference-format artifacts (fai, dap.txt, bed, parquet)",
    )
    p.add_argument("--no-cache", action="store_true", help="disable resumable MS caching")
    p.add_argument(
        "--jobs", type=int, default=1, help="parallel per-genome MS builds [1]"
    )
    p.add_argument(
        "--preserve-case",
        action="store_true",
        help="byte-literal matching like MONI (the reference pipeline never "
        "case-folds, so soft-masked lowercase only matches lowercase — see "
        "docs/MONI_PARITY.md); default uppercases pivot and documents first",
    )
    p.add_argument("--profile", metavar="DIR", default=None, help="write a jax.profiler trace")


def _add_query(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser(
        "query", help="query k-mer membership or conservation on pivot genome region"
    )
    p.add_argument(
        "-b", dest="index", required=True, help="MEMO index (.npz native, .parquet or .bed compat)"
    )
    p.add_argument("-k", dest="k", type=int, default=31, help="k-mer size [31]")
    p.add_argument(
        "-n",
        dest="num_docs",
        type=int,
        default=None,
        help="total number of documents in pangenome (incl. pivot); "
        "required for .parquet/.bed, stored in .npz",
    )
    p.add_argument(
        "-r",
        dest="region",
        default=None,
        help="query region (0-indexed, half open '[)' coordinates) chr:start-end",
    )
    p.add_argument(
        "--regions-file",
        default=None,
        help="batch mode: file with one region per line; outputs are written "
        "to <out>.<chr>_<start>_<end>.txt and the batch runs data-parallel "
        "over all devices (memo_tpu.parallel)",
    )
    p.add_argument(
        "--mesh",
        default=None,
        metavar="DP,SP",
        help="device mesh for --regions-file: data-parallel x position-parallel "
        "sizes (default: all devices on the position axis)",
    )
    p.add_argument(
        "--strategy",
        default="auto",
        choices=("auto", "position", "interval", "resident", "batched"),
        help="--regions-file sharding strategy: 'position'/'interval' gather "
        "per-window candidates host-side; 'resident' places the index ONCE "
        "into coordinate-sharded device memory and serves every window from "
        "the resident shards; 'batched' serves all of a record's windows "
        "from ONE on-device fori_loop dispatch (single-device fused "
        "kernel). 'auto' picks resident for dense/many-window batches, "
        "batched for scattered windows on a single TPU, else position "
        "[auto]",
    )
    p.add_argument("-o", dest="out_file", required=True, help="output file")
    p.add_argument(
        "-m",
        dest="membership",
        action="store_true",
        help="perform the membership query (instead of conservation query)",
    )
    p.add_argument(
        "--backend",
        default=None,
        choices=["jax", "pallas", "numpy"],
        help="query backend [default: pallas (fused kernel) on TPU — the "
        "true-completion A/B winner at every measured shape — else jax "
        "(XLA diff-array+cumsum); numpy: host]",
    )
    p.add_argument("--profile", metavar="DIR", default=None, help="write a jax.profiler trace")
    p.add_argument("--stats", action="store_true", help="print per-query stats to stderr")
    p.add_argument(
        "--force",
        action="store_true",
        help="run even if the index kind (conservation/membership) does not "
        "match the query flag — the output shape will be garbage "
        "(the reference shares this footgun; we refuse by default)",
    )


def _add_extract(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser(
        "extract",
        help="extract region chr:start-end from an overlap MEM index "
        "(legacy omem extract, reference extract.sh)",
    )
    p.add_argument(
        "-b", dest="index", required=True, help="MEMO index (.npz native, .parquet or .bed compat)"
    )
    p.add_argument(
        "-r", dest="region", required=True, help="target query region chr:start-end (0-indexed, half open)"
    )
    p.add_argument("-o", dest="output_dir", default=".", help="output directory ['.']")
    p.add_argument(
        "-n",
        dest="num_docs",
        type=int,
        default=None,
        help="total documents (only needed for .parquet/.bed inputs)",
    )


def _add_view(sub: argparse._SubParsersAction) -> None:
    p = sub.add_parser("view", help="plot sequence conservation")
    p.add_argument("-i", dest="in_file", required=True, help="input conservation.out")
    p.add_argument("-o", dest="out_file", required=True, help="output plot.png")
    p.add_argument(
        "-n", dest="num_docs", type=int, required=True, help="total number of documents"
    )
    p.add_argument("-b", dest="num_bins", type=int, default=500, help="genomic bins [500]")
    p.add_argument("-d", dest="dpi", type=int, default=600, help="plot DPI [600]")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="memo",
        description="MEMO-TPU — TPU-native pangenome k-mer membership/conservation queries",
    )
    sub = ap.add_subparsers(dest="command", required=True)
    _add_index(sub)
    _add_query(sub)
    _add_view(sub)
    _add_extract(sub)
    return ap


def cmd_index(args) -> int:
    from memo_tpu.index.builder import BuildConfig, build_index

    os.makedirs(args.output_dir, exist_ok=True)
    cfg = BuildConfig(
        kind="membership" if args.membership else "conservation",
        backend=args.ms_backend,
        ms_budget_bytes=args.ms_budget_mb << 20 if args.ms_budget_mb else None,
        uppercase=not args.preserve_case,
        workdir=None if args.no_cache else args.output_dir,
        emit_compat=args.emit_compat,
        compat_prefix=args.prefix,
        jobs=args.jobs,
        pooled={"auto": None, "on": True, "off": False}[args.ms_pooled],
    )
    with trace_context(args.profile):
        store = build_index(args.genome_list, cfg)
    out = os.path.join(args.output_dir, f"{args.prefix}.npz")
    store.save(out)
    log.info("index written: %s (%s)", out, store.stats())
    log.info("stage times: %s", GLOBAL_TIMES.report())
    print(f"DONE — index at {out}")
    return 0


def load_store(path: str, num_docs: int | None, membership: bool, force: bool = False):
    from memo_tpu.index.store import IntervalStore

    kind = "membership" if membership else "conservation"
    if path.endswith(".npz"):
        store = IntervalStore.load(path)
        if num_docs is not None and num_docs != store.n_docs:
            log.warning("-n %d overrides stored n_docs=%d", num_docs, store.n_docs)
            store.n_docs = num_docs
        if store.kind != kind:
            # The native index stores its kind, so a mismatched query flag is
            # always a user error producing garbage-shaped output. The
            # reference cannot detect this (Parquet stores no kind); we can,
            # so refuse unless forced.
            msg = (
                f"index {path} is a {store.kind!r} index but the query "
                f"requests {kind!r} (-m flag mismatch)"
            )
            if not force:
                raise SystemExit(msg + "; pass --force to run anyway")
            log.warning("%s — forced; results follow the query flag", msg)
        return store
    from memo_tpu.io import compat

    if num_docs is None:
        raise SystemExit("-n is required when querying a .parquet/.bed index")
    if path.endswith(".parquet"):
        return compat.read_parquet(path, num_docs, kind)
    if path.endswith(".bed"):
        return compat.read_bed(path, num_docs, kind)
    raise SystemExit(f"unrecognized index format: {path}")


def pick_batch_strategy(store, regions) -> str:
    """Resolve ``--strategy auto`` for a regions batch.

    The resident strategy answers every window of a record from ONE
    whole-record SPMD dispatch against the HBM-resident sharded store — its
    cost is ~record_len of work per (record, k) regardless of window count,
    and it is the only strategy whose throughput grows with mesh size
    (BENCH_r03 scaling_virtual_8cpu: position/interval degrade sp1->sp8,
    resident scales). The host-gather 'position' strategy costs ~window work
    per window but pays per-window gathers + uploads. Pick resident unless
    the batch is a few scattered small windows over huge records, where a
    full-record dispatch would dwarf the queried positions."""
    by_record: dict[str, int] = {}
    for record, qs, qe in regions:
        by_record[record] = by_record.get(record, 0) + max(qe - qs, 0)
    queried = sum(by_record.values())
    touched = sum(int(store.record_lens[store.record_index(r)]) for r in by_record)
    # Windows covering >=1/16 of the touched records, or a many-window batch
    # (amortizing the one dispatch), make the full-record dispatch worth it.
    if queried * 16 >= touched or len(regions) >= 8 * len(by_record):
        return "resident"
    # Scattered small windows: on a single device the fused-kernel batched
    # path (one on-device fori_loop dispatch for ALL windows,
    # engine.conservation_batch) amortizes the per-dispatch cost that the
    # host-gather 'position' strategy pays per window (measured 3-3.7x at
    # 16 x 1 Mbp, BENCH_r05 batched_windows); multi-device meshes keep the
    # SPMD position strategy.
    import jax

    if len(jax.devices()) == 1 and jax.default_backend() == "tpu":
        return "batched"
    return "position"


def cmd_query(args) -> int:
    import numpy as np

    from memo_tpu.query.engine import QueryEngine, parse_region
    from memo_tpu.query.output import write_conservation, write_membership

    if (args.region is None) == (args.regions_file is None):
        raise SystemExit("exactly one of -r or --regions-file is required")
    store = load_store(args.index, args.num_docs, args.membership, force=args.force)

    if args.regions_file:
        from memo_tpu.parallel import ShardedQuery, make_mesh

        with open(args.regions_file) as fh:
            regions = [parse_region(line.strip()) for line in fh if line.strip()]
        if args.mesh:
            dp, sp = (int(x) for x in args.mesh.split(","))
            mesh = make_mesh(dp=dp, sp=sp)
        else:
            mesh = make_mesh()
        strategy = args.strategy
        if strategy == "auto":
            strategy = pick_batch_strategy(store, regions)
            log.info("--strategy auto resolved to %r", strategy)
        with trace_context(args.profile):
            if strategy == "resident":
                from memo_tpu.parallel import ResidentShardedQuery

                # ONE placement serves every queried record: distinct records
                # ride the dp mesh axis (ResidentShardedQuery multi-record
                # mode), and ALL windows of a (record, k) are slices of ONE
                # SPMD dispatch (the full-record output is memoized).
                k_max = max(args.k, 1024)
                uniq = list(dict.fromkeys(record for record, _, _ in regions))
                if len(uniq) == 1:
                    rq = ResidentShardedQuery(store, mesh, record=uniq[0], k_max=k_max)
                else:
                    rq = ResidentShardedQuery(store, mesh, records=uniq, k_max=k_max)
                results = []
                for record, qs, qe in regions:
                    fn = rq.membership if args.membership else rq.conservation
                    results.append(fn(qs, qe, args.k, record=record))
            elif strategy == "batched":
                # Single-device fused-kernel batch: one on-device fori_loop
                # dispatch per record serves all of its windows.
                engine = QueryEngine(store, backend=args.backend or "auto")
                by_rec: dict[str, list[tuple[int, int]]] = {}
                for record, qs, qe in regions:
                    by_rec.setdefault(record, []).append((qs, qe))
                outs: dict[tuple, object] = {}
                for record, wins in by_rec.items():
                    fn = (
                        engine.membership_batch
                        if args.membership
                        else engine.conservation_batch
                    )
                    for (qs, qe), o in zip(wins, fn(record, wins, args.k)):
                        outs[(record, qs, qe)] = o
                results = [outs[key] for key in regions]
            else:
                sq = ShardedQuery(store, mesh, strategy=strategy)
                if args.membership:
                    results = sq.membership(regions, args.k)
                else:
                    results = sq.conservation(regions, args.k)
        for (record, qs, qe), res in zip(regions, results):
            path = f"{args.out_file}.{record}_{qs}_{qe}.txt"
            if args.membership:
                write_membership(np.asarray(res), path)
            else:
                write_conservation(np.asarray(res), path)
        log.info("wrote %d region outputs (mesh=%s)", len(regions), dict(mesh.shape))
        return 0

    # backend "auto" resolves per device in QueryEngine: the fused Pallas
    # kernel on real TPUs (the true-completion A/B winner at every measured
    # shape, docs/BENCH_local_r04.json), the XLA path elsewhere.
    engine = QueryEngine(store, backend=args.backend or "auto")
    record, qs, qe = parse_region(args.region)
    with trace_context(args.profile):
        if args.membership:
            res = engine.membership(record, qs, qe, args.k)
            write_membership(np.asarray(res), args.out_file)
        else:
            res = engine.conservation(record, qs, qe, args.k)
            write_conservation(np.asarray(res), args.out_file)
    if args.stats:
        print(f"stats: {engine.last_stats.as_dict()}", file=sys.stderr)
    return 0


def cmd_extract(args) -> int:
    from memo_tpu.io.compat import write_extracted_bed
    from memo_tpu.query.engine import parse_region

    record, qs, qe = parse_region(args.region)
    if args.index.endswith(".npz"):
        from memo_tpu.index.store import IntervalStore

        store = IntervalStore.load(args.index)
    else:
        # kind/n_docs are irrelevant to extraction; placeholders load compat.
        # The record predicate is pushed into the reader (Parquet row-group
        # pruning / BED stream filter) so one window never loads a multi-GB
        # index — the tabix-indexed-random-access analog.
        from memo_tpu.io import compat

        reader = compat.read_parquet if args.index.endswith(".parquet") else compat.read_bed
        store = reader(args.index, args.num_docs or 2, "conservation", record=record)
    os.makedirs(args.output_dir, exist_ok=True)
    path = write_extracted_bed(store, record, qs, qe, args.output_dir)
    print(f"Output order MEM overlaps file: {path}")
    return 0


def cmd_view(args) -> int:
    from memo_tpu.view.plot import save_conservation_plot

    save_conservation_plot(args.in_file, args.out_file, args.num_docs, args.num_bins, args.dpi)
    log.info("plot written: %s", args.out_file)
    return 0


def _honor_platform_env() -> None:
    """Re-assert JAX_PLATFORMS as jax config: a TPU-plugin sitecustomize that
    imports jax at interpreter startup can override the env var, silently
    sending `JAX_PLATFORMS=cpu memo-tpu ...` runs to the TPU."""
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized — leave it be


def main(argv: list[str] | None = None) -> int:
    _honor_platform_env()
    args = build_parser().parse_args(argv)
    if args.command == "index":
        return cmd_index(args)
    if args.command == "query":
        return cmd_query(args)
    if args.command == "view":
        return cmd_view(args)
    if args.command == "extract":
        return cmd_extract(args)
    raise SystemExit(f"unknown command {args.command}")


if __name__ == "__main__":
    raise SystemExit(main())
