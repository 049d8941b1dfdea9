"""Worker for the multi-process ``jax.distributed`` CPU tests (SURVEY §4.4).

Each process owns 2 virtual CPU devices; N processes form the standard
(dp=hosts, sp=local chips) global mesh from memo_tpu.parallel.distributed.
The worker runs the SPMD conservation batch over its dp shard of windows and
writes its addressable output shards (with global indices) for the parent
test to stitch and compare against the single-process engine.

Usage: python dist_worker.py PORT PROCESS_ID NUM_PROCESSES STRATEGY OUTDIR
"""

import os
import sys


def main() -> int:
    port, pid, nprocs = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    strategy, outdir = sys.argv[4], sys.argv[5]
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from memo_tpu.parallel.distributed import initialize, make_global_mesh
    from memo_tpu.parallel.sharded import conservation_batch
    from tests.dist_common import build_fixture_store, gather_windows

    initialize(f"localhost:{port}", num_processes=nprocs, process_id=pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert jax.device_count() == 2 * nprocs, jax.device_count()
    mesh = make_global_mesh()
    assert dict(mesh.shape) == {"dp": nprocs, "sp": 2}, dict(mesh.shape)

    store, windows, k = build_fixture_store(n_windows=2 * nprocs)

    if strategy == "resident":
        # Device-resident coordinate-sharded store across PROCESSES: every
        # process places the same host store into the global (dp, sp) mesh
        # once (slab shards land on its local devices), then one SPMD
        # dispatch computes the whole record; each process saves its
        # addressable slabs for the parent to stitch.
        from memo_tpu.parallel import ResidentShardedQuery

        rq = ResidentShardedQuery(store, mesh, k_max=2 * k)
        out = rq.conservation_full(k)
        shards = {}
        for shard in out.addressable_shards:
            r0 = shard.index[0].start or 0
            shards[f"at_{r0}_0"] = np.asarray(shard.data)
        np.savez(os.path.join(outdir, f"proc{pid}.npz"), **shards)
        jax.distributed.shutdown()
        return 0

    starts, ends, orders, qs, L = gather_windows(store, windows, k, mesh)

    from jax.sharding import NamedSharding, PartitionSpec as P

    def glob(a, spec):
        sh = NamedSharding(mesh, spec)
        return jax.make_array_from_callback(a.shape, sh, lambda idx: a[idx])

    out = conservation_batch(
        mesh,
        glob(starts, P("dp", None)),
        glob(ends, P("dp", None)),
        glob(orders, P("dp", None)),
        glob(qs, P("dp")),
        k,
        L=L,
        n_docs=store.n_docs,
        strategy=strategy,
    )
    shards = {}
    for shard in out.addressable_shards:
        r0 = shard.index[0].start or 0
        c0 = shard.index[1].start if len(shard.index) > 1 else 0
        shards[f"at_{r0}_{c0 or 0}"] = np.asarray(shard.data)
    np.savez(os.path.join(outdir, f"proc{pid}.npz"), **shards)
    jax.distributed.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
