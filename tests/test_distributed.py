"""Multi-process ``jax.distributed`` execution (SURVEY §4.4): real OS
processes, a localhost coordinator, the (dp=hosts, sp=chips) global mesh,
one SPMD conservation batch — stitched output must equal the single-process
engine bit-for-bit. Parametrized over process count (2-host and 4-host
meshes) and both sharding strategies (position = no collectives;
interval = psum)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize(
    "nprocs,strategy",
    [(2, "position"), (2, "interval"), (4, "position"), (2, "resident")],
)
def test_multi_process_distributed_query(tmp_path, nprocs, strategy):
    port = _free_port()
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    worker = os.path.join(REPO, "tests", "dist_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(nprocs), strategy, str(tmp_path)],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(nprocs)
    ]
    outs = [p.communicate(timeout=600)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    # Stitch every process's addressable shards back into the global result.
    from tests.dist_common import K, build_fixture_store

    store, windows, k = build_fixture_store(n_windows=2 * nprocs)

    if strategy == "resident":
        # Whole-record output sharded over the global sp axis: stitch the
        # slabs and compare against the single-process engine.
        from memo_tpu.query.engine import QueryEngine

        P = int(store.record_lens[0])
        got1 = np.full(P, -1, np.int64)
        for pid in range(nprocs):
            with np.load(tmp_path / f"proc{pid}.npz") as z:
                for key in z.files:
                    _, r0, _ = key.split("_")
                    block = z[key]
                    got1[int(r0) : int(r0) + block.shape[0]] = block
        assert (got1 >= 0).all(), "global output has unwritten holes"
        eng = QueryEngine(store, backend="numpy")
        np.testing.assert_array_equal(got1, eng.conservation("chr1", 0, P, K))
        return
    W = len(windows)
    L = windows[0][2] - windows[0][1]
    got = np.full((W, L), -1, np.int64)
    for pid in range(nprocs):
        with np.load(tmp_path / f"proc{pid}.npz") as z:
            for key in z.files:
                _, r0, c0 = key.split("_")
                block = z[key]
                if block.ndim == 1:
                    block = block[None, :]
                got[
                    int(r0) : int(r0) + block.shape[0],
                    int(c0) : int(c0) + block.shape[1],
                ] = block
    assert (got >= 0).all(), "global output has unwritten holes"

    from memo_tpu.query.engine import QueryEngine

    eng = QueryEngine(store, backend="numpy")
    want = np.stack([eng.conservation(r, qs, qe, K) for r, qs, qe in windows])
    np.testing.assert_array_equal(got, want)
