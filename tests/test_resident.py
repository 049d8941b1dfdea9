"""Device-resident coordinate-sharded store == single-device engine,
bit-exact on the 8-device virtual CPU mesh (SURVEY §7 flagship distribution
design: the index lives sharded in device memory, placed once; queries route
to the shards with zero host->device index traffic)."""

import jax
import numpy as np
import pytest

from memo_tpu.index.builder import store_from_ms
from memo_tpu.parallel import ResidentShardedQuery, make_mesh
from memo_tpu.query.engine import QueryEngine


def _store(rng, n_docs=5, rec_len=400, kind="conservation"):
    ms = [rng.integers(0, 40, size=(rec_len, n_docs - 1)).astype(np.int32)]
    return store_from_ms(ms, ["chr0"], [rec_len], n_docs, kind)


@pytest.fixture(scope="module")
def store():
    return _store(np.random.default_rng(7))


@pytest.fixture(scope="module")
def memb_store():
    return _store(np.random.default_rng(8), kind="membership")


@pytest.mark.parametrize("dp,sp", [(1, 8), (2, 4), (1, 1), (1, 3)])
@pytest.mark.parametrize("k", [1, 3, 31, 101])
def test_resident_conservation_matches_engine(store, dp, sp, k):
    mesh = make_mesh(dp=dp, sp=sp, devices=jax.devices()[: dp * sp])
    rq = ResidentShardedQuery(store, mesh, k_max=128)
    oracle = QueryEngine(store, backend="numpy")
    for qs, qe in [(0, 400), (37, 229), (399, 400), (0, 1)]:
        got = rq.conservation(qs, qe, k)
        want = oracle.conservation("chr0", qs, qe, k)
        np.testing.assert_array_equal(got, want, err_msg=f"{dp}x{sp} k={k} {qs}-{qe}")


@pytest.mark.parametrize("k", [1, 4, 31])
def test_resident_membership_matches_engine(memb_store, k):
    mesh = make_mesh(dp=1, sp=8)
    rq = ResidentShardedQuery(memb_store, mesh, k_max=64)
    oracle = QueryEngine(memb_store, backend="numpy")
    got = rq.membership(3, 391, k)
    np.testing.assert_array_equal(got, oracle.membership("chr0", 3, 391, k))


def test_resident_store_is_sharded_once(store):
    """The placement is sharded over sp and reused across queries/k."""
    mesh = make_mesh(dp=1, sp=8)
    rq = ResidentShardedQuery(store, mesh, k_max=64)
    # Each device holds exactly one row-block of the [n_sp, M] arrays.
    shard_devs = {s.device for s in rq._d_start.addressable_shards}
    assert len(shard_devs) == 8
    assert rq._d_start.sharding.spec == ("sp", None)
    before = rq._d_start
    rq.conservation(0, 400, 5)
    rq.conservation(0, 400, 31)
    assert rq._d_start is before  # same placed array; no re-upload per query


def test_resident_windows_batch(store):
    mesh = make_mesh(dp=1, sp=4, devices=jax.devices()[:4])
    rq = ResidentShardedQuery(store, mesh, k_max=64)
    oracle = QueryEngine(store, backend="numpy")
    windows = [(0, 100), (50, 399), (200, 201)]
    outs = rq.conservation_windows(windows, 9)
    for (qs, qe), got in zip(windows, outs):
        np.testing.assert_array_equal(got, oracle.conservation("chr0", qs, qe, 9))


def test_resident_windows_membership_batch(memb_store):
    mesh = make_mesh(dp=1, sp=4, devices=jax.devices()[:4])
    rq = ResidentShardedQuery(memb_store, mesh, k_max=64)
    oracle = QueryEngine(memb_store, backend="numpy")
    windows = [(0, 100), (50, 399), (200, 201)]
    outs = rq.membership_windows(windows, 9)
    for (qs, qe), got in zip(windows, outs):
        np.testing.assert_array_equal(got, oracle.membership("chr0", qs, qe, 9))


def test_resident_one_dispatch_per_record_k(store):
    """N windows of one (record, k) cost exactly ONE full-record SPMD
    dispatch (VERDICT r3 #3): the memoized whole-record output serves every
    per-window call, and a new k adds exactly one more dispatch."""
    mesh = make_mesh(dp=1, sp=4, devices=jax.devices()[:4])
    rq = ResidentShardedQuery(store, mesh, k_max=64)
    oracle = QueryEngine(store, backend="numpy")
    windows = [(w, min(w + 40, 400)) for w in range(0, 400, 40)]
    for qs, qe in windows:  # the CLI's per-region call pattern
        np.testing.assert_array_equal(
            rq.conservation(qs, qe, 9), oracle.conservation("chr0", qs, qe, 9)
        )
    assert rq.dispatch_count == 1
    rq.conservation(0, 400, 31)
    assert rq.dispatch_count == 2  # distinct k -> one more
    rq.membership(0, 400, 9)
    assert rq.dispatch_count == 3  # distinct mode -> one more
    rq.conservation_windows(windows, 9)
    assert rq.dispatch_count == 3  # still cached


def test_resident_k_above_kmax_refused(store):
    rq = ResidentShardedQuery(store, make_mesh(dp=1, sp=2, devices=jax.devices()[:2]), k_max=16)
    with pytest.raises(ValueError, match="k_max"):
        rq.conservation(0, 10, 17)


def test_resident_multirecord_auto_placement():
    """A multi-record store with no record= lands every record in one
    placement; per-record reads then need record=."""
    rng = np.random.default_rng(3)
    ms = [rng.integers(0, 9, size=(64, 3)).astype(np.int32) for _ in range(2)]
    st = store_from_ms(ms, ["a", "b"], [64, 64], 4, "conservation")
    rq = ResidentShardedQuery(st, make_mesh(dp=1, sp=2, devices=jax.devices()[:2]), k_max=32)
    assert rq.records == ["a", "b"]
    with pytest.raises(ValueError, match="record"):
        rq.conservation(0, 10, 7)
    oracle = QueryEngine(st, backend="numpy")
    for name in ("a", "b"):
        np.testing.assert_array_equal(
            rq.conservation(5, 60, 7, record=name), oracle.conservation(name, 5, 60, 7)
        )
    # single-record placement still works on a multi-record store
    rq1 = ResidentShardedQuery(
        st, make_mesh(dp=1, sp=2, devices=jax.devices()[:2]), record="b", k_max=32
    )
    np.testing.assert_array_equal(
        rq1.conservation(5, 60, 7), oracle.conservation("b", 5, 60, 7)
    )


@pytest.mark.parametrize("dp,sp,n_rec", [(2, 4, 2), (4, 2, 3), (2, 2, 5)])
def test_resident_dp_serves_distinct_records(dp, sp, n_rec):
    """VERDICT r4 #7: the dp axis must carry DISTINCT records from one
    placement (records > n_dp stack into batch slots), one dispatch per
    (k, mode), bit-exact vs the single-device engine — including records of
    different lengths (slab padding differs per record)."""
    rng = np.random.default_rng(dp * 10 + n_rec)
    lens = [97 + 31 * i for i in range(n_rec)]
    ms = [rng.integers(0, 25, size=(ln, 4)).astype(np.int32) for ln in lens]
    names = [f"r{i}" for i in range(n_rec)]
    st = store_from_ms(ms, names, lens, 5, "conservation")
    mesh = make_mesh(dp=dp, sp=sp, devices=jax.devices()[: dp * sp])
    rq = ResidentShardedQuery(st, mesh, records=names, k_max=64)
    assert rq._d_start.sharding.spec == (None, "dp", "sp", None)
    oracle = QueryEngine(st, backend="numpy")
    for k in (2, 31):
        for i, name in enumerate(names):
            np.testing.assert_array_equal(
                rq.conservation(0, lens[i], k, record=name),
                oracle.conservation(name, 0, lens[i], k),
                err_msg=f"dp={dp} sp={sp} rec={name} k={k}",
            )
    assert rq.dispatch_count == 2  # one dispatch per k, ALL records served

    # membership twin on the same placement
    stm = store_from_ms(ms, names, lens, 5, "membership")
    rqm = ResidentShardedQuery(stm, mesh, records=names, k_max=64)
    om = QueryEngine(stm, backend="numpy")
    for i, name in enumerate(names):
        np.testing.assert_array_equal(
            rqm.membership(0, lens[i], 7, record=name),
            om.membership(name, 0, lens[i], 7),
        )
    assert rqm.dispatch_count == 1


def test_resident_placement_length_filter():
    """Rows with length >= k_max-1 never mark at any servable k and are
    dropped at placement time; outputs stay exact across k <= k_max on a
    store dominated by too-long intervals."""
    from memo_tpu.index.store import IntervalStore

    rng = np.random.default_rng(23)
    L, n_iv, n = 300, 600, 5
    starts = np.sort(rng.integers(0, L, n_iv)).astype(np.int64)
    # 80% long intervals (>= 63 at k_max=64), 20% short
    long = rng.random(n_iv) < 0.8
    lens = np.where(long, rng.integers(63, 200, n_iv), rng.integers(0, 40, n_iv))
    st = IntervalStore(
        record_names=["c"],
        record_lens=[L],
        n_docs=n,
        kind="conservation",
        rec_id=np.zeros(n_iv, np.int32),
        start=starts,
        end=starts + lens,
        order=rng.integers(1, n, n_iv).astype(np.int64),
    )
    mesh = make_mesh(dp=1, sp=4, devices=jax.devices()[:4])
    rq = ResidentShardedQuery(st, mesh, k_max=64)
    # the placement really shrank: padded rows < total candidate rows
    assert rq.rows_per_shard * 4 < n_iv
    oracle = QueryEngine(st, backend="numpy")
    for k in (1, 2, 31, 64):
        np.testing.assert_array_equal(
            rq.conservation(0, L, k), oracle.conservation("c", 0, L, k),
            err_msg=f"k={k}",
        )


def test_resident_dense_random_intervals():
    """Adversarial geometry: heavy overlap, bookends, spans across every slab
    boundary of the mesh."""
    from memo_tpu.index.store import IntervalStore

    rng = np.random.default_rng(11)
    L, n_iv, n = 257, 800, 6  # L not divisible by sp: exercises slab padding
    starts = np.sort(rng.integers(0, L + 3, n_iv)).astype(np.int64)
    ends = starts + rng.integers(0, 120, n_iv)
    orders = rng.integers(1, n, n_iv).astype(np.int64)
    st = IntervalStore(
        record_names=["c"],
        record_lens=[L],
        n_docs=n,
        kind="conservation",
        rec_id=np.zeros(n_iv, np.int32),
        start=starts,
        end=ends,
        order=orders,
    )
    mesh = make_mesh(dp=1, sp=8)
    rq = ResidentShardedQuery(st, mesh, k_max=256)
    oracle = QueryEngine(st, backend="numpy")
    for k in (1, 2, 31, 120, 256):
        np.testing.assert_array_equal(
            rq.conservation(0, L, k), oracle.conservation("c", 0, L, k), err_msg=f"k={k}"
        )
