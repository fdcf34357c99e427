"""LockProvider seam (locking.py; reference meta/MetaLock.scala:19-50).

The commit protocol must work unchanged through ANY provider honoring
the contract (mutual exclusion, bounded-wait timeout, idempotent-ish
release). Two in-process fakes stand in for multi-host arbiters: an
in-memory mutex (the DynamoDB/ZK shape) and a recording wrapper that
audits acquire/release pairing under a real commit storm.
"""

import os
import threading
import time

import pytest

from starlake_spark import locking
from starlake_spark.locking import FileLockProvider, LockProvider
from starlake_spark.meta import ManifestStore, MetaError


@pytest.fixture(autouse=True)
def _restore_provider():
    yield
    locking.set_lock_provider(None)


class InMemoryLockProvider(LockProvider):
    """ZK/DynamoDB-shaped fake: one mutex per table path, held across
    threads, bounded wait."""

    def __init__(self):
        self._locks: dict[str, threading.Lock] = {}
        self._guard = threading.Lock()

    def acquire(self, meta_dir, table_path, timeout_s):
        with self._guard:
            lk = self._locks.setdefault(table_path, threading.Lock())
        if not lk.acquire(timeout=timeout_s):
            raise TimeoutError(f"timeout on {table_path}")
        return (table_path, lk)

    def release(self, handle):
        handle[1].release()


class RecordingProvider(LockProvider):
    """Wraps the file provider; records the event sequence so a storm
    can assert strict acquire/release alternation (i.e. the protocol
    never double-acquires or leaks a handle)."""

    def __init__(self):
        self.inner = FileLockProvider()
        self.events: list[str] = []
        self._guard = threading.Lock()

    def acquire(self, meta_dir, table_path, timeout_s):
        h = self.inner.acquire(meta_dir, table_path, timeout_s)
        with self._guard:
            self.events.append("A")
        return h

    def release(self, handle):
        with self._guard:
            self.events.append("R")
        self.inner.release(handle)


def _store(tmp_path, name="t"):
    p = str(tmp_path / name)
    os.makedirs(os.path.join(p, "_star_meta", "versions"), exist_ok=True)
    from starlake_spark.meta import TableInfo

    st = ManifestStore(p)
    st.create(TableInfo(table_path=p, table_id="tid-" + name,
                        schema_json="{}"))
    return st


def _storm(store, n_threads=8, n_commits=4):
    errs = []

    def work():
        for _ in range(n_commits):
            try:
                txn = store.new_transaction()
                store.commit(txn)
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

    ts = [threading.Thread(target=work) for _ in range(n_threads)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs
    return store.snapshot().version


@pytest.mark.parametrize("provider_cls", [InMemoryLockProvider,
                                          RecordingProvider])
def test_commit_storm_through_provider(tmp_path, provider_cls):
    """Contract: 32 concurrent commits all land, versions are dense
    (mutual exclusion → no lost update), through each fake provider."""
    prov = provider_cls()
    locking.set_lock_provider(prov)
    store = _store(tmp_path)
    v = _storm(store)
    assert v == 32  # create_table is v0; every commit landed exactly once
    assert store.list_versions() == list(range(33))
    if isinstance(prov, RecordingProvider):
        # strict alternation: the protocol never nests or leaks a handle
        assert len(prov.events) >= 64
        depth = 0
        for e in prov.events:
            depth += 1 if e == "A" else -1
            assert depth in (0, 1), prov.events
        assert depth == 0


def test_provider_timeout_becomes_meta_error(tmp_path):
    """A held lock times the next committer out as MetaError (the
    commit-protocol contract), not a raw TimeoutError."""

    class HeldProvider(LockProvider):
        def acquire(self, meta_dir, table_path, timeout_s):
            raise TimeoutError(f"commit lock timeout on {table_path}")

        def release(self, handle):  # pragma: no cover
            pass

    locking.set_lock_provider(HeldProvider())
    store = _store(tmp_path)
    with pytest.raises(MetaError, match="timeout"):
        store.commit(store.new_transaction())


def test_file_provider_stale_break(tmp_path):
    """Default provider breaks a crashed committer's lock after
    stale_s — liveness without a human rm."""
    prov = FileLockProvider(stale_s=0.2, poll_s=0.01)
    meta = str(tmp_path / "_star_meta")
    os.makedirs(meta)
    h = prov.acquire(meta, "tbl", timeout_s=5)
    os.utime(h[0], (time.time() - 10, time.time() - 10))  # backdate = crash
    h2 = prov.acquire(meta, "tbl", timeout_s=5)
    prov.release(h2)
    prov.release(h)  # idempotent: file already gone must not raise


def test_release_survives_reaped_handle(tmp_path):
    prov = FileLockProvider()
    meta = str(tmp_path / "_star_meta")
    os.makedirs(meta)
    h = prov.acquire(meta, "tbl", timeout_s=1)
    os.unlink(h[0])
    prov.release(h)  # must not raise


def test_stale_break_toctou_two_breakers(tmp_path):
    """Regression for the stale-break TOCTOU: waiter B observes a
    stale lock; before B acts, waiter A breaks it and acquires a FRESH
    lock at the same path. B's break must NOT destroy A's fresh lock
    (the old unlink-based break did — two concurrent holders)."""
    prov = FileLockProvider(stale_s=5.0, poll_s=0.01)
    meta = str(tmp_path / "_star_meta")
    os.makedirs(meta)
    lock = os.path.join(meta, "_commit.lock")

    # crashed committer's stale lock; B observes it stale (the stat in
    # acquire's loop) — simulated by just knowing it's stale here
    with open(lock, "w") as f:
        f.write("crashed")
    os.utime(lock, (time.time() - 10, time.time() - 10))

    # A wins the break and immediately acquires a fresh lock
    prov._break_stale(lock)
    h_a = prov.acquire(meta, "tbl", timeout_s=1)
    with open(lock) as f:
        a_token = f.read()

    # B now executes its (stale-observation-based) break against what
    # is actually A's fresh lock — it must hand the lock back intact
    prov._break_stale(lock)
    assert os.path.exists(lock)
    with open(lock) as f:
        assert f.read() == a_token  # A still holds; mutual exclusion kept

    # and no second acquire can sneak in while A holds
    with pytest.raises(TimeoutError):
        prov.acquire(meta, "tbl", timeout_s=0.3)
    prov.release(h_a)
    assert not os.path.exists(lock)


def test_release_skips_lock_it_no_longer_owns(tmp_path):
    """If a holder's lock was reaped and the path re-acquired by
    another writer, the original holder's release must not unlink the
    new writer's lock."""
    prov = FileLockProvider(stale_s=0.1, poll_s=0.01)
    meta = str(tmp_path / "_star_meta")
    os.makedirs(meta)
    h_a = prov.acquire(meta, "tbl", timeout_s=1)
    os.utime(h_a[0], (time.time() - 10, time.time() - 10))  # A "crashed"
    h_b = prov.acquire(meta, "tbl", timeout_s=2)  # B breaks + acquires
    prov.release(h_a)  # stale handle: must be a no-op
    assert os.path.exists(h_b[0])
    prov.release(h_b)
    assert not os.path.exists(h_b[0])


def test_env_var_registration(tmp_path, monkeypatch):
    """STARLAKE_LOCK_PROVIDER='mod:Cls' installs a provider at import
    (spark-submit deployments can't call set_lock_provider)."""
    monkeypatch.setenv("STARLAKE_LOCK_PROVIDER",
                       "tests.test_lock_provider:InMemoryLockProvider")
    locking._from_env()
    # importlib may re-import this module under its package name, so
    # compare by class name, not object identity
    assert type(locking.get_lock_provider()).__name__ == "InMemoryLockProvider"
    # query-string kwargs (the networked provider's deployment path)
    monkeypatch.setenv(
        "STARLAKE_LOCK_PROVIDER",
        "starlake_spark.locking:TCPLockProvider"
        "?host=10.0.0.5&port=7878&lease_s=12.5")
    locking._from_env()
    prov = locking.get_lock_provider()
    assert (type(prov).__name__, prov.host, prov.port, prov.lease_s) == \
        ("TCPLockProvider", "10.0.0.5", 7878, 12.5)
    locking.set_lock_provider(None)
    assert isinstance(locking.get_lock_provider(), FileLockProvider)


def test_sqlite_provider_storm_and_cross_process(tmp_path):
    """The DB-arbitrated provider passes the same storm contract, and
    excludes writers across PROCESSES (the multi-host shape: any
    arbiter reachable by every writer — here a shared SQLite file,
    in production a Postgres/DynamoDB row)."""
    import multiprocessing as mp

    from starlake_spark.locking import SQLiteLockProvider

    db = str(tmp_path / "locks.db")
    locking.set_lock_provider(SQLiteLockProvider(db))
    store = _store(tmp_path)
    assert _storm(store) == 32
    assert store.list_versions() == list(range(33))

    ctx = mp.get_context("spawn")
    with ctx.Pool(3) as pool:
        results = pool.starmap(
            _sqlite_mp_committer,
            [(str(tmp_path / "t"), db, p, 6) for p in range(3)])
    assert sorted(results) == [0, 1, 2]
    assert store.latest_version() == 32 + 18  # every commit landed


def test_sqlite_provider_stale_ttl_break(tmp_path):
    """A crashed committer's row older than stale_s is reaped — the
    reference lock row's TTL expiry."""
    from starlake_spark.locking import SQLiteLockProvider

    db = str(tmp_path / "locks.db")
    prov = SQLiteLockProvider(db, stale_s=0.2, poll_s=0.02)
    h = prov.acquire(str(tmp_path), "tbl", timeout_s=5)
    # simulate the crash: handle dropped without release
    import time as _t

    _t.sleep(0.3)
    h2 = prov.acquire(str(tmp_path), "tbl", timeout_s=2)
    prov.release(h2)


def _add_file_txn(store, table_path, partition, tag):
    """A transaction adding one real parquet file to ``partition``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from starlake_spark.meta import DataFileInfo

    rel = os.path.join("data", f"{partition}_{tag}", "part-0.parquet")
    abs_p = os.path.join(table_path, rel)
    os.makedirs(os.path.dirname(abs_p), exist_ok=True)
    pq.write_table(pa.table({"id": pa.array([1], type=pa.int64())}), abs_p)
    txn = store.new_transaction()
    txn.add_files([DataFileInfo(
        path=rel, range_value=partition, bucket_id=-1,
        size=os.path.getsize(abs_p), write_version=-1,
        is_base_file=True, exist_cols=["id"], num_rows=1)])
    return txn


def test_commit_builds_state_outside_lock(tmp_path, monkeypatch):
    """Structural pin for the optimistic commit protocol: the
    O(table-state) build + serialization (_build_commit) must run with
    the table lock NOT held on the first (uncontended) attempt — the
    lock guards only the CAS publish. A regression to build-under-lock
    shows up as the lock file existing during the build."""
    locking.set_lock_provider(None)  # file provider: held ⇔ file exists
    store = _store(tmp_path)
    lockfile = os.path.join(store.meta_dir, "_commit.lock")
    seen: list[bool] = []
    orig = ManifestStore._build_commit

    def probe(self, txn, current):
        seen.append(os.path.exists(lockfile))
        return orig(self, txn, current)

    monkeypatch.setattr(ManifestStore, "_build_commit", probe)
    store.commit(_add_file_txn(store, str(tmp_path / "t"), "p0", "a"))
    assert seen == [False]


def test_disjoint_partition_storm_parallel_commits(tmp_path):
    """N writers × N DISJOINT partitions: every commit lands, versions
    are dense, and none raises CommitConflictError — disjoint-partition
    writers never conflict; the CAS loop absorbs version races without
    surfacing them. (The expensive build work overlaps across writers —
    pinned structurally by test_commit_builds_state_outside_lock.)"""
    store = _store(tmp_path)
    tp = str(tmp_path / "t")
    errs: list[Exception] = []

    def work(writer_id: int):
        for i in range(4):
            try:
                store.commit(_add_file_txn(
                    store, tp, f"part={writer_id}", f"c{i}"))
            except Exception as e:  # pragma: no cover - surfaced below
                errs.append(e)

    ts = [threading.Thread(target=work, args=(w,)) for w in range(8)]
    [t.start() for t in ts]
    [t.join() for t in ts]
    assert not errs, errs
    snap = store.snapshot()
    assert snap.version == 32
    assert store.list_versions() == list(range(33))
    # every writer's every file is present in its own partition
    for w in range(8):
        ps = snap.partitions[f"part={w}"]
        assert len(ps.files) == 4


def test_tcp_provider_storm_and_cross_process(tmp_path):
    """The NETWORKED provider passes the same storm contract, and
    excludes writers across PROCESSES that share only the socket — the
    true multi-host shape (each spawned process stands in for a host:
    no shared memory, no shared lock file, just the lease server)."""
    import multiprocessing as mp

    from starlake_spark.locking import LeaseServer, TCPLockProvider

    srv = LeaseServer()
    try:
        locking.set_lock_provider(TCPLockProvider(srv.host, srv.port))
        store = _store(tmp_path)
        assert _storm(store) == 32
        assert store.list_versions() == list(range(33))

        ctx = mp.get_context("spawn")
        with ctx.Pool(3) as pool:
            results = pool.starmap(
                _tcp_mp_committer,
                [(str(tmp_path / "t"), srv.host, srv.port, p, 6)
                 for p in range(3)])
        assert sorted(results) == [0, 1, 2]
        assert store.latest_version() == 32 + 18  # every commit landed
    finally:
        locking.set_lock_provider(None)
        srv.shutdown()


def test_tcp_provider_lease_ttl_break_and_timeout(tmp_path):
    """A crashed committer's lease expires after lease_s (liveness);
    while a lease is live, a second acquire times out (exclusion);
    release is idempotent after the TTL reaped the lease."""
    from starlake_spark.locking import LeaseServer, TCPLockProvider

    srv = LeaseServer()
    try:
        prov = TCPLockProvider(srv.host, srv.port, lease_s=0.4,
                               poll_s=0.02)
        h = prov.acquire(str(tmp_path), "tbl", timeout_s=5)
        with pytest.raises(TimeoutError):
            prov.acquire(str(tmp_path), "tbl", timeout_s=0.15)
        # crash: stop the heartbeat (a live holder renews forever — a
        # real crash kills the renewing process) → TTL expiry grants
        h["stop"].set()
        time.sleep(0.6)
        h2 = prov.acquire(str(tmp_path), "tbl", timeout_s=2)
        prov.release(h)   # stale handle: server answers NOTOWNER, no raise
        prov.release(h2)
        h3 = prov.acquire(str(tmp_path), "tbl", timeout_s=1)
        prov.release(h3)
    finally:
        srv.shutdown()


def _tcp_mp_committer(table_path: str, host: str, port: int, proc_id: int,
                      n_commits: int):
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from starlake_spark import locking as lk
    from starlake_spark.locking import TCPLockProvider
    from starlake_spark.meta import DataFileInfo, ManifestStore

    lk.set_lock_provider(TCPLockProvider(host, port))
    store = ManifestStore(table_path)
    for i in range(n_commits):
        rel = _os.path.join("data", f"tcp_{proc_id}_{i}", "part-0.parquet")
        abs_p = _os.path.join(table_path, rel)
        _os.makedirs(_os.path.dirname(abs_p), exist_ok=True)
        pq.write_table(pa.table({"id": pa.array([proc_id], type=pa.int64())}),
                       abs_p)
        txn = store.new_transaction()
        txn.add_files([DataFileInfo(
            path=rel, range_value="", bucket_id=-1,
            size=_os.path.getsize(abs_p), write_version=-1,
            is_base_file=True, exist_cols=["id"], num_rows=1)])
        store.commit(txn)
    return proc_id


def _sqlite_mp_committer(table_path: str, db: str, proc_id: int,
                         n_commits: int):
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from starlake_spark import locking as lk
    from starlake_spark.locking import SQLiteLockProvider
    from starlake_spark.meta import DataFileInfo, ManifestStore

    lk.set_lock_provider(SQLiteLockProvider(db))
    store = ManifestStore(table_path)
    for i in range(n_commits):
        rel = _os.path.join("data", f"sq_{proc_id}_{i}", "part-0.parquet")
        abs_p = _os.path.join(table_path, rel)
        _os.makedirs(_os.path.dirname(abs_p), exist_ok=True)
        pq.write_table(pa.table({"id": pa.array([proc_id], type=pa.int64())}), abs_p)
        txn = store.new_transaction()
        txn.add_files([DataFileInfo(
            path=rel, range_value="", bucket_id=-1,
            size=_os.path.getsize(abs_p), write_version=-1,
            is_base_file=True, exist_cols=["id"], num_rows=1)])
        store.commit(txn)
    return proc_id


def test_tcp_heartbeat_keeps_short_lease_alive(tmp_path):
    """A commit critical section LONGER than lease_s must not lose the
    lock (r5 ADVICE: 'a critical section longer than lease_s silently
    grants the lock to a second writer'): the heartbeat renews, so a
    second acquire still times out well past the nominal TTL, and
    validate() stays true throughout."""
    from starlake_spark.locking import LeaseServer, TCPLockProvider

    srv = LeaseServer()
    try:
        prov = TCPLockProvider(srv.host, srv.port, lease_s=0.3,
                               poll_s=0.02)
        h = prov.acquire(str(tmp_path), "tbl", timeout_s=5)
        time.sleep(1.0)  # > 3 TTLs
        assert prov.validate(h)
        with pytest.raises(TimeoutError):
            prov.acquire(str(tmp_path), "tbl", timeout_s=0.15)
        prov.release(h)
        h2 = prov.acquire(str(tmp_path), "tbl", timeout_s=1)
        prov.release(h2)
    finally:
        srv.shutdown()


def test_tcp_release_joins_heartbeat_before_release_rpc(tmp_path):
    """r6 ADVICE locking.py:557: release() must JOIN the heartbeat
    thread before the RELEASE RPC — a renewal still in flight could
    otherwise land after the release, re-granting the lease to the
    gone owner (orphan blocks writers for up to lease_s). Structural
    pin: the thread is dead by the time release() returns; behavioral
    pin: an immediate re-acquire by a fresh owner never waits a TTL."""
    from starlake_spark.locking import LeaseServer, TCPLockProvider

    srv = LeaseServer()
    try:
        prov = TCPLockProvider(srv.host, srv.port, lease_s=0.3,
                               poll_s=0.02)
        for _ in range(5):
            h = prov.acquire(str(tmp_path), "tbl", timeout_s=5)
            time.sleep(0.12)  # land mid-heartbeat-interval
            prov.release(h)
            assert not h["thread"].is_alive()
            h2 = prov.acquire(str(tmp_path), "tbl", timeout_s=0.25)
            prov.release(h2)
    finally:
        srv.shutdown()


def test_tcp_validate_fences_out_lost_holder(tmp_path):
    """Arbiter restart without persistence drops the lease; once a
    SUCCESSOR has been granted, the original holder's validate() must
    fail (fencing) so its publish is refused instead of racing."""
    from starlake_spark.locking import LeaseServer, TCPLockProvider

    srv = LeaseServer()
    host, port = srv.host, srv.port
    prov = TCPLockProvider(host, port, lease_s=30.0, poll_s=0.02)
    h = prov.acquire(str(tmp_path), "tbl", timeout_s=5)
    assert prov.validate(h)
    h["stop"].set()  # freeze the holder (stalled process)
    srv.shutdown()
    srv2 = LeaseServer(host, port)  # restart, in-memory leases gone
    try:
        h2 = prov.acquire(str(tmp_path), "tbl", timeout_s=5)  # successor
        assert prov.validate(h2)
        assert not prov.validate(h)  # CHECK: owner mismatch → NO
        prov.release(h2)
    finally:
        srv2.shutdown()


def test_lease_server_persistence_survives_restart(tmp_path):
    """persist_path journal: a restarted arbiter refuses grants for a
    table whose prior lease TTL has not elapsed, and keeps the fence
    counter monotonic across the restart."""
    from starlake_spark.locking import LeaseServer, TCPLockProvider

    journal = str(tmp_path / "leases.json")
    srv = LeaseServer(persist_path=journal)
    host, port = srv.host, srv.port
    prov = TCPLockProvider(host, port, lease_s=5.0, poll_s=0.02)
    h = prov.acquire(str(tmp_path), "tbl", timeout_s=5)
    fence1 = int(h["fence"])
    h["stop"].set()
    srv.shutdown()
    srv2 = LeaseServer(host, port, persist_path=journal)
    try:
        # prior lease honored from the journal: grant refused
        with pytest.raises(TimeoutError):
            prov.acquire(str(tmp_path), "tbl", timeout_s=0.3)
        assert prov.validate(h)  # original holder still checks out
        prov.release(h)
        h2 = prov.acquire(str(tmp_path), "tbl", timeout_s=2)
        assert int(h2["fence"]) > fence1  # fence monotonic across restart
        prov.release(h2)
    finally:
        srv2.shutdown()


def test_commit_refuses_publish_on_lost_lease(tmp_path):
    """The publish path calls provider.validate() under the lock: a
    provider reporting a lost lease fails the commit with MetaError
    instead of double-publishing."""

    class LostLeaseProvider(InMemoryLockProvider):
        def validate(self, handle):
            return False

    locking.set_lock_provider(LostLeaseProvider())
    store = _store(tmp_path)
    txn = store.new_transaction()
    with pytest.raises(MetaError, match="commit lock lost"):
        store.commit(txn)


def test_sqlite_validate_tracks_row_ownership(tmp_path):
    from starlake_spark.locking import SQLiteLockProvider

    prov = SQLiteLockProvider(str(tmp_path / "locks.db"), stale_s=60)
    h = prov.acquire(str(tmp_path), "tbl", timeout_s=5)
    assert prov.validate(h)
    # reap the row out from under the holder (simulated TTL break)
    h[0].execute("DELETE FROM commit_locks WHERE table_path = ?",
                 ("tbl",))
    assert not prov.validate(h)
    prov.release(h)


def test_file_release_rename_claim_preserves_successor(tmp_path):
    """release() after our lock was reaped and a successor acquired:
    the rename-claim must hand the successor's live lock back (r5
    ADVICE locking.py:151 read-then-unlink race, closed)."""
    meta = str(tmp_path)
    p1 = FileLockProvider(stale_s=60)
    h1 = p1.acquire(meta, "tbl", timeout_s=5)
    lock_path = h1[0]
    # reaper broke us; successor acquired a fresh lock
    os.unlink(lock_path)
    p2 = FileLockProvider(stale_s=60)
    h2 = p2.acquire(meta, "tbl", timeout_s=5)
    p1.release(h1)  # must NOT delete the successor's lock
    assert os.path.exists(lock_path)
    with open(lock_path, "rb") as f:
        assert f.read().decode() == h2[1]
    p2.release(h2)
    assert not os.path.exists(lock_path)


# ---------- partition-scoped locks (MetaCommit.takePartitionsWriteLock,
# MetaCommit.scala:334-430: one write lock per touched range) ----------


def _scoped_contract(provider, meta_dir):
    """Every scope-supporting provider: disjoint scopes grant
    concurrently; the same scope excludes; table-wide and scoped locks
    are independent keys."""
    assert provider.supports_scopes
    a = provider.acquire_scoped(meta_dir, "tbl", 5, scope="part=a")
    b = provider.acquire_scoped(meta_dir, "tbl", 5, scope="part=b")
    t = provider.acquire(meta_dir, "tbl", 5)  # table-wide: independent
    with pytest.raises(TimeoutError):
        provider.acquire_scoped(meta_dir, "tbl", 0.3, scope="part=a")
    assert provider.validate(a) and provider.validate(b)
    provider.release(a)
    # released scope grantable again; b still held
    a2 = provider.acquire_scoped(meta_dir, "tbl", 5, scope="part=a")
    with pytest.raises(TimeoutError):
        provider.acquire_scoped(meta_dir, "tbl", 0.3, scope="part=b")
    for h in (a2, b, t):
        provider.release(h)


def test_file_provider_scoped_contract(tmp_path):
    _scoped_contract(FileLockProvider(), str(tmp_path))
    assert os.listdir(tmp_path) == []  # all scoped lock files removed


def test_sqlite_provider_scoped_contract(tmp_path):
    from starlake_spark.locking import SQLiteLockProvider

    _scoped_contract(SQLiteLockProvider(str(tmp_path / "locks.db")),
                     str(tmp_path))


def test_tcp_provider_scoped_contract(tmp_path):
    from starlake_spark.locking import LeaseServer, TCPLockProvider

    srv = LeaseServer()
    try:
        _scoped_contract(
            TCPLockProvider("127.0.0.1", srv.port, lease_s=30.0,
                            poll_s=0.02),
            str(tmp_path))
    finally:
        srv.shutdown()


def test_unscoped_provider_falls_back_to_table_lock(tmp_path):
    """A third-party provider without supports_scopes gets the
    pre-partition-lock protocol: acquire_scoped is never called, every
    commit arbitrates through the plain table-wide lock, and the storm
    still lands every commit exactly once (this is what keeps the
    RecordingProvider alternation test meaningful)."""

    class PlainProvider(LockProvider):
        def __init__(self):
            self.inner = FileLockProvider()
            self.scoped_calls = 0

        def acquire(self, meta_dir, table_path, timeout_s):
            return self.inner.acquire(meta_dir, table_path, timeout_s)

        def release(self, handle):
            self.inner.release(handle)

        def acquire_scoped(self, *a, **k):  # pragma: no cover - guard
            self.scoped_calls += 1
            raise AssertionError("acquire_scoped on unscoped provider")

    prov = PlainProvider()
    locking.set_lock_provider(prov)
    try:
        store = _store(tmp_path)
        v = _storm(store, n_threads=4, n_commits=2)
        assert v == 8
        assert prov.scoped_calls == 0
    finally:
        locking.set_lock_provider(None)


def test_same_partition_writers_serialize_on_scope_lock(tmp_path):
    """Two commits to the SAME partition must not overlap their builds:
    the second blocks on the partition's scope lock until the first
    releases (reference lockSinglePartition semantics) — prevented, not
    detected-and-rebuilt."""
    locking.set_lock_provider(None)
    store = _store(tmp_path)
    tp = str(tmp_path / "t")
    in_build = threading.Event()
    release_build = threading.Event()
    overlaps = []
    orig = ManifestStore._build_commit

    def gated(self, txn, current):
        if not in_build.is_set():
            in_build.set()
            release_build.wait(10)
        elif not release_build.is_set():
            overlaps.append(True)  # second build ran while first held
        return orig(self, txn, current)

    ManifestStore._build_commit = gated
    try:
        t1 = threading.Thread(target=store.commit, args=(
            _add_file_txn(store, tp, "part=x", "one"),))
        t1.start()
        in_build.wait(10)
        t2 = threading.Thread(target=store.commit, args=(
            _add_file_txn(store, tp, "part=x", "two"),))
        t2.start()
        # give t2 time to reach the scope lock and block on it
        time.sleep(0.5)
        assert not overlaps, "same-partition build overlapped"
        release_build.set()
        t1.join(30)
        t2.join(30)
    finally:
        ManifestStore._build_commit = orig
    assert not overlaps
    snap = store.snapshot()
    assert snap.version == 2
    assert len(snap.partitions["part=x"].files) == 2


def test_tcp_provider_disjoint_partition_storm(tmp_path):
    """The NETWORKED provider under the full partition-scoped commit
    protocol: 6 threads × disjoint partitions through a live
    LeaseServer — every commit lands, versions dense, and every lease
    (scope locks + publish micro-locks) is released at the end."""
    from starlake_spark.locking import LeaseServer, TCPLockProvider

    srv = LeaseServer()
    locking.set_lock_provider(
        TCPLockProvider("127.0.0.1", srv.port, lease_s=30.0, poll_s=0.02))
    try:
        store = _store(tmp_path)
        tp = str(tmp_path / "t")
        errs: list[Exception] = []

        def work(w):
            for i in range(3):
                try:
                    store.commit(_add_file_txn(
                        store, tp, f"part={w}", f"c{i}"))
                except Exception as e:  # pragma: no cover
                    errs.append(e)

        ts = [threading.Thread(target=work, args=(w,)) for w in range(6)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert not errs, errs
        snap = store.snapshot()
        assert snap.version == 18
        for w in range(6):
            assert len(snap.partitions[f"part={w}"].files) == 3
        # all leases released: every scope (and the publish lock) must
        # grant IMMEDIATELY to a fresh owner — an orphaned lease would
        # block until its TTL
        prov = locking.get_lock_provider()
        for scope in [f"part={w}" for w in range(6)] + [
                ManifestStore.PUBLISH_SCOPE, None]:
            h = prov.acquire_scoped(store.meta_dir, store.table_path,
                                    0.5, scope=scope)
            prov.release(h)
    finally:
        locking.set_lock_provider(None)
        srv.shutdown()
