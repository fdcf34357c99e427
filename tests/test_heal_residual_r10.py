"""Round-10 verdict task #3 + ADVICE (low): the overwriteSchema heal
residual and the heal's lock reentrancy.

Round-9 residual (VERDICT "What's wrong"): writer A crashes between the
version-file CAS (version N, embedded TableInfo) and the
table_info.json swap; a concurrently-LIVE writer B — store already
open, info cached, so no heal ran — publishes a plain data commit N+1.
The latest version file then carries no embedded info, and the old heal
(which only inspected the latest version file, only on the first read
per store) never found the divergence: stale schema served forever.

Fixes under test:
1. Every version file propagates a (last_info_commit, last_info_version)
   pointer to the newest commit that embedded a TableInfo, so the heal
   finds a buried crashed overwrite in O(1) reads — no backscan.
2. The heal re-checks on EVERY refresh read, not just the first cold
   read, so a live writer converges too.
3. The heal's disk repair defers when this store instance already holds
   the (non-reentrant) table/publish lock — e.g. _publish_serialized's
   build reads table_info(refresh=True) under the table lock — instead
   of self-deadlocking for LOCK_TIMEOUT_S. The in-memory heal still
   applies (the log is authoritative).
"""

import json
import os
import time

import pytest
from pyspark.sql import types as T

from starlake_spark.meta import (DataFileInfo, ManifestStore, PartitionSnapshot,
                                 TableInfo)

NEW_SCHEMA = T.StructType([T.StructField("b", T.StringType())]).json()


def _mk_table(path):
    store = ManifestStore(path)
    info = TableInfo(
        table_path=os.path.abspath(path), table_id="t-heal10",
        schema_json=T.StructType([T.StructField("a", T.LongType())]).json())
    store.create(info)
    return store


def _file_txn(store, name):
    txn = store.new_transaction()
    with open(os.path.join(store.table_path, name), "wb") as f:
        f.write(b"x")
    txn.add_files([DataFileInfo(path=name, range_value="", bucket_id=-1,
                                size=1, write_version=-1, is_base_file=True,
                                exist_cols=["a"])])
    return txn


def _crash_overwrite(store, name="f-ow.parquet"):
    """Commit a schema overwrite but crash between the version CAS and
    the info swap (the round-8/9 crash window)."""
    txn = _file_txn(store, name)
    new_info = TableInfo.from_json(store.table_info().to_json())
    new_info.schema_json = NEW_SCHEMA
    txn.new_table_info = new_info

    def _boom(info):
        raise RuntimeError("injected crash after version CAS")

    orig = store._update_info_under_lock
    store._update_info_under_lock = _boom
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            store.commit(txn)
    finally:
        store._update_info_under_lock = orig


def _info_path(path):
    return os.path.join(path, "_star_meta", "table_info.json")


def test_plain_commit_after_crash_still_heals_cold(tmp_path):
    """THE round-9 residual: B's plain commit buries the crashed
    overwrite's version file; a later cold reader must still heal via
    the propagated pointer."""
    path = str(tmp_path / "t")
    writer_a = _mk_table(path)
    writer_a.commit(_file_txn(writer_a, "f0.parquet"))

    # live writer B opens the table BEFORE the crash (info cached)
    writer_b = ManifestStore(path)
    writer_b.table_info()

    _crash_overwrite(writer_a)
    crash_v = writer_a.latest_version()

    # B publishes a plain data commit; simulate the race where B's
    # refresh read happened before A's CAS landed (heal sees nothing)
    writer_b._heal_table_info = lambda: None
    writer_b.commit(_file_txn(writer_b, "f1.parquet"))

    # on-disk: latest version file has NO embedded info but carries the
    # pointer; table_info.json is still stale
    vdir = os.path.join(path, "_star_meta", "versions")
    latest = max(int(n[1:13]) for n in os.listdir(vdir)
                 if n.endswith(".json"))
    assert latest == crash_v + 1
    with open(os.path.join(vdir, f"v{latest:012d}.json")) as f:
        d = json.load(f)
    assert "table_info" not in d
    assert d["last_info_commit"] == crash_v
    stale = TableInfo.from_json(open(_info_path(path)).read())
    assert stale.schema_json != NEW_SCHEMA
    assert d["last_info_version"] > stale.schema_version

    # a fresh (cold) reader heals through the pointer and persists
    fresh = ManifestStore(path)
    assert fresh.table_info().schema_json == NEW_SCHEMA
    assert TableInfo.from_json(
        open(_info_path(path)).read()).schema_json == NEW_SCHEMA


def test_live_writer_heals_on_refresh(tmp_path):
    """A live store with a warm (stale) cache converges on its next
    refresh read — the heal is no longer first-read-only."""
    path = str(tmp_path / "t")
    writer_a = _mk_table(path)
    writer_b = ManifestStore(path)
    assert writer_b.table_info().schema_json != NEW_SCHEMA  # warm cache

    _crash_overwrite(writer_a)

    got = writer_b.table_info(refresh=True)
    assert got.schema_json == NEW_SCHEMA
    # and the repair persisted for everyone
    assert TableInfo.from_json(
        open(_info_path(path)).read()).schema_json == NEW_SCHEMA


def test_pointer_survives_many_commits_and_checkpoint(tmp_path):
    """The pointer propagates through delta AND full-checkpoint version
    files (FULL_SNAPSHOT_INTERVAL=10), so the heal works however far
    the overwrite gets buried."""
    path = str(tmp_path / "t")
    writer_a = _mk_table(path)
    writer_b = ManifestStore(path)
    writer_b.table_info()
    writer_b._heal_table_info = lambda: None

    _crash_overwrite(writer_a)
    for i in range(12):  # crosses a full checkpoint boundary
        writer_b.commit(_file_txn(writer_b, f"g{i}.parquet"))

    fresh = ManifestStore(path)
    assert fresh.table_info().schema_json == NEW_SCHEMA


def test_pruned_pointer_target_degrades_gracefully(tmp_path):
    """If the pointed-at version file is gone (manifest pruning), the
    heal skips instead of raising — by prune time the divergence was
    healed or superseded; this guards the read path."""
    path = str(tmp_path / "t")
    writer_a = _mk_table(path)
    writer_b = ManifestStore(path)
    writer_b.table_info()
    writer_b._heal_table_info = lambda: None

    _crash_overwrite(writer_a)
    crash_v = writer_a.latest_version()
    writer_b.commit(_file_txn(writer_b, "f1.parquet"))
    os.unlink(os.path.join(path, "_star_meta", "versions",
                           f"v{crash_v:012d}.json"))

    fresh = ManifestStore(path)
    got = fresh.table_info()  # must not raise
    assert got.schema_json != NEW_SCHEMA  # nothing left to heal from


def test_heal_under_held_lock_defers_not_deadlocks(tmp_path):
    """ADVICE (low): _publish_serialized's build reads
    table_info(refresh=True) UNDER the table lock on a fresh store; a
    pending heal used to re-acquire the non-reentrant lock and block
    LOCK_TIMEOUT_S before aborting the restore. Now: in-memory heal
    applies immediately, disk repair defers to the next lock-free
    read."""
    path = str(tmp_path / "t")
    writer_a = _mk_table(path)
    writer_a.commit(_file_txn(writer_a, "f0.parquet"))
    _crash_overwrite(writer_a)

    fresh = ManifestStore(path)  # cold store, pending heal
    parts = {
        rv: PartitionSnapshot(rv, list(ps.files), ps.last_update_version,
                              dv_files=list(ps.dv_files))
        for rv, ps in fresh.snapshot().partitions.items()
    }
    t0 = time.monotonic()
    snap = fresh.import_state(parts, commit_type="restore")
    elapsed = time.monotonic() - t0
    assert elapsed < 20, f"heal self-deadlocked under the table lock " \
                         f"({elapsed:.1f}s)"
    # the restore stamped the HEALED schema (log-authoritative, even
    # though the disk repair was deferred)
    assert snap.schema_json == NEW_SCHEMA
    # next lock-free read persists the repair
    fresh2 = ManifestStore(path)
    assert fresh2.table_info().schema_json == NEW_SCHEMA
    assert TableInfo.from_json(
        open(_info_path(path)).read()).schema_json == NEW_SCHEMA


def test_no_locks_leak_in_held_tracking(tmp_path):
    """_held_locks must drain back to empty after ordinary commits and
    serialized publishes (symmetry of acquire/release tracking)."""
    path = str(tmp_path / "t")
    store = _mk_table(path)
    store.commit(_file_txn(store, "f0.parquet"))
    assert store._held_locks == []
    parts = {
        rv: PartitionSnapshot(rv, list(ps.files), ps.last_update_version)
        for rv, ps in store.snapshot().partitions.items()
    }
    store.import_state(parts, commit_type="restore")
    assert store._held_locks == []
    txn = _file_txn(store, "f1.parquet")
    new_info = TableInfo.from_json(store.table_info().to_json())
    new_info.schema_json = NEW_SCHEMA
    txn.new_table_info = new_info
    store.commit(txn)
    assert store._held_locks == []
