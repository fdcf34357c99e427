"""Crash-recovery properties of the manifest commit protocol.

Visibility is manifest membership (meta.py): a writer that dies at ANY
point before the version file's atomic rename publishes nothing — no
torn state is ever readable. These tests simulate the wreckage a killed
writer leaves behind (in-flight temp manifests, orphaned data files, a
held commit lock) and pin that readers ignore it, writers recover, and
vacuum eventually clears it. Reference analogue: the Cassandra undo-log
protocol (MetaCommit.scala:35-100) exists to solve the same problem;
the manifest design makes most of it structural."""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from starlake_spark.meta import ManifestStore
from starlake_spark.operators.dml import cleanup
from starlake_spark.table import StarTable, create_table


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_inflight_temp_manifest_is_invisible(spark, orders, tmp_path):
    """A crash between _atomic_write's temp write and its rename leaves
    v000...json.tmp.<hex> in versions/ — readers must not surface the
    version, and the next commit must reuse the number."""
    path = str(tmp_path / "t")
    t = create_table(spark, orders, path)
    store = ManifestStore(path)
    v = store.latest_version()
    # forge the wreck: a fully-written but never-renamed next version
    real = store.snapshot(v)
    d = real.to_state()
    d["version"] = v + 1
    wreck = os.path.join(path, "_star_meta", "versions",
                         f"v{v + 1:012d}.json.tmp.deadbeef")
    with open(wreck, "w") as fh:
        json.dump(d, fh)
    assert ManifestStore(path).latest_version() == v
    # the next real commit claims v+1 and ignores the wreck
    t.write(orders.limit(3), mode="append")
    s = ManifestStore(path)
    assert s.latest_version() == v + 1
    assert s.snapshot(v + 1).commit_type == "write"
    assert t.to_df().count() == orders.count() + 3


def test_orphan_data_files_invisible_then_vacuumed(spark, orders, tmp_path):
    """A writer killed after writing parquet but before commit leaves
    files under data/<uuid>/ referenced by no manifest: scans never see
    them, and vacuum removes them once old enough."""
    path = str(tmp_path / "t")
    t = create_table(spark, orders, path)
    n = t.to_df().count()
    orphan_dir = os.path.join(path, "data", "deadbeefcafe")
    os.makedirs(orphan_dir)
    orders.limit(7).write.mode("overwrite").parquet(os.path.join(orphan_dir, "p"))
    assert t.to_df().count() == n, "orphans leaked into the scan"
    # too young: retained
    assert cleanup(ManifestStore(path), retention_s=3600) == []
    # old enough: removed (backdate mtimes past retention)
    old = time.time() - 7200
    for root, _dirs, names in os.walk(orphan_dir):
        for f in names:
            os.utime(os.path.join(root, f), (old, old))
    removed = cleanup(ManifestStore(path), retention_s=3600)
    assert removed and all("deadbeefcafe" in p for p in removed)
    assert t.to_df().count() == n


def test_stale_commit_lock_is_broken(spark, orders, tmp_path):
    """Lock files from a killed writer stall commits only until
    STALE_LOCK_S: a backdated lock is broken and the commit proceeds.
    Partition-scoped commits take per-scope lock files plus the publish
    micro-lock, so ALL of a crashed writer's lock files are backdated
    here — the next write must break every one it needs and land."""
    path = str(tmp_path / "t")
    t = create_table(spark, orders, path)
    meta = os.path.join(path, "_star_meta")
    # crash artifacts: the table-wide lock AND every scoped lock the
    # next commit will contend on (discovered by running a probe write
    # first, then backdating whatever lock names it used is impossible
    # post-release — so backdate a fabricated table-wide lock and rerun)
    lock = os.path.join(meta, "_commit.lock")
    with open(lock, "w") as fh:
        fh.write("99999")
    old = time.time() - 1000  # > STALE_LOCK_S (120)
    os.utime(lock, (old, old))
    t.write(orders.limit(2), mode="append")  # must not raise
    assert t.to_df().count() == orders.count() + 2
    # partition-scoped commits no longer touch the table-wide lock; the
    # stale file is broken when the next TABLE-WIDE acquire comes along
    store = ManifestStore(path)
    h = store._acquire_lock()  # breaks the stale lock, then holds fresh
    store._release_lock(h)
    assert not os.path.exists(lock)
    # and stale SCOPED locks are broken the same way: fabricate the
    # crashed writer's scoped lock files (the partition scope this
    # unpartitioned table writes under, plus the publish micro-lock)
    import hashlib

    for scope in ("", ManifestStore.PUBLISH_SCOPE):
        h = hashlib.sha256(scope.encode()).hexdigest()[:16]
        p = os.path.join(meta, f"_commit.lock.p{h}")
        with open(p, "w") as fh:
            fh.write("99999")
        os.utime(p, (old, old))
    t.write(orders.limit(2), mode="append")  # must not raise
    assert t.to_df().count() == orders.count() + 4


def test_reader_snapshot_isolated_from_concurrent_commits(spark, orders, tmp_path):
    """MVCC: a snapshot resolved before a commit keeps serving its exact
    file set afterwards — delta-chain resolution pins to the requested
    version, never 'latest'."""
    path = str(tmp_path / "t")
    t = create_table(spark, orders, path)
    store = ManifestStore(path)
    before = store.snapshot()
    t.write(orders.limit(5).withColumn("o_comment", F.lit("x")),
            mode="append")
    again = ManifestStore(path).snapshot(before.version)
    assert {f.path for f in again.all_files()} \
        == {f.path for f in before.all_files()}
    assert t.to_df(version=before.version).count() == orders.count()


def test_vacuum_sweeps_stale_scoped_locks(spark, orders, tmp_path):
    """A crashed writer's scoped lock for a never-again-written
    partition lingers until vacuum sweeps it (rename-claim break, so a
    live lock can never be taken); fresh locks survive."""
    path = str(tmp_path / "t")
    t = create_table(spark, orders, path)
    meta = os.path.join(path, "_star_meta")
    stale = os.path.join(meta, "_commit.lock.pdeadbeefdeadbeef")
    with open(stale, "w") as fh:
        fh.write("crashed")
    old = time.time() - 1000
    os.utime(stale, (old, old))
    fresh = os.path.join(meta, "_commit.lock.pfreshfreshfresh0")
    with open(fresh, "w") as fh:
        fh.write("live")
    # dry run reports, removes nothing
    listed = cleanup(ManifestStore(path), retention_s=120, dry_run=True)
    assert any("pdeadbeef" in p for p in listed)
    assert os.path.exists(stale)
    removed = cleanup(ManifestStore(path), retention_s=120)
    assert any("pdeadbeef" in p for p in removed)
    assert not os.path.exists(stale)
    assert os.path.exists(fresh)  # within staleness window: kept
    os.unlink(fresh)
