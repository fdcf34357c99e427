"""The scan-construction memo must be invisible: identical results,
invalidated by every mutation class (commit, ALTER, properties,
drop/recreate), and disabled by its kill switch."""
import os

from pyspark.sql import functions as F

from starlake_spark.operators import reader
from starlake_spark.table import create_table


def _mk(spark, tmp_path, name="t"):
    df = spark.range(0, 100).selectExpr("id AS k", "id * 2 AS v")
    return create_table(spark, df, str(tmp_path / name),
                        hash_partitions=["k"], hash_bucket_num=2,
                        configuration={"compaction.auto": "false"})


def test_same_version_scan_is_memoized(spark, tmp_path):
    t = _mk(spark, tmp_path)
    a = reader.scan(spark, t.store)
    b = reader.scan(spark, t.store)
    assert a is b  # same constructed plan, zero rebuild cost
    assert a.count() == 100


def test_commit_invalidates(spark, tmp_path):
    t = _mk(spark, tmp_path)
    a = reader.scan(spark, t.store)
    t.upsert(spark.range(100, 110).selectExpr("id AS k", "id * 2 AS v"))
    b = reader.scan(spark, t.store)
    assert a is not b
    assert b.count() == 110
    # the old version stays addressable and correct
    old = reader.scan(spark, t.store, version=1)
    assert old.count() == 100


def test_property_change_invalidates(spark, tmp_path):
    t = _mk(spark, tmp_path)
    a = reader.scan(spark, t.store)
    t.set_properties({"some.prop": "x"})
    b = reader.scan(spark, t.store)
    assert a is not b


def test_drop_recreate_invalidates(spark, tmp_path):
    t = _mk(spark, tmp_path, "t2")
    a = reader.scan(spark, t.store)
    import shutil

    shutil.rmtree(str(tmp_path / "t2"))
    t2 = _mk(spark, tmp_path, "t2")
    b = reader.scan(spark, t2.store)
    assert a is not b  # fresh table_id at the same path
    assert b.count() == 100


def test_filtered_scans_are_not_memoized(spark, tmp_path):
    t = _mk(spark, tmp_path, "t3")
    a = reader.scan(spark, t.store, where="k = 5")
    b = reader.scan(spark, t.store, where="k = 5")
    assert a is not b
    # where= prunes I/O (partitions/files/buckets); the row-level filter
    # is the caller's — both scans must expose the same pruned rowset
    assert a.count() == b.count()
    assert a.filter("k = 5").count() == 1


def test_kill_switch(spark, tmp_path):
    t = _mk(spark, tmp_path, "t4")
    os.environ["STARLAKE_SCAN_CACHE"] = "off"
    try:
        a = reader.scan(spark, t.store)
        b = reader.scan(spark, t.store)
        assert a is not b
    finally:
        del os.environ["STARLAKE_SCAN_CACHE"]


def test_broadcast_threshold_change_misses(spark, tmp_path):
    t = _mk(spark, tmp_path, "t5")
    t.upsert(spark.range(0, 3).selectExpr("id AS k", "id AS v"))  # MoR shape
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    a = reader.scan(spark, t.store)
    spark.conf.set(key, "-1")
    try:
        b = reader.scan(spark, t.store)
        assert a is not b  # hint decision depends on the conf
    finally:
        spark.conf.set(key, prev)
