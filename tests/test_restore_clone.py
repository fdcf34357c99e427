"""RESTORE TO VERSION and SHALLOW/DEEP CLONE (Delta-style features
beyond the reference): rewind commits preserve history and MoR merge
order; clones are independent of their source for writes."""

import os

import pytest
from pyspark.sql import functions as F

from starlake_spark import create_table
from starlake_spark.meta import MetaError


def _mk(spark, path):
    df = spark.createDataFrame(
        [(i, f"n{i}", i * 10) for i in range(1, 6)], "id int, name string, value int")
    return create_table(spark, df, path, hash_partitions=["id"], hash_bucket_num=2)


def test_restore_rewinds_and_preserves_history(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.upsert(spark.createDataFrame([(3, "X", 999)], "id int, name string, value int"))
    t.delete("id = 1")
    t.restore(1)
    rows = {r["id"]: (r["name"], r["value"]) for r in t.to_df().collect()}
    assert rows == {i: (f"n{i}", i * 10) for i in range(1, 6)}
    # interim versions still time-travelable
    assert t.to_df(version=2).filter("id = 3 AND name = 'X'").count() == 1
    assert t.to_df(version=3).count() == 4


def test_restore_mor_state_keeps_merge_order(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.set_properties({"compaction.auto": "false"})
    t.upsert(spark.createDataFrame([(2, "v1", 1)], "id int, name string, value int"))
    t.upsert(spark.createDataFrame([(2, "v2", 2)], "id int, name string, value int"))
    mor_version = t.versions()[-1]
    t.delete("id = 2")
    t.restore(mor_version)
    # last delta must still win after restore (write_versions preserved)
    row = t.to_df().filter("id = 2").collect()[0]
    assert (row["name"], row["value"]) == ("v2", 2)


def test_restore_fails_after_cleanup_removed_files(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.write(spark.createDataFrame([(9, "z", 0)], "id int, name string, value int"),
            mode="overwrite")
    t.cleanup(retention_s=0.0)
    with pytest.raises(MetaError, match="removed by cleanup"):
        t.restore(1)


def test_shallow_clone_independent_writes(spark, tmp_table_dir, tmp_path):
    t = _mk(spark, tmp_table_dir)
    c = t.clone(str(tmp_path / "c1"), version=1, shallow=True)
    c.upsert(spark.createDataFrame([(2, "CLONED", 0)], "id int, name string, value int"))
    assert c.to_df().filter("name = 'CLONED'").count() == 1
    assert t.to_df().filter("name = 'CLONED'").count() == 0
    # clone rewrites never delete source files
    c.delete("id = 4")
    assert t.to_df().filter("id = 4").count() == 1


def test_clone_of_later_snapshot_accepts_new_writes(spark, tmp_table_dir, tmp_path):
    """Cloning a snapshot with version >= 2 must publish the clone's
    first snapshot at >= max(write_version of imported files); otherwise
    post-clone commits stamp LOWER write_versions than the imported MoR
    deltas and the max_by collapse keeps stale source rows."""
    t = _mk(spark, tmp_table_dir)
    t.set_properties({"compaction.auto": "false"})
    t.upsert(spark.createDataFrame([(2, "src_v1", 1)], "id int, name string, value int"))
    t.upsert(spark.createDataFrame([(2, "src_v2", 2)], "id int, name string, value int"))
    c = t.clone(str(tmp_path / "c_late"), shallow=True)  # latest: version >= 3
    # the clone sees the source's latest MoR state
    row = c.to_df().filter("id = 2").collect()[0]
    assert (row["name"], row["value"]) == ("src_v2", 2)
    # fresh clone-side upsert must beat the imported deltas
    c.upsert(spark.createDataFrame(
        [(2, "clone_wins", 7)], "id int, name string, value int"))
    row = c.to_df().filter("id = 2").collect()[0]
    assert (row["name"], row["value"]) == ("clone_wins", 7)
    # clone-side delete of an imported MoR key must stick too
    c.delete("id = 2")
    assert c.to_df().filter("id = 2").count() == 0
    # source untouched
    row = t.to_df().filter("id = 2").collect()[0]
    assert (row["name"], row["value"]) == ("src_v2", 2)


def test_deep_clone_survives_source_drop(spark, tmp_table_dir, tmp_path):
    t = _mk(spark, tmp_table_dir)
    c = t.clone(str(tmp_path / "c2"), shallow=False)
    t.drop_table()
    assert c.to_df().count() == 5


def test_restore_and_clone_sql_routing(spark, tmp_path):
    from starlake_spark.sql import StarSession

    ss = StarSession(spark, warehouse=str(tmp_path / "wh"))
    base = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int")
    base.createOrReplaceTempView("_rc_src")
    ss.sql(f"CREATE TABLE rc_t USING star OPTIONS (hashPartitions = 'id', "
           f"hashBucketNum = '2') LOCATION '{tmp_path}/rc_t' AS SELECT * FROM _rc_src")
    ss.sql("UPDATE rc_t SET v = 99 WHERE id = 1")
    ss.sql("RESTORE TABLE rc_t TO VERSION AS OF 1")
    assert {r["v"] for r in ss.sql("SELECT v FROM rc_t").collect()} == {10, 20}
    ss.sql(f"CREATE TABLE rc_c SHALLOW CLONE rc_t VERSION AS OF 1 "
           f"LOCATION '{tmp_path}/rc_c'")
    assert ss.sql("SELECT COUNT(*) AS n FROM rc_c").collect()[0]["n"] == 2


def test_timestamp_time_travel_and_restore(spark, tmp_table_dir):
    """TIMESTAMP AS OF (Delta-style): to_df(timestamp=...) resolves to
    the latest snapshot committed at or before the instant; restore by
    timestamp rewinds the same way; too-early timestamps error."""
    import time as _time

    t = _mk(spark, tmp_table_dir)
    created = _time.time()
    _time.sleep(0.05)
    t.upsert(spark.createDataFrame([(3, "X", 999)],
                                   "id int, name string, value int"))
    after_upsert = _time.time()

    mid = t.to_df(timestamp=created)
    assert mid.filter("name = 'X'").count() == 0
    assert mid.count() == 5
    now_df = t.to_df(timestamp=after_upsert)
    assert now_df.filter("name = 'X'").count() == 1
    # ISO-string form
    import datetime as _dt
    iso = _dt.datetime.fromtimestamp(created).isoformat()
    assert t.to_df(timestamp=iso).count() == 5
    with pytest.raises(MetaError, match="no snapshot"):
        t.to_df(timestamp=created - 10000)
    with pytest.raises(ValueError, match="not both"):
        t.to_df(version=1, timestamp=created)
    # restore by timestamp
    t.restore(timestamp=created)
    assert t.to_df().filter("name = 'X'").count() == 0


def test_restore_sql_timestamp_form(spark, tmp_path):
    import datetime as _dt
    import time as _time

    from starlake_spark.sql import StarSession

    ss = StarSession(spark, warehouse=str(tmp_path / "wh"))
    base = spark.createDataFrame([(1, 10), (2, 20)], "id int, v int")
    base.createOrReplaceTempView("_ts_src")
    ss.sql(f"CREATE TABLE ts_t USING star OPTIONS (hashPartitions = 'id', "
           f"hashBucketNum = '2') LOCATION '{tmp_path}/ts_t' AS SELECT * FROM _ts_src")
    created = _dt.datetime.now().isoformat()
    _time.sleep(0.05)
    ss.sql("UPDATE ts_t SET v = 99 WHERE id = 1")
    ss.sql(f"RESTORE TABLE ts_t TO TIMESTAMP AS OF '{created}'")
    assert {r["v"] for r in ss.sql("SELECT v FROM ts_t").collect()} == {10, 20}


def test_partition_scoped_restore(spark, tmp_path):
    """Surgical rollback: one range partition rewinds to an old
    version, other partitions keep their CURRENT state; a partition
    absent at the target version is dropped; history stays
    time-travelable; SQL form works."""
    from pyspark.sql import functions as F

    from starlake_spark import create_table
    from starlake_spark.sql import StarSession

    wh = str(tmp_path / "wh")
    ss = StarSession(spark, warehouse=wh)
    df = spark.createDataFrame(
        [(1, 10, "r1"), (2, 20, "r2")], "id int, v int, r string")
    t = create_table(spark, df, wh + "/pr", range_partitions=["r"],
                     short_name="pr", warehouse=wh)                      # v1
    t.write(spark.createDataFrame([(3, 30, "r1")], "id int, v int, r string"),
            mode="append")                                               # v2
    t.write(spark.createDataFrame([(4, 40, "r2")], "id int, v int, r string"),
            mode="append")                                               # v3
    t.write(spark.createDataFrame([(5, 50, "r3")], "id int, v int, r string"),
            mode="append")                                               # v4

    # rewind ONLY r1 to v1: r1 loses id=3; r2 keeps id=4; r3 survives
    t.restore(1, partition="r=r1")
    got = sorted((r.id, r.r) for r in t.to_df().collect())
    assert got == [(1, "r1"), (2, "r2"), (4, "r2"), (5, "r3")]

    # r3 didn't exist at v1: partition restore drops it
    t.restore(1, partition="r=r3")
    assert sorted(r.id for r in t.to_df().collect()) == [1, 2, 4]

    # interim versions still time-travel
    assert sorted(r.id for r in t.to_df(version=4).collect()) == [1, 2, 3, 4, 5]

    # SQL form brings r1 back to its v2 state
    ss.sql("RESTORE TABLE pr PARTITION 'r=r1' TO VERSION AS OF 2")
    assert sorted(r.id for r in t.to_df().collect()) == [1, 2, 3, 4]

    import pytest as _pt
    with _pt.raises(Exception, match="unknown partition"):
        t.restore(1, partition="r=zzz")


def test_history_rows_added_metric(spark, tmp_path):
    from starlake_spark import create_table

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    t = create_table(spark, df.coalesce(1), str(tmp_path / "h"))
    t.write(spark.createDataFrame([(3, "c")], "id int, v string").coalesce(1),
            mode="append")
    hist = {r.version: (r.rows_added, r.files_added)
            for r in t.history().collect()}
    assert hist[1][0] == 2 and hist[2][0] == 1
