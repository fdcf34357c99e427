"""Round-8 ports: CleanupSuite.scala + DropTableSuite.scala — the last
two reference suites without repo twins (round-7 verdict missing #2).

Adaptations (documented divergences from the Cassandra-backed
reference):

* the reference's meta lives in Cassandra tables (table_info /
  partition_info / data_info / fragment_value); `metaNotExists`
  translates to 'the table directory and catalog registration are
  gone' — the manifest IS the meta here;
* the reference's cleanup returns the removed-path list and sweeps the
  WHOLE table dir including unrelated user files (its 'reservoir' dir
  is reported removed). This engine's vacuum scopes to the prefixes it
  owns (data/, _star_meta/dv, _star_meta/bloom) and never deletes an
  unknown top-level path — pinned below as a deliberate, safer
  divergence;
* OLD_VERSION_RETENTION_TIME maps to cleanup(retention_s=...,
  manifest_retention_s=...): expiring old version manifests is what
  makes the prior overwrite's files unreferenced, exactly the
  reference's old-version expiry clock.
"""

import os
import time

import pytest
from pyspark.sql import functions as F

from starlake_spark import create_table, sources
from starlake_spark.table import StarTable


def _write_data(spark, path, offset=0):
    (spark.range(offset, offset + 10)
     .write.mode("overwrite").format("star").save(path))


@pytest.fixture(autouse=True)
def _reg(spark):
    sources.register(spark)


# ---------------------------------------------------------------------------
# CleanupSuite.scala:40-95 'cleanup basic test'
# ---------------------------------------------------------------------------

def test_cleanup_basic(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_data(spark, path)
    t = StarTable.for_path(spark, path)

    # unrelated user file next to the table's data — the reference
    # reports it removed; this engine's scoped sweep must LEAVE it
    reservoir = os.path.join(path, "reservoir")
    os.makedirs(reservoir)
    unrelated = os.path.join(reservoir, "keep.bin")
    with open(unrelated, "wb") as f:
        f.write(b"x")

    removed = t.cleanup(retention_s=0, manifest_retention_s=0)
    assert removed == []  # nothing expired yet
    assert os.path.exists(unrelated)

    # four overwrite generations: each cleanup removes exactly the
    # files the PREVIOUS snapshot referenced (the reference accumulates
    # oldFiles and checks the same set per round)
    for gen in range(1, 5):
        prev_files = {f.path for f in t.store.snapshot().all_files()}
        _write_data(spark, path, offset=gen * 10)
        removed = set(StarTable.for_path(spark, path).cleanup(
            retention_s=0, manifest_retention_s=0))
        assert prev_files <= removed, (prev_files, removed)
        for rel in prev_files:
            assert not os.path.exists(os.path.join(path, rel))
        # latest stays fully readable with the right rows
        rows = sorted(r.id for r in
                      spark.read.format("star").load(path)
                      .select("id").collect())
        assert rows == list(range(gen * 10, gen * 10 + 10))
    # reference epilogue: after all cleanups the CURRENT version's
    # data_info is intact (fileNum preserved)
    t = StarTable.for_path(spark, path)
    cur = t.store.snapshot().all_files()
    assert cur and all(os.path.exists(os.path.join(path, f.path))
                       for f in cur)
    assert os.path.exists(unrelated)  # still never touched


# ---------------------------------------------------------------------------
# CleanupSuite.scala:97-126 'simple cleanup'
# ---------------------------------------------------------------------------

def test_simple_cleanup(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 1, 1), (1, 2, 2), (2, 3, 3)],
                               "range int, hash int, value int")
    for _ in range(2):
        (df.write.mode("overwrite").format("star")
         .option("rangePartitions", "range")
         .option("hashPartitions", "hash")
         .option("hashBucketNum", "1")
         .save(path))
    t = StarTable.for_path(spark, path)
    old = [f for f in
           (os.path.join(dp, n) for dp, _d, ns in os.walk(
               os.path.join(path, "data")) for n in ns)]
    live = {os.path.join(path, f.path)
            for f in t.store.snapshot().all_files()}
    dead = [p for p in old if p not in live]
    assert dead  # the first overwrite's files are expired
    time.sleep(1.0)
    t.cleanup(retention_s=0.5, manifest_retention_s=0)
    for p in dead:
        assert not os.path.exists(p)
    for p in live:
        assert os.path.exists(p)
    got = sorted((r.range, r.hash, r.value) for r in
                 t.to_df().collect())
    assert got == [(1, 1, 1), (1, 2, 2), (2, 3, 3)]


# ---------------------------------------------------------------------------
# DropTableSuite.scala:85-101 'drop table'
# ---------------------------------------------------------------------------

def test_drop_table(spark, tmp_path):
    from starlake_spark import catalog

    path = str(tmp_path / "t")
    wh = str(tmp_path / "wh")
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "key int, value int")
    create_table(spark, df, path, short_name="r8_drop_t", warehouse=wh)
    assert "r8_drop_t" in catalog.list_tables(wh)

    StarTable.for_path(spark, path).drop_table()
    # tableNotExists + metaNotExists(partition_info/data_info/
    # fragment_value): the manifest dir is the meta — all gone
    assert not os.path.exists(path)
    assert "r8_drop_t" not in catalog.list_tables(wh)
    with pytest.raises(Exception, match="star table"):
        StarTable.for_path(spark, path)


# ---------------------------------------------------------------------------
# DropTableSuite.scala:104-146 'drop partition'
# ---------------------------------------------------------------------------

def test_drop_partition(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "key int, value int")
    create_table(spark, df, path, range_partitions=["key"])
    t = StarTable.for_path(spark, path)

    with pytest.raises(ValueError,
                       match="You can only drop one partition once time"):
        t.drop_partition("key=1 or key=2")
    with pytest.raises(KeyError,
                       match="Partition not found by condition"):
        t.drop_partition("key=4")

    t.drop_partition("key=1")
    got = sorted((r.key, r.value) for r in
                 t.to_df().select("key", "value").collect())
    assert got == [(2, 3), (3, 4)]

    # re-append into the dropped partition resurrects it
    spark.createDataFrame([(1, 22)], "key int, value int") \
        .write.mode("append").format("star").save(path)
    got = sorted((r.key, r.value) for r in
                 StarTable.for_path(spark, path)
                 .to_df().select("key", "value").collect())
    assert got == [(1, 22), (2, 3), (3, 4)]

    # partitionNotExists + dataNotExists: the dropped partition holds
    # ONLY the re-appended file — the pre-drop data never returns
    snap = StarTable.for_path(spark, path).store.snapshot()
    ps = snap.partitions.get("key=1")
    assert ps is not None and len(ps.files) == 1


# ---------------------------------------------------------------------------
# StarTable.scala:401-409 updateMaterialView + :483-500 createMaterialView
# ---------------------------------------------------------------------------

def test_material_view_table_api(spark, tmp_path):
    from starlake_spark.plans import mv

    wh = str(tmp_path / "wh")
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "a", 30)],
        "k int, g string, v int")
    src = create_table(spark, df, str(tmp_path / "src"),
                       short_name="mvapi_src", warehouse=wh)

    t = StarTable.create_material_view(
        spark, "mvapi_v", str(tmp_path / "v"),
        "SELECT g, sum(v) AS s, count(*) AS n FROM mvapi_src GROUP BY g",
        warehouse=wh)
    assert mv._load_registry(wh)["mvapi_v"]["incremental"] is True

    # notMaterialViewException parity on a plain table
    with pytest.raises(ValueError, match="is not a material view"):
        src.update_material_view()

    src.write(spark.createDataFrame([(4, "b", 40)], "k int, g string, v int"),
              mode="append")
    assert StarTable.for_path(spark, str(tmp_path / "v")) \
        .updateMaterialView() is True
    got = {(r.g, r.s, r.n) for r in
           mv._strip_mv_hidden(t.to_df()).collect()}
    assert got == {("a", 40, 2), ("b", 60, 2)}
    # no source change → no-op
    assert t.update_material_view() is False
