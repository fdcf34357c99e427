"""Incremental clone sync (sync_clone): changed-partition-only
catch-up of a shallow clone, replication semantics, schema
propagation, deep-clone refusal."""

import pytest
from pyspark.sql import functions as F

from starlake_spark.table import create_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def _pair(spark, orders, tmp_path, **kw):
    src = create_table(spark, orders, str(tmp_path / "src"),
                       range_partitions=["o_orderstatus"], **kw)
    return src, src.clone(str(tmp_path / "c"), shallow=True)


def test_sync_is_incremental_and_exact(spark, orders, tmp_path):
    src, c = _pair(spark, orders, tmp_path,
                   hash_partitions=["o_orderkey"], hash_bucket_num=4)
    assert c.sync_clone() == 1  # no-op: no commit
    assert c.store.latest_version() == 1
    upd = (orders.filter("o_orderstatus = 'O' AND o_orderkey <= 100")
           .withColumn("o_orderpriority", F.lit("SYNCED")))
    src.upsert(upd)
    untouched_before = {
        rv: ps.last_update_version
        for rv, ps in c.store.snapshot().partitions.items()
        if rv != "o_orderstatus=O"}
    v = c.sync_clone()
    assert v == src.store.latest_version()
    assert (src.to_df().orderBy("o_orderkey").collect()
            == c.to_df().orderBy("o_orderkey").collect())
    # untouched partitions kept their original (non-re-imported) entries
    after = c.store.snapshot().partitions
    for rv, lv in untouched_before.items():
        assert after[rv].last_update_version == lv
    # repeated sync: no-op, no commit
    vfiles = c.store.latest_version()
    assert c.sync_clone() == v
    assert c.store.latest_version() == vfiles


def test_partition_removal_propagates(spark, orders, tmp_path):
    src, c = _pair(spark, orders, tmp_path)
    src.delete("o_orderstatus = 'P'")
    c.sync_clone()
    assert c.to_df().filter("o_orderstatus = 'P'").count() == 0
    assert (c.to_df().count()
            == orders.filter("o_orderstatus != 'P'").count())


def test_schema_alter_propagates(spark, orders, tmp_path):
    src, c = _pair(spark, orders, tmp_path)
    src.add_columns([("o_note", "string")])
    src.write(orders.limit(5).withColumn("o_note", F.lit("new")),
              mode="append")
    c.sync_clone()
    assert "o_note" in c.to_df().columns
    assert c.to_df().filter("o_note = 'new'").count() == 5


def test_dv_deletes_propagate(spark, orders, tmp_path):
    src, c = _pair(spark, orders, tmp_path)
    src.delete("o_custkey % 7 = 3", use_dv=True)
    c.sync_clone()
    want = orders.filter("o_custkey % 7 != 3").count()
    assert c.to_df().count() == want and c.count() == want


def test_deep_clone_refuses_sync(spark, orders, tmp_path):
    src = create_table(spark, orders, str(tmp_path / "src"))
    dc = src.clone(str(tmp_path / "dc"), shallow=False)
    with pytest.raises(ValueError, match="not a shallow clone"):
        dc.sync_clone()


def test_local_divergence_superseded_only_where_source_changed(
        spark, orders, tmp_path):
    src, c = _pair(spark, orders, tmp_path,
                   hash_partitions=["o_orderkey"], hash_bucket_num=4)
    # clone diverges in TWO partitions; source then changes ONE of them
    c.upsert(orders.filter("o_orderstatus = 'F' AND o_orderkey <= 50")
             .withColumn("o_orderpriority", F.lit("LOCAL-F")))
    c.upsert(orders.filter("o_orderstatus = 'O' AND o_orderkey <= 50")
             .withColumn("o_orderpriority", F.lit("LOCAL-O")))
    src.upsert(orders.filter("o_orderstatus = 'O' AND o_orderkey <= 10")
               .withColumn("o_orderpriority", F.lit("SRC-O")))
    c.sync_clone()
    # source-touched partition: replication wins (local edits gone)
    o_part = c.to_df().filter("o_orderstatus = 'O'")
    assert o_part.filter("o_orderpriority = 'LOCAL-O'").count() == 0
    assert o_part.filter("o_orderpriority = 'SRC-O'").count() == \
        orders.filter("o_orderstatus = 'O' AND o_orderkey <= 10").count()
    # untouched partition keeps the local divergence
    assert c.to_df().filter(
        "o_orderpriority = 'LOCAL-F'").count() == \
        orders.filter("o_orderstatus = 'F' AND o_orderkey <= 50").count()
