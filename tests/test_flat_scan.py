"""Flat-scan fast path (optimization round 10): when every commit
group of a snapshot is schema-homogeneous, `_merge_scan`/`_plain_scan`
serve the whole history through ONE parquet relation (version
attributed from the file's directory) instead of a union of per-commit
reads. These tests pin (a) bit-identical results vs the union path
(``STARLAKE_FLAT_SCAN=off``), including tombstone deltas, in-batch
churn and resurrect-after-delete, (b) the single-relation plan shape,
and (c) that evolution shapes the gate cannot serve fall back to the
union path and stay correct."""

import os

import pytest
from pyspark.sql import functions as F

from starlake_spark.table import StarTable, create_table


def _mk_df(spark, n=600):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("int").alias("grp"),
        (F.col("id") * 1.5).alias("bal"),
        F.concat(F.lit("name_"), F.col("id")).alias("nm"))


NO_COMPACT = {"compaction.auto": "false", "compaction.maxDeltas": "0"}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def churned_table(spark, tmp_table_dir):
    df = _mk_df(spark)
    t = create_table(spark, df, tmp_table_dir,
                     hash_partitions=["k"], hash_bucket_num=2,
                     configuration=NO_COMPACT)
    for i in range(3):
        t.upsert(df.filter(F.col("k") % (i + 2) == 0)
                   .withColumn("bal", F.col("bal") + F.lit(10.0 * (i + 1))))
    t.delete("k % 13 = 0", use_delta=True)
    t.upsert(df.filter(F.col("k") % 26 == 0)
               .withColumn("nm", F.lit("resurrected")))
    return t


def test_merge_scan_flat_equals_union(spark, churned_table, monkeypatch):
    monkeypatch.setenv("STARLAKE_FLAT_SCAN", "off")
    ref = _rows(churned_table.to_df())
    monkeypatch.delenv("STARLAKE_FLAT_SCAN")
    fast_df = churned_table.to_df()
    assert _rows(fast_df) == ref
    # ONE parquet relation for the whole 6-commit history
    plan = fast_df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan") == 1


def test_plain_scan_flat_equals_union(spark, tmp_table_dir, monkeypatch):
    df = _mk_df(spark)
    t = create_table(spark, df, tmp_table_dir, configuration=NO_COMPACT)
    t.write(df.withColumn("k", F.col("k") + 10_000))
    t.write(df.withColumn("k", F.col("k") + 20_000))
    monkeypatch.setenv("STARLAKE_FLAT_SCAN", "off")
    ref = _rows(t.to_df())
    monkeypatch.delenv("STARLAKE_FLAT_SCAN")
    fast_df = t.to_df()
    assert _rows(fast_df) == ref
    plan = fast_df._jdf.queryExecution().executedPlan().toString()
    final = plan.split("== Initial Plan ==")[0]
    assert final.count("FileScan") == 1


def test_flat_gate_refuses_schema_evolution(spark, tmp_table_dir):
    """ADD COLUMN mid-history ⇒ heterogeneous exist_cols ⇒ the gate
    must fall back to the union path and still answer correctly."""
    df = _mk_df(spark)
    t = create_table(spark, df, tmp_table_dir,
                     hash_partitions=["k"], hash_bucket_num=2,
                     configuration=NO_COMPACT)
    t.upsert(df.filter(F.col("k") % 2 == 0)
               .withColumn("bal", F.col("bal") + 5.0))
    t.add_columns([("extra", "int")])
    t.upsert(df.filter(F.col("k") % 3 == 0)
               .withColumn("bal", F.col("bal") + 7.0)
               .withColumn("extra", F.lit(42)))
    from starlake_spark.operators import reader as R
    store = t.store
    info = store.table_info(refresh=True)
    files = store.snapshot().all_files()
    groups = R._group_files(files)
    assert R._flat_read_plan(store, info, groups) is None
    out = {r.k: r for r in t.to_df().collect()}
    assert out[6].extra == 42 and out[6].bal == pytest.approx(6 * 1.5 + 7)
    assert out[4].extra is None and out[4].bal == pytest.approx(4 * 1.5 + 5)


def test_flat_gate_refuses_merge_on_in_batch_ties(spark, churned_table):
    """The flat path and union path must collapse in-batch duplicate
    keys identically (both order by commit version only — ties within
    a commit are pre-collapsed by upsert before writing)."""
    t = churned_table
    # merge operators ride the same sort_array(collect_list) shape:
    from starlake_spark import merge_ops as mo
    df_ops = t.to_df(merge_operators={"bal": mo.SumMergeOp()})
    os.environ["STARLAKE_FLAT_SCAN"] = "off"
    try:
        ref = _rows(t.to_df(merge_operators={"bal": mo.SumMergeOp()}))
    finally:
        os.environ.pop("STARLAKE_FLAT_SCAN", None)
    assert _rows(df_ops) == ref
