"""normalize_for_write identity fast path (optimization round 10):
when the source frame already has the table's exact shape the function
returns it unchanged instead of rebuilding a cast/alias projection —
per-commit driver fixed cost. These tests pin (a) the fast path fires
on the steady-state shape, (b) every divergence (case, type, missing
generated column, extra column) falls back to the slow path and
produces the documented behavior, and (c) the declared errors still
raise."""

import pytest
from pyspark.sql import functions as F, types as T

from starlake_spark.operators import writer as W
from starlake_spark.table import create_table


def _mk_df(spark, n=50):
    return spark.range(0, n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).cast("int").alias("grp"),
        (F.col("id") * 1.5).alias("bal"))


@pytest.fixture()
def tbl(spark, tmp_table_dir):
    return create_table(spark, _mk_df(spark), tmp_table_dir,
                        hash_partitions=["k"], hash_bucket_num=2)


def test_fastpath_fires_on_exact_shape(spark, tbl):
    df = _mk_df(spark)
    out = W.normalize_for_write(df, tbl.info)
    assert out is df  # identity, not a rebuilt projection


def test_fastpath_refuses_case_mismatch(spark, tbl):
    df = _mk_df(spark).withColumnRenamed("grp", "GRP")
    assert not W._normalize_is_noop(df, tbl.info)
    out = W.normalize_for_write(df, tbl.info)
    assert out is not df
    assert out.columns == ["k", "grp", "bal"]  # canonical casing restored


def test_fastpath_refuses_type_mismatch(spark, tbl):
    df = _mk_df(spark).withColumn("grp", F.col("grp").cast("long"))
    assert not W._normalize_is_noop(df, tbl.info)
    out = W.normalize_for_write(df, tbl.info)
    assert dict((f.name, f.dataType) for f in out.schema.fields)["grp"] \
        == T.IntegerType()


def test_fastpath_refuses_extra_column(spark, tbl):
    df = _mk_df(spark).withColumn("extra", F.lit(1))
    assert not W._normalize_is_noop(df, tbl.info)
    with pytest.raises(ValueError, match="not in table schema"):
        W.normalize_for_write(df, tbl.info, enforce_schema=True)


def test_fastpath_missing_key_still_raises(spark, tbl):
    df = _mk_df(spark).drop("k")
    assert not W._normalize_is_noop(df, tbl.info)
    with pytest.raises(ValueError, match="missing from source"):
        W.normalize_for_write(df, tbl.info)


def test_fastpath_refuses_when_generated_col_missing(spark, tmp_table_dir):
    base = _mk_df(spark).withColumn(
        "day", F.lit("2026-01-01").cast("date"))
    t = create_table(spark, base, tmp_table_dir,
                     range_partitions=["day"],
                     configuration={"generated.day":
                                    "to_date('2026-01-01')"})
    src = _mk_df(spark)  # omits the generated range column
    assert not W._normalize_is_noop(src, t.info)
    out = W.normalize_for_write(src, t.info)
    assert "day" in out.columns


def test_write_roundtrip_through_fastpath(spark, tbl):
    """End-to-end: a steady-state upsert through the fast path reads
    back identically."""
    upd = _mk_df(spark).filter("k < 10").withColumn(
        "bal", F.col("bal") + 100.0)
    tbl.upsert(upd)
    got = {r.k: r.bal for r in tbl.to_df().filter("k < 12").collect()}
    assert got[3] == pytest.approx(3 * 1.5 + 100)
    assert got[11] == pytest.approx(11 * 1.5)
