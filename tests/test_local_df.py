"""local_df must be value- and schema-identical to plain createDataFrame.

The optimization (round 10) routes driver-local rows through
pandas+Arrow so actions stop paying a Python-worker round trip per
consumption; these tests pin that the fast path changes nothing
observable."""
import datetime
import math
from decimal import Decimal

import pytest
from pyspark.sql import types as T

from starlake_spark.local import local_df


CASES = [
    ("longs with nulls", [(1, None), (None, 2)], "a long, b long"),
    ("strings", [("x", "y"), (None, ""), ("ü", "…")], "a string, b string"),
    ("doubles", [(1.5, float("nan")), (None, -0.0)], "a double, b double"),
    ("bools", [(True, None), (False, True)], "a boolean, b boolean"),
    ("decimal", [(Decimal("12.34"),), (None,)], "d decimal(18,2)"),
    ("date", [(datetime.date(2031, 3, 1),), (None,)], "d date"),
    ("timestamp", [(datetime.datetime(2031, 3, 1, 12, 30, 15, 123456),),
                   (None,)], "t timestamp"),
    ("array<double>", [([1.0, 2.5],), (None,), ([],)], "v array<double>"),
    ("array<array<double>>", [([[1.0], [2.0, 3.0]],), (None,)],
     "v array<array<double>>"),
    ("empty rows", [], "a long, b string"),
    ("mixed", [(1, "s", 2.5, [7.0]), (None, None, None, None)],
     "k long, s string, x double, v array<double>"),
]


@pytest.mark.parametrize("label,rows,schema", CASES, ids=[c[0] for c in CASES])
def test_local_df_matches_plain(spark, label, rows, schema):
    fast = local_df(spark, rows, schema)
    slow = spark.createDataFrame(rows, schema)
    assert fast.schema == slow.schema
    a, b = fast.collect(), slow.collect()
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        for va, vb in zip(ra, rb):
            if isinstance(va, float) and isinstance(vb, float) \
                    and math.isnan(va) and math.isnan(vb):
                continue
            assert va == vb, (label, ra, rb)


def test_local_df_structtype_schema(spark):
    st = T.StructType([T.StructField("k", T.LongType()),
                       T.StructField("s", T.StringType())])
    fast = local_df(spark, [(1, "a"), (2, None)], st)
    assert fast.schema == st
    assert [tuple(r) for r in fast.orderBy("k").collect()] == \
        [(1, "a"), (2, None)]


def test_local_df_is_jvm_resident(spark):
    """The point of the helper: no Python-RDD scan in the plan (the
    plain list path plans 'Scan ExistingRDD', which re-pickles rows
    through a Python worker on every action)."""
    df = local_df(spark, [(1, "a")], "k long, s string")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan


def test_local_df_falls_back_when_arrow_off(spark):
    key = "spark.sql.execution.arrow.pyspark.enabled"
    prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try:
        df = local_df(spark, [(5, "z")], "k long, s string")
        assert [tuple(r) for r in df.collect()] == [(5, "z")]
    finally:
        spark.conf.set(key, prev)


def test_local_df_dict_rows_map_by_key(spark):
    """dict rows map by KEY (createDataFrame semantics); the Arrow path
    must not tuple() them into their keys (ADVICE r10)."""
    rows = [{"s": "x", "k": 1}, {"k": 2, "s": None}]
    fast = local_df(spark, rows, "k long, s string")
    slow = spark.createDataFrame(rows, "k long, s string")
    assert sorted(tuple(r) for r in fast.collect()) == \
        sorted(tuple(r) for r in slow.collect()) == [(1, "x"), (2, None)]


def test_local_df_non_utc_session_timestamps(spark):
    """Naive datetimes read in the SESSION time zone on the plain path
    but pin to UTC on the Arrow path — with a non-UTC session the
    helper must agree with createDataFrame (ADVICE r10)."""
    import datetime

    key = "spark.sql.session.timeZone"
    prev = spark.conf.get(key)
    spark.conf.set(key, "America/New_York")
    try:
        rows = [(datetime.datetime(2031, 3, 1, 12, 30, 15),), (None,)]
        fast = local_df(spark, rows, "t timestamp")
        slow = spark.createDataFrame(rows, "t timestamp")
        assert fast.collect() == slow.collect()
        # nested timestamps must take the same guard
        rows2 = [([datetime.datetime(2031, 6, 1, 1, 2, 3)],)]
        fast2 = local_df(spark, rows2, "v array<timestamp>")
        slow2 = spark.createDataFrame(rows2, "v array<timestamp>")
        assert fast2.collect() == slow2.collect()
    finally:
        spark.conf.set(key, prev)
