"""interval_point_join: differential vs a naive inequality join + plan."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from starlake_spark.operators.ranges import interval_point_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3],
        "p": [5.0, 10.0, 25.0, 7.0, 100.0, 1.0],
        "lv": ["a", "b", "c", "d", "e", "f"],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 2, 2, 4],
        "s": [0.0, 10.0, 5.0, 90.0, 0.0],
        "e": [10.0, 30.0, 8.0, 110.0, 100.0],
        "rv": [100, 200, 300, 400, 500],
    }))
    return left, right


def _naive(left, right, closed, how):
    lo = (F.col("p") >= F.col("s")) if closed in ("left", "both") else (F.col("p") > F.col("s"))
    hi = (F.col("p") <= F.col("e")) if closed in ("right", "both") else (F.col("p") < F.col("e"))
    j = left.join(right.withColumnRenamed("k", "rk"),
                  (F.col("k") == F.col("rk")) & lo & hi,
                  "inner" if how == "inner" else "left_outer")
    return j.select("k", "p", "lv", "s", "e", "rv")


@pytest.mark.parametrize("closed", ["left", "right", "both", "neither"])
@pytest.mark.parametrize("how", ["inner", "left_outer"])
def test_matches_naive(spark, frames, closed, how):
    left, right = frames
    got = interval_point_join(left, right, on=["k"], point="p", start="s",
                              end="e", bucket_width=7.0, closed=closed, how=how)
    key = lambda r: tuple((x is None, x) for x in r)
    a = sorted((tuple(r) for r in got.collect()), key=key)
    b = sorted((tuple(r) for r in _naive(left, right, closed, how).collect()), key=key)
    assert a == b


def test_no_duplicate_matches_across_buckets(spark):
    """An interval spanning many buckets must still meet each point once."""
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "p": [50.0]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "s": [0.0], "e": [1000.0], "rv": [9]}))
    got = interval_point_join(left, right, on=["k"], point="p", start="s",
                              end="e", bucket_width=3.0)
    assert got.count() == 1


def test_malformed_interval_dropped(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "p": [5.0]}))
    right = spark.createDataFrame(pd.DataFrame({"k": [1], "s": [100.0], "e": [-100.0], "rv": [9]}))
    got = interval_point_join(left, right, on=["k"], point="p", start="s",
                              end="e", bucket_width=10.0)
    assert got.count() == 0


def test_bad_args(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        interval_point_join(left, right.withColumnRenamed("rv", "lv"),
                            on=["k"], point="p", start="s", end="e", bucket_width=1)
    with pytest.raises(ValueError, match="positive"):
        interval_point_join(left, right, on=["k"], point="p", start="s",
                            end="e", bucket_width=0)
    with pytest.raises(ValueError, match="closed"):
        interval_point_join(left, right, on=["k"], point="p", start="s",
                            end="e", bucket_width=1, closed="open")


def test_equi_join_plan(spark, frames):
    """Must compile to a hash/sort-merge EQUI join on (key, bucket) —
    never a nested-loop or cartesian plan."""
    left, right = frames
    plan = interval_point_join(left, right, on=["k"], point="p", start="s",
                               end="e", bucket_width=7.0
                               )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
