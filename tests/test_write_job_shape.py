"""Round-10 optimization: write-job shape pins.

A join/agg-free commit (the CDC-trickle / plain-append shape) must run
as ONE Spark job — AQE's query-stage split would add a second
scheduling round-trip + shuffle materialization per commit for a plan
it cannot improve (it never re-plans an explicit fixed-N repartition).
Plans that AQE *can* improve (joins, aggregates feeding a write, e.g.
CoW rewrites over a MoR collapse) must keep it.
"""
import os

import pytest
from pyspark.sql import functions as F

from starlake_spark.operators import writer as W
from starlake_spark.table import create_table


def _jobs(spark) -> int:
    return len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])


@pytest.fixture()
def seed(spark, sf_dir):
    df = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
          .select("o_orderkey", "o_custkey", "o_totalprice"))
    return df


def test_simple_upsert_commit_is_one_job(spark, seed, tmp_table_dir):
    t = create_table(spark, seed, tmp_table_dir,
                     hash_partitions=["o_orderkey"], hash_bucket_num=4,
                     configuration={"compaction.auto": "false"})
    delta = seed.filter("o_orderkey % 10 = 0") \
                .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    before = _jobs(spark)
    t.upsert(delta)
    assert _jobs(spark) - before == 1, \
        "join/agg-free upsert commit must run as a single Spark job"
    # and AQE must be back on for the session afterwards
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"


def test_aqe_probe_classifies_plans(spark, seed):
    assert W._aqe_pointless(seed.filter("o_orderkey > 5").select("o_orderkey"))
    agg = seed.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("s"))
    assert not W._aqe_pointless(agg)
    joined = seed.join(agg, "o_custkey")
    assert not W._aqe_pointless(joined)
    # kill switch
    os.environ["STARLAKE_WRITE_AQE"] = "keep"
    try:
        assert not W._aqe_pointless(seed)
    finally:
        del os.environ["STARLAKE_WRITE_AQE"]


def test_aqe_restored_when_write_fails(spark, seed, tmp_table_dir):
    t = create_table(spark, seed, tmp_table_dir,
                     hash_partitions=["o_orderkey"], hash_bucket_num=4)
    bad = seed.withColumn("o_orderkey", F.lit(None).cast("long"))
    with pytest.raises(Exception):
        t.upsert(bad)
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
