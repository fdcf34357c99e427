"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The inventory lives in starlake_spark/queries/ — analytical suite
(TPC-H-ish + operator coverage), LLM-pipeline suite (dedup, text
analysis, similarity search), and engine suite (upsert/MoR, merge
operators, update/delete, compaction, replaceWhere, time travel,
CoW upsert, streaming sink).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: MoR-upserted orders table → revenue by status.

    Exercises the whole engine: create (bucketed write), three delta
    upserts (full-row / partial-column / new-keys), merge-on-read scan,
    then a relational aggregate on top.
    """
    from starlake_spark.queries.engine_suite import _build_upserted_orders

    t = _build_upserted_orders(spark, SMOKE_SF_DIR, "entry_flagship")
    return (
        t.to_df()
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from starlake_spark.queries import all_queries

    return {name: fn for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    from starlake_spark.queries import all_queries

    return {name: sql for name, (_fn, sql) in all_queries().items() if sql is not None}
