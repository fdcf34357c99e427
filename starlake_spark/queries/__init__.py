"""Query inventory: every operator the engine claims, as (spark_fn,
oracle_sql) pairs consumed by __spark_entry__.py and bench.py.

Cross-engine exactness rules (Spark result must hash-match duckdb):

* money sums go through DECIMAL(18,2) per-term casts so the aggregate
  is exact and order-independent, then CAST AS DOUBLE at the end;
* averages are ROUND(avg, 6) — kills partial-aggregation ulp noise;
* counts are BIGINT on both sides (duckdb needs the explicit cast);
* every window/top-k has a total tie-break order;
* every computed column is aliased identically in both dialects.
"""

from starlake_spark.queries.analytics import ANALYTICS_QUERIES
from starlake_spark.queries.tpch_rest import TPCH_REST_QUERIES
from starlake_spark.queries.llm_suite import LLM_QUERIES
from starlake_spark.queries.engine_suite import ENGINE_QUERIES


def all_queries():
    """name -> (fn(spark, sf_dir) -> DataFrame, oracle_sql | None)."""
    out = {}
    for d in (ANALYTICS_QUERIES, TPCH_REST_QUERIES, LLM_QUERIES, ENGINE_QUERIES):
        dup = set(out) & set(d)
        if dup:
            raise ValueError(f"duplicate query names: {dup}")
        out.update(d)
    return out
