"""Lakehouse-engine query suite: each query runs a full DML scenario
(create → upsert/update/delete/compact/stream → read) on a scratch
star table built from the test tables, returning the final scan. The
duckdb oracle reproduces the same end state with pure SQL over the
*original* parquet — so the engine's MoR/commit machinery is checked
against an independent relational emulation (FIXTURES.md F6 probes).
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import Window as W, functions as F

from starlake_spark.local import local_df
from starlake_spark.meta import ManifestStore
from starlake_spark.queries.analytics import ld, ld_count
from starlake_spark.table import StarTable, create_table

SUITE_ROOT = os.environ.get(
    "STARLAKE_SUITE_DIR",
    "/dev/shm/starlake_suite" if os.path.isdir("/dev/shm") else "/tmp/starlake_suite")

ORDER_COLS = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
              "o_orderdate", "o_orderpriority"]


def _scratch(sf_dir: str, name: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = os.path.join(SUITE_ROOT, tag, name)
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


# ---------------------------------------------------------------------------
# upsert / MoR
# ---------------------------------------------------------------------------

def _build_upserted_orders(spark, sf_dir, name):
    o = ld(spark, sf_dir, "orders")
    t = create_table(spark, o, _scratch(sf_dir, name),
                     range_partitions=["o_orderpriority"],
                     hash_partitions=["o_orderkey"], hash_bucket_num=8)
    # delta 1: full-row update of every 10th order
    t.upsert(o.filter(F.col("o_orderkey") % 10 == 0)
              .withColumn("o_totalprice", F.col("o_totalprice") * 2))
    # delta 2: partial-column update (status only) of every 7th order
    t.upsert(o.filter(F.col("o_orderkey") % 7 == 0)
              .select("o_orderkey", F.lit("X").alias("o_orderstatus"), "o_orderpriority"))
    # delta 3: brand-new keys
    t.upsert(o.filter(F.col("o_orderkey") % 100 == 0)
              .withColumn("o_orderkey", F.col("o_orderkey") + 1000000))
    return t


UPSERT_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM (
  SELECT o_orderkey, o_custkey,
    CASE WHEN o_orderkey % 7 = 0 THEN 'X' ELSE o_orderstatus END AS o_orderstatus,
    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
    o_orderdate, o_orderpriority
  FROM orders
  UNION ALL
  SELECT o_orderkey + 1000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 0
)
ORDER BY o_orderkey
"""


# read-only queries over the same upsert scenario share one build per
# process; mutating queries (compaction) always build their own copy
_BUILD_CACHE: dict = {}


def _upserted_orders_shared(spark, sf_dir):
    key = ("shared_mor", sf_dir)
    if key not in _BUILD_CACHE:
        _BUILD_CACHE[key] = _build_upserted_orders(spark, sf_dir, "shared_mor")
    return _BUILD_CACHE[key]


def star_upsert_mor(spark, sf_dir):
    t = _upserted_orders_shared(spark, sf_dir)
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


def star_compaction_invariance(spark, sf_dir):
    """Same scenario + forced compaction: results must equal the
    pre-compaction oracle (CompactionDoNotChangeResult invariant)."""
    t = _build_upserted_orders(spark, sf_dir, "compaction_inv")
    t.compaction(force=True)
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


def star_time_travel(spark, sf_dir):
    t = _upserted_orders_shared(spark, sf_dir)
    return t.to_df(version=1).select(*ORDER_COLS).orderBy("o_orderkey")


TIME_TRAVEL_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# update / delete
# ---------------------------------------------------------------------------

def star_update_delete(spark, sf_dir):
    c = ld(spark, sf_dir, "customer")
    t = create_table(spark, c, _scratch(sf_dir, "update_delete"),
                     hash_partitions=["c_custkey"], hash_bucket_num=4)
    t.update("c_mktsegment = 'AUTOMOBILE'",
             {"c_acctbal": F.col("c_acctbal") + 100.0})
    t.delete("c_acctbal > 9000.0")
    return t.to_df().orderBy("c_custkey")


UPDATE_DELETE_ORACLE = """
SELECT c_custkey, c_name, c_nationkey,
  CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal + 100.0 ELSE c_acctbal END AS c_acctbal,
  c_mktsegment
FROM customer
WHERE NOT COALESCE(
  (CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN c_acctbal + 100.0 ELSE c_acctbal END) > 9000.0,
  FALSE)
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# merge operators
# ---------------------------------------------------------------------------

def star_merge_op_sum(spark, sf_dir):
    o = ld(spark, sf_dir, "orders")
    base = o.select("o_orderkey",
                    F.col("o_totalprice").alias("val"),
                    F.col("o_orderstatus").alias("tag"),
                    "o_orderpriority")
    t = create_table(spark, base, _scratch(sf_dir, "merge_op"),
                     range_partitions=["o_orderpriority"],
                     hash_partitions=["o_orderkey"], hash_bucket_num=8)
    t.upsert(o.filter(F.col("o_orderkey") % 5 == 0)
              .select("o_orderkey", F.lit(1000.0).alias("val"),
                      F.lit("u1").alias("tag"), "o_orderpriority"))
    t.upsert(o.filter(F.col("o_orderkey") % 20 == 0)
              .select("o_orderkey", F.lit(500.0).alias("val"),
                      F.lit("u2").alias("tag"), "o_orderpriority"))
    return (t.to_df(merge_operators={"val": "sum", "tag": "concat"})
            .select("o_orderkey", "val", "tag")
            .orderBy("o_orderkey"))


MERGE_OP_ORACLE = """
SELECT o_orderkey,
  o_totalprice
    + CASE WHEN o_orderkey % 5 = 0 THEN 1000.0 ELSE 0.0 END
    + CASE WHEN o_orderkey % 20 = 0 THEN 500.0 ELSE 0.0 END AS val,
  o_orderstatus
    || CASE WHEN o_orderkey % 5 = 0 THEN ',u1' ELSE '' END
    || CASE WHEN o_orderkey % 20 = 0 THEN ',u2' ELSE '' END AS tag
FROM orders ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# incremental time-bucketed rollup (continuous aggregate)
# ---------------------------------------------------------------------------

def star_rollup_incremental(spark, sf_dir):
    """Hypertable-style continuous aggregate (plans/rollup.py): hourly
    value sums per event_type, created from half the events, advanced
    INCREMENTALLY after appending the rest — the refresh shuffles only
    the new rows' partials and merges through the MoR sum operator.
    The inline assert pins that the incremental path (not a rebuild)
    ran; the final view is oracle-checked against a flat GROUP BY of
    everything."""
    from starlake_spark.plans import rollup as R

    e = ld(spark, sf_dir, "events")
    src_path = _scratch(sf_dir, "rollup_src")
    src = create_table(spark, e.filter(F.col("event_id") % 2 == 0), src_path)
    t = R.create_rollup(spark, src_path, _scratch(sf_dir, "rollup_agg"),
                        time_col="ts", group_cols=["event_type"],
                        aggs={"value": "sum"}, hash_bucket_num=8)
    src.write(e.filter(F.col("event_id") % 2 == 1), mode="append")
    res = R.refresh_rollup(spark, t)
    assert res["mode"] == "incremental", res
    return (R.read_rollup(spark, t)
            .select("bucket_ts", "event_type",
                    F.col("value_sum").cast("double").alias("value_sum"),
                    F.col("n_rows").cast("long").alias("n_rows"))
            .orderBy("bucket_ts", "event_type"))


ROLLUP_ORACLE = """
SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def star_dml_rollup(spark, sf_dir):
    """Delete-aware incremental rollup over a MUTABLE (hash-partitioned)
    source — the continuous aggregate nobody gets for free: the source
    takes an insert wave, an UPDATE wave (upsert value*3), and a
    tombstone DELETE, and ONE refresh advances the hourly rollup
    through the typed change feed with pre-images (update nets
    new - old, delete nets a retraction) — no rescan of the source's
    history. The inline assert pins that the incremental path ran; the
    final view must equal a flat GROUP BY of the source's final state."""
    from starlake_spark.plans import rollup as R

    e = ld(spark, sf_dir, "events")
    src_path = _scratch(sf_dir, "dml_rollup_src")
    src = create_table(spark, e.filter(F.col("event_id") % 10 != 0), src_path,
                       hash_partitions=["event_id"], hash_bucket_num=8)
    t = R.create_rollup(spark, src_path, _scratch(sf_dir, "dml_rollup_agg"),
                        time_col="ts", group_cols=["event_type"],
                        aggs={"value": "sum"}, hash_bucket_num=8)
    src.upsert(e.filter(F.col("event_id") % 10 == 0))                    # inserts
    src.upsert(e.filter(F.col("event_id") % 7 == 0)
                .withColumn("value", F.col("value") * 3))                # updates
    src.delete("event_id % 13 = 0", use_delta=True)                      # deletes
    res = R.refresh_rollup(spark, t)
    assert res["mode"] == "incremental", res
    return (R.read_rollup(spark, t)
            .filter(F.col("n_rows") > 0)
            .select("bucket_ts", "event_type",
                    F.col("value_sum").cast("double").alias("value_sum"),
                    F.col("n_rows").cast("long").alias("n_rows"))
            .orderBy("bucket_ts", "event_type"))


DML_ROLLUP_ORACLE = """
WITH final AS (
  SELECT ts, event_type,
         CASE WHEN event_id % 7 = 0 THEN value * 3 ELSE value END AS value
  FROM events
  WHERE event_id % 13 != 0
)
SELECT date_trunc('hour', ts) AS bucket_ts, event_type,
       CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS value_sum,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM final GROUP BY 1, 2 ORDER BY 1, 2
"""


def star_rollup_minmax(spark, sf_dir):
    """Round-10: min/max rollups over a MUTABLE (hash) source — the
    shape rounds ≤9 refused at create (a retracted extremum defeats
    the min/max merge operators). The signed window now carries
    per-cell retraction probes; cells whose stored extremum a
    retraction ties/beats are REPLACED by full-cell recomputes pinned
    at the window end (CoW predicate delete + absolute rows in the
    gated upsert, plans/rollup.py _minmax_threatened/_rescan_cells),
    everything else folds. Storm: an UPDATE wave that lifts every
    (day, type) cell's maximum holder (retracting all maxima at once)
    and a DELETE of the minimum tail; ONE incremental refresh."""
    from starlake_spark.plans import rollup as R

    e = ld(spark, sf_dir, "events")
    src_path = _scratch(sf_dir, "mm_rollup_src")
    src = create_table(spark, e, src_path,
                       hash_partitions=["event_id"], hash_bucket_num=8)
    t = R.create_rollup(spark, src_path, _scratch(sf_dir, "mm_rollup_agg"),
                        time_col="ts", bucket="day",
                        group_cols=["event_type"],
                        aggs={"value": "min", "user_id": "max"},
                        hash_bucket_num=8)
    # retract every cell's max(user_id): lift the holders out of range
    mx = (src.to_df()
          .groupBy(F.date_trunc("day", "ts").alias("b"),
                   F.col("event_type").alias("et"))
          .agg(F.max("user_id").alias("mx")))
    sd = src.to_df()
    src.upsert(sd.join(mx, (F.date_trunc("day", sd["ts"]) == mx["b"])
                       & (sd["event_type"] == mx["et"]))
               .filter(F.col("user_id") == F.col("mx"))
               .select("event_id", "ts",
                       (F.col("user_id") + 1000000).alias("user_id"),
                       "event_type", "value", "props"))
    # and delete the low-value tail (threatens min(value) cells)
    src.delete("value < 5", use_delta=True)
    res = R.refresh_rollup(spark, t)
    assert res["mode"] == "incremental", res
    return (R.read_rollup(spark, t)
            .filter(F.col("n_rows") > 0)
            .select("bucket_ts", "event_type",
                    F.round(F.col("value_min").cast("double"), 6)
                    .alias("value_min"),
                    F.col("user_id_max").cast("long").alias("uid_max"),
                    F.col("n_rows").cast("long").alias("n_rows"))
            .orderBy("bucket_ts", "event_type"))


ROLLUP_MINMAX_ORACLE = """
WITH lifted AS (
  SELECT event_id, ts, event_type, value,
         CASE WHEN user_id = MAX(user_id) OVER
                   (PARTITION BY date_trunc('day', ts), event_type)
              THEN user_id + 1000000 ELSE user_id END AS user_id
  FROM events
),
final AS (
  SELECT * FROM lifted WHERE value >= 5
)
SELECT date_trunc('day', ts) AS bucket_ts, event_type,
       ROUND(CAST(MIN(value) AS DOUBLE), 6) AS value_min,
       CAST(MAX(user_id) AS BIGINT) AS uid_max,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM final GROUP BY 1, 2 ORDER BY 1, 2
"""

def star_stream_rollup(spark, sf_dir):
    """Streaming rollup maintenance: change-stream source → per-batch
    partials → exactly-once sink (update mode). Two appends drained by
    two availableNow runs sharing a checkpoint; result must equal the
    flat GROUP BY oracle."""
    import os as _os

    from starlake_spark.plans import rollup as R

    e = ld(spark, sf_dir, "events")
    src_path = _scratch(sf_dir, "stream_rollup_src")
    src = create_table(spark, e.filter(F.col("event_id") % 3 == 0), src_path)
    t = R.create_rollup(spark, src_path, _scratch(sf_dir, "stream_rollup_agg"),
                        time_col="ts", group_cols=["event_type"],
                        aggs={"value": "sum"}, hash_bucket_num=8)
    ckpt = _scratch(sf_dir, "stream_rollup_ckpt")
    _os.makedirs(ckpt, exist_ok=True)
    src.write(e.filter(F.col("event_id") % 3 == 1), mode="append")
    R.stream_rollup(spark, t, checkpoint_dir=ckpt).awaitTermination(300)
    src.write(e.filter(F.col("event_id") % 3 == 2), mode="append")
    R.stream_rollup(spark, t, checkpoint_dir=ckpt).awaitTermination(300)
    return (R.read_rollup(spark, t)
            .select("bucket_ts", "event_type",
                    F.col("value_sum").cast("double").alias("value_sum"),
                    F.col("n_rows").cast("long").alias("n_rows"))
            .orderBy("bucket_ts", "event_type"))


# same end state as the batch-refresh scenario: everything aggregated
STREAM_ROLLUP_ORACLE = ROLLUP_ORACLE


# ---------------------------------------------------------------------------
# footer-stats data skipping
# ---------------------------------------------------------------------------

def star_stats_skipping(spark, sf_dir):
    """Delta-style data skipping (operators/reader._prune_files_by_stats):
    customer written in four c_custkey bands (one commit each → disjoint
    per-file key ranges in the footer stats), then read with
    to_df(where=...) — the manifest drops the out-of-range files before
    any scan. The inline assert pins that skipping actually fired; the
    returned aggregate is oracle-checked against a plain WHERE."""
    c = ld(spark, sf_dir, "customer")
    hi = c.agg(F.max("c_custkey")).collect()[0][0] + 1
    step = hi // 4 + 1
    t = create_table(spark, c.filter(F.col("c_custkey") < step),
                     _scratch(sf_dir, "stats_skipping"))
    for b in range(1, 4):
        t.write(c.filter((F.col("c_custkey") >= b * step)
                         & (F.col("c_custkey") < (b + 1) * step)), mode="append")

    n_files = len(t.store.snapshot().all_files())
    df = t.to_df(where=f"c_custkey < {step}")
    assert 0 < len(df.inputFiles()) < n_files, "stats skipping must drop files"

    return (df.groupBy("c_nationkey")
              .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                   F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                    .cast("double").alias("acctbal_sum"))
              .orderBy("c_nationkey"))


# the spark side re-derives `step` from max(c_custkey); mirror it here
STATS_SKIPPING_ORACLE = """
WITH b AS (
  SELECT (MAX(c_custkey) + 1) // 4 + 1 AS step FROM customer
)
SELECT c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS acctbal_sum
FROM customer, b WHERE c_custkey < b.step
GROUP BY c_nationkey ORDER BY c_nationkey
"""


def star_clustered_skipping(spark, sf_dir):
    """OPTIMIZE-style clustered rewrite: customer lands salted across 8
    overlapping files (no skipping possible), then
    compaction(sort_columns=['c_custkey']) range-clusters the layout so
    to_df(where=...) skips most files. Inline asserts pin both halves
    (no skip before, real skip after); the aggregate is oracle-checked."""
    c = ld(spark, sf_dir, "customer")
    hi = c.agg(F.max("c_custkey")).collect()[0][0] + 1
    step = hi // 4 + 1
    t = create_table(spark, c, _scratch(sf_dir, "clustered_skipping"),
                     configuration={"write.files.per.partition": "8"})
    n0 = len(t.store.snapshot().all_files())
    assert len(t.to_df(where=f"c_custkey < {step}").inputFiles()) == n0, \
        "salted layout must not be skippable"
    t.compaction(sort_columns=["c_custkey"], target_files=8)
    df = t.to_df(where=f"c_custkey < {step}")
    assert 0 < len(df.inputFiles()) < len(t.store.snapshot().all_files()), \
        "clustered layout must skip files"

    return (df.groupBy("c_nationkey")
              .agg(F.count(F.lit(1)).cast("long").alias("n_customers"),
                   F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                    .cast("double").alias("acctbal_sum"))
              .orderBy("c_nationkey"))


CLUSTERED_SKIPPING_ORACLE = STATS_SKIPPING_ORACLE


# ---------------------------------------------------------------------------
# replaceWhere partition overwrite
# ---------------------------------------------------------------------------

def star_replace_where(spark, sf_dir):
    c = ld(spark, sf_dir, "customer")
    t = create_table(spark, c, _scratch(sf_dir, "replace_where"),
                     range_partitions=["c_mktsegment"])
    newdata = c.filter(F.col("c_mktsegment") == "BUILDING") \
               .withColumn("c_acctbal", F.lit(0.0))
    t.write(newdata, mode="overwrite", replace_where="c_mktsegment = 'BUILDING'")
    return (t.to_df()
            .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
            .orderBy("c_custkey"))


REPLACE_WHERE_ORACLE = """
SELECT c_custkey, c_name, c_nationkey,
  CASE WHEN c_mktsegment = 'BUILDING' THEN 0.0 ELSE c_acctbal END AS c_acctbal,
  c_mktsegment
FROM customer ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# CoW upsert (coalesce semantics)
# ---------------------------------------------------------------------------

def star_cow_upsert(spark, sf_dir):
    c = ld(spark, sf_dir, "customer")
    t = create_table(spark, c, _scratch(sf_dir, "cow_upsert"),
                     hash_partitions=["c_custkey"], hash_bucket_num=4)
    delta = c.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit(None).cast("string").alias("c_name"),  # NULL must NOT win on CoW
        (F.col("c_acctbal") + 50.0).alias("c_acctbal"),
    )
    t.upsert(delta, use_delta=False)
    return t.to_df().orderBy("c_custkey")


COW_UPSERT_ORACLE = """
SELECT c_custkey, c_name, c_nationkey,
  CASE WHEN c_custkey % 3 = 0 THEN c_acctbal + 50.0 ELSE c_acctbal END AS c_acctbal,
  c_mktsegment
FROM customer ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# streaming sink (exactly-once)
# ---------------------------------------------------------------------------

def star_streaming_sink(spark, sf_dir):
    from starlake_spark.streaming.sink import StarStreamSink, write_stream

    path = _scratch(sf_dir, "streaming_sink")
    events = ld(spark, sf_dir, "events")
    empty = events.limit(0)
    create_table(spark, empty, path, hash_partitions=["event_id"], hash_bucket_num=4)

    ckpt = path + "_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)
    # FileStreamSource needs a directory; glob-filter to the events file.
    stream = _events_stream(spark, sf_dir)
    q = write_stream(stream, path, query_id="suite_stream", output_mode="update",
                     checkpoint_dir=ckpt)
    q.awaitTermination(120)

    # replay batch 0 manually — the exactly-once registry must skip it
    sink = StarStreamSink(ManifestStore(path), "suite_stream", "update")
    assert sink.write_batch(events, 0) is False, "batch replay was not skipped"

    t = StarTable.for_path(spark, path)
    return t.to_df().select("event_id", "ts", "user_id", "event_type", "value", "props") \
            .orderBy("event_id")


STREAMING_ORACLE = """
SELECT event_id, ts, user_id, event_type, value, props FROM events ORDER BY event_id
"""


def star_native_stream_sink(spark, sf_dir):
    """NATIVE streaming sink (writeStream.format("star"), the V2
    StreamSinkProvider parity — vs star_streaming_sink's foreachBatch
    recipe): events drain into a range-partitioned star table through
    the Arrow stream writer, each micro-batch committing under the
    exactly-once (sink id, batch id) registry. A full checkpointed
    re-run must add zero commits (the inline assert), and the table
    must read back as exactly the events slice."""
    from starlake_spark import sources

    sources.register(spark)
    path = _scratch(sf_dir, "native_stream_sink")
    events = ld(spark, sf_dir, "events")
    create_table(spark, events.limit(0), path, range_partitions=["event_type"])
    ckpt = path + "_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)

    def _drain():
        q = (_events_stream(spark, sf_dir)
             .writeStream.format("star")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start(path))
        q.awaitTermination(120)

    _drain()
    t = StarTable.for_path(spark, path)
    v0 = t.store.latest_version()
    _drain()  # checkpoint restart, no new input
    assert t.store.latest_version() == v0, \
        "restart with no new input must commit nothing"
    return t.to_df().select("event_id", "ts", "user_id", "event_type",
                            "value", "props").orderBy("event_id")


# ---------------------------------------------------------------------------
# streaming SOURCE: format('star') change stream (beyond the reference)
# ---------------------------------------------------------------------------

def star_stream_source(spark, sf_dir):
    """Tail a star table as a structured stream: base load (v1), delta
    upsert (v2), compaction (v3, must NOT re-emit), delta upsert (v4);
    the emitted change feed is checked row-for-row against an oracle of
    the three real commits. Runs on customer (the streaming machinery's
    per-file python-worker overhead dominates at this scale — the same
    semantics on 10x the rows proves nothing extra)."""
    from starlake_spark import sources

    sources.register(spark)
    path = _scratch(sf_dir, "stream_source")
    c = ld(spark, sf_dir, "customer")
    t = create_table(spark, c, path,
                     hash_partitions=["c_custkey"], hash_bucket_num=4)
    t.upsert(c.filter(F.col("c_custkey") % 10 == 0)
              .withColumn("c_acctbal", F.col("c_acctbal") * 2))
    t.compaction(force=True)
    t.upsert(c.filter(F.col("c_custkey") % 7 == 0)
              .withColumn("c_mktsegment", F.lit("X")))

    out, ckpt = path + "_out", path + "_ckpt"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (spark.readStream.format("star").load(path)
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return (spark.read.parquet(out)
            .select("c_custkey", "c_name", "c_nationkey", "c_acctbal",
                    "c_mktsegment", "_commit_version")
            .orderBy("c_custkey", "_commit_version"))


STREAM_SOURCE_ORACLE = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment, _commit_version
FROM (
  SELECT *, CAST(1 AS BIGINT) AS _commit_version FROM customer
  UNION ALL
  SELECT c_custkey, c_name, c_nationkey, c_acctbal * 2, c_mktsegment,
         CAST(2 AS BIGINT) FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, 'X',
         CAST(4 AS BIGINT) FROM customer WHERE c_custkey % 7 = 0
)
ORDER BY c_custkey, _commit_version
"""


# ---------------------------------------------------------------------------
# schema evolution (autoMerge upsert adds a column)
# ---------------------------------------------------------------------------

def star_schema_evolution(spark, sf_dir):
    """Partial-column upsert carrying a brand-new column: the schema
    auto-merges (UpsertSuiteBase.scala:249-278 semantics — old rows keep
    their values and read the new column as null)."""
    o = ld(spark, sf_dir, "orders")
    t = create_table(spark, o.select(*ORDER_COLS), _scratch(sf_dir, "schema_evo"),
                     hash_partitions=["o_orderkey"], hash_bucket_num=8)
    delta = (o.filter(F.col("o_orderkey") % 5 == 0)
             .select("o_orderkey", F.lit("vip").alias("customer_tier")))
    t.upsert(delta)
    return (t.to_df()
            .select(*ORDER_COLS, "customer_tier")
            .orderBy("o_orderkey"))


SCHEMA_EVO_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority,
       CASE WHEN o_orderkey % 5 = 0 THEN 'vip' ELSE NULL END AS customer_tier
FROM orders ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# streaming watermark + windowed aggregation through the sink
# ---------------------------------------------------------------------------

def _events_stream(spark, sf_dir):
    """readStream over events.parquet with ``ts`` normalized to plain
    TIMESTAMP per micro-batch — the streaming twin of ``ld()``'s
    convention (nanos-as-long → floor to micros; NTZ → session-TZ cast),
    so stream results line up with batch/duckdb values."""
    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    for f in raw_schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.name == "ts" and f.dataType.simpleString() == "timestamp_ntz":
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def star_streaming_watermark(spark, sf_dir):
    """Watermarked hourly window agg (Spark-side state) flowing through
    the exactly-once sink in update mode: each micro-batch's updated
    windows are delta-upserted by (hour, event_type) key. Final table ==
    the batch aggregate (StarSinkSuite.scala:314 'aggregation +
    watermark' parity)."""
    from starlake_spark.streaming.sink import write_stream

    path = _scratch(sf_dir, "streaming_wm")
    stream = _events_stream(spark, sf_dir)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"))
        .select(F.col("w.start").alias("hour"), "event_type", "n", "total_value")
    )
    empty = local_df(spark, [], agg.schema)
    create_table(spark, empty, path, hash_partitions=["hour", "event_type"],
                 hash_bucket_num=4)
    ckpt = path + "_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)
    q = write_stream(agg, path, query_id="suite_wm", output_mode="update",
                     checkpoint_dir=ckpt, spark_output_mode="update")
    q.awaitTermination(180)
    t = StarTable.for_path(spark, path)
    return t.to_df().orderBy("hour", "event_type")


STREAMING_WM_ORACLE = """
SELECT DATE_TRUNC('hour', ts) AS hour, event_type,
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY 1, 2 ORDER BY hour, event_type
"""


# ---------------------------------------------------------------------------
# materialized view rewrite end-to-end
# ---------------------------------------------------------------------------

MV_VIEW_SQL = """
SELECT o_orderstatus, o_orderpriority,
       count(1) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM mvq_orders WHERE o_totalprice > 1000.0
GROUP BY o_orderstatus, o_orderpriority
"""

MV_QUERY_SQL = MV_VIEW_SQL + " HAVING o_orderstatus <> 'X'"


def star_mv_rewrite(spark, sf_dir):
    """Create table → create MV → run a query that must REWRITE onto the
    view (same agg set + compensation HAVING predicate). The rewrite is
    asserted, not just attempted — a silent fallback would still produce
    correct rows and hide a regression."""
    from starlake_spark.sql import StarSession
    from starlake_spark.plans import mv as mvmod

    wh = _scratch(sf_dir, "mv_wh")
    sess = StarSession(spark, warehouse=wh)
    o = ld(spark, sf_dir, "orders")
    sess.create_table(o, os.path.join(wh, "orders_t"), name="mvq_orders")
    sess.create_material_view("mvq_agg", os.path.join(wh, "mvq_agg"), MV_VIEW_SQL)
    hit = mvmod.try_rewrite(sess, MV_QUERY_SQL)
    assert hit is not None, "MV rewrite did not trigger"
    return hit.orderBy("o_orderstatus", "o_orderpriority")


MV_ORACLE = """
SELECT o_orderstatus, o_orderpriority,
       CAST(count(1) AS BIGINT) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders WHERE o_totalprice > 1000.0
GROUP BY o_orderstatus, o_orderpriority
HAVING o_orderstatus <> 'X'
ORDER BY o_orderstatus, o_orderpriority
"""


# ---------------------------------------------------------------------------
# custom stateful streaming operator (applyInPandasWithState)
# ---------------------------------------------------------------------------

def star_stateful_sessions(spark, sf_dir):
    """Streaming sessionization with custom per-session aggregates via
    applyInPandasWithState (beyond the reference, which delegates all
    stateful streaming to Spark): events are replayed through 3 timed
    micro-batches + a watermark sentinel; every emitted CLOSED session
    must match the relational oracle. total_value is excluded from the
    projection — the kernel accumulates in event-time order while SQL
    SUM is unordered, so float ulp could differ; the integral-value
    differential in tests/test_stateful_streaming.py pins it instead."""
    from starlake_spark.streaming.stateful import sessionize_stream

    path = _scratch(sf_dir, "stateful_sessions")
    ev = (ld(spark, sf_dir, "events")
          .filter(F.col("user_id") % 25 == 0)
          .select("user_id", "ts", "event_type", "value"))
    chunks = ev.withColumn("_b", F.ntile(2).over(W.orderBy("ts")))
    for b in (1, 2):
        chunks.filter(F.col("_b") == b).drop("_b").coalesce(1) \
            .write.mode("overwrite").parquet(f"{path}/src/b{b}")
    far = ev.agg(F.max("ts")).collect()[0][0]
    import datetime as _dt

    sentinel = [(999999999, far + _dt.timedelta(days=30), "sentinel", 0.0)]
    local_df(spark, sentinel, ev.schema).coalesce(1) \
        .write.mode("overwrite").parquet(f"{path}/src/b3")

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "1")
              .parquet(f"{path}/src/*"))
    out = sessionize_stream(stream, gap_s=1800.0, watermark="0 seconds")
    shutil.rmtree(f"{path}/out", ignore_errors=True)
    shutil.rmtree(f"{path}/ck", ignore_errors=True)
    q = (out.writeStream.format("parquet")
         .option("path", f"{path}/out")
         .option("checkpointLocation", f"{path}/ck")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    return (spark.read.parquet(f"{path}/out")
            .filter(F.col("user_id") != 999999999)
            .select("user_id", "session_start", "session_end",
                    "n_events", "n_types", "first_type", "last_type")
            .orderBy("user_id", "session_start"))


STATEFUL_SESSIONS_ORACLE = """
WITH ev AS (
  SELECT user_id, ts, event_type FROM events WHERE user_id % 25 = 0
), marked AS (
  SELECT *, CASE WHEN EXTRACT(EPOCH FROM ts - LAG(ts) OVER
      (PARTITION BY user_id ORDER BY ts)) > 1800 THEN 1 ELSE 0 END AS new_sess
  FROM ev
), sess AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
      ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
  COUNT(*) AS n_events,
  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
  ARG_MIN(event_type, ts) AS first_type,
  ARG_MAX(event_type, ts) AS last_type
FROM sess GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


# ---------------------------------------------------------------------------
# format('star') batch DataSource read
# ---------------------------------------------------------------------------

def star_datasource_read(spark, sf_dir):
    """Batch snapshot read through the datasource surface: create →
    append → load latest snapshot via ``sources.read_star``, the JVM
    parquet fast path (pushdown/pruning/codegen — same plan class as
    ``to_df``). The pure-Python ``format("star")`` batch reader is a
    compatibility shim (per-partition Python workers, ~10× slower) and
    is pinned — including version time travel and partition_filter
    pruning and its equivalence to read_star — by
    tests/test_datasource.py, not re-timed here."""
    from starlake_spark import sources

    path = _scratch(sf_dir, "datasource_read")
    s = ld(spark, sf_dir, "supplier")
    t = create_table(spark, s, path, range_partitions=["s_nationkey"])
    t.write(s.filter(F.col("s_suppkey") % 4 == 0)
             .withColumn("s_suppkey", F.col("s_suppkey") + 1000000),
            mode="append")

    return (sources.read_star(spark, path)
            .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
            .orderBy("s_suppkey"))


DATASOURCE_READ_ORACLE = """
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM (
  SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
  UNION ALL
  SELECT s_suppkey + 1000000, s_name, s_nationkey, s_acctbal
  FROM supplier WHERE s_suppkey % 4 = 0
) ORDER BY s_suppkey
"""


def star_datasource_write(spark, sf_dir):
    """V2 batch WRITE through ``df.write.format("star")`` (reference
    StarLakeTableV2 V1_BATCH_WRITE/TRUNCATE): tasks stream Arrow
    batches into an unpublished commit directory (range-splitting
    in-task), the driver publishes the manifest atomically — then an
    overwrite truncate-replaces. The read-back goes through the table
    API, so manifest range values, footer stats and partition pruning
    recorded by the V2 writer must all be coherent."""
    from starlake_spark import sources

    sources.register(spark)
    path = _scratch(sf_dir, "datasource_write")
    s = ld(spark, sf_dir, "supplier")
    t = create_table(spark, s.limit(0), path, range_partitions=["s_nationkey"])
    s.write.format("star").mode("append").save(path)
    (s.filter(F.col("s_suppkey") % 3 == 0)
      .withColumn("s_suppkey", F.col("s_suppkey") + 2_000_000)
      .write.format("star").mode("append").save(path))
    pruned = t.to_df(where="s_nationkey = 3")
    assert len(pruned.inputFiles()) < len(t.to_df().inputFiles()), \
        "V2-written files must partition-prune"
    return (t.to_df()
            .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
            .orderBy("s_suppkey"))


def star_datasource_create(spark, sf_dir):
    """FIRST-WRITE table creation through the datasource — the
    reference's primary creation surface (CaseSensitivitySuite:
    ``df.write.format("star").option("rangePartitions", ...)
    .save(path)`` creates the table): partition option values resolve
    case-insensitively against the data, a replaceWhere overwrite then
    scopes to one partition (case-insensitive predicate column), and
    the read-back through the table API must see coherent manifests
    (range values, pruning). Inline asserts pin the created metadata."""
    from starlake_spark import sources
    from starlake_spark.table import StarTable

    sources.register(spark)
    path = _scratch(sf_dir, "datasource_create")
    s = ld(spark, sf_dir, "supplier")
    # note the option value casing: 's_NATIONKEY' must resolve to the
    # data's 's_nationkey'
    (s.write.format("star").option("rangePartitions", "s_NATIONKEY")
      .mode("append").save(path))
    t = StarTable.for_path(spark, path)
    assert t.info.range_cols == ["s_nationkey"], t.info.range_cols
    # replaceWhere overwrite of one partition, predicate column cased
    # differently than declared
    (s.filter(F.col("s_nationkey") == 3)
      .withColumn("s_acctbal", F.lit(0.0).cast("double"))
      .write.format("star").mode("overwrite")
      .option("replaceWhere", "S_NATIONKEY = 3").save(path))
    pruned = t.to_df(where="s_nationkey = 3")
    assert len(pruned.inputFiles()) < len(t.to_df().inputFiles()), \
        "datasource-created table must partition-prune"
    return (t.to_df()
            .select("s_suppkey", "s_name", "s_nationkey",
                    F.col("s_acctbal").cast("double").alias("s_acctbal"))
            .orderBy("s_suppkey"))


DATASOURCE_CREATE_ORACLE = """
SELECT s_suppkey, s_name, s_nationkey,
       CASE WHEN s_nationkey = 3 THEN 0.0
            ELSE CAST(s_acctbal AS DOUBLE) END AS s_acctbal
FROM supplier ORDER BY s_suppkey
"""


DATASOURCE_WRITE_ORACLE = """
SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM (
  SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier
  UNION ALL
  SELECT s_suppkey + 2000000, s_name, s_nationkey, s_acctbal
  FROM supplier WHERE s_suppkey % 3 = 0
) ORDER BY s_suppkey
"""


def star_bucketed_join(spark, sf_dir):
    """PK-join shuffle elision via bucketed materialization
    (StarTable.to_bucketed_table — the PySpark rendition of the
    reference's bucket-scan partitioning/ordering protocol,
    rules/SetPartitionAndOrdering.scala:52-141): two star tables
    hash-partitioned on o_orderkey — one upserted then compacted, one
    written at half price — are materialized as Spark bucketed tables
    and merge-joined on the PK. The join plans with ZERO hash exchanges
    and zero pre-join sorts (asserted inline, the
    ParquetScanSuite.scala:188-293 property); only the final tiny
    per-status rollup shuffles."""
    o = ld(spark, sf_dir, "orders")
    t1 = create_table(spark, o, _scratch(sf_dir, "bkt_orders"),
                      hash_partitions=["o_orderkey"], hash_bucket_num=8)
    t1.upsert(o.filter(F.col("o_orderkey") % 100 == 0)
               .withColumn("o_totalprice", F.col("o_totalprice") * 2))
    t1.compaction(force=True)
    t2 = create_table(spark, o, _scratch(sf_dir, "bkt_orders_base"),
                      hash_partitions=["o_orderkey"], hash_bucket_num=8)
    n1 = t1.to_bucketed_table("bkt_orders_cur")
    n2 = t2.to_bucketed_table("bkt_orders_base")
    a, b = spark.table(n1), spark.table(n2)
    j = (a.hint("merge")
         .join(b.hint("merge").select(F.col("o_orderkey"),
                                      F.col("o_totalprice").alias("base_price")),
               "o_orderkey"))
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, "bucketed PK join must not shuffle"
    assert "SortMergeJoin" in plan, "expected bucket-aligned SortMergeJoin"
    return (
        j.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.col("o_totalprice").cast("decimal(18,2)")
                   - F.col("base_price").cast("decimal(18,2)"))).cast("double")
            .alias("price_delta"),
        )
        .orderBy("o_orderstatus")
    )


BUCKETED_JOIN_ORACLE = """
WITH cur AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 100 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
  FROM orders
), base AS (
  SELECT o_orderkey, o_totalprice AS base_price FROM orders
)
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)) - CAST(base_price AS DECIMAL(18,2))) AS DOUBLE) AS price_delta
FROM cur JOIN base USING (o_orderkey)
GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def star_stream_dedup(spark, sf_dir):
    """Streaming exact-dedup into the exactly-once sink: the source dir
    carries the SAME events file twice (dup delivery — the at-least-once
    upstream every real pipeline has), the stream drops duplicate
    event_ids within a watermark (bounded state — the 100 TB posture:
    state holds only the watermark window, not history), and the
    MoR-upsert sink keyed on event_id makes re-delivery across batches
    idempotent too. Final table == DISTINCT over one copy. Runs on
    customer-scale events at sf0.001-equivalent volume either way since
    streaming fixed costs dominate (untimed in bench, like the other
    streaming demos)."""
    from starlake_spark.streaming.sink import write_stream

    path = _scratch(sf_dir, "stream_dedup")
    indir = _scratch(sf_dir, "stream_dedup_in")
    os.makedirs(indir, exist_ok=True)
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(indir, "a.parquet"))
    shutil.copy(f"{sf_dir}/events.parquet", os.path.join(indir, "b.parquet"))

    raw_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = spark.readStream.schema(raw_schema).parquet(indir)
    for f in raw_schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif f.name == "ts" and f.dataType.simpleString() == "timestamp_ntz":
            stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    deduped = (stream.withWatermark("ts", "1 hour")
               .dropDuplicatesWithinWatermark(["event_id"]))

    empty = ld(spark, sf_dir, "events").limit(0)
    create_table(spark, empty, path, hash_partitions=["event_id"],
                 hash_bucket_num=4)
    ckpt = path + "_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)
    q = write_stream(deduped, path, query_id="suite_dedup", output_mode="update",
                     checkpoint_dir=ckpt)
    q.awaitTermination(180)
    t = StarTable.for_path(spark, path)
    return (t.to_df().select("event_id", "user_id", "event_type", "value")
            .orderBy("event_id"))


STREAM_DEDUP_ORACLE = """
SELECT event_id, user_id, event_type, value
FROM events ORDER BY event_id
"""


def star_merge_into(spark, sf_dir):
    """ANSI MERGE INTO (dml.merge_into — beyond the reference's SQL
    surface): one statement updates matched keys (status flag + doubled
    price via s-alias expressions) AND inserts unmatched source rows
    (INSERT *). Executed through the SQL router; result pinned against
    the equivalent CASE/UNION oracle."""
    from starlake_spark.sql import StarSession

    from starlake_spark import catalog as _catalog

    o = ld(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "merge_into")
    try:  # the scratch path varies per sf_dir; drop any stale mapping
        _catalog.unregister("merge_demo")
    except Exception:
        pass
    create_table(spark, o, path, short_name="merge_demo")
    src = (
        o.filter(F.col("o_orderkey") % 50 == 0)
         .withColumn("o_totalprice", F.col("o_totalprice") * 2)
         .unionByName(
             o.filter(F.col("o_orderkey") % 77 == 0)
              .withColumn("o_orderkey", F.col("o_orderkey") + 5_000_000))
    )
    src.createOrReplaceTempView("merge_demo_src")
    ss = StarSession(spark)
    ss.sql("""
        MERGE INTO merge_demo t USING merge_demo_src s
        ON t.o_orderkey = s.o_orderkey
        WHEN MATCHED THEN UPDATE SET o_totalprice = s.o_totalprice,
                                     o_orderstatus = 'M'
        WHEN NOT MATCHED THEN INSERT *
    """)
    t = ss.table("merge_demo")
    out = (t.to_df()
           .select("o_orderkey", "o_orderstatus",
                   F.col("o_totalprice").cast("double").alias("o_totalprice"))
           .orderBy("o_orderkey"))
    return out


MERGE_INTO_ORACLE = """
WITH base AS (
  SELECT o_orderkey,
    CASE WHEN o_orderkey % 50 = 0 THEN 'M' ELSE o_orderstatus END AS o_orderstatus,
    CASE WHEN o_orderkey % 50 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
  FROM orders
), ins AS (
  SELECT o_orderkey + 5000000 AS o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 77 = 0
)
SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS o_totalprice
FROM (SELECT * FROM base UNION ALL SELECT * FROM ins)
ORDER BY o_orderkey
"""


def star_restore_clone(spark, sf_dir):
    """RESTORE + SHALLOW CLONE round-trip: upsert-churned orders table
    is restored to version 1 (pre-upsert), then shallow-cloned; the
    clone of the restored table must read exactly the original orders.
    Oracle = plain orders — any contamination from the interim upserts,
    a broken restore rewind, or clone metadata drift breaks the hash."""
    t = _build_upserted_orders(spark, sf_dir, "restore_clone")
    t.restore(1)
    c = t.clone(_scratch(sf_dir, "restore_clone_c"), shallow=True)
    return c.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


def star_delta_delete(spark, sf_dir):
    """Tombstone-delta DELETE + resurrect: delete every F-status order
    (O(matched keys) tombstone write, no file rewrite), then re-upsert a
    slice of them with only the status column set — scan must show the
    survivors plus the resurrected keys with nulls for every column the
    tombstone blanked (insert-after-delete semantics)."""
    o = ld(spark, sf_dir, "orders")
    t = create_table(spark, o, _scratch(sf_dir, "delta_delete"),
                     range_partitions=["o_orderpriority"],
                     hash_partitions=["o_orderkey"], hash_bucket_num=8)
    t.set_properties({"compaction.auto": "false"})
    t.delete("o_orderstatus = 'F'", use_delta=True)
    t.upsert(o.filter((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 10 == 0))
              .select("o_orderkey", "o_orderpriority",
                      F.lit("R").alias("o_orderstatus")))
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


DELTA_DELETE_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderstatus <> 'F'
UNION ALL
SELECT o_orderkey, NULL, 'R', NULL, NULL, o_orderpriority
FROM orders WHERE o_orderstatus = 'F' AND o_orderkey % 10 = 0
ORDER BY o_orderkey
"""


def star_generated_partitions(spark, sf_dir):
    """Generated partition column (day = to_date(ts)): events land in
    day directories the writer derives automatically, and a query that
    only mentions ts prunes them (to_date is monotone, so ts-range
    conjuncts translate to day-range partition predicates). The inline
    assert pins that pruning fired; the returned hourly aggregate is
    oracle-checked against a plain WHERE."""
    e = ld(spark, sf_dir, "events")
    t = create_table(spark, e, _scratch(sf_dir, "generated_parts"),
                     range_partitions=["day"], generated={"day": "to_date(ts)"})
    pred = ("ts >= TIMESTAMP '2024-01-05 00:00:00' AND "
            "ts < TIMESTAMP '2024-01-08 00:00:00'")
    df = t.to_df(where=pred)
    n_all = len(t.to_df().inputFiles())
    assert 0 < len(df.inputFiles()) < n_all, \
        "generated-column partition pruning must drop day directories"
    return (df.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"))
              .agg(F.count(F.lit(1)).cast("long").alias("n"),
                   F.round(F.sum(F.col("value").cast("decimal(18,6)"))
                           .cast("double"), 6).alias("value_sum"))
              .orderBy("hour"))


GENERATED_PARTS_ORACLE = """
SELECT date_trunc('hour', ts) AS hour,
  CAST(COUNT(*) AS BIGINT) AS n,
  ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 6) AS value_sum
FROM events
WHERE ts >= TIMESTAMP '2024-01-05 00:00:00'
  AND ts <  TIMESTAMP '2024-01-08 00:00:00'
GROUP BY 1 ORDER BY 1
"""


def star_idempotent_load(spark, sf_dir):
    """Retried batch ingestion lands exactly-once: a 3-batch loader runs
    TWICE end-to-end (txn_app_id/txn_version idempotence), then a few
    spot re-deliveries of single batches — the table must equal one
    clean pass of orders. Any double-append breaks the oracle hash."""
    o = ld(spark, sf_dir, "orders")
    t = create_table(spark, o.limit(0), _scratch(sf_dir, "idempotent_load"),
                     range_partitions=["o_orderstatus"])
    statuses = ["F", "O", "P"]
    for _attempt in range(2):
        for v, st in enumerate(statuses):
            t.write(o.filter(F.col("o_orderstatus") == st),
                    txn_app_id="loader", txn_version=v)
    t.write(o.filter(F.col("o_orderstatus") == "F"),
            txn_app_id="loader", txn_version=0)  # late straggler retry
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


def star_drop_column(spark, sf_dir):
    """Logical DROP COLUMN end-to-end: the dropped column disappears
    from scans immediately (schema projection), writes without it keep
    working, and compaction makes the drop physical. Oracle = customer
    without the dropped column."""
    c = ld(spark, sf_dir, "customer")
    t = create_table(spark, c, _scratch(sf_dir, "drop_column"),
                     hash_partitions=["c_custkey"], hash_bucket_num=4)
    t.drop_columns(["c_mktsegment"])
    t.compaction(force=True)
    return t.to_df().orderBy("c_custkey")


DROP_COLUMN_ORACLE = """
SELECT c_custkey, c_name, c_nationkey, c_acctbal
FROM customer ORDER BY c_custkey
"""


INGEST_RECRAWL_ID = 5_000_000


def star_ingest_dedup(spark, sf_dir):
    """Dedup-on-ingest sink end-to-end: wave 1 loads the full corpus;
    wave 2 carries re-crawls of every 10th doc (same text, new ids) plus
    five provably-novel synthetic docs; the batch is retried. Contract:
    every re-crawl must be blocked (identical text ⇒ identical bands ⇒
    verify at 1.0 — a theorem), every novel doc must land, the retry
    must be a no-op. Any failure flips a boolean the oracle pins."""
    from starlake_spark.streaming.sink import DedupIngestSink

    d = ld(spark, sf_dir, "documents").select("doc_id", "text")
    path = _scratch(sf_dir, "ingest_dedup")
    t = create_table(spark, d.limit(0), path,
                     hash_partitions=["doc_id"], hash_bucket_num=4,
                     configuration={"compaction.auto": "false"})
    sink = DedupIngestSink(ManifestStore(path), "ingest", threshold=0.5)
    sink.write_batch(d, 0)
    recrawl = (d.filter(F.col("doc_id") % 10 == 0)
               .withColumn("doc_id", F.col("doc_id") + F.lit(INGEST_RECRAWL_ID)))
    novel = local_df(spark,
        [(INGEST_RECRAWL_ID * 2 + i,
          " ".join(f"zzqx{i}w{j}" for j in range(12))) for i in range(5)],
        "doc_id long, text string")
    idx_v_after_w1 = ManifestStore(sink.index_path).latest_version()
    wave2 = recrawl.unionByName(novel)
    sink.write_batch(wave2, 1)
    sink.write_batch(wave2, 1)  # retry: exactly-once registry skips it
    # Scale invariant (the O(corpus)-per-batch killer is gone): every
    # index commit after the wave-1 sync bands ONLY docs committed to
    # the corpus since the previous sync — wave-1 docs are never
    # re-shingled, so the corpus text column is read exactly once per
    # doc across the sink's lifetime.
    from starlake_spark.sources.datasource import table_changes
    wave1_resynced = (
        table_changes(spark, sink.index_path,
                      start_version=idx_v_after_w1, ignore_deletes=True)
        .filter(F.col("doc_id") < F.lit(INGEST_RECRAWL_ID)).count())
    assert wave1_resynced == 0, (
        f"wave-2 index sync rebuilt {wave1_resynced} wave-1 band rows")
    landed = t.to_df().select("doc_id").withColumn("_l", F.lit(True))
    is_recrawl = F.col("doc_id") < INGEST_RECRAWL_ID * 2
    return (
        wave2.select("doc_id")
        .join(landed, "doc_id", "left")
        .select(
            "doc_id",
            is_recrawl.alias("is_recrawl"),
            F.coalesce(F.col("_l"), F.lit(False)).alias("landed"),
            (F.coalesce(F.col("_l"), F.lit(False)) == ~is_recrawl).alias("ok"),
        )
        .orderBy("doc_id")
    )


INGEST_DEDUP_ORACLE = f"""
SELECT doc_id + {INGEST_RECRAWL_ID} AS doc_id, TRUE AS is_recrawl,
       FALSE AS landed, TRUE AS ok
FROM documents WHERE doc_id % 10 = 0
UNION ALL
SELECT {INGEST_RECRAWL_ID * 2} + i, FALSE, TRUE, TRUE FROM range(5) t(i)
ORDER BY doc_id
"""


def star_point_lookup(spark, sf_dir):
    """Primary-key point lookups with bucket pruning: every hash-column
    equality pins the scan to ONE bucket's files per partition —
    asserted inline (file count <= total/bucket_num per probe) — and
    the 20 probed keys' rows are oracle-exact. The 1/bucket_num I/O
    shape is what makes key lookups on a 100 TB table affordable
    without an external index."""
    o = ld(spark, sf_dir, "orders")
    t = create_table(spark, o, _scratch(sf_dir, "point_lookup"),
                     hash_partitions=["o_orderkey"], hash_bucket_num=16)
    n_all = len(t.to_df().inputFiles())
    outs = []
    for k in range(1, 21):  # orderkeys 1..20 exist at every sf
        df = t.to_df(where=f"o_orderkey = {k}")
        n_read = len(df.inputFiles())
        assert n_read * 16 <= n_all * 1.01, (k, n_read, n_all)
        outs.append(df)
    out = outs[0]
    for d in outs[1:]:
        out = out.unionByName(d)
    return out.select(*ORDER_COLS).orderBy("o_orderkey")


POINT_LOOKUP_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders WHERE o_orderkey BETWEEN 1 AND 20
ORDER BY o_orderkey
"""


def star_convert_in_place(spark, sf_dir):
    """CONVERT TO STAR (Delta CONVERT TO DELTA analog): two copies of
    the orders parquet adopted IN PLACE — zero data bytes rewritten
    (asserted inline: same file set, same sizes), footer stats and row
    counts harvested during conversion (metadata-only count asserted),
    then the normal DML lifecycle continues with a CoW DELETE. Oracle =
    doubled orders minus the deleted status."""
    import os as _os

    from starlake_spark.table import convert_to_star

    path = _scratch(sf_dir, "convert_in_place")
    _os.makedirs(path, exist_ok=True)
    src = _os.path.join(sf_dir, "orders.parquet")
    shutil.copy(src, _os.path.join(path, "a.parquet"))
    shutil.copy(src, _os.path.join(path, "b.parquet"))
    sizes = {p: _os.path.getsize(_os.path.join(path, p))
             for p in ("a.parquet", "b.parquet")}
    t = convert_to_star(spark, path)
    adopted = {_os.path.basename(f.path): f
               for f in t.store.snapshot().all_files()}
    assert set(adopted) == set(sizes), adopted
    assert all(_os.path.getsize(_os.path.join(path, p)) == sz
               for p, sz in sizes.items()), "conversion rewrote data bytes"
    expected = 2 * ld_count(sf_dir, "orders")
    st = spark.sparkContext.statusTracker()
    n_jobs = len(st.getJobIdsForGroup(None) or [])
    assert t.count() == expected
    assert len(st.getJobIdsForGroup(None) or []) == n_jobs, \
        "adopted count() ran a Spark job"
    t.delete("o_orderstatus = 'P'")
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey", "o_custkey")


CONVERT_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM (
  SELECT * FROM orders UNION ALL SELECT * FROM orders
)
WHERE o_orderstatus != 'P'
ORDER BY o_orderkey, o_custkey
"""


def star_stream_preimage_cdf(spark, sf_dir):
    """STREAMING full-fidelity CDC off write-time logs: a cdf.enabled
    table takes a MoR upsert and a tombstone delete; the preimage
    stream (changeTypes + withPreimages) must drain the logged
    update_preimage/update_postimage pairs and delete rows carrying
    REAL merged pre-state values — the raw-file stream would emit only
    postimages and null-valued tombstone keys. startingVersion=1 skips
    the bulk initial insert, so the sink holds exactly the churn."""
    from starlake_spark import sources

    sources.register(spark)
    path = _scratch(sf_dir, "stream_pre_cdf")
    c = ld(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    t = create_table(spark, c, path,
                     hash_partitions=["c_custkey"], hash_bucket_num=4,
                     configuration={"compaction.auto": "false",
                                    "cdf.enabled": "true"})
    t.upsert(c.filter(F.col("c_custkey") % 10 == 0)
              .withColumn("c_acctbal", F.col("c_acctbal") * 2))        # v2
    t.delete("c_custkey % 20 = 0", use_delta=True)                      # v3

    out, ckpt = path + "_out", path + "_ckpt"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (spark.readStream.format("star")
         .option("changeTypes", "true").option("withPreimages", "true")
         .option("startingVersion", "1").load(path)
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return (spark.read.parquet(out)
            .select("c_custkey", "c_name", "c_acctbal",
                    "_commit_version", "_change_type")
            .orderBy("_commit_version", "_change_type", "c_custkey"))


STREAM_PREIMAGE_CDF_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, _commit_version, _change_type
FROM (
  SELECT c_custkey, c_name, c_acctbal,
         CAST(2 AS BIGINT) AS _commit_version, 'update_preimage' AS _change_type
  FROM customer
  WHERE c_custkey % 10 = 0 AND c_acctbal IS NOT NULL AND c_acctbal <> 0
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal * 2 AS c_acctbal,
         CAST(2 AS BIGINT), 'update_postimage'
  FROM customer
  WHERE c_custkey % 10 = 0 AND c_acctbal IS NOT NULL AND c_acctbal <> 0
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal * 2 AS c_acctbal,
         CAST(3 AS BIGINT), 'delete'
  FROM customer WHERE c_custkey % 20 = 0
)
ORDER BY _commit_version, _change_type, c_custkey
"""


def star_stream_cdf(spark, sf_dir):
    """STREAMING typed change feed: tail a table with changeTypes=true
    through readStream while it takes an insert load, a MoR upsert and
    a tombstone delete — the drained sink must hold the full typed log
    (delete rows included, carrying the tombstoned keys), proving an
    always-on downstream consumer can maintain a replica including
    deletions. Runs on customer (streaming fixed costs dominate at any
    sf; see star_stream_source)."""
    from starlake_spark import sources

    sources.register(spark)
    path = _scratch(sf_dir, "stream_cdf")
    c = ld(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    t = create_table(spark, c, path,
                     hash_partitions=["c_custkey"], hash_bucket_num=4,
                     configuration={"compaction.auto": "false"})
    t.upsert(c.filter(F.col("c_custkey") % 10 == 0)
              .withColumn("c_acctbal", F.col("c_acctbal") * 2))        # v2
    t.delete("c_custkey % 20 = 0", use_delta=True)                      # v3

    out, ckpt = path + "_out", path + "_ckpt"
    shutil.rmtree(out, ignore_errors=True)
    shutil.rmtree(ckpt, ignore_errors=True)
    q = (spark.readStream.format("star").option("changeTypes", "true").load(path)
         .writeStream.format("parquet")
         .option("path", out)
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    return (spark.read.parquet(out)
            .select("c_custkey", "c_name", "c_acctbal",
                    "_commit_version", "_change_type")
            .orderBy("_commit_version", "c_custkey"))


STREAM_CDF_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, _commit_version, _change_type
FROM (
  SELECT c_custkey, c_name, c_acctbal,
         CAST(1 AS BIGINT) AS _commit_version, 'insert' AS _change_type
  FROM customer
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal * 2,
         CAST(2 AS BIGINT), 'update_postimage'
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
         CAST(3 AS BIGINT), 'delete'
  FROM customer WHERE c_custkey % 20 = 0
)
ORDER BY _commit_version, c_custkey
"""


# ---------------------------------------------------------------------------
# CDF change types (Delta-CDF-style _change_type, beyond the reference)
# ---------------------------------------------------------------------------

def star_cdf_types(spark, sf_dir):
    """Change-data-feed with change types over an upsert → tombstone-
    delete → re-upsert sequence: the feed must tag the initial load
    'insert', MoR upsert deltas 'update_postimage', and — crucially —
    surface the delete_delta commit as 'delete' rows carrying the
    tombstoned keys (data columns null) instead of silently skipping
    it, so an incremental consumer can retract deleted rows. The
    re-upsert after the delete proves delete→insert ordering survives
    in the log."""
    from starlake_spark.sources.datasource import table_changes

    c = ld(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    path = _scratch(sf_dir, "cdf_types")
    t = create_table(spark, c, path,
                     hash_partitions=["c_custkey"], hash_bucket_num=4)
    t.set_properties({"compaction.auto": "false"})
    t.upsert(c.filter(F.col("c_custkey") % 10 == 0)
              .withColumn("c_acctbal", F.col("c_acctbal") * 2))        # v2
    t.delete("c_custkey % 20 = 0", use_delta=True)                      # v3
    t.upsert(c.filter(F.col("c_custkey") % 20 == 0)
              .withColumn("c_mktsegment", F.lit("X")))                  # v4
    return (table_changes(spark, path, 0, with_change_type=True)
            .orderBy("_commit_version", "c_custkey"))


CDF_TYPES_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, c_mktsegment, _commit_version, _change_type
FROM (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         CAST(1 AS BIGINT) AS _commit_version, 'insert' AS _change_type
  FROM customer
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal * 2, c_mktsegment,
         CAST(2 AS BIGINT), 'update_postimage'
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT c_custkey, CAST(NULL AS VARCHAR), CAST(NULL AS DOUBLE),
         CAST(NULL AS VARCHAR), CAST(3 AS BIGINT), 'delete'
  FROM customer WHERE c_custkey % 20 = 0
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal, 'X', CAST(4 AS BIGINT), 'update_postimage'
  FROM customer WHERE c_custkey % 20 = 0
)
ORDER BY _commit_version, c_custkey
"""


def star_cdc_log(spark, sf_dir):
    """Write-time CDC logging (cdf.enabled — Delta
    enableChangeDataFeed analog): every delta DML commit materializes
    its full-fidelity pre/post-image rows under <table>/_cdc/<v> at
    write time, so the change feed reads O(changes) bytes per commit
    instead of re-deriving with two key-pruned MoR scans per consumer.
    The inline assert pins that all three DML commits produced logs;
    the oracle pins the complete typed feed — update pre/post pairs
    (no-op pairs where the doubled balance is unchanged must be
    absent), delete rows carrying REAL merged pre-state values, and
    insert rows for keys resurrected after the delete."""
    import os as _os

    from starlake_spark.operators.dml import CDC_DIR
    from starlake_spark.sources.datasource import table_changes

    c = ld(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    path = _scratch(sf_dir, "cdc_log")
    t = create_table(spark, c, path,
                     hash_partitions=["c_custkey"], hash_bucket_num=4,
                     configuration={"compaction.auto": "false",
                                    "cdf.enabled": "true"})
    t.upsert(c.filter(F.col("c_custkey") % 10 == 0)
              .withColumn("c_acctbal", F.col("c_acctbal") * 2))        # v2
    t.delete("c_custkey % 20 = 0", use_delta=True)                      # v3
    t.upsert(c.filter(F.col("c_custkey") % 20 == 0)
              .withColumn("c_mktsegment", F.lit("X")))                  # v4
    logs = sorted(d for d in _os.listdir(_os.path.join(path, CDC_DIR))
                  if d.isdigit())
    assert logs == ["2", "3", "4"], f"CDC logs missing: {logs}"
    return (table_changes(spark, path, 1, with_change_type=True,
                          with_preimages=True)
            .orderBy("_commit_version", "_change_type", "c_custkey"))


CDC_LOG_ORACLE = """
SELECT c_custkey, c_name, c_acctbal, c_mktsegment, _commit_version, _change_type
FROM (
  SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
         CAST(2 AS BIGINT) AS _commit_version, 'update_preimage' AS _change_type
  FROM customer
  WHERE c_custkey % 10 = 0 AND c_acctbal IS NOT NULL AND c_acctbal <> 0
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal * 2 AS c_acctbal, c_mktsegment,
         CAST(2 AS BIGINT), 'update_postimage'
  FROM customer
  WHERE c_custkey % 10 = 0 AND c_acctbal IS NOT NULL AND c_acctbal <> 0
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal * 2 AS c_acctbal, c_mktsegment,
         CAST(3 AS BIGINT), 'delete'
  FROM customer WHERE c_custkey % 20 = 0
  UNION ALL
  SELECT c_custkey, c_name, c_acctbal, 'X' AS c_mktsegment,
         CAST(4 AS BIGINT), 'insert'
  FROM customer WHERE c_custkey % 20 = 0
)
ORDER BY _commit_version, _change_type, c_custkey
"""


def star_part_merge(spark, sf_dir):
    """Part-merge OOM guard under oracle check: 10 MoR upserts build an
    11-group history with auto-compaction fully disabled, then a forced
    compaction must chunk-fold (cap 4 — the inline asserts pin that
    part_compaction commits fired and the partition ended single-
    version) and the result must equal the last-wins fold the oracle
    computes directly: each key's balance is base + 100*(highest
    upsert index whose modulus selected it)."""
    c = ld(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    t = create_table(spark, c, _scratch(sf_dir, "part_merge"),
                     hash_partitions=["c_custkey"], hash_bucket_num=4,
                     configuration={"compaction.auto": "false",
                                    "compaction.maxDeltas": "0",
                                    "compaction.part.merge.max": "4"})
    for i in range(10):
        t.upsert(c.filter(F.col("c_custkey") % (i + 2) == 0)
                  .withColumn("c_acctbal",
                              F.col("c_acctbal") + F.lit(100.0 * (i + 1))))
    t.compaction(force=True)
    hist = [r.commit_type for r in t.history().collect()]
    assert hist.count("part_compaction") >= 2, \
        f"guard must chunk-fold an 11-group history at cap 4: {hist}"
    for ps in t.store.snapshot().partitions.values():
        assert len({f.write_version for f in ps.files}) == 1, \
            "compaction must end single-version"
    return t.to_df().orderBy("c_custkey")


_PM_CASES = ", ".join(
    f"CASE WHEN c_custkey % {i + 2} = 0 THEN {i + 1} ELSE 0 END"
    for i in range(10))
PART_MERGE_ORACLE = f"""
SELECT c_custkey, c_name,
       c_acctbal + 100.0 * GREATEST({_PM_CASES}) AS c_acctbal,
       c_mktsegment
FROM customer ORDER BY c_custkey
"""


def star_null_skipping(spark, sf_dir):
    """Null-count data skipping end-to-end: orders lands as three
    commits with distinct null profiles in a widened column (all-set /
    all-null / mixed); IS NULL and IS NOT NULL reads must prune files
    (asserted inline on inputFiles) and return exactly the rows the
    oracle derives from the same modulus rule."""
    o = ld(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "null_skipping")
    tagged = o.withColumn(
        "clerk_note",
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_orderpriority")))
    t = create_table(spark, tagged.filter("o_orderkey % 3 = 0").coalesce(2),
                     path)
    t.write(tagged.filter("o_orderkey % 3 = 1").coalesce(2), mode="append")
    t.write(tagged.filter("o_orderkey % 3 = 2").coalesce(2), mode="append")
    n_all = len(t.to_df().inputFiles())
    nn = t.to_df(where="clerk_note IS NOT NULL")
    isn = t.to_df(where="clerk_note IS NULL")
    assert len(nn.inputFiles()) < n_all, "IS NOT NULL must skip all-null files"
    assert len(isn.inputFiles()) < n_all, "IS NULL must skip no-null files"
    return (nn.select("o_orderkey", "clerk_note")
            .unionByName(isn.select("o_orderkey", "clerk_note"))
            .orderBy("o_orderkey"))


NULL_SKIPPING_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_orderkey % 3 = 0 THEN o_orderpriority END AS clerk_note
FROM orders ORDER BY o_orderkey
"""


def star_partition_restore(spark, sf_dir):
    """Partition-scoped RESTORE (surgical rollback): orders lands
    partitioned by status, both F and O take corrupting appends, and
    only F rewinds to v1 — the result must be pristine F rows plus the
    still-corrupted O partition, proving the rollback touched exactly
    one partition. The inline assert pins that interim versions stay
    time-travelable after the restore commit."""
    o = ld(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "partition_restore")
    t = create_table(spark, o, path, range_partitions=["o_orderstatus"])
    bad = (o.filter(F.col("o_orderkey") % 50 == 0)
            .withColumn("o_orderkey", F.col("o_orderkey") + 9_000_000))
    t.write(bad.filter(F.col("o_orderstatus") == "F"), mode="append")  # v2
    t.write(bad.filter(F.col("o_orderstatus") == "O"), mode="append")  # v3
    t.restore(1, partition="o_orderstatus=F")
    assert t.to_df(version=3).count() > t.to_df().count(), \
        "interim versions must stay time-travelable"
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


PARTITION_RESTORE_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM (
  SELECT * FROM orders
  UNION ALL
  SELECT o_orderkey + 9000000, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 50 = 0 AND o_orderstatus = 'O'
)
ORDER BY o_orderkey
"""


def star_small_file_compaction(spark, sf_dir):
    """Bin-packing small-file maintenance (Delta OPTIMIZE default
    shape): orders lands as one right-sized commit plus six sliver
    appends; compact_small_files must merge ONLY the slivers — the
    inline asserts pin that every big file survives under its original
    path and the sliver count drops — and the table still reads as
    exactly orders plus the appended rows."""
    o = ld(spark, sf_dir, "orders")
    t = create_table(spark, o.coalesce(4), _scratch(sf_dir, "small_files"))
    extra = o.orderBy("o_orderkey").limit(6).select(
        (F.col("o_orderkey") + F.lit(50_000_000)).alias("o_orderkey"),
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority")
    for k in [r.o_orderkey for r in extra.select("o_orderkey").collect()]:
        t.write(extra.filter(F.col("o_orderkey") == k).coalesce(1),
                mode="append")
    threshold = 64 * 1024
    files0 = {f.path for f in t.store.snapshot().all_files()
              if f.size >= threshold}
    n = t.compact_small_files(threshold_bytes=threshold)
    assert n >= 6, f"expected the six slivers to merge, got {n}"
    files1 = {f.path for f in t.store.snapshot().all_files()}
    assert files0 <= files1, "right-sized files must survive untouched"
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


SMALL_FILES_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM (
  SELECT * FROM orders
  UNION ALL
  SELECT o_orderkey + 50000000, o_custkey, o_orderstatus, o_totalprice,
         o_orderdate, o_orderpriority
  FROM (SELECT * FROM orders ORDER BY o_orderkey LIMIT 6)
)
ORDER BY o_orderkey
"""


def star_rename_column(spark, sf_dir):
    """RENAME COLUMN via name-mapping (zero bytes rewritten): customer
    loads under c_mktsegment, the column renames to `segment`, and a
    partial upsert lands PREMIUM rows under the NEW name — so the scan
    must resolve the renamed column per file group (base files carry
    the old physical name, the delta the new one) and merge them per
    key. The inline assert pins that the rename was logical (alias
    marker present ⇒ no rewrite happened)."""
    c = ld(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    t = create_table(spark, c, _scratch(sf_dir, "rename_column"),
                     hash_partitions=["c_custkey"], hash_bucket_num=4,
                     configuration={"compaction.auto": "false"})
    t.rename_column("c_mktsegment", "segment")
    assert "aliases.segment" in t.info.configuration, \
        "rename must be logical (name-mapping), not a rewrite"
    t.upsert(c.filter(F.col("c_custkey") % 10 == 0)
              .select("c_custkey", F.lit("PREMIUM").alias("segment")))
    return t.to_df().orderBy("c_custkey")


RENAME_COLUMN_ORACLE = """
SELECT c_custkey, c_name, c_acctbal,
       CASE WHEN c_custkey % 10 = 0 THEN 'PREMIUM' ELSE c_mktsegment END AS segment
FROM customer ORDER BY c_custkey
"""


def star_sql_insert(spark, sf_dir):
    """ANSI INSERT through the SQL router (WriteIntoTable.scala:44-146
    routing): the table is created empty (schema-only commit — the
    statically-empty fast path, no write job), an INSERT..SELECT lands
    a slice of orders, and a column-list INSERT lands synthetic rows
    whose unlisted columns become typed nulls. Oracle = the same
    UNION in SQL; any routing slip (append-vs-upsert, positional
    binding, null fill) breaks the hash."""
    from starlake_spark.sql import StarSession

    o = ld(spark, sf_dir, "orders")
    t = create_table(spark, o.limit(0), _scratch(sf_dir, "sql_insert"),
                     range_partitions=["o_orderstatus"])
    assert t.store.snapshot().all_files() == [], \
        "empty-source create must be a schema-only commit"
    o.createOrReplaceTempView("sql_insert_src")
    ss = StarSession(spark)
    ss.register("sqlins", t)
    ss.sql("INSERT INTO sqlins SELECT * FROM sql_insert_src "
           "WHERE o_orderkey % 3 = 0")
    ss.sql("INSERT INTO sqlins (o_orderkey, o_orderstatus, o_orderpriority) "
           "SELECT o_orderkey + 90000000, o_orderstatus, o_orderpriority "
           "FROM sql_insert_src WHERE o_orderkey % 1000 = 0")
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


SQL_INSERT_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL
SELECT o_orderkey + 90000000, NULL, o_orderstatus, NULL, NULL, o_orderpriority
FROM orders WHERE o_orderkey % 1000 = 0
ORDER BY o_orderkey
"""


def star_sql_path_ident(spark, sf_dir):
    """Path identifiers across the SQL surface (reference
    DDLUsingPathSuite.scala:89-129 ``star.`/path``` SELECT/DESCRIBE;
    DataFrameWriterV2Suite.scala:418-430 writeTo by path): a table
    created at a bare path — never registered under a name — is
    UPDATEd, DELETEd from, appended to via the writeTo-V2 builder, and
    finally aggregated, all through ``star.`<path>``` identifiers.
    Oracle replays the same mutations in SQL over the original orders;
    any slip in the path→table resolution or in the V2 by-name append
    breaks the hash."""
    from starlake_spark.sql import StarSession
    from starlake_spark.writer_v2 import write_to

    o = ld(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "sql_path_ident")
    create_table(spark, o, path, range_partitions=["o_orderstatus"])
    ss = StarSession(spark)
    ss.sql(f"UPDATE star.`{path}` SET o_totalprice = o_totalprice * 2 "
           "WHERE o_orderkey % 7 = 0")
    ss.sql(f"DELETE FROM star.`{path}` WHERE o_orderkey % 5 = 0")
    extra = o.filter("o_orderkey % 100 = 0") \
        .withColumn("o_orderkey", F.col("o_orderkey") + 90000000)
    write_to(spark, extra.select(*reversed(ORDER_COLS)),
             f"star.`{path}`").append()  # reversed: V2 resolves by name
    return ss.sql(
        f"SELECT o_orderstatus, count(*) AS n, "
        f"round(sum(o_totalprice), 2) AS total "
        f"FROM star.`{path}` GROUP BY o_orderstatus ORDER BY o_orderstatus")


SQL_PATH_IDENT_ORACLE = """
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 5 <> 0
), extra AS (
  SELECT o_orderkey + 90000000, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 100 = 0
), all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM extra)
SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM all_rows GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


ENGINE_QUERIES = {
    "star_rollup_minmax": (star_rollup_minmax, ROLLUP_MINMAX_ORACLE),
    "star_sql_path_ident": (star_sql_path_ident, SQL_PATH_IDENT_ORACLE),
    "star_sql_insert": (star_sql_insert, SQL_INSERT_ORACLE),
    "star_rename_column": (star_rename_column, RENAME_COLUMN_ORACLE),
    "star_small_file_compaction": (star_small_file_compaction, SMALL_FILES_ORACLE),
    "star_partition_restore": (star_partition_restore, PARTITION_RESTORE_ORACLE),
    "star_part_merge": (star_part_merge, PART_MERGE_ORACLE),
    "star_null_skipping": (star_null_skipping, NULL_SKIPPING_ORACLE),
    "star_cdc_log": (star_cdc_log, CDC_LOG_ORACLE),
    "star_cdf_types": (star_cdf_types, CDF_TYPES_ORACLE),
    "star_stream_cdf": (star_stream_cdf, STREAM_CDF_ORACLE),
    "star_stream_preimage_cdf": (star_stream_preimage_cdf,
                                 STREAM_PREIMAGE_CDF_ORACLE),
    "star_convert_in_place": (star_convert_in_place, CONVERT_ORACLE),
    "star_point_lookup": (star_point_lookup, POINT_LOOKUP_ORACLE),
    "star_upsert_mor": (star_upsert_mor, UPSERT_ORACLE),
    "star_ingest_dedup": (star_ingest_dedup, INGEST_DEDUP_ORACLE),
    "star_idempotent_load": (star_idempotent_load, TIME_TRAVEL_ORACLE),
    "star_drop_column": (star_drop_column, DROP_COLUMN_ORACLE),
    "star_restore_clone": (star_restore_clone, TIME_TRAVEL_ORACLE),
    "star_delta_delete": (star_delta_delete, DELTA_DELETE_ORACLE),
    "star_generated_partitions": (star_generated_partitions, GENERATED_PARTS_ORACLE),
    "star_bucketed_join": (star_bucketed_join, BUCKETED_JOIN_ORACLE),
    "star_stream_dedup": (star_stream_dedup, STREAM_DEDUP_ORACLE),
    "star_merge_into": (star_merge_into, MERGE_INTO_ORACLE),
    "star_datasource_read": (star_datasource_read, DATASOURCE_READ_ORACLE),
    "star_datasource_write": (star_datasource_write, DATASOURCE_WRITE_ORACLE),
    "star_datasource_create": (star_datasource_create,
                               DATASOURCE_CREATE_ORACLE),
    "star_compaction_invariance": (star_compaction_invariance, UPSERT_ORACLE),
    "star_time_travel": (star_time_travel, TIME_TRAVEL_ORACLE),
    "star_update_delete": (star_update_delete, UPDATE_DELETE_ORACLE),
    "star_merge_op_sum": (star_merge_op_sum, MERGE_OP_ORACLE),
    "star_replace_where": (star_replace_where, REPLACE_WHERE_ORACLE),
    "star_stats_skipping": (star_stats_skipping, STATS_SKIPPING_ORACLE),
    "star_rollup_incremental": (star_rollup_incremental, ROLLUP_ORACLE),
    "star_dml_rollup": (star_dml_rollup, DML_ROLLUP_ORACLE),
    "star_stream_rollup": (star_stream_rollup, STREAM_ROLLUP_ORACLE),
    "star_clustered_skipping": (star_clustered_skipping, CLUSTERED_SKIPPING_ORACLE),
    "star_cow_upsert": (star_cow_upsert, COW_UPSERT_ORACLE),
    "star_streaming_sink": (star_streaming_sink, STREAMING_ORACLE),
    "star_native_stream_sink": (star_native_stream_sink, STREAMING_ORACLE),
    "star_stream_source": (star_stream_source, STREAM_SOURCE_ORACLE),
    "star_stateful_sessions": (star_stateful_sessions, STATEFUL_SESSIONS_ORACLE),
    "star_streaming_watermark": (star_streaming_watermark, STREAMING_WM_ORACLE),
    "star_mv_rewrite": (star_mv_rewrite, MV_ORACLE),
    "star_schema_evolution": (star_schema_evolution, SCHEMA_EVO_ORACLE),
}


def star_like_or_skipping(spark, sf_dir):
    """LIKE-prefix and OR-equality data skipping end-to-end: orders
    clustered by o_orderpriority so per-file string bounds are tight,
    then (a) a literal-prefix LIKE, (b) a single-column OR-of-
    equalities (normalized to IN), and (c) an OR/AND-precedence
    predicate (the row-loss regression class: must NOT decompose) all
    read oracle-exact, with (a) and (b) asserting file pruning inline."""
    o = ld(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "like_or_skipping")
    t = create_table(spark, o, path,
                     configuration={"write.files.per.partition": "8"})
    t.compaction(sort_columns=["o_orderpriority"], target_files=8)
    n_all = len(t.to_df().inputFiles())
    like = t.to_df(where="o_orderpriority LIKE '1-%'")
    assert 0 < len(like.inputFiles()) < n_all, "LIKE prefix must prune"
    orq = t.to_df(
        where="o_orderpriority = '3-MEDIUM' OR o_orderpriority = '5-LOW'")
    assert 0 < len(orq.inputFiles()) < n_all, "OR-equalities must prune"
    mixed = t.to_df(
        where="o_orderkey = 3 OR o_orderkey = 5 AND o_orderpriority LIKE '9%'")
    return (
        like.select("o_orderkey", "o_orderpriority")
        .unionByName(orq.select("o_orderkey", "o_orderpriority"))
        .unionByName(mixed.select("o_orderkey", "o_orderpriority"))
        .orderBy("o_orderkey", "o_orderpriority"))


LIKE_OR_ORACLE = """
WITH a AS (
  SELECT o_orderkey, o_orderpriority FROM orders
  WHERE o_orderpriority LIKE '1-%'
), b AS (
  SELECT o_orderkey, o_orderpriority FROM orders
  WHERE o_orderpriority IN ('3-MEDIUM', '5-LOW')
), c AS (
  SELECT o_orderkey, o_orderpriority FROM orders
  WHERE o_orderkey = 3 OR o_orderkey = 5 AND o_orderpriority LIKE '9%'
)
SELECT * FROM (
  SELECT * FROM a UNION ALL SELECT * FROM b UNION ALL SELECT * FROM c
) ORDER BY o_orderkey, o_orderpriority
"""

ENGINE_QUERIES["star_like_or_skipping"] = (star_like_or_skipping, LIKE_OR_ORACLE)


def star_bloom_skipping(spark, sf_dir):
    """File-level Bloom index (operators/bloom.py, Delta bloom-index
    analog): a SALTED multi-file layout makes every file's o_custkey
    [min, max] span ~the whole domain, so footer min/max stats keep
    everything — the worst case for point lookups on high-cardinality
    unsorted columns. Per-file bloom bitmaps (built in one extra job
    per commit, probed with the pure-Python murmur3 twin at zero Spark
    jobs) still prune: 8 ABSENT-key probes must skip >half the file
    reads (asserted inline, each returning zero rows), and 15
    PRESENT-key probes return oracle-exact rows — the no-false-negative
    theorem (a pruned file can never hold the probed key) is what the
    hash-twin bit-exactness buys."""
    o = ld(spark, sf_dir, "orders")
    t = create_table(spark, o, _scratch(sf_dir, "bloom_skip"),
                     configuration={"bloom.file.cols": "o_custkey",
                                    "write.files.per.partition": "8"})
    n_all = len(t.to_df().inputFiles())
    assert n_all >= 4, n_all
    kept = 0
    for v in range(1_000_000_000, 1_000_000_008):
        df = t.to_df(where=f"o_custkey = {v}")
        kept += len(df.inputFiles())
        assert df.count() == 0, v
    assert kept <= n_all * 8 * 0.5, (kept, n_all)
    keys = [r[0] for r in (o.select("o_custkey").distinct()
                           .orderBy("o_custkey").limit(15).collect())]
    out = t.to_df(where=f"o_custkey IN ({', '.join(map(str, keys))})")
    return out.select(*ORDER_COLS).orderBy("o_orderkey")


BLOOM_SKIP_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       o_orderpriority
FROM orders
WHERE o_custkey IN (
  SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey LIMIT 15
)
ORDER BY o_orderkey
"""

ENGINE_QUERIES["star_bloom_skipping"] = (star_bloom_skipping, BLOOM_SKIP_ORACLE)


def star_deletion_vectors(spark, sf_dir):
    """Deletion vectors on a non-hash table (Delta DV analog, beyond
    the reference): DELETE records matched (file, row-position) pairs
    in a sidecar — ZERO data files rewritten (asserted inline by path
    identity) — and UPDATE vectors out old positions while appending
    just the changed rows' images (base files asserted untouched).
    Scans anti-join the vectors; metadata-only count() subtracts their
    exact position counts (asserted against the oracle's cardinality
    with zero extra jobs); the CDF surfaces the vectored rows as
    real-valued delete changes (asserted inline). This is the 100 TB
    shape for selective DML on append-mostly fact tables, where CoW
    re-writes whole files to drop single rows."""
    from starlake_spark.sources.datasource import table_changes

    o = ld(spark, sf_dir, "orders")
    t = create_table(spark, o, _scratch(sf_dir, "deletion_vectors"),
                     range_partitions=["o_orderstatus"])
    paths0 = {f.path for f in t.store.snapshot().all_files()}
    t.delete("o_custkey % 10 = 3", use_dv=True)
    assert {f.path for f in t.store.snapshot().all_files()} == paths0, \
        "DV delete must rewrite nothing"
    t.update("o_custkey % 10 = 7",
             {"o_orderpriority": "'DV-UPDATED'"}, use_dv=True)
    assert paths0 <= {f.path for f in t.store.snapshot().all_files()}, \
        "DV update must keep every base file"
    n_dead = o.filter("o_custkey % 10 = 3").count()
    assert t.count() == o.count() - n_dead  # metadata-only, DV-exact
    ch = table_changes(spark, t.store.table_path, start_version=1,
                       with_change_type=True)
    deletes = ch.filter("_change_type = 'delete'")
    assert deletes.count() == n_dead
    assert deletes.filter("o_totalprice IS NULL").count() == 0, \
        "DV delete changes carry real pre-image values"
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


DV_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       CASE WHEN o_custkey % 10 = 7 THEN 'DV-UPDATED'
            ELSE o_orderpriority END AS o_orderpriority
FROM orders
WHERE o_custkey % 10 <> 3
ORDER BY o_orderkey
"""

ENGINE_QUERIES["star_deletion_vectors"] = (star_deletion_vectors, DV_ORACLE)


def star_clone_sync(spark, sf_dir):
    """Incremental clone replication (beyond Delta — its shallow clones
    freeze at clone time): after the source takes an upsert and a
    partition-wide delete, sync_clone() re-points ONLY the changed
    partitions at the source's current file state — O(changed
    partitions) metadata, zero data bytes moved, asserted inline by
    (a) untouched partitions keeping their original manifest entries
    and (b) a repeat sync committing nothing. The clone then reads
    oracle-equal to the source's final state, MoR deltas included
    (imported write_versions preserved, so the clone's collapse orders
    exactly like the source's). The continuous-replication shape: a
    reporting replica follows a hot table by metadata diffs."""
    o = ld(spark, sf_dir, "orders")
    src = create_table(spark, o, _scratch(sf_dir, "clone_sync_src"),
                       range_partitions=["o_orderstatus"],
                       hash_partitions=["o_orderkey"], hash_bucket_num=4)
    c = src.clone(_scratch(sf_dir, "clone_sync_dst"), shallow=True)
    upd = (o.filter("o_orderstatus = 'O' AND o_orderkey <= 200")
           .withColumn("o_orderpriority", F.lit("SYNCED")))
    src.upsert(upd)
    src.delete("o_orderstatus = 'P'")
    untouched = {rv: ps.last_update_version
                 for rv, ps in c.store.snapshot().partitions.items()
                 if rv == "o_orderstatus=F"}
    c.sync_clone()
    after = c.store.snapshot().partitions
    for rv, lv in untouched.items():
        assert after[rv].last_update_version == lv, \
            "sync must not re-import untouched partitions"
    v = c.store.latest_version()
    c.sync_clone()
    assert c.store.latest_version() == v, "repeat sync must be a no-op"
    return c.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


CLONE_SYNC_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
       CASE WHEN o_orderstatus = 'O' AND o_orderkey <= 200
            THEN 'SYNCED' ELSE o_orderpriority END AS o_orderpriority
FROM orders
WHERE o_orderstatus <> 'P'
ORDER BY o_orderkey
"""

ENGINE_QUERIES["star_clone_sync"] = (star_clone_sync, CLONE_SYNC_ORACLE)


def star_cdc_replication(spark, sf_dir):
    """Cross-table CDC replication (operators/replication.py): an
    independent replica — its own write path, its own bucket count —
    follows the source by replaying the NET change window since its
    watermark. One sync absorbs a 3-commit DML storm (price update,
    tombstone delete, new keys) as O(net changed keys): ONE mixed
    tombstone+postimage commit on the replica (upsert_with_tombstones —
    one write job, one manifest version per window), asserted inline,
    and a repeat sync commits nothing. The logical-replication
    complement to star_clone_sync's metadata re-pointing."""
    from starlake_spark.operators.replication import sync_table

    o = ld(spark, sf_dir, "orders")
    src = create_table(spark, o, _scratch(sf_dir, "repl_src"),
                       hash_partitions=["o_orderkey"], hash_bucket_num=4)
    dst_path = _scratch(sf_dir, "repl_dst")
    sync_table(spark, src, dst_path, hash_bucket_num=2)
    src.upsert(o.filter("o_orderkey % 10 = 0")
                .withColumn("o_totalprice", F.col("o_totalprice") * 2))
    src.delete("o_orderkey % 7 = 0", use_delta=True)
    src.upsert(o.filter("o_orderkey % 100 = 0")
                .withColumn("o_orderkey", F.col("o_orderkey") + 1000000))
    t, st = sync_table(spark, src, dst_path)
    assert st["mode"] == "incremental" and st["deleted"] > 0
    assert t.store.latest_version() == 2, \
        "3-commit window must land as ONE net replica commit"
    v = t.store.latest_version()
    _, st2 = sync_table(spark, src, dst_path)
    assert st2["mode"] == "noop" and t.store.latest_version() == v, \
        "repeat sync must commit nothing"
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


CDC_REPLICATION_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM (
  SELECT o_orderkey, o_custkey, o_orderstatus,
    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
    o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 7 <> 0
  UNION ALL
  SELECT o_orderkey + 1000000, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 100 = 0
)
ORDER BY o_orderkey
"""

ENGINE_QUERIES["star_cdc_replication"] = (star_cdc_replication,
                                          CDC_REPLICATION_ORACLE)


def star_stream_replication(spark, sf_dir):
    """CONTINUOUS replication (operators/replication.py sync_stream):
    the replica follows the source's typed CDF stream through
    foreachBatch — each micro-batch collapses to net-per-key before
    applying (a delete→re-insert pair lands as one upsert), deletes
    flow as tombstones, and Spark's checkpoint makes delivery
    exactly-once-per-batch: a second drain from the same checkpoint
    must commit NOTHING (asserted inline). End state is oracle-checked
    against the source's logical history."""
    from starlake_spark.operators.replication import sync_stream
    from starlake_spark.table import StarTable

    c = ld(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment")
    path = _scratch(sf_dir, "stream_repl_src")
    src = create_table(spark, c, path,
                       hash_partitions=["c_custkey"], hash_bucket_num=4,
                       configuration={"compaction.auto": "false"})
    src.upsert(c.filter(F.col("c_custkey") % 10 == 0)
                .withColumn("c_acctbal", F.col("c_acctbal") * 2))      # v2
    src.delete("c_custkey % 20 = 0", use_delta=True)                    # v3
    src.upsert(c.filter(F.col("c_custkey") % 40 == 0)
                .withColumn("c_mktsegment", F.lit("X")))                # v4

    dst_path = _scratch(sf_dir, "stream_repl_dst")
    ckpt = dst_path + "_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)
    q = sync_stream(spark, src, dst_path, ckpt,
                    trigger={"availableNow": True})
    q.awaitTermination(180)
    dst = StarTable.for_path(spark, dst_path)
    v = dst.store.latest_version()
    q2 = sync_stream(spark, src, dst_path, ckpt,
                     trigger={"availableNow": True})
    q2.awaitTermination(180)
    assert dst.store.latest_version() == v, \
        "re-drain from the same checkpoint must commit nothing"
    return dst.to_df().orderBy("c_custkey")


STREAM_REPLICATION_ORACLE = """
SELECT c_custkey, c_name,
  CASE WHEN c_custkey % 40 = 0 THEN c_acctbal
       WHEN c_custkey % 10 = 0 THEN c_acctbal * 2
       ELSE c_acctbal END AS c_acctbal,
  CASE WHEN c_custkey % 40 = 0 THEN 'X' ELSE c_mktsegment END AS c_mktsegment
FROM customer
WHERE c_custkey % 20 <> 0 OR c_custkey % 40 = 0
ORDER BY c_custkey
"""

ENGINE_QUERIES["star_stream_replication"] = (star_stream_replication,
                                             STREAM_REPLICATION_ORACLE)


def star_fsck_repair(spark, sf_dir):
    """FSCK consistency check + repair (Delta FSCK REPAIR TABLE analog):
    a clean table audits clean (deep footer audit runs DISTRIBUTED — a
    mapInPandas job over the file list, the driver never opens a file);
    after a whole range partition's files vanish from storage, fsck
    reports each missing reference, the snapshot is unreadable, and
    REPAIR drops the dead refs in one commit so the table reads again —
    readability over completeness, with the lost partition's rows
    absent (oracle-checked) and the repair invisible to the change
    feed."""
    import os as _os

    o = ld(spark, sf_dir, "orders")
    t = create_table(spark, o, _scratch(sf_dir, "fsck_repair"),
                     range_partitions=["o_orderstatus"])
    assert t.fsck(deep=True) == [], "fresh table must audit clean"
    doomed = t.store.snapshot().partitions["o_orderstatus=F"].files
    for f in doomed:
        p = f.path if _os.path.isabs(f.path) \
            else _os.path.join(t.store.table_path, f.path)
        _os.remove(p)
    issues = t.fsck()
    assert len(issues) == len(doomed) and \
        all(i["kind"] == "missing_file" for i in issues)
    t.fsck(repair=True)
    assert t.fsck() == [], "post-repair audit must be clean"
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


FSCK_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders WHERE o_orderstatus <> 'F'
ORDER BY o_orderkey
"""

ENGINE_QUERIES["star_fsck_repair"] = (star_fsck_repair, FSCK_ORACLE)


def star_metadata_agg(spark, sf_dir):
    """Aggregate pushdown to the MANIFEST: exact min/max/count from the
    write-time footer stats with ZERO Spark jobs (asserted inline via
    the status tracker) — where Spark's parquet aggregate pushdown
    still opens every footer at query time, a million-file star table
    answers from kilobytes of manifest. Guards make it exact-or-error:
    MoR snapshots, deletion vectors, and string columns all refuse."""
    o = ld(spark, sf_dir, "orders")
    t = create_table(spark, o, _scratch(sf_dir, "metadata_agg"),
                     range_partitions=["o_orderstatus"])
    st = spark.sparkContext.statusTracker()
    before = len(st.getJobIdsForGroup(None) or [])
    mp = t.metadata_agg("o_totalprice")
    mk = t.metadata_agg("o_orderkey")
    md = t.metadata_agg("o_orderdate")
    after = len(spark.sparkContext.statusTracker()
                .getJobIdsForGroup(None) or [])
    assert after == before, "metadata_agg must run zero Spark jobs"
    row = [(mp["min"], mp["max"], int(mk["max"]), int(mp["count"]),
            md["min"], md["max"])]
    return (local_df(spark,
                row, "min_price double, max_price double, "
                     "max_orderkey long, n_rows long, "
                     "min_date timestamp, max_date timestamp")
            .select("min_price", "max_price", "max_orderkey", "n_rows",
                    F.date_format("min_date", "yyyy-MM-dd").alias("min_date"),
                    F.date_format("max_date", "yyyy-MM-dd").alias("max_date")))


METADATA_AGG_ORACLE = """
SELECT min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
       max(o_orderkey) AS max_orderkey, count(*) AS n_rows,
       strftime(min(o_orderdate), '%Y-%m-%d') AS min_date,
       strftime(max(o_orderdate), '%Y-%m-%d') AS max_date
FROM orders
"""

ENGINE_QUERIES["star_metadata_agg"] = (star_metadata_agg,
                                       METADATA_AGG_ORACLE)


def star_copy_into(spark, sf_dir):
    """COPY INTO idempotent directory ingest: an initial drain loads the
    landing files, a re-run loads ZERO rows and commits nothing
    (file-level exactly-once via the file-source stream checkpoint —
    asserted inline), late-arriving files load incrementally, and the
    final table equals the full source."""
    import os as _os

    o = ld(spark, sf_dir, "orders")
    landing = _scratch(sf_dir, "copy_landing")
    o.filter("o_orderkey % 2 = 0").coalesce(2).write.parquet(landing)
    t = create_table(spark, o.limit(0), _scratch(sf_dir, "copy_into"))
    n1 = t.copy_into(landing)
    assert n1 == t.count()
    v = t.store.latest_version()
    assert t.copy_into(landing) == 0, "re-run must load nothing"
    assert t.store.latest_version() == v, "re-run must commit nothing"
    o.filter("o_orderkey % 2 = 1").coalesce(1).write.mode("append") \
        .parquet(landing)
    t.copy_into(landing)
    return t.to_df().select(*ORDER_COLS).orderBy("o_orderkey")


COPY_INTO_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
FROM orders ORDER BY o_orderkey
"""

ENGINE_QUERIES["star_copy_into"] = (star_copy_into, COPY_INTO_ORACLE)


def star_nested_schema_evolution(spark, sf_dir):
    """Nested ALTER TABLE evolution end-to-end (reference
    AlterTableTests.scala:95-470): a table whose ``meta`` struct column
    is grown by ``ADD COLUMNS (meta.score double)`` — plus a positioned
    top-level add and a CHANGE COLUMN comment/reorder — then appended
    to with rows that CARRY the new nested field. The scan must merge
    pre-ALTER files (nested field backfilled null — a cast would throw
    on the struct arity) with post-ALTER files, and the metadata-only
    reorder must not disturb values. Oracle replays the union in SQL."""
    from starlake_spark.sql import StarSession

    o = ld(spark, sf_dir, "orders")
    path = _scratch(sf_dir, "nested_alter")
    create_table(
        spark,
        o.withColumn("meta", F.struct(F.col("o_orderstatus").alias("st"))),
        path, configuration={"compaction.auto": "false"})
    ss = StarSession(spark)
    ss.sql(f"ALTER TABLE star.`{path}` ADD COLUMNS "
           f"(meta.score double, grade string AFTER o_orderkey)")
    ss.sql(f"ALTER TABLE star.`{path}` CHANGE COLUMN grade grade string "
           f"COMMENT 'letter grade' FIRST")
    extra = (o.filter("o_orderkey % 50 = 0")
             .withColumn("o_orderkey", F.col("o_orderkey") + 90000000)
             .withColumn("meta", F.struct(
                 F.col("o_orderstatus").alias("st"),
                 (F.col("o_totalprice") / 100).alias("score")))
             .withColumn("grade", F.lit("A")))
    StarTable.for_path(spark, path).write(extra, mode="append")
    return ss.sql(
        f"SELECT grade, meta.st AS st, count(*) AS n, "
        f"round(sum(coalesce(meta.score, -1.0)), 2) AS score_sum "
        f"FROM star.`{path}` GROUP BY grade, meta.st "
        f"ORDER BY grade, st")


NESTED_EVOLUTION_ORACLE = """
WITH base AS (
  SELECT CAST(NULL AS VARCHAR) AS grade, o_orderstatus AS st,
         -1.0 AS score
  FROM orders
), extra AS (
  SELECT 'A' AS grade, o_orderstatus AS st, o_totalprice / 100 AS score
  FROM orders WHERE o_orderkey % 50 = 0
), all_rows AS (SELECT * FROM base UNION ALL SELECT * FROM extra)
SELECT grade, st, count(*) AS n, round(sum(score), 2) AS score_sum
FROM all_rows GROUP BY grade, st ORDER BY grade, st
"""

ENGINE_QUERIES["star_nested_schema_evolution"] = (
    star_nested_schema_evolution, NESTED_EVOLUTION_ORACLE)


# ---------------------------------------------------------------------------
# round 8: incremental MV refresh + PK set-op rewrite, oracle-checked
# ---------------------------------------------------------------------------

def star_mv_incremental(spark, sf_dir):
    """Incremental materialized-view maintenance end-to-end
    (plans/mv.py _incremental_refresh; beyond the reference, whose
    UpdateMaterialViewCommand is always a full re-run): create a
    sum/count/avg GROUP BY view over a hash source, run a DML storm
    (price updates, a delta delete, a group-key migration that makes
    the 'P' group vanish), refresh, and return the view. The refresh is
    asserted INCREMENTAL (txn-registry stamp present) — the oracle
    recomputes the post-storm aggregate from scratch in SQL."""
    from starlake_spark.operators import dml
    from starlake_spark.plans import mv
    from starlake_spark.sql import StarSession

    wh = _scratch(sf_dir, "mv_inc_wh")
    sess = StarSession(spark, warehouse=wh)
    o = ld(spark, sf_dir, "orders")
    d = o.select(F.col("o_orderkey").alias("k"),
                 # NULLABLE group key (round-9: SQL GROUP BY keys may be
                 # NULL; the backing table accepts them via
                 # invariants.allowNullHashKeys) — one stripe is NULL at
                 # creation and the storm retracts/reinserts through it
                 F.when(F.col("o_orderkey") % 11 == 0, F.lit(None))
                 .otherwise(F.col("o_orderstatus"))
                 .cast("string").alias("st"),
                 F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
                 (F.col("o_custkey") % 10).cast("int").alias("prio"))
    src = create_table(spark, d, _scratch(sf_dir, "mv_inc_src"),
                       short_name="mv_inc_src", warehouse=wh,
                       hash_partitions=["k"], hash_bucket_num=4)
    sess.register("mv_inc_src", src)
    mv.create_material_view(
        sess, "mv_inc", _scratch(sf_dir, "mv_inc"),
        "SELECT st, sum(price) AS total, count(*) AS n, "
        "avg(prio) AS mp FROM mv_inc_src GROUP BY st")
    assert mv._load_registry(wh)["mv_inc"]["incremental"] is True

    src.upsert(d.filter(F.col("k") % 5 == 0)
               .withColumn("price",
                           (F.col("price") * 2).cast("decimal(18,2)")))
    dml.delete(spark, src.store, condition="k % 7 = 3", use_delta=True)
    src.upsert(src.to_df().filter(F.col("st") == "P")
               .withColumn("st", F.lit("F")))
    assert mv.update_material_view(sess, "mv_inc") is True
    t = sess.table("mv_inc")
    # the refresh went through the gated incremental path
    assert t.store.snapshot().streaming.get(
        f"txn:mv_refresh:{t.info.table_id}", -1) >= 0, "refresh was not incremental"
    out = mv._strip_mv_hidden(t.to_df())
    assert out.filter(F.col("st").isNull()).count() == 1, \
        "NULL group key missing from the maintained view"
    return (out
            .select(F.coalesce(F.col("st"), F.lit("~null~")).alias("st"),
                    # exact decimal; exported as rounded double so the
                    # compare harness sees one numeric dtype both sides
                    F.round(F.col("total").cast("double"), 2).alias("total"),
                    "n", "mp").orderBy("st"))


MV_INCREMENTAL_ORACLE = """
WITH post AS (
  SELECT o_orderkey AS k,
         CASE WHEN o_orderkey % 11 = 0 THEN NULL
              WHEN o_orderstatus = 'P' THEN 'F'
              ELSE o_orderstatus END AS st,
         CAST(CASE WHEN o_orderkey % 5 = 0
              THEN 2 * CAST(o_totalprice AS DECIMAL(18,2))
              ELSE CAST(o_totalprice AS DECIMAL(18,2)) END
              AS DECIMAL(18,2)) AS price,
         CAST(o_custkey % 10 AS INT) AS prio
  FROM orders WHERE o_orderkey % 7 <> 3
)
SELECT COALESCE(st, '~null~') AS st,
       ROUND(CAST(SUM(price) AS DOUBLE), 2) AS total, COUNT(*) AS n,
       AVG(prio) AS mp
FROM post GROUP BY st ORDER BY st
"""

ENGINE_QUERIES["star_mv_incremental"] = (
    star_mv_incremental, MV_INCREMENTAL_ORACLE)


def star_mv_minmax_mutable(spark, sf_dir):
    """Round-10: min/max materialized views over a MUTABLE (hash)
    source stay INCREMENTAL via the affected-group rescan
    (plans/mv.py _rescan_frame; beyond the reference — its
    UpdateMaterialViewCommand full-re-runs, and rounds ≤9 here refused
    the shape). Storm: (1) an upsert raises every row tied at its
    group's minimum by 500000 — retracting every stored min at once;
    (2) a delete removes every row tied at the post-upsert group
    maximum. One refresh consumes both commits; threatened groups
    recompute from the version-pinned source, everything else folds.
    The oracle replays the same storm in SQL window functions."""
    from starlake_spark.plans import mv
    from starlake_spark.sql import StarSession

    wh = _scratch(sf_dir, "mv_mm_wh")
    sess = StarSession(spark, warehouse=wh)
    o = ld(spark, sf_dir, "orders")
    d = o.select(F.col("o_orderkey").alias("k"),
                 F.col("o_orderstatus").alias("st"),
                 F.col("o_totalprice").cast("decimal(18,2)").alias("price"))
    src = create_table(spark, d, _scratch(sf_dir, "mv_mm_src"),
                       short_name="mv_mm_src", warehouse=wh,
                       hash_partitions=["k"], hash_bucket_num=4)
    sess.register("mv_mm_src", src)
    mv.create_material_view(
        sess, "mv_mm", _scratch(sf_dir, "mv_mm"),
        "SELECT st, min(price) AS lo, max(price) AS hi, "
        "sum(price) AS total, count(*) AS n FROM mv_mm_src GROUP BY st")
    assert mv._load_registry(wh)["mv_mm"]["incremental"] is True

    # storm 1: retract every group minimum (ties included)
    mins = src.to_df().groupBy("st").agg(F.min("price").alias("mn"))
    src.upsert(src.to_df().join(mins, "st")
               .filter(F.col("price") == F.col("mn"))
               .select("k", "st",
                       (F.col("price") + 500000).cast("decimal(18,2)")
                       .alias("price")))
    # storm 2: delete every post-upsert group maximum (ties included)
    maxs = src.to_df().groupBy("st").agg(F.max("price").alias("mx"))
    src.delete_keys(src.to_df().join(maxs, "st")
                    .filter(F.col("price") == F.col("mx")).select("k"))

    assert mv.update_material_view(sess, "mv_mm") is True
    t = sess.table("mv_mm")
    assert t.store.snapshot().streaming.get(
        f"txn:mv_refresh:{t.info.table_id}", -1) >= 0, \
        "refresh was not incremental"
    out = mv._strip_mv_hidden(t.to_df())
    return (out.select("st",
                       F.round(F.col("lo").cast("double"), 2).alias("lo"),
                       F.round(F.col("hi").cast("double"), 2).alias("hi"),
                       F.round(F.col("total").cast("double"), 2)
                       .alias("total"), "n")
            .orderBy("st"))


MV_MINMAX_MUTABLE_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
s1 AS (
  SELECT k, st,
         CAST(CASE WHEN price = MIN(price) OVER (PARTITION BY st)
              THEN price + 500000 ELSE price END AS DECIMAL(18,2)) AS price
  FROM base
),
s2 AS (
  SELECT * FROM s1
  QUALIFY price <> MAX(price) OVER (PARTITION BY st)
)
SELECT st,
       ROUND(CAST(MIN(price) AS DOUBLE), 2) AS lo,
       ROUND(CAST(MAX(price) AS DOUBLE), 2) AS hi,
       ROUND(CAST(SUM(price) AS DOUBLE), 2) AS total,
       COUNT(*) AS n
FROM s2 GROUP BY st ORDER BY st
"""

ENGINE_QUERIES["star_mv_minmax_mutable"] = (
    star_mv_minmax_mutable, MV_MINMAX_MUTABLE_ORACLE)


def star_mv_leftjoin_incremental(spark, sf_dir):
    """Round-10: incremental maintenance of a fact LEFT JOIN dim view
    (plans/mv.py _left_dim_window_frame; beyond the reference, whose
    MV maintenance is a full re-run and rounds ≤9 here kept outer
    joins full-refresh). The dim's join key is its hash PK, so a
    coalesced window's change types drive the null-extension flips
    exactly. Storm: fact upsert + delete, dim segment migration, dim
    inserts that flip null-extended fact rows to matched, dim deletes
    that flip matched rows back. ONE refresh consumes both sources
    through sequential one-sided windows; both steps are asserted
    incremental via their per-source txn stamps. The NULL group (fact
    rows with no dim match) is part of the answer."""
    from starlake_spark.plans import mv
    from starlake_spark.sql import StarSession

    wh = _scratch(sf_dir, "mv_lj_wh")
    sess = StarSession(spark, warehouse=wh)
    o = ld(spark, sf_dir, "orders")
    c = ld(spark, sf_dir, "customer")
    fact0 = o.select(F.col("o_orderkey").alias("k"),
                     F.col("o_custkey").alias("ck"),
                     F.col("o_totalprice").cast("decimal(18,2)")
                     .alias("price"))
    dim0 = (c.filter(F.col("c_custkey") % 3 != 0)
            .select(F.col("c_custkey").alias("ck2"),
                    F.col("c_mktsegment").alias("seg")))
    fact = create_table(spark, fact0, _scratch(sf_dir, "mv_lj_fact"),
                        short_name="mv_lj_fact", warehouse=wh,
                        hash_partitions=["k"], hash_bucket_num=4)
    dim = create_table(spark, dim0, _scratch(sf_dir, "mv_lj_dim"),
                       short_name="mv_lj_dim", warehouse=wh,
                       hash_partitions=["ck2"], hash_bucket_num=4)
    sess.register("mv_lj_fact", fact)
    sess.register("mv_lj_dim", dim)
    mv.create_material_view(
        sess, "mv_lj", _scratch(sf_dir, "mv_lj"),
        "SELECT seg, sum(price) AS total, count(*) AS n, "
        "count(seg) AS nm FROM mv_lj_fact LEFT JOIN mv_lj_dim "
        "ON mv_lj_fact.ck = mv_lj_dim.ck2 GROUP BY seg")
    assert mv._load_registry(wh)["mv_lj"]["incremental"] is True

    # fact storm
    fact.upsert(fact0.filter(F.col("k") % 5 == 0)
                .withColumn("price",
                            (F.col("price") * 2).cast("decimal(18,2)")))
    fact.delete("k % 7 = 3")
    # dim storm — order matters and the oracle mirrors it: (1) migrate
    # existing %13 keys to MOVED, (2) insert the %3-dropped keys with
    # %4=1 as NEWSEG (flip null→matched), (3) delete %11 keys (flip
    # matched→null, including freshly inserted ones)
    dim.upsert(dim.to_df().filter("ck2 % 13 = 1")
               .withColumn("seg", F.lit("MOVED")))
    dim.upsert(c.filter((F.col("c_custkey") % 3 == 0)
                        & (F.col("c_custkey") % 4 == 1))
               .select(F.col("c_custkey").alias("ck2"),
                       F.lit("NEWSEG").alias("seg")))
    dim.delete("ck2 % 11 = 2")

    assert mv.update_material_view(sess, "mv_lj") is True
    t = sess.table("mv_lj")
    snap = t.store.snapshot()
    for src_name in ("mv_lj_fact", "mv_lj_dim"):
        assert snap.streaming.get(
            f"txn:mv_refresh:{t.info.table_id}:{src_name}", -1) >= 0, \
            f"{src_name} window was not incremental"
    out = mv._strip_mv_hidden(t.to_df())
    return (out.select(F.coalesce(F.col("seg"), F.lit("~null~"))
                       .alias("seg"),
                       F.round(F.col("total").cast("double"), 2)
                       .alias("total"), "n", "nm")
            .orderBy("seg"))


MV_LEFTJOIN_ORACLE = """
WITH fact AS (
  SELECT o_orderkey AS k, o_custkey AS ck,
         CAST(CASE WHEN o_orderkey % 5 = 0
              THEN 2 * CAST(o_totalprice AS DECIMAL(18,2))
              ELSE CAST(o_totalprice AS DECIMAL(18,2)) END
              AS DECIMAL(18,2)) AS price
  FROM orders WHERE o_orderkey % 7 <> 3
),
dim AS (
  SELECT ck2, seg FROM (
    SELECT c_custkey AS ck2,
           CASE WHEN c_custkey % 3 = 0 THEN 'NEWSEG'
                WHEN c_custkey % 13 = 1 THEN 'MOVED'
                ELSE c_mktsegment END AS seg
    FROM customer
    WHERE c_custkey % 3 <> 0 OR c_custkey % 4 = 1
  ) WHERE ck2 % 11 <> 2
)
SELECT COALESCE(seg, '~null~') AS seg,
       ROUND(CAST(SUM(price) AS DOUBLE), 2) AS total,
       COUNT(*) AS n, COUNT(seg) AS nm
FROM fact LEFT JOIN dim ON fact.ck = dim.ck2
GROUP BY COALESCE(seg, '~null~') ORDER BY seg
"""

ENGINE_QUERIES["star_mv_leftjoin_incremental"] = (
    star_mv_leftjoin_incremental, MV_LEFTJOIN_ORACLE)


def star_mv_distinct_incremental(spark, sf_dir):
    """Round-10: incremental count(DISTINCT) materialized views
    (plans/mv.py _sync_distinct_aux — beyond the reference, whose MV
    maintenance always full-re-runs, and beyond rounds ≤9 here, which
    refused DISTINCT aggregates). Per-(group, value) multiplicities
    live in an auxiliary star table advanced through the same signed
    change windows under its own exactly-once stamp; the distinct
    column recounts the touched groups' aux slices. Storm: a value
    migration (clerk-bucket rewrite on k%3 rows), a pair-killing
    delete, and new keys — one refresh, asserted incremental; the
    mixed sum/count columns fold as usual. DuckDB replays the storm."""
    from starlake_spark.plans import mv
    from starlake_spark.sql import StarSession

    wh = _scratch(sf_dir, "mv_cd_wh")
    sess = StarSession(spark, warehouse=wh)
    o = ld(spark, sf_dir, "orders")
    d = o.select(F.col("o_orderkey").alias("k"),
                 F.col("o_orderstatus").alias("st"),
                 (F.col("o_custkey") % 100).cast("int").alias("prio"),
                 F.col("o_totalprice").cast("decimal(18,2)").alias("price"))
    src = create_table(spark, d.filter(F.col("k") % 2 == 0),
                       _scratch(sf_dir, "mv_cd_src"),
                       short_name="mv_cd_src", warehouse=wh,
                       hash_partitions=["k"], hash_bucket_num=4)
    sess.register("mv_cd_src", src)
    mv.create_material_view(
        sess, "mv_cd", _scratch(sf_dir, "mv_cd"),
        "SELECT st, count(DISTINCT prio) AS np, "
        "sum(DISTINCT prio) AS sp, sum(price) AS total, "
        "count(*) AS n FROM mv_cd_src GROUP BY st")
    assert mv._load_registry(wh)["mv_cd"]["incremental"] is True

    # storm: migrate k%3 rows' prio into a disjoint bucket range,
    # delete the high-prio tail, add the odd keys
    src.upsert(src.to_df().filter("k % 3 = 0")
               .withColumn("prio", (F.col("prio") + 100).cast("int")))
    src.delete("prio >= 180")
    src.upsert(d.filter(F.col("k") % 2 == 1))
    assert mv.update_material_view(sess, "mv_cd") is True
    t = sess.table("mv_cd")
    assert t.store.snapshot().streaming.get(
        f"txn:mv_refresh:{t.info.table_id}", -1) >= 0, \
        "refresh was not incremental"
    out = mv._strip_mv_hidden(t.to_df())
    return (out.select("st", "np", "sp",
                       F.round(F.col("total").cast("double"), 2)
                       .alias("total"), "n")
            .orderBy("st"))


MV_DISTINCT_ORACLE = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderstatus AS st,
         CAST(o_custkey % 100 AS INT) AS prio,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders
),
post AS (
  SELECT k, st,
         CASE WHEN k % 2 = 0 AND k % 3 = 0 THEN prio + 100
              ELSE prio END AS prio,
         price
  FROM base
)
SELECT st, COUNT(DISTINCT prio) AS np,
       CAST(SUM(DISTINCT prio) AS BIGINT) AS sp,
       ROUND(CAST(SUM(price) AS DOUBLE), 2) AS total, COUNT(*) AS n
FROM post WHERE prio < 180
GROUP BY st ORDER BY st
"""

ENGINE_QUERIES["star_mv_distinct_incremental"] = (
    star_mv_distinct_incremental, MV_DISTINCT_ORACLE)


def star_setop_pk(spark, sf_dir):
    """PK set-op rewrite (reference StarLakePostHocAnalysis.scala:29-96):
    INTERSECT/EXCEPT over the hash columns of two same-bucketed tables
    compile to plain-equality semi/anti joins over the bucketed
    materializations — zero shuffle exchanges (asserted inline; the
    merge regime is plan-pinned in test_plan_hygiene)."""
    c = ld(spark, sf_dir, "customer")
    ta = create_table(spark, c.select("c_custkey", "c_acctbal"),
                      _scratch(sf_dir, "sop_a"),
                      hash_partitions=["c_custkey"], hash_bucket_num=4)
    tb = create_table(spark, c.select(
        (F.col("c_custkey") + 3).alias("c_custkey"), F.col("c_acctbal")),
        _scratch(sf_dir, "sop_b"),
        hash_partitions=["c_custkey"], hash_bucket_num=4)
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    ta.to_bucketed_table(f"sop_a_{tag}")
    tb.to_bucketed_table(f"sop_b_{tag}")
    inter = ta.intersect_keys(tb)
    exc = ta.except_keys(tb)
    for df, jt in ((inter, "LeftSemi"), (exc, "LeftAnti")):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert jt in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
    return (inter.select(F.lit("intersect").alias("op"),
                         F.col("c_custkey").alias("k"))
            .unionByName(exc.select(F.lit("except").alias("op"),
                                    F.col("c_custkey").alias("k")))
            .orderBy("op", "k"))


SETOP_PK_ORACLE = """
SELECT 'except' AS op, c_custkey AS k FROM customer
WHERE c_custkey NOT IN (SELECT c_custkey + 3 FROM customer)
UNION ALL
SELECT 'intersect', c_custkey FROM customer
WHERE c_custkey IN (SELECT c_custkey + 3 FROM customer)
ORDER BY op, k
"""

ENGINE_QUERIES["star_setop_pk"] = (star_setop_pk, SETOP_PK_ORACLE)


# ---------------------------------------------------------------------------
# round 9: two-table inner-join incremental MV (delta-join maintenance)
# ---------------------------------------------------------------------------

def star_mv_incremental_join(spark, sf_dir):
    """Delta-join MV maintenance (plans/mv.py _incremental_refresh_join;
    beyond the reference — its refresh is always a full re-run): a
    fact⋈dim GROUP BY view maintained through TWO one-sided windows —
    a fact-side DML storm (Δfact ⋈ dim: price doubling + delta delete)
    and then a dim-side append (fact ⋈ Δdim: the missing third of the
    dimension arrives late under a new segment). Both refreshes are
    asserted INCREMENTAL (delta commits, per-source txn stamps); the
    oracle recomputes the final state from scratch in SQL."""
    from starlake_spark.operators import dml
    from starlake_spark.plans import mv
    from starlake_spark.sql import StarSession

    wh = _scratch(sf_dir, "mv_j_wh")
    sess = StarSession(spark, warehouse=wh)
    o = ld(spark, sf_dir, "orders")
    c = ld(spark, sf_dir, "customer")
    fact = o.select(F.col("o_orderkey").alias("k"),
                    F.col("o_custkey").alias("ck"),
                    F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
                    (F.col("o_custkey") % 10).cast("int").alias("prio"))
    dim0 = (c.filter(F.col("c_custkey") % 3 != 0)
            .select(F.col("c_custkey").alias("ck2"),
                    F.col("c_mktsegment").alias("seg")))
    ft = create_table(spark, fact, _scratch(sf_dir, "mv_j_fact"),
                      short_name="mv_j_fact", warehouse=wh,
                      hash_partitions=["k"], hash_bucket_num=4)
    dt = create_table(spark, dim0, _scratch(sf_dir, "mv_j_dim"),
                      short_name="mv_j_dim", warehouse=wh)
    sess.register("mv_j_fact", ft)
    sess.register("mv_j_dim", dt)
    mv.create_material_view(
        sess, "mv_j", _scratch(sf_dir, "mv_j"),
        "SELECT seg, sum(price) AS total, count(*) AS n, avg(prio) AS mp "
        "FROM mv_j_fact JOIN mv_j_dim ON mv_j_fact.ck = mv_j_dim.ck2 "
        "GROUP BY seg")
    assert mv._load_registry(wh)["mv_j"]["incremental"] is True

    # window 1: fact-side storm
    ft.upsert(fact.filter(F.col("k") % 5 == 0)
              .withColumn("price",
                          (F.col("price") * 2).cast("decimal(18,2)")))
    dml.delete(spark, ft.store, condition="k % 7 = 3", use_delta=True)
    assert mv.update_material_view(sess, "mv_j") is True
    t = sess.table("mv_j")
    assert t.store.snapshot().commit_type == "delta", \
        "fact window was not incremental"
    # window 2: dim-side late arrival
    dt.write(c.filter(F.col("c_custkey") % 3 == 0)
             .select(F.col("c_custkey").alias("ck2"),
                     F.lit("LATE").alias("seg")), mode="append")
    assert mv.update_material_view(sess, "mv_j") is True
    assert t.store.snapshot(t.store.latest_version()).commit_type \
        == "delta", "dim window was not incremental"
    # both per-source txn stamps present (exactly-once bookkeeping)
    stamps = t.store.snapshot().streaming
    assert any(k.startswith(f"txn:mv_refresh:{t.info.table_id}:")
               for k in stamps), "per-source refresh stamp missing"
    return (mv._strip_mv_hidden(t.to_df())
            .select("seg",
                    F.round(F.col("total").cast("double"), 2).alias("total"),
                    "n", "mp").orderBy("seg"))


MV_INCREMENTAL_JOIN_ORACLE = """
WITH fact AS (
  SELECT o_custkey AS ck,
         CAST(CASE WHEN o_orderkey % 5 = 0
              THEN 2 * CAST(o_totalprice AS DECIMAL(18,2))
              ELSE CAST(o_totalprice AS DECIMAL(18,2)) END
              AS DECIMAL(18,2)) AS price,
         CAST(o_custkey % 10 AS INT) AS prio
  FROM orders WHERE o_orderkey % 7 <> 3
), dim AS (
  SELECT c_custkey AS ck2,
         CASE WHEN c_custkey % 3 = 0 THEN 'LATE' ELSE c_mktsegment END AS seg
  FROM customer
)
SELECT seg, ROUND(CAST(SUM(price) AS DOUBLE), 2) AS total,
       COUNT(*) AS n, AVG(prio) AS mp
FROM fact JOIN dim ON fact.ck = dim.ck2
GROUP BY seg ORDER BY seg
"""

ENGINE_QUERIES["star_mv_incremental_join"] = (
    star_mv_incremental_join, MV_INCREMENTAL_JOIN_ORACLE)


def star_skew_hotkey_collapse(spark, sf_dir):
    """The skew-soak shape as an oracle entry (tests/test_skew_soak.py
    pins the plan; this pins the ANSWER, including at sf1): a wide cold
    keyspace from lineitem, ONE hot key churned across 12 delta
    commits, and one in-batch duplicate storm where a whole batch
    collapses to a single key. The MoR groupBy collapse runs as a
    two-level aggregate, so the hot key leaves every map task as one
    combined row — reducer skew is bounded by map parallelism, and the
    final answer is exact last-wins."""
    li = ld(spark, sf_dir, "lineitem")
    # one row per key, deterministically (the synthetic lineitem holds
    # duplicate (orderkey, linenumber) pairs, and upsert's in-batch
    # last-wins between non-identical duplicates is write-order)
    seed = (li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long").alias("k"),
        F.col("l_quantity").cast("long").alias("v"),
        F.col("l_returnflag").alias("s"))
        .groupBy("k").agg(F.max("v").alias("v"), F.max("s").alias("s")))
    t = create_table(spark, seed, _scratch(sf_dir, "skew_hot"),
                     hash_partitions=["k"], hash_bucket_num=8,
                     configuration={"compaction.auto": "false"})
    # hot key: 12 delta commits churning k=-1 — its collapse group
    # holds 12 versions while every cold key holds 1
    for i in range(12):
        t.upsert(local_df(spark, [(-1, i, "H")],
                                       "k long, v long, s string"))
    # in-batch duplicate storm: the whole batch shares k=-2 with
    # identical payloads (deterministic winner)
    dup = seed.select(F.lit(-2).cast("long").alias("k"),
                      F.lit(7).cast("long").alias("v"),
                      F.lit("D").alias("s"))
    t.upsert(dup)
    return (t.to_df().groupBy("s")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
            .orderBy("s"))


SKEW_HOTKEY_ORACLE = """
WITH seed AS (
  SELECT CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS k,
         MAX(CAST(l_quantity AS BIGINT)) AS v, MAX(l_returnflag) AS s
  FROM lineitem
  GROUP BY 1
), final AS (
  SELECT * FROM seed
  UNION ALL SELECT CAST(-1 AS BIGINT), CAST(11 AS BIGINT), 'H'
  UNION ALL SELECT CAST(-2 AS BIGINT), CAST(7 AS BIGINT), 'D'
)
SELECT s, COUNT(*) AS n, SUM(v) AS sv FROM final GROUP BY s ORDER BY s
"""

ENGINE_QUERIES["star_skew_hotkey_collapse"] = (
    star_skew_hotkey_collapse, SKEW_HOTKEY_ORACLE)


def star_mv_join_rewrite(spark, sf_dir):
    """Rewrite ∩ maintenance integration (round 10): a fact⋈dim GROUP
    BY view is maintained INCREMENTALLY through a both-changed window
    (fact upsert + dim late arrival in the SAME window → two sequential
    one-sided delta steps, plans/mv.py _incremental_refresh_join), and
    the query is then answered THROUGH the rewriter (try_rewrite, with
    a compensation HAVING) — so the entry hash-checks the whole chain:
    delta-join maintenance → staleness gate → rewrite → answer. The
    staleness gate is asserted both ways: the stale view must NOT serve
    before the refresh, and the rewrite must HIT after it."""
    from starlake_spark.operators import dml
    from starlake_spark.plans import mv
    from starlake_spark.sql import StarSession

    wh = _scratch(sf_dir, "mv_jr_wh")
    sess = StarSession(spark, warehouse=wh)
    o = ld(spark, sf_dir, "orders")
    c = ld(spark, sf_dir, "customer")
    fact = o.select(F.col("o_orderkey").alias("k"),
                    F.col("o_custkey").alias("ck"),
                    F.col("o_totalprice").cast("decimal(18,2)").alias("price"))
    dim0 = (c.filter(F.col("c_custkey") % 3 != 0)
            .select(F.col("c_custkey").alias("ck2"),
                    F.col("c_mktsegment").alias("seg")))
    ft = create_table(spark, fact, _scratch(sf_dir, "mv_jr_fact"),
                      short_name="mv_jr_fact", warehouse=wh,
                      hash_partitions=["k"], hash_bucket_num=4)
    dt = create_table(spark, dim0, _scratch(sf_dir, "mv_jr_dim"),
                      short_name="mv_jr_dim", warehouse=wh)
    sess.register("mv_jr_fact", ft)
    sess.register("mv_jr_dim", dt)
    view_sql = (
        "SELECT seg, sum(price) AS total, count(*) AS n "
        "FROM mv_jr_fact JOIN mv_jr_dim ON mv_jr_fact.ck = mv_jr_dim.ck2 "
        "GROUP BY seg")
    query_sql = view_sql + " HAVING seg <> 'NOPE'"
    mv.create_material_view(sess, "mv_jr", _scratch(sf_dir, "mv_jr"),
                            view_sql)
    assert mv._load_registry(wh)["mv_jr"]["incremental"] is True

    # ONE window touching BOTH sides: fact storm + dim late arrival
    ft.upsert(fact.filter(F.col("k") % 5 == 0)
              .withColumn("price",
                          (F.col("price") * 2).cast("decimal(18,2)")))
    dml.delete(spark, ft.store, condition="k % 7 = 3", use_delta=True)
    dt.write(c.filter(F.col("c_custkey") % 3 == 0)
             .select(F.col("c_custkey").alias("ck2"),
                     F.lit("LATE").alias("seg")), mode="append")

    # STALENESS GATE: the stale view must not serve (auto_update=False)
    assert mv.try_rewrite(sess, query_sql) is None, \
        "stale join MV served through the rewriter"

    t = sess.table("mv_jr")
    overwrites0 = sum(1 for v in t.store.list_versions()
                      if t.store.snapshot(v).commit_type == "write")
    assert mv.update_material_view(sess, "mv_jr") is True
    overwrites1 = sum(1 for v in t.store.list_versions()
                      if t.store.snapshot(v).commit_type == "write")
    assert overwrites1 == overwrites0, \
        "both-changed window fell back to a full overwrite"

    hit = mv.try_rewrite(sess, query_sql)
    assert hit is not None, "refreshed join MV did not serve the rewrite"
    return (hit.select("seg",
                       F.round(F.col("total").cast("double"), 2)
                       .alias("total"), "n")
            .orderBy("seg"))


MV_JOIN_REWRITE_ORACLE = """
WITH fact AS (
  SELECT o_custkey AS ck,
         CAST(CASE WHEN o_orderkey % 5 = 0
              THEN 2 * CAST(o_totalprice AS DECIMAL(18,2))
              ELSE CAST(o_totalprice AS DECIMAL(18,2)) END
              AS DECIMAL(18,2)) AS price
  FROM orders WHERE o_orderkey % 7 <> 3
), dim AS (
  SELECT c_custkey AS ck2,
         CASE WHEN c_custkey % 3 = 0 THEN 'LATE' ELSE c_mktsegment END AS seg
  FROM customer
)
SELECT seg, ROUND(CAST(SUM(price) AS DOUBLE), 2) AS total,
       COUNT(*) AS n
FROM fact JOIN dim ON fact.ck = dim.ck2
GROUP BY seg HAVING seg <> 'NOPE' ORDER BY seg
"""

ENGINE_QUERIES["star_mv_join_rewrite"] = (
    star_mv_join_rewrite, MV_JOIN_REWRITE_ORACLE)


def star_rollup_realtime(spark, sf_dir):
    """REAL-TIME continuous-aggregate read (plans/rollup.py
    read_rollup_realtime; round 10, beyond the reference): the source
    takes an un-refreshed window — inserts, an UPDATE wave, a tombstone
    DELETE — and the READ serves the up-to-the-commit answer by
    combining the materialized partials with the live window's signed
    partials on the fly, committing NOTHING. The inline asserts pin
    that no refresh ran (rollup version unchanged) and that the tail
    path (not a full recompute) produced the plan; the answer is
    oracle-checked against a flat GROUP BY of the source's final
    state."""
    from starlake_spark.plans import rollup as R

    e = ld(spark, sf_dir, "events")
    src_path = _scratch(sf_dir, "rt_rollup_src")
    src = create_table(spark, e.filter(F.col("event_id") % 10 != 0),
                       src_path, hash_partitions=["event_id"],
                       hash_bucket_num=8)
    t = R.create_rollup(spark, src_path, _scratch(sf_dir, "rt_rollup_agg"),
                        time_col="ts", group_cols=["event_type"],
                        aggs={"value": "sum"}, hash_bucket_num=8)
    # a refreshed prefix...
    src.upsert(e.filter(F.col("event_id") % 10 == 0))
    assert R.refresh_rollup(spark, t)["mode"] == "incremental"
    v_after_refresh = t.store.latest_version()
    # ...then an UN-refreshed window the read must absorb live
    src.upsert(e.filter(F.col("event_id") % 7 == 0)
               .withColumn("value", F.col("value") * 3))
    src.delete("event_id % 13 = 0", use_delta=True)
    out = (R.read_rollup_realtime(spark, t)
           .filter(F.col("n_rows") > 0)
           .select("bucket_ts", "event_type",
                   F.col("value_sum").cast("double").alias("value_sum"),
                   F.col("n_rows").cast("long").alias("n_rows"))
           .orderBy("bucket_ts", "event_type"))
    assert t.store.latest_version() == v_after_refresh, \
        "realtime read must not write"
    return out


# same final state as star_dml_rollup — the read path differs, the
# answer must not
REALTIME_ROLLUP_ORACLE = DML_ROLLUP_ORACLE

ENGINE_QUERIES["star_rollup_realtime"] = (
    star_rollup_realtime, REALTIME_ROLLUP_ORACLE)


def star_rollup_rewrite(spark, sf_dir):
    """Rollup-serving query rewrite (plans/rollup.py
    try_rollup_rewrite; round 10): an hourly sum/count rollup over a
    DECIMAL measure is registered, the source takes an UN-refreshed
    window (upsert + delta delete), and a DAY-level GROUP BY query is
    answered THROUGH the rewriter — real-time partials, coarser-bucket
    regrouping, zero writes. The inline asserts pin that the rewriter
    (not the raw plan) served the answer and that nothing was
    refreshed; the oracle recomputes the day aggregate from the
    source's final state."""
    from starlake_spark.plans import mv, rollup as R
    from starlake_spark.sql import StarSession

    wh = _scratch(sf_dir, "rr_wh")
    sess = StarSession(spark, warehouse=wh)
    e = ld(spark, sf_dir, "events")
    src_df = e.withColumn("value", F.col("value").cast("decimal(18,4)"))
    src_path = _scratch(sf_dir, "rr_src")
    src = create_table(spark, src_df.filter(F.col("event_id") % 9 != 0),
                       src_path, hash_partitions=["event_id"],
                       hash_bucket_num=8, short_name="rr_events",
                       warehouse=wh)
    sess.register("rr_events", src)
    ru = R.create_rollup(spark, src_path, _scratch(sf_dir, "rr_agg"),
                         time_col="ts", group_cols=["event_type"],
                         aggs={"value": "sum"}, hash_bucket_num=8)
    R.register_rollup(sess, "rr_hourly", ru)
    # un-refreshed window
    src.upsert(src_df.filter(F.col("event_id") % 9 == 0))
    src.upsert(src_df.filter(F.col("event_id") % 5 == 0)
               .withColumn("value", (F.col("value") * 2)
                           .cast("decimal(18,4)")))
    src.delete("event_id % 11 = 0", use_delta=True)
    v_ru = ru.store.latest_version()
    q = ("SELECT date_trunc('day', ts) AS bucket_day, "
         "CAST(sum(value) AS DOUBLE) AS value_sum, "
         "count(*) AS n_rows FROM rr_events GROUP BY 1")
    sess._sync_views()
    hit = mv.try_rewrite(sess, q)
    assert hit is not None, "rollup rewrite did not serve the query"
    assert ru.store.latest_version() == v_ru, "the serve wrote a refresh"
    return hit.orderBy("bucket_day")


ROLLUP_REWRITE_ORACLE = """
WITH final AS (
  SELECT ts,
         CAST(CASE WHEN event_id % 5 = 0
              THEN 2 * CAST(value AS DECIMAL(18,4))
              ELSE CAST(value AS DECIMAL(18,4)) END
              AS DECIMAL(18,4)) AS value
  FROM events
  WHERE event_id % 11 != 0
)
SELECT date_trunc('day', ts) AS bucket_day,
       CAST(SUM(value) AS DOUBLE) AS value_sum,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM final GROUP BY 1 ORDER BY 1
"""

ENGINE_QUERIES["star_rollup_rewrite"] = (
    star_rollup_rewrite, ROLLUP_REWRITE_ORACLE)
