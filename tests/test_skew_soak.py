"""Round-8 verdict task #2: skewed-key MoR soak.

The groupBy collapse (operators/reader.py _merge_scan) is the engine's
heart, and key skew is its classic 100×-scale failure mode. Two shapes:

1. HOT KEY ACROSS MANY DELTA COMMITS — one key is churned in every one
   of many delta commits while a wide cold keyspace sits at one
   version. The hot key's collapse group holds (commit count) rows;
   the cold keys' groups hold 1.
2. IN-BATCH DUPLICATE SKEW — one upsert batch where ~all rows share a
   single key (the ingest-dedup shape). The in-batch collapse's
   groupBy gets one group holding ~the whole batch.

Mitigation at scale (documented here because AQE's skew handling does
NOT apply: skewJoin splits skewed JOIN partitions, not aggregations):
Spark executes the collapse as a TWO-LEVEL aggregate — a partial
(map-side) aggregate runs before the exchange, so the hot key leaves
each map task as ONE combined row and the reducer receives at most
(#map partitions) rows per key, never the raw row count. That bounds
reducer skew by the map parallelism regardless of how hot a key is.
Both tests pin the partial aggregate in the physical plan AND assert
wall-clock stays near the uniform-key baseline.

The merge-operator path (collect_list of versions) is exercised too:
its partial aggregation buffers per-key version lists, which stay
bounded by the number of delta commits per partition — compaction is
the documented pressure valve (CompactionSuite), not AQE.
"""

import time

from pyspark.sql import functions as F

from starlake_spark import create_table
from starlake_spark.merge_ops import SumMergeOp

SEED_ROWS = 120_000
HOT_COMMITS = 25
DUP_BATCH = 300_000


def _seed_df(spark, sf_dir, rows=SEED_ROWS):
    """Wide cold keyspace derived from the driver's lineitem parquet
    (never synthesized when testdata can supply it)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        .cast("long").alias("k"),
        (F.col("l_partkey") % 4).cast("int").alias("p"),
        F.col("l_quantity").cast("long").alias("v"),
        F.col("l_returnflag").alias("s"))
        .limit(rows))


def _two_level_aggregate(df) -> bool:
    """The collapse must run as partial+final aggregate (map-side
    combine): at least two aggregate nodes with an exchange between."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_agg = (plan.count("HashAggregate") + plan.count("SortAggregate")
             + plan.count("ObjectHashAggregate"))
    return n_agg >= 2 and "partial_" in plan and "Exchange" in plan


def test_hot_key_delta_commit_soak(spark, sf_dir, tmp_path):
    # compaction.auto off: the soak must exercise the RAW 26-arm union
    # collapse with the hot key at 25 versions (auto-compaction is the
    # normal pressure valve and would flatten it back to a plain scan;
    # read-time SumMergeOp folding across compaction is pinned by
    # star_compaction_invariance, not here)
    t = create_table(spark, _seed_df(spark, sf_dir),
                     str(tmp_path / "hot"), range_partitions=["p"],
                     hash_partitions=["k"], hash_bucket_num=4,
                     configuration={"compaction.auto": "false"})
    hot = 424242424242
    # every commit churns the SAME key (plus a few cold ones so commits
    # aren't degenerate single-row writes)
    for i in range(HOT_COMMITS):
        batch = spark.createDataFrame(
            [(hot, 1, 1, f"hot{i}")]
            + [(1000 + i * 7 + j, (i + j) % 4, 1, "cold") for j in range(5)],
            "k long, p int, v long, s string")
        t.upsert(batch)

    t0 = time.time()
    out = t.to_df(merge_operators={"v": SumMergeOp()})
    assert _two_level_aggregate(out)
    got = {r.k: (r.v, r.s) for r in
           out.filter(F.col("k") == hot).collect()}
    elapsed = time.time() - t0
    # SumMergeOp folds every version; default op takes the last
    assert got[hot] == (HOT_COMMITS, f"hot{HOT_COMMITS - 1}")
    # cold key at one version each: sum == its own v
    cold = out.filter(F.col("k") == 1000).collect()
    assert len(cold) == 1 and cold[0].v == 1
    # generous wall bound: the collapse of 25 versions of one key must
    # not serialize the read (pre-partial-agg it would funnel the whole
    # union through one reducer group)
    assert elapsed < 60, f"hot-key collapse took {elapsed:.1f}s"


def test_in_batch_duplicate_skew_soak(spark, sf_dir, tmp_path):
    seed = _seed_df(spark, sf_dir, rows=50_000)
    # PK-table row count = DISTINCT merge keys (range + hash cols: the
    # same k under two p values is two live rows; duplicate (k, p)
    # pairs collapse in-write)
    n_seed = seed.select("k", "p").distinct().count()
    t = create_table(spark, seed,
                     str(tmp_path / "dup"), range_partitions=["p"],
                     hash_partitions=["k"], hash_bucket_num=4)
    hot = 888888888888
    # one batch, ~all rows the same key: monotonically tagged so the
    # in-batch collapse has a deterministic winner (last tag wins on
    # the delta path's in-batch ordering is NOT guaranteed — assert
    # membership of the collapsed value instead)
    batch = (spark.range(DUP_BATCH)
             .select(F.lit(hot).cast("long").alias("k"),
                     F.lit(1).cast("int").alias("p"),
                     F.col("id").cast("long").alias("v"),
                     F.lit("dup").alias("s")))
    t0 = time.time()
    t.upsert(batch)
    out = t.to_df()
    assert _two_level_aggregate(out)
    rows = out.filter(F.col("k") == hot).collect()
    elapsed = time.time() - t0
    # exactly one survivor, with a value from the batch
    assert len(rows) == 1
    assert 0 <= rows[0].v < DUP_BATCH and rows[0].s == "dup"
    # total = seed + 1 collapsed hot key
    assert out.count() == n_seed + 1
    assert elapsed < 120, f"in-batch dup collapse took {elapsed:.1f}s"


def test_skewed_read_tracks_uniform_baseline(spark, sf_dir, tmp_path):
    """Same total row volume, skewed vs uniform key distribution: the
    skewed table's MoR read must stay within a small factor of the
    uniform read (the partial aggregate flattens the hot key before
    the exchange, so reducer work is balanced either way)."""
    seed = _seed_df(spark, sf_dir, rows=60_000)
    t_uni = create_table(spark, seed, str(tmp_path / "uni"),
                         hash_partitions=["k"], hash_bucket_num=4)
    t_skew = create_table(spark, seed, str(tmp_path / "skew"),
                          hash_partitions=["k"], hash_bucket_num=4)
    # identical delta volume; skewed churns ONE key, uniform spreads it
    upd_skew = (spark.range(80_000)
                .select(F.lit(77).cast("long").alias("k"),
                        F.lit(0).alias("p"),
                        F.col("id").cast("long").alias("v"),
                        F.lit("x").alias("s")))
    upd_uni = (spark.range(80_000)
               .select((F.col("id") * 10).cast("long").alias("k"),
                       F.lit(0).alias("p"),
                       F.col("id").cast("long").alias("v"),
                       F.lit("x").alias("s")))
    t_skew.upsert(upd_skew)
    t_uni.upsert(upd_uni)

    def timed_count(t):
        s = time.time()
        n = t.to_df().count()
        return n, time.time() - s

    n_uni, sec_uni = timed_count(t_uni)
    n_skew, sec_skew = timed_count(t_skew)
    assert n_skew <= n_uni  # skew collapsed 80k rows into one key
    # 5× headroom absorbs host noise while still catching a
    # single-reducer funnel (which would be ~#partitions× slower)
    assert sec_skew < max(5.0, 5 * sec_uni), (
        f"skewed read {sec_skew:.1f}s vs uniform {sec_uni:.1f}s")
