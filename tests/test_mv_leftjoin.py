"""Round-10: incremental maintenance of LEFT-join materialized views
(plans/mv.py _left_dim_window_frame + the left branch of _join_frames).

fact LEFT JOIN dim — the dominant production MV shape — is maintainable
when the dim's join columns are exactly its hash PK: uniqueness lets a
coalesced change window's types stand in for match-count flips. Claims:

1. EQUALITY — fact-side windows, dim-side windows (inserts flipping
   null-extended rows to matched, deletes flipping back, in-place seg
   migrations), and both-changed sequential windows are all bit-equal
   to a full re-run, NULL group included.
2. INCREMENTAL — each refresh commits a delta with per-source txn
   stamps (never the full-path overwrite).
3. ELIGIBILITY — non-PK dim join columns, multi-join plans, and
   non-equality ON conditions stay full, flagged incremental=False.
4. REPLAY — a lost registry save after a dim window replays as a noop.
"""

import pytest
from pyspark.sql import functions as F

from starlake_spark.plans import mv


@pytest.fixture()
def sess(spark, tmp_path):
    from starlake_spark.sql import StarSession

    return StarSession(spark, warehouse=str(tmp_path / "wh"))


VIEW_SQL = ("SELECT seg, sum(price) AS total, count(*) AS n, "
            "count(seg) AS nm FROM fact LEFT JOIN dim "
            "ON fact.ck = dim.ck2 GROUP BY seg")


def _build(sess, spark, sf_dir, tmp_path):
    from starlake_spark import create_table

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    fact0 = (o.filter(F.col("o_orderkey") < 3000)
             .select(F.col("o_orderkey").alias("k"),
                     F.col("o_custkey").alias("ck"),
                     F.col("o_totalprice").cast("decimal(18,2)")
                     .alias("price")))
    # dim covers only part of the FK range → real null-extensions
    dim0 = (c.filter(F.col("c_custkey") % 3 != 0)
            .select(F.col("c_custkey").alias("ck2"),
                    F.col("c_mktsegment").alias("seg")))
    fact = create_table(spark, fact0, str(tmp_path / "fact"),
                        short_name="fact", warehouse=sess.warehouse,
                        hash_partitions=["k"], hash_bucket_num=4)
    dim = create_table(spark, dim0, str(tmp_path / "dim"),
                       short_name="dim", warehouse=sess.warehouse,
                       hash_partitions=["ck2"], hash_bucket_num=4)
    sess.register("fact", fact)
    sess.register("dim", dim)
    mv.create_material_view(sess, "mv_lj", str(tmp_path / "mv_lj"),
                            VIEW_SQL)
    return fact, dim, fact0


def _check(sess, spark):
    got = sorted((tuple(r) for r in
                  sess.sql("SELECT * FROM mv_lj").collect()), key=str)
    want = sorted((tuple(r) for r in spark.sql(VIEW_SQL).collect()),
                  key=str)
    assert got == want
    assert any(g[0] is None for g in got), "null-extension group missing"


def _stamp(sess, source):
    t = sess.table("mv_lj")
    return t.store.snapshot().streaming.get(
        f"txn:mv_refresh:{t.info.table_id}:{source}", -1)


def test_leftjoin_fact_and_dim_windows(sess, spark, sf_dir, tmp_path):
    fact, dim, fact0 = _build(sess, spark, sf_dir, tmp_path)
    assert mv._load_registry(sess.warehouse)["mv_lj"]["incremental"] is True

    # fact-side window: upsert + delete
    fact.upsert(fact0.filter(F.col("k") % 5 == 0)
                .withColumn("price",
                            (F.col("price") * 2).cast("decimal(18,2)")))
    fact.delete("k % 7 = 3")
    sess._sync_views()
    assert mv.update_material_view(sess, "mv_lj") is True
    assert _stamp(sess, "fact") >= 0
    assert sess.table("mv_lj").store.snapshot().commit_type == "delta"
    _check(sess, spark)

    # dim-side window: inserts flip null→matched, deletes flip back,
    # updates migrate rows between groups
    fdf, ddf = fact.to_df(), dim.to_df()
    new_keys = (fdf.join(ddf, fdf["ck"] == ddf["ck2"], "left_anti")
                .select(F.col("ck").alias("ck2")).distinct().limit(20)
                .withColumn("seg", F.lit("NEWSEG")))
    dim.upsert(new_keys)
    dim.delete("ck2 % 11 = 2")
    dim.upsert(dim.to_df().filter("ck2 % 13 = 1")
               .withColumn("seg", F.lit("MOVED")))
    sess._sync_views()
    assert mv.update_material_view(sess, "mv_lj") is True
    assert _stamp(sess, "dim") >= 0
    assert sess.table("mv_lj").store.snapshot().commit_type == "delta"
    _check(sess, spark)
    assert sess.sql("SELECT n FROM mv_lj WHERE seg = 'NEWSEG'") \
        .first()[0] > 0

    # both changed inside one refresh window → sequential one-sided
    fact.upsert(fact0.filter(F.col("k") % 4 == 1)
                .withColumn("price",
                            (F.col("price") + 7).cast("decimal(18,2)")))
    dim.delete("ck2 % 17 = 5")
    sess._sync_views()
    assert mv.update_material_view(sess, "mv_lj") is True
    assert sess.table("mv_lj").store.snapshot().commit_type == "delta"
    _check(sess, spark)

    # noop
    assert mv.update_material_view(sess, "mv_lj") is False
    _check(sess, spark)


def test_leftjoin_dim_window_replay_is_noop(sess, spark, sf_dir, tmp_path):
    fact, dim, _f0 = _build(sess, spark, sf_dir, tmp_path)
    dim.delete("ck2 % 11 = 2")
    sess._sync_views()
    before = mv._load_registry(sess.warehouse)["mv_lj"]["fingerprints"]
    assert mv.update_material_view(sess, "mv_lj") is True
    state = {tuple(r) for r in sess.sql("SELECT * FROM mv_lj").collect()}
    reg = mv._load_registry(sess.warehouse)
    reg["mv_lj"]["fingerprints"] = before  # crash: registry save lost
    mv._save_registry(reg, sess.warehouse)
    assert mv.update_material_view(sess, "mv_lj") is False
    assert {tuple(r) for r in
            sess.sql("SELECT * FROM mv_lj").collect()} == state
    _check(sess, spark)


def test_leftjoin_eligibility_boundary(sess, spark, sf_dir, tmp_path):
    from starlake_spark import create_table

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    fact = create_table(
        spark,
        o.limit(500).select(F.col("o_orderkey").alias("k"),
                            F.col("o_custkey").alias("ck"),
                            F.col("o_totalprice").cast("decimal(18,2)")
                            .alias("price")),
        str(tmp_path / "fact"), short_name="fact",
        warehouse=sess.warehouse, hash_partitions=["k"],
        hash_bucket_num=4)
    # dim hashed on a DIFFERENT column than the join key → a window's
    # change types cannot stand in for match flips → full refresh
    dim = create_table(
        spark,
        c.limit(200).select(F.col("c_custkey").alias("ck2"),
                            F.col("c_name").alias("nm"),
                            F.col("c_mktsegment").alias("seg")),
        str(tmp_path / "dim"), short_name="dim",
        warehouse=sess.warehouse, hash_partitions=["nm"],
        hash_bucket_num=4)
    sess.register("fact", fact)
    sess.register("dim", dim)

    def spec_of(sql):
        return mv._incremental_spec(sess, sql)

    assert spec_of(
        "SELECT seg, count(*) AS n FROM fact LEFT JOIN dim "
        "ON fact.ck = dim.ck2 GROUP BY seg") is None
    # non-equality ON condition
    assert spec_of(
        "SELECT seg, count(*) AS n FROM fact LEFT JOIN dim "
        "ON fact.ck = dim.ck2 AND fact.price > 10 GROUP BY seg") is None
    # min/max aggregate over a left join (dim is always retractable)
    assert spec_of(
        "SELECT seg, max(price) AS mx FROM fact LEFT JOIN dim "
        "ON fact.ck = dim.ck2 GROUP BY seg") is None
    # the PK-keyed shape IS eligible — sanity-check the boundary from
    # the other side (join on the dim's true PK column set)
    dim2 = create_table(
        spark,
        c.limit(200).select(F.col("c_custkey").alias("ck3"),
                            F.col("c_mktsegment").alias("seg2")),
        str(tmp_path / "dim2"), short_name="dim2",
        warehouse=sess.warehouse, hash_partitions=["ck3"],
        hash_bucket_num=4)
    sess.register("dim2", dim2)
    spec = spec_of("SELECT seg2, count(*) AS n FROM fact LEFT JOIN dim2 "
                   "ON fact.ck = dim2.ck3 GROUP BY seg2")
    assert spec is not None and spec.get("join_type") == "left"
    assert spec["left"] == "fact" and spec["right"] == "dim2"


def test_leftjoin_cold_session_incremental(spark, sf_dir, tmp_path):
    """Cron-style refresh: a FRESH session (no registered temp views)
    must still refresh a left-join view incrementally — the empty
    probe-view registration covers the left-join analysis too, and
    BOTH window kinds (dim flips + fact delta) stay on the delta path.
    """
    from starlake_spark.sql import StarSession

    wh = str(tmp_path / "wh")
    sess = StarSession(spark, warehouse=wh)
    fact, dim, fact0 = _build(sess, spark, sf_dir, tmp_path)
    fact.upsert(fact0.filter(F.col("k") % 3 == 0)
                .withColumn("price",
                            (F.col("price") * 2).cast("decimal(18,2)")))
    dim.delete("ck2 % 11 = 2")
    for v in list(spark.catalog.listTables()):
        if v.isTemporary:
            spark.catalog.dropTempView(v.name)
    cold = StarSession(spark, warehouse=wh)
    assert mv.update_material_view(cold, "mv_lj") is True
    t = cold.table("mv_lj")
    assert t.store.snapshot().commit_type == "delta"  # incremental
    sess2 = StarSession(spark, warehouse=wh)
    sess2.table("fact"), sess2.table("dim")
    got = sorted((tuple(r) for r in
                  sess2.sql("SELECT * FROM mv_lj").collect()), key=str)
    want = sorted((tuple(r) for r in
                   sess2.spark.sql(VIEW_SQL).collect()), key=str)
    assert got == want


def test_leftjoin_where_on_dim_column(sess, spark, sf_dir, tmp_path):
    """WHERE over a DIM column after the left join (which kills
    null-extended rows) is sound under the flip algebra because the
    same predicate applies to every contribution frame — matched rows
    filter on their dim values, null-flip rows have dim cols NULL and
    are killed symmetrically on both the retract and re-add side."""
    from starlake_spark import create_table

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    fact0 = (o.filter(F.col("o_orderkey") < 3000)
             .select(F.col("o_orderkey").alias("k"),
                     F.col("o_custkey").alias("ck"),
                     F.col("o_totalprice").cast("decimal(18,2)")
                     .alias("price")))
    dim0 = (c.filter(F.col("c_custkey") % 3 != 0)
            .select(F.col("c_custkey").alias("ck2"),
                    F.col("c_mktsegment").alias("seg"),
                    (F.col("c_custkey") % 7).cast("int").alias("tier")))
    fact = create_table(spark, fact0, str(tmp_path / "fact"),
                        short_name="fact", warehouse=sess.warehouse,
                        hash_partitions=["k"], hash_bucket_num=4)
    dim = create_table(spark, dim0, str(tmp_path / "dim"),
                       short_name="dim", warehouse=sess.warehouse,
                       hash_partitions=["ck2"], hash_bucket_num=4)
    sess.register("fact", fact)
    sess.register("dim", dim)
    q = ("SELECT seg, sum(price) AS total, count(*) AS n FROM fact "
         "LEFT JOIN dim ON fact.ck = dim.ck2 WHERE tier >= 2 "
         "GROUP BY seg")
    mv.create_material_view(sess, "mv_w", str(tmp_path / "mv_w"), q)
    assert mv._load_registry(sess.warehouse)["mv_w"]["incremental"] is True
    fact.upsert(fact0.filter("k % 5 = 0")
                .withColumn("price",
                            (F.col("price") * 2).cast("decimal(18,2)")))
    dim.delete("ck2 % 11 = 2")  # matched→null flips under the filter
    dim.upsert(dim.to_df().filter("ck2 % 13 = 1")
               .withColumn("tier", F.lit(1).cast("int")))  # filtered out
    sess._sync_views()
    assert mv.update_material_view(sess, "mv_w") is True
    assert sess.table("mv_w").store.snapshot().commit_type == "delta"
    got = sorted((tuple(r) for r in
                  sess.sql("SELECT * FROM mv_w").collect()), key=str)
    want = sorted((tuple(r) for r in spark.sql(q).collect()), key=str)
    assert got == want


def test_leftjoin_rewriter_serves_maintained_view(sess, spark, sf_dir,
                                                  tmp_path):
    """rewrite ∩ maintenance for the left-join shape: after storms on
    both sides and an incremental refresh, a user query matching the
    view's left join serves FROM THE BACKING TABLE through the SQL
    entry point (no fact/dim scan in the plan), and a stale view must
    not serve."""
    fact, dim, fact0 = _build(sess, spark, sf_dir, tmp_path)
    fact.delete("k % 7 = 3")
    dim.delete("ck2 % 11 = 2")
    sess._sync_views()
    assert mv.update_material_view(sess, "mv_lj") is True
    df = mv.try_rewrite(
        sess, "SELECT seg, sum(price) AS total FROM fact LEFT JOIN dim "
              "ON fact.ck = dim.ck2 GROUP BY seg")
    assert df is not None, "left-join query did not rewrite"
    files = df.inputFiles()
    assert files and all("mv_lj" in f for f in files), files
    assert not any("/fact/" in f or "/dim/" in f for f in files)
    got = {tuple(r) for r in df.collect()}
    want = {tuple(r) for r in spark.sql(
        "SELECT seg, sum(price) AS total FROM fact LEFT JOIN dim "
        "ON fact.ck = dim.ck2 GROUP BY seg").collect()}
    assert got == want
    # an INNER-join query must NOT hit the left-join view (sidedness
    # is semantic), and a stale view must not serve
    assert mv.try_rewrite(
        sess, "SELECT seg, sum(price) AS total FROM fact JOIN dim "
              "ON fact.ck = dim.ck2 GROUP BY seg") is None
    fact.delete("k % 13 = 1")
    sess._sync_views()
    assert mv.try_rewrite(
        sess, "SELECT seg, sum(price) AS total FROM fact LEFT JOIN dim "
              "ON fact.ck = dim.ck2 GROUP BY seg") is None


def test_leftjoin_fact_window_reads_o_changes(spark, sf_dir, tmp_path):
    """O(changes) on the fact side: with an APPEND-ONLY fact, a
    consumed fact file is physically hidden and the fact-side refresh
    still succeeds — it plans only the new files left-joined to the
    dim, never fact history (a full re-run over the same table would
    throw on the missing file)."""
    import os

    from starlake_spark import create_table
    from starlake_spark.sql import StarSession

    sess = StarSession(spark, warehouse=str(tmp_path / "wh"))
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    fact0 = (o.filter(F.col("o_orderkey") < 600)
             .select(F.col("o_orderkey").alias("k"),
                     F.col("o_custkey").alias("ck"),
                     F.col("o_totalprice").cast("decimal(18,2)")
                     .alias("price")))
    fact = create_table(spark, fact0, str(tmp_path / "fact"),
                        short_name="fact", warehouse=sess.warehouse,
                        configuration={"compaction.auto": "false"})
    dim = create_table(
        spark,
        c.filter(F.col("c_custkey") % 3 != 0)
        .select(F.col("c_custkey").alias("ck2"),
                F.col("c_mktsegment").alias("seg")),
        str(tmp_path / "dim"), short_name="dim",
        warehouse=sess.warehouse, hash_partitions=["ck2"],
        hash_bucket_num=2)
    sess.register("fact", fact)
    sess.register("dim", dim)
    mv.create_material_view(sess, "mv_lj", str(tmp_path / "mv_lj"),
                            VIEW_SQL)
    files = fact.store.snapshot().all_files()
    victim = os.path.join(fact.store.table_path, files[0].path)
    os.rename(victim, victim + ".hidden")
    try:
        more = (o.filter((F.col("o_orderkey") >= 600)
                         & (F.col("o_orderkey") < 1000))
                .select(F.col("o_orderkey").alias("k"),
                        F.col("o_custkey").alias("ck"),
                        F.col("o_totalprice").cast("decimal(18,2)")
                        .alias("price")))
        fact.write(more, mode="append")
        # no _sync_views here: re-registering the fact view would plan
        # over ALL files (analysis opens footers) — the point is that
        # the refresh itself never needs them
        assert mv.update_material_view(sess, "mv_lj") is True
        assert sess.table("mv_lj").store.snapshot().commit_type == "delta"
    finally:
        os.rename(victim + ".hidden", victim)
    got = sorted((tuple(r) for r in
                  sess.sql("SELECT * FROM mv_lj").collect()), key=str)
    want = sorted((tuple(r) for r in spark.sql(VIEW_SQL).collect()),
                  key=str)
    assert got == want
    assert any(g[0] is None for g in got)
