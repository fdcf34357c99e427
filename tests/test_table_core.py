"""Core table lifecycle: create / read / write modes / partitions /
time travel. Mirrors the reference's TableCreationTests.scala areas."""

import pytest
from pyspark.sql import functions as F

from starlake_spark import StarTable, create_table
from starlake_spark.meta import ManifestStore


def _mk(spark, tmp_table_dir, **kw):
    df = spark.createDataFrame(
        [(1, "a", "r1"), (2, "b", "r1"), (3, "c", "r2")],
        "id int, name string, range string",
    )
    return create_table(spark, df, tmp_table_dir, **kw)


def test_create_and_read_plain(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    rows = sorted((r.id, r.name, r.range) for r in t.to_df().collect())
    assert rows == [(1, "a", "r1"), (2, "b", "r1"), (3, "c", "r2")]
    assert StarTable.is_star_table(tmp_table_dir)
    assert not StarTable.is_star_table("/tmp")


def test_create_hash_requires_bucket_num(spark, tmp_table_dir):
    with pytest.raises(ValueError):
        _mk(spark, tmp_table_dir, hash_partitions=["id"])


def test_range_partitioned_layout_and_pruning(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, range_partitions=["range"])
    snap = t.store.snapshot()
    assert set(snap.partitions) == {"range=r1", "range=r2"}
    only_r1 = t.to_df(partition_filter=lambda d: d["range"] == "r1")
    assert sorted(r.id for r in only_r1.collect()) == [1, 2]


def test_append_and_overwrite(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, range_partitions=["range"])
    t.write(
        spark.createDataFrame([(4, "d", "r3")], "id int, name string, range string"),
        mode="append",
    )
    assert sorted(r.id for r in t.to_df().collect()) == [1, 2, 3, 4]
    t.write(
        spark.createDataFrame([(9, "z", "r9")], "id int, name string, range string"),
        mode="overwrite",
    )
    assert [r.id for r in t.to_df().collect()] == [9]


def test_append_to_hash_table_forbidden(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, hash_partitions=["id"], hash_bucket_num=2)
    with pytest.raises(ValueError, match="upsert"):
        t.write(
            spark.createDataFrame([(4, "d", "r3")], "id int, name string, range string"),
            mode="append",
        )


def test_replace_where(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, range_partitions=["range"])
    t.write(
        spark.createDataFrame([(7, "n", "r1")], "id int, name string, range string"),
        mode="overwrite",
        replace_where="range = 'r1'",
    )
    rows = sorted((r.id, r.range) for r in t.to_df().collect())
    assert rows == [(3, "r2"), (7, "r1")]


def test_replace_where_rejects_out_of_scope_rows(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, range_partitions=["range"])
    with pytest.raises(ValueError):
        t.write(
            spark.createDataFrame([(7, "n", "r2")], "id int, name string, range string"),
            mode="overwrite",
            replace_where="range = 'r1'",
        )


def test_time_travel(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.write(
        spark.createDataFrame([(4, "d", "r3")], "id int, name string, range string"),
        mode="append",
    )
    assert sorted(r.id for r in t.to_df(version=1).collect()) == [1, 2, 3]
    assert sorted(r.id for r in t.to_df(version=2).collect()) == [1, 2, 3, 4]


def test_not_null_invariant_on_partition_cols(spark, tmp_table_dir):
    df = spark.createDataFrame([(1, "a", None)], "id int, name string, range string")
    with pytest.raises(ValueError, match="NOT NULL"):
        create_table(spark, df, tmp_table_dir, range_partitions=["range"])


def test_drop_partition_and_table(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, range_partitions=["range"])
    t.drop_partition("range=r1")
    assert sorted(r.id for r in t.to_df().collect()) == [3]
    t.drop_table()
    assert not ManifestStore.is_star_table(tmp_table_dir)


def test_for_name_catalog(spark, tmp_table_dir, tmp_path):
    wh = str(tmp_path / "wh")
    t = _mk(spark, tmp_table_dir)
    from starlake_spark import catalog

    catalog.register("core_t1", tmp_table_dir, wh)
    t2 = StarTable.for_name(spark, "core_t1", wh)
    assert sorted(r.id for r in t2.to_df().collect()) == [1, 2, 3]


def test_camelcase_api_parity(spark, tmp_table_dir):
    """python/star/tables.py:20-291 surface: every reference method name
    resolves, and updateExpr routes through the update engine path."""
    t = _mk(spark, tmp_table_dir, hash_partitions=["id"], hash_bucket_num=2)
    for name in ("forPath", "forName", "isStarTable", "toDF", "alias",
                 "dropPartition", "dropTable", "registerMergeOperator",
                 "updateExpr", "update", "delete", "upsert", "compaction",
                 "cleanup"):
        assert hasattr(StarTable, name), name
    t.updateExpr("id = 1", {"name": "upper(name)"})
    got = {r.id: r.name for r in t.toDF().collect()}
    assert got[1] == "A" and got[2] == "b"

    from starlake_spark import merge_ops as mo
    StarTable.registerMergeOperator("last_char", lambda: mo.PythonMergeOp(
        lambda vals: vals[-1][-1] if vals else None))
    assert "last_char" in mo._REGISTRY


def test_concurrent_appends_all_land(spark, tmp_path):
    """Eight threads append disjoint slices through separate StarTable
    handles; the lock + additive-merge commit protocol must land every
    commit with no lost updates (MetaCommit.doMetaCommit parity)."""
    from concurrent.futures import ThreadPoolExecutor

    from starlake_spark.table import StarTable, create_table

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    path = str(tmp_path / "t")
    create_table(spark, orders.filter(F.col("o_orderkey") % 9 == 8), path)

    def append(i):
        t = StarTable.for_path(spark, path)
        t.write(orders.filter(F.col("o_orderkey") % 9 == i), mode="append")
        return i

    with ThreadPoolExecutor(max_workers=8) as ex:
        assert sorted(ex.map(append, range(8))) == list(range(8))

    t = StarTable.for_path(spark, path)
    assert t.to_df().count() == orders.count()
    assert t.store.latest_version() == 9  # create + 8 appends
    keys = {r[0] for r in t.to_df().select("o_orderkey").collect()}
    assert keys == {r[0] for r in orders.select("o_orderkey").collect()}


def test_insert_nested_struct_cast_by_name(spark, tmp_table_dir):
    """INSERT normalization descends into structs BY NAME
    (StarLakeAnalysis.scala:161-197 parity): reordered nested fields
    keep their values, missing nested fields become typed nulls, and
    nested numeric widenings apply — where a positional struct cast
    would garble or reject the row."""
    from starlake_spark.table import create_table

    base = spark.createDataFrame(
        [(1, (10, "x", 1.5))],
        "id long, meta struct<a:long,b:string,c:double>")
    t = create_table(spark, base, tmp_table_dir)
    # reordered fields, missing 'c', and a:int needing int->long widening
    src = spark.createDataFrame(
        [(2, ("y", 20))], "id long, meta struct<b:string,a:int>")
    t.write(src, mode="append")
    rows = {r["id"]: r["meta"] for r in t.to_df().collect()}
    assert rows[1]["a"] == 10 and rows[1]["b"] == "x" and rows[1]["c"] == 1.5
    assert rows[2]["a"] == 20 and rows[2]["b"] == "y" and rows[2]["c"] is None

    # null struct stays null (not a struct of nulls)
    src2 = spark.createDataFrame(
        [(3, None)], "id long, meta struct<b:string,a:int>")
    t.write(src2, mode="append")
    got = {r["id"]: r["meta"] for r in t.to_df().collect()}
    assert got[3] is None


def test_insert_array_of_struct_cast_by_name(spark, tmp_table_dir):
    from starlake_spark.table import create_table

    base = spark.createDataFrame(
        [(1, [(1, "a")])],
        "id long, tags array<struct<k:long,v:string>>")
    t = create_table(spark, base, tmp_table_dir)
    src = spark.createDataFrame(
        [(2, [("b", 2), ("c", 3)])],
        "id long, tags array<struct<v:string,k:int>>")
    t.write(src, mode="append")
    rows = {r["id"]: r["tags"] for r in t.to_df().collect()}
    assert [(x["k"], x["v"]) for x in rows[2]] == [(2, "b"), (3, "c")]


def test_generated_partition_column(spark, tmp_table_dir):
    """generated={"day": "to_date(ts)"}: writer derives the partition
    column when absent, enforces consistency when present, and ts-range
    predicates prune day directories without mentioning day."""
    import pytest as _pt
    from pyspark.sql import functions as F

    from starlake_spark.table import create_table

    e = spark.createDataFrame(
        [(i, f"2024-01-{(i % 9) + 1:02d} 10:00:00") for i in range(40)],
        "id int, s string").select("id", F.col("s").cast("timestamp").alias("ts"))
    t = create_table(spark, e, tmp_table_dir,
                     range_partitions=["day"], generated={"day": "to_date(ts)"})
    assert len(t.store.snapshot().partitions) == 9
    df = t.to_df(where="ts >= TIMESTAMP '2024-01-03 00:00:00' "
                       "AND ts < TIMESTAMP '2024-01-05 00:00:00'")
    assert len(df.inputFiles()) < len(t.to_df().inputFiles())
    assert df.count() == e.filter("ts >= '2024-01-03' AND ts < '2024-01-05'").count()
    # consistency enforcement
    bad = e.limit(3).withColumn("day", F.lit("1999-01-01").cast("date"))
    with _pt.raises(ValueError, match="generated column"):
        t.write(bad, mode="append")
    # generated col must be a range partition
    with _pt.raises(ValueError, match="range partition"):
        create_table(spark, e, tmp_table_dir + "_x",
                     generated={"day": "to_date(ts)"})


def test_streaming_sink_into_generated_partition_table(spark, tmp_table_dir):
    """The canonical ingest flow: micro-batches without the generated
    day column land in the right day directories via the sink (the
    writer derives the column on every path, not just batch)."""
    from pyspark.sql import functions as F

    from starlake_spark.meta import ManifestStore
    from starlake_spark.streaming.sink import StarStreamSink
    from starlake_spark.table import StarTable, create_table

    e = spark.createDataFrame(
        [(i, f"2024-02-{(i % 3) + 1:02d} 08:00:00", float(i)) for i in range(12)],
        "event_id int, s string, value double"
    ).select("event_id", F.col("s").cast("timestamp").alias("ts"), "value")
    t = create_table(spark, e.limit(0), tmp_table_dir,
                     range_partitions=["day"], generated={"day": "to_date(ts)"},
                     hash_partitions=["event_id"], hash_bucket_num=2)
    sink = StarStreamSink(ManifestStore(tmp_table_dir), "genq")
    assert sink.write_batch(e.filter("event_id < 6"), 0)
    assert sink.write_batch(e.filter("event_id >= 6"), 1)
    assert not sink.write_batch(e, 1)  # retry skipped
    assert sorted(t.store.snapshot().partitions) == [
        "day=2024-02-01", "day=2024-02-02", "day=2024-02-03"]
    assert t.to_df().count() == 12


def test_manifest_stats_zero_job_estimates(spark, tmp_path):
    """StarTable.stats(): footer row counts ride the manifest, so size
    and row estimates cost zero Spark jobs and survive upsert/compact."""
    from starlake_spark.table import create_table

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    n = orders.count()
    t = create_table(spark, orders, str(tmp_path / "t"),
                     hash_partitions=["o_orderkey"], hash_bucket_num=4,
                     configuration={"compaction.auto": "false"})
    s = t.stats()
    assert s["approx_rows"] == n
    assert s["files_without_rowcount"] == 0
    assert s["total_bytes"] > 0 and s["num_files"] >= 4
    # MoR deltas overlap keys -> estimate becomes an upper bound
    t.upsert(orders.limit(25))
    assert t.stats()["approx_rows"] == n + 25
    t.compaction(force=True)
    assert t.stats()["approx_rows"] == n
    # time travel sees the old snapshot's estimate
    assert t.stats(version=1)["approx_rows"] == n


def test_metadata_only_count(spark, tmp_path):
    """count(): exact and ZERO Spark jobs on all-base snapshots; MoR
    snapshots fall back to the scan count and stay correct."""
    from starlake_spark.table import create_table

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    n = orders.count()
    t = create_table(spark, orders, str(tmp_path / "t"),
                     hash_partitions=["o_orderkey"], hash_bucket_num=4,
                     configuration={"compaction.auto": "false"})
    st = spark.sparkContext.statusTracker()
    before = len(st.getJobIdsForGroup(None) or [])
    assert t.count() == n
    assert len(st.getJobIdsForGroup(None) or []) == before  # no jobs ran

    # MoR delta (10 updates + 1 new key) -> scan fallback, still right
    delta = orders.limit(10).unionByName(
        orders.limit(1).withColumn("o_orderkey", F.lit(99999999)))
    t.upsert(delta)
    assert t.count() == n + 1
    t.compaction(force=True)
    before = len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or [])
    assert t.count() == n + 1
    assert len(spark.sparkContext.statusTracker().getJobIdsForGroup(None) or []) == before
    # time travel answers from the old snapshot
    assert t.count(version=1) == n


def test_convert_to_star_in_place(spark, tmp_path):
    """CONVERT TO STAR adopts an existing parquet layout without
    touching a data byte: same files referenced, stats/rowcounts
    harvested (metadata count works), partition dirs become range
    partitions with pruning, and the normal DML lifecycle continues."""
    import os
    import shutil

    from starlake_spark import convert_to_star
    from starlake_spark.meta import MetaError

    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    n = orders.count()
    # unpartitioned: two loose parquet files
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    shutil.copy("/root/testdata/sf0.001/orders.parquet", flat + "/a.parquet")
    shutil.copy("/root/testdata/sf0.001/orders.parquet", flat + "/b.parquet")
    sizes_before = {p: os.path.getsize(os.path.join(flat, p))
                    for p in ("a.parquet", "b.parquet")}
    t = convert_to_star(spark, flat)
    assert t.count() == 2 * n  # metadata-only, exact
    assert {os.path.basename(f.path) for f in t.store.snapshot().all_files()} \
        == {"a.parquet", "b.parquet"}
    for p, sz in sizes_before.items():  # zero bytes rewritten
        assert os.path.getsize(os.path.join(flat, p)) == sz
    # footer stats power skipping on adopted data
    assert all(f.stats for f in t.store.snapshot().all_files())
    # lifecycle continues: delete rewrites, time travel sees v1
    t.delete("o_orderstatus = 'P'")
    survivors = 2 * orders.filter("o_orderstatus != 'P'").count()
    assert t.to_df().count() == survivors
    assert t.to_df(version=1).count() == 2 * n
    with pytest.raises(MetaError, match="already a star"):
        convert_to_star(spark, flat)

    # hive-partitioned adoption with pruning
    part = str(tmp_path / "part")
    orders.write.partitionBy("o_orderstatus").parquet(part)
    t2 = convert_to_star(spark, part, range_partitions=["o_orderstatus"])
    assert t2.count() == n
    pruned = t2.to_df(partition_filter="o_orderstatus = 'F'")
    assert pruned.count() == orders.filter("o_orderstatus = 'F'").count()
    assert all("o_orderstatus=F" in f for f in pruned.inputFiles())


def test_parquet_compression_property(spark, sf_dir, tmp_path):
    """`parquet.compression` table property selects the storage codec
    for every write path; compaction after an ALTER re-encodes."""
    import os

    from starlake_spark.table import create_table

    df = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(50)
    t = create_table(spark, df, str(tmp_path / "t"),
                     configuration={"parquet.compression": "zstd"})
    files = [f.path for f in t.store.snapshot().all_files()]
    assert files and all(".zstd." in os.path.basename(p) for p in files)
    assert t.to_df().count() == 50
    # switch codec: subsequent writes use it (mixed codecs read fine)
    t.set_properties({"parquet.compression": "gzip"})
    t.write(df.limit(5), mode="append")
    newest = max(t.store.snapshot().all_files(), key=lambda f: f.write_version)
    assert ".gz." in os.path.basename(newest.path)
    assert t.to_df().count() == 55


def test_generate_symlink_manifest(spark, sf_dir, tmp_path):
    """Delta GENERATE parity: the symlink manifest lists exactly the
    snapshot's files per partition; reading the listed paths
    reproduces the table; MoR-delta snapshots are refused until
    compaction."""
    import os

    from pyspark.sql import functions as F

    from starlake_spark.table import create_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = create_table(spark, orders, str(tmp_path / "t"),
                     range_partitions=["o_orderstatus"])
    root = t.generate_symlink_manifest()
    paths = []
    for r, _d, names in os.walk(root):
        for n in names:
            assert n == "manifest"
            paths += [ln for ln in open(os.path.join(r, n)).read().splitlines() if ln]
    assert sorted(paths) == sorted(
        os.path.join(str(tmp_path / "t"), f.path)
        for f in t.store.snapshot().all_files())
    got = spark.read.option("basePath", os.path.dirname(
        os.path.dirname(paths[0]))).parquet(*paths)
    assert got.count() == orders.count()
    # MoR refusal
    th = create_table(spark, orders, str(tmp_path / "h"),
                      hash_partitions=["o_orderkey"], hash_bucket_num=4)
    th.upsert(orders.limit(3).withColumn("o_totalprice", F.lit(1.0)))
    import pytest as _pt
    with _pt.raises(ValueError, match="compaction"):
        th.generate_symlink_manifest()
    th.compaction()
    assert os.path.isdir(th.generate_symlink_manifest())


def test_metadata_agg_exact_and_zero_jobs(spark, sf_dir, tmp_table_dir):
    from starlake_spark.table import create_table

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = create_table(spark, o, tmp_table_dir,
                     range_partitions=["o_orderstatus"])
    exp = o.selectExpr("min(o_totalprice)", "max(o_totalprice)",
                       "count(*)", "min(o_orderdate)",
                       "max(o_orderdate)").collect()[0]
    before = len(spark.sparkContext.statusTracker()
                 .getJobIdsForGroup(None) or [])
    mp = t.metadata_agg("o_totalprice")
    md = t.metadata_agg("o_orderdate")
    after = len(spark.sparkContext.statusTracker()
                .getJobIdsForGroup(None) or [])
    assert after == before, "metadata_agg must run zero Spark jobs"
    assert (mp["min"], mp["max"], mp["count"]) == (exp[0], exp[1], exp[2])
    assert (md["min"], md["max"]) == (exp[3], exp[4])
    assert mp["nulls"] == 0


def test_metadata_agg_guards(spark, sf_dir, tmp_table_dir):
    import pytest
    from pyspark.sql import functions as F

    from starlake_spark.table import create_table

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = create_table(spark, o, tmp_table_dir,
                     hash_partitions=["o_orderkey"], hash_bucket_num=2,
                     configuration={"compaction.auto": "false"})
    with pytest.raises(ValueError, match="string"):
        t.metadata_agg("o_orderstatus")
    with pytest.raises(ValueError, match="unknown column"):
        t.metadata_agg("nope")
    t.upsert(o.limit(50).withColumn("o_totalprice", F.lit(1.0)))
    with pytest.raises(ValueError, match="all-base"):
        t.metadata_agg("o_totalprice")
    t.compaction(force=True)
    mp = t.metadata_agg("o_totalprice")
    assert mp["min"] == 1.0  # post-compaction stats reflect the upsert
    assert mp["count"] == o.count()


def test_metadata_agg_counts_nulls(spark, tmp_table_dir):
    from starlake_spark.table import create_table

    df = spark.createDataFrame(
        [(1, 5.0), (2, None), (3, 7.5), (4, None)], "k long, v double")
    t = create_table(spark, df, tmp_table_dir)
    m = t.metadata_agg("v")
    assert m == {"min": 5.0, "max": 7.5, "count": 4, "nulls": 2}


def test_metadata_agg_randomized_differential(spark, tmp_path):
    """Seeded random tables (nulls, negative decimals-as-doubles, dates,
    duplicate extrema, single-row and all-null partitions): metadata_agg
    must equal the scan aggregate or refuse — never approximate."""
    import datetime as dt
    import random

    from pyspark.sql import functions as F

    from starlake_spark.table import create_table

    rng = random.Random(9)
    for case in range(4):
        rows = []
        for i in range(rng.randint(1, 120)):
            v = None if rng.random() < 0.3 else \
                round(rng.uniform(-1e6, 1e6), 3)
            d = dt.date(2020, 1, 1) + dt.timedelta(days=rng.randint(0, 900))
            rows.append((i, v, d, rng.choice("AB")))
        df = spark.createDataFrame(
            rows, "k long, v double, d date, p string")
        t = create_table(spark, df, str(tmp_path / f"rt{case}"),
                         range_partitions=["p"])
        exp = df.selectExpr("min(v)", "max(v)", "count(*)",
                            "sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)",
                            "min(d)", "max(d)").collect()[0]
        mv, md = t.metadata_agg("v"), t.metadata_agg("d")
        assert (mv["min"], mv["max"], mv["count"], mv["nulls"]) == \
            (exp[0], exp[1], exp[2], exp[3]), case
        assert (md["min"], md["max"]) == (exp[4], exp[5]), case


def test_create_partition_options_case_insensitive(spark, sf_dir, tmp_path):
    """Reference CaseSensitivitySuite 'set partition columns - case
    insensitive': partition/hash option names resolve against the data
    under Spark's default case-insensitive resolver, canonicalized to
    the data's casing; replaceWhere predicates are case-insensitive too."""
    from starlake_spark.table import create_table

    df = spark.createDataFrame([(1, "A", 5.0), (2, "B", 6.0)],
                               "k long, grp string, v double")
    t = create_table(spark, df, str(tmp_path / "t"),
                     range_partitions=["GRP"],
                     hash_partitions=["K"], hash_bucket_num=2)
    assert t.info.range_cols == ["grp"]
    assert t.info.hash_cols == ["k"]
    assert t.to_df().count() == 2
    t2 = create_table(spark, df, str(tmp_path / "t2"),
                      range_partitions=["grp"])
    t2.write(df.filter("grp = 'A'"), mode="overwrite",
             replace_where="GRP = 'A'")
    assert t2.to_df().count() == 2


def test_create_rejects_invalid_and_case_dup_column_names(spark, tmp_path):
    """Reference TableCreationTests: invalid parquet field-name chars
    and case-duplicate column names are rejected at creation."""
    import pytest

    from starlake_spark.table import create_table

    bad = spark.createDataFrame([(1, 2)], ["ok", "bad col,name"])
    with pytest.raises(ValueError, match="invalid column name"):
        create_table(spark, bad, str(tmp_path / "t1"))
    dup = spark.createDataFrame([(1, 2)], ["a", "A"])
    with pytest.raises(ValueError, match="differ"):
        create_table(spark, dup, str(tmp_path / "t2"))


def test_nested_struct_and_array_lifecycle(spark, tmp_path):
    """Struct and array columns survive the whole engine lifecycle:
    create, MoR upsert (struct replaced whole — UpdateSuiteBase nested
    semantics are column-level here), compaction invariance, tombstone
    delete with a nested-field condition, stats-skipped reads."""
    from starlake_spark.table import create_table

    df = spark.createDataFrame(
        [(1, {"a": 1, "b": "x"}, [1.0, 2.0]),
         (2, {"a": 2, "b": "y"}, [3.0])],
        "k long, meta struct<a:int,b:string>, emb array<double>")
    t = create_table(spark, df, str(tmp_path / "t"),
                     hash_partitions=["k"], hash_bucket_num=2)
    t.upsert(spark.createDataFrame(
        [(1, {"a": 9, "b": "z"}, [9.0])],
        "k long, meta struct<a:int,b:string>, emb array<double>"))
    before = sorted(map(tuple, t.to_df().collect()))
    t.compaction(force=True)
    assert sorted(map(tuple, t.to_df().collect())) == before
    assert t.to_df().filter("meta.a = 9").count() == 1
    t.delete("meta.a = 9", use_delta=True)
    assert [r["k"] for r in t.to_df().collect()] == [2]
    assert t.to_df(where="k = 2").collect()[0]["emb"] == [3.0]


def test_metadata_agg_after_rename_column(spark, sf_dir, tmp_path):
    """Pre-rename files key their footer stats by the historical name;
    metadata_agg resolves through the alias chain."""
    from starlake_spark.table import create_table

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = create_table(spark, o, str(tmp_path / "t"),
                     range_partitions=["o_orderstatus"])
    exp = o.selectExpr("min(o_totalprice)", "max(o_totalprice)").collect()[0]
    t.rename_column("o_totalprice", "price")
    m = t.metadata_agg("price")
    assert (m["min"], m["max"]) == (exp[0], exp[1])


def test_copy_into_idempotent_file_ingest(spark, sf_dir, tmp_path):
    """COPY INTO: loads a directory's files exactly once per file —
    re-running loads nothing new, newly arrived files load
    incrementally, a hash-table target converges by key."""
    import os

    from starlake_spark.table import create_table

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = str(tmp_path / "landing")
    o.filter("o_orderkey % 2 = 0").coalesce(2).write.parquet(src)
    t = create_table(spark, o.limit(0), str(tmp_path / "t"))
    n1 = t.copy_into(src)
    assert n1 == o.filter("o_orderkey % 2 = 0").count()
    assert t.count() == n1
    assert t.copy_into(src) == 0  # nothing new: zero rows, zero commits
    v = t.store.latest_version()
    t.copy_into(src)
    assert t.store.latest_version() == v
    # late-arriving files load incrementally
    o.filter("o_orderkey % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    n2 = t.copy_into(src)
    assert n2 == o.filter("o_orderkey % 2 = 1").count()
    assert t.count() == o.count()
    # hash-table target: replays converge by key
    h = create_table(spark, o.limit(0), str(tmp_path / "h"),
                     hash_partitions=["o_orderkey"], hash_bucket_num=2)
    h.copy_into(src)
    h.copy_into(src)
    assert h.count() == o.count()


def test_decimal_footer_stats_exact(spark, tmp_path):
    """Decimal columns: pyarrow can't render parquet DECIMAL typed
    statistics — bounds recover from the physical min/max, and bounds
    aggregate by VALUE across row groups (Decimal('9.5') < '10.0' even
    though the strings order the other way). Regression: decimal
    writes used to crash footer harvesting outright."""
    import decimal

    from starlake_spark.table import create_table

    rows = [(i, decimal.Decimal(s))
            for i, s in enumerate(["9.50", "10.00", "-3.25", "100.75"])]
    df = spark.createDataFrame(rows, "k long, m decimal(12,2)")
    t = create_table(spark, df, str(tmp_path / "t"))
    g = t.metadata_agg("m")
    assert g["min"] == decimal.Decimal("-3.25")
    assert g["max"] == decimal.Decimal("100.75")
    assert g["count"] == 4
    # stats skipping on the decimal column still answers correctly
    assert t.to_df(where="m > 50").count() == 1
    assert t.to_df(where="m < 0").count() == 1
