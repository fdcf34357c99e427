"""Upsert + merge-on-read semantics. Mirrors UpsertSuiteBase.scala:147-662,
MergeOperatorSuite.scala:31-453, CompactionSuite.scala and the
manual_execute_suites invariants (SURVEY §5)."""

import pytest
from pyspark.sql import functions as F

from starlake_spark import create_table


def _mk(spark, path):
    df = spark.createDataFrame(
        [(1, "a", "r1"), (2, "b", "r1"), (3, "c", "r2")],
        "id int, name string, range string",
    )
    return create_table(
        spark, df, path, range_partitions=["range"],
        hash_partitions=["id"], hash_bucket_num=2,
    )


def test_upsert_last_wins(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.upsert(spark.createDataFrame([(1, "A", "r1"), (4, "d", "r2")],
                                   "id int, name string, range string"))
    t.upsert(spark.createDataFrame([(1, "AA", "r1")],
                                   "id int, name string, range string"))
    rows = sorted((r.id, r.name) for r in t.to_df().collect())
    assert rows == [(1, "AA"), (2, "b"), (3, "c"), (4, "d")]


def test_upsert_explicit_null_wins_on_delta_path(spark, tmp_table_dir):
    """MergeOperatorSuite.scala:272-296 'merge return null': the delta
    path's default op takes the newest version even when NULL."""
    t = _mk(spark, tmp_table_dir)
    t.upsert(spark.createDataFrame([(2, None, "r1")], "id int, name string, range string"))
    rows = dict((r.id, r.name) for r in t.to_df().collect())
    assert rows[2] is None


def test_upsert_cow_null_does_not_win(spark, tmp_table_dir):
    """CoW path (UpsertCommand.scala:141-149) uses coalesce(source, target):
    explicit source NULL keeps the target value."""
    t = _mk(spark, tmp_table_dir)
    t.upsert(spark.createDataFrame([(2, None, "r1"), (9, "i", "r1")],
                                   "id int, name string, range string"),
             use_delta=False, condition="range = 'r1'")
    rows = dict((r.id, r.name) for r in t.to_df().collect())
    assert rows[2] == "b" and rows[9] == "i"
    assert rows[3] == "c"  # out-of-scope partition untouched


def test_upsert_requires_hash_cols(spark, tmp_table_dir):
    df = spark.createDataFrame([(1, "a", "r1")], "id int, name string, range string")
    t = create_table(spark, df, tmp_table_dir, range_partitions=["range"])
    with pytest.raises(ValueError, match="hash"):
        t.upsert(df)


def test_upsert_source_must_carry_range_cols(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    with pytest.raises(ValueError, match="range"):
        t.upsert(spark.createDataFrame([(1, "x")], "id int, name string"))


def test_schema_evolution_partial_column_upsert(spark, tmp_table_dir):
    """UpsertSuiteBase.scala:249-310: delta carrying a new column; old
    column values survive, new column null-fills old keys."""
    t = _mk(spark, tmp_table_dir)
    t.upsert(spark.createDataFrame([(1, 99, "r1"), (4, 7, "r2")],
                                   "id int, score int, range string"))
    rows = sorted((r.id, r.name, r.score) for r in t.to_df().collect())
    assert rows == [(1, "a", 99), (2, "b", None), (3, "c", None), (4, None, 7)]


def test_multi_range_multi_hash(spark, tmp_table_dir):
    """UpsertSuiteBase.scala:381-395 (FIXTURES F3)."""
    df = spark.createDataFrame(
        [("x", 1, 10, "h1", 1.0), ("x", 1, 20, "h2", 2.0), ("y", 2, 10, "h1", 3.0)],
        "range1 string, range2 int, hash1 int, hash2 string, value double",
    )
    t = create_table(spark, df, tmp_table_dir,
                     range_partitions=["range1", "range2"],
                     hash_partitions=["hash1", "hash2"], hash_bucket_num=4)
    t.upsert(spark.createDataFrame([("x", 1, 10, "h1", 9.0)],
                                   "range1 string, range2 int, hash1 int, hash2 string, value double"))
    rows = sorted((r.range1, r.range2, r.hash1, r.hash2, r.value)
                  for r in t.to_df().collect())
    assert rows == [("x", 1, 10, "h1", 9.0), ("x", 1, 20, "h2", 2.0),
                    ("y", 2, 10, "h1", 3.0)]


def test_merge_op_sum_and_concat(spark, tmp_table_dir):
    """MergeOpInt sum across versions null→0 (MergeOperatorSuite.scala:299-338),
    MergeOpString comma-concat (MergeOperator.scala:68-72)."""
    df = spark.createDataFrame([(1, 10, "x", "r1")], "id int, v int, s string, range string")
    t = create_table(spark, df, tmp_table_dir, range_partitions=["range"],
                     hash_partitions=["id"], hash_bucket_num=2)
    t.upsert(spark.createDataFrame([(1, 5, "y", "r1")], "id int, v int, s string, range string"))
    t.upsert(spark.createDataFrame([(1, None, "z", "r1")], "id int, v int, s string, range string"))
    row = t.to_df(merge_operators={"v": "sum", "s": "concat"}).collect()[0]
    assert row.v == 15 and row.s == "x,y,z"
    # default read still last-wins
    row = t.to_df().collect()[0]
    assert row.v is None and row.s == "z"


def test_merge_op_custom_python(spark, tmp_table_dir):
    df = spark.createDataFrame([(1, 10, "r1")], "id int, v int, range string")
    t = create_table(spark, df, tmp_table_dir, range_partitions=["range"],
                     hash_partitions=["id"], hash_bucket_num=2)
    t.upsert(spark.createDataFrame([(1, 4, "r1")], "id int, v int, range string"))
    row = t.to_df(merge_operators={"v": lambda vals: max(v for v in vals if v is not None)}).collect()[0]
    assert row.v == 10


def test_merge_op_requires_hash_table(spark, tmp_table_dir):
    df = spark.createDataFrame([(1, "a", "r1")], "id int, name string, range string")
    t = create_table(spark, df, tmp_table_dir)
    with pytest.raises(ValueError):
        t.to_df(merge_operators={"name": "concat"})


def test_compaction_does_not_change_result(spark, tmp_table_dir):
    """manual_execute_suites/CompactionDoNotChangeResult.scala — the
    single most valuable reference invariant (SURVEY §5)."""
    t = _mk(spark, tmp_table_dir)
    for i in range(4):
        t.upsert(spark.createDataFrame(
            [(1 + i, f"u{i}", "r1"), (10 + i, f"n{i}", "r2")],
            "id int, name string, range string"))
    before = sorted(map(tuple, t.to_df().collect()))
    snap = t.store.snapshot()
    assert any(p.delta_file_num > 0 for p in snap.partitions.values())
    t.compaction(force=True)
    after = sorted(map(tuple, t.to_df().collect()))
    assert before == after
    snap = t.store.snapshot()
    assert all(p.delta_file_num == 0 for p in snap.partitions.values())


def test_upsert_after_compaction(spark, tmp_table_dir):
    """manual_execute_suites/UpsertAfterCompaction.scala"""
    t = _mk(spark, tmp_table_dir)
    t.upsert(spark.createDataFrame([(1, "A", "r1")], "id int, name string, range string"))
    t.compaction(force=True)
    t.upsert(spark.createDataFrame([(1, "B", "r1"), (2, None, "r1")],
                                   "id int, name string, range string"))
    rows = dict((r.id, r.name) for r in t.to_df().collect())
    assert rows == {1: "B", 2: None, 3: "c"}


def test_compaction_with_merge_op_materializes(spark, tmp_table_dir):
    """CompactionCommand may apply merge operators; afterwards a default
    read sees the merged values (CompactionCommand.scala:70-109)."""
    df = spark.createDataFrame([(1, 10, "r1")], "id int, v int, range string")
    t = create_table(spark, df, tmp_table_dir, range_partitions=["range"],
                     hash_partitions=["id"], hash_bucket_num=2)
    t.upsert(spark.createDataFrame([(1, 5, "r1")], "id int, v int, range string"))
    t.compaction(force=True, merge_operators={"v": "sum"})
    assert t.to_df().collect()[0].v == 15


def test_mvcc_concurrent_reader_sees_old_snapshot(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    old = t.to_df()  # plan pinned to snapshot v1 file list
    t.upsert(spark.createDataFrame([(1, "NEW", "r1")], "id int, name string, range string"))
    assert dict((r.id, r.name) for r in old.collect())[1] == "a"
    assert dict((r.id, r.name) for r in t.to_df().collect())[1] == "NEW"


def test_auto_compaction_caps_delta_commit_fanout(spark, sf_dir, tmp_table_dir):
    """N delta upserts never leave DELTA_FILE_COMPACT_TRIGGER or more
    un-compacted delta commits in any partition: the trigger fires
    inside upsert() once the cap is reached (reference
    StarLakeSQLConf.scala:41-45, CompactionCommand.scala:70-109), so
    MoR plan fan-out stays bounded no matter how many upserts land."""
    from pyspark.sql import functions as F

    from starlake_spark.operators.dml import DELTA_FILE_COMPACT_TRIGGER
    from starlake_spark.table import create_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = create_table(spark, orders, tmp_table_dir,
                     hash_partitions=["o_orderkey"], hash_bucket_num=2)
    max_commits = 0
    for i in range(12):
        t.upsert(orders.limit(10).withColumn("o_totalprice", F.lit(float(i))))
        snap = t.store.snapshot()
        for ps in snap.partitions.values():
            n = len({f.write_version for f in ps.files if not f.is_base_file})
            max_commits = max(max_commits, n)
            assert n < DELTA_FILE_COMPACT_TRIGGER, (
                f"partition holds {n} delta commits after auto-compaction")
    assert max_commits > 0, "test never exercised the delta path"
    # final state still answers correctly
    got = t.to_df().filter(F.col("o_orderkey").isin(
        [r[0] for r in orders.limit(10).select("o_orderkey").collect()]))
    assert got.filter(F.col("o_totalprice") == 11.0).count() == 10


def test_auto_compaction_opt_out(spark, sf_dir, tmp_table_dir):
    from pyspark.sql import functions as F

    from starlake_spark.operators.dml import DELTA_FILE_COMPACT_TRIGGER
    from starlake_spark.table import create_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = create_table(spark, orders, tmp_table_dir,
                     hash_partitions=["o_orderkey"], hash_bucket_num=2,
                     configuration={"compaction.auto": "false"})
    for i in range(DELTA_FILE_COMPACT_TRIGGER + 2):
        t.upsert(orders.limit(5).withColumn("o_totalprice", F.lit(float(i))))
    snap = t.store.snapshot()
    n = max(len({f.write_version for f in ps.files if not f.is_base_file})
            for ps in snap.partitions.values())
    assert n >= DELTA_FILE_COMPACT_TRIGGER, "opt-out must leave deltas un-compacted"


def test_case_insensitive_source_columns(spark, tmp_table_dir):
    """Reference CaseSensitivitySuite behavior: source columns matching
    the schema modulo case resolve to the declared columns (never become
    new columns via autoMerge); case-twin source columns are rejected."""
    base = spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                                 ["id", "name", "value"])
    t = create_table(spark, base, tmp_table_dir,
                     hash_partitions=["id"], hash_bucket_num=2)
    t.upsert(spark.createDataFrame([(2, "B2", 200)], ["ID", "NAME", "VALUE"]))
    rows = {r["id"]: (r["name"], r["value"]) for r in t.to_df().collect()}
    assert rows == {1: ("a", 10), 2: ("B2", 200)}
    assert [f.name for f in t.to_df().schema.fields] == ["id", "name", "value"]

    t.update("ID = 1", {"VALUE": F.lit(99)})
    assert {r["id"]: r["value"] for r in t.to_df().collect()} == {1: 99, 2: 200}

    ambiguous = spark.createDataFrame([(3, 1, 2)], ["id", "value", "VALUE"])
    with pytest.raises(ValueError, match="differ\\s+only in case"):
        t.upsert(ambiguous)


def test_non_identity_custom_op_consistent_across_half_compacted(spark, tmp_path):
    """A custom merge op that is NOT identity on a single version (here:
    count of versions carrying the column) must apply on single-version
    partitions too — a half-compacted table must answer identically for
    both partition classes (VERDICT r2 'what's wrong' #1)."""
    from pyspark.sql import functions as F

    from starlake_spark import merge_ops as mo
    from starlake_spark.table import create_table

    df = spark.createDataFrame(
        [(1, "A", 10), (2, "A", 20), (3, "B", 30), (4, "B", 40)],
        "id int, part string, v int")
    t = create_table(spark, df, str(tmp_path / "t"),
                     range_partitions=["part"],
                     hash_partitions=["id"], hash_bucket_num=2,
                     configuration={"compaction.auto": "false"})
    # only partition B gets a delta → A stays single-version
    t.upsert(spark.createDataFrame([(3, "B", 300)], "id int, part string, v int"))

    n_versions = mo.PythonMergeOp(lambda vals: len(vals), result_type="int")
    got = {r["id"]: r["v"] for r in
           t.to_df(merge_operators={"v": n_versions}).collect()}
    # id 3 has two versions of v; everyone else exactly one — including
    # the untouched single-version partition A (ids 1, 2)
    assert got == {1: 1, 2: 1, 3: 2, 4: 1}, got

    # an op DECLARED singleton-identity keeps plain-scan semantics
    last_like = mo.PythonMergeOp(lambda vals: vals[-1], singleton_identity=True)
    got2 = {r["id"]: r["v"] for r in
            t.to_df(merge_operators={"v": last_like}).collect()}
    assert got2 == {1: 10, 2: 20, 3: 300, 4: 40}, got2


def test_duplicate_keys_in_one_batch_last_wins(spark, tmp_table_dir):
    """Reference UpsertWithDuplicateData{BySame,ByDifferent,AndFields}
    (manual_execute_suites): duplicate primary keys inside ONE batch —
    at CREATE and at every upsert — collapse to the LAST row by input
    order, on every read path (plain scan of the all-base snapshot AND
    the MoR scan after deltas must agree)."""
    from pyspark.sql import functions as F

    from starlake_spark.table import create_table

    df = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 11), (2, "c", 12), (2, "d", 13),
         (3, "e", 14)],
        "k long, name string, age long")
    t = create_table(spark, df, tmp_table_dir,
                     hash_partitions=["k"], hash_bucket_num=2)
    # plain path (all-base snapshot): deduped at write
    assert sorted((r["k"], r["name"]) for r in t.to_df().collect()) == \
        [(1, "b"), (2, "d"), (3, "e")]
    # partial-column upsert with dups: last wins, untouched cols keep
    t.upsert(spark.createDataFrame([(3, "x"), (3, "y"), (4, "p"), (4, "q")],
                                   "k long, name string"))
    assert sorted((r["k"], r["name"], r["age"])
                  for r in t.to_df().collect()) == \
        [(1, "b", 11), (2, "d", 13), (3, "y", 14), (4, "q", None)]
    # a union-built batch: the later-unioned frame outranks the earlier
    t.upsert(spark.createDataFrame([(5, "old")], "k long, name string")
             .union(spark.createDataFrame([(5, "new")],
                                          "k long, name string")))
    assert t.to_df().filter("k = 5").select("name").collect()[0][0] == "new"
    # compaction preserves the collapsed state
    t.compaction(force=True)
    assert t.to_df().count() == 5


def test_duplicate_keys_feed_merge_operator_fold(spark, tmp_table_dir):
    """Merge-operator tables must see EVERY source row: in-batch
    duplicates are addends to the fold, not noise to collapse."""
    from starlake_spark.table import create_table

    df = spark.createDataFrame([(1, 10), (1, 11), (2, 5)],
                               "k long, age long")
    t = create_table(spark, df, tmp_table_dir,
                     hash_partitions=["k"], hash_bucket_num=2,
                     configuration={"compaction.merge_operators":
                                    '{"age": "sum"}'})
    t.upsert(spark.createDataFrame([(1, 100), (1, 200)],
                                   "k long, age long"))
    got = {r["k"]: r["age"] for r in t.to_df().collect()}
    assert got == {1: 321, 2: 5}


def test_cow_upsert_condition_scopes_rewrite(spark, tmp_table_dir):
    """Reference UpsertSuiteBase 'upsert with condition' (CoW mode):
    a range-partitioned table REQUIRES a range condition on the CoW
    path (upsertConditionNotFoundException); with one, only matching
    partitions rewrite, out-of-scope source rows are dropped, and
    untouched partitions keep their files."""
    import pytest
    from pyspark.sql import functions as F

    from starlake_spark.table import create_table

    df = spark.createDataFrame(
        [(20201101, 1, 1), (20201101, 2, 2), (20201101, 3, 3),
         (20201102, 4, 4)],
        "range int, hash int, value int")
    t = create_table(spark, df, tmp_table_dir,
                     range_partitions=["range"],
                     hash_partitions=["hash"], hash_bucket_num=2)
    src = spark.createDataFrame(
        [(20201101, 1, 11), (20201101, 3, 33), (20201102, 4, 44)],
        "range int, hash int, value int")
    with pytest.raises(ValueError, match="condition for range partition"):
        t.upsert(src, use_delta=False)
    before = {f.path for ps in t.store.snapshot().partitions.values()
              for f in ps.files if "range=20201102" in f.range_value}
    t.upsert(src, use_delta=False, condition="range = 20201101")
    got = sorted((r["range"], r["hash"], r["value"])
                 for r in t.to_df().collect())
    # 20201102 untouched: the out-of-scope source row (4 -> 44) dropped
    assert got == [(20201101, 1, 11), (20201101, 2, 2),
                   (20201101, 3, 33), (20201102, 4, 4)]
    after = {f.path for ps in t.store.snapshot().partitions.values()
             for f in ps.files if "range=20201102" in f.range_value}
    assert after == before, "out-of-scope partition must keep its files"
    # new partitions satisfying the condition may be created
    t.upsert(spark.createDataFrame([(20201103, 9, 9)],
                                   "range int, hash int, value int"),
             use_delta=False, condition="range >= 20201103")
    assert t.to_df().filter("range = 20201103").count() == 1
    # non-range columns cannot scope
    with pytest.raises(ValueError, match="range partition columns only"):
        t.upsert(src, use_delta=False, condition="value > 2")
    # allowFullTable opt-out mirrors ALLOW_FULL_TABLE_UPSERT
    t.set_properties({"upsert.allowFullTable": "true"})
    t.upsert(src, use_delta=False)
    assert t.to_df().filter("hash = 4").collect()[0]["value"] == 44


def test_schema_widening_upcast_on_write(spark, tmp_path):
    """Reference SchemaUtilsSuite 'mergeSchemas performs upcast between
    ByteType, ShortType, and LongType': a strictly wider source type in
    the same numeric family widens the declared schema (old narrow
    files read through parquet type promotion); narrower sources still
    cast up; hash columns refuse to widen (bucket hashes the stored
    type); autoMerge=false refuses."""
    import pyspark.sql.types as T
    import pytest
    from pyspark.sql import functions as F

    from starlake_spark.table import create_table

    df = spark.createDataFrame([(1, 10), (2, 20)], "k long, v int")
    t = create_table(spark, df, str(tmp_path / "t"),
                     hash_partitions=["k"], hash_bucket_num=2)
    t.upsert(spark.createDataFrame([(3, 5_000_000_000)], "k long, v long"))
    out = t.to_df()
    assert out.schema["v"].dataType == T.LongType()
    assert sorted((r.k, r.v) for r in out.collect()) == \
        [(1, 10), (2, 20), (3, 5_000_000_000)]
    t.compaction(force=True)
    assert sorted((r.k, r.v) for r in t.to_df().collect()) == \
        [(1, 10), (2, 20), (3, 5_000_000_000)]
    # float -> double widens too
    t.upsert(spark.createDataFrame([(4, 1)], "k long, v int")
             .withColumn("w", F.lit(1.5).cast("float")))
    t.upsert(spark.createDataFrame([(5, 1)], "k long, v int")
             .withColumn("w", F.lit(3.14).cast("double")))
    assert t.to_df().schema["w"].dataType == T.DoubleType()
    # hash column widening refused
    t2 = create_table(spark,
                      spark.createDataFrame([(1, 1)], "k int, v int"),
                      str(tmp_path / "t2"),
                      hash_partitions=["k"], hash_bucket_num=2)
    with pytest.raises(ValueError, match="hash partition"):
        t2.upsert(spark.createDataFrame([(9_000_000_000, 1)],
                                        "k long, v int"))
    # autoMerge=false refuses widening
    t3 = create_table(spark,
                      spark.createDataFrame([(1, 1)], "k long, v int"),
                      str(tmp_path / "t3"),
                      hash_partitions=["k"], hash_bucket_num=2,
                      configuration={"schema.autoMerge.enabled": "false"})
    with pytest.raises(ValueError, match="autoMerge"):
        t3.upsert(spark.createDataFrame([(2, 5_000_000_000)],
                                        "k long, v long"))
