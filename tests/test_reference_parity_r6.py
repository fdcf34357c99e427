"""Round-7 reference-test mining: DataFrameWriterV2Suite.scala:76-456
and DDLUsingPathSuite.scala:33-134, ported case-for-case.

Spark's catalog-based ``df.writeTo`` can't dispatch into a Python data
source, so the builder surface is ``starlake_spark.write_to(spark, df,
ident)`` / ``StarSession.write_to`` — every suite case is ported to
that spelling with the reference's refusal messages.

Divergences (documented, not silent):
- ``overwritePartitions()`` on a RANGE-PARTITIONED table performs a
  real dynamic partition overwrite (superset — the reference refuses
  all dynamic overwrites); unpartitioned tables still refuse with the
  reference's message shape.
- ``saveAsTable("n")`` (catalog write path) is spelled
  ``option("shortTableName", "n")`` on a format('star') save, or
  ``create_table(short_name=...)``; the V2 create below registers the
  name the same way.
"""

import pytest
from pyspark.sql import Row, functions as F

from starlake_spark import sources
from starlake_spark.sql import StarSession


@pytest.fixture(scope="module", autouse=True)
def _register(spark):
    sources.register(spark)


@pytest.fixture()
def ss(spark, tmp_path):
    return StarSession(spark, warehouse=str(tmp_path / "wh"))


@pytest.fixture()
def source(spark):
    return spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                                 "id long, data string")


@pytest.fixture()
def source2(spark):
    return spark.createDataFrame([(4, "d"), (5, "e"), (6, "f")],
                                 "id long, data string")


def _rows(ss, name="table_name"):
    df = ss.sql(f"SELECT id, data FROM {name}")
    return sorted((r.id, r.data) for r in df.collect())


# --------------------------------------------------------------------------
# DataFrameWriterV2Suite — append
# --------------------------------------------------------------------------

def test_append_basic(ss, source, source2):
    """:76-92 'Append: basic append'."""
    ss.sql("CREATE TABLE table_name (id bigint, data string) USING star")
    assert _rows(ss) == []
    ss.write_to(source, "table_name").append()
    assert _rows(ss) == [(1, "a"), (2, "b"), (3, "c")]
    ss.write_to(source2, "table_name").append()
    assert _rows(ss) == [(1, "a"), (2, "b"), (3, "c"),
                         (4, "d"), (5, "e"), (6, "f")]


def test_append_by_name_not_position(ss, source):
    """:94-108 'Append: by name not position'."""
    ss.sql("CREATE TABLE table_name (id bigint, data string) USING star")
    with pytest.raises(ValueError, match="schema mismatch"):
        ss.write_to(source.withColumnRenamed("data", "d"),
                    "table_name").append()
    assert _rows(ss) == []


def test_append_fail_if_table_does_not_exist(ss, source):
    """:110-116."""
    with pytest.raises(ValueError, match="table_name"):
        ss.write_to(source, "table_name").append()


# --------------------------------------------------------------------------
# DataFrameWriterV2Suite — overwrite
# --------------------------------------------------------------------------

def test_overwrite_by_expression_true(ss, source, source2):
    """:118-135 'Overwrite: overwrite by expression: true'."""
    ss.sql("CREATE TABLE table_name (id bigint, data string) USING star "
           "PARTITIONED BY (id)")
    ss.write_to(source, "table_name").append()
    assert _rows(ss) == [(1, "a"), (2, "b"), (3, "c")]
    ss.write_to(source2, "table_name").overwrite(F.lit(True))
    assert _rows(ss) == [(4, "d"), (5, "e"), (6, "f")]


def test_overwrite_by_expression_id_eq_3(ss, source, source2):
    """:137-157: source2's rows all fall outside id = 3 — refused with
    the reference's message, table unchanged."""
    ss.sql("CREATE TABLE table_name (id bigint, data string) USING star "
           "PARTITIONED BY (id)")
    ss.write_to(source, "table_name").append()
    with pytest.raises(ValueError,
                       match="Invalid data would be written to partitions"):
        ss.write_to(source2, "table_name").overwrite("id = 3")
    assert _rows(ss) == [(1, "a"), (2, "b"), (3, "c")]


def test_overwrite_by_name_not_position(ss, source):
    """:159-174."""
    ss.sql("CREATE TABLE table_name (id bigint, data string) USING star")
    with pytest.raises(ValueError, match="schema mismatch"):
        ss.write_to(source.withColumnRenamed("data", "d"),
                    "table_name").overwrite(F.lit(True))
    assert _rows(ss) == []


def test_overwrite_fail_if_table_does_not_exist(ss, source):
    """:176-182."""
    with pytest.raises(ValueError, match="table_name"):
        ss.write_to(source, "table_name").overwrite(F.lit(True))


# --------------------------------------------------------------------------
# DataFrameWriterV2Suite — overwritePartitions
# --------------------------------------------------------------------------

def test_overwrite_partitions_dynamic_superset(ss, source, source2):
    """:184-205 'overwrite conflicting partitions' — DIVERGENCE: the
    reference refuses dynamic overwrite outright; this engine performs
    it (Spark/Delta partitionOverwriteMode=dynamic), so the case
    asserts the real semantics: only partitions present in the new
    data are replaced."""
    ss.sql("CREATE TABLE table_name (id bigint, data string) USING star "
           "PARTITIONED BY (id)")
    ss.write_to(source, "table_name").append()
    ss.write_to(source2.withColumn("id", F.col("id") - 2),
                "table_name").overwritePartitions()
    assert _rows(ss) == [(1, "a"), (2, "d"), (3, "e"), (4, "f")]


def test_overwrite_partitions_unpartitioned_refuses(ss, source, source2):
    """:207-222: unpartitioned dynamic overwrite degenerates to a full
    overwrite — refused with the reference's message shape."""
    ss.sql("CREATE TABLE table_name (id bigint, data string) USING star")
    ss.write_to(source, "table_name").append()
    with pytest.raises(ValueError,
                       match="does not support dynamic overwrite"):
        ss.write_to(source2, "table_name").overwritePartitions()
    assert _rows(ss) == [(1, "a"), (2, "b"), (3, "c")]


def test_overwrite_partitions_by_name_refusal_precedes_schema(ss, source):
    """:224-239: the refusal fires before the by-name schema check,
    exactly as the reference (its message is the same for both)."""
    ss.sql("CREATE TABLE table_name (id bigint, data string) USING star")
    with pytest.raises(ValueError,
                       match="does not support dynamic overwrite"):
        ss.write_to(source.withColumnRenamed("data", "d"),
                    "table_name").overwritePartitions()
    assert _rows(ss) == []


def test_overwrite_partitions_fail_if_table_does_not_exist(ss, source):
    """:241-247."""
    with pytest.raises(ValueError, match="table_name"):
        ss.write_to(source, "table_name").overwritePartitions()


# --------------------------------------------------------------------------
# DataFrameWriterV2Suite — create / replace
# --------------------------------------------------------------------------

def test_create_basic(ss, source):
    """:249-277 'Create: basic behavior' / 'Create: with using'."""
    ss.write_to(source, "table_name").using("star").create()
    assert _rows(ss) == [(1, "a"), (2, "b"), (3, "c")]
    t = ss.table("table_name")
    assert [c for c in t.to_df().columns] == ["id", "data"]
    assert t.info.range_cols == [] and t.info.hash_cols == []


def test_create_identity_partitioned(ss, source):
    """:279-293: partition column moves LAST in the created schema."""
    ss.write_to(source, "table_name").using("star") \
        .partitionedBy("id").create()
    assert _rows(ss) == [(1, "a"), (2, "b"), (3, "c")]
    t = ss.table("table_name")
    assert t.to_df().columns == ["data", "id"]
    assert t.info.range_cols == ["id"]


def test_create_fail_if_exists(ss, source):
    """:295-312: create on an existing name refuses; table unchanged."""
    ss.sql("CREATE TABLE table_name (id bigint, data string) USING star "
           "PARTITIONED BY (id)")
    with pytest.raises(ValueError, match="table_name.*already exists"):
        ss.write_to(source, "table_name").using("star").create()
    t = ss.table("table_name")
    assert t.info.range_cols == ["id"]
    assert t.to_df().columns == ["data", "id"]  # partition col last
    assert _rows(ss) == []


def test_replace_not_supported(ss, source, source2):
    """:314-338 'Replace: not support'."""
    ss.sql("CREATE TABLE table_name (id bigint, data string) USING star "
           "PARTITIONED BY (id)")
    ss.sql("INSERT INTO TABLE table_name SELECT data, id FROM "
           "(SELECT id, data FROM source_v)")
    with pytest.raises(ValueError,
                       match="`replaceTable` is not supported for Star"):
        ss.write_to(
            source2.withColumn(
                "even_or_odd",
                F.when((F.col("id") % 2) == 0, "even").otherwise("odd")),
            "table_name").using("star").replace()


def test_create_or_replace_fails_when_exists(ss, source, source2):
    """:340-350 'CreateOrReplace: failed when table exist'."""
    ss.write_to(source, "table_name").using("star").createOrReplace()
    assert _rows(ss) == [(1, "a"), (2, "b"), (3, "c")]
    with pytest.raises(ValueError,
                       match="`replaceTable` is not supported for Star"):
        ss.write_to(source2, "table_name").using("star").createOrReplace()


@pytest.mark.parametrize("transform", ["years(ts)", "months(ts)",
                                       "days(ts)", "hours(ts)"])
def test_create_partitioned_by_transform_not_supported(ss, source, transform):
    """:352-398 partitioned by years/months/days/hours — refused."""
    with pytest.raises(ValueError, match="Partitioning by expressions"):
        ss.write_to(
            source.withColumn(
                "ts", F.lit("2019-06-01 10:00:00.000000").cast("timestamp")),
            "table_name").partitionedBy(transform).using("star").create()


def test_create_partitioned_by_bucket_not_supported(ss, source):
    """:400-409 partitioned by bucket(4, id) — refused."""
    with pytest.raises(ValueError, match="Bucketing"):
        ss.write_to(source, "table_name") \
            .partitionedBy("bucket(4, id)").using("star").create()


def test_append_basic_by_path(ss, source):
    """:418-430 'Append: basic append by path'."""
    ss.sql("CREATE TABLE table_name (id bigint, data string) USING star")
    location = ss.table("table_name").store.table_path
    ss.write_to(source, f"star.`{location}`").append()
    got = ss.sql(f"SELECT id, data FROM star.`{location}`")
    assert sorted((r.id, r.data) for r in got.collect()) == \
        [(1, "a"), (2, "b"), (3, "c")]


def test_create_by_path_refused(ss, source, tmp_path):
    """:432-440 'short table name can't be a path'."""
    d = str(tmp_path / "somedir")
    with pytest.raises(ValueError,
                       match="Short Table name.*can't be a path"):
        ss.write_to(source, f"star.`{d}`").using("star").create()


def test_create_using_empty_dataframe(ss, source):
    """:442-454 'Create: using empty dataframe'."""
    ss.write_to(source.where("false"), "table_name").using("star") \
        .partitionedBy("id").create()
    t = ss.table("table_name")
    assert t.to_df().count() == 0
    assert t.to_df().columns == ["data", "id"]
    assert t.info.range_cols == ["id"]


def test_create_with_hash_partitions_via_table_property(ss, source):
    """Hash bucketing rides tableProperty (the reference routes PK
    declaration through table properties too; CLUSTERED BY is refused
    — NotSupportedDDLSuite)."""
    ss.write_to(source, "table_name").using("star") \
        .tableProperty("hashPartitions", "id") \
        .tableProperty("hashBucketNum", "4").create()
    t = ss.table("table_name")
    assert t.info.hash_cols == ["id"] and t.info.bucket_num == 4
    ss.write_to(
        ss.spark.createDataFrame([(1, "A")], "id long, data string"),
        "table_name").append()  # append to PK table upserts by key
    assert _rows(ss) == [(1, "A"), (2, "b"), (3, "c")]


# --------------------------------------------------------------------------
# DDLUsingPathSuite
# --------------------------------------------------------------------------

@pytest.fixture()
def path_table(ss, spark, tmp_path):
    """The suite's fixture table: (v1 int, v2 string, struct{x,y}),
    created at an explicit path and registered as star_test
    (:33-47)."""
    df = spark.createDataFrame([(1, "a"), (2, "b")], "v1 int, v2 string") \
        .withColumn("struct", F.struct(
            (F.col("v1") * 10).alias("x"),
            F.concat(F.col("v2"), F.col("v2")).alias("y")))
    p = str(tmp_path / "path_table")
    ss.create_table(df, p, name="star_test")
    return p


def test_select_using_path(ss, path_table):
    """:89-111 SELECT via name and via star.`path` agree."""
    expected = [(1, "a", Row(x=10, y="aa")), (2, "b", Row(x=20, y="bb"))]
    for ident in ("star_test", f"star.`{path_table}`"):
        got = sorted((r.v1, r.v2, r.struct)
                     for r in ss.sql(f"SELECT * FROM {ident}").collect())
        assert got == expected


def test_select_using_path_in_star_database(ss, spark, tmp_path):
    """:48-66 the `star`.`star_test` database-qualified spelling."""
    df = spark.createDataFrame([(1, "a")], "v1 int, v2 string")
    ss.create_table(df, str(tmp_path / "dbt"), name="star.star_test")
    got = ss.sql("SELECT * FROM `star`.`star_test`").collect()
    assert [(r.v1, r.v2) for r in got] == [(1, "a")]


def test_select_nonexistent_path_errors(ss):
    """:100-103 star.`/path/to/star` that isn't a table."""
    with pytest.raises(ValueError, match=r"/path/to/star doesn't exist"):
        ss.sql("SELECT * FROM star.`/path/to/star`")


def test_describe_using_path(ss, path_table):
    """:113-129 DESCRIBE / DESCRIBE EXTENDED via name and path."""
    for ident in ("star_test", f"star.`{path_table}`"):
        rows = {r.col_name: r.data_type
                for r in ss.sql(f"DESCRIBE {ident}").collect()}
        assert rows["v1"] == "int"
        assert rows["v2"] == "string"
        assert rows["struct"] == "struct<x:int,y:string>"
        ext = {r.col_name: r.data_type
               for r in ss.sql(f"DESCRIBE EXTENDED {ident}").collect()}
        assert ext["Provider"] == "star"
        assert ext["Location"] == path_table
        assert ext["v1"] == "int"


def test_dml_using_path(ss, spark, tmp_path):
    """Beyond the suite: the path identifier works uniformly across
    statement forms (UPDATE / DELETE / COMPACT route through the same
    expansion)."""
    df = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")],
                               "v1 int, v2 string")
    p = str(tmp_path / "dml_t")
    ss.create_table(df, p)
    ss.sql(f"UPDATE star.`{p}` SET v2 = 'z' WHERE v1 = 1")
    ss.sql(f"DELETE FROM star.`{p}` WHERE v1 = 2")
    got = sorted((r.v1, r.v2)
                 for r in ss.sql(f"SELECT * FROM star.`{p}`").collect())
    assert got == [(1, "z"), (3, "c")]


@pytest.fixture(autouse=True)
def _source_view(spark, source):
    source.createOrReplaceTempView("source_v")
    yield
