"""ALTER TABLE commands (alterTableCommands.scala:58-374 analogues) and
multimodal column plumbing."""

import pytest
from pyspark.sql import functions as F, types as T

from starlake_spark.table import create_table

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def orders_t(spark, tmp_path):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    return create_table(spark, orders, str(tmp_path / "orders_t"),
                        hash_partitions=["o_orderkey"], hash_bucket_num=4)


def test_add_columns_scan_fills_null_and_writes_carry_it(orders_t, spark):
    n0 = orders_t.to_df().count()
    orders_t.add_columns([("discount_pct", "double")])
    df = orders_t.to_df()
    assert "discount_pct" in df.columns
    assert df.filter(F.col("discount_pct").isNull()).count() == n0
    # new writes can populate the evolved column
    delta = (orders_t.to_df().limit(10).drop("discount_pct")
             .withColumn("discount_pct", F.lit(5.0)))
    orders_t.upsert(delta)
    assert orders_t.to_df().filter(F.col("discount_pct") == 5.0).count() == 10
    assert orders_t.to_df().count() == n0


def test_add_column_rejects_dup_and_nonnullable(orders_t):
    with pytest.raises(ValueError):
        orders_t.add_columns([("o_orderkey", "long")])
    with pytest.raises(ValueError):
        orders_t.add_columns(T.StructType([T.StructField("x", T.IntegerType(), False)]))


def test_change_column_type_widening_only(orders_t):
    orders_t.add_columns([("small_col", "int")])
    orders_t.change_column_type("small_col", "long")
    schema = orders_t.to_df().schema
    assert dict((f.name, f.dataType.simpleString()) for f in schema)["small_col"] == "bigint"
    with pytest.raises(ValueError):
        orders_t.change_column_type("small_col", "int")  # narrowing
    with pytest.raises(KeyError):
        orders_t.change_column_type("nope", "long")


def test_set_unset_properties(orders_t):
    orders_t.set_properties({"comment": "hello", "owner": "me"})
    assert orders_t.info.configuration["comment"] == "hello"
    orders_t.unset_properties(["comment"])
    assert "comment" not in orders_t.info.configuration
    assert orders_t.info.configuration["owner"] == "me"


# ---------------------------------------------------------------------------
# multimodal
# ---------------------------------------------------------------------------


def test_image_features_kernel(spark):
    from starlake_spark.functions import multimodal as mm
    import hashlib

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    d = docs.select(F.col("doc_id").alias("item_id"),
                    F.encode(F.col("text"), "UTF-8").alias("payload"))
    out = mm.image_features(d).collect()
    assert len(out) == 20
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        payload = raw[r.item_id].encode()
        assert r.n_bytes == len(payload)
        assert r.sha256 == hashlib.sha256(payload).hexdigest()
        assert 0 <= r.mean_byte <= 255
        assert r.decoder == "fake-bytes"


def test_frame_sample_plan_prunes_binary(spark):
    from starlake_spark.functions import multimodal as mm

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(5)
    d = docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(F.lit(640).alias("width"), F.lit(480).alias("height"),
                 F.lit(30.0).alias("fps"),
                 F.col("n_chars").cast("long").alias("n_frames"),
                 F.lit("fake").alias("format")).alias("video_meta"),
    )
    plan_df = mm.frame_sample_plan(d, every_n=30)
    rows = plan_df.collect()
    metas = {r["doc_id"]: r["n_chars"] for r in docs.collect()}
    for item_id, n_frames in metas.items():
        expected = list(range(0, max(n_frames - 1, 0) + 1, 30)) or [0]
        got = sorted(r.frame_no for r in rows if r.item_id == item_id)
        assert got == expected, (item_id, n_frames)
    # binary payload column must be pruned from the physical scan
    phys = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in phys


def test_resize_stub_schema(spark):
    from starlake_spark.functions import multimodal as mm

    d = spark.createDataFrame(
        [(1, b"abcdef" * 100), (2, b"")],
        T.StructType([T.StructField("item_id", T.LongType()),
                      T.StructField("payload", T.BinaryType())]))
    out = mm.resize_stub(d, width=10, height=10)
    rows = {r.item_id: r for r in out.collect()}
    assert rows[1].out_w == 10 and len(rows[1].resized) == 100
    assert len(rows[2].resized) == 1  # padded floor


def test_audio_features_kernel(spark):
    from starlake_spark.functions import multimodal as mm
    import hashlib
    import math

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
    d = docs.select(
        F.col("doc_id").alias("item_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(F.lit(16000).alias("sample_rate"),
                 F.col("n_chars").cast("long").alias("n_samples"),
                 F.lit(1).alias("channels"),
                 F.lit("fake-pcm").alias("format")).alias("audio_meta"),
    )
    out = mm.audio_features(d).collect()
    assert len(out) == 20
    raw = {r["doc_id"]: (r["text"], r["n_chars"]) for r in docs.collect()}
    for r in out:
        text, n_chars = raw[r.item_id]
        payload = text.encode()
        assert r.n_bytes == len(payload)
        assert r.sha256 == hashlib.sha256(payload).hexdigest()
        assert math.isclose(r.duration_s, n_chars / 16000.0)
        assert r.rms_byte > 0 or not payload
        assert r.decoder == "fake-bytes"


def test_audio_features_empty_payload(spark):
    import pandas as pd
    from starlake_spark.functions import multimodal as mm

    d = spark.createDataFrame(pd.DataFrame({"item_id": [1]})).select(
        "item_id", F.lit(None).cast("binary").alias("payload"),
        F.struct(F.lit(0).alias("sample_rate"), F.lit(0).cast("long").alias("n_samples"),
                 F.lit(1).alias("channels"), F.lit("x").alias("format")).alias("audio_meta"))
    r = mm.audio_features(d).collect()[0]
    assert (r.n_bytes, r.duration_s, r.rms_byte) == (0, 0.0, 0.0)


def test_drop_column_logical_then_physical(spark, tmp_path):
    """DROP COLUMN: logical immediately (schema projection hides bytes),
    physical after compaction; re-adding the name is blocked until the
    bytes are really gone (no column-id mapping)."""
    import pytest as _pt

    from starlake_spark.table import create_table

    df = spark.createDataFrame([(1, "a", 10), (2, "b", 20)],
                               "id int, name string, value int")
    t = create_table(spark, df, str(tmp_path / "t"),
                     hash_partitions=["id"], hash_bucket_num=2)
    t.drop_columns(["name"])
    assert [f.name for f in t.to_df().schema.fields] == ["id", "value"]
    # upsert without the dropped column works; MoR read stays clean
    t.upsert(spark.createDataFrame([(1, 99)], "id int, value int"))
    assert {r["id"]: r["value"] for r in t.to_df().collect()} == {1: 99, 2: 20}
    # blocked re-add while old bytes live
    with _pt.raises(ValueError, match="compaction"):
        t.add_columns([("name", "string")])
    t.compaction(force=True)
    t.add_columns([("name", "string")])  # now legal
    vals = {r["id"]: r["name"] for r in t.to_df().collect()}
    assert vals == {1: None, 2: None}  # old bytes did NOT resurrect


def test_drop_column_guards(spark, tmp_path):
    import pytest as _pt

    from starlake_spark.table import create_table

    df = spark.createDataFrame([(1, "a", 10)], "id int, name string, value int")
    t = create_table(spark, df, str(tmp_path / "t"),
                     hash_partitions=["id"], hash_bucket_num=2)
    with _pt.raises(ValueError, match="partition/hash"):
        t.drop_columns(["id"])
    t.add_constraint("v_pos", "value >= 0")
    with _pt.raises(ValueError, match="CHECK"):
        t.drop_columns(["value"])
    with _pt.raises(ValueError, match="no such column"):
        t.drop_columns(["ghost"])


def test_drop_column_sql_route(spark, tmp_path):
    from starlake_spark.sql import StarSession

    ss = StarSession(spark, warehouse=str(tmp_path / "wh"))
    spark.createDataFrame([(1, "x", 5)], "id int, c string, v int") \
        .createOrReplaceTempView("_dropsrc")
    ss.sql(f"CREATE TABLE dc_t USING star OPTIONS (hashPartitions = 'id', "
           f"hashBucketNum = '2') LOCATION '{tmp_path}/dc_t' AS SELECT * FROM _dropsrc")
    ss.sql("ALTER TABLE dc_t DROP COLUMN c")
    assert [f.name for f in ss.sql("SELECT * FROM dc_t").schema.fields] == ["id", "v"]
