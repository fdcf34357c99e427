"""Differential test for the applyInPandasWithState sessionizer: the
closed sessions emitted by the stream must equal the batch twin's
sessions on identical input (minus sessions still open at end of
stream)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F, types as T

from starlake_spark.streaming.stateful import (
    sessionize_batch_oracle,
    sessionize_stream,
)

BASE = dt.datetime(2026, 1, 1, 0, 0, 0)
GAP_S = 600.0  # 10 min session gap

EVENT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("ts", T.TimestampType(), False),
    T.StructField("event_type", T.StringType(), False),
    T.StructField("value", T.DoubleType(), False),
])


def _mk_events():
    """3 users, 2 sessions each, unique ts per user, integral values."""
    rows = []
    for u in (1, 2, 3):
        t0 = BASE + dt.timedelta(minutes=u)
        # session 1: 3 events 1 min apart
        for i, et in enumerate(["view", "click", "view"]):
            rows.append((u, t0 + dt.timedelta(minutes=i), et, float(u * 10 + i)))
        # session 2: 2 events, 30 min later (> gap)
        t1 = t0 + dt.timedelta(minutes=45)
        for i, et in enumerate(["buy", "view"]):
            rows.append((u, t1 + dt.timedelta(minutes=i), et, float(u * 100 + i)))
    return rows


@pytest.fixture()
def event_batches(tmp_path):
    """Events split into 3 time-ordered parquet files + a watermark
    sentinel far in the future (closes every real session)."""
    rows = sorted(_mk_events(), key=lambda r: r[1])
    k = len(rows) // 3
    batches = [rows[:k], rows[k:2 * k], rows[2 * k:]]
    batches.append([(99, BASE + dt.timedelta(days=2), "sentinel", 0.0)])
    return batches


def test_stream_sessions_match_batch_oracle(spark, tmp_path, event_batches):
    src = tmp_path / "src"
    src.mkdir()
    for i, batch in enumerate(event_batches):
        spark.createDataFrame(batch, EVENT_SCHEMA).coalesce(1) \
            .write.parquet(str(src / f"b{i}"))

    stream = (spark.readStream.schema(EVENT_SCHEMA)
              .option("maxFilesPerTrigger", "1")
              .parquet(str(src) + "/*"))
    out = sessionize_stream(stream, gap_s=GAP_S, watermark="0 seconds")
    q = (out.writeStream.format("parquet")
         .option("path", str(tmp_path / "out"))
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = (spark.read.parquet(str(tmp_path / "out"))
           .orderBy("user_id", "session_start").collect())

    all_rows = [r for b in event_batches for r in b]
    events = spark.createDataFrame(all_rows, EVENT_SCHEMA)
    want_df = sessionize_batch_oracle(events, gap_s=GAP_S)
    # the sentinel user's session never closes (nothing advances the
    # watermark past it) — exclude it from the expectation
    want = (want_df.filter(F.col("user_id") != 99)
            .orderBy("user_id", "session_start").collect())

    assert len(got) == len(want) == 6
    for g, w in zip(got, want):
        assert g["user_id"] == w["user_id"]
        assert g["session_start"] == w["session_start"]
        assert g["session_end"] == w["session_end"]
        assert g["n_events"] == w["n_events"]
        assert g["n_types"] == w["n_types"]
        assert g["total_value"] == w["total_value"]
        assert g["first_type"] == w["first_type"]
        assert g["last_type"] == w["last_type"]


def test_batch_oracle_shapes(spark):
    events = spark.createDataFrame(_mk_events(), EVENT_SCHEMA)
    sess = sessionize_batch_oracle(events, gap_s=GAP_S)
    rows = sess.orderBy("user_id", "session_start").collect()
    assert len(rows) == 6  # 3 users x 2 sessions
    first = rows[0]
    assert first["n_events"] == 3 and first["n_types"] == 2
    assert first["first_type"] == "view" and first["last_type"] == "view"

def test_dedup_ingest_sink_blocks_cross_batch_near_dupes(spark, tmp_path):
    """Dedup-on-ingest: batch 2's exact re-delivery and near-duplicate
    of batch 1 content never land; novel docs do; retries skip."""
    from pyspark.sql import functions as F

    from starlake_spark.meta import ManifestStore
    from starlake_spark.streaming.sink import DedupIngestSink
    from starlake_spark.table import create_table

    t = create_table(
        spark,
        spark.createDataFrame([], "doc_id long, text string"),
        str(tmp_path / "corpus"),
        hash_partitions=["doc_id"], hash_bucket_num=2,
        configuration={"compaction.auto": "false"})
    sink = DedupIngestSink(ManifestStore(str(tmp_path / "corpus")), "ingest",
                           threshold=0.5)
    b1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog tonight"),
         (2, "completely unrelated sentence about database engines here")],
        ["doc_id", "text"])
    assert sink.write_batch(b1, 0)
    b2 = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog tonight"),   # exact re-crawl
         (11, "the quick brown fox jumps over the lazy dog today"),     # near-dup
         (12, "a genuinely novel document with entirely fresh content")],
        ["doc_id", "text"])
    assert sink.write_batch(b2, 1)
    assert not sink.write_batch(b2, 1)  # retry skipped
    ids = sorted(r["doc_id"] for r in t.to_df().collect())
    assert ids == [1, 2, 12], ids


def test_dedup_ingest_sink_persisted_band_index(spark, tmp_path):
    """The sink's band index is persisted and incrementally appended:
    wave 2's sync commit bands ONLY the docs wave 2 landed — wave-1
    docs are never re-shingled (the corpus text column is read once
    per doc across the sink's lifetime, the 100 TB contract)."""
    from starlake_spark.meta import ManifestStore
    from starlake_spark.operators import reader
    from starlake_spark.sources.datasource import table_changes
    from starlake_spark.streaming.sink import DedupIngestSink
    from starlake_spark.table import create_table

    t = create_table(
        spark,
        spark.createDataFrame([], "doc_id long, text string"),
        str(tmp_path / "corpus"),
        hash_partitions=["doc_id"], hash_bucket_num=2,
        configuration={"compaction.auto": "false"})
    sink = DedupIngestSink(ManifestStore(str(tmp_path / "corpus")), "ingest",
                           threshold=0.5)
    b1 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (2, "one two three four five six seven eight nine ten eleven")],
        ["doc_id", "text"])
    assert sink.write_batch(b1, 0)
    idx_store = ManifestStore(sink.index_path)
    idx1 = reader.scan(spark, idx_store)
    # per doc: `bands` band rows + 1 signature sentinel
    assert idx1.filter("band >= 0").count() == 2 * sink.bands
    assert idx1.filter("band = -1 AND sig IS NOT NULL").count() == 2
    v_after_w1 = idx_store.latest_version()

    b2 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # recrawl
         (11, "totally novel words nowhere else written under this sky")],
        ["doc_id", "text"])
    assert sink.write_batch(b2, 1)
    assert sorted(r["doc_id"] for r in t.to_df().collect()) == [1, 2, 11]
    # wave-2 sync bands exactly the landed novel doc — nothing rebuilt
    fresh = table_changes(spark, sink.index_path, start_version=v_after_w1,
                          ignore_deletes=True)
    assert set(r["doc_id"] for r in fresh.collect()) == {11}
    # a restarted sink (fresh object) reuses the persisted index as-is
    sink2 = DedupIngestSink(ManifestStore(str(tmp_path / "corpus")), "ingest2",
                            threshold=0.5)
    b3 = spark.createDataFrame(
        [(20, "one two three four five six seven eight nine ten eleven")],
        ["doc_id", "text"])
    assert sink2.write_batch(b3, 0)
    assert sorted(r["doc_id"] for r in t.to_df().collect()) == [1, 2, 11]
    # blocked wave added no index rows — still only wave-1/2 docs banded
    fresh3 = table_changes(spark, sink.index_path, start_version=v_after_w1,
                           ignore_deletes=True)
    assert set(r["doc_id"] for r in fresh3.collect()) == {11}
