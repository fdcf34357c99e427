"""Structured-streaming sink with exactly-once micro-batch commits.

Reference parity: sources/StarLakeSink.scala:30-96 + the per-(table,
query) batch registry of meta/StreamingRecord.scala:22-114. The
idiomatic Spark translation (SURVEY §2.7) is ``writeStream.foreachBatch``
with an idempotent batch check:

* a batch is skipped iff ``batch_id <= last committed batch_id`` for
  this (table, query_id) — replays after failure are no-ops
  (StarLakeSink.scala:60-63);
* the batch registry update rides **inside the same manifest commit**
  as the data files, so data+progress are atomic exactly like the
  reference's undo-log carrying query_id/batch_id
  (TransactionCommit.scala:372-377);
* output modes (StarLakeSink.scala:38-47,66-85): append = plain append
  (delta commit for hash tables), complete = overwrite, update = delta
  upsert, hash-partitioned tables only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from starlake_spark.meta import DuplicateTxnError, ManifestStore
from starlake_spark.operators import dml, writer


class StarStreamSink:
    def __init__(self, store: ManifestStore, query_id: str, output_mode: str = "append"):
        info = store.table_info()
        if output_mode == "update" and not info.hash_cols:
            raise ValueError("update mode requires hash partitions "
                             "(StarLakeDataSource.scala:68-72)")
        if output_mode == "append" and info.hash_cols:
            # hash tables dedup by key → every batch is a delta upsert
            output_mode = "update"
        self.store = store
        self.query_id = query_id
        self.output_mode = output_mode

    def last_batch_id(self) -> int:
        return self.store.snapshot().streaming.get(self.query_id, -1)

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Idempotent micro-batch write; returns False if skipped."""
        if batch_id <= self.last_batch_id():
            return False
        spark = batch_df.sparkSession
        info = dml.maybe_merge_schema(batch_df, self.store)
        txn = self.store.new_transaction()
        is_base = self.output_mode == "complete"
        files = writer.write_files(spark, batch_df, info, txn,
                                   is_base=is_base)
        if self.output_mode == "complete":
            for rv in txn.read_snapshot.partitions:
                txn.expire_partition(rv)
        txn.add_files(files)
        txn.set_streaming_batch(self.query_id, batch_id)
        try:
            self.store.commit(txn)
        except DuplicateTxnError:
            # a concurrent retry of the same batch won the lock first —
            # its commit IS this batch; files written here are orphans
            # that cleanup() collects
            return False
        return True

    def foreach_batch(self):
        """Callable for df.writeStream.foreachBatch(...)."""
        return lambda batch_df, batch_id: self.write_batch(batch_df, batch_id)


def write_stream(
    stream_df: DataFrame,
    table_path: str,
    query_id: str,
    output_mode: str = "append",
    trigger_available_now: bool = True,
    checkpoint_dir: str | None = None,
    spark_output_mode: str | None = None,
):
    """Start a streaming write into a star table; returns the query.

    ``trigger_available_now=True`` drains all available input then
    stops — the batch-pipeline-over-streaming-API pattern.
    ``spark_output_mode`` is Spark's upstream mode for stateful
    operators (e.g. "update" so a windowed agg emits per-batch updates
    that our sink then upserts by key); ``output_mode`` is the SINK's
    commit mode (append / complete / update)."""
    sink = StarStreamSink(ManifestStore(table_path), query_id, output_mode)
    w = stream_df.writeStream.foreachBatch(sink.foreach_batch())
    if spark_output_mode:
        w = w.outputMode(spark_output_mode)
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


class DedupIngestSink(StarStreamSink):
    """Dedup-on-ingest: each micro-batch is (1) exact-deduped within
    itself, (2) near-dedup'd AGAINST the table's current contents via
    the cross-corpus banded-MinHash join (functions.dedup.
    minhash_dedup_against), then (3) upserted exactly-once. The
    standard continuous-crawl shape: the corpus only ever grows by
    novel documents, and re-delivered or re-crawled near-duplicates
    never land.

    Batch-vs-table candidate generation scales as the batch's band
    table joined against the corpus band table; at 100 TB the corpus
    side is a PERSISTED band index maintained per wave — here it is
    derived from the table contents each batch, which is the correct
    semantics and the simple form of the same plan."""

    def __init__(self, store: ManifestStore, query_id: str,
                 id_col: str = "doc_id", text_col: str = "text",
                 threshold: float = 0.8, num_hashes: int = 64,
                 bands: int = 16, shingle_n: int = 3):
        super().__init__(store, query_id, output_mode="update")
        self.id_col, self.text_col = id_col, text_col
        self.threshold, self.num_hashes = threshold, num_hashes
        self.bands, self.shingle_n = bands, shingle_n

    def write_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        from starlake_spark.functions import dedup as dd
        from starlake_spark.operators import reader

        if batch_id <= self.last_batch_id():
            return False
        spark = batch_df.sparkSession
        # within-batch exact dedup first (cheap, shrinks the band join)
        batch = dd.dedup_exact_text(batch_df, self.text_col, self.id_col)
        existing = reader.scan(spark, self.store).select(
            self.id_col, self.text_col)
        if existing.limit(1).count() > 0:
            batch = dd.minhash_dedup_against(
                batch, existing, self.id_col, self.text_col,
                threshold=self.threshold, num_hashes=self.num_hashes,
                bands=self.bands, shingle_n=self.shingle_n)
        batch = batch.localCheckpoint(eager=True)  # one plan, two uses below
        return super().write_batch(batch, batch_id)
