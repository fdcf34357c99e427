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
