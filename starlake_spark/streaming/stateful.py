"""Custom stateful streaming operators via applyInPandasWithState.

The reference delegates all stateful streaming to Spark upstream ops
(SURVEY §2.7: watermark/windows/session/state — none implemented); this
module goes beyond it with the operator a training-data ingest pipeline
actually needs: **session windows with per-key custom aggregates** that
Spark's built-in ``session_window`` can't express (first/last event
payloads, distinct-type counts, custom gap logic per key).

Design for scale: state is partitioned by key (one shuffle), each
micro-batch touches only keys present in the batch plus timed-out
state, and the per-group pandas kernel is O(batch rows). Timeouts use
the event-time watermark so state is bounded by (active sessions ×
state row size), not history.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType(), False),
    T.StructField("session_start", T.TimestampType(), True),
    T.StructField("session_end", T.TimestampType(), True),
    T.StructField("n_events", T.LongType(), True),
    T.StructField("n_types", T.LongType(), True),
    T.StructField("total_value", T.DoubleType(), True),
    T.StructField("first_type", T.StringType(), True),
    T.StructField("last_type", T.StringType(), True),
])

_STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType(), True),
    T.StructField("end_us", T.LongType(), True),
    T.StructField("n_events", T.LongType(), True),
    T.StructField("types", T.StringType(), True),      # \x1f-joined, ordered
    T.StructField("total_value", T.DoubleType(), True),
    T.StructField("first_type", T.StringType(), True),
    T.StructField("last_type", T.StringType(), True),
])

_SEP = "\x1f"


def _sessionize_fn(gap_s: float):
    gap_us = int(gap_s * 1_000_000)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            (start_us, end_us, n, types, total, first_t, last_t) = state.get
            state.remove()
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_start": pd.Timestamp(start_us, unit="us"),
                "session_end": pd.Timestamp(end_us, unit="us"),
                "n_events": n,
                "n_types": len(set(types.split(_SEP))),
                "total_value": total,
                "first_type": first_t,
                "last_type": last_t,
            }])
            return

        rows = pd.concat(list(pdfs)).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
        out = []
        if state.exists:
            (start_us, end_us, n, types, total, first_t, last_t) = state.get
        else:
            start_us = end_us = None
            n, types, total, first_t, last_t = 0, "", 0.0, None, None

        for t_us, etype, value in zip(ts_us, rows["event_type"], rows["value"]):
            if start_us is not None and t_us - end_us > gap_us:
                out.append((start_us, end_us, n, types, total, first_t, last_t))
                start_us = end_us = None
                n, types, total, first_t, last_t = 0, "", 0.0, None, None
            if start_us is None:
                start_us, first_t = t_us, etype
            end_us, last_t = t_us, etype
            n += 1
            types = etype if not types else f"{types}{_SEP}{etype}"
            total += float(value)

        state.update((start_us, end_us, n, types, total, first_t, last_t))
        # close the open session once the watermark passes start+gap
        state.setTimeoutTimestamp(end_us // 1000 + int(gap_s * 1000))
        for (s_us, e_us, n_, types_, total_, f_t, l_t) in out:
            yield pd.DataFrame([{
                "user_id": user_id,
                "session_start": pd.Timestamp(s_us, unit="us"),
                "session_end": pd.Timestamp(e_us, unit="us"),
                "n_events": n_,
                "n_types": len(set(types_.split(_SEP))),
                "total_value": total_,
                "first_type": f_t,
                "last_type": l_t,
            }])

    return fn


def sessionize_stream(events: DataFrame, gap_s: float = 1800.0,
                      watermark: str = "1 hour") -> DataFrame:
    """Streaming sessionization with custom per-session aggregates.

    ``events`` must be a streaming DataFrame with columns
    (user_id long, ts timestamp, event_type string, value double).
    Emits one row per CLOSED session (event-time timeout = gap past the
    last event, bounded by the watermark)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_fn(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch_oracle(events: DataFrame, gap_s: float = 1800.0) -> DataFrame:
    """Batch twin of sessionize_stream for differential testing: same
    session boundaries + aggregates computed with window functions."""
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts")
    gap_expr = (F.col("ts").cast("double") - F.lag("ts").over(w).cast("double")) > gap_s
    sess = (
        events
        .withColumn("_new", F.when(gap_expr, 1).otherwise(0))
        .withColumn("_sid", F.sum("_new").over(w))
    )
    return (
        sess.groupBy("user_id", "_sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("event_type").alias("n_types"),
            F.sum("value").alias("total_value"),
            F.min_by("event_type", "ts").alias("first_type"),
            F.max_by("event_type", "ts").alias("last_type"),
        )
        .drop("_sid")
    )
