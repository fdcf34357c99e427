"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The container has no image/audio codecs, so the decode kernels are
deterministic fakes / NotImplementedError stubs behind import guards —
but the *Spark-side contract* (schemas, mapInPandas batch shape, Arrow
transfer, partition sizing) is real and tested. Swapping a stub for
Pillow/librosa changes only the function body, not the plan.

Design for 100 TB of media:
- binary payloads ride in their own column so column pruning skips them
  when a query touches only metadata;
- decode/feature kernels run via ``mapInPandas`` (Arrow batches, one
  Python worker per core, no per-row serde);
- ``spark.sql.files.maxPartitionBytes`` bounds the bytes a single task
  materializes; callers should keep payloads ≤ a few MB per row or
  store pointers instead.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

# typed metadata structs
IMAGE_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

AUDIO_META = T.StructType([
    T.StructField("sample_rate", T.IntegerType()),
    T.StructField("n_samples", T.LongType()),
    T.StructField("channels", T.IntegerType()),
    T.StructField("format", T.StringType()),
])

VIDEO_META = T.StructType([
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("fps", T.DoubleType()),
    T.StructField("n_frames", T.LongType()),
    T.StructField("format", T.StringType()),
])


def _try_import_pillow():
    try:
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError:
        return None


def _fake_decode_stats(payload: bytes) -> tuple[float, float]:
    """Deterministic stand-in for pixel statistics: mean/std of the raw
    bytes (numpy over the buffer). Replaced by a real decode when codecs
    are present."""
    if not payload:
        return 0.0, 0.0
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    return float(arr.mean()), float(arr.std())


def image_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "item_id"
) -> DataFrame:
    """Per-image features via mapInPandas (Arrow-batched).

    With no codec installed, emits byte-level stats + content hash; the
    batch shape, schema and partition behavior are production-real.
    """
    pil = _try_import_pillow()
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("std_byte", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decoder = "fake-bytes" if pil is None else "pillow"
        for pdf in batches:
            if pil is not None:
                raise NotImplementedError(
                    "real image decode not wired in this container"
                )
            payloads = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            stats = [_fake_decode_stats(p) for p in payloads]
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "n_bytes": [len(p) for p in payloads],
                "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                "mean_byte": [s[0] for s in stats],
                "std_byte": [s[1] for s in stats],
                "decoder": decoder,
            })

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def audio_features(
    df: DataFrame,
    payload_col: str = "payload",
    meta_col: str = "audio_meta",
    id_col: str = "item_id",
) -> DataFrame:
    """Per-clip audio features via mapInPandas — the audio twin of
    ``image_features``. The metadata struct rides through the kernel
    (flattened to columns by Arrow) exactly as a real librosa/soundfile
    kernel would consume it; with no codec present the waveform stats
    are deterministic byte-level fakes and duration comes straight from
    the metadata (n_samples / sample_rate).
    """
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms_byte", T.DoubleType()),
        T.StructField("decoder", T.StringType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf[payload_col]]
            rms = []
            for p in payloads:
                if p:
                    a = np.frombuffer(p, dtype=np.uint8).astype(np.float64)
                    rms.append(float(np.sqrt(np.mean(a * a))))
                else:
                    rms.append(0.0)
            sr = pdf["_sr"].to_numpy(dtype=np.float64)
            ns = pdf["_ns"].to_numpy(dtype=np.float64)
            dur = np.where(sr > 0, ns / sr, 0.0)
            yield pd.DataFrame({
                id_col: pdf[id_col].values,
                "n_bytes": [len(p) for p in payloads],
                "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                "duration_s": dur,
                "rms_byte": rms,
                "decoder": "fake-bytes",
            })

    src = df.select(
        id_col, payload_col,
        F.col(f"{meta_col}.sample_rate").alias("_sr"),
        F.col(f"{meta_col}.n_samples").alias("_ns"),
    )
    return src.mapInPandas(kernel, out_schema)


def frame_sample_plan(
    df: DataFrame,
    meta_col: str = "video_meta",
    id_col: str = "item_id",
    every_n: int = 30,
) -> DataFrame:
    """Expand each video row into (item_id, frame_no) sample rows from
    metadata only — pure JVM sequence/explode, the binary column is
    pruned away. The actual frame decode would join this plan back to
    payloads in a mapInPandas kernel."""
    n = F.col(f"{meta_col}.n_frames")
    frames = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(every_n))
    return df.select(F.col(id_col), F.explode(frames).alias("frame_no"))


def resize_stub(df: DataFrame, payload_col: str = "payload",
                id_col: str = "item_id", width: int = 224, height: int = 224) -> DataFrame:
    """Resize kernel stub: passes payloads through mapInPandas with the
    production schema; raises if actually asked to resize real pixels."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("resized", T.BinaryType()),
        T.StructField("out_w", T.IntegerType()),
        T.StructField("out_h", T.IntegerType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    # deterministic fake: truncate/pad payload to w*h bytes
                    "resized": pdf[payload_col].map(
                        lambda b: bytes(b or b"")[: width * height].ljust(1, b"\0")
                    ),
                    "out_w": width,
                    "out_h": height,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)
