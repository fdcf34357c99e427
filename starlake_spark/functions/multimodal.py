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


# --------------------------------------------------------------------------
# content_ref mode: pointer columns for externally-stored payloads.
# 100 TB of images does NOT live inline in parquet — payloads pack into
# large append-only shard objects (the WebDataset/tar shape) and the
# TABLE carries only a pointer struct. Metadata queries then never
# touch a shard byte (the binary isn't even a column), and a fetch
# kernel materializes exactly the requested byte ranges.
# --------------------------------------------------------------------------

CONTENT_REF = T.StructType([
    T.StructField("uri", T.StringType()),      # shard object path
    T.StructField("offset", T.LongType()),     # byte offset within shard
    T.StructField("length", T.LongType()),     # payload byte length
    T.StructField("md5", T.StringType()),      # payload checksum
])


def pack_payload_shards(
    df: DataFrame,
    shard_dir: str,
    payload_col: str = "payload",
    id_col: str = "item_id",
) -> DataFrame:
    """Pack inline binary payloads into per-partition shard files and
    return (id_col, content_ref) pointer rows.

    Each input partition appends its payloads to ONE shard file
    (``shard-<partition>-<uuid>.bin`` — the uuid makes task retries
    write a fresh file instead of corrupting a half-written one; the
    winning task's rows are the only pointers that survive, so orphan
    shards from lost speculative tasks are garbage, not corruption).
    Pointer rows carry (uri, offset, length, md5): offset/length give
    the fetch kernel an exact ranged read, md5 end-to-end integrity.
    At 100 TB this is the ingest-side packer; on object stores the
    shard write becomes a multipart upload with identical semantics."""
    import os
    import uuid as _uuid

    os.makedirs(shard_dir, exist_ok=True)
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("content_ref", CONTENT_REF),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else 0
        path = os.path.join(shard_dir,
                            f"shard-{pid:05d}-{_uuid.uuid4().hex[:8]}.bin")
        off = 0
        fh = None
        try:
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                refs = []
                for p in pdf[payload_col]:
                    if p is None:
                        # NULL payload → NULL pointer: null and empty
                        # must stay distinguishable through the
                        # pack/fetch round-trip (b'' gets a real
                        # zero-length ref; None gets no ref at all)
                        refs.append(None)
                        continue
                    b = bytes(p)
                    if fh is None:
                        fh = open(path, "wb")
                    fh.write(b)
                    refs.append({"uri": path, "offset": off,
                                 "length": len(b),
                                 "md5": hashlib.md5(b).hexdigest()})
                    off += len(b)
                yield pd.DataFrame({id_col: pdf[id_col].values,
                                    "content_ref": refs})
        finally:
            if fh is not None:
                fh.close()

    return df.select(id_col, payload_col).mapInPandas(kernel, out_schema)


def fetch_content(
    df: DataFrame,
    ref_col: str = "content_ref",
    id_col: str = "item_id",
    verify: bool = True,
) -> DataFrame:
    """Lazy ranged fetch of externally-stored payloads: for each
    pointer row, open the shard, seek ``offset``, read ``length``
    bytes — I/O is exactly the requested ranges, never whole shards.
    Rows within an Arrow batch are grouped by shard and read in offset
    order (one open + forward seeks per shard per batch — the access
    pattern object-store range GETs want). ``verify`` checks md5 and
    raises on corruption. Output: (id_col, payload binary)."""
    out_schema = T.StructType([
        T.StructField(id_col, T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads: list[bytes | None] = [None] * len(pdf)
            refs = pdf[ref_col]
            # NULL refs (packed from NULL payloads) stay None — only
            # real pointers are fetched
            order = sorted(
                (i for i in range(len(pdf)) if refs.iloc[i] is not None),
                key=lambda i: (refs.iloc[i]["uri"], refs.iloc[i]["offset"]))
            open_uri, fh = None, None
            try:
                for i in order:
                    r = refs.iloc[i]
                    if r["uri"] != open_uri:
                        if fh is not None:
                            fh.close()
                        open_uri = r["uri"]
                        fh = open(open_uri, "rb")
                    fh.seek(int(r["offset"]))
                    b = fh.read(int(r["length"]))
                    if verify and hashlib.md5(b).hexdigest() != r["md5"]:
                        raise IOError(
                            f"content_ref checksum mismatch at "
                            f"{open_uri}:{r['offset']}+{r['length']}")
                    payloads[i] = b
            finally:
                if fh is not None:
                    fh.close()
            yield pd.DataFrame({id_col: pdf[id_col].values,
                                "payload": payloads})

    return df.select(id_col, ref_col).mapInPandas(kernel, out_schema)


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
