"""File-level Bloom filter index — manifest-side point-lookup skipping.

Complements the two existing skipping layers:

- footer min/max stats (reader._prune_files_by_stats) — great for
  clustered/sorted columns, useless for equality probes on
  high-cardinality UNSORTED columns (every file's [min, max] spans
  nearly the whole domain, so nothing prunes);
- parquet-native column blooms (writer `parquet.bloom.filter.enabled#c`)
  — row-group skipping INSIDE a file, but Spark still schedules a task
  and opens the footer for every file.

This layer prunes whole files at PLAN time from a per-file bitmap kept
in a per-commit sidecar (Delta's bloom-filter-index design,
``_delta_index`` sidecars): with a million files, a needle lookup
schedules tasks for the handful of files whose bloom admits the key
instead of all of them. Zero correctness surface — blooms have no
false negatives, files without a bloom always pass, and the full
predicate is re-applied row-level after the scan.

Enable with the ``bloom.file.cols`` table property (comma-separated
column names). Every write path (append, upsert delta, compaction
rewrite) then builds bitmaps for its new files in ONE extra Spark job
over just-written bytes — O(commit), distributed, Arrow-batched numpy;
the driver only ever sees the finished ≤16 KiB bitmaps.

Hash family: double hashing over the SAME murmur3 ``F.hash`` the
engine's bucket layout uses — h1 = hash(col), h2 = hash(col, 1)
(seed-chained), pos_i = (u1 + i·u2) mod m with u1 = h1 as u32,
u2 = h2 as u32 forced odd. The probe side recomputes h1/h2 with the
bit-exact pure-Python murmur3 twin (reader._spark_hash_py,
differentially pinned), so probe planning costs zero Spark jobs.

Reference: the reference engine has no file-level bloom index — this
is part of the repo's Delta-parity data-skipping story (its
DataFileInfo carries no stats at all, utils/MetaData.scala:121-139).
"""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F
import pyspark.sql.types as T

BLOOM_K = 7  # ~10 bits/key + 7 probes ≈ 1% false-positive rate
_M_MIN_BITS = 1 << 10
_M_MAX_BITS = 1 << 17  # 16 KiB bitmap cap per (file, column)
_BITS_PER_KEY = 10

_ELIGIBLE = (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.StringType)


def eligible_bloom_cols(info, columns: list[str]) -> list[str]:
    """The subset of ``bloom.file.cols`` that (a) exists in this
    write's columns and (b) has a type the pure-Python murmur3 twin
    can probe (int-like / long / string)."""
    import json

    from starlake_spark.operators.writer import table_schema

    declared = (info.configuration or {}).get("bloom.file.cols", "")
    want = [c.strip() for c in declared.split(",") if c.strip()]
    if not want:
        return []
    types = {f.name: f.dataType for f in table_schema(info).fields}
    return [c for c in want
            if c in columns and isinstance(types.get(c), _ELIGIBLE)]


def bloom_m(n_rows: int) -> int:
    """Bitmap size in bits: next power of two of ~10 bits/row, clamped
    to [1 KiB, 16 KiB] of bitmap. Power-of-two m keeps the modulo a
    mask and the sizing deterministic for the differential tests."""
    target = max(_M_MIN_BITS, min(n_rows * _BITS_PER_KEY, _M_MAX_BITS))
    m = _M_MIN_BITS
    while m < target:
        m <<= 1
    return m


def positions_py(h1: int, h2: int, m: int, k: int = BLOOM_K) -> list[int]:
    """Probe-side bit positions for one value — the scalar twin of the
    numpy build kernel below (same u32 folding, same odd-stride)."""
    u1 = h1 & 0xFFFFFFFF
    u2 = (h2 & 0xFFFFFFFF) | 1
    return [(u1 + i * u2) % m for i in range(k)]


def test_membership(bits: bytes, m: int, k: int, h1: int, h2: int) -> bool:
    """True = maybe present, False = DEFINITELY absent."""
    for pos in positions_py(h1, h2, m, k):
        if not (bits[pos >> 3] >> (pos & 7)) & 1:
            return False
    return True


def build_blooms(spark, abs_dir: str, table_path: str,
                 cols: list[str], commit_id: str) -> str | None:
    """One Spark job over the just-written commit directory: murmur3
    h1/h2 per row JVM-side, per-file bitmaps folded by an Arrow-batched
    numpy kernel (groupBy file — shuffle keyed by file path, output one
    ≤16 KiB row per file × column). The driver writes the collected
    bitmaps to ``_star_meta/bloom/<commit_id>.parquet`` and returns
    that manifest-relative path (None if the commit wrote no rows).

    Sidecar rows are keyed by the file's scheme-stripped ABSOLUTE path
    (basenames are NOT unique: hive-partitioned writes reuse
    part-00000-<job-uuid> across partition dirs). Shallow clones read
    the same absolute source paths, so their probes keep matching.
    """
    sel = [F.input_file_name().alias("_f")]
    for i, c in enumerate(cols):
        sel += [
            F.hash(F.col(c)).alias(f"_h1_{i}"),
            F.hash(F.col(c), F.lit(1)).alias(f"_h2_{i}"),
            F.col(c).isNull().alias(f"_n_{i}"),
        ]
    src = spark.read.parquet(abs_dir).select(*sel)
    n_cols = len(cols)

    def _kernel(pdf):
        import pandas as pd

        import re as _re

        fname = _re.sub("^file:/+", "/", str(pdf["_f"].iloc[0]))
        m = bloom_m(len(pdf))
        out = {"path": [], "col": [], "m": [], "k": [], "bits": []}
        for i, c in enumerate(cols):
            keep = ~pdf[f"_n_{i}"].to_numpy(dtype=bool)
            u1 = pdf[f"_h1_{i}"].to_numpy(dtype=np.int64)[keep] & 0xFFFFFFFF
            u2 = (pdf[f"_h2_{i}"].to_numpy(dtype=np.int64)[keep] & 0xFFFFFFFF) | 1
            bits = np.zeros(m >> 3, dtype=np.uint8)
            for j in range(BLOOM_K):
                pos = (u1 + j * u2) % m
                np.bitwise_or.at(
                    bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
            out["path"].append(fname)
            out["col"].append(c)
            out["m"].append(m)
            out["k"].append(BLOOM_K)
            out["bits"].append(bits.tobytes())
        return pd.DataFrame(out)

    rows = (src.groupBy("_f")
            .applyInPandas(_kernel, "path string, col string, m long, "
                                    "k long, bits binary")
            .collect())
    if not rows:
        return None
    import pyarrow as pa
    import pyarrow.parquet as pq

    rel = os.path.join("_star_meta", "bloom", f"{commit_id}.parquet")
    out_path = os.path.join(table_path, rel)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tbl = pa.table({
        "path": [r["path"] for r in rows],
        "col": [r["col"] for r in rows],
        "m": [r["m"] for r in rows],
        "k": [r["k"] for r in rows],
        "bits": [r["bits"] for r in rows],
    })
    tmp = out_path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, out_path)
    return rel


# sidecars are immutable once written → memoize loads across scans
_SIDECAR_CACHE: dict[str, dict[tuple[str, str], tuple[int, int, bytes]]] = {}
_SIDECAR_CACHE_MAX = 64


def load_sidecar(abs_ref: str) -> dict[tuple[str, str], tuple[int, int, bytes]]:
    """{(file_abs_path, col): (m, k, bits)} for one sidecar parquet;
    {} if unreadable (fail-open — pruning is an optimization only)."""
    hit = _SIDECAR_CACHE.get(abs_ref)
    if hit is not None:
        return hit
    try:
        import pyarrow.parquet as pq

        t = pq.read_table(abs_ref)
        d = {
            (p, c): (int(m), int(k), bytes(b))
            for p, c, m, k, b in zip(
                t["path"].to_pylist(), t["col"].to_pylist(),
                t["m"].to_pylist(), t["k"].to_pylist(),
                t["bits"].to_pylist())
        }
    except Exception:
        d = {}
    if len(_SIDECAR_CACHE) >= _SIDECAR_CACHE_MAX:
        _SIDECAR_CACHE.pop(next(iter(_SIDECAR_CACHE)))
    _SIDECAR_CACHE[abs_ref] = d
    return d
