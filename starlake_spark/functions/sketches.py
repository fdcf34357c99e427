"""Mergeable frequency sketches for heavy-hitter detection at scale.

Count-min sketch (Cormode & Muthukrishnan 2005) heavy hitters as a 100
TB pipeline runs them: fixed-size sketch state per partition (depth ×
width int64, independent of key cardinality), merged by addition on the
driver — the same partial-state shape as the Bloom decontamination
bitmap (functions/dedup.py) and the HLL/percentile sketch entries
(queries/analytics.py). The reference ships no frequency sketches;
this extends the engine's sketch family (beyond reference).

Design: the CMS only ever OVERestimates (no false negatives), so
sketch-gate-then-exact-verify returns exactly the true heavy hitters:

  pass 1  one mapInPandas scan → per-partition partial sketch + local
          candidate keys (local count ≥ threshold/n_partitions: a key
          with global count ≥ T must, by pigeonhole, reach T/P in some
          partition, so the union of local candidates ⊇ true heavy
          hitters even before the CMS gate);
  gate    driver sums the partials (bounded state) and drops candidates
          whose global CMS estimate < T — estimate ≥ true count, so no
          true heavy hitter is dropped;
  pass 2  exact counts for the surviving candidates only (broadcast
          semi-join + groupBy over a set that is O(N·P/T + εN/T), tiny
          relative to the corpus), filtered to count ≥ T.

At the test scale threshold/P rounds to ~1 so the local gate admits
most keys — the bound is what matters at real scale (N=10^12, T=10^7,
P=10^5 → local threshold 100).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F

from starlake_spark.local import local_df

# fixed odd multipliers / offsets (derived once from a seeded RNG and
# frozen) — determinism across runs and partitionings is what makes the
# operator oracle-checkable; the no-false-negative property holds for
# ANY hash choice
_MIX = 0x9E3779B97F4A7C15


def _cms_hashes(depth: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 2**62, size=depth).astype(np.uint64) | np.uint64(1)
    b = rng.randint(0, 2**62, size=depth).astype(np.uint64)
    return a, b


def _buckets(keys: np.ndarray, a: np.uint64, b: np.uint64, width: int) -> np.ndarray:
    h = keys.astype(np.uint64) * a + b  # wraps mod 2^64 (deterministic)
    h ^= h >> np.uint64(33)
    h *= np.uint64(_MIX)
    h ^= h >> np.uint64(29)
    return (h % np.uint64(width)).astype(np.int64)


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    width: int = 2048,
    depth: int = 4,
    seed: int = 7,
    max_candidates: int = 100_000,
) -> DataFrame:
    """Exact heavy hitters (count ≥ threshold) found the sketch way.

    Returns (key_col, n_rows) for every key whose exact row count is ≥
    ``threshold``, using a count-min sketch to avoid ever shuffling the
    full key cardinality: only sketch partials (depth×width longs per
    partition) and the gated candidate set cross the wire. If the local
    gate admits more than ``max_candidates`` keys the highest-estimate
    ones are kept and a ValueError is raised only when that cap could
    drop a true heavy hitter (est of the dropped tail ≥ threshold).

    Precondition: ``df`` must be DETERMINISTIC across evaluations (a
    storage read, a cached frame) — the candidate set comes from one
    evaluation and the exact verify join re-evaluates ``df``; a frame
    whose rows change between evaluations (``.sample()`` without a
    seed, an unordered ``.limit()``) could contain a heavy key in the
    verify pass that was never a candidate. Callers with such a frame
    should ``.persist()`` it first. (Same contract as the COVERAGE.md
    "Double-consumed frames" note.)
    """
    if threshold < 1:
        raise ValueError(f"threshold must be >= 1, got {threshold}")
    a, b = _cms_hashes(depth, seed)
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    local_t = max(1, threshold // max(1, n_parts))

    def part_sketch(batches):
        sk = np.zeros((depth, width), dtype=np.int64)
        counts: dict[int, int] = {}
        for pdf in batches:
            ks = pdf[key_col].to_numpy(dtype=np.int64)
            for i in range(depth):
                np.add.at(sk[i], _buckets(ks, a[i], b[i], width), 1)
            uniq, cnt = np.unique(ks, return_counts=True)
            for k, c in zip(uniq.tolist(), cnt.tolist()):
                counts[k] = counts.get(k, 0) + c
        cand = [k for k, c in counts.items() if c >= local_t]
        yield pd.DataFrame({"sk": [sk.ravel().tolist()],
                            "cand": [cand]})

    partials = df.select(key_col).mapInPandas(
        part_sketch, schema="sk array<long>, cand array<long>").collect()
    sketch = np.zeros(depth * width, dtype=np.int64)
    cand_keys: set[int] = set()
    for row in partials:
        sketch += np.asarray(row["sk"], dtype=np.int64)
        cand_keys.update(row["cand"])
    sketch = sketch.reshape(depth, width)

    if cand_keys:
        ks = np.fromiter(cand_keys, dtype=np.int64, count=len(cand_keys))
        est = np.min(
            np.stack([sketch[i, _buckets(ks, a[i], b[i], width)]
                      for i in range(depth)]), axis=0)
        keep = est >= threshold
        ks, est = ks[keep], est[keep]
        if len(ks) > max_candidates:
            order = np.argsort(-est)
            dropped_max = est[order[max_candidates]]
            if dropped_max >= threshold:
                raise ValueError(
                    f"candidate cap {max_candidates} would drop keys with "
                    f"CMS estimate {dropped_max} >= threshold {threshold}; "
                    f"raise max_candidates or widen the sketch")
            ks = ks[order[:max_candidates]]
        survivors = sorted(int(k) for k in ks)
    else:
        survivors = []

    spark = df.sparkSession
    cand_df = local_df(spark, [(k,) for k in survivors], f"{key_col} long")
    return (
        df.join(F.broadcast(cand_df), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .filter(F.col("n_rows") >= threshold)
    )
