"""Scalable range (interval) join.

Like the as-of join (operators/asof.py), this fills a gap the
reference never addresses (SURVEY §2.3 — it ships no join algorithms)
and Spark only covers badly: an equi-key + interval-containment join
written naively (`l.key == r.key AND r.start <= l.point < r.end`)
compiles the inequality half into the join condition of a SortMergeJoin
on the key alone — or, with no equi key, a BroadcastNestedLoopJoin —
both of which degenerate to per-key O(|L|·|R|) comparisons.

Bucketed formulation: pick a bucket width in the units of the point
column; each left row lands in exactly one bucket
(floor(point/width)), each right interval explodes into the buckets it
overlaps (ceil(len/width)+1 rows); then a plain EQUI-join on
(keys…, bucket) + the exact interval predicate. Because the left point
is in exactly one bucket and a right interval covers each bucket at
most once, a matching (left, right) pair meets in exactly one joined
row — no post-join dedup.

Scale posture: shuffle volume is |L| + |R|·(avg interval/width + 1)
rows; comparisons per (key, bucket) cell are only rows that can
actually match within one width of each other. Width is the knob:
~ the typical interval length keeps right-side duplication ≤ 2× while
making cells tight. Hot (key, bucket) cells behave like any skewed
equi-join — AQE skew-join splitting applies, which is exactly why this
compiles to a standard equi-join instead of a custom kernel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T


def _numeric(df: DataFrame, c: str):
    """Bucketing expression: fractional epoch seconds for temporal
    columns (timestamp_ntz/date cannot cast to double directly in
    Spark 4 — route through timestamp_ltz; with a fixed session
    timezone the mapping is consistent across point and bounds, and the
    exact predicate compares the ORIGINAL columns anyway), plain double
    for numerics."""
    dt = df.schema[c].dataType
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return F.col(c).cast("timestamp_ltz").cast("double")
    return F.col(c).cast("double")


def interval_point_join(
    left: DataFrame,
    right: DataFrame,
    on,
    point: str,
    start: str,
    end: str,
    bucket_width: float,
    closed: str = "left",
    how: str = "inner",
) -> DataFrame:
    """Join each left row (at ``point``) to every right interval
    [``start``, ``end``) containing it, equi-matching on ``on`` keys.

    on           -- list of "name" or ("left_name", "right_name") pairs.
    bucket_width -- bucket size in the point column's native units
                    (seconds for timestamps — they are bucketed via a
                    cast to double, i.e. fractional epoch seconds).
    closed       -- 'left' ([start, end)), 'right' ((start, end]),
                    'both' ([start, end]) or 'neither'.
    how          -- 'inner' or 'left_outer' (keep pointless left rows).

    Output: left columns then right columns (minus its key columns);
    names must not collide — pre-rename on the right frame.
    """
    if closed not in ("left", "right", "both", "neither"):
        raise ValueError(f"closed must be left|right|both|neither, got {closed!r}")
    if how not in ("inner", "left_outer", "left"):
        raise ValueError(f"how must be inner|left_outer, got {how!r}")
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    pairs = [(p, p) if isinstance(p, str) else (p[0], p[1]) for p in on]
    for c in [p[0] for p in pairs] + [point]:
        if c not in left.columns:
            raise ValueError(f"left column {c!r} not found")
    for c in [p[1] for p in pairs] + [start, end]:
        if c not in right.columns:
            raise ValueError(f"right column {c!r} not found")
    rkeys = [p[1] for p in pairs]
    out_right = [c for c in right.columns if c not in rkeys]
    clash = set(out_right) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}; "
                         "rename them on the right frame first")

    w = float(bucket_width)
    l2 = left.withColumn("_rj_b", F.floor(_numeric(left, point) / w))
    # malformed intervals (end < start) can never match, but would make
    # sequence() descend and explode |end-start|/w garbage rows — drop
    # them before the explode
    right = right.filter(_numeric(right, end) >= _numeric(right, start))
    # inclusive end bucket: a closed-right/both endpoint sitting exactly
    # on a bucket boundary must still meet its left points; the exact
    # predicate below discards any overshoot.
    r2 = right.withColumn(
        "_rj_b",
        F.explode(F.sequence(
            F.floor(_numeric(right, start) / w).cast("long"),
            F.floor(_numeric(right, end) / w).cast("long"),
        )),
    )

    lo = (l2[point] >= r2[start]) if closed in ("left", "both") else (l2[point] > r2[start])
    hi = (l2[point] <= r2[end]) if closed in ("right", "both") else (l2[point] < r2[end])
    cond = l2["_rj_b"] == r2["_rj_b"]
    for lk, rk in pairs:
        cond = cond & (l2[lk] == r2[rk])
    joined = l2.join(r2, cond & lo & hi,
                     "inner" if how == "inner" else "left_outer")
    return joined.select(*[l2[c] for c in left.columns],
                         *[r2[c] for c in out_right])
