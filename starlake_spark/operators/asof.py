"""Scalable as-of (point-in-time) join.

The reference implements no join algorithms at all — SURVEY §2.3,
StarLakeScanBuilder delegates every join to Spark — and Spark itself
has no ASOF JOIN operator, so this is a value-add operator for
training-data / feature-store pipelines (enrich an event with the most
recent dimension state at event time).

Formulation is union + running window, NOT a range join:

1. tag left rows (side=1) and right rows (side=0), union them into one
   frame carrying the right payload as a nullable struct;
2. ONE hash shuffle on the join keys; within each key the window sort
   orders rows by (time, side-flag, tie-break);
3. ``last(payload, ignorenulls=True)`` over an unbounded-preceding row
   frame carries the most recent right payload onto each left row
   (``first`` over the following frame for direction='forward');
4. keep side=1, unpack structs.

Scale posture: cost is one shuffle of |left|+|right| rows and the
window sort (which rides the shuffle sort spill machinery) — no
per-key collect, no O(|L|·|R|) range cross-product, no driver work.
A hot key costs one partition's sort, the same as any groupBy on the
same key; salting does not apply (the window needs full key order) but
the running frame keeps O(1) state per row, so memory stays flat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F, types as T


def _key_pairs(on) -> list[tuple[str, str]]:
    return [(p, p) if isinstance(p, str) else (p[0], p[1]) for p in on]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    tie_break: str | None = None,
) -> DataFrame:
    """Left outer as-of join: every left row, plus the right-side row
    with the greatest ``right_time`` <= ``left_time`` among rows with
    equal join keys (direction='backward'; 'forward' takes the smallest
    ``right_time`` >= ``left_time``; 'nearest' the closest in absolute
    distance, backward winning ties). Unmatched left rows keep nulls.

    on          -- list of join keys: "name" (same both sides) or
                   ("left_name", "right_name") pairs.
    tie_break   -- right-side column ordering rows that share
                   (key, right_time): highest wins for backward, lowest
                   for forward. Without it the winner among exact time
                   ties is nondeterministic (same as Spark's max_by).
    allow_exact_matches -- False makes the comparison strict (< / >).

    Output columns: all of ``left``'s, then ``right``'s non-key columns
    (``right_time`` included). Right non-key names must not collide
    with left names — pre-rename on the right frame.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(
            f"direction must be backward|forward|nearest, got {direction!r}")
    pairs = _key_pairs(on)
    lkeys = [p[0] for p in pairs]
    rkeys = [p[1] for p in pairs]
    for c in lkeys + [left_time]:
        if c not in left.columns:
            raise ValueError(f"left column {c!r} not found")
    for c in rkeys + [right_time] + ([tie_break] if tie_break else []):
        if c not in right.columns:
            raise ValueError(f"right column {c!r} not found")
    payload_cols = [c for c in right.columns if c not in rkeys]
    if direction == "nearest" and right_time not in payload_cols:
        raise ValueError("nearest needs the right time column in the payload "
                         f"(it is a join key: {right_time!r})")
    clash = set(payload_cols) & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left: {sorted(clash)}; "
                         "rename them on the right frame first")

    lstruct = F.struct(*[F.col(c) for c in left.columns])
    rstruct = F.struct(*[F.col(c) for c in payload_cols])
    ltype = left.select(lstruct.alias("s")).schema["s"].dataType
    rtype = right.select(rstruct.alias("s")).schema["s"].dataType

    ks = [f"_asof_k{i}" for i in range(len(pairs))]
    # side flag doubles as the equal-time ordering: for backward
    # non-strict the right row must sort BEFORE the left row it matches
    # (so the running last() has seen it); strict flips that so an
    # equal-time right row is still unseen at the left row. Forward
    # mirrors both through the descending time sort below.
    if allow_exact_matches:
        l_ord, r_ord = 1, 0
    else:
        l_ord, r_ord = 0, 1

    lu = left.select(
        *[F.col(k).alias(a) for k, a in zip(lkeys, ks)],
        F.col(left_time).alias("_asof_t"),
        F.lit(1).alias("_asof_side"),
        F.lit(l_ord).alias("_asof_ord"),
        F.lit(None).cast(rtype).alias("_asof_pay"),
        F.lit(None).alias("_asof_tie"),
        lstruct.alias("_asof_row"),
    )
    tie_col = (F.col(tie_break) if tie_break else F.lit(None))
    ru = right.select(
        *[F.col(k).alias(a) for k, a in zip(rkeys, ks)],
        F.col(right_time).alias("_asof_t"),
        F.lit(0).alias("_asof_side"),
        F.lit(r_ord).alias("_asof_ord"),
        rstruct.alias("_asof_pay"),
        tie_col.alias("_asof_tie"),
        F.lit(None).cast(ltype).alias("_asof_row"),
    )
    u = lu.unionByName(ru)

    back_order = [F.col("_asof_t").asc(), F.col("_asof_ord").asc(),
                  F.col("_asof_tie").asc_nulls_first()]
    # descending time turns "smallest right_time >= left_time" back
    # into a running last(); tie desc so the LOWEST tie-break is the
    # last one seen among equal forward times.
    fwd_order = [F.col("_asof_t").desc(), F.col("_asof_ord").asc(),
                 F.col("_asof_tie").desc_nulls_first()]

    def running(order):
        w = (W.partitionBy(*ks).orderBy(*order)
              .rowsBetween(W.unboundedPreceding, W.currentRow))
        return F.last("_asof_pay", ignorenulls=True).over(w)

    if direction == "backward":
        matched = running(back_order)
    elif direction == "forward":
        matched = running(fwd_order)
    else:
        # nearest: both running windows share one hash exchange (same
        # partitioning; Spark re-sorts between them) — pick the closer
        # match by absolute time distance, backward winning ties.
        def dist(pay):
            # temporal columns can't cast to double directly (Spark 4
            # forbids ntz→double); route through timestamp_ltz like
            # operators/ranges._numeric
            t_l, t_r = F.col("_asof_t"), pay[right_time]
            if isinstance(u.schema["_asof_t"].dataType,
                          (T.TimestampType, T.TimestampNTZType, T.DateType)):
                t_l = t_l.cast("timestamp_ltz").cast("double")
                t_r = t_r.cast("timestamp_ltz").cast("double")
            return F.abs(t_l.cast("double") - t_r.cast("double"))

        b, f = running(back_order), running(fwd_order)
        matched = (
            F.when(b.isNull(), f)
             .when(f.isNull(), b)
             .when(dist(f) < dist(b), f)
             .otherwise(b))

    out = (u.withColumn("_asof_match", matched)
            .filter(F.col("_asof_side") == 1)
            .select(*[F.col("_asof_row")[c].alias(c) for c in left.columns],
                    *[F.col("_asof_match")[c].alias(c) for c in payload_cols]))
    return out
