"""asof_join: differential vs a brute-force pandas twin + plan shape."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from starlake_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        pd.DataFrame({
            "k": [1, 1, 1, 2, 2, 3],
            "lt": [10, 20, 30, 15, 5, 50],
            "lval": ["a", "b", "c", "d", "e", "f"],
        }))
    right = spark.createDataFrame(
        pd.DataFrame({
            "k": [1, 1, 1, 2, 4],
            "rt": [10, 25, 28, 18, 1],
            "rval": [100, 200, 300, 400, 500],
        }))
    return left, right


def _brute(left_pdf, right_pdf, direction, exact):
    out = []
    for _, l in left_pdf.iterrows():
        lt = l["lt"]  # attribute access would hit pandas Series.lt
        cand = right_pdf[right_pdf.k == l.k]
        if direction == "backward":
            cand = cand[cand.rt <= lt] if exact else cand[cand.rt < lt]
            pick = cand.sort_values("rt").iloc[-1] if len(cand) else None
        else:
            cand = cand[cand.rt >= lt] if exact else cand[cand.rt > lt]
            pick = cand.sort_values("rt").iloc[0] if len(cand) else None
        out.append((l.k, lt, l.lval,
                    None if pick is None else pick.rt,
                    None if pick is None else pick.rval))
    return sorted(out, key=lambda r: (r[0], r[1]))


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("exact", [True, False])
def test_matches_brute_force(spark, frames, direction, exact):
    left, right = frames
    got = asof_join(left, right, on=["k"], left_time="lt", right_time="rt",
                    direction=direction, allow_exact_matches=exact)
    rows = sorted(
        ((r.k, r.lt, r.lval, r.rt, r.rval) for r in got.collect()),
        key=lambda r: (r[0], r[1]))
    want = _brute(left.toPandas(), right.toPandas(), direction, exact)
    assert rows == want


def test_tie_break_deterministic(spark):
    left = spark.createDataFrame(pd.DataFrame({"k": [1], "lt": [20]}))
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 1], "rt": [10, 10], "rid": [7, 3]}))
    back = asof_join(left, right, on=["k"], left_time="lt", right_time="rt",
                     tie_break="rid").collect()[0]
    assert back.rid == 7  # highest tie-break wins backward
    fwd = asof_join(spark.createDataFrame(pd.DataFrame({"k": [1], "lt": [5]})),
                    right, on=["k"], left_time="lt", right_time="rt",
                    direction="forward", tie_break="rid").collect()[0]
    assert fwd.rid == 3  # lowest wins forward


def test_column_clash_and_bad_args(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rval", "lval"),
                  on=["k"], left_time="lt", right_time="rt")
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["k"], left_time="lt", right_time="rt",
                  direction="sideways")
    with pytest.raises(ValueError, match="not found"):
        asof_join(left, right, on=["missing"], left_time="lt", right_time="rt")


def test_single_shuffle_plan(spark, frames):
    """The union-window formulation must cost exactly one hash exchange
    (no range-join cross product, no extra repartition)."""
    left, right = frames
    plan = asof_join(left, right, on=["k"], left_time="lt",
                     right_time="rt")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_nearest_matches_brute_force(spark, frames):
    left, right = frames
    got = asof_join(left, right, on=["k"], left_time="lt", right_time="rt",
                    direction="nearest")
    rows = {(r.k, r.lt): (r.rt, r.rval) for r in got.collect()}
    lp, rp = left.toPandas(), right.toPandas()
    for _, l in lp.iterrows():
        cand = rp[rp.k == l.k]
        if len(cand) == 0:
            assert rows[(l.k, l["lt"])] == (None, None)
            continue
        d = (cand.rt - l["lt"]).abs()
        # backward wins ties: among minimal distances prefer rt <= lt
        best = cand.loc[d == d.min()]
        prefer = best[best.rt <= l["lt"]]
        pick = (prefer if len(prefer) else best).iloc[0]
        assert rows[(l.k, l["lt"])] == (pick.rt, pick.rval), (l.k, l["lt"])


def test_nearest_timestamp_time(spark):
    import datetime
    import pandas as pd
    base = datetime.datetime(2024, 1, 1)
    left = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1], "lt": [base + datetime.timedelta(minutes=10),
                            base + datetime.timedelta(minutes=50)]}))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1], "rt": [base, base + datetime.timedelta(minutes=30)],
        "rv": [1, 2]}))
    got = {r.lt: r.rv for r in asof_join(
        left, right, on=["k"], left_time="lt", right_time="rt",
        direction="nearest").collect()}
    assert got[base + datetime.timedelta(minutes=10)] == 1   # 10min vs 20min
    assert got[base + datetime.timedelta(minutes=50)] == 2   # 50min vs 20min
