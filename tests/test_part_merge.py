"""Part-merge OOM guard: chunked compaction of long commit histories.

Reference parity: StarLakePartFileMerge.scala:31-158 +
StarLakePartFileMergeSuite.scala — when a partition accumulates more
delta commits than one merge pass should absorb, compaction folds the
OLDEST chunk into an intermediate published before the remaining
versions (the reference republishes at write_version 0; here the
chunk's top version), repeating until under the cap, so neither the
plan's union fan-out nor a concurrent reader's version-list width grows
with commit count. Invariant (CompactionDoNotChangeResult.scala): scans
before, during and after are identical.
"""

import json

import pytest

from starlake_spark import create_table, merge_ops as mo
from starlake_spark.operators import dml


def _mk(spark, path, extra_props=None):
    df = spark.createDataFrame(
        [(1, "v0", 1, "r1"), (2, "v0", 1, "r1"), (3, "v0", 1, "r2")],
        "id int, name string, cnt int, range string",
    )
    props = {"compaction.auto": "false", "compaction.maxDeltas": "0",
             "compaction.part.merge.max": "4"}
    props.update(extra_props or {})
    return create_table(
        spark, df, path, range_partitions=["range"],
        hash_partitions=["id"], hash_bucket_num=2, configuration=props,
    )


def _upsert(spark, t, rows):
    t.upsert(spark.createDataFrame(
        rows, "id int, name string, cnt int, range string"))


def test_part_merge_long_history_invariant(spark, tmp_table_dir):
    """12 delta commits, cap 4: compaction must part-merge in chunks
    (history shows part_compaction commits) and the scan is unchanged."""
    t = _mk(spark, tmp_table_dir)
    expected = {1: "v0", 2: "v0", 3: "v0"}
    for i in range(1, 13):
        key = (i % 4) + 1  # ids 1..4 cycle
        _upsert(spark, t, [(key, f"u{i}", 1, "r1" if key != 3 else "r2")])
        expected[key] = f"u{i}"
    before = sorted((r.id, r.name) for r in t.to_df().collect())
    assert dict(before) == expected
    t.compaction(force=True)
    after = sorted((r.id, r.name) for r in t.to_df().collect())
    assert after == before
    hist = [r.commit_type for r in t.history().collect()]
    assert hist.count("part_compaction") >= 2
    # fully compacted: every live file now shares one write_version
    snap = t.store.snapshot()
    for ps in snap.partitions.values():
        assert len({f.write_version for f in ps.files}) == 1


def test_part_merge_preserves_tombstones_and_resurrection(spark, tmp_table_dir):
    """A tombstone delete mid-history must stay deleted through the
    chunk folds, and a later upsert must resurrect the key."""
    t = _mk(spark, tmp_table_dir)
    for i in range(5):
        _upsert(spark, t, [(10 + i, f"a{i}", 1, "r1")])
    t.delete("id = 11", use_delta=True)   # tombstone delta
    t.delete("id = 2", use_delta=True)    # tombstone, never resurrected
    for i in range(5):
        _upsert(spark, t, [(20 + i, f"b{i}", 1, "r1")])
    _upsert(spark, t, [(11, "back", 1, "r1")])  # resurrect 11
    before = sorted((r.id, r.name) for r in t.to_df().collect())
    t.compaction(force=True)
    after = sorted((r.id, r.name) for r in t.to_df().collect())
    assert after == before
    ids = [i for i, _ in after]
    assert 2 not in ids and 11 in ids
    assert dict(after)[11] == "back"
    hist = [r.commit_type for r in t.history().collect()]
    assert "part_compaction" in hist


def test_part_merge_with_sum_operator(spark, tmp_table_dir):
    """Associative declared ops chunk-fold correctly: a sum counter
    table with 12 increments compacts through part-merge to the same
    total (MergeOperatorSuite semantics under the OOM guard)."""
    t = _mk(spark, tmp_table_dir, extra_props={
        "compaction.merge_operators": json.dumps({"cnt": "sum"})})
    for i in range(12):
        _upsert(spark, t, [(1, None, 1, "r1"), (3, None, 2, "r2")])
    vals = {r.id: r.cnt for r in t.to_df().collect()}
    assert vals[1] == 13 and vals[3] == 25 and vals[2] == 1
    t.compaction(force=True)
    vals2 = {r.id: r.cnt for r in t.to_df().collect()}
    assert vals2 == vals
    hist = [r.commit_type for r in t.history().collect()]
    assert "part_compaction" in hist


def test_non_associative_custom_op_falls_back(spark, tmp_table_dir):
    """A non-associative op (count-of-versions) must NOT chunk-fold —
    compaction falls back to the one-shot full merge."""
    mo.register_merge_operator(
        "nversions",
        lambda: mo.PythonMergeOp(lambda vs: len(vs), result_type="int"))
    t = _mk(spark, tmp_table_dir, extra_props={
        "compaction.merge_operators": json.dumps({"cnt": "nversions"})})
    for i in range(8):
        _upsert(spark, t, [(1, None, 1, "r1")])
    vals = {r.id: r.cnt for r in t.to_df().collect()}
    assert vals[1] == 9  # base + 8 deltas
    n = dml._part_merge_partition(
        spark, t.store, t.store.table_info(), "range=r1", 4,
        {"cnt": "nversions"})
    assert n == 0  # refused: chunk-folding would re-parenthesize the op
    t.compaction(force=True)
    hist = [r.commit_type for r in t.history().collect()]
    assert "part_compaction" not in hist


def test_intermediate_state_is_readable_and_exact(spark, tmp_table_dir):
    """Between part-merge passes (before the final full merge) a
    concurrent reader sees the exact table state."""
    t = _mk(spark, tmp_table_dir)
    expected = {1: "v0", 2: "v0", 3: "v0"}
    for i in range(10):
        _upsert(spark, t, [(1, f"x{i}", 1, "r1"), (5, f"y{i}", 1, "r1")])
    expected[1], expected[5] = "x9", "y9"
    info = t.store.table_info()
    n = dml._part_merge_partition(spark, t.store, info, "range=r1", 4, None)
    assert n >= 1
    snap = t.store.snapshot()
    ps = snap.partitions["range=r1"]
    # partition is under the cap but NOT fully merged: deltas remain
    n_groups = len({f.write_version for f in ps.files})
    assert 1 < n_groups <= 4
    got = {r.id: r.name for r in t.to_df().collect()}
    assert got == expected


def test_part_merge_commits_emit_no_cdf_rows(spark, tmp_table_dir):
    """part_compaction is a logical no-op rewrite: the change feed
    skips it exactly like compaction commits."""
    from starlake_spark.sources.datasource import table_changes

    t = _mk(spark, tmp_table_dir)
    for i in range(10):
        _upsert(spark, t, [(1, f"x{i}", 1, "r1")])
    v0 = t.store.latest_version()
    t.compaction(force=True)
    hist = [r.commit_type for r in t.history().collect()]
    assert "part_compaction" in hist
    ch = table_changes(spark, tmp_table_dir, start_version=v0)
    assert ch.count() == 0


def test_part_merge_disabled_by_property(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir,
            extra_props={"compaction.part.merge.max": "0"})
    for i in range(8):
        _upsert(spark, t, [(1, f"x{i}", 1, "r1")])
    t.compaction(force=True)
    hist = [r.commit_type for r in t.history().collect()]
    assert "part_compaction" not in hist
    assert {r.name for r in t.to_df().filter("id = 1").collect()} == {"x7"}


def test_sixty_delta_fanout_stress(spark, tmp_table_dir):
    """60 delta commits with auto-compaction fully disabled: reads stay
    exact at every fan-out level the guard permits, and the final
    forced compaction chunk-folds all the way down (union width <= cap
    per pass) to a single-version partition with the right data."""
    t = _mk(spark, tmp_table_dir, extra_props={
        "compaction.part.merge.max": "8"})
    expected = {1: "v0", 2: "v0", 3: "v0"}
    for i in range(60):
        key = (i % 7) + 1
        rng = "r2" if key == 3 else "r1"
        _upsert(spark, t, [(key, f"u{i}", 1, rng)])
        expected[key] = f"u{i}"
    assert {r.id: r.name for r in t.to_df().collect()} == expected
    t.compaction(force=True)
    assert {r.id: r.name for r in t.to_df().collect()} == expected
    hist = [r.commit_type for r in t.history().collect()]
    assert hist.count("part_compaction") >= 6   # 61 groups, cap 8
    for ps in t.store.snapshot().partitions.values():
        assert len({f.write_version for f in ps.files}) == 1
