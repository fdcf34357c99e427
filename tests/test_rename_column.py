"""ALTER TABLE RENAME COLUMN via name-mapping (Delta column-mapping
'name mode' analog, beyond the reference): logical rename with zero
bytes rewritten. Files keep their write-time physical names; the
aliases.<logical> table property lets every read path — plain scan,
MoR per-column ordering, footer-stats skipping, CDC logs — resolve per
file group. Compaction converges the physical layout and the alias
marker clears itself (dropped.columns lifecycle)."""

import json

import pytest
from pyspark.sql import functions as F

from starlake_spark import create_table
from starlake_spark.sql import StarSession


def _mk(spark, path, extra=None):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "id int, name string, v int")
    props = {"compaction.auto": "false"}
    props.update(extra or {})
    return create_table(spark, df, path, hash_partitions=["id"],
                        hash_bucket_num=2, configuration=props)


def test_rename_reads_old_files_and_merges_across_rename(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.rename_column("name", "label")
    assert "label" in t.to_df().columns and "name" not in t.to_df().columns
    assert {r.id: r.label for r in t.to_df().collect()} == {1: "a", 2: "b", 3: "c"}
    # new-name delta merges on top of old-name base, per key
    t.upsert(spark.createDataFrame([(1, "A", 11)], "id int, label string, v int"))
    got = {r.id: (r.label, r.v) for r in t.to_df().collect()}
    assert got == {1: ("A", 11), 2: ("b", 20), 3: ("c", 30)}


def test_rename_partial_column_history(spark, tmp_table_dir):
    """exist_cols resolution through the alias: a pre-rename partial
    delta carrying only the renamed column must still outrank the base
    for that column after the rename."""
    t = _mk(spark, tmp_table_dir)
    t.upsert(spark.createDataFrame([(2, "bb")], "id int, name string"))  # partial, old name
    t.rename_column("name", "label")
    got = {r.id: r.label for r in t.to_df().collect()}
    assert got == {1: "a", 2: "bb", 3: "c"}


def test_compaction_converges_and_clears_alias(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.rename_column("name", "label")
    assert "aliases.label" in t.info.configuration
    t.compaction(force=True)
    assert "aliases.label" not in t.info.configuration
    # old name is free again once no live file carries it
    t.add_columns([("name", "string")])
    got = {r.id: (r.label, r.name) for r in t.to_df().collect()}
    assert got == {1: ("a", None), 2: ("b", None), 3: ("c", None)}


def test_rename_guards(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    with pytest.raises(ValueError, match="partition/hash"):
        t.rename_column("id", "key")
    with pytest.raises(ValueError, match="already exists"):
        t.rename_column("name", "v")
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("ghost", "x")
    t.add_constraint("vpos", "v > 0")
    with pytest.raises(ValueError, match="CHECK"):
        t.rename_column("v", "value")
    # writing the renamed-away name is rejected, not forked into a new column
    t.rename_column("name", "label")
    with pytest.raises(ValueError, match="renamed"):
        t.upsert(spark.createDataFrame([(1, "x")], "id int, name string"))


def test_rename_merge_operator_table(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir, extra={
        "compaction.merge_operators": json.dumps({"v": "sum"})})
    t.upsert(spark.createDataFrame([(1, None, 5)], "id int, name string, v int"))
    t.rename_column("v", "total")
    ops = json.loads(t.info.configuration["compaction.merge_operators"])
    assert ops == {"total": "sum"}
    got = {r.id: r.total for r in t.to_df().collect()}
    assert got[1] == 15 and got[2] == 20
    # post-rename increments + compaction keep summing
    t.upsert(spark.createDataFrame([(1, None, 2)], "id int, name string, total int"))
    t.compaction(force=True)
    assert {r.id: r.total for r in t.to_df().collect()}[1] == 17


def test_rename_where_filter_and_stats(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.rename_column("v", "val")
    rows = t.to_df(where="val >= 20").collect()
    assert sorted(r.id for r in rows) == [2, 3]


def test_rename_sql_surface(spark, tmp_path):
    ss = StarSession(spark, warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame([(1, "a")], "id int, name string")
    create_table(spark, df, str(tmp_path / "wh" / "r1"),
                 hash_partitions=["id"], hash_bucket_num=2, short_name="r1",
                 warehouse=str(tmp_path / "wh"))
    ss.sql("ALTER TABLE r1 RENAME COLUMN name TO label")
    assert ss.sql("SELECT * FROM r1").columns == ["id", "label"]


def test_rename_cdc_log_serves_new_name(spark, tmp_table_dir):
    from starlake_spark.sources.datasource import table_changes

    t = _mk(spark, tmp_table_dir, extra={"cdf.enabled": "true"})
    t.upsert(spark.createDataFrame([(1, "A", 11)], "id int, name string, v int"))
    t.rename_column("name", "label")
    feed = table_changes(spark, tmp_table_dir, 1, with_change_type=True,
                         with_preimages=True)
    assert "label" in feed.columns and "name" not in feed.columns
    post = {r.id: r.label for r in feed.collect()
            if r._change_type == "update_postimage"}
    assert post == {1: "A"}


def test_drop_renamed_column_blocks_resurrection(spark, tmp_table_dir):
    t = _mk(spark, tmp_table_dir)
    t.rename_column("name", "label")
    t.drop_columns(["label"])
    # bytes still live under the OLD physical name in v1 files: neither
    # name may be re-added until compaction makes the drop physical
    with pytest.raises(ValueError, match="compact"):
        t.add_columns([("label", "string")])
    with pytest.raises(ValueError, match="compact"):
        t.add_columns([("name", "string")])
    t.compaction(force=True)
    t.add_columns([("name", "string")])
    assert {r.name for r in t.to_df().collect()} == {None}


def test_time_travel_reads_schema_as_of(spark, tmp_table_dir):
    """Versioned schema: a time-travel read shows the columns the
    table had AT that commit — a later rename or drop doesn't leak
    backward, and the latest read uses the live schema."""
    t = _mk(spark, tmp_table_dir)                                      # v1
    t.upsert(spark.createDataFrame([(2, "B", 22)],
                                   "id int, name string, v int"))      # v2
    t.rename_column("name", "label")
    t.upsert(spark.createDataFrame([(3, "C", 33)],
                                   "id int, label string, v int"))     # v3
    assert "label" in t.to_df().columns
    old = t.to_df(version=2)
    assert "name" in old.columns and "label" not in old.columns
    assert {r.id: r.name for r in old.collect()} == {1: "a", 2: "B", 3: "c"}
    t.drop_columns(["label"])
    t.upsert(spark.createDataFrame([(1, 99)], "id int, v int"))        # v4
    assert "label" not in t.to_df().columns
    assert {r.id: r.label for r in t.to_df(version=3).collect()} == \
        {1: "a", 2: "B", 3: "C"}
