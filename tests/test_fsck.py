"""FSCK consistency check + repair (StarTable.fsck)."""

import os

import pytest
from pyspark.sql import functions as F

from starlake_spark.table import StarTable, create_table


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _abs(t, p):
    return p if os.path.isabs(p) else os.path.join(t.store.table_path, p)


def test_fsck_clean_table(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    t = create_table(spark, o, str(tmp_path / "t"),
                     range_partitions=["o_orderstatus"])
    assert t.fsck() == []
    assert t.fsck(deep=True) == []


def test_fsck_detects_and_repairs_missing_files(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    t = create_table(spark, o, str(tmp_path / "t"),
                     range_partitions=["o_orderstatus"])
    snap = t.store.snapshot()
    doomed = snap.partitions["o_orderstatus=F"].files
    for f in doomed:
        os.remove(_abs(t, f.path))
    issues = t.fsck()
    assert {i["kind"] for i in issues} == {"missing_file"}
    assert len(issues) == len(doomed)
    assert all(i["partition"] == "o_orderstatus=F" and i["repairable"]
               for i in issues)
    with pytest.raises(Exception):
        t.to_df().count()  # unreadable before repair
    t.fsck(repair=True)
    assert t.fsck() == []
    assert t.count() == o.filter("o_orderstatus <> 'F'").count()
    # repair is invisible to the change feed (rows are unrecoverable)
    from starlake_spark.sources.datasource import table_changes

    v = t.store.latest_version()
    ch = table_changes(spark, t.store.table_path, start_version=v - 1,
                       end_version=v, with_change_type=True)
    assert ch.count() == 0


def test_fsck_deep_detects_row_count_mismatch(spark, sf_dir, tmp_path):
    import pyarrow.parquet as pq

    o = _orders(spark, sf_dir)
    t = create_table(spark, o, str(tmp_path / "t"))
    f = t.store.snapshot().all_files().__iter__().__next__()
    ap = _abs(t, f.path)
    tbl = pq.read_table(ap)
    pq.write_table(tbl.slice(0, max(1, tbl.num_rows // 2)), ap)
    assert t.fsck() == []  # metadata pass can't see truncation
    issues = t.fsck(deep=True)
    assert [i["kind"] for i in issues] == ["row_count_mismatch"]
    assert not issues[0]["repairable"]


def test_fsck_missing_dv_sidecar_is_irreparable(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    t = create_table(spark, o, str(tmp_path / "t"),
                     range_partitions=["o_orderstatus"])
    t.delete("o_custkey % 10 = 3", use_dv=True)
    dvs = [d for ps in t.store.snapshot().partitions.values()
           for d in ps.dv_files]
    assert dvs
    os.remove(_abs(t, dvs[0].path))
    issues = t.fsck()
    assert issues and issues[0]["kind"] == "missing_dv_sidecar"
    assert not issues[0]["repairable"]
    t.fsck(repair=True)  # must NOT silently drop the vector ref
    assert any(i["kind"] == "missing_dv_sidecar" for i in t.fsck())


def test_fsck_reports_unresolvable_versions(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    t = create_table(spark, o, str(tmp_path / "t"),
                     hash_partitions=["o_orderkey"], hash_bucket_num=2,
                     configuration={"compaction.auto": "false"})
    for i in range(11):  # march past a checkpoint so latest stays safe
        t.upsert(o.filter(f"o_orderkey % 30 = {i}")
                  .withColumn("o_orderpriority", F.lit(f"V{i}")))
    vdir = os.path.join(t.store.table_path, "_star_meta", "versions")
    victim = sorted(os.listdir(vdir))[0]  # v1: base of the early chain
    os.remove(os.path.join(vdir, victim))
    issues = t.fsck()
    kinds = {i["kind"] for i in issues}
    assert kinds == {"unresolvable_version"}
    assert len(issues) >= 1
    t.count()  # latest resolves from the checkpoint — still readable


def test_fsck_reports_orphan_files(spark, sf_dir, tmp_path):
    """Crashed-writer leftovers (files no retained version references)
    are reported, never deleted by repair; vacuum removes them."""
    o = _orders(spark, sf_dir)
    t = create_table(spark, o, str(tmp_path / "t"),
                     range_partitions=["o_orderstatus"])
    stray = os.path.join(t.store.table_path, "data", "stray-attempt.parquet")
    o.limit(1).toPandas().to_parquet(stray)
    issues = t.fsck()
    assert [i["kind"] for i in issues] == ["orphan_file"]
    assert "stray-attempt" in issues[0]["path"]
    t.fsck(repair=True)
    assert os.path.exists(stray), "repair must never delete bytes"
    t.cleanup(retention_s=0.0)
    assert not os.path.exists(stray)
    assert t.fsck() == []
