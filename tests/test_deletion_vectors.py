"""Deletion vectors (Delta DV analog) on non-hash tables: DELETE/UPDATE
without rewriting a single data file — sidecar (file, position) lists
anti-joined at scan time, materialized by compaction, surfaced as real-
valued delete/preimage rows in the CDF, exact under metadata-only
count(), preserved across time travel / restore / clone."""

import os

import pytest
from pyspark.sql import functions as F

from starlake_spark.table import create_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


def _mk(spark, orders, path, **cfg):
    return create_table(spark, orders, path,
                        range_partitions=["o_orderstatus"],
                        configuration=cfg or None)


def test_delete_rewrites_nothing_and_filters_exactly(spark, orders, tmp_path):
    t = _mk(spark, orders, str(tmp_path / "t"))
    n0, paths0 = t.count(), {f.path for f in t.store.snapshot().all_files()}
    dead = orders.filter("o_custkey % 10 = 3").count()
    t.delete("o_custkey % 10 = 3", use_dv=True)
    assert {f.path for f in t.store.snapshot().all_files()} == paths0
    assert t.count() == n0 - dead          # metadata-only, DV-exact
    assert t.to_df().count() == n0 - dead  # scan (anti-join) agrees
    assert t.to_df(where="o_custkey % 10 = 3").count() == 0
    # overlapping second delete never double-counts (candidates are
    # DV-filtered, so positions are recorded at most once)
    t.delete("o_custkey % 10 IN (3, 4)", use_dv=True)
    dead2 = orders.filter("o_custkey % 10 IN (3, 4)").count()
    assert t.count() == n0 - dead2 == t.to_df().count()
    assert t.stats()["dv_dead_rows"] == dead2


def test_noop_delete_makes_no_commit(spark, orders, tmp_path):
    t = _mk(spark, orders, str(tmp_path / "t"))
    v = t.store.latest_version()
    t.delete("o_custkey = -12345", use_dv=True)
    assert t.store.latest_version() == v
    assert not any(ps.dv_files
                   for ps in t.store.snapshot().partitions.values())


def test_dv_update_is_o_changed_rows(spark, orders, tmp_path):
    t = _mk(spark, orders, str(tmp_path / "t"))
    n0 = t.to_df().count()
    base_paths = {f.path for f in t.store.snapshot().all_files()}
    t.update("o_custkey = 5", {"o_orderpriority": "'X-UPD'"}, use_dv=True)
    snap = t.store.snapshot()
    # base files untouched; only small postimage files appended
    assert base_paths <= {f.path for f in snap.all_files()}
    assert t.to_df().count() == n0
    rows = t.to_df().filter("o_custkey = 5")
    assert rows.count() == orders.filter("o_custkey = 5").count()
    assert rows.filter("o_orderpriority != 'X-UPD'").count() == 0
    # updated rows keep their other columns
    want = {r["o_orderkey"] for r in
            orders.filter("o_custkey = 5").collect()}
    assert {r["o_orderkey"] for r in rows.collect()} == want


def test_compaction_materializes_and_count_survives(spark, orders, tmp_path):
    t = _mk(spark, orders, str(tmp_path / "t"))
    t.delete("o_custkey % 7 = 1", use_dv=True)
    live = t.to_df().count()
    t.compaction(force=True)
    snap = t.store.snapshot()
    assert all(not ps.dv_files for ps in snap.partitions.values())
    assert t.count() == live == t.to_df().count()


def test_dml_dv_enabled_property_routes(spark, orders, tmp_path):
    t = _mk(spark, orders, str(tmp_path / "t"), **{"dml.dv.enabled": "true"})
    paths0 = {f.path for f in t.store.snapshot().all_files()}
    t.delete("o_custkey % 5 = 2")  # routed to DV by the property
    assert {f.path for f in t.store.snapshot().all_files()} == paths0
    assert t.store.snapshot().commit_type == "delete_dv"
    assert t.to_df().count() == orders.filter("o_custkey % 5 != 2").count()


def test_dv_rejected_on_hash_tables(spark, orders, tmp_path):
    t = create_table(spark, orders, str(tmp_path / "h"),
                     hash_partitions=["o_orderkey"], hash_bucket_num=4)
    with pytest.raises(ValueError, match="non-hash"):
        t.delete("o_custkey = 1", use_dv=True)
    with pytest.raises(ValueError, match="non-hash"):
        t.update("o_custkey = 1", {"o_orderpriority": "'x'"}, use_dv=True)


def test_time_travel_and_restore(spark, orders, tmp_path):
    t = _mk(spark, orders, str(tmp_path / "t"))
    n0 = orders.count()
    t.delete("o_custkey % 10 = 3", use_dv=True)     # v2
    live = t.to_df().count()
    assert t.to_df(version=1).count() == n0
    t.restore(1)
    assert t.to_df().count() == n0
    t.restore(2)
    assert t.to_df().count() == live and t.count() == live


def test_cow_rewrite_on_dv_partition_stays_exact(spark, orders, tmp_path):
    """A CoW UPDATE touching a DV'd partition must not resurrect
    vectored rows (the partition rewrites wholesale and the vectors
    clear)."""
    t = _mk(spark, orders, str(tmp_path / "t"))
    t.delete("o_custkey % 10 = 3", use_dv=True)
    live = t.to_df().count()
    t.update("o_custkey = 8", {"o_orderpriority": "'Y-UPD'"})  # CoW path
    assert t.to_df().count() == live
    assert t.to_df().filter("o_custkey % 10 = 3").count() == 0
    got = t.to_df().filter("o_custkey = 8")
    assert got.count() > 0
    assert got.filter("o_orderpriority != 'Y-UPD'").count() == 0
    # the touched partitions' vectors materialized away
    snap = t.store.snapshot()
    touched_rvs = {r[0] for r in orders.filter("o_custkey = 8")
                   .select("o_orderstatus").distinct().collect()}
    for rv, ps in snap.partitions.items():
        if rv.split("=")[-1] in touched_rvs:
            assert not ps.dv_files


def test_small_file_compaction_skips_dv_partitions(spark, orders, tmp_path):
    t = _mk(spark, orders, str(tmp_path / "t"))
    t.write(orders.limit(50), mode="append")
    t.delete("o_custkey % 10 = 3", use_dv=True)
    live = t.to_df().count()
    t.compact_small_files(threshold_bytes=1 << 30)
    assert t.to_df().count() == live  # no resurrection


def test_dv_auto_compact_backstop(spark, orders, tmp_path):
    t = _mk(spark, orders, str(tmp_path / "t"),
            **{"compaction.dv.max": "3"})
    for i in range(4):
        t.delete(f"o_custkey % 31 = {i}", use_dv=True)
    snap = t.store.snapshot()
    assert max((len(ps.dv_files)
                for ps in snap.partitions.values()), default=0) < 3
    assert t.to_df().count() == \
        orders.filter("o_custkey % 31 NOT IN (0,1,2,3)").count()


def test_clones_carry_deletions(spark, orders, tmp_path):
    t = _mk(spark, orders, str(tmp_path / "t"))
    t.delete("o_custkey % 7 = 2", use_dv=True)
    live = t.to_df().count()
    sc = t.clone(str(tmp_path / "sc"), shallow=True)
    dc = t.clone(str(tmp_path / "dc"), shallow=False)
    assert sc.to_df().count() == live and sc.count() == live
    assert dc.to_df().count() == live and dc.count() == live
    # deep clone is self-contained: works after the source vanishes
    import shutil
    shutil.rmtree(str(tmp_path / "t"))
    assert dc.to_df().count() == live


def test_symlink_export_refuses_dv_snapshots(spark, orders, tmp_path):
    t = _mk(spark, orders, str(tmp_path / "t"))
    t.delete("o_custkey % 7 = 2", use_dv=True)
    with pytest.raises(ValueError, match="deletion vectors"):
        t.generate_symlink_manifest()
    t.compaction(force=True)
    assert t.generate_symlink_manifest()


def test_vacuum_keeps_live_dvs_sweeps_dead_ones(spark, orders, tmp_path):
    t = _mk(spark, orders, str(tmp_path / "t"))
    t.delete("o_custkey % 7 = 2", use_dv=True)
    live = t.to_df().count()
    dv_paths = [d.path for ps in t.store.snapshot().partitions.values()
                for d in ps.dv_files]
    assert dv_paths
    removed = t.cleanup(retention_s=0.0)
    # live snapshot's DVs must survive an aggressive vacuum
    assert all(os.path.exists(os.path.join(t.store.table_path, p))
               for p in dv_paths)
    assert t.to_df().count() == live
