"""Write-time CDC logging (cdf.enabled): delta DML commits materialize
their typed change rows once under <table>/_cdc/<version>/, and
table_changes(with_preimages=True) reads the log instead of re-deriving
with two key-pruned MoR scans per commit — falling back to derivation
whenever a log is missing. The log must be byte-equivalent to the
derivation (it IS the derivation, persisted), crash-safe, and vacuumed
with the same retention as the versions it describes — or on its own
clock when the ``cdf.retention`` property / cdc_retention_s argument
sets an independent CDC window."""

import os

import pytest
from pyspark.sql import functions as F

from starlake_spark import create_table
from starlake_spark.operators import dml
from starlake_spark.sources import datasource as ds


def _churn(spark, t):
    """upsert → partial upsert → delta update → tombstone delete."""
    t.upsert(spark.createDataFrame(
        [(1, "A", 10), (4, "d", 40)], "id int, name string, v int"))
    t.upsert(spark.createDataFrame([(2, 99)], "id int, v int"))
    t.update("id = 1", {"v": F.col("v") + 1}, use_delta=True)
    t.delete("id = 3", use_delta=True)


def _mk(spark, path, logged: bool):
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 2), (3, "c", 3)], "id int, name string, v int")
    props = {"compaction.auto": "false"}
    if logged:
        props["cdf.enabled"] = "true"
    return create_table(spark, df, path, hash_partitions=["id"],
                        hash_bucket_num=2, configuration=props)


def _feed(spark, path):
    rows = [tuple(r) for r in ds.table_changes(
        spark, path, 0, with_change_type=True, with_preimages=True
    ).collect()]
    return sorted(rows, key=lambda t: [repr(e) for e in t])


def test_logged_feed_equals_derived_feed(spark, tmp_path, monkeypatch):
    ta = _mk(spark, str(tmp_path / "logged"), logged=True)
    tb = _mk(spark, str(tmp_path / "derived"), logged=False)
    _churn(spark, ta)
    _churn(spark, tb)
    # every delta commit of the logged table produced a log dir
    cdc = os.path.join(str(tmp_path / "logged"), dml.CDC_DIR)
    assert sorted(os.listdir(cdc)) == ["2", "3", "4", "5"]
    derived = _feed(spark, str(tmp_path / "derived"))
    # the logged read must never call the derivation
    def _boom(*a, **k):
        raise AssertionError("derivation ran despite a complete CDC log")
    monkeypatch.setattr(ds, "_preimage_changes", _boom)
    logged = _feed(spark, str(tmp_path / "logged"))
    assert logged == derived
    assert len(logged) > 0


def test_missing_log_falls_back_to_derivation(spark, tmp_path):
    import shutil

    t = _mk(spark, str(tmp_path / "t"), logged=True)
    _churn(spark, t)
    full = _feed(spark, str(tmp_path / "t"))
    # simulate a writer that crashed before the rename: drop one log
    shutil.rmtree(os.path.join(str(tmp_path / "t"), dml.CDC_DIR, "3"))
    assert _feed(spark, str(tmp_path / "t")) == full


def test_log_serves_evolved_schema_with_nulls(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), logged=True)
    t.upsert(spark.createDataFrame([(1, "A", 10)], "id int, name string, v int"))
    # schema evolves AFTER the v2 log was written
    t.upsert(spark.createDataFrame([(2, "B", 20, "x")],
                                   "id int, name string, v int, extra string"))
    rows = {(r.id, r._commit_version, r._change_type): r.extra
            for r in ds.table_changes(spark, str(tmp_path / "t"), 0,
                                      with_change_type=True,
                                      with_preimages=True).collect()}
    # pre-evolution log serves the new column as a typed null
    assert rows[(1, 2, "update_postimage")] is None
    assert rows[(2, 3, "update_postimage")] == "x"
    assert rows[(2, 3, "update_preimage")] is None


def test_vacuum_reaps_expired_logs_keeps_latest(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), logged=True)
    _churn(spark, t)
    cdc = os.path.join(str(tmp_path / "t"), dml.CDC_DIR)
    assert len(os.listdir(cdc)) == 4
    removed = dml.cleanup(t.store, retention_s=0)
    left = sorted(os.listdir(cdc))
    assert left == ["5"]                        # latest version's log kept
    assert any(p.startswith(dml.CDC_DIR) for p in removed)
    # feed still correct end-to-end: reaped commits derive, v5 reads its log
    derived_twin = _mk(spark, str(tmp_path / "twin"), logged=False)
    _churn(spark, derived_twin)
    assert _feed(spark, str(tmp_path / "t")) == _feed(spark, str(tmp_path / "twin"))


def test_failed_logger_degrades_to_derivation(spark, tmp_path, monkeypatch):
    """A CDC logger failure must not fail the DML (the data commit
    already landed); the feed silently derives that commit instead."""
    import warnings

    t = _mk(spark, str(tmp_path / "t"), logged=True)

    def _boom(*a, **k):
        raise RuntimeError("disk gremlin")
    monkeypatch.setattr(ds, "_preimage_changes", _boom)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        t.upsert(spark.createDataFrame([(1, "A", 10)],
                                       "id int, name string, v int"))
    assert any("CDC log" in str(w.message) for w in caught)
    monkeypatch.undo()
    got = {r.id: r.name for r in t.to_df().collect()}
    assert got[1] == "A"                       # the DML landed
    feed = _feed(spark, str(tmp_path / "t"))   # derivation serves v2
    assert any(r[-1] == "update_postimage" for r in feed)


def test_cdf_retention_knob_expires_logs_independently(spark, tmp_path):
    """cdf.retention (table property, seconds) bounds `_cdc/` on its
    own clock: with LONG data retention, every change log older than
    the CDC window is reaped — including the latest version's — while
    all data files and manifests stay; the feed re-derives and stays
    byte-identical to an unlogged twin. An explicit cdc_retention_s
    argument overrides the property."""
    t = _mk(spark, str(tmp_path / "t"), logged=True)
    _churn(spark, t)
    cdc = os.path.join(str(tmp_path / "t"), dml.CDC_DIR)
    assert len(os.listdir(cdc)) == 4
    n_versions = len(t.store.list_versions())

    # long data retention + 0s CDC property: only CDC dirs reap
    t.set_properties({"cdf.retention": "0"})
    removed = t.cleanup(retention_s=10**9)
    assert os.listdir(cdc) == []
    assert all(p.startswith(dml.CDC_DIR) for p in removed), removed
    assert len(t.store.list_versions()) == n_versions
    # feed still correct: every commit falls back to derivation
    twin = _mk(spark, str(tmp_path / "twin"), logged=False)
    _churn(spark, twin)
    assert _feed(spark, str(tmp_path / "t")) == _feed(spark, str(tmp_path / "twin"))

    # argument override beats the property: regenerate logs, keep them
    t.update("id = 4", {"v": F.col("v") + 1}, use_delta=True)
    assert len(os.listdir(cdc)) == 1
    removed2 = t.cleanup(retention_s=10**9, cdc_retention_s=10**9)
    assert len(os.listdir(cdc)) == 1 and not removed2


def test_cdf_retention_default_unchanged(spark, tmp_path):
    """Without the property, CDC logs keep aging with data retention
    (latest version's log survives a 0s sweep as before)."""
    t = _mk(spark, str(tmp_path / "t2"), logged=True)
    _churn(spark, t)
    cdc = os.path.join(str(tmp_path / "t2"), dml.CDC_DIR)
    dml.cleanup(t.store, retention_s=0)
    assert sorted(os.listdir(cdc)) == ["5"]
