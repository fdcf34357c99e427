"""Delta-encoded version manifests (log + checkpoint, Delta-style).

A commit serializes only the partitions it touched plus a base-version
pointer; every FULL_SNAPSHOT_INTERVAL-th version is a full checkpoint.
At 100 TB this is the difference between committing kilobytes and
hundreds of megabytes of manifest JSON per write — the reference gets
the same property from Cassandra's per-partition rows
(meta/MetaTableManage.scala:48-286)."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from starlake_spark.meta import ManifestStore
from starlake_spark.table import StarTable, create_table


def _version_states(path):
    out = {}
    for f in glob.glob(os.path.join(path, "_star_meta", "versions", "*.json")):
        d = json.load(open(f))
        out[d["version"]] = d
    return out


@pytest.fixture()
def orders(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/orders.parquet")


def test_delta_files_carry_only_touched_partitions(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    t = create_table(spark, orders, path, range_partitions=["o_orderstatus"])
    statuses = sorted(r[0] for r in
                      orders.select("o_orderstatus").distinct().collect())
    assert len(statuses) >= 3
    # touch exactly one partition
    t.write(orders.filter(F.col("o_orderstatus") == statuses[0]).limit(5),
            mode="append")
    states = _version_states(path)
    d = states[2]
    assert d["base_version"] == 1
    assert list(d["partitions"]) == [f"o_orderstatus={statuses[0]}"]
    assert d["removed_partitions"] == []
    # untouched partitions resolve through the chain identically
    t2 = StarTable.for_path(spark, path)
    assert t2.to_df().count() == orders.count() + 5
    snap = ManifestStore(path).snapshot()
    assert set(snap.partitions) == {f"o_orderstatus={s}" for s in statuses}


def test_removed_partition_recorded_and_resolved(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    t = create_table(spark, orders, path, range_partitions=["o_orderstatus"])
    statuses = sorted(r[0] for r in
                      orders.select("o_orderstatus").distinct().collect())
    rv = f"o_orderstatus={statuses[0]}"
    t.drop_partition(rv)
    states = _version_states(path)
    d = states[2]
    assert "base_version" in d and d["removed_partitions"] == [rv]
    assert d["partitions"] == {}
    snap = ManifestStore(path).snapshot()
    assert rv not in snap.partitions
    assert t.to_df().count() == orders.filter(
        F.col("o_orderstatus") != statuses[0]).count()
    # time travel to the pre-drop version still sees it
    assert rv in ManifestStore(path).snapshot(1).partitions


def test_checkpoint_interval_and_chain_equivalence(spark, orders, tmp_path):
    """Every version resolved through the delta chain equals the state
    a fresh reader computes; checkpoints land on the interval."""
    path = str(tmp_path / "t")
    t = create_table(spark, orders, path, range_partitions=["o_orderstatus"],
                     configuration={"compaction.auto": "false"})
    for i in range(12):
        t.write(orders.limit(2).withColumn("o_totalprice", F.lit(float(i))),
                mode="append")
    states = _version_states(path)
    assert max(states) == 13
    for v, d in states.items():
        if v % 10 == 0:
            assert "base_version" not in d, f"v{v} should be a checkpoint"
        elif v > 0:
            assert d["base_version"] == v - 1
    store = ManifestStore(path)
    for v in sorted(states):
        snap = store.snapshot(v)
        assert snap.version == v
        # file membership is consistent: every referenced file exists
        for f in snap.all_files():
            assert os.path.exists(os.path.join(path, f.path)), (v, f.path)
    # the resolved latest equals a brand-new store's view (no cache bleed)
    a = store.snapshot()
    b = ManifestStore(path).snapshot()
    assert {rv: [f.path for f in ps.files] for rv, ps in a.partitions.items()} \
        == {rv: [f.path for f in ps.files] for rv, ps in b.partitions.items()}


def test_interval_one_disables_deltas(spark, orders, tmp_path):
    path = str(tmp_path / "t")
    t = create_table(spark, orders, path,
                     configuration={"meta.checkpoint.interval": "1"})
    t.write(orders.limit(3), mode="append")
    states = _version_states(path)
    assert all("base_version" not in d for d in states.values())


def test_compaction_shrinks_delta_footprint(spark, orders, tmp_path):
    """After compaction, a delta version file lists the compacted
    partition's (small) file set — manifest bytes per commit track the
    touched partition, not history length."""
    path = str(tmp_path / "t")
    t = create_table(spark, orders, path,
                     hash_partitions=["o_orderkey"], hash_bucket_num=4,
                     configuration={"compaction.auto": "false"})
    for i in range(5):
        t.upsert(orders.limit(3).withColumn("o_totalprice", F.lit(float(i))))
    pre = max(len(json.dumps(d)) for v, d in _version_states(path).items()
              if "base_version" in d)
    t.compaction()
    states = _version_states(path)
    post = len(json.dumps(states[max(states)]))
    assert post < pre
    assert t.to_df().count() == orders.count()


@pytest.mark.parametrize("seed", [17, 43])
def test_delta_encoding_differential_vs_always_full(spark, tmp_path, seed):
    """Differential pin of the delta encoding itself: the SAME random
    DML sequence applied to a checkpoint-interval-10 table and an
    always-full (interval=1) twin must yield identical data at EVERY
    historical version — chain resolution ≡ full-state storage."""
    import random

    from pyspark.sql import types as T
    from tests.test_property_dml import SCHEMA, KEYS, _random_ops

    rng = random.Random(seed)
    base = [(k, rng.randint(0, 99), rng.choice(["a", "b", "c"])) for k in KEYS]
    df = spark.createDataFrame(base, SCHEMA)
    ops = _random_ops(rng, 10)
    tables = {}
    for label, interval in (("full", "1"), ("chain", "10")):
        t = create_table(spark, df, str(tmp_path / label),
                         hash_partitions=["k"], hash_bucket_num=4,
                         configuration={"meta.checkpoint.interval": interval})
        for op, payload in ops:
            if op == "upsert_full":
                t.upsert(spark.createDataFrame(payload, SCHEMA))
            elif op == "upsert_partial":
                t.upsert(spark.createDataFrame(
                    payload, T.StructType([SCHEMA[0], SCHEMA[1]])))
            elif op == "update":
                mod, add, use_delta = payload
                t.update(F.col("k") % mod == 0,
                         {"v": F.coalesce(F.col("v"), F.lit(0)) + add},
                         use_delta=use_delta)
            elif op == "delete":
                mod, use_delta = payload
                t.delete(F.col("k") % mod == 0, use_delta=use_delta)
            else:
                t.compaction(force=True)
        tables[label] = t
    vf = tables["full"].store.list_versions()
    vc = tables["chain"].store.list_versions()
    assert vf == vc, "same op sequence must produce the same commit count"
    states = {v: ("delta" if "base_version" in d else "full")
              for v, d in ((x["version"], x) for x in (
                  json.load(open(os.path.join(
                      str(tmp_path / "chain"), "_star_meta", "versions",
                      f"v{v:012d}.json")))
                  for v in vc))}
    assert "delta" in states.values(), "chain table never delta-encoded"
    for v in vc:
        a = sorted(tuple(r) for r in
                   tables["full"].to_df(version=v).collect())
        b = sorted(tuple(r) for r in
                   tables["chain"].to_df(version=v).collect())
        assert a == b, f"seed={seed}: version {v} diverged"


def test_manifest_log_retention(spark, orders, tmp_path):
    """expire_manifests: versions below the newest out-of-retention
    checkpoint delete; every survivor still resolves; the expired
    versions' exclusive data files become vacuumable; time travel to
    an expired version fails cleanly; recent-only retention is a
    no-op."""
    path = str(tmp_path / "t")
    t = create_table(spark, orders.limit(50), path,
                     configuration={"compaction.auto": "false"})
    for i in range(12):
        t.write(orders.limit(2).withColumn("o_totalprice", F.lit(float(i))),
                mode="append")
    store = ManifestStore(path)
    assert store.latest_version() == 13
    # nothing old enough: no-op
    assert store.expire_manifests(3600) == []
    # retention 0: newest checkpoint below latest is v10 → v<10 expire
    doomed = store.expire_manifests(0, dry_run=True)
    assert doomed == list(range(0, 10))
    assert store.list_versions()[0] == 0  # dry run deleted nothing
    assert store.expire_manifests(0) == doomed
    assert store.list_versions() == [10, 11, 12, 13]
    for v in (10, 11, 12, 13):
        assert ManifestStore(path).snapshot(v).version == v
    assert t.to_df().count() == 50 + 24
    with pytest.raises(Exception, match="does not exist"):
        ManifestStore(path).snapshot(3)
    # a second pass is a no-op (no checkpoint below latest left... v10 is)
    assert store.expire_manifests(0) == []


def test_vacuum_with_manifest_retention_frees_old_files(spark, orders, tmp_path):
    """cleanup(manifest_retention_s=...) expires manifests FIRST, so
    data files referenced only by expired versions vacuum in the same
    pass; current data survives."""
    import time as _time

    from starlake_spark.operators.dml import cleanup as _cleanup

    path = str(tmp_path / "t")
    t = create_table(spark, orders.limit(30), path)
    for i in range(11):
        t.write(orders.limit(30).withColumn("o_totalprice", F.lit(float(i))),
                mode="overwrite")  # each overwrite strands the prior files
    n = t.to_df().count()
    store = ManifestStore(path)
    # age everything (data retention checks mtime)
    old = _time.time() - 7200
    for root, _d, names in os.walk(os.path.join(path, "data")):
        for f in names:
            os.utime(os.path.join(root, f), (old, old))
    removed = _cleanup(store, retention_s=3600, manifest_retention_s=0)
    assert any(p.startswith("_star_meta/versions/") for p in removed)
    assert any(p.startswith("data/") for p in removed)
    t2 = StarTable.for_path(spark, path)
    assert t2.to_df().count() == n
