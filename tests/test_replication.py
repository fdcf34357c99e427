"""Cross-table CDC replication (operators/replication.py) and the
delete-by-key-frame primitive it rides on (dml.delete_keys)."""

import os

import pytest
from pyspark.sql import functions as F

from starlake_spark.operators.replication import (SOURCE_PROP, VERSION_PROP,
                                                  sync_table)
from starlake_spark.table import create_table


def _orders(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _mk_src(spark, sf_dir, path, **kw):
    o = _orders(spark, sf_dir)
    kw.setdefault("hash_partitions", ["o_orderkey"])
    kw.setdefault("hash_bucket_num", 4)
    return o, create_table(spark, o, path, **kw)


def _assert_equal(src, dst):
    cols = src.to_df().columns
    a = src.to_df().select(*cols).orderBy(*cols).collect()
    b = dst.to_df().select(*cols).orderBy(*cols).collect()
    assert a == b


def test_bootstrap_then_incremental(spark, sf_dir, tmp_path):
    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"),
                     range_partitions=["o_orderstatus"])
    dst, st = sync_table(spark, src, str(tmp_path / "dst"))
    assert st["mode"] == "bootstrap"
    _assert_equal(src, dst)
    cfg = dst.info.configuration
    assert cfg[SOURCE_PROP] == src.store.table_path
    assert cfg[VERSION_PROP] == "1"

    src.upsert(o.filter("o_orderkey % 10 = 0")
                .withColumn("o_totalprice", F.lit(1.25)))
    src.delete("o_orderkey % 7 = 0", use_delta=True)
    src.upsert(o.filter("o_orderkey % 50 = 3")
                .withColumn("o_orderkey", F.col("o_orderkey") + 900000))
    dst, st = sync_table(spark, src, str(tmp_path / "dst"))
    assert st["mode"] == "incremental" and st["from_version"] == 1
    assert st["upserted"] > 0 and st["deleted"] > 0
    _assert_equal(src, dst)


def test_repeat_sync_is_noop(spark, sf_dir, tmp_path):
    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    dst, _ = sync_table(spark, src, str(tmp_path / "dst"))
    src.upsert(o.limit(0))  # schema-only commit still advances versions
    v = dst.store.latest_version()
    dst, st = sync_table(spark, src, str(tmp_path / "dst"))
    # empty net window: watermark advances, zero data commits on the replica
    assert st["mode"] == "incremental"
    assert st["upserted"] == 0 and st["deleted"] == 0
    assert dst.store.latest_version() == v
    dst, st = sync_table(spark, src, str(tmp_path / "dst"))
    assert st["mode"] == "noop"


def test_crash_retry_is_idempotent(spark, sf_dir, tmp_path):
    """A crash after apply but before the watermark write re-applies the
    same net window on retry — the replica must not diverge."""
    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    sync_table(spark, src, str(tmp_path / "dst"))
    src.update("o_orderkey % 9 = 1", {"o_orderpriority": "'RETRY'"},
               use_delta=True)
    src.delete("o_orderkey % 11 = 2", use_delta=True)
    dst, st = sync_table(spark, src, str(tmp_path / "dst"))
    _assert_equal(src, dst)
    # simulate the crash: rewind the watermark, sync again
    dst.set_properties({VERSION_PROP: "1"})
    dst, st2 = sync_table(spark, src, str(tmp_path / "dst"))
    assert st2["upserted"] == st["upserted"]
    assert st2["deleted"] == st["deleted"]
    _assert_equal(src, dst)


def test_insert_then_delete_nets_to_nothing(spark, sf_dir, tmp_path):
    """Intermediate churn cancels: a key born and killed inside the
    window never reaches the replica (no spurious tombstone commit)."""
    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    sync_table(spark, src, str(tmp_path / "dst"))
    ghost = o.limit(20).withColumn("o_orderkey",
                                   F.col("o_orderkey") + 777000)
    src.upsert(ghost)
    src.delete("o_orderkey >= 777000", use_delta=True)
    dst, st = sync_table(spark, src, str(tmp_path / "dst"))
    assert st["upserted"] == 0 and st["deleted"] == 0
    _assert_equal(src, dst)


def test_replica_rebucket_and_wrong_source_guard(spark, sf_dir, tmp_path):
    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    dst, _ = sync_table(spark, src, str(tmp_path / "dst"), hash_bucket_num=2)
    assert dst.info.bucket_num == 2
    _assert_equal(src, dst)
    _, other = _mk_src(spark, sf_dir, str(tmp_path / "other"))
    with pytest.raises(ValueError, match="replicates"):
        sync_table(spark, other, str(tmp_path / "dst"))
    with pytest.raises(ValueError, match="not a replica"):
        sync_table(spark, src, str(tmp_path / "src"))


def test_full_repair_heals_divergence(spark, sf_dir, tmp_path):
    """full=True reconciles a replica that drifted (local writes): rows
    differing from the source are re-upserted, foreign keys tombstoned."""
    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    dst, _ = sync_table(spark, src, str(tmp_path / "dst"))
    # replica-local corruption requires explicitly unfreezing first —
    # direct DML against a frozen replica refuses (guard tested below)
    dst.set_properties({"replication.frozen": "false"})
    dst.update("o_orderkey = 1", {"o_totalprice": "0.0"}, use_delta=True)
    dst.upsert(o.limit(1).withColumn("o_orderkey", F.lit(123456789)))
    dst, st = sync_table(spark, src, str(tmp_path / "dst"), full=True)
    assert st["mode"] == "full"
    assert st["upserted"] == 1 and st["deleted"] == 1
    _assert_equal(src, dst)
    # clean replica: repair finds nothing
    _, st = sync_table(spark, src, str(tmp_path / "dst"), full=True)
    assert st["upserted"] == 0 and st["deleted"] == 0


def test_frozen_replica_refuses_direct_dml(spark, sf_dir, tmp_path):
    """Replicas are frozen by default: direct DML between syncs would
    be silently overwritten by the next net-window apply, so every
    write-path entry refuses. Unfreezing (replication.frozen=false)
    opens it; full=True repair then re-converges; detaching
    (unset replication.source) lifts the guard for good."""
    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    dst, _ = sync_table(spark, src, str(tmp_path / "dst"))

    one = o.limit(1)
    with pytest.raises(ValueError, match="frozen replica"):
        dst.upsert(one)
    with pytest.raises(ValueError, match="frozen replica"):
        dst.update("o_orderkey = 1", {"o_totalprice": "0.0"})
    with pytest.raises(ValueError, match="frozen replica"):
        dst.delete("o_orderkey = 1")
    with pytest.raises(ValueError, match="frozen replica"):
        dst.delete_keys(one.select("o_orderkey"))
    with pytest.raises(ValueError, match="frozen replica"):
        dst.write(one, mode="append")
    with pytest.raises(ValueError, match="frozen replica"):
        dst.merge(one, "t.o_orderkey = s.o_orderkey", matched_update="*")
    # sync still applies (the guard exempts the replication apply path)
    src.update("o_orderkey % 5 = 0", {"o_orderpriority": "'SYNCED'"},
               use_delta=True)
    dst, st = sync_table(spark, src, str(tmp_path / "dst"))
    assert st["upserted"] > 0
    _assert_equal(src, dst)

    # unfreeze → direct write lands → full repair re-converges
    dst.set_properties({"replication.frozen": "false"})
    dst.update("o_orderkey = 1", {"o_totalprice": "0.0"}, use_delta=True)
    dst, st = sync_table(spark, src, str(tmp_path / "dst"), full=True)
    assert st["upserted"] == 1
    _assert_equal(src, dst)

    # re-freeze, then detach: an ex-replica is an ordinary table
    dst.set_properties({"replication.frozen": "true"})
    with pytest.raises(ValueError, match="frozen replica"):
        dst.upsert(one)
    dst.unset_properties([SOURCE_PROP])
    dst.upsert(one.withColumn("o_orderkey", F.lit(987654321)))
    assert dst.to_df().filter("o_orderkey = 987654321").count() == 1


def test_non_hash_source_rejected(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    src = create_table(spark, o, str(tmp_path / "plain"),
                       range_partitions=["o_orderstatus"])
    with pytest.raises(ValueError, match="hash-partitioned source"):
        sync_table(spark, src, str(tmp_path / "dst"))


# ---------------------------------------------------------------------------
# delete_keys primitive
# ---------------------------------------------------------------------------

def test_delete_keys_basic_and_idempotent(spark, sf_dir, tmp_path):
    o, t = _mk_src(spark, sf_dir, str(tmp_path / "t"))
    doomed = o.filter("o_orderkey % 13 = 5").select("o_orderkey")
    n = o.count() - doomed.count()
    t.delete_keys(doomed)
    assert t.to_df().count() == n
    assert t.to_df().filter("o_orderkey % 13 = 5").count() == 0
    # re-delivery of the same keys (plus never-existing ones) is a no-op
    t.delete_keys(doomed.union(
        spark.createDataFrame([(999999999,)], "o_orderkey long")))
    assert t.to_df().count() == n


def test_delete_keys_guards(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    plain = create_table(spark, o, str(tmp_path / "plain"))
    with pytest.raises(ValueError, match="hash partition"):
        plain.delete_keys(o.select("o_orderkey"))
    t = create_table(spark, o, str(tmp_path / "t"),
                     hash_partitions=["o_orderkey"], hash_bucket_num=2)
    with pytest.raises(ValueError, match="missing merge-key"):
        t.delete_keys(o.select("o_custkey"))
    mo = create_table(
        spark, o, str(tmp_path / "mo"),
        hash_partitions=["o_orderkey"], hash_bucket_num=2,
        configuration={"compaction.merge_operators":
                       '{"o_totalprice": "sum"}'})
    with pytest.raises(ValueError, match="merge operators"):
        mo.delete_keys(o.select("o_orderkey"))


def test_delete_keys_resurrection(spark, sf_dir, tmp_path):
    """Tombstoned keys resurrect on a later upsert with
    insert-after-delete semantics (same contract as condition deletes)."""
    o, t = _mk_src(spark, sf_dir, str(tmp_path / "t"))
    t.delete_keys(o.filter("o_orderkey <= 100").select("o_orderkey"))
    t.upsert(o.filter("o_orderkey <= 40")
              .select("o_orderkey", "o_orderstatus"))
    back = t.to_df().filter("o_orderkey <= 100")
    assert back.count() == o.filter("o_orderkey <= 40").count()
    assert back.filter("o_custkey IS NOT NULL").count() == 0


def test_expired_window_falls_back_to_full(spark, sf_dir, tmp_path):
    """A replica that slept past the source's manifest retention can't
    resolve its watermark version — sync auto-repairs via the full
    state diff instead of failing."""
    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    sync_table(spark, src, str(tmp_path / "dst"))
    for i in range(12):  # march past a checkpoint so expiry has an anchor
        src.upsert(o.filter(f"o_orderkey % 20 = {i}")
                    .withColumn("o_orderpriority", F.lit(f"W{i}")))
    src.delete("o_orderkey % 19 = 3", use_delta=True)
    src.store.expire_manifests(retention_s=0.0)
    with pytest.raises(Exception):
        src.store.snapshot(1)  # the watermark version really is gone
    dst, st = sync_table(spark, src, str(tmp_path / "dst"))
    assert st["mode"] == "full_fallback"
    assert st["upserted"] > 0 and st["deleted"] > 0
    _assert_equal(src, dst)
    _, st2 = sync_table(spark, src, str(tmp_path / "dst"))
    assert st2["mode"] == "noop"


def test_sync_stream_applies_and_restarts(spark, sf_dir, tmp_path):
    """Streaming replication: an availableNow drain applies the typed
    CDF (inserts, upserts, deletes, delete→re-insert collapsed net per
    batch); a restart from the same checkpoint re-commits nothing."""
    from starlake_spark.operators.replication import sync_stream

    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    src.set_properties({"compaction.auto": "false"})
    src.upsert(o.filter("o_orderkey % 10 = 0")
                .withColumn("o_totalprice", F.lit(3.5)))
    src.delete("o_orderkey % 20 = 0", use_delta=True)
    src.upsert(o.filter("o_orderkey % 40 = 0")
                .withColumn("o_orderpriority", F.lit("BACK")))
    dst_path, ckpt = str(tmp_path / "dst"), str(tmp_path / "ckpt")
    q = sync_stream(spark, src, dst_path, ckpt,
                    trigger={"availableNow": True})
    q.awaitTermination(180)
    from starlake_spark.table import StarTable
    dst = StarTable.for_path(spark, dst_path)
    _assert_equal(src, dst)
    v = dst.store.latest_version()
    q2 = sync_stream(spark, src, dst_path, ckpt,
                     trigger={"availableNow": True})
    q2.awaitTermination(180)
    assert dst.store.latest_version() == v, "restart must re-commit nothing"
    # new source commits flow on the next drain
    src.delete("o_orderkey % 9 = 4", use_delta=True)
    q3 = sync_stream(spark, src, dst_path, ckpt,
                     trigger={"availableNow": True})
    q3.awaitTermination(180)
    _assert_equal(src, dst)


def test_sync_stream_guards(spark, sf_dir, tmp_path):
    from starlake_spark.operators.replication import sync_stream

    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    _, other = _mk_src(spark, sf_dir, str(tmp_path / "other"))
    sync_table(spark, src, str(tmp_path / "dst"))
    with pytest.raises(ValueError, match="does not replicate"):
        sync_stream(spark, other, str(tmp_path / "dst"),
                    str(tmp_path / "ck"))


def test_sync_follows_source_schema_evolution(spark, sf_dir, tmp_path):
    """Source ALTER ADD COLUMN between syncs: the replica evolves on the
    next apply and new-column values flow through."""
    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    sync_table(spark, src, str(tmp_path / "dst"))
    src.add_columns([("o_tier", "string")])
    src.upsert(o.filter("o_orderkey % 6 = 0")
                .withColumn("o_tier", F.lit("GOLD")))
    dst, st = sync_table(spark, src, str(tmp_path / "dst"))
    assert "o_tier" in dst.to_df().columns
    assert (dst.to_df().filter("o_tier = 'GOLD'").count()
            == src.to_df().filter("o_tier = 'GOLD'").count())
    _assert_equal(src, dst)


def test_randomized_dml_storm_differential(spark, sf_dir, tmp_path):
    """Property-style soak: a seeded random storm of upserts (full and
    partial column), tombstone deletes, updates, and compactions on the
    source, with a sync after every few commits — the replica must
    equal the source after every sync."""
    import random

    rng = random.Random(42)
    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    src.set_properties({"compaction.auto": "false"})
    sync_table(spark, src, str(tmp_path / "dst"))
    n_synced = 0
    for step in range(12):
        op = rng.choice(["upsert", "partial", "delete", "update",
                         "compact"])
        m, r = rng.randint(3, 17), rng.randint(0, 2)
        if op == "upsert":
            src.upsert(o.filter(f"o_orderkey % {m} = {r}")
                        .withColumn("o_totalprice",
                                    F.lit(float(step) + 0.5)))
        elif op == "partial":
            src.upsert(o.filter(f"o_orderkey % {m} = {r}")
                        .select("o_orderkey",
                                F.lit(f"S{step}").alias("o_orderstatus")))
        elif op == "delete":
            src.delete(f"o_orderkey % {m} = {r}", use_delta=True)
        elif op == "update":
            src.update(f"o_orderkey % {m} = {r}",
                       {"o_orderpriority": f"'P{step}'"}, use_delta=True)
        else:
            src.compaction(force=True)
        if step % 3 == 2:
            dst, st = sync_table(spark, src, str(tmp_path / "dst"))
            n_synced += 1
            _assert_equal(src, dst)
    assert n_synced >= 3


def test_replication_chain(spark, sf_dir, tmp_path):
    """A replica is a normal table: C can replicate B while B replicates
    A — changes propagate down the chain, sync by sync."""
    o, a = _mk_src(spark, sf_dir, str(tmp_path / "a"))
    b, _ = sync_table(spark, a, str(tmp_path / "b"))
    c, _ = sync_table(spark, b, str(tmp_path / "c"))
    a.update("o_orderkey % 4 = 1", {"o_orderpriority": "'CHAIN'"},
             use_delta=True)
    a.delete("o_orderkey % 25 = 0", use_delta=True)
    b, st_b = sync_table(spark, a, str(tmp_path / "b"))
    c, st_c = sync_table(spark, b, str(tmp_path / "c"))
    assert st_b["mode"] == st_c["mode"] == "incremental"
    assert st_c["deleted"] > 0
    _assert_equal(a, b)
    _assert_equal(b, c)


def test_crash_between_apply_commits_converges(spark, sf_dir, tmp_path,
                                               monkeypatch):
    """A mixed window applies as ONE commit (upsert_with_tombstones) —
    the old crash-between-the-pair window is gone by construction. A
    crash DURING the apply leaves the watermark unadvanced; the retry
    re-applies the whole window and converges — no lost deletes, no
    dup rows."""
    from starlake_spark.operators import dml

    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    sync_table(spark, src, str(tmp_path / "dst"))
    src.upsert(o.filter("o_orderkey % 8 = 1")
                .withColumn("o_totalprice", F.lit(77.0)))
    src.delete("o_orderkey % 8 = 2", use_delta=True)

    real = dml.upsert_with_tombstones
    calls = {"n": 0}

    def dying(spark_, store, source, tomb_keys, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash during window apply")
        return real(spark_, store, source, tomb_keys, **kw)

    monkeypatch.setattr(dml, "upsert_with_tombstones", dying)
    with pytest.raises(RuntimeError, match="simulated crash"):
        sync_table(spark, src, str(tmp_path / "dst"))
    # watermark must NOT have advanced past the failed apply
    from starlake_spark.table import StarTable

    dst = StarTable.for_path(spark, str(tmp_path / "dst"))
    assert dst.info.configuration[VERSION_PROP] == "1"
    dst, st = sync_table(spark, src, str(tmp_path / "dst"))
    assert st["mode"] == "incremental" and calls["n"] == 2
    _assert_equal(src, dst)


def test_stream_bootstrapped_replica_batch_adoption(spark, sf_dir,
                                                    tmp_path):
    """A sync_stream-bootstrapped replica has no version watermark —
    batch sync_table must refuse incremental clearly, and full=True
    adopts it into batch watermarking."""
    from starlake_spark.operators.replication import sync_stream

    o, src = _mk_src(spark, sf_dir, str(tmp_path / "src"))
    q = sync_stream(spark, src, str(tmp_path / "dst"),
                    str(tmp_path / "ck"), trigger={"availableNow": True})
    q.awaitTermination(180)
    with pytest.raises(ValueError, match="stream-managed"):
        sync_table(spark, src, str(tmp_path / "dst"))
    dst, st = sync_table(spark, src, str(tmp_path / "dst"), full=True)
    assert st["mode"] == "full"
    _assert_equal(src, dst)
    src.delete("o_orderkey % 3 = 0", use_delta=True)
    dst, st = sync_table(spark, src, str(tmp_path / "dst"))
    assert st["mode"] == "incremental" and st["deleted"] > 0
    _assert_equal(src, dst)
