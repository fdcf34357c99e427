"""Single-commit tombstone+upsert fold (optimization round 10):
``dml.upsert_with_tombstones`` applies one refresh/sync cycle's deletes
and postimages as ONE delta commit (commit_type ``mixed_delta``) —
one write job + one manifest version instead of the old delete_keys /
upsert pair. These tests pin (a) bit-identical final state vs the
sequential pair, including a key hit by BOTH arms (postimage wins),
(b) every CDC surface over a mixed commit (range_changes,
table_changes with/without change types, with_preimages via CDC log
and via derivation, the typed stream source), (c) exactly-once replay
under a txn gate, (d) resurrection semantics after a folded delete,
and (e) the partial-column fallback to the two-commit shape."""

import pytest
from pyspark.sql import functions as F

from starlake_spark.operators import dml
from starlake_spark.sources.datasource import range_changes, table_changes
from starlake_spark.table import create_table

NO_COMPACT = {"compaction.auto": "false", "compaction.maxDeltas": "0"}


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _base(spark, n=20):
    return spark.createDataFrame(
        [(i, i * 10, f"s{i}") for i in range(n)], "k int, v int, s string")


def _build(spark, root, fold: bool):
    t = create_table(spark, _base(spark), root,
                     hash_partitions=["k"], hash_bucket_num=2,
                     configuration=dict(NO_COMPACT))
    ups = spark.createDataFrame(
        [(5, 555, "u5"), (21, 210, "u21"), (7, 777, "u7")],
        "k int, v int, s string")
    dels = spark.createDataFrame([(3,), (7,), (9,)], "k int")  # 7 in both
    if fold:
        t.upsert_with_tombstones(ups, dels)
    else:
        t.delete_keys(dels)
        t.upsert(ups)
    return t


def test_fold_state_matches_sequential(spark, tmp_path):
    a = _build(spark, str(tmp_path / "seq"), fold=False)
    b = _build(spark, str(tmp_path / "fold"), fold=True)
    assert _rows(a.to_df()) == _rows(b.to_df())
    # the fold saves exactly one manifest version
    assert b.store.latest_version() == a.store.latest_version() - 1
    # key in BOTH arms nets to the postimage
    r7 = b.to_df().filter("k = 7").collect()
    assert len(r7) == 1 and r7[0].v == 777


def test_fold_resurrection_semantics(spark, tmp_path):
    # a later full-row upsert resurrects a folded-away key exactly as it
    # resurrects a delete_keys tombstone (explicit nulls at the
    # tombstone version, later version wins)
    a = _build(spark, str(tmp_path / "seq"), fold=False)
    b = _build(spark, str(tmp_path / "fold"), fold=True)
    res = spark.createDataFrame([(9, 999, None)], "k int, v int, s string")
    a.upsert(res)
    b.upsert(res)
    assert _rows(a.to_df()) == _rows(b.to_df())
    r9 = b.to_df().filter("k = 9").collect()
    assert len(r9) == 1 and r9[0].v == 999 and r9[0].s is None


def test_fold_range_changes(spark, tmp_path):
    b = _build(spark, str(tmp_path / "fold"), fold=True)
    ch = range_changes(spark, b.store.table_path, 1,
                       b.store.latest_version())
    got = sorted((r.k, r._change_type) for r in ch.collect())
    assert got == [(3, "delete"), (5, "update_postimage"),
                   (5, "update_preimage"), (7, "update_postimage"),
                   (7, "update_preimage"), (9, "delete"), (21, "insert")]


def test_fold_table_changes_labels_and_guard(spark, tmp_path):
    b = _build(spark, str(tmp_path / "fold"), fold=True)
    tc = table_changes(spark, b.store.table_path, 1, with_change_type=True)
    got = sorted((r.k, r._change_type, r.v) for r in tc.collect())
    assert got == [(3, "delete", None), (5, "update_postimage", 555),
                   (7, "update_postimage", 777), (9, "delete", None),
                   (21, "update_postimage", 210)]
    # append-only view must opt in; then sees postimages only
    with pytest.raises(ValueError, match="mixed_delta"):
        table_changes(spark, b.store.table_path, 1).count()
    ti = table_changes(spark, b.store.table_path, 1, ignore_deletes=True)
    assert sorted(r.k for r in ti.collect()) == [5, 7, 21]


@pytest.mark.parametrize("cdf", [True, False])
def test_fold_with_preimages(spark, tmp_path, cdf):
    cfg = dict(NO_COMPACT)
    if cdf:
        cfg["cdf.enabled"] = "true"
    t = create_table(spark, _base(spark, 10), str(tmp_path / "t"),
                     hash_partitions=["k"], hash_bucket_num=2,
                     configuration=cfg)
    ups = spark.createDataFrame([(4, 444, "u"), (11, 110, "n")],
                                "k int, v int, s string")
    dels = spark.createDataFrame([(2,), (4,)], "k int")
    t.upsert_with_tombstones(ups, dels)
    tc = table_changes(spark, t.store.table_path, 1,
                       with_change_type=True, with_preimages=True)
    got = sorted((r.k, r._change_type, r.v) for r in tc.collect())
    # full fidelity both via the write-time CDC log and the derivation
    assert got == [(2, "delete", 20), (4, "update_postimage", 444),
                   (4, "update_preimage", 40), (11, "insert", 110)]


def test_fold_stream_source(spark, tmp_path):
    from starlake_spark import sources

    sources.register(spark)
    t = create_table(spark, _base(spark, 10), str(tmp_path / "t"),
                     hash_partitions=["k"], hash_bucket_num=2,
                     configuration=dict(NO_COMPACT))
    ups = spark.createDataFrame([(4, 444, "u"), (11, 110, "n")],
                                "k int, v int, s string")
    dels = spark.createDataFrame([(2,), (4,)], "k int")
    t.upsert_with_tombstones(ups, dels)

    def _drain(name, **opts):
        reader = spark.readStream.format("star") \
            .option("startingVersion", "1")
        for k, v in opts.items():
            reader = reader.option(k, v)
        q = (reader.load(t.store.table_path)
             .writeStream.format("memory").queryName(name)
             .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        return spark.sql(f"select * from {name}")

    typed = _drain("fold_typed", changeTypes="true")
    got = sorted((r.k, r._change_type) for r in typed.collect())
    assert got == [(2, "delete"), (4, "update_postimage"),
                   (11, "update_postimage")]
    plain = _drain("fold_plain", ignoreDeletes="true")
    assert sorted(r.k for r in plain.collect()) == [4, 11]


def test_fold_txn_replay_exactly_once(spark, tmp_path):
    t = create_table(spark, _base(spark, 10), str(tmp_path / "t"),
                     hash_partitions=["k"], hash_bucket_num=2,
                     configuration=dict(NO_COMPACT))
    ups = spark.createDataFrame([(6, 666, "x")], "k int, v int, s string")
    dels = spark.createDataFrame([(8,)], "k int")
    dml.upsert_with_tombstones(spark, t.store, ups, dels,
                               txn_app_id="app", txn_version=7)
    v1 = t.store.latest_version()
    dml.upsert_with_tombstones(spark, t.store, ups, dels,
                               txn_app_id="app", txn_version=7)
    assert t.store.latest_version() == v1  # replay = no new commit
    assert t.to_df().filter("k = 8").count() == 0
    assert t.to_df().filter("k = 6 AND v = 666").count() == 1


def test_fold_partial_source_falls_back(spark, tmp_path):
    # a partial-column postimage means "keep existing" under MoR — the
    # fold cannot express that next to a same-commit tombstone, so the
    # call degrades to the proven two-commit sequence
    t = create_table(spark, _base(spark, 10), str(tmp_path / "t"),
                     hash_partitions=["k"], hash_bucket_num=2,
                     configuration=dict(NO_COMPACT))
    v0 = t.store.latest_version()
    ups = spark.createDataFrame([(4, 444)], "k int, v int")  # no 's'
    dels = spark.createDataFrame([(2,)], "k int")
    t.upsert_with_tombstones(ups, dels)
    assert t.store.latest_version() == v0 + 2  # two commits
    r4 = t.to_df().filter("k = 4").collect()
    assert len(r4) == 1 and r4[0].v == 444 and r4[0].s == "s4"  # kept
    assert t.to_df().filter("k = 2").count() == 0


def test_fold_respects_check_invariants(spark, tmp_path):
    # CHECK constraints apply to postimage rows but exempt the
    # tombstone arm (whose data columns are explicit nulls)
    t = create_table(spark, _base(spark, 10), str(tmp_path / "t"),
                     hash_partitions=["k"], hash_bucket_num=2,
                     configuration=dict(NO_COMPACT, **{"check.pos": "v >= 0"}))
    ups = spark.createDataFrame([(4, 444, "u")], "k int, v int, s string")
    dels = spark.createDataFrame([(2,)], "k int")
    t.upsert_with_tombstones(ups, dels)  # tombstone nulls pass
    assert t.to_df().filter("k = 2").count() == 0
    bad = spark.createDataFrame([(5, -5, "b")], "k int, v int, s string")
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.upsert_with_tombstones(bad, spark.createDataFrame([(3,)], "k int"))


def test_fold_partial_source_gate_covers_fallback(spark, tmp_path):
    # ADVICE r10: the txn gate must run BEFORE the partial-source
    # fallback — a replayed gated call used to re-commit tombstones
    # (and an invalid txn pair errored only after the tombstone commit)
    t = create_table(spark, _base(spark, 10), str(tmp_path / "t"),
                     hash_partitions=["k"], hash_bucket_num=2,
                     configuration=dict(NO_COMPACT))
    ups = spark.createDataFrame([(4, 444)], "k int, v int")  # partial
    dels = spark.createDataFrame([(2,)], "k int")
    v0 = t.store.latest_version()
    with pytest.raises(ValueError, match="must be set together"):
        dml.upsert_with_tombstones(spark, t.store, ups, dels,
                                   txn_app_id="app")
    assert t.store.latest_version() == v0  # nothing committed
    dml.upsert_with_tombstones(spark, t.store, ups, dels,
                               txn_app_id="app", txn_version=3)
    v1 = t.store.latest_version()
    assert v1 == v0 + 2  # the two-commit fallback shape
    dml.upsert_with_tombstones(spark, t.store, ups, dels,
                               txn_app_id="app", txn_version=3)
    assert t.store.latest_version() == v1  # replay = no commits at all
