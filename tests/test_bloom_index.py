"""File-level Bloom index (operators/bloom.py): build/probe hash
bit-exactness (no false negatives — a pruned file can NEVER hold the
probed key), absent-key pruning actually fires where min/max stats
can't, MoR key-column safety, clone ref retargeting."""

import os
import random

import pytest
from pyspark.sql import functions as F

from starlake_spark.operators import bloom
from starlake_spark.table import StarTable, create_table

SF = "/root/testdata/sf0.001"
PROPS = {"bloom.file.cols": "o_custkey,o_orderpriority",
         "write.files.per.partition": "8"}


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF}/orders.parquet")


@pytest.fixture(scope="module")
def btab(spark, orders, tmp_path_factory):
    # salted multi-file layout: every file's [min, max] on o_custkey
    # spans ~the whole domain, so stats pruning keeps everything and
    # any observed skipping is the bloom layer's doing
    path = str(tmp_path_factory.mktemp("bloom") / "t")
    return create_table(spark, orders, path, configuration=PROPS)


def test_sidecar_written_and_refs_set(btab):
    files = btab.store.snapshot().all_files()
    assert len(files) >= 4
    for f in files:
        assert f.bloom_ref and f.bloom_ref.startswith("_star_meta/bloom/")
    side = bloom.load_sidecar(
        os.path.join(btab.store.table_path, files[0].bloom_ref))
    base = os.path.join(btab.store.table_path, files[0].path)
    for col in ("o_custkey", "o_orderpriority"):
        m, k, bits = side[(base, col)]
        assert k == bloom.BLOOM_K and m % 8 == 0 and len(bits) == m // 8


def test_present_keys_never_lost(spark, btab, orders):
    """The no-false-negative theorem, differentially: every probed
    PRESENT key must return exactly the unfiltered-scan rows — this
    pins the pure-Python murmur3 double-hash twin against the JVM
    build kernel (one bit of disagreement loses rows)."""
    rng = random.Random(7)
    custkeys = [r[0] for r in orders.select("o_custkey").distinct().collect()]
    prios = [r[0] for r in orders.select("o_orderpriority").distinct().collect()]
    for ck in rng.sample(custkeys, 12):
        got = btab.to_df(where=f"o_custkey = {ck}").count()
        want = orders.filter(F.col("o_custkey") == ck).count()
        assert got == want > 0, f"o_custkey={ck}"
    for pr in prios:
        got = btab.to_df(where=f"o_orderpriority = '{pr}'").count()
        want = orders.filter(F.col("o_orderpriority") == pr).count()
        assert got == want > 0, f"o_orderpriority={pr}"
    # IN-list across both present and absent members
    ks = rng.sample(custkeys, 3)
    pred = f"o_custkey IN ({ks[0]}, {ks[1]}, {ks[2]}, -99999)"
    assert btab.to_df(where=pred).count() == \
        orders.filter(F.expr(pred)).count() > 0


def test_absent_keys_prune_files(btab):
    n_files = len(btab.store.snapshot().all_files())
    # stats can't prune (salted layout ⇒ every file spans the domain)…
    # …but bloom prunes absent keys: with fpp≈1%/file the chance one
    # absent probe keeps ANY of the files is small; over 10 probes the
    # total pruned count must be large
    kept = 0
    for v in range(10_000_000, 10_000_010):
        df = btab.to_df(where=f"o_custkey = {v}")
        kept += len(df.inputFiles())
        assert df.count() == 0
    assert kept < n_files * 10 * 0.5
    # absent string keys too
    df = btab.to_df(where="o_orderpriority = 'NO-SUCH-PRIORITY'")
    assert len(df.inputFiles()) < n_files and df.count() == 0


def test_mor_key_bloom_and_non_key_safety(spark, orders, tmp_path):
    """Hash table with deltas: bloom on the KEY column may prune
    pre-merge files; bloom on a NON-key column must NOT (the merged
    row's latest value can live in a file the old value wrote)."""
    t = create_table(
        spark, orders, str(tmp_path / "m"),
        hash_partitions=["o_orderkey"], hash_bucket_num=4,
        configuration={"bloom.file.cols": "o_orderkey,o_orderstatus"})
    some = [r[0] for r in orders.select("o_orderkey").limit(3).collect()]
    upd = (orders.filter(F.col("o_orderkey").isin(some))
           .withColumn("o_orderstatus", F.lit("Z")))
    t.upsert(upd)
    for k in some:
        row = t.to_df(where=f"o_orderkey = {k}").collect()
        assert len(row) == 1 and row[0]["o_orderstatus"] == "Z"
    # non-key equality on the NEW value: the delta file holds it, the
    # base file's bloom would say absent — rows must still all arrive
    got = t.to_df(where="o_orderstatus = 'Z'").count()
    assert got == len(some)


def test_update_delete_keep_blooms_fresh(spark, orders, tmp_path):
    t = create_table(spark, orders, str(tmp_path / "u"),
                     configuration=dict(PROPS))
    t.update("o_custkey = 7", {"o_orderpriority": "'updated'"})
    assert t.to_df(where="o_custkey = 7").filter(
        "o_orderpriority = 'updated'").count() == \
        t.to_df().filter("o_custkey = 7").count() > 0
    n_before = t.to_df().count()
    t.delete("o_custkey = 7")
    assert t.to_df(where="o_custkey = 7").count() == 0
    assert t.to_df().count() < n_before


def test_shallow_clone_keeps_probing(spark, btab, orders, tmp_path):
    c = btab.clone(str(tmp_path / "c"), shallow=True)
    files = c.store.snapshot().all_files()
    assert all(f.bloom_ref and os.path.isabs(f.bloom_ref) for f in files)
    ck = orders.select("o_custkey").first()[0]
    assert c.to_df(where=f"o_custkey = {ck}").count() == \
        orders.filter(F.col("o_custkey") == ck).count()
    df = c.to_df(where="o_custkey = 10000001")
    assert df.count() == 0 and len(df.inputFiles()) < len(files)


def test_compaction_rebuilds_blooms(spark, orders, tmp_path):
    t = create_table(spark, orders, str(tmp_path / "k"),
                     configuration=dict(PROPS))
    ref0 = t.store.snapshot().all_files()[0].bloom_ref
    t.compaction(force=True, sort_columns=["o_orderkey"])
    files = t.store.snapshot().all_files()
    assert files and all(f.bloom_ref and f.bloom_ref != ref0 for f in files)
    ck = orders.select("o_custkey").first()[0]
    assert t.to_df(where=f"o_custkey = {ck}").count() == \
        orders.filter(F.col("o_custkey") == ck).count()


def test_vacuum_sweeps_dead_bloom_sidecars(spark, orders, tmp_path):
    """Sidecar lifecycle: compaction supersedes the create commit's
    bitmaps; vacuum past retention removes the DEAD commit's sidecar
    parquet while the live one stays and probes still skip. fsck
    reports the orphan before the sweep and is clean after."""
    t = create_table(spark, orders, str(tmp_path / "v"),
                     configuration=dict(PROPS))
    dead_refs = {f.bloom_ref for f in t.store.snapshot().all_files()}
    t.compaction(force=True, sort_columns=["o_orderkey"])
    live_refs = {f.bloom_ref for f in t.store.snapshot().all_files()}
    assert dead_refs.isdisjoint(live_refs)

    root = t.store.table_path
    # the dead commit's sidecar is still referenced by the retained old
    # version (time travel) — NOT an fsck orphan; a crashed writer's
    # sidecar (no version references it) IS
    assert not [i for i in t.fsck() if i["kind"] == "orphan_bloom_sidecar"]
    fake = os.path.join(root, "_star_meta", "bloom", "deadbeef.parquet")
    with open(fake, "wb") as fh:
        fh.write(b"crashed-writer-sidecar")
    orphans = [i for i in t.fsck() if i["kind"] == "orphan_bloom_sidecar"]
    assert [i["path"] for i in orphans] == ["_star_meta/bloom/deadbeef.parquet"]

    # inside retention nothing sweeps
    assert t.cleanup(retention_s=10_000) == []
    # past retention: the dead commit's bitmap AND the crashed-writer
    # orphan are both gone, the live commit's stays
    removed = t.cleanup(retention_s=0.0)
    assert dead_refs <= set(removed)
    assert "_star_meta/bloom/deadbeef.parquet" in removed
    for r in dead_refs:
        assert not os.path.exists(os.path.join(root, r))
    for r in live_refs:
        assert os.path.exists(os.path.join(root, r))
    assert not [i for i in t.fsck() if i["kind"] == "orphan_bloom_sidecar"]

    # live probes still skip (absent key prunes) and still find rows
    n_files = len(t.store.snapshot().all_files())
    df = t.to_df(where="o_custkey = 10000001")
    assert df.count() == 0 and len(df.inputFiles()) < n_files
    ck = orders.select("o_custkey").first()[0]
    assert t.to_df(where=f"o_custkey = {ck}").count() == \
        orders.filter(F.col("o_custkey") == ck).count()
