"""Bin-packing small-file compaction: only sub-threshold files merge;
well-sized files are untouched (same physical paths); scans invariant;
CDF silent; hash tables rejected (their small files are MoR deltas)."""

import pytest
from pyspark.sql import functions as F

from starlake_spark import create_table
from starlake_spark.sources import datasource as ds


def test_small_files_merge_big_files_stay(spark, tmp_path):
    path = str(tmp_path / "t")
    big = spark.range(200_000).select(
        F.col("id"), F.concat(F.lit("x" * 64), F.col("id")).alias("pad"))
    t = create_table(spark, big.coalesce(1), path)
    for i in range(6):  # six sliver appends
        t.write(spark.createDataFrame([(10_000_000 + i, "s")], "id long, pad string")
                .coalesce(1), mode="append")
    files0 = {f.path: f.size for f in t.store.snapshot().all_files()
              if f.num_rows != 0}
    big_paths = {p for p, sz in files0.items() if sz >= 256 * 1024}
    small_paths = set(files0) - big_paths
    assert big_paths and len(small_paths) >= 6
    before = t.to_df().agg(F.count("*"), F.sum("id")).collect()[0]

    n = t.compact_small_files(threshold_bytes=256 * 1024)
    assert n >= 6
    files1 = {f.path for f in t.store.snapshot().all_files()}
    assert big_paths <= files1               # untouched, same paths
    assert not (small_paths & files1)        # slivers gone
    after = t.to_df().agg(F.count("*"), F.sum("id")).collect()[0]
    assert tuple(before) == tuple(after)
    # merged into fewer files than the slivers it replaced
    assert len([p for p in files1 if p not in big_paths]) < len(small_paths)


def test_small_file_compaction_per_partition_and_cdf_silent(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, "r1" if i % 2 else "r2") for i in range(10)], "id int, r string")
    t = create_table(spark, df.coalesce(1), path, range_partitions=["r"])
    for i in range(3):
        t.write(spark.createDataFrame([(100 + i, "r1")], "id int, r string")
                .coalesce(1), mode="append")
    v0 = t.store.latest_version()
    before = sorted(r.id for r in t.to_df().collect())
    n = t.compact_small_files(threshold_bytes=10 * 1024 * 1024,
                              partition="r=r1")
    assert n >= 2
    assert sorted(r.id for r in t.to_df().collect()) == before
    # scoped: r2's files untouched
    r2 = [f for f in t.store.snapshot().all_files() if f.range_value == "r=r2"]
    assert all(f.write_version <= v0 for f in r2)
    # logical no-op: zero change-feed rows
    assert ds.table_changes(spark, path, start_version=v0).count() == 0


def test_small_file_compaction_rejects_hash_tables(spark, tmp_path):
    t = create_table(spark,
                     spark.createDataFrame([(1, "a")], "id int, v string"),
                     str(tmp_path / "t"),
                     hash_partitions=["id"], hash_bucket_num=2)
    with pytest.raises(ValueError, match="non-hash"):
        t.compact_small_files()


def test_small_file_compaction_noop_when_nothing_small(spark, tmp_path):
    t = create_table(spark,
                     spark.createDataFrame([(1, "a")], "id int, v string")
                     .coalesce(1),
                     str(tmp_path / "t"))
    v0 = t.store.latest_version()
    assert t.compact_small_files(threshold_bytes=1) == 0  # nothing under 1B
    assert t.store.latest_version() == v0                 # no empty commit


def test_optimize_small_files_sql(spark, tmp_path):
    from starlake_spark.sql import StarSession

    wh = str(tmp_path / "wh")
    ss = StarSession(spark, warehouse=wh)
    t = create_table(spark,
                     spark.createDataFrame([(1, "a")], "id int, v string")
                     .coalesce(1),
                     wh + "/sf", short_name="sf", warehouse=wh)
    for i in range(3):
        t.write(spark.createDataFrame([(10 + i, "x")], "id int, v string")
                .coalesce(1), mode="append")
    out = ss.sql("OPTIMIZE sf SMALL FILES THRESHOLD 1 MB").collect()
    assert out[0].files_merged >= 4
    assert sorted(r.id for r in ss.sql("SELECT * FROM sf").collect()) == [1, 10, 11, 12]


def test_concurrent_appends_and_small_file_compaction(spark, tmp_path):
    """Maintenance races ingest: writer threads append slivers while a
    maintenance thread loops the bin-packing pass. Conflict detection +
    retry must lose no rows and never double-merge."""
    import threading

    path = str(tmp_path / "race")
    t = create_table(spark,
                     spark.createDataFrame([(0, "seed")], "id int, v string")
                     .coalesce(1), path)
    errors = []
    N_WRITERS, PER = 3, 5

    def _writer(w):
        try:
            for i in range(PER):
                t.write(spark.createDataFrame(
                    [(1000 * (w + 1) + i, f"w{w}b{i}")], "id int, v string")
                    .coalesce(1), mode="append")
        except Exception as e:  # pragma: no cover
            errors.append(e)

    stop = threading.Event()

    def _maintenance():
        from starlake_spark.meta import CommitConflictError
        while not stop.is_set():
            try:
                t.compact_small_files(threshold_bytes=10 * 1024 * 1024)
            except CommitConflictError:
                pass  # a writer won the race; next loop retries
            except Exception as e:  # pragma: no cover
                errors.append(e)
                return

    threads = [threading.Thread(target=_writer, args=(w,))
               for w in range(N_WRITERS)]
    m = threading.Thread(target=_maintenance)
    m.start()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    stop.set()
    m.join()
    assert not errors, errors
    got = sorted(r.id for r in t.to_df().collect())
    want = sorted([0] + [1000 * (w + 1) + i
                         for w in range(N_WRITERS) for i in range(PER)])
    assert got == want
    # a final pass leaves at most a handful of files
    t.compact_small_files(threshold_bytes=10 * 1024 * 1024)
    live = [f for f in t.store.snapshot().all_files() if f.num_rows != 0]
    assert len(live) <= 3


def test_auto_small_file_compaction_on_append(spark, sf_dir, tmp_path):
    """compaction.auto.smallfiles=true (Delta autoCompact analog):
    appends themselves bin-pack once a touched partition accumulates
    the minimum count of sub-threshold files; content invariant; off
    by default."""
    from starlake_spark.table import create_table

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = create_table(spark, orders.limit(2), str(tmp_path / "t"),
                     configuration={"compaction.auto.smallfiles": "true",
                                    "compaction.smallfiles.min": "4"})
    for i in range(5):
        t.write(orders.limit(2).withColumn("o_totalprice", F.lit(float(i))),
                mode="append")
    n_files = len(t.store.snapshot().all_files())
    assert n_files < 6, f"auto compaction never fired ({n_files} files)"
    assert t.to_df().count() == 12
    # off by default: same appends accumulate files
    t2 = create_table(spark, orders.limit(2), str(tmp_path / "u"))
    for i in range(5):
        t2.write(orders.limit(2).withColumn("o_totalprice", F.lit(float(i))),
                 mode="append")
    assert len(t2.store.snapshot().all_files()) == 6
    assert t2.to_df().count() == 12
