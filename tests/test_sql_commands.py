"""SQL-text DDL/DML routing through StarSession (the reference's
StarLakeCatalog surface, StarLakeCatalog.scala:51-546: CREATE/ALTER/
DROP TABLE USING star; UPDATE/DELETE flow Spark-parsed plans →
commands, StarSparkSessionExtension.scala:95-103)."""

import os

import pytest
from pyspark.sql import functions as F

from starlake_spark.sql import StarSession, _split_top_level
from starlake_spark.table import create_table


@pytest.fixture()
def sess(spark, tmp_path):
    return StarSession(spark, warehouse=str(tmp_path / "wh"))


@pytest.fixture()
def orders_tbl(spark, sess, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = sess.create_table(df, str(tmp_path / "orders_t"), name="orders_t")
    return t


def test_split_top_level():
    assert _split_top_level("a = f(x, y), b = 2") == ["a = f(x, y)", "b = 2"]
    assert _split_top_level("a = 'x,y', b = 1") == ["a = 'x,y'", "b = 1"]


def test_sql_update(sess, orders_tbl):
    sess.sql("UPDATE orders_t SET o_orderpriority = upper('set'), "
             "o_totalprice = o_totalprice * 2 WHERE o_orderstatus = 'P'")
    df = orders_tbl.to_df()
    n_p = df.filter("o_orderstatus = 'P'").count()
    assert n_p > 0
    assert df.filter("o_orderpriority = 'SET'").count() == n_p


def test_sql_delete(sess, orders_tbl):
    before = orders_tbl.to_df().count()
    gone = orders_tbl.to_df().filter("o_orderstatus = 'F'").count()
    sess.sql("DELETE FROM orders_t WHERE o_orderstatus = 'F'")
    df = orders_tbl.to_df()
    assert df.filter("o_orderstatus = 'F'").count() == 0
    assert df.count() == before - gone


def test_sql_ctas_partitioned_hashed(spark, sess, sf_dir, tmp_path):
    sess.register("orders_src", sess.create_table(
        spark.read.parquet(f"{sf_dir}/orders.parquet"),
        str(tmp_path / "src"), name="orders_src"))
    path = str(tmp_path / "ctas")
    sess.sql(
        "CREATE TABLE big_orders USING star "
        "OPTIONS ('hashPartitions' = 'o_orderkey', 'hashBucketNum' = '4') "
        "PARTITIONED BY (o_orderstatus) "
        f"LOCATION '{path}' "
        "AS SELECT * FROM orders_src WHERE o_totalprice > 1000"
    )
    t = sess.table("big_orders")
    info = t.info
    assert info.range_cols == ["o_orderstatus"]
    assert info.hash_cols == ["o_orderkey"]
    assert info.bucket_num == 4
    expect = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_totalprice") > 1000).count()
    assert t.to_df().count() == expect
    # hash table: SQL UPDATE must still work on it
    sess.sql("UPDATE big_orders SET o_orderpriority = 'Z' WHERE o_orderkey % 2 = 0")
    assert t.to_df().filter("o_orderpriority = 'Z'").count() == \
        t.to_df().filter("o_orderkey % 2 = 0").count()


def test_sql_alter_and_props(sess, orders_tbl):
    sess.sql("ALTER TABLE orders_t ADD COLUMNS (note string, score double)")
    df = orders_tbl.to_df()
    assert "note" in df.columns and "score" in df.columns
    assert df.filter(F.col("note").isNotNull()).count() == 0

    sess.sql("ALTER TABLE orders_t SET TBLPROPERTIES ('k1' = 'v1', 'k2' = 'v2')")
    assert sess.table("orders_t").info.configuration.get("k1") == "v1"
    sess.sql("ALTER TABLE orders_t UNSET TBLPROPERTIES ('k1')")
    cfg = sess.table("orders_t").info.configuration
    assert "k1" not in cfg and cfg.get("k2") == "v2"


def test_check_constraints(spark, sess, orders_tbl, sf_dir):
    sess.sql("ALTER TABLE orders_t ADD CONSTRAINT pos_price CHECK (o_totalprice > 0)")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    # violating write rejected, constraint named in the error
    with pytest.raises(ValueError, match="pos_price"):
        orders_tbl.write(orders.limit(5).withColumn(
            "o_totalprice", F.lit(-1.0)), mode="append")
    # conforming write passes
    n = orders_tbl.to_df().count()
    orders_tbl.write(orders.limit(5), mode="append")
    assert orders_tbl.to_df().count() == n + 5
    # cannot add a constraint existing rows violate
    with pytest.raises(ValueError, match="existing rows"):
        sess.sql("ALTER TABLE orders_t ADD CONSTRAINT impossible CHECK (o_totalprice > 1e12)")
    # dropped constraint no longer enforced
    sess.sql("ALTER TABLE orders_t DROP CONSTRAINT pos_price")
    orders_tbl.write(orders.limit(2).withColumn(
        "o_totalprice", F.lit(-1.0)), mode="append")
    assert orders_tbl.to_df().filter("o_totalprice < 0").count() == 2


def test_sql_drop(sess, orders_tbl):
    path = orders_tbl.store.table_path
    sess.sql("DROP TABLE orders_t")
    assert not os.path.exists(os.path.join(path, "_star_meta"))
    with pytest.raises(Exception):
        sess.table("orders_t").to_df()


def test_select_still_works(sess, orders_tbl):
    n = sess.sql("SELECT count(*) AS n FROM orders_t").collect()[0]["n"]
    assert n == orders_tbl.to_df().count()


def test_non_star_statements_fall_through(spark, sess):
    # plain SELECT with no star tables at all
    assert sess.sql("SELECT 1 AS one").collect()[0]["one"] == 1
    # UPDATE of an unknown name is not intercepted: Spark raises its own
    # analysis error rather than our router swallowing it
    with pytest.raises(Exception):
        sess.sql("UPDATE nope SET x = 1")


def test_bad_clauses_raise(sess, orders_tbl, tmp_path):
    with pytest.raises(ValueError, match="SET"):
        sess.sql("UPDATE orders_t SET broken")
    # CTAS without LOCATION defaults to the warehouse (DDL parity since
    # the path-identifier port) — it creates, it no longer raises
    sess.sql("CREATE TABLE t2 USING star AS SELECT 1 AS one")
    assert sess.sql("SELECT * FROM t2").collect()[0]["one"] == 1
    # LOCATION with neither AS SELECT nor a column list is still invalid
    with pytest.raises(ValueError, match="CTAS"):
        sess.sql(f"CREATE TABLE t4 USING star LOCATION '{tmp_path}/t4'")


def test_show_describe_compact_vacuum(spark, sess, orders_tbl, sf_dir):
    names = {r["table_name"] for r in sess.sql("SHOW TABLES").collect()}
    assert "orders_t" in names

    desc = {r["col_name"]: r for r in sess.sql("DESCRIBE orders_t").collect()}
    assert desc["o_orderkey"]["data_type"] == "bigint"
    assert "# bucket_num" in desc

    # hash table with deltas: COMPACT collapses them to base files
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    path = str(orders_tbl.store.table_path) + "_h"
    t = sess.create_table(orders, path, name="orders_h",
                          hash_partitions=["o_orderkey"], hash_bucket_num=4)
    t.upsert(orders.limit(10).withColumn("o_totalprice", F.lit(1.0)))
    assert any(not f.is_base_file for f in t.store.snapshot().all_files())
    sess.sql("COMPACT TABLE orders_h")
    assert all(f.is_base_file for f in t.store.snapshot().all_files())

    planned = sess.sql("VACUUM orders_h RETAIN 0 HOURS DRY RUN").collect()
    assert len(planned) > 0  # dry run reports candidates, removes nothing
    import os
    assert all(os.path.exists(os.path.join(t.store.table_path, r["removed_file"]))
               or os.path.exists(r["removed_file"]) for r in planned)
    removed = sess.sql("VACUUM orders_h RETAIN 0 HOURS").collect()
    assert isinstance(removed, list)  # stale pre-compaction files reported
    assert len(removed) > 0
    assert {r["removed_file"] for r in removed} == {r["removed_file"] for r in planned}


def test_optimize_zorder_sql(spark, sess, sf_dir, tmp_path):
    """OPTIMIZE t ZORDER BY (col) routes to clustered compaction: the
    salted layout can't skip, the optimized one can."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    t = sess.create_table(orders, str(tmp_path / "oz"), name="orders_z",
                          configuration={"write.files.per.partition": "6"})
    n0 = len(t.store.snapshot().all_files())
    assert n0 > 1
    assert len(t.to_df(where="o_orderkey < 100").inputFiles()) == n0

    sess.sql("OPTIMIZE orders_z ZORDER BY (o_orderkey)")
    n1 = len(t.store.snapshot().all_files())
    df = t.to_df(where="o_orderkey < 100")
    assert 0 < len(df.inputFiles()) < n1
    assert df.count() == orders.filter("o_orderkey < 100").count()

    # plain OPTIMIZE (no ZORDER) still legal on a deltaless table: noop-ish
    sess.sql("OPTIMIZE orders_z")
    assert t.to_df().count() == orders.count()


def test_merge_into_api(spark, tmp_path):
    from pyspark.sql import functions as F

    from starlake_spark.table import create_table

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, tag string, val double")
    t = create_table(spark, base, str(tmp_path / "t"))
    src = spark.createDataFrame(
        [(2, "B", 200.0), (4, "d", 40.0)], "id long, tag string, val double")

    t.merge(src, "t.id = s.id",
            matched_update={"val": "s.val", "tag": "upper(t.tag)"},
            not_matched_insert="*")
    got = {r["id"]: (r["tag"], r["val"]) for r in t.to_df().collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 200.0), 3: ("c", 30.0), 4: ("d", 40.0)}

    # matched delete
    t.merge(spark.createDataFrame([(1,)], "id long"), "t.id = s.id",
            matched_delete=True)
    assert sorted(r["id"] for r in t.to_df().collect()) == [2, 3, 4]

    # multi-match must error
    dup = spark.createDataFrame([(2, 1.0), (2, 2.0)], "id long, val double")
    import pytest as _pytest
    with _pytest.raises(ValueError, match="multiple source rows"):
        t.merge(dup, "t.id = s.id", matched_update={"val": "s.val"})


def test_merge_into_sql(spark, tmp_path):
    from starlake_spark.sql import StarSession
    from starlake_spark.table import create_table

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id long, tag string, val double")
    create_table(spark, base, str(tmp_path / "t"), short_name="mrg_t")
    spark.createDataFrame(
        [(2, "B", 200.0), (5, "e", 50.0)], "id long, tag string, val double"
    ).createOrReplaceTempView("mrg_src")

    ss = StarSession(spark)
    ss.sql("""
        MERGE INTO mrg_t AS t USING mrg_src AS s ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET val = s.val + 1, tag = s.tag
        WHEN NOT MATCHED THEN INSERT (id, tag, val) VALUES (s.id, s.tag, s.val * 2)
    """)
    got = {r["id"]: (r["tag"], r["val"]) for r in ss.table("mrg_t").to_df().collect()}
    assert got == {1: ("a", 10.0), 2: ("B", 201.0), 5: ("e", 100.0)}

    # subquery source + INSERT * + DELETE
    ss.sql("""
        MERGE INTO mrg_t t USING (SELECT 1 AS id, 'x' AS tag, 0.0 AS val) s
        ON t.id = s.id
        WHEN MATCHED THEN DELETE
    """)
    assert sorted(r["id"] for r in ss.table("mrg_t").to_df().collect()) == [2, 5]
    ss.table("mrg_t").drop_table()


def test_history_and_partitions(spark, sess, sf_dir, tmp_path):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderpriority")
    t = sess.create_table(
        df, str(tmp_path / "hist_t"), name="hist_t",
        range_partitions=["o_orderpriority"],
        hash_partitions=["o_orderkey"], hash_bucket_num=2)
    t.upsert(df.limit(10).withColumn("o_totalprice", F.lit(1.0)))
    t.compaction(force=True)

    h = sess.sql("DESCRIBE HISTORY hist_t").collect()
    assert [r["version"] for r in h] == sorted(r["version"] for r in h)
    types = [r["commit_type"] for r in h]
    assert types[0] == "write" and "compact" in types
    # compaction replaces files: the compaction row must remove some
    comp = next(r for r in h if r["commit_type"] == "compact")
    assert comp["files_removed"] > 0 and comp["files_added"] > 0
    # the create commit (version 0) holds no files yet
    assert all(r["live_files"] > 0 and r["live_bytes"] > 0 for r in h[1:])

    p = sess.sql("SHOW PARTITIONS hist_t").collect()
    assert len(p) == 5  # five order priorities
    assert all(r["partition"].startswith("o_orderpriority=") for r in p)
    assert all(r["delta_files"] == 0 for r in p)  # compacted
    assert sum(r["n_files"] for r in p) == sum(r2["live_files"] for r2 in h[-1:])


def test_optimize_where_scopes_compaction(spark, sess, tmp_path):
    """OPTIMIZE ... WHERE rewrites only the partitions matching the
    metadata-only predicate; other partitions keep their delta files."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"r{i % 3}", i) for i in range(30)], "id int, rng string, v int")
    ss = sess
    df.createOrReplaceTempView("_ow_src")
    ss.sql(f"CREATE TABLE ow_t USING star OPTIONS (hashPartitions = 'id', "
           f"hashBucketNum = '2', \"compaction.auto\" = 'false') "
           f"PARTITIONED BY (rng) LOCATION '{tmp_path}/ow_t' AS SELECT * FROM _ow_src")
    t = ss.table("ow_t")
    t.upsert(spark.createDataFrame([(1, "r1", 99), (0, "r0", 98)],
                                   "id int, rng string, v int"))
    before = {rv: ps.delta_file_num for rv, ps in t.store.snapshot().partitions.items()}
    assert before["rng=r1"] > 0 and before["rng=r0"] > 0
    ss.sql("OPTIMIZE ow_t WHERE rng = 'r1'")
    after = {rv: ps.delta_file_num for rv, ps in t.store.snapshot().partitions.items()}
    assert after["rng=r1"] == 0 and after["rng=r0"] == before["rng=r0"]
    assert {r["id"]: r["v"] for r in t.to_df().collect()}[1] == 99


def test_table_changes_tvf(spark, tmp_path):
    """Delta-parity SQL surface: SELECT ... FROM table_changes('t', n)
    resolves to the typed change feed, including delete rows."""
    from starlake_spark.sql import StarSession

    ss = StarSession(spark, warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame([(i, i * 10) for i in range(1, 4)], "id int, v int")
    t = ss.create_table(df, str(tmp_path / "cdf_t"), name="cdf_t",
                        hash_partitions=["id"], hash_bucket_num=2)
    t.set_properties({"compaction.auto": "false"})
    t.upsert(spark.createDataFrame([(2, 999)], "id int, v int"))
    t.delete("id = 3", use_delta=True)

    rows = ss.sql(
        "SELECT id, v, _commit_version, _change_type "
        "FROM table_changes('cdf_t', 1) ORDER BY _commit_version, id"
    ).collect()
    got = [(r["id"], r["v"], r["_commit_version"], r["_change_type"]) for r in rows]
    assert got == [(2, 999, 2, "update_postimage"), (3, None, 3, "delete")], got
    # windowed form + aggregation over the feed
    n = ss.sql("SELECT COUNT(*) AS n FROM table_changes('cdf_t', 1, 2)").collect()[0]["n"]
    assert n == 1


def test_convert_to_star_sql(spark, tmp_path):
    import os
    import shutil

    from starlake_spark.sql import StarSession

    ss = StarSession(spark, warehouse=str(tmp_path / "wh"))
    flat = str(tmp_path / "flat")
    os.makedirs(flat)
    shutil.copy("/root/testdata/sf0.001/customer.parquet", flat + "/c.parquet")
    ss.sql(f"CONVERT TO STAR '{flat}' AS cust_conv")
    n = spark.read.parquet("/root/testdata/sf0.001/customer.parquet").count()
    assert ss.sql("SELECT COUNT(*) AS n FROM cust_conv").collect()[0]["n"] == n


def test_describe_detail(spark, tmp_path):
    from starlake_spark.sql import StarSession

    ss = StarSession(spark, warehouse=str(tmp_path / "wh"))
    df = spark.createDataFrame([(i, i) for i in range(10)], "id int, v int")
    ss.create_table(df, str(tmp_path / "dd_t"), name="dd_t",
                    hash_partitions=["id"], hash_bucket_num=2)
    row = ss.sql("DESCRIBE DETAIL dd_t").collect()[0]
    assert row["approx_rows"] == 10 and row["num_files"] >= 2
    assert row["hash_cols"] == ["id"] and row["version"] == 1


def test_sql_insert_values_and_select(spark, sess, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "k int, name string, v double")
    t = sess.create_table(df, str(tmp_path / "ins_t"), name="ins_t")
    sess.sql("INSERT INTO ins_t VALUES (3, 'c', 30.0), (4, 'd', 40.0)")
    assert t.to_df().count() == 4
    # column-list form: unlisted column lands as a typed null
    sess.sql("INSERT INTO ins_t (k, name) VALUES (5, 'e')")
    rows = {r["k"]: r for r in t.to_df().collect()}
    assert rows[5]["v"] is None and rows[5]["name"] == "e"
    # INSERT ... SELECT
    sess.sql("INSERT INTO ins_t SELECT k + 100, name, v FROM ins_t WHERE k <= 2")
    assert t.to_df().filter("k > 100").count() == 2
    with pytest.raises(ValueError, match="unknown column"):
        sess.sql("INSERT INTO ins_t (k, nope) VALUES (9, 'x')")
    with pytest.raises(ValueError, match="columns"):
        sess.sql("INSERT INTO ins_t VALUES (9, 'x')")


def test_sql_insert_overwrite_and_hash_upsert(spark, sess, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k int, s string")
    t = sess.create_table(df, str(tmp_path / "ins_h"), name="ins_h",
                          hash_partitions=["k"], hash_bucket_num=2)
    # INSERT INTO a hash table upserts by key (appends are forbidden)
    sess.sql("INSERT INTO ins_h VALUES (2, 'B'), (3, 'c')")
    rows = {r["k"]: r["s"] for r in t.to_df().collect()}
    assert rows == {1: "a", 2: "B", 3: "c"}
    # OVERWRITE replaces wholesale
    sess.sql("INSERT OVERWRITE ins_h VALUES (7, 'z')")
    assert {r["k"]: r["s"] for r in t.to_df().collect()} == {7: "z"}


def test_show_tblproperties_and_columns(spark, sess, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k int, s string")
    sess.create_table(df, str(tmp_path / "show_t"), name="show_t",
                      configuration={"cdf.enabled": "true"})
    props = {r["key"]: r["value"]
             for r in sess.sql("SHOW TBLPROPERTIES show_t").collect()}
    assert props.get("cdf.enabled") == "true"
    cols = [r["col_name"] for r in sess.sql("SHOW COLUMNS FROM show_t").collect()]
    assert cols == ["k", "s"]


def test_create_table_empty_source_skips_write_job(spark, tmp_path):
    """create_table(df.limit(0)) commits schema-only: zero data files,
    no Spark write job (writer._is_statically_empty fast path)."""
    from starlake_spark.operators import writer as W

    df = spark.createDataFrame([(1, "a")], "k int, s string")
    assert W._is_statically_empty(df.limit(0))
    assert W._is_statically_empty(df.filter(F.lit(False)))
    assert not W._is_statically_empty(df)
    t = create_table(spark, df.limit(0), str(tmp_path / "empty_t"),
                     range_partitions=["s"])
    assert t.store.snapshot().all_files() == []
    assert t.to_df().count() == 0
    t.write(df)
    assert t.to_df().count() == 1


def test_column_defaults(spark, sess, tmp_path):
    """DEFAULT fills omitted columns on base/append writes and SQL
    INSERT, but never on partial-column upserts (absent column under
    MoR merge means keep-existing, not re-default)."""
    df = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "k int, s string, tag string")
    t = sess.create_table(df, str(tmp_path / "def_t"), name="def_t",
                          hash_partitions=["k"], hash_bucket_num=2)
    sess.sql("ALTER TABLE def_t ALTER COLUMN tag SET DEFAULT 'untagged'")
    assert t.info.configuration["default.tag"] == "'untagged'"
    # partial upsert WITHOUT tag: existing tags must survive (no fill)
    t.upsert(spark.createDataFrame([(1, "A")], "k int, s string"))
    rows = {r["k"]: r for r in t.to_df().collect()}
    assert rows[1]["tag"] == "x" and rows[1]["s"] == "A"
    # INSERT with a column list omitting tag: default materializes
    sess.sql("INSERT INTO def_t (k, s) VALUES (3, 'c')")
    rows = {r["k"]: r for r in t.to_df().collect()}
    assert rows[3]["tag"] == "untagged"
    # non-hash append path fills too
    df2 = spark.createDataFrame([(10, "q", "z")], "k int, s string, tag string")
    t2 = sess.create_table(df2, str(tmp_path / "def_t2"), name="def_t2")
    t2.set_column_default("tag", "concat('v', '1')")
    t2.write(spark.createDataFrame([(11, "r")], "k int, s string"))
    got = {r["k"]: r["tag"] for r in t2.to_df().collect()}
    assert got == {10: "z", 11: "v1"}
    # DROP DEFAULT reverts to null fill
    sess.sql("ALTER TABLE def_t2 ALTER COLUMN tag DROP DEFAULT")
    t2.write(spark.createDataFrame([(12, "w")], "k int, s string"))
    assert {r["k"]: r["tag"] for r in t2.to_df().collect()}[12] is None
    # guards
    with pytest.raises(ValueError, match="primary-key"):
        t.set_column_default("k", "0")
    with pytest.raises(KeyError):
        t.set_column_default("nope", "0")


def test_merge_not_matched_by_source(spark, sess, tmp_path):
    """Delta/SQL:2023 by-source clauses: sync-to-source in one MERGE —
    matched rows update, new rows insert, target rows the source no
    longer carries are deleted (or flagged via UPDATE)."""
    t_df = spark.createDataFrame(
        [(1, "a", "live"), (2, "b", "live"), (3, "c", "live")],
        "k int, s string, state string")
    src = spark.createDataFrame([(2, "B"), (4, "d")], "k int, s string")
    t = sess.create_table(t_df, str(tmp_path / "nmbs_t"), name="nmbs_t")
    src.createOrReplaceTempView("nmbs_src")
    sess.sql("""
        MERGE INTO nmbs_t AS t USING nmbs_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET s = s.s
        WHEN NOT MATCHED THEN INSERT (k, s, state) VALUES (s.k, s.s, 'live')
        WHEN NOT MATCHED BY SOURCE THEN DELETE
    """)
    rows = {r["k"]: (r["s"], r["state"]) for r in t.to_df().collect()}
    assert rows == {2: ("B", "live"), 4: ("d", "live")}
    # by-source UPDATE flags instead of deleting
    t2 = sess.create_table(t_df, str(tmp_path / "nmbs_t2"), name="nmbs_t2")
    sess.sql("""
        MERGE INTO nmbs_t2 AS t USING nmbs_src AS s ON t.k = s.k
        WHEN MATCHED THEN UPDATE SET s = s.s
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET state = 'stale'
    """)
    rows = {r["k"]: (r["s"], r["state"]) for r in t2.to_df().collect()}
    assert rows == {1: ("a", "stale"), 2: ("B", "live"), 3: ("c", "stale")}
    # both by-source actions at once is rejected
    with pytest.raises(ValueError, match="cannot both"):
        t2.merge(src, "t.k = s.k",
                 not_matched_by_source_update={"state": "'x'"},
                 not_matched_by_source_delete=True)


def test_sql_time_travel_select(spark, sess, orders_tbl):
    """SELECT-level time travel (Spark/Delta syntax): VERSION AS OF and
    TIMESTAMP AS OF resolve historical snapshots; both spellings (bare
    and FOR-prefixed) work; joins mix versions freely."""
    import time

    n0 = orders_tbl.to_df().count()
    time.sleep(0.05)
    ts = time.time()
    time.sleep(0.05)
    orders_tbl.write(orders_tbl.to_df().limit(5), mode="append")  # v2

    cur = sess.sql("SELECT COUNT(*) AS n FROM orders_t").collect()[0]["n"]
    v1 = sess.sql(
        "SELECT COUNT(*) AS n FROM orders_t VERSION AS OF 1").collect()[0]["n"]
    assert (cur, v1) == (n0 + 5, n0)
    v1b = sess.sql(
        "SELECT COUNT(*) AS n FROM orders_t FOR VERSION AS OF 1"
    ).collect()[0]["n"]
    assert v1b == n0
    import datetime
    iso = datetime.datetime.fromtimestamp(ts).isoformat()
    tt = sess.sql(
        f"SELECT COUNT(*) AS n FROM orders_t TIMESTAMP AS OF '{iso}'"
    ).collect()[0]["n"]
    assert tt == n0
    # cross-version self-join: new rows = current minus v1 keyset
    diff = sess.sql(
        "SELECT COUNT(*) AS n FROM orders_t a LEFT ANTI JOIN "
        "(SELECT o_orderkey, COUNT(*) c FROM orders_t VERSION AS OF 1 "
        " GROUP BY o_orderkey HAVING COUNT(*) > 0) b "
        "ON a.o_orderkey = b.o_orderkey").collect()[0]["n"]
    assert diff == 0  # appended rows reuse existing keys


def test_sql_vacuum_expire_manifests(spark, sess, sf_dir, tmp_path):
    """VACUUM ... EXPIRE MANIFESTS OLDER THAN n HOURS routes manifest
    log retention through SQL (0 hours expires everything below the
    newest checkpoint)."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").limit(20)
    t = sess.create_table(df, str(tmp_path / "vt"), name="vt",
                          configuration={"compaction.auto": "false"})
    for i in range(12):
        t.write(df.limit(2).withColumn("o_totalprice", F.lit(float(i))),
                mode="append")
    out = sess.sql(
        "VACUUM vt RETAIN 9999 HOURS EXPIRE MANIFESTS OLDER THAN 0 HOURS")
    removed = [r["removed_file"] for r in out.collect()]
    assert sum(1 for p in removed if "versions" in p) == 10
    assert t.store.list_versions()[0] == 10
    assert t.to_df().count() == 20 + 24


def test_sql_generate_symlink_manifest(spark, sess, orders_tbl):
    import os

    out = sess.sql(
        "GENERATE symlink_format_manifest FOR TABLE orders_t").collect()
    root = out[0]["manifest_root"]
    assert os.path.isfile(os.path.join(root, "manifest"))


def test_sql_clone_timestamp_as_of(spark, sess, orders_tbl, tmp_path):
    import datetime
    import time

    n0 = orders_tbl.to_df().count()
    time.sleep(0.05)
    iso = datetime.datetime.now().isoformat()
    time.sleep(0.05)
    orders_tbl.write(orders_tbl.to_df().limit(3), mode="append")
    sess.sql(f"CREATE TABLE otc SHALLOW CLONE orders_t "
             f"TIMESTAMP AS OF '{iso}' LOCATION '{tmp_path / 'c'}'")
    assert sess.table("otc").to_df().count() == n0


def test_sql_cdf_tvf_timestamp_args(spark, sess, orders_tbl):
    """table_changes('t', TIMESTAMP '...') — timestamp TVF arguments
    (Delta parity) resolve to the same window as the version form."""
    import datetime
    import time

    time.sleep(0.05)
    iso = datetime.datetime.now().isoformat()
    time.sleep(0.05)
    orders_tbl.write(orders_tbl.to_df().limit(4), mode="append")  # v2
    got = sess.sql(
        f"SELECT COUNT(*) AS n FROM table_changes('orders_t', "
        f"TIMESTAMP '{iso}')").collect()[0]["n"]
    assert got == 4
    same = sess.sql(
        "SELECT COUNT(*) AS n FROM table_changes('orders_t', 1, 2)"
    ).collect()[0]["n"]
    assert same == 4


def test_sql_rewriters_ignore_quoted_literals(spark, sess, orders_tbl):
    """Time-travel / TVF rewriting must not fire inside string
    literals; legitimate quoted operands (TIMESTAMP AS OF '<ts>')
    still work in the same statement."""
    import datetime

    n = sess.sql(
        "SELECT COUNT(*) AS n FROM orders_t "
        "WHERE o_orderpriority <> 'x VERSION AS OF 1' "
        "AND o_orderstatus <> 'table_changes(0, 1)'").collect()[0]["n"]
    assert n == orders_tbl.to_df().count()
    iso = datetime.datetime.now().isoformat()
    m = sess.sql(
        f"SELECT COUNT(*) AS n FROM orders_t TIMESTAMP AS OF '{iso}' "
        f"WHERE o_orderpriority <> 'y VERSION AS OF 9'").collect()[0]["n"]
    assert m == orders_tbl.to_df().count()


def test_sync_table_sql(spark, sess, sf_dir, tmp_path):
    """SYNC TABLE replica FROM src [LOCATION ...] [FULL] — the SQL face
    of operators/replication.sync_table, returning the sync stats row."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = sess.create_table(o, str(tmp_path / "rsrc"), name="rsrc",
                            hash_partitions=["o_orderkey"],
                            hash_bucket_num=4)
    r = sess.sql(f"SYNC TABLE rdst FROM rsrc LOCATION '{tmp_path}/rdst'") \
            .collect()[0]
    assert r["mode"] == "bootstrap"
    assert sess.table("rdst").count() == o.count()
    src.delete("o_orderkey % 5 = 0", use_delta=True)
    r = sess.sql("SYNC TABLE rdst FROM rsrc").collect()[0]
    assert r["mode"] == "incremental" and r["deleted"] > 0
    assert sess.table("rdst").count() == src.count()
    r = sess.sql("SYNC TABLE rdst FROM rsrc FULL").collect()[0]
    assert r["mode"] == "full" and r["upserted"] == 0 and r["deleted"] == 0
    with pytest.raises(ValueError, match="LOCATION"):
        sess.sql("SYNC TABLE nowhere FROM rsrc")


def test_fsck_sql(spark, sess, sf_dir, tmp_path, orders_tbl):
    out = sess.sql("FSCK TABLE orders_t DEEP")
    assert out.count() == 0
    assert out.columns == ["kind", "partition", "path", "repairable",
                           "detail"]


def test_range_changes_tvf(spark, sess, sf_dir, tmp_path):
    """range_changes('t', v0[, v1]) TVF: coalesced net window — a key
    churned by several commits emits ONE update pair."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sess.create_table(o, str(tmp_path / "rc"), name="rc",
                      hash_partitions=["o_orderkey"], hash_bucket_num=2)
    t = sess.table("rc")
    for i in range(3):  # churn the SAME keys three times
        t.upsert(o.filter("o_orderkey % 11 = 1")
                  .withColumn("o_totalprice", F.lit(float(i))))
    out = sess.sql(
        "SELECT _change_type, count(*) AS n FROM range_changes('rc', 1) "
        "GROUP BY _change_type ORDER BY _change_type").collect()
    per = {r["_change_type"]: r["n"] for r in out}
    n_keys = o.filter("o_orderkey % 11 = 1").count()
    assert per == {"update_preimage": n_keys, "update_postimage": n_keys}
    post = sess.sql(
        "SELECT DISTINCT o_totalprice FROM range_changes('rc', 1) "
        "WHERE _change_type = 'update_postimage'").collect()
    assert [r[0] for r in post] == [2.0]  # the NET state, not history
    # literal guard: quoted text is never rewritten
    lit = sess.sql("SELECT 'range_changes(''rc'', 1)' AS s").collect()
    assert "range_changes" in lit[0]["s"]


def test_insert_partition_clause(spark, sess, sf_dir, tmp_path):
    """InsertIntoTableSuite PARTITION clauses: static values pin the
    range column for every row; OVERWRITE with a static spec replaces
    ONLY that partition; non-partition columns in the clause error."""
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, 2.0), ("b", 3, 3.0)],
        "grp string, k long, v double")
    sess.create_table(df, str(tmp_path / "pt"), name="pt",
                      range_partitions=["grp"])
    # static INTO: rows land in grp='c'
    sess.sql("INSERT INTO pt PARTITION (grp = 'c') VALUES (9, 9.5)")
    assert sess.table("pt").to_df().filter("grp = 'c'").count() == 1
    # static OVERWRITE replaces only its partition
    sess.sql("INSERT OVERWRITE pt PARTITION (grp = 'a') VALUES (7, 7.5)")
    got = sess.table("pt").to_df()
    assert got.filter("grp = 'a'").count() == 1
    assert got.filter("grp = 'b'").count() == 1  # untouched
    assert got.filter("grp = 'c'").count() == 1  # untouched
    # dynamic clause: query must produce the column
    sess.sql("INSERT INTO pt PARTITION (grp) VALUES (4, 4.0, 'd')")
    assert sess.table("pt").to_df().filter("grp = 'd'").count() == 1
    # non-partition column in the clause
    with pytest.raises(ValueError, match="not a range partition"):
        sess.sql("INSERT INTO pt PARTITION (k = 5) VALUES ('x', 1.0)")
    # column-list + static spec clash
    with pytest.raises(ValueError, match="both"):
        sess.sql("INSERT INTO pt PARTITION (grp = 'e') (grp, k, v) "
                 "VALUES ('e', 1, 1.0)")


def test_partition_clause_values_with_quotes_and_parens(spark, sess,
                                                        tmp_path):
    """Quote-aware PARTITION parsing: values containing ')' or an
    escaped quote must survive INSERT and TRUNCATE clauses intact —
    the old [^)]* body / .strip(\"'\") unquoting mangled both."""
    df = spark.createDataFrame([("plain", 1)], "grp string, k long")
    sess.create_table(df, str(tmp_path / "qq"), name="qq",
                      range_partitions=["grp"])
    t = sess.table("qq")
    # value containing ')'
    sess.sql("INSERT INTO qq PARTITION (grp = 'a)b') VALUES (10)")
    assert t.to_df().filter("grp = 'a)b'").count() == 1
    # value containing an escaped quote (SQL '' escape)
    sess.sql("INSERT INTO qq PARTITION (grp = 'it''s') VALUES (11)")
    assert t.to_df().filter("grp = \"it's\"").count() == 1
    # static OVERWRITE scoped to the paren-carrying partition only
    sess.sql("INSERT OVERWRITE qq PARTITION (grp = 'a)b') VALUES (20)")
    got = t.to_df()
    assert got.filter("grp = 'a)b'").count() == 1
    assert got.filter("grp = 'a)b'").collect()[0]["k"] == 20
    assert got.filter("grp = 'plain'").count() == 1
    # TRUNCATE of the paren-carrying partition: metadata-only expiry
    # must hit the RIGHT partition (unquoted value match)
    sess.sql("TRUNCATE TABLE qq PARTITION (grp = 'a)b')")
    assert t.to_df().filter("grp = 'a)b'").count() == 0
    assert t.to_df().count() == 2  # plain + it's untouched
    sess.sql("TRUNCATE TABLE qq PARTITION (grp = 'it''s')")
    assert t.to_df().count() == 1


def test_update_nested_field_sql(spark, sess, tmp_path):
    df = spark.createDataFrame([(1, {"a": 1, "b": "x"})],
                               "k long, meta struct<a:int,b:string>")
    sess.create_table(df, str(tmp_path / "nu"), name="nu",
                      hash_partitions=["k"], hash_bucket_num=2)
    sess.sql("UPDATE nu SET meta.a = 99 WHERE k = 1")
    r = sess.table("nu").to_df().collect()[0]
    assert (r["meta"]["a"], r["meta"]["b"]) == (99, "x")


def test_sql_metadata_agg_pushdown(spark, sess, sf_dir, tmp_path):
    """SELECT min/max/count FROM t over a star table answers from the
    manifest with ZERO Spark jobs; anything else (WHERE, strings, MoR
    snapshots) falls through to the scan plan with identical results."""
    from pyspark.sql import functions as F

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sess.create_table(o, str(tmp_path / "ma"), name="ma",
                      range_partitions=["o_orderstatus"])
    exp = o.selectExpr("min(o_totalprice)", "max(o_orderkey)",
                       "count(*)").collect()[0]
    out = sess.sql("SELECT min(o_totalprice) AS lo, max(o_orderkey) AS hi, "
                   "count(*) AS n FROM ma")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FileScan" not in plan and \
        ("LocalTableScan" in plan or "ExistingRDD" in plan), \
        f"metadata-served aggregate must not touch storage: {plan}"
    got = out.collect()[0]
    assert (got["lo"], got["hi"], got["n"]) == (exp[0], exp[1], exp[2])
    # fall-throughs still answer correctly (string col, WHERE clause)
    s = sess.sql("SELECT max(o_orderstatus) AS m FROM ma").collect()[0]["m"]
    assert s == o.selectExpr("max(o_orderstatus)").collect()[0][0]
    w = sess.sql("SELECT count(*) AS n FROM ma "
                 "WHERE o_orderstatus = 'F'").collect()[0]["n"]
    assert w == o.filter("o_orderstatus = 'F'").count()


def test_truncate_table_sql(spark, sess, sf_dir, tmp_path):
    """TRUNCATE TABLE t [PARTITION (p = v)]: full truncate expires every
    partition (history retained — RESTORE undoes it); the partition form
    scopes to one range value."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sess.create_table(o, str(tmp_path / "tt"), name="tt",
                      range_partitions=["o_orderstatus"])
    sess.sql("TRUNCATE TABLE tt PARTITION (o_orderstatus = 'F')")
    t = sess.table("tt")
    assert t.to_df().filter("o_orderstatus = 'F'").count() == 0
    assert t.to_df().count() == o.filter("o_orderstatus <> 'F'").count()
    sess.sql("TRUNCATE TABLE tt")
    assert t.count() == 0
    t.restore(1)
    assert t.count() == o.count()  # truncate is a versioned commit
    with pytest.raises(ValueError, match="not a range partition"):
        sess.sql("TRUNCATE TABLE tt PARTITION (o_orderkey = 1)")


def test_copy_into_sql(spark, sess, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    src = str(tmp_path / "landing")
    o.limit(50).coalesce(1).write.parquet(src)
    sess.create_table(o.limit(0), str(tmp_path / "ci"), name="ci")
    r = sess.sql(f"COPY INTO ci FROM '{src}'").collect()[0]
    assert r["num_inserted_rows"] == 50
    r = sess.sql(f"COPY INTO ci FROM '{src}' FILEFORMAT = PARQUET") \
            .collect()[0]
    assert r["num_inserted_rows"] == 0  # idempotent
    assert sess.table("ci").count() == 50
