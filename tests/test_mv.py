"""Materialized-view suite (mirrors MaterialViewSuite.scala:68-427 and
RewriteQueryByMaterialViewBase.scala hit/miss matrix)."""

import shutil

import pytest
from pyspark.sql import functions as F

from starlake_spark.sql import StarSession
from starlake_spark.plans import mv

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def sess(spark, tmp_path):
    s = StarSession(spark, warehouse=str(tmp_path / "wh"))
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    customer = spark.read.parquet(f"{SF}/customer.parquet")
    s.create_table(orders, str(tmp_path / "orders_t"), name="orders_t")
    s.create_table(customer, str(tmp_path / "customer_t"), name="customer_t")
    yield s
    shutil.rmtree(tmp_path, ignore_errors=True)


AGG_SQL = """
SELECT o_orderstatus, count(1) AS n, sum(o_totalprice) AS total
FROM orders_t WHERE o_totalprice > 1000 GROUP BY o_orderstatus
"""

JOIN_SQL = """
SELECT o.o_orderkey, o.o_totalprice, c.c_name
FROM orders_t o JOIN customer_t c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 500
"""


def rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_create_and_direct_read(sess, tmp_path):
    t = sess.create_material_view("mv_agg", str(tmp_path / "mv_agg"), AGG_SQL)
    assert rows(t.to_df()) == rows(sess.spark.sql(AGG_SQL))


def test_rewrite_exact_hit(sess, tmp_path):
    sess.create_material_view("mv_agg", str(tmp_path / "mv_agg"), AGG_SQL)
    hit = mv.try_rewrite(sess, AGG_SQL)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(AGG_SQL))


def test_rewrite_join_with_residual_filter(sess, tmp_path):
    sess.create_material_view("mv_join", str(tmp_path / "mv_join"), JOIN_SQL)
    q = JOIN_SQL + " AND c.c_name LIKE 'Customer%'"
    hit = mv.try_rewrite(sess, q)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(q))


def test_rewrite_agg_over_plain_view(sess, tmp_path):
    sess.create_material_view("mv_join", str(tmp_path / "mv_join"), JOIN_SQL)
    q = """
    SELECT c_name, count(1) AS n, max(o_totalprice) AS mx
    FROM orders_t o JOIN customer_t c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 500 GROUP BY c_name
    """
    hit = mv.try_rewrite(sess, q)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(q))


def test_rewrite_misses(sess, tmp_path):
    sess.create_material_view("mv_agg", str(tmp_path / "mv_agg"), AGG_SQL)
    # different table set
    assert mv.try_rewrite(sess, "SELECT c_name FROM customer_t") is None
    # query filter LOOSER than view's (view not a superset of rows)
    loose = AGG_SQL.replace("o_totalprice > 1000", "o_totalprice > 10")
    assert mv.try_rewrite(sess, loose) is None
    # aggregate the view doesn't carry
    q = AGG_SQL.replace("sum(o_totalprice) AS total", "avg(o_orderkey) AS total")
    assert mv.try_rewrite(sess, q) is None


def test_session_sql_routes_through_mv(sess, tmp_path):
    sess.create_material_view("mv_agg", str(tmp_path / "mv_agg"), AGG_SQL)
    assert rows(sess.sql(AGG_SQL)) == rows(sess.sql(AGG_SQL, rewrite=False))


def test_staleness_blocks_and_refresh_unblocks(sess, tmp_path, spark):
    sess.create_material_view("mv_agg", str(tmp_path / "mv_agg"), AGG_SQL)
    # mutate the source table → fingerprints diverge
    t = sess.table("orders_t")
    t.delete(F.col("o_totalprice") > 50000)
    assert mv.try_rewrite(sess, AGG_SQL) is None
    assert mv.update_material_view(sess, "mv_agg") is True
    hit = mv.try_rewrite(sess, AGG_SQL)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(AGG_SQL))
    # second refresh is a no-op
    assert mv.update_material_view(sess, "mv_agg") is False


def test_auto_update_view_self_refreshes(sess, tmp_path):
    sess.create_material_view("mv_auto", str(tmp_path / "mv_auto"), AGG_SQL,
                              auto_update=True)
    sess.table("orders_t").delete(F.col("o_totalprice") > 50000)
    hit = mv.try_rewrite(sess, AGG_SQL)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(AGG_SQL))


def test_unsupported_shapes_rejected(sess, tmp_path):
    with pytest.raises(Exception):
        sess.create_material_view(
            "mv_bad", str(tmp_path / "mv_bad"),
            "SELECT o_orderkey FROM orders_t ORDER BY o_orderkey LIMIT 5")


def test_drop_material_view(sess, tmp_path):
    sess.create_material_view("mv_agg", str(tmp_path / "mv_agg"), AGG_SQL)
    mv.drop_material_view(sess, "mv_agg")
    assert mv.try_rewrite(sess, AGG_SQL) is None
