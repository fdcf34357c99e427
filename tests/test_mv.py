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


OR_JOIN_SQL = """
SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice, c.c_name
FROM orders_t o JOIN customer_t c ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus = 'O' OR o.o_orderstatus = 'F'
"""


def test_rewrite_or_disjunct_selection(sess, tmp_path):
    """Query keeps one disjunct of the view's OR filter → rewrite with
    the stronger predicate as compensation (OrInfo.scala:31-220 via
    RewriteQueryByMaterialViewBase OR cases)."""
    sess.create_material_view("mv_or", str(tmp_path / "mv_or"), OR_JOIN_SQL)
    q = OR_JOIN_SQL.replace("o.o_orderstatus = 'O' OR o.o_orderstatus = 'F'",
                            "o.o_orderstatus = 'O'")
    hit = mv.try_rewrite(sess, q)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(q))


def test_rewrite_or_subset_of_disjuncts(sess, tmp_path):
    """Query's OR is a sub-disjunction of the view's wider OR → hit;
    a disjunct OUTSIDE the view's OR → miss (view lacks those rows)."""
    wide = OR_JOIN_SQL.replace(
        "o.o_orderstatus = 'O' OR o.o_orderstatus = 'F'",
        "o.o_orderstatus = 'O' OR o.o_orderstatus = 'F' OR o.o_orderstatus = 'P'")
    sess.create_material_view("mv_or3", str(tmp_path / "mv_or3"), wide)
    hit = mv.try_rewrite(sess, OR_JOIN_SQL)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(OR_JOIN_SQL))
    outside = OR_JOIN_SQL.replace(
        "o.o_orderstatus = 'O' OR o.o_orderstatus = 'F'",
        "o.o_orderstatus = 'O' OR o.o_orderstatus = 'X'")
    assert mv.try_rewrite(sess, outside) is None


def test_rewrite_range_strengthening(sess, tmp_path):
    """Query range STRONGER than the view's → hit with compensation;
    weaker → miss. Mixed with OR: each query disjunct must imply some
    view disjunct."""
    sess.create_material_view("mv_join", str(tmp_path / "mv_join"), JOIN_SQL)
    stronger = JOIN_SQL.replace("o.o_totalprice > 500", "o.o_totalprice > 2000")
    hit = mv.try_rewrite(sess, stronger)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(stronger))
    weaker = JOIN_SQL.replace("o.o_totalprice > 500", "o.o_totalprice > 100")
    assert mv.try_rewrite(sess, weaker) is None
    ge_same = JOIN_SQL.replace("o.o_totalprice > 500", "o.o_totalprice >= 500")
    assert mv.try_rewrite(sess, ge_same) is None  # >= 500 does NOT imply > 500


def test_rewrite_agg_group_filter_compensation(sess, tmp_path):
    """Below-agg filter on a GROUPING column compensates post-agg on
    the view (group-determined predicates are sound); on an aggregated
    column's input → miss."""
    base = """
    SELECT o_orderstatus, count(1) AS n, sum(o_totalprice) AS total
    FROM orders_t GROUP BY o_orderstatus
    """
    sess.create_material_view("mv_agg_all", str(tmp_path / "mv_agg_all"), base)
    q = """
    SELECT o_orderstatus, count(1) AS n, sum(o_totalprice) AS total
    FROM orders_t WHERE o_orderstatus = 'O' OR o_orderstatus = 'F'
    GROUP BY o_orderstatus
    """
    hit = mv.try_rewrite(sess, q)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(q))
    bad = """
    SELECT o_orderstatus, count(1) AS n, sum(o_totalprice) AS total
    FROM orders_t WHERE o_totalprice > 1000 GROUP BY o_orderstatus
    """
    assert mv.try_rewrite(sess, bad) is None


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


def test_drop_table_cascades_to_views(sess, tmp_path):
    """DROP TABLE on a source drops dependent MVs (DropTableCommand
    .scala:30-247 cascade): gone from the registry, never consulted by
    the rewriter; views on OTHER tables survive."""
    sess.create_material_view("mv_agg", str(tmp_path / "mv_agg"), AGG_SQL)
    sess.create_material_view("mv_cust", str(tmp_path / "mv_cust"),
                              "SELECT c_custkey, c_name FROM customer_t")
    assert "mv_agg" in mv._load_registry(sess.warehouse)
    sess.sql("DROP TABLE orders_t")
    reg = mv._load_registry(sess.warehouse)
    assert "mv_agg" not in reg
    assert "mv_cust" in reg  # unrelated view untouched
    # a recreated source table must not hit the stale view
    orders = sess.spark.read.parquet(f"{SF}/orders.parquet")
    sess.create_table(orders, str(tmp_path / "orders_t2"), name="orders_t")
    sess._sync_views()
    assert mv.try_rewrite(sess, AGG_SQL) is None


def test_drop_material_view(sess, tmp_path):
    sess.create_material_view("mv_agg", str(tmp_path / "mv_agg"), AGG_SQL)
    mv.drop_material_view(sess, "mv_agg")
    assert mv.try_rewrite(sess, AGG_SQL) is None


# --- round-4 expression-vocabulary extensions (reference
# RewriteQueryByMaterialView.scala:256-969 temporal/CASE/agg-arith) ---

DATE_AGG_SQL = """
SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
       sum(o_totalprice) AS total, count(1) AS n
FROM orders_t GROUP BY year(o_orderdate), quarter(o_orderdate)
"""


DATED_JOIN_SQL = """
SELECT o.o_orderkey, o.o_orderdate, o.o_totalprice, c.c_name
FROM orders_t o JOIN customer_t c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 500
"""


def test_rewrite_date_arith_residual(sess, tmp_path):
    """Residual filters using date arithmetic (datediff / date_add /
    trunc against literals) over a view exposing the date column render
    to SQL and hit."""
    sess.create_material_view("mv_j2", str(tmp_path / "mv_j2"),
                              DATED_JOIN_SQL)
    q = DATED_JOIN_SQL + (" AND datediff(DATE '1995-01-01', o.o_orderdate)"
                          " > 30 AND trunc(o.o_orderdate, 'YEAR') >="
                          " DATE '1993-01-01'")
    hit = mv.try_rewrite(sess, q)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(q))


def test_rewrite_group_expr_filter_compensation(sess, tmp_path):
    """Query filter on year(o_orderdate) — a grouping EXPRESSION, not a
    plain column — compensates on the aggregated view (the predicate is
    group-determined, so it commutes with the aggregation)."""
    sess.create_material_view("mv_dt", str(tmp_path / "mv_dt"), DATE_AGG_SQL)
    q = ("SELECT year(o_orderdate) AS yr, sum(o_totalprice) AS total "
         "FROM orders_t WHERE year(o_orderdate) >= 1995 "
         "GROUP BY year(o_orderdate), quarter(o_orderdate)")
    hit = mv.try_rewrite(sess, q)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(q))


def test_rewrite_arithmetic_of_aggregates(sess, tmp_path):
    """sum/count arithmetic over a view that materializes both aggs:
    avg-by-hand, rounded sums, sums scaled by literals."""
    sess.create_material_view("mv_agg2", str(tmp_path / "mv_agg2"), AGG_SQL)
    q = ("SELECT o_orderstatus, sum(o_totalprice) / count(1) AS avg_price, "
         "round(sum(o_totalprice), 0) AS total_r, "
         "sum(o_totalprice) * 1.1 AS uplift "
         "FROM orders_t WHERE o_totalprice > 1000 GROUP BY o_orderstatus")
    hit = mv.try_rewrite(sess, q)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(q))


def test_rewrite_case_when_inside_agg(sess, tmp_path):
    """CASE WHEN inside an aggregate argument: matches canonically when
    the view materializes the identical aggregate, and the CASE output
    renders through to_sql for the re-aggregation path."""
    case_sql = ("SELECT o_orderstatus, "
                "sum(CASE WHEN o_totalprice > 2000 THEN o_totalprice "
                "ELSE 0.0 END) AS big_total FROM orders_t "
                "GROUP BY o_orderstatus")
    sess.create_material_view("mv_case", str(tmp_path / "mv_case"), case_sql)
    hit = mv.try_rewrite(sess, case_sql)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(case_sql))


def test_rewrite_case_when_residual_filter(sess, tmp_path):
    """CASE WHEN in a residual predicate over a plain view renders."""
    sess.create_material_view("mv_j3", str(tmp_path / "mv_j3"), JOIN_SQL)
    q = JOIN_SQL + (" AND (CASE WHEN c.c_name LIKE 'Customer%' "
                    "THEN o.o_totalprice ELSE 0 END) > 600")
    hit = mv.try_rewrite(sess, q)
    assert hit is not None
    assert rows(hit) == rows(sess.spark.sql(q))


def test_rewrite_refuses_unmaterialized_agg(sess, tmp_path):
    """An aggregate the view does NOT materialize (avg when the view
    has sum+count... spelled as avg()) must not re-run over the view's
    one-row-per-group output — rewrite declines, falls back."""
    sess.create_material_view("mv_agg3", str(tmp_path / "mv_agg3"), AGG_SQL)
    q = ("SELECT o_orderstatus, avg(o_totalprice) AS ap FROM orders_t "
         "WHERE o_totalprice > 1000 GROUP BY o_orderstatus")
    assert mv.try_rewrite(sess, q) is None
    # and the fallback (plain SQL) is still correct end-to-end
    assert rows(sess.sql(q)) == rows(sess.spark.sql(q))
