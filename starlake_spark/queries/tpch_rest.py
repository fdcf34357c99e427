"""Remaining TPC-H-shape queries (q2 q7 q8 q9 q11 q13 q15 q16 q17 q20 q21 q22).

Completes the 22-query TPC-H suite over the driver's reduced star
schema.  The testdata has no partsupp table and no
commitdate/receiptdate/phone/container columns, so the queries that
reference them are adapted while keeping the classic plan shape the
query is famous for:

- q2   min-cost supplier     -> supply cost proxy = min unit price seen
                                in lineitem per (part, supplier)
- q9   product-type profit   -> profit without ps_supplycost
- q11  important stock       -> part value from lineitem revenue,
                                HAVING > fraction of scalar total
- q16  parts/supplier rel.   -> supplier exclusion by negative acctbal
                                instead of comment pattern
- q20  potential promotion   -> supplied-quantity threshold from
                                lineitem instead of ps_availqty
- q21  waiting suppliers     -> "late" proxy = l_returnflag 'R' inside
                                'F' orders; keeps the EXISTS /
                                NOT-EXISTS double correlation
- q22  sales opportunity     -> country code -> customer nation, "no
                                orders" -> no orders in 2001 (every
                                customer has some order in 6.5 years)

Scale notes (100 TB posture): every dimension join is broadcast
(region/nation/supplier/part are tiny next to lineitem); scalar
aggregates are crossJoin(broadcast(1-row)) not collected to the
driver; the EXISTS/NOT-EXISTS correlations compile to semi/anti
joins keyed on l_orderkey so they shuffle once on the natural key.

All money sums go through decimal(18,2) so the oracle comparison is
order-insensitive (float sums are not associative).
"""

from __future__ import annotations

from pyspark.sql import Window as W, functions as F

from starlake_spark.queries.analytics import DEC, _disc_price, _money, ld


# ---------------------------------------------------------------------------
# q2: min-cost supplier for EUROPE STANDARD size-15 parts
# ---------------------------------------------------------------------------

def q2_min_cost_supplier(spark, sf_dir):
    l = ld(spark, sf_dir, "lineitem")
    p = ld(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    s = ld(spark, sf_dir, "supplier")
    n = ld(spark, sf_dir, "nation")
    r = ld(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    supply = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supply_cost"))
    )
    eligible = (
        supply.join(F.broadcast(p), supply.l_partkey == p.p_partkey)
        .join(F.broadcast(s), supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    w = W.partitionBy("p_partkey")
    return (
        eligible.withColumn("min_cost", F.min("supply_cost").over(w))
        .filter(F.col("supply_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH supply AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eligible AS (
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name, supply_cost,
         MIN(supply_cost) OVER (PARTITION BY p_partkey) AS min_cost
  FROM supply
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND p_type = 'STANDARD' AND r_name = 'EUROPE'
)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name
FROM eligible WHERE supply_cost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q7: volume shipping between two nations, by year, both directions
# ---------------------------------------------------------------------------

def q7_volume_shipping(spark, sf_dir):
    l = ld(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") <= "1996-12-31")
    )
    o = ld(spark, sf_dir, "orders")
    c = ld(spark, sf_dir, "customer")
    s = ld(spark, sf_dir, "supplier")
    n1 = ld(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = ld(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2") | (
        F.col("supp_nation") == "NATION_2"
    ) & (F.col("cust_nation") == "NATION_1")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
  CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    EXTRACT(year FROM l_shipdate) AS l_year,
    CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(18,2)) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# q8: market share of NATION_3 suppliers in ASIA ECONOMY-part volume
# ---------------------------------------------------------------------------

def q8_market_share(spark, sf_dir):
    l = ld(spark, sf_dir, "lineitem")
    o = ld(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") <= "1996-12-31")
    )
    p = ld(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    c = ld(spark, sf_dir, "customer")
    s = ld(spark, sf_dir, "supplier")
    n1 = ld(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = ld(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    r = ld(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == r.r_regionkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume", _disc_price())
    )
    return (
        vol.groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(F.lit(0).cast(DEC)))
            .cast("double")
            .alias("nation_volume"),
            F.sum("volume").cast("double").alias("total_volume"),
        )
        .withColumn("mkt_share", F.round(F.col("nation_volume") / F.col("total_volume"), 6))
        .select("o_year", "mkt_share")
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT o_year,
  ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
        / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
    CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(18,2)) AS volume,
    n2.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region ON n1.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00' AND TIMESTAMP '1996-12-31 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# q9: profit by supplier nation and year for '%bolt%' parts
# ---------------------------------------------------------------------------

def q9_product_type_profit(spark, sf_dir):
    l = ld(spark, sf_dir, "lineitem")
    p = ld(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = ld(spark, sf_dir, "supplier")
    o = ld(spark, sf_dir, "orders")
    n = ld(spark, sf_dir, "nation")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(F.sum(_disc_price()).cast("double").alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders ON l_orderkey = o_orderkey
JOIN nation ON s_nationkey = n_nationkey
WHERE p_name LIKE '%bolt%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
ORDER BY nation, o_year DESC
"""


# ---------------------------------------------------------------------------
# q11: important parts by revenue share for one nation's suppliers
# ---------------------------------------------------------------------------

def q11_important_stock(spark, sf_dir):
    l = ld(spark, sf_dir, "lineitem")
    s = ld(spark, sf_dir, "supplier")
    n = ld(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    scoped = (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .withColumn("value", _money(F.col("l_extendedprice")) * _money(F.col("l_quantity")))
    )
    per_part = scoped.groupBy("l_partkey").agg(F.sum("value").alias("part_value"))
    total = scoped.agg((F.sum("value") * F.lit(0.001).cast("decimal(10,6)")).alias("threshold"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


Q11_SQL = """
WITH scoped AS (
  SELECT l_partkey,
    CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_5'
)
SELECT l_partkey, CAST(SUM(value) AS DOUBLE) AS part_value
FROM scoped
GROUP BY l_partkey
HAVING SUM(value) > (SELECT SUM(value) * CAST(0.001 AS DECIMAL(10,6)) FROM scoped)
ORDER BY part_value DESC, l_partkey
"""


# ---------------------------------------------------------------------------
# q13: distribution of customers by order count
# ---------------------------------------------------------------------------

def q13_customer_distribution(spark, sf_dir):
    c = ld(spark, sf_dir, "customer")
    o = ld(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "4-NOT SPECIFIED")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# q15: top supplier(s) by revenue in 1996 Q1
# ---------------------------------------------------------------------------

def q15_top_supplier(spark, sf_dir):
    l = ld(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    s = ld(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue")
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
    SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1-l_discount AS DECIMAL(18,2))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# q16: distinct suppliers per (brand, type, size), excluding a brand and
# suppliers in deficit
# ---------------------------------------------------------------------------

def q16_parts_supplier(spark, sf_dir):
    l = ld(spark, sf_dir, "lineitem")
    p = ld(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = ld(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = l.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(bad, pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), pairs.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# q17: yearly revenue lost to small-quantity Brand#3 orders
# ---------------------------------------------------------------------------

def q17_small_quantity(spark, sf_dir):
    l = ld(spark, sf_dir, "lineitem")
    p = ld(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    avg_qty = l.groupBy(F.col("l_partkey").alias("agg_partkey")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(avg_qty, l.l_partkey == F.col("agg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((F.sum(_money(F.col("l_extendedprice"))).cast("double") / 7.0).alias("avg_yearly"))
        .select(F.round("avg_yearly", 4).alias("avg_yearly"))
    )


Q17_SQL = """
SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4) AS avg_yearly
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN (
  SELECT l_partkey AS agg_partkey, 0.2 * AVG(l_quantity) AS qty_threshold
  FROM lineitem GROUP BY l_partkey
) part_agg ON l_partkey = agg_partkey
WHERE p_brand = 'Brand#3' AND l_quantity < qty_threshold
"""


# ---------------------------------------------------------------------------
# q20: suppliers in one nation who moved serious volume of 'red%' parts
# ---------------------------------------------------------------------------

def q20_potential_promotion(spark, sf_dir):
    l = ld(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    p = ld(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    s = ld(spark, sf_dir, "supplier")
    n = ld(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_2")
    movers = (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 100.0)
        .select("l_suppkey")
    )
    return (
        s.join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, s_acctbal
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 100.0
)
AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_2')
ORDER BY s_name
"""


# ---------------------------------------------------------------------------
# q21: suppliers whose returned lines held up multi-supplier 'F' orders
# ---------------------------------------------------------------------------

def q21_waiting_suppliers(spark, sf_dir):
    l = ld(spark, sf_dir, "lineitem")
    o = ld(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    s = ld(spark, sf_dir, "supplier")
    n = ld(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")

    l1 = l.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = l.select(
        F.col("l_orderkey").alias("l2_orderkey"), F.col("l_suppkey").alias("l2_suppkey")
    )
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    )
    waiting = (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(F.broadcast(s), waiting.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey, "left_semi")
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R'
  AND l1.l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F')
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
  AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_4')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q22: wealthy customers in selected nations with no 2001 orders
# ---------------------------------------------------------------------------

_Q22_NATIONS = ("NATION_1", "NATION_3", "NATION_5", "NATION_7", "NATION_9", "NATION_11", "NATION_13")


def q22_sales_opportunity(spark, sf_dir):
    c = ld(spark, sf_dir, "customer")
    n = ld(spark, sf_dir, "nation").filter(F.col("n_name").isin(*_Q22_NATIONS))
    o = ld(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2001-01-01").select("o_custkey")
    scoped = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    avg_bal = scoped.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_acctbal")
    )
    return (
        scoped.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_acctbal"))
        .join(o, scoped.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_money(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
        .orderBy("cntry")
    )


Q22_SQL = """
WITH scoped AS (
  SELECT c_custkey, c_acctbal, n_name
  FROM customer JOIN nation ON c_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1','NATION_3','NATION_5','NATION_7','NATION_9','NATION_11','NATION_13')
)
SELECT n_name AS cntry, COUNT(*) AS numcust,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM scoped
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM scoped WHERE c_acctbal > 0.0)
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '2001-01-01 00:00:00'
  )
GROUP BY n_name
ORDER BY cntry
"""


TPCH_REST_QUERIES = {
    "q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "q8_market_share": (q8_market_share, Q8_SQL),
    "q9_product_type_profit": (q9_product_type_profit, Q9_SQL),
    "q11_important_stock": (q11_important_stock, Q11_SQL),
    "q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "q16_parts_supplier": (q16_parts_supplier, Q16_SQL),
    "q17_small_quantity": (q17_small_quantity, Q17_SQL),
    "q20_potential_promotion": (q20_potential_promotion, Q20_SQL),
    "q21_waiting_suppliers": (q21_waiting_suppliers, Q21_SQL),
    "q22_sales_opportunity": (q22_sales_opportunity, Q22_SQL),
}
