"""Completing the TPC-H shape suite — Q2/Q7/Q8/Q9/Q11/Q13/Q15/Q16/Q20/Q21.

With relational.py (Q1/Q3/Q5/Q6) and relational_ext.py (Q4/Q10/Q12/Q14/
Q17/Q18/Q19/Q22) this gives all 22 TPC-H query *shapes* oracle-exact vs
DuckDB. The driver's star schema has no ``partsupp`` table and lineitem
carries only ``l_shipdate`` (no commit/receipt dates, no comments), so
the queries that reference those are adapted — the adaptation keeps the
canonical plan shape (what the optimizer must do) and swaps only the
column it does it over:

- Q2's supply-cost is proxied by MIN(l_extendedprice) per (part,
  supplier) observed in lineitem (exact DECIMAL, so the correlated-MIN
  equality is bit-stable on both engines).
- Q9's profit drops the ``ps_supplycost * l_quantity`` term (no
  partsupp) and keeps the revenue term; the grouping (nation x year
  derived from an order-side date) and the part-name filter stay.
- Q13's comment filter becomes an order-priority filter.
- Q16's "complaints" supplier exclusion becomes a negative-balance
  exclusion; per-(brand,type,size) supplier counts come from lineitem
  instead of partsupp.
- Q20's availqty threshold becomes a shipped-quantity threshold.
- Q21's commit/receipt lateness becomes shipdate lateness relative to
  the order's other suppliers.

Scale posture: every query shuffles the fact table at most once per
aggregate grain; dims broadcast; correlated subqueries are decorrelated
into aggregate-then-join (Q2, Q21 use window functions over a single
partitioning rather than self-joins — one shuffle instead of three).

Reference parity: none of these exist in WatsonDedupe (SURVEY.md §2.2 —
its only join is the IN-list chunk lookup, SqliteProvider.cs:333-355);
they are engine-side relational additions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from watsondedupe_spark.queries import register
from watsondedupe_spark.sources import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _dec(col, scale=2):
    return F.col(col).cast(f"decimal(18,{scale})")


def _rev_spark():
    return (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("decimal(18,4)")


_REV_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"
)


@register(
    "tpch_q2_min_cost_supplier",
    """
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS supply_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT CAST(CAST(s.s_acctbal AS DECIMAL(18,2)) AS DOUBLE) AS s_acctbal,
       s.s_name, n.n_name, p.p_partkey, p.p_type,
       CAST(c.supply_cost AS DOUBLE) AS supply_cost
FROM part p
JOIN cost c     ON c.l_partkey = p.p_partkey
JOIN supplier s ON s.s_suppkey = c.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN region r   ON r.r_regionkey = n.n_regionkey
WHERE p.p_size = 15 AND p.p_type = 'LARGE' AND r.r_name = 'EUROPE'
  AND c.supply_cost = (
    SELECT MIN(c2.supply_cost)
    FROM cost c2
    JOIN supplier s2 ON s2.s_suppkey = c2.l_suppkey
    JOIN nation n2   ON n2.n_nationkey = s2.s_nationkey
    JOIN region r2   ON r2.r_regionkey = n2.n_regionkey
    WHERE c2.l_partkey = p.p_partkey AND r2.r_name = 'EUROPE')
ORDER BY s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
""",
    doc="TPC-H Q2 shape: correlated MIN subquery decorrelated to a window "
    "min over the region-filtered (part, supplier) cost table — one "
    "shuffle on l_partkey instead of a self-join; supply cost proxied by "
    "MIN(l_extendedprice) (no partsupp in schema)",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter((F.col("p_size") == 15) & (F.col("p_type") == "LARGE"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    # (part, supplier) cost grid restricted to EUROPE suppliers (dims broadcast)
    cost = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_dec("l_extendedprice")).alias("supply_cost"))
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    # decorrelate the per-part MIN with a window over the same partitioning
    w = Window.partitionBy("l_partkey")
    best = cost.withColumn("min_cost", F.min("supply_cost").over(w)).filter(
        F.col("supply_cost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
        .select(
            _dec("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            F.col("supply_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q7_nation_volume",
    f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, l_year
""",
    doc="TPC-H Q7: bidirectional nation-pair volume — the nation dim joins "
    "twice under different aliases (broadcast both), disjunctive pair "
    "predicate, group by (nation, nation, year)",
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7") | (
        F.col("supp_nation") == "NATION_7"
    ) & (F.col("cust_nation") == "NATION_3")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(_rev_spark()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    f"""
WITH all_nations AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         {_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')} AS volume,
         n2.n_name AS supp_nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n1.n_regionkey
  JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_2' THEN volume
                     ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM all_nations GROUP BY o_year
""",
    doc="TPC-H Q8: market share — 8-way join with the nation dim aliased "
    "twice (customer side restricts the region, supplier side labels the "
    "share), conditional ratio-of-sums per year",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    c = _t(spark, sf_dir, "customer")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    zero = F.lit(0).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n1_region") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("supp_nation") == "NATION_2", _rev_spark()).otherwise(zero))
                .cast("double")
                / F.sum(_rev_spark()).cast("double")
            ).alias("mkt_share")
        )
    )


@register(
    "tpch_q9_profit_by_nation",
    f"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS sum_profit
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE p.p_name LIKE '%green%'
GROUP BY nation, o_year
""",
    doc="TPC-H Q9 shape: profit by supplier-nation x order-year with a "
    "part-name LIKE filter; the ps_supplycost term is dropped (no "
    "partsupp table) so profit = discounted revenue",
)
def tpch_q9_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("%green%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(_rev_spark()).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    """
WITH value_by_part AS (
  SELECT l.l_partkey,
         SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                  CAST(l.l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS part_value
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n   ON n.n_nationkey = s.s_nationkey
  WHERE n.n_name = 'NATION_5'
  GROUP BY l.l_partkey)
SELECT l_partkey, CAST(part_value AS DOUBLE) AS part_value
FROM value_by_part
WHERE part_value > (
  SELECT CAST(SUM(part_value) * CAST(0.001 AS DECIMAL(6,4)) AS DECIMAL(38,8))
  FROM value_by_part)
ORDER BY part_value DESC, l_partkey
""",
    doc="TPC-H Q11 shape: per-part value within one nation's suppliers, "
    "HAVING above a scalar-subquery fraction of the total — the scalar "
    "collapses to a 1-row broadcast cross join, decimal-exact on both "
    "engines (stock value proxied from lineitem; no partsupp)",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    val = (_dec("l_extendedprice") * _dec("l_quantity")).cast("decimal(28,4)")
    by_part = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("l_partkey")
        .agg(F.sum(val).alias("part_value"))
    )
    threshold = by_part.agg(
        (F.sum("part_value") * F.lit(0.001).cast("decimal(6,4)"))
        .cast("decimal(38,8)")
        .alias("cutoff")
    )
    return (
        by_part.join(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select("l_partkey", F.col("part_value").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), "l_partkey")
    )


@register(
    "tpch_q13_order_count_distribution",
    """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
  FROM customer c
  LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    doc="TPC-H Q13: distribution of per-customer order counts — left outer "
    "join with a join-side filter (kept out of the WHERE so order-less "
    "customers survive), then a second aggregate over the first's result",
)
def tpch_q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15_top_supplier",
    f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({_REV_SQL}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
    doc="TPC-H Q15: top supplier by quarterly revenue — the revenue view "
    "computed once, max as a scalar-subquery broadcast, ties preserved; "
    "decimal-exact so the equality is bit-stable",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-04-01 00:00:00")
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_spark()).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
        .orderBy("s_suppkey")
    )


@register(
    "tpch_q16_supplier_part_counts",
    """
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand <> 'Brand#13'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
    doc="TPC-H Q16 shape: distinct-supplier counts per (brand, type, size) "
    "with a NOT IN exclusion subquery (anti-join against negative-balance "
    "suppliers; the reference 'complaints' filter has no comment column); "
    "supplier-part pairs come from lineitem (no partsupp)",
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q20_part_movers",
    """
SELECT s.s_name, s.s_suppkey
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_1'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey
    FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_suppkey, l.l_partkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > CAST(90 AS DECIMAL(18,2)))
ORDER BY s.s_name
""",
    doc="TPC-H Q20 shape: nested IN chains — parts by name prefix, then "
    "(supplier, part) groups whose yearly shipped quantity clears a "
    "threshold (availqty stand-in; no partsupp), then the supplier "
    "semi-join restricted to one nation",
)
def tpch_q20_part_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    red_parts = _t(spark, sf_dir, "part").filter(F.col("p_name").like("red%")).select("p_partkey")
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00")
    )
    movers = (
        li.join(F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty"))
        .filter(F.col("qty") > F.lit(90).cast("decimal(18,2)"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(movers, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_suppkey")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_waiting_supplier",
    """
WITH pair AS (
  SELECT l.l_orderkey, l.l_suppkey, MAX(l.l_shipdate) AS max_ship
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  WHERE o.o_orderstatus = 'F'
  GROUP BY l.l_orderkey, l.l_suppkey)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM pair p1
JOIN supplier s ON s.s_suppkey = p1.l_suppkey
JOIN nation n   ON n.n_nationkey = s.s_nationkey
WHERE n.n_name = 'NATION_4'
  AND EXISTS (SELECT 1 FROM pair p2
              WHERE p2.l_orderkey = p1.l_orderkey
                AND p2.l_suppkey <> p1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM pair p3
                  WHERE p3.l_orderkey = p1.l_orderkey
                    AND p3.l_suppkey <> p1.l_suppkey
                    AND p3.max_ship > p1.max_ship)
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 100
""",
    doc="TPC-H Q21 shape: suppliers who were the last to ship on "
    "multi-supplier finished orders (shipdate lateness stands in for the "
    "missing commit/receipt dates). The EXISTS / NOT EXISTS pair is "
    "decorrelated into window aggregates over one (orderkey) "
    "partitioning — one shuffle instead of two self-joins",
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_4")
    pair = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("l_shipdate").alias("max_ship"))
    )
    # EXISTS(other supplier) -> per-order supplier count > 1;
    # NOT EXISTS(other shipped later) -> this supplier's max_ship equals
    # the order-wide max (ties qualify on both sides, matching the SQL).
    w = Window.partitionBy("l_orderkey")
    waiting = (
        pair.withColumn("n_supp", F.count("*").over(w))
        .withColumn("order_max", F.max("max_ship").over(w))
        .filter((F.col("n_supp") > 1) & (F.col("max_ship") == F.col("order_max")))
    )
    return (
        waiting.join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
