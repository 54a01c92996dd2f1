"""DQ13-DQ20 — relational/analytics coverage over the TPC-H-ish tables.

Joins (inner/left/semi/anti, broadcast-able dims), hash aggregates,
grouping sets, windows, sort/top-k, set ops, scalar/date/hash functions.
All "engine-side additions" per SURVEY.md §2.2 — the reference has none
of these (its only join is an application-level IN-list lookup,
SqliteProvider.cs:333-355); Spark provides them natively and the value
here is an *oracle-exact* formulation.

FP discipline: money math is routed through exact DECIMAL casts (sums of
doubles are accumulation-order-dependent and would hash-mismatch DuckDB);
the final cast to DOUBLE is a single deterministic rounding on both
engines. Averages are computed as exact-decimal sum cast to double, then
IEEE-divided by the count.
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


# revenue per lineitem, exact: price and discount quantized to 2dp, the
# product has exactly 4 decimals -> DECIMAL(18,4) lossless. (Column exprs
# are built lazily — constructing them needs an active SparkSession.)
def _rev_spark():
    return (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("decimal(18,4)")


_REV_SQL = (
    "CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))"
)


@register(
    "tpch_q1_pricing",
    f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST({_REV_SQL} * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 pricing summary: multi-aggregate hash agg with partial "
    "(map-side) combine; decimal-exact sums",
)
def tpch_q1_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
    charge = (_rev_spark() * (F.lit(1).cast("decimal(18,2)") + _dec("l_tax"))).cast("decimal(18,6)")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_rev_spark()).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "tpch_q3_topk",
    f"""
SELECT l.l_orderkey AS o_key,
       CAST(SUM({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue,
       o.o_orderdate, o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
ORDER BY revenue DESC, o_key
LIMIT 10
""",
    doc="TPC-H Q3: 3-way join (broadcast dims) + agg + deterministic top-k",
)
def tpch_q3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15 00:00:00")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15 00:00:00")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(li.l_orderkey.alias("o_key"), o.o_orderdate, o.o_orderpriority)
        .agg(F.sum(_rev_spark()).cast("double").alias("revenue"))
        .select("o_key", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "o_key")
        .limit(10)
    )


@register(
    "tpch_q5_region_revenue",
    f"""
SELECT n.n_name,
       CAST(SUM({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN customer c ON c.c_nationkey = n.n_nationkey
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
WHERE r.r_name = 'AMERICA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
    doc="TPC-H Q5: 6-way star join; small dims broadcast, fact shuffles once",
)
def tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n = _t(spark, sf_dir, "nation")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00") & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey))
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(_rev_spark()).cast("double").alias("revenue"))
    )


@register(
    "join_semi_anti",
    """
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE c.c_mktsegment = 'MACHINERY'
  AND EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
  AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                  AND o.o_totalprice > 300000)
""",
    doc="left-semi + left-anti join composition (reference analogue: "
    "Exists O11 in set form, SURVEY §2.2)",
)
def join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "MACHINERY")
    o = _t(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 300000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(big, F.col("c_custkey") == big.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
    )


@register(
    "join_left_agg",
    """
SELECT c.c_custkey, c.c_mktsegment,
       CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders,
       CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey, c.c_mktsegment
""",
    doc="left outer join + agg preserving order-less customers",
)
def join_left_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spent"),
        )
    )


@register(
    "topk_orders",
    """
SELECT o_orderkey, o_custkey, CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total
FROM orders ORDER BY total DESC, o_orderkey LIMIT 15
""",
    doc="top-k sort: Spark plans TakeOrderedAndProject (no full sort)",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", _dec("o_totalprice").cast("double").alias("total"))
        .orderBy(F.desc("total"), "o_orderkey")
        .limit(15)
    )


@register(
    "window_rank_lag",
    """
SELECT user_id, event_id, event_type,
       CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
       CAST(LAG(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS prev_value,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""",
    doc="window functions: row_number, lag, running decimal sum "
    "(reference analogue: precomputed position ordinal, DedupeObjectMap.cs:42)",
)
def window_rank_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    val = F.col("value").cast("decimal(12,2)")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.row_number().over(w).cast("long").alias("rn"),
        F.lag(val).over(w).cast("double").alias("prev_value"),
        F.sum(val).over(run).cast("double").alias("running_total"),
    )


@register(
    "setops_nations",
    """
SELECT 'both' AS tag, n_nationkey FROM
  (SELECT c_nationkey AS n_nationkey FROM customer
   INTERSECT SELECT s_nationkey FROM supplier) t
UNION ALL
SELECT 'customer_only' AS tag, n_nationkey FROM
  (SELECT c_nationkey AS n_nationkey FROM customer
   EXCEPT SELECT s_nationkey FROM supplier) t
""",
    doc="set operations: INTERSECT / EXCEPT / UNION ALL",
)
def setops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("n_nationkey"))
    supp = _t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("n_nationkey"))
    both = cust.intersect(supp).select(F.lit("both").alias("tag"), "n_nationkey")
    only = cust.subtract(supp).select(F.lit("customer_only").alias("tag"), "n_nationkey")
    return both.unionByName(only)


@register(
    "rollup_orders",
    """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""",
    doc="ROLLUP grouping sets (absent from reference; SURVEY §2.2 aggregations)",
)
def rollup_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n",
            "total",
        )
    )


@register(
    "distinct_agg",
    """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem GROUP BY l_returnflag
""",
    doc="multi distinct aggregate (expand + two-phase agg in Spark)",
)
def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("n_parts"),
            F.count_distinct("l_suppkey").alias("n_supps"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "scalar_funcs",
    """
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substr(p_type, 1, 8) AS type_prefix,
       p_brand || ':' || p_type AS brand_type,
       CAST(length(p_name) AS INTEGER) AS name_len,
       replace(p_type, ' ', '_') AS type_snake,
       CAST(p_size % 7 AS INTEGER) AS size_mod,
       CAST(abs(p_size - 25) AS INTEGER) AS size_dist,
       CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
       sqrt(CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE)) AS price_sqrt
FROM part WHERE p_partkey <= 120
""",
    doc="scalar string/math functions (reference analogue: DedupeCommon "
    "string utilities, O23/O24)",
)
def scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 120)
    price = _dec("p_retailprice").cast("double")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_type", 1, 8).alias("type_prefix"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("int").alias("name_len"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        (F.col("p_size") % 7).cast("int").alias("size_mod"),
        F.abs(F.col("p_size") - 25).cast("int").alias("size_dist"),
        price.alias("price"),
        F.sqrt(price).alias("price_sqrt"),
    )


@register(
    "hash_funcs",
    """
SELECT p_partkey,
       md5(p_name) AS name_md5,
       sha256(p_name) AS name_sha256,
       replace(replace(replace(to_base64(unhex(sha256(p_name))), '=', ''), '/', '_'), '+', '-') AS chunk_key
FROM part WHERE p_partkey <= 100
""",
    doc="hash + key-encoding functions: the O3 chunk key "
    "(urlsafe unpadded b64 of SHA-256, DedupeCommon.cs:146-154) columnar",
)
def hash_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.keys import chunk_key_col

    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 100)
    return p.select(
        "p_partkey",
        F.md5("p_name").alias("name_md5"),
        F.sha2(F.col("p_name"), 256).alias("name_sha256"),
        chunk_key_col(F.col("p_name")).alias("chunk_key"),
    )


@register(
    "date_funcs",
    """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS INTEGER) AS days_since
FROM orders WHERE o_orderkey <= 300
""",
    doc="date/time functions: extraction, truncation, day arithmetic",
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 300)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("yr"),
        F.month("o_orderdate").cast("int").alias("mo"),
        F.quarter("o_orderdate").cast("int").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date"))
        .cast("int")
        .alias("days_since"),
    )


@register(
    "percentile_agg",
    """
SELECT l_returnflag,
       quantile_cont(CAST(CAST(l_quantity AS DECIMAL(12,2)) AS DOUBLE), 0.5) AS median_qty,
       quantile_cont(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS DOUBLE), 0.9) AS p90_price,
       quantile_cont(CAST(CAST(l_discount AS DECIMAL(12,2)) AS DOUBLE), 0.25) AS p25_disc
FROM lineitem GROUP BY l_returnflag
""",
    doc="exact interpolated percentiles (Spark percentile == DuckDB "
    "quantile_cont bit-for-bit on decimal-quantized doubles); at scale "
    "swap for approx_percentile's t-digest sketch",
)
def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile(_dec("l_quantity", 2).cast("double"), 0.5).alias("median_qty"),
        F.percentile(F.col("l_extendedprice").cast("decimal(18,2)").cast("double"), 0.9).alias("p90_price"),
        F.percentile(_dec("l_discount", 2).cast("double"), 0.25).alias("p25_disc"),
    )


@register(
    "approx_distinct_parts",
    """
SELECT l_returnflag,
       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS within_5pct
FROM lineitem GROUP BY l_returnflag
""",
    doc="approx_count_distinct (HyperLogLog++) per return flag — the "
    "sketch path for 100 TB cardinalities. Spark's HLL++ and DuckDB's "
    "approx_distinct are different sketches, so the oracle checks the "
    "sketch's accuracy CONTRACT instead of its raw estimate: the exact "
    "count (which both engines compute identically) plus a flag that "
    "the estimate landed within 5% of it (rsd=0.02, so 5% ~= 2.5 sigma; "
    "HLL++ is seed-free, so the flag is deterministic for a given "
    "corpus). The exact count exists here FOR the oracle comparison — "
    "the production shape is the sketch column alone, at a fraction of "
    "the distinct-shuffle cost.",
)
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.count_distinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("approx_parts") - F.col("exact_parts"))
                <= 0.05 * F.col("exact_parts")
            ).alias("within_5pct"),
        )
    )


@register(
    "grouping_sets_orders",
    """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       COALESCE(o_orderpriority, 'ALL') AS priority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS INT) AS gid,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
""",
    doc="explicit GROUPING SETS (the general form behind rollup/cube): "
    "three chosen grains in ONE pass — Catalyst expands the sets "
    "map-side, so there is a single shuffle regardless of grain count, "
    "where naive UNION ALL of three GROUP BYs would scan and shuffle "
    "three times. GROUPING() markers disambiguate real NULLs from "
    "subtotal rows, exactly as in ANSI SQL.",
)
def grouping_sets_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    gid = (F.grouping("o_orderstatus") * 2 + F.grouping("o_orderpriority")).cast("int")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            gid.alias("gid"),
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "gid",
            "n",
            "total",
        )
    )
