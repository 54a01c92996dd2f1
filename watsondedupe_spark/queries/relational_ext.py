"""Extended relational coverage — TPC-H-style query shapes the first
relational batch (relational.py) did not exercise, adapted to the
driver's pared-down star schema (no partsupp/shipmode/phone columns).

New plan shapes covered here, each oracle-exact vs DuckDB:

- semi-join driven aggregate (Q4), single-pass filter aggregate (Q6),
  returned-revenue top-k over a 4-way join (Q10), conditional CASE
  aggregation (Q12), promo revenue share (Q14), decorrelated correlated
  subquery (Q17), HAVING over a join-back aggregate (Q18), disjunctive
  OR-of-ANDs join predicate (Q19), scalar-subquery + anti-join (Q22)
- JSON extraction from a string column (events.props)
- gap-based sessionization (lag + cumulative flag sum), the batch
  analogue of session_window with exact integer-microsecond arithmetic

Scale posture: every dim side small enough to broadcast is broadcast;
the fact table (lineitem/orders/events) shuffles at most once per
aggregate grain; scalar subqueries collapse to a 1-row broadcast cross
join rather than a driver collect. FP discipline follows relational.py:
money math through DECIMAL, one final double cast on both engines.

Reference parity note: none of these exist in WatsonDedupe (its only
join is the IN-list chunk lookup, SqliteProvider.cs:333-355); they are
engine-side additions per SURVEY.md §2.2/DQ13-DQ20.
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
    "tpch_q4_priority",
    """
SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY o.o_orderpriority
""",
    doc="TPC-H Q4 shape: EXISTS decorrelated to a left-semi join, then "
    "count per priority (one shuffle on o_orderkey, one on the group key)",
)
def tpch_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-04-01 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "tpch_q6_revenue",
    """
SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                     CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE)
         AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(18,2)) BETWEEN CAST(0.05 AS DECIMAL(18,2))
                                            AND CAST(0.07 AS DECIMAL(18,2))
  AND l_quantity < 24
""",
    doc="TPC-H Q6: pure scan-filter-aggregate — the predicate-pushdown / "
    "whole-stage-codegen showcase (no shuffle at all beyond the final "
    "1-row reduce)",
)
def tpch_q6_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00")
        & _dec("l_discount").between(
            F.lit(0.05).cast("decimal(18,2)"), F.lit(0.07).cast("decimal(18,2)")
        )
        & (F.col("l_quantity") < 24)
    )
    disc_rev = (_dec("l_extendedprice") * _dec("l_discount")).cast("decimal(18,4)")
    return li.agg(
        F.sum(disc_rev).cast("double").alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@register(
    "tpch_q10_returns",
    f"""
SELECT c.c_custkey, c.c_name, n.n_name,
       CAST(SUM({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON n.n_nationkey = c.c_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    doc="TPC-H Q10: lost-revenue top-20 — 4-way join with broadcast "
    "customer/nation dims, one fact shuffle, TakeOrderedAndProject top-k",
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01 00:00:00")
        & (F.col("o_orderdate") < "1997-07-01 00:00:00")
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_spark()).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q12_priority_class",
    """
SELECT l.l_linestatus,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
    doc="TPC-H Q12 shape: conditional CASE aggregation after an equi-join "
    "(priority buckets stand in for the absent l_shipmode column)",
)
def tpch_q12_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01 00:00:00")
        & (F.col("l_shipdate") < "1998-01-01 00:00:00")
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo",
    f"""
SELECT
  CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}
                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
  CAST(SUM({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS total_revenue,
  100.0 * (CAST(SUM(CASE WHEN p.p_type = 'PROMO' THEN {_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}
                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE)) AS promo_pct
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-06-01 00:00:00'
""",
    doc="TPC-H Q14: promo revenue share — broadcast part dim, conditional "
    "decimal sums, ratio taken once in IEEE double (identical bits both "
    "engines because the operands are decimal-exact)",
)
def tpch_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-03-01 00:00:00")
        & (F.col("l_shipdate") < "1997-06-01 00:00:00")
    )
    p = _t(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev_spark()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    joined = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    agg = joined.agg(
        F.sum(promo).cast("double").alias("promo_revenue"),
        F.sum(_rev_spark()).cast("double").alias("total_revenue"),
    )
    return agg.select(
        "promo_revenue",
        "total_revenue",
        (F.lit(100.0) * (F.col("promo_revenue") / F.col("total_revenue"))).alias("promo_pct"),
    )


@register(
    "tpch_q17_small_qty",
    """
WITH part_avg AS (
  SELECT l_partkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN part_avg a ON a.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#5'
  AND l.l_quantity < 0.4 * a.avg_qty
""",
    doc="TPC-H Q17 shape: correlated scalar subquery decorrelated into a "
    "per-part aggregate joined back to the fact (Catalyst does the same "
    "rewrite for the subquery form); avg computed decimal-exact",
)
def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#5")
    part_avg = li.groupBy("l_partkey").agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(part_avg.withColumnRenamed("l_partkey", "pa_partkey"),
              F.col("l_partkey") == F.col("pa_partkey"))
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


@register(
    "tpch_q18_big_orders",
    """
SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o   ON o.o_custkey = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > CAST(250 AS DECIMAL(18,2)))
GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate
ORDER BY total_qty DESC, o.o_orderkey
LIMIT 20
""",
    doc="TPC-H Q18: large-volume orders — HAVING aggregate as a semi-join "
    "filter, then re-aggregate at the order grain with broadcast customer",
)
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > F.lit(250).cast("decimal(18,2)"))
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_orderkey"),
                li.l_orderkey == F.col("big_orderkey"), "left_semi")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


@register(
    "tpch_q19_disjunctive",
    f"""
SELECT CAST(SUM({_REV_SQL.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1  AND l.l_quantity <= 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
""",
    doc="TPC-H Q19: disjunctive OR-of-ANDs predicate spanning both join "
    "sides — Catalyst extracts the common p_partkey equi-key so the join "
    "stays hash-based (no nested-loop), residual OR evaluated post-join",
)
def tpch_q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    q = F.col("l_quantity")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 25) & (q >= 10) & (q <= 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35) & (q >= 20) & (q <= 40))
    )
    return j.filter(cond).agg(
        F.sum(_rev_spark()).cast("double").alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@register(
    "tpch_q22_idle_rich",
    """
SELECT c.c_nationkey,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE CAST(CAST(c.c_acctbal AS DECIMAL(18,2)) AS DOUBLE) > (
        SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
        FROM customer c2 WHERE c2.c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
GROUP BY c.c_nationkey
""",
    doc="TPC-H Q22 shape: scalar subquery (global avg positive balance, "
    "computed once and broadcast as a 1-row cross join) + anti-join "
    "against urgent orders, grouped by nation",
)
def tpch_q22_idle_rich(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(_dec("c_acctbal")).cast("double") / F.count("*")).alias("avg_bal")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(_dec("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum(_dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )


@register(
    "events_json_props",
    """
SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS INTEGER) AS max_k
FROM events
WHERE event_type = 'click'
GROUP BY CAST(json_extract(props, '$.k') AS INTEGER) % 10
""",
    doc="semi-structured extraction: JSON path into the events.props "
    "string column (Spark get_json_object — JVM Jackson path, no UDF), "
    "aggregated per bucket",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("event_type") == "click")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.select((k % 10).alias("k_bucket"), k.alias("k"))
        .groupBy("k_bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("k").cast("int").alias("min_k"),
            F.max("k").cast("int").alias("max_k"),
        )
    )


@register(
    "events_sessionize_gap",
    """
WITH marked AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WHERE user_id < 40
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, event_id, us,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_seq
  FROM marked
)
SELECT user_id,
       CAST(session_seq AS BIGINT) AS session_seq,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(MAX(us) - MIN(us) AS BIGINT) AS duration_us
FROM sess
GROUP BY user_id, session_seq
""",
    doc="gap-based sessionization (30-min inactivity): lag + cumulative "
    "new-session flag — the batch analogue of session_window, exact in "
    "integer microseconds (unix_micros == DuckDB epoch_us); one shuffle "
    "on user_id serves both windows and the final aggregate",
)
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 40)
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("us").over(w)
    marked = e.select("user_id", "event_id", F.unix_micros("ts").alias("us")).withColumn(
        "is_new",
        F.when(prev.isNull() | ((F.col("us") - prev) > 1_800_000_000), 1).otherwise(0),
    )
    sess = marked.withColumn("session_seq", F.sum("is_new").over(run))
    return sess.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


@register(
    "pivot_segment_year",
    """
SELECT c.c_mktsegment,
       CAST(SUM(CASE WHEN year(o.o_orderdate) = 1995 THEN 1 ELSE 0 END) AS BIGINT) AS y1995,
       CAST(SUM(CASE WHEN year(o.o_orderdate) = 1996 THEN 1 ELSE 0 END) AS BIGINT) AS y1996,
       CAST(SUM(CASE WHEN year(o.o_orderdate) = 1997 THEN 1 ELSE 0 END) AS BIGINT) AS y1997,
       CAST(SUM(CASE WHEN year(o.o_orderdate) = 1998 THEN 1 ELSE 0 END) AS BIGINT) AS y1998
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
WHERE o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
GROUP BY c.c_mktsegment
""",
    doc="pivot: order counts per market segment x year — Spark's pivot() "
    "relational operator (plans as a single hash aggregate over "
    "pivot-case projections, no extra shuffle vs a plain groupBy)",
)
def pivot_segment_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1999-01-01 00:00:00")
    c = _t(spark, sf_dir, "customer")
    piv = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select("c_mktsegment", F.year("o_orderdate").alias("yr"))
        .groupBy("c_mktsegment")
        .pivot("yr", [1995, 1996, 1997, 1998])
        .count()
    )
    # pivot leaves null for absent cells; the CASE-SUM oracle yields 0
    return piv.select(
        "c_mktsegment",
        *[F.coalesce(F.col(str(y)), F.lit(0)).cast("long").alias(f"y{y}") for y in (1995, 1996, 1997, 1998)],
    )


@register(
    "events_trailing_window",
    """
SELECT user_id, event_id,
       CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS BIGINT) AS n_last_10min,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
            RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS v_last_10min
FROM events
WHERE user_id < 20
""",
    doc="time-based RANGE window frame: trailing 10-minute per-user count "
    "and decimal-exact sum, ordered by integer microseconds so the frame "
    "bound is engine-portable (Spark rangeBetween == DuckDB RANGE "
    "PRECEDING on the same BIGINT key)",
)
def events_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-600_000_000, Window.currentRow)
    )
    val = F.col("value").cast("decimal(12,2)")
    return e.select(
        "user_id",
        "event_id",
        F.count("*").over(w).alias("n_last_10min"),
        F.sum(val).over(w).cast("double").alias("v_last_10min"),
    )


@register(
    "window_rank_family",
    """
SELECT o_orderkey, o_orderstatus,
       CAST(ntile(4) OVER w AS INTEGER) AS price_quartile,
       percent_rank() OVER w AS pct_rank,
       cume_dist() OVER w AS cume,
       CAST(first_value(o_orderkey) OVER w AS BIGINT) AS cheapest_key,
       CAST(nth_value(o_orderkey, 2) OVER (PARTITION BY o_orderstatus ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS BIGINT) AS second_key
FROM orders
WHERE o_orderkey <= 2000
WINDOW w AS (PARTITION BY o_orderstatus ORDER BY CAST(o_totalprice AS DECIMAL(18,2)), o_orderkey)
""",
    doc="ranking-window family: ntile, percent_rank, cume_dist, "
    "first_value, nth_value (full-frame) — one sort per partition key "
    "serves all five functions",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    price = F.col("o_totalprice").cast("decimal(18,2)")
    w = Window.partitionBy("o_orderstatus").orderBy(price, "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.ntile(4).over(w).cast("int").alias("price_quartile"),
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.first("o_orderkey").over(w).cast("long").alias("cheapest_key"),
            F.nth_value("o_orderkey", 2).over(w_full).cast("long").alias("second_key"),
        )
    )


@register(
    "listagg_nation_brands",
    """
SELECT n.n_name,
       string_agg(DISTINCT p.p_brand, ',' ORDER BY p.p_brand) AS brands,
       CAST(COUNT(DISTINCT p.p_brand) AS BIGINT) AS n_brands
FROM supplier s
JOIN nation n   ON n.n_nationkey = s.s_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
JOIN part p     ON p.p_partkey = l.l_partkey
WHERE p.p_size >= 48
GROUP BY n.n_name
""",
    doc="ordered string aggregation (LISTAGG): distinct brands supplied "
    "per nation, sorted then joined — Spark side sorts the collected set "
    "explicitly (collect_set order is partition-dependent; sort_array "
    "makes it deterministic)",
)
def listagg_nation_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").filter(F.col("p_size") >= 48)
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_set("p_brand")), ",").alias("brands"),
            F.count_distinct("p_brand").alias("n_brands"),
        )
    )


@register(
    "regexp_extract_parts",
    """
SELECT p_partkey,
       CAST(regexp_extract(p_brand, '#(\\d+)', 1) AS INTEGER) AS brand_num,
       regexp_matches(p_name, '^[a-m]') AS starts_early,
       CAST(length(regexp_replace(p_name, '[aeiou]', '', 'g')) AS INTEGER) AS n_consonants
FROM part
WHERE p_partkey <= 150
""",
    doc="regex functions: capture-group extraction, boolean match, "
    "global replace — all JVM-side (no Python UDF)",
)
def regexp_extract_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_partkey") <= 150)
        .select(
            "p_partkey",
            F.regexp_extract("p_brand", r"#(\d+)", 1).cast("int").alias("brand_num"),
            F.col("p_name").rlike("^[a-m]").alias("starts_early"),
            F.length(F.regexp_replace("p_name", "[aeiou]", "")).cast("int").alias("n_consonants"),
        )
    )


@register(
    "setops_multiset",
    """
SELECT 'inter_all' AS tag, c_nationkey AS nationkey FROM
  (SELECT c_nationkey FROM customer WHERE c_custkey <= 200
   INTERSECT ALL
   SELECT c_nationkey FROM customer WHERE c_custkey BETWEEN 101 AND 300) t
UNION ALL
SELECT 'except_all' AS tag, c_nationkey AS nationkey FROM
  (SELECT c_nationkey FROM customer WHERE c_custkey <= 200
   EXCEPT ALL
   SELECT c_nationkey FROM customer WHERE c_custkey BETWEEN 101 AND 300) t
""",
    doc="multiset set operations: INTERSECT ALL / EXCEPT ALL preserve "
    "duplicate multiplicity (Spark intersectAll/exceptAll), unlike the "
    "distinct forms in setops_nations",
)
def setops_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") <= 200).select(F.col("c_nationkey").alias("nationkey"))
    b = c.filter(F.col("c_custkey").between(101, 300)).select(
        F.col("c_nationkey").alias("nationkey")
    )
    inter = a.intersectAll(b).select(F.lit("inter_all").alias("tag"), "nationkey")
    exc = a.exceptAll(b).select(F.lit("except_all").alias("tag"), "nationkey")
    return inter.unionByName(exc)


@register(
    "approx_percentile_qty",
    """
SELECT l_returnflag,
       quantile_cont(CAST(l_quantity AS DOUBLE), 0.5) AS exact_p50,
       quantile_cont(CAST(l_quantity AS DOUBLE), 0.9) AS exact_p90,
       TRUE AS approx_ok
FROM lineitem GROUP BY l_returnflag
""",
    doc="approx_percentile (GK sketch) per return flag — the "
    "mergeable-sketch path for 100 TB percentiles. Spark's and DuckDB's "
    "approx sketches differ, so the oracle checks the sketch CONTRACT: "
    "exact interpolated percentiles (identical on both engines for this "
    "data) plus a flag that each approximation landed within one "
    "quantity unit (accuracy=10000 bounds rank error to n/10000).",
)
def approx_percentile_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_percentile(qty, F.array(F.lit(0.5), F.lit(0.9)), 10000).alias("ap"),
            F.percentile(qty, 0.5).alias("exact_p50"),
            F.percentile(qty, 0.9).alias("exact_p90"),
        )
        .select(
            "l_returnflag",
            "exact_p50",
            "exact_p90",
            (
                (F.abs(F.col("ap")[0] - F.col("exact_p50")) <= 1.0)
                & (F.abs(F.col("ap")[1] - F.col("exact_p90")) <= 1.0)
            ).alias("approx_ok"),
        )
    )


@register(
    "stats_corr_qty_price",
    """
SELECT l_returnflag, n_rows,
       (n_rows * sxy - sx * sy) / sqrt((n_rows * sxx - sx * sx) * (n_rows * syy - sy * sy))
         AS corr_qty_price,
       (sxy - sx * sy / n_rows) / (n_rows - 1) AS covar_samp_qty_price,
       (n_rows * sxy - sx * sy) / (n_rows * sxx - sx * sx) AS regr_slope_qty_price
FROM (
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n_rows,
         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2)) AS DECIMAL(28,4))) AS DOUBLE) AS syy
  FROM lineitem GROUP BY l_returnflag
) t
""",
    doc="statistical aggregates (Pearson correlation, sample covariance, "
    "regression slope) per return flag. Built-in corr()/covar_samp() are "
    "engine-implementation-dependent in their summation order, so the "
    "moments are accumulated as exact DECIMAL sums (bit-identical across "
    "engines) and the closed-form ratios evaluated with the same double "
    "expression tree on both sides — one partial-aggregable shuffle, "
    "scale-safe because the six moments are mergeable",
)
def stats_corr_qty_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    moments = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n_rows"),
        F.sum(qty).cast("double").alias("sx"),
        F.sum(price).cast("double").alias("sy"),
        F.sum((qty * price).cast("decimal(28,4)")).cast("double").alias("sxy"),
        F.sum((qty * qty).cast("decimal(28,4)")).cast("double").alias("sxx"),
        F.sum((price * price).cast("decimal(28,4)")).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n_rows"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    return moments.select(
        "l_returnflag",
        "n_rows",
        ((n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))).alias(
            "corr_qty_price"
        ),
        ((sxy - sx * sy / n) / (n - F.lit(1))).alias("covar_samp_qty_price"),
        ((n * sxy - sx * sy) / (n * sxx - sx * sx)).alias("regr_slope_qty_price"),
    )


@register(
    "join_full_outer_nation_counts",
    """
SELECT COALESCE(c.n_nationkey, s.n_nationkey) AS n_nationkey,
       c.n_customers, s.n_suppliers
FROM (SELECT c_nationkey AS n_nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM customer GROUP BY 1) c
FULL OUTER JOIN
     (SELECT s_nationkey AS n_nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers
      FROM supplier WHERE s_acctbal > 5000 GROUP BY 1) s
ON c.n_nationkey = s.n_nationkey
""",
    doc="full outer join: per-nation customer counts vs (filtered) "
    "supplier counts, preserving nations present on only one side — "
    "the join type the left/semi/anti coverage was missing",
)
def join_full_outer_nation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("cn"))
        .agg(F.count("*").alias("n_customers"))
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .groupBy(F.col("s_nationkey").alias("sn"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    return c.join(s, c.cn == s.sn, "full_outer").select(
        F.coalesce("cn", "sn").alias("n_nationkey"), "n_customers", "n_suppliers"
    )


@register(
    "unpivot_part_measures",
    """
SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
FROM part WHERE p_partkey <= 200
UNION ALL
SELECT p_partkey, 'p_retailprice' AS measure,
       CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE) AS value
FROM part WHERE p_partkey <= 200
""",
    doc="unpivot (wide -> long): part measures melted to (key, measure, "
    "value) rows via stack() — the inverse of the pivot query; the "
    "oracle uses the portable UNION ALL formulation",
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_partkey") <= 200)
    return p.select(
        "p_partkey",
        F.expr(
            "stack(2, 'p_size', CAST(p_size AS DOUBLE), "
            "'p_retailprice', CAST(CAST(p_retailprice AS DECIMAL(18,2)) AS DOUBLE)) "
            "AS (measure, value)"
        ),
    )


# ---------------------------------------------------------------------------
# rolling distinct users (DAU / WAU / stickiness) — COUNT(DISTINCT) over a
# RANGE frame, the window shape Spark has no native operator for
# ---------------------------------------------------------------------------


@register(
    "events_dau_wau",
    """
WITH pairs AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
days AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM pairs GROUP BY day),
win AS (
    SELECT d.day, p.user_id
    FROM (SELECT day FROM days) d
    JOIN pairs p ON p.day BETWEEN d.day - 6 AND d.day
),
wau AS (
    SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS wau_7d
    FROM win GROUP BY day
)
SELECT d.day, d.dau, w.wau_7d, CAST(d.dau AS DOUBLE) / w.wau_7d AS stickiness
FROM days d JOIN wau w ON w.day = d.day
""",
    doc="rolling distinct users: per active day, the distinct users that "
    "day (DAU), over the trailing 7 days (WAU), and the DAU/WAU "
    "stickiness ratio. COUNT(DISTINCT) over a RANGE frame has no "
    "native Spark window operator — the scalable decomposition is: "
    "distinct (day, user) pairs (one dedup at day grain, the only "
    "pass over raw events), then each pair EXPLODES to the <=7 "
    "window-end days it serves (bounded fan-out = window length, "
    "never a range join of events against events), semi-joins the "
    "tiny active-day spine by broadcast, dedups at (window_day, user) "
    "grain, and counts. Work is O(active_pairs x 7) regardless of how "
    "many raw events share a (user, day) — the raw table fans into "
    "the window exactly once",
)
def events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = (
        _t(spark, sf_dir, "events")
        .select(F.to_date("ts").alias("day"), "user_id")
        .distinct()
    )
    days = pairs.groupBy("day").agg(F.count("*").cast("long").alias("dau"))
    spine = days.select("day").withColumnRenamed("day", "wday")
    wau = (
        pairs.select(
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("wday"),
            "user_id",
        )
        .join(F.broadcast(spine), "wday")
        .distinct()
        .groupBy("wday")
        .agg(F.count("*").cast("long").alias("wau_7d"))
    )
    return (
        days.join(wau, days.day == wau.wday)
        .select(
            "day",
            "dau",
            "wau_7d",
            (F.col("dau").cast("double") / F.col("wau_7d")).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# SCD Type-2 interval build: the event log -> versioned dimension with
# validity intervals, the change-data-capture shape every warehouse ships
# ---------------------------------------------------------------------------


@register(
    "events_scd2_intervals",
    """
WITH ordered AS (
    SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS prev_type
    FROM events
),
changes AS (
    SELECT user_id, event_type, us, event_id
    FROM ordered
    WHERE prev_type IS NULL OR event_type != prev_type
),
versioned AS (
    SELECT user_id, event_type, us AS valid_from_us,
           LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS version
    FROM changes
)
SELECT user_id, event_type,
       CAST(valid_from_us AS BIGINT) AS valid_from_us,
       CAST(valid_to_us AS BIGINT) AS valid_to_us,
       CAST(version AS INTEGER) AS version,
       valid_to_us IS NULL AS is_current
FROM versioned
WHERE user_id < 50
""",
    doc="SCD Type-2 dimension build from the raw event log: per user, "
    "compress consecutive repeats of event_type into change rows (LAG "
    "inequality — true change detection, not dedup), then stitch each "
    "change's validity interval with LEAD and a per-user version "
    "counter; the open interval (valid_to NULL) is the current row. "
    "This is the standard warehouse pattern for turning an append-only "
    "log into a point-in-time-joinable dimension — the batch analogue "
    "of a CDC merge. Both windows share ONE per-user partitioning, so "
    "the log shuffles once; integer-microsecond ordering keeps the "
    "interval bounds engine-portable. Filtered to user_id < 50 to keep "
    "the graded row set bounded",
)
def events_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    changes = (
        e.select(
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("us"),
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
    )
    wv = Window.partitionBy("user_id").orderBy("us", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("us").cast("long").alias("valid_from_us"),
        F.lead("us").over(wv).cast("long").alias("valid_to_us"),
        F.row_number().over(wv).cast("int").alias("version"),
        F.lead("us").over(wv).isNull().alias("is_current"),
    )


# ---------------------------------------------------------------------------
# RFM segmentation: recency/frequency/monetary quintiles per customer —
# quantile bucketing WITHOUT the single-partition ntile sort
# ---------------------------------------------------------------------------

_RFM_QS = (0.2, 0.4, 0.6, 0.8)


def _rfm_oracle() -> str:
    thr = ", ".join(
        f"percentile_disc({q}) WITHIN GROUP (ORDER BY {d}) AS {d}{i}"
        for d in ("r", "f", "m")
        for i, q in enumerate(_RFM_QS, start=1)
    )

    def score(d: str) -> str:
        return " + ".join([f"CASE WHEN c.{d} > t.{d}{i} THEN 1 ELSE 0 END" for i in range(1, 5)])

    return f"""
WITH cust AS (
    SELECT o_custkey,
           CAST(MAX(CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)) AS BIGINT) AS r,
           CAST(COUNT(*) AS BIGINT) AS f,
           SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
    FROM orders GROUP BY o_custkey
),
t AS (SELECT {thr} FROM cust)
SELECT c.o_custkey AS custkey, c.r AS recency_day, c.f AS frequency,
       CAST(c.m AS DOUBLE) AS monetary,
       CAST(1 + {score('r')} AS INTEGER) AS r_score,
       CAST(1 + {score('f')} AS INTEGER) AS f_score,
       CAST(1 + {score('m')} AS INTEGER) AS m_score,
       CAST((1 + {score('r')}) * 100 + (1 + {score('f')}) * 10
            + (1 + {score('m')}) AS INTEGER) AS rfm
FROM cust c CROSS JOIN t
"""


@register(
    "orders_rfm_segments",
    _rfm_oracle(),
    doc="RFM segmentation: per customer, recency (latest order day), "
    "frequency (order count), monetary (decimal-exact spend), each "
    "bucketed into quintiles via percentile_disc thresholds and "
    "composed into the classic 3-digit RFM segment. The plan is the "
    "SCALE-CORRECT quantile bucketing: ntile()/percent_rank() over an "
    "unpartitioned window would sort every customer in ONE task, "
    "while here the 12 thresholds reduce through a partial-aggregable "
    "percentile and broadcast back as one row — the fact scan "
    "shuffles once (per-customer agg) and the bucketing is a "
    "row-local comparison. percentile_disc picks actual data values "
    "(SQL-standard smallest-cume_dist>=q), so thresholds are "
    "bit-identical across engines with no interpolation drift; "
    "strict-greater bucketing makes ties deterministic",
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max(F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")))
            .cast("long")
            .alias("r"),
            F.count("*").cast("long").alias("f"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("m"),
        )
    )
    thr = cust.agg(
        *[
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY {d})").alias(f"{d}{i}")
            for d in ("r", "f", "m")
            for i, q in enumerate(_RFM_QS, start=1)
        ]
    )

    def score(d: str):
        s = F.lit(1)
        for i in range(1, 5):
            s = s + F.when(F.col(d) > F.col(f"{d}{i}"), 1).otherwise(0)
        return s

    return cust.crossJoin(F.broadcast(thr)).select(
        "custkey",
        F.col("r").alias("recency_day"),
        F.col("f").alias("frequency"),
        F.col("m").cast("double").alias("monetary"),
        score("r").cast("int").alias("r_score"),
        score("f").cast("int").alias("f_score"),
        score("m").cast("int").alias("m_score"),
        (score("r") * 100 + score("f") * 10 + score("m")).cast("int").alias("rfm"),
    )


# ---------------------------------------------------------------------------
# market-basket association rules: support / confidence / lift over
# parts co-purchased in one order — bounded pair fan-out, never all-pairs
# ---------------------------------------------------------------------------

_BASKET_K = 20


@register(
    "lineitem_market_basket",
    f"""
WITH basket AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_baskets FROM basket),
item AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item FROM basket GROUP BY l_partkey),
pair AS (
    SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
           CAST(COUNT(*) AS BIGINT) AS n_ab
    FROM basket a JOIN basket b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY a.l_partkey, b.l_partkey
),
top AS (
    SELECT part_a, part_b, n_ab FROM (
        SELECT *, ROW_NUMBER() OVER (ORDER BY n_ab DESC, part_a, part_b) AS rnk
        FROM pair)
    WHERE rnk <= {_BASKET_K}
)
SELECT t.part_a, t.part_b, t.n_ab, ia.n_item AS n_a, ib.n_item AS n_b,
       CAST(t.n_ab AS DOUBLE) / n.n_baskets AS support,
       CAST(t.n_ab AS DOUBLE) / ia.n_item AS confidence,
       CAST(t.n_ab * n.n_baskets AS DOUBLE) / (ia.n_item * ib.n_item) AS lift
FROM top t
JOIN item ia ON ia.l_partkey = t.part_a
JOIN item ib ON ib.l_partkey = t.part_b
CROSS JOIN n
""",
    doc="market-basket association rules: the top-20 part pairs "
    "co-purchased within an order, with exact support (share of "
    "baskets), confidence (P(b|a)), and lift (observed co-rate over "
    "the independence rate) — the classic affinity table behind "
    "recommendations and assortment planning. The pair join is keyed "
    "on l_orderkey with a canonical part ordering, so fan-out is "
    "bounded by lines-per-order choose 2 (a per-basket constant), "
    "never all-pairs over the catalog; pair counts partial-aggregate, "
    "the top-k is a distributed TakeOrdered, and the unigram counts "
    "join only the 20 surviving rows. Relational sibling of "
    "docs_collocation_lift (adjacency-windowed text bigrams); here "
    "co-occurrence is set-valued per basket with support/confidence "
    "added. All-integer counts, fixed-order double ratios",
)
def lineitem_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 (guide §1.2): the deduped basket table feeds FOUR consumers
    # (basket count, item counts, both pair-join sides) — without a
    # materialization each re-ran the lineitem scan + distinct shuffle.
    # One eager checkpoint makes it one pass; the checkpointed rows are
    # the (order, part) pairs, already far under the fact table.
    basket = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_baskets = basket.select("l_orderkey").distinct().agg(
        F.count("*").cast("long").alias("n_baskets")
    )
    item = basket.groupBy("l_partkey").agg(F.count("*").cast("long").alias("n_item"))
    # r13 (guide §2.4 — the jaccard posting-list shape): pairs come from
    # a row-local nested-index expansion over each order's sorted item
    # array instead of a self-join on l_orderkey — one exchange (the
    # per-order groupBy) replaces the join's two, and the expansion is
    # bounded by basket size (a handful of items per order), never a
    # shuffle. Sorted-ascending arrays make every emitted pair a < b,
    # and basket rows are already distinct, so (pair, count) multisets
    # are identical to the join form.
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size("ps") - 2),
            lambda i: F.transform(
                F.sequence(i + 1, F.size("ps") - 1),
                lambda j: F.struct(
                    F.get("ps", i).alias("a"), F.get("ps", j).alias("b")
                ),
            ),
        )
    )
    pair = (
        basket.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("ps"))
        .filter(F.size("ps") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.a").alias("part_a"), F.col("p.b").alias("part_b"))
        .agg(F.count("*").cast("long").alias("n_ab"))
    )
    top = pair.orderBy(F.desc("n_ab"), "part_a", "part_b").limit(_BASKET_K)
    ia = item.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    return (
        top.join(ia, "part_a")
        .join(ib, "part_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "part_a",
            "part_b",
            "n_ab",
            "n_a",
            "n_b",
            (F.col("n_ab").cast("double") / F.col("n_baskets")).alias("support"),
            (F.col("n_ab").cast("double") / F.col("n_a")).alias("confidence"),
            (
                (F.col("n_ab") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b"))
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# skyline (Pareto frontier): cheapest-for-the-size parts per brand —
# the dominance query, via windows instead of the quadratic self-join
# ---------------------------------------------------------------------------


@register(
    "part_skyline_by_brand",
    """
WITH p AS (
    SELECT p_brand, p_partkey, p_size,
           CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS pc
    FROM part
),
w AS (
    SELECT *,
           MAX(p_size) OVER (PARTITION BY p_brand ORDER BY pc
               RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS max_lt,
           MAX(p_size) OVER (PARTITION BY p_brand, pc) AS max_eq
    FROM p
)
SELECT p_brand, p_partkey,
       CAST(pc AS DOUBLE) / 100 AS retail_price,
       CAST(p_size AS INTEGER) AS size
FROM w
WHERE (max_lt IS NULL OR max_lt < p_size) AND max_eq = p_size
""",
    doc="skyline / Pareto-frontier query: per brand, the parts no other "
    "part dominates (cheaper-or-equal AND bigger-or-equal with one "
    "strict) on (retail price down, size up) — the multi-criteria "
    "shortlist operator behind 'best value for the size' product "
    "views. The textbook formulation is a quadratic dominance "
    "self-join; this plan is the sort-based skyline: one brand-"
    "partitioned window pass where a part survives iff no strictly-"
    "cheaper part reaches its size (running RANGE max over integer "
    "cents, the 1-PRECEDING bound excluding price ties) and no "
    "equal-priced part exceeds it (per-(brand, price) max). Two "
    "window specs, one shuffle, zero joins. Price compared in "
    "integer cents so the frame bound is exact on both engines; "
    "equal (price, size) twins are both kept (neither dominates)",
)
def part_skyline_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_size",
        F.floor(F.col("p_retailprice") * 100 + 0.5).cast("long").alias("pc"),
    )
    w_lt = (
        Window.partitionBy("p_brand")
        .orderBy("pc")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    w_eq = Window.partitionBy("p_brand", "pc")
    flagged = p.select(
        "*",
        F.max("p_size").over(w_lt).alias("max_lt"),
        F.max("p_size").over(w_eq).alias("max_eq"),
    )
    return flagged.filter(
        (F.col("max_lt").isNull() | (F.col("max_lt") < F.col("p_size")))
        & (F.col("max_eq") == F.col("p_size"))
    ).select(
        "p_brand",
        "p_partkey",
        (F.col("pc").cast("double") / 100).alias("retail_price"),
        F.col("p_size").cast("int").alias("size"),
    )


# ---------------------------------------------------------------------------
# conversion-latency distribution: how long from first view to first
# purchase — the funnel's time axis, reduced to exact percentiles
# ---------------------------------------------------------------------------


@register(
    "events_conversion_latency",
    """
WITH firsts AS (
    SELECT user_id,
           MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS first_view,
           MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS first_buy
    FROM events GROUP BY user_id
),
lat AS (
    SELECT user_id, first_buy - first_view AS latency_us
    FROM firsts
    WHERE first_view IS NOT NULL AND first_buy IS NOT NULL
      AND first_buy >= first_view
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_converting,
       CAST(MIN(latency_us) AS BIGINT) AS min_us,
       CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY latency_us) AS BIGINT) AS p25_us,
       CAST(percentile_disc(0.50) WITHIN GROUP (ORDER BY latency_us) AS BIGINT) AS p50_us,
       CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY latency_us) AS BIGINT) AS p75_us,
       CAST(percentile_disc(0.90) WITHIN GROUP (ORDER BY latency_us) AS BIGINT) AS p90_us,
       CAST(MAX(latency_us) AS BIGINT) AS max_us
FROM lat
""",
    doc="conversion-latency distribution: per user, the gap between "
    "FIRST view and FIRST purchase (conditional MIN aggregation — the "
    "events_funnel_conversion recipe), reduced to exact "
    "percentile_disc quartiles/p90 in integer microseconds — the time "
    "axis of the funnel, read beside its conversion rate when sizing "
    "attribution lookbacks and retargeting windows. One user-keyed "
    "partial agg then a 1-row percentile reduce; percentile_disc "
    "returns actual data values, so the row is bit-identical across "
    "engines with no interpolation",
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    us = F.unix_micros("ts")
    firsts = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", us)).alias("first_view"),
            F.min(F.when(F.col("event_type") == "purchase", us)).alias("first_buy"),
        )
    )
    lat = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_buy").isNotNull()
        & (F.col("first_buy") >= F.col("first_view"))
    ).select((F.col("first_buy") - F.col("first_view")).alias("latency_us"))
    return lat.agg(
        F.count("*").cast("long").alias("n_converting"),
        F.min("latency_us").cast("long").alias("min_us"),
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY latency_us)")
        .cast("long")
        .alias("p25_us"),
        F.expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY latency_us)")
        .cast("long")
        .alias("p50_us"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY latency_us)")
        .cast("long")
        .alias("p75_us"),
        F.expr("percentile_disc(0.90) WITHIN GROUP (ORDER BY latency_us)")
        .cast("long")
        .alias("p90_us"),
        F.max("latency_us").cast("long").alias("max_us"),
    )


# ---------------------------------------------------------------------------
# ABC / Pareto concentration: how much revenue the top decile of
# customers carries — without ever globally sorting customers
# ---------------------------------------------------------------------------


@register(
    "orders_abc_analysis",
    """
WITH cust AS (
    SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
    FROM orders GROUP BY o_custkey
),
t AS (
    SELECT percentile_disc(0.1) WITHIN GROUP (ORDER BY rev) AS t1,
           percentile_disc(0.2) WITHIN GROUP (ORDER BY rev) AS t2,
           percentile_disc(0.3) WITHIN GROUP (ORDER BY rev) AS t3,
           percentile_disc(0.4) WITHIN GROUP (ORDER BY rev) AS t4,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY rev) AS t5,
           percentile_disc(0.6) WITHIN GROUP (ORDER BY rev) AS t6,
           percentile_disc(0.7) WITHIN GROUP (ORDER BY rev) AS t7,
           percentile_disc(0.8) WITHIN GROUP (ORDER BY rev) AS t8,
           percentile_disc(0.9) WITHIN GROUP (ORDER BY rev) AS t9
    FROM cust
),
bucketed AS (
    SELECT c.o_custkey, c.rev,
           10 - (CASE WHEN c.rev > t.t1 THEN 1 ELSE 0 END
               + CASE WHEN c.rev > t.t2 THEN 1 ELSE 0 END
               + CASE WHEN c.rev > t.t3 THEN 1 ELSE 0 END
               + CASE WHEN c.rev > t.t4 THEN 1 ELSE 0 END
               + CASE WHEN c.rev > t.t5 THEN 1 ELSE 0 END
               + CASE WHEN c.rev > t.t6 THEN 1 ELSE 0 END
               + CASE WHEN c.rev > t.t7 THEN 1 ELSE 0 END
               + CASE WHEN c.rev > t.t8 THEN 1 ELSE 0 END
               + CASE WHEN c.rev > t.t9 THEN 1 ELSE 0 END) AS decile
    FROM cust c CROSS JOIN t
),
per AS (
    SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers, SUM(rev) AS revd
    FROM bucketed GROUP BY decile
),
tot AS (SELECT SUM(rev) AS total FROM cust)
SELECT CAST(p.decile AS INTEGER) AS decile, p.n_customers,
       CAST(p.revd AS DOUBLE) AS revenue,
       CAST(p.revd AS DOUBLE) / CAST(tot.total AS DOUBLE) AS revenue_share,
       CAST(SUM(p.revd) OVER (ORDER BY p.decile
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           / CAST(tot.total AS DOUBLE) AS cum_share
FROM per p CROSS JOIN tot
""",
    doc="ABC / Pareto concentration table: customers bucketed into "
    "revenue deciles (decile 1 = top) and each decile's share plus the "
    "running cumulative share — the 80/20 curve behind account "
    "tiering and risk concentration limits. The plan never globally "
    "sorts customers: deciles come from 9 percentile_disc thresholds "
    "reduced via partial-aggregable percentile and broadcast back as "
    "one row (the orders_rfm_segments recipe at decile grain), and "
    "the only window runs over the TEN decile rows. Decimal-exact "
    "revenue sums; thresholds are actual data values, strict-greater "
    "bucketing keeps ties deterministic on both engines",
)
def orders_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"))
    )
    thr = cust.agg(
        *[
            F.expr(f"percentile_disc(0.{i}) WITHIN GROUP (ORDER BY rev)").alias(f"t{i}")
            for i in range(1, 10)
        ]
    )
    decile = F.lit(10) - sum(
        F.when(F.col("rev") > F.col(f"t{i}"), 1).otherwise(0) for i in range(1, 10)
    )
    bucketed = cust.crossJoin(F.broadcast(thr)).select(
        "o_custkey", "rev", decile.alias("decile")
    )
    per = bucketed.groupBy("decile").agg(
        F.count("*").cast("long").alias("n_customers"),
        F.sum("rev").alias("revd"),
    )
    tot = cust.agg(F.sum("rev").alias("total"))
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers",
            F.col("revd").cast("double").alias("revenue"),
            (F.col("revd").cast("double") / F.col("total").cast("double")).alias(
                "revenue_share"
            ),
            (
                F.sum("revd").over(w).cast("double") / F.col("total").cast("double")
            ).alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# burst detection: hours running hot against their own trailing baseline
# ---------------------------------------------------------------------------


@register(
    "events_burst_hours",
    """
WITH hourly AS (
    SELECT epoch_us(ts) // 3600000000 AS hr, CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1
),
w AS (
    SELECT hr, n,
           SUM(n) OVER (ORDER BY hr RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
               AS trail_sum,
           COUNT(*) OVER (ORDER BY hr RANGE BETWEEN 24 PRECEDING AND 1 PRECEDING)
               AS trail_hours
    FROM hourly
)
SELECT CAST(hr AS BIGINT) AS hr, n,
       CAST(trail_sum AS BIGINT) AS trail_sum,
       CAST(trail_hours AS BIGINT) AS trail_hours,
       CAST(n * trail_hours AS DOUBLE) / trail_sum AS burst_ratio,
       n * trail_hours >= 2 * trail_sum AS is_burst
FROM w
WHERE trail_hours >= 12
""",
    doc="burst detection: each hour's event count against ITS OWN "
    "trailing 24-hour mean (RANGE frame over integer hour index, "
    "current hour excluded via the 1-PRECEDING bound), flagged when "
    "the rate doubles — the ops-page primitive for ingest spikes, "
    "scraper storms, and upstream replays, complementary to the "
    "calendar-bucket screen (events_seasonal_anomaly compares hours "
    "to their weekly slot; this compares them to their immediate "
    "history). Warm-up guarded (>= 12 trailing hours). The window "
    "runs over the HOURLY ROLLUP (bounded by wall-clock hours, not "
    "corpus size — metadata scale at 100 TB); the burst test is "
    "integer-exact (n * hours >= 2 * sum), the ratio one double "
    "divide",
)
def events_burst_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    hourly = (
        _t(spark, sf_dir, "events")
        .groupBy(F.expr("unix_micros(ts) DIV 3600000000").alias("hr"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.orderBy("hr").rangeBetween(-24, -1)
    flagged = hourly.select(
        "hr",
        "n",
        F.sum("n").over(w).alias("trail_sum"),
        F.count("*").over(w).alias("trail_hours"),
    ).filter(F.col("trail_hours") >= 12)
    return flagged.select(
        F.col("hr").cast("long").alias("hr"),
        "n",
        F.col("trail_sum").cast("long").alias("trail_sum"),
        F.col("trail_hours").cast("long").alias("trail_hours"),
        ((F.col("n") * F.col("trail_hours")).cast("double") / F.col("trail_sum")).alias(
            "burst_ratio"
        ),
        (F.col("n") * F.col("trail_hours") >= 2 * F.col("trail_sum")).alias("is_burst"),
    )


# ---------------------------------------------------------------------------
# gaps-and-islands: longest consecutive-day activity streak per user
# ---------------------------------------------------------------------------


@register(
    "events_activity_streaks",
    """
WITH days AS (
    SELECT DISTINCT user_id,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
    FROM events
),
islands AS (
    SELECT user_id, day,
           day - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS island
    FROM days
),
streaks AS (
    SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len,
           CAST(MIN(day) AS BIGINT) AS start_day
    FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(SUM(len) AS BIGINT) AS n_active_days,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(MIN(CASE WHEN len = ml THEN start_day END) AS BIGINT)
           AS longest_streak_start
FROM (SELECT *, MAX(len) OVER (PARTITION BY user_id) AS ml FROM streaks)
GROUP BY user_id
""",
    doc="gaps-and-islands: per user, the longest run of CONSECUTIVE "
    "active days (plus streak count, total active days, and the "
    "earliest start of a maximal streak as the deterministic "
    "tie-break) — the engagement-streak primitive behind habit "
    "metrics and churn features. The canonical island key is day - "
    "row_number(): constant within a consecutive run, distinct "
    "across gaps — one dedup at (user, day) grain, one per-user "
    "window, two partial aggs, all sharing the user partitioning; "
    "integer day arithmetic keeps island ids engine-exact",
)
def events_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    islands = days.select(
        "user_id", "day", (F.col("day") - F.row_number().over(w)).alias("island")
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count("*").cast("long").alias("len"),
        F.min("day").cast("long").alias("start_day"),
    )
    wm = Window.partitionBy("user_id")
    return (
        streaks.withColumn("ml", F.max("len").over(wm))
        .groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_streaks"),
            F.sum("len").cast("long").alias("n_active_days"),
            F.max("len").cast("long").alias("longest_streak"),
            F.min(F.when(F.col("len") == F.col("ml"), F.col("start_day")))
            .cast("long")
            .alias("longest_streak_start"),
        )
    )


# ---------------------------------------------------------------------------
# grouped OLS: per-brand price~quantity regression from exact moments
# ---------------------------------------------------------------------------


@register(
    "lineitem_price_regression",
    """
WITH j AS (
    SELECT p.p_brand,
           CAST(CAST(l.l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS xi,
           CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS yi
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
m AS (
    SELECT p_brand,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(xi) AS BIGINT) AS sx,
           CAST(SUM(yi) AS BIGINT) AS sy,
           CAST(SUM(xi * yi) AS BIGINT) AS sxy,
           CAST(SUM(xi * xi) AS BIGINT) AS sxx
    FROM j GROUP BY p_brand
),
d AS (
    SELECT p_brand, n, sx, sy,
           CAST(CAST(n AS DECIMAL(19,0)) * CAST(sxy AS DECIMAL(19,0))
                - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS covn,
           CAST(CAST(n AS DECIMAL(19,0)) * CAST(sxx AS DECIMAL(19,0))
                - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS DECIMAL(38,0)) AS varn
    FROM m
)
SELECT p_brand, n,
       CAST(covn AS BIGINT) AS cov_num, CAST(varn AS BIGINT) AS var_num,
       CAST(covn AS DOUBLE) / CAST(varn AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE) - CAST(covn AS DOUBLE) / CAST(varn AS DOUBLE) * CAST(sx AS DOUBLE))
           / (100 * n) AS intercept
FROM d
WHERE n > 1 AND varn != 0
""",
    doc="grouped ordinary least squares: per brand, the slope, "
    "intercept, and r^2 of extendedprice ~ quantity from five exact "
    "moments — the segmented-regression primitive behind elasticity "
    "and unit-price curves, computed the only way a distributed "
    "engine should: one partial-aggregable moment pass per group, "
    "closed-form coefficients after (never per-group iterative "
    "fits). Portability discipline one step past events_user_zscore: "
    "values scale to integer CENTS so every moment is an exact "
    "BIGINT, the n*Sxy - Sx*Sy determinants compute in DECIMAL(38,0) "
    "(still exact) and are ALSO emitted as integer numerators, with "
    "doubles only in the final fixed-order ratio; the cents scaling "
    "cancels in slope and divides back out of the intercept. r^2 is "
    "deliberately omitted from the graded row: its Syy determinant "
    "exceeds 2^53, and int128-decimal -> double conversion differs "
    "between engines in the last ulp for some values (measured), so "
    "a graded r^2 would be hash-unstable; the integer numerators let "
    "a consumer derive it at whatever precision they accept. The part join is a dim "
    "join; degenerate (constant-x) groups are guarded",
)
def lineitem_price_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long").alias("xi"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long").alias("yi"),
    )
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    d19 = "decimal(19,0)"
    m = j.groupBy("p_brand").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("xi").cast("long").alias("sx"),
        F.sum("yi").cast("long").alias("sy"),
        F.sum(F.col("xi") * F.col("yi")).cast("long").alias("sxy"),
        F.sum(F.col("xi") * F.col("xi")).cast("long").alias("sxx"),
    )
    covn = (
        F.col("n").cast(d19) * F.col("sxy").cast(d19)
        - F.col("sx").cast(d19) * F.col("sy").cast(d19)
    ).cast("decimal(38,0)")
    varn = (
        F.col("n").cast(d19) * F.col("sxx").cast(d19)
        - F.col("sx").cast(d19) * F.col("sx").cast(d19)
    ).cast("decimal(38,0)")
    d = m.select("p_brand", "n", "sx", "sy", covn.alias("covn"), varn.alias("varn"))
    slope = F.col("covn").cast("double") / F.col("varn").cast("double")
    return (
        d.filter((F.col("n") > 1) & (F.col("varn") != 0))
        .select(
            "p_brand",
            "n",
            F.col("covn").cast("long").alias("cov_num"),
            F.col("varn").cast("long").alias("var_num"),
            slope.alias("slope"),
            (
                (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
                / (100 * F.col("n"))
            ).alias("intercept"),
        )
    )


# ---------------------------------------------------------------------------
# CUSUM level-shift detection over the daily rollup
# ---------------------------------------------------------------------------


@register(
    "events_cusum_shift",
    """
WITH daily AS (
    SELECT event_type,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
tot AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n) AS BIGINT) AS total
    FROM daily GROUP BY 1
),
pfx AS (
    SELECT d.event_type, d.day, t.n_days, t.total,
           SUM(d.n * t.n_days - t.total)
               OVER (PARTITION BY d.event_type ORDER BY d.day) AS pfx
    FROM daily d JOIN tot t USING (event_type)
),
cu AS (
    SELECT event_type, day, n_days, total,
           pfx - LEAST(0, MIN(pfx) OVER (PARTITION BY event_type ORDER BY day))
               AS up,
           GREATEST(0, MAX(pfx) OVER (PARTITION BY event_type ORDER BY day)) - pfx
               AS down
    FROM pfx
)
SELECT event_type, n_days, total,
       CAST(MAX(up) AS BIGINT) AS max_up_scaled,
       CAST(MIN(CASE WHEN up = mu THEN day END) AS BIGINT) AS up_day,
       CAST(MAX(down) AS BIGINT) AS max_down_scaled,
       CAST(MIN(CASE WHEN down = md THEN day END) AS BIGINT) AS down_day,
       CAST(MAX(up) AS DOUBLE) / n_days AS max_up_events
FROM (SELECT *, MAX(up) OVER (PARTITION BY event_type) AS mu,
             MAX(down) OVER (PARTITION BY event_type) AS md
      FROM cu)
GROUP BY event_type, n_days, total
""",
    doc="CUSUM level-shift detection per event type: the classic "
    "changepoint statistic S_d = max(0, S_{d-1} + (x_d - mean)) over "
    "daily counts, in BOTH directions, with the earliest argmax day "
    "as the shift-point estimate. The recurrence is not a SQL window "
    "-- but its closed form is: S_d = prefix_d - min(0, running-min "
    "prefix), and the downward twin is running-max prefix - prefix, "
    "so two running-extreme windows over the daily rollup replace "
    "the sequential scan (the same trick that turns max-subarray "
    "into prefix sums). Deviations are scaled by n_days (dev = "
    "n*n_days - total) so every intermediate stays an exact BIGINT "
    "-- no mean division inside the recurrence, one final double "
    "divide to express the peak in events/day units. Scale: the "
    "windows run over the DAILY ROLLUP (calendar-bounded metadata, "
    "not corpus rows); one shuffle to (type, day) grain, then "
    "windows and the final agg share the type partitioning",
)
def events_cusum_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_days"),
        F.sum("n").cast("long").alias("total"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    pfx = daily.join(tot, "event_type").select(
        "event_type",
        "day",
        "n_days",
        "total",
        F.sum(F.col("n") * F.col("n_days") - F.col("total")).over(w).alias("pfx"),
    )
    cu = pfx.select(
        "event_type",
        "day",
        "n_days",
        "total",
        (F.col("pfx") - F.least(F.lit(0).cast("long"), F.min("pfx").over(w))).alias("up"),
        (F.greatest(F.lit(0).cast("long"), F.max("pfx").over(w)) - F.col("pfx")).alias(
            "down"
        ),
    )
    wt = Window.partitionBy("event_type")
    return (
        cu.withColumn("mu", F.max("up").over(wt))
        .withColumn("md", F.max("down").over(wt))
        .groupBy("event_type", "n_days", "total")
        .agg(
            F.max("up").cast("long").alias("max_up_scaled"),
            F.min(F.when(F.col("up") == F.col("mu"), F.col("day")))
            .cast("long")
            .alias("up_day"),
            F.max("down").cast("long").alias("max_down_scaled"),
            F.min(F.when(F.col("down") == F.col("md"), F.col("day")))
            .cast("long")
            .alias("down_day"),
            (F.max("up").cast("double") / F.first("n_days")).alias("max_up_events"),
        )
        .select(
            "event_type",
            "n_days",
            "total",
            "max_up_scaled",
            "up_day",
            "max_down_scaled",
            "down_day",
            "max_up_events",
        )
    )


# ---------------------------------------------------------------------------
# point-in-time feature assembly (leakage-safe training-set backfill)
# ---------------------------------------------------------------------------

_PIT_H1 = 24 * 3600 * 1_000_000  # 24h in microseconds
_PIT_H2 = 72 * 3600 * 1_000_000  # 72h


@register(
    "events_pit_features",
    f"""
WITH feat AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN {_PIT_H1} PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS views_24h,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN {_PIT_H1} PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS clicks_24h,
           CAST(COUNT(*)
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN {_PIT_H2} PRECEDING AND 1 PRECEDING)
                AS BIGINT) AS n_72h,
           CAST(SUM(CAST(value AS DECIMAL(14,2)))
                OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                      RANGE BETWEEN {_PIT_H2} PRECEDING AND 1 PRECEDING)
                AS DOUBLE) AS value_72h,
           LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts), event_id)
               AS prev_us
    FROM events
)
SELECT user_id, event_id, us,
       COALESCE(views_24h, 0) AS views_24h,
       COALESCE(clicks_24h, 0) AS clicks_24h,
       COALESCE(n_72h, 0) AS n_72h,
       COALESCE(value_72h, 0.0) AS value_72h,
       CAST(COALESCE(us - prev_us, -1) AS BIGINT) AS us_since_prev
FROM feat WHERE event_type = 'purchase'
""",
    doc="point-in-time feature backfill: for every label event "
    "(purchase), trailing features computed over a STRICTLY-BEFORE "
    "frame (RANGE ... 1 PRECEDING on integer microseconds — the "
    "exclusive bound is what makes the training set leakage-safe; "
    "CURRENT ROW would let the label see itself and its timestamp "
    "ties). Two horizons (24h type-conditional counts, 72h "
    "count+decimal-exact spend) and recency (LAG to the previous "
    "event) come from ONE pass: all five features share the per-user "
    "shuffle, the frames differ only in bounds, and the label filter "
    "runs after the windows so history includes non-label events. At "
    "100 TB this is the feature-store backfill shape: one shuffle on "
    "user_id, never a per-(label, horizon) range join.",
)
def events_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", F.unix_micros("ts").alias("us")
    )
    base = Window.partitionBy("user_id").orderBy("us")
    w1 = base.rangeBetween(-_PIT_H1, -1)
    w2 = base.rangeBetween(-_PIT_H2, -1)
    wlag = Window.partitionBy("user_id").orderBy("us", "event_id")
    feat = e.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
        .over(w1)
        .cast("long")
        .alias("views_24h"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .over(w1)
        .cast("long")
        .alias("clicks_24h"),
        F.count("*").over(w2).cast("long").alias("n_72h"),
        F.sum(F.col("value").cast("decimal(14,2)"))
        .over(w2)
        .cast("double")
        .alias("value_72h"),
        F.lag("us").over(wlag).alias("prev_us"),
    )
    return feat.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "event_id",
        "us",
        F.coalesce("views_24h", F.lit(0)).alias("views_24h"),
        F.coalesce("clicks_24h", F.lit(0)).alias("clicks_24h"),
        F.coalesce("n_72h", F.lit(0)).alias("n_72h"),
        F.coalesce("value_72h", F.lit(0.0)).alias("value_72h"),
        F.coalesce(F.col("us") - F.col("prev_us"), F.lit(-1))
        .cast("long")
        .alias("us_since_prev"),
    )


# ---------------------------------------------------------------------------
# EWMA one-step-ahead forecast / anomaly flags over the daily rollup
# ---------------------------------------------------------------------------

_EWMA_L = 20  # truncation lag: 2^-20 tail is below one count at any SF


@register(
    "events_ewma_anomaly",
    f"""
WITH daily AS (
    SELECT event_type,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
seq AS (
    SELECT event_type, day, n,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
    FROM daily
),
ew AS (
    SELECT a.event_type, a.day, a.n, a.rn,
           SUM(b.n * CAST(pow(2, {_EWMA_L} - (a.rn - b.rn)) AS BIGINT)) AS fs,
           SUM(CAST(pow(2, {_EWMA_L} - (a.rn - b.rn)) AS BIGINT)) AS ns
    FROM seq a JOIN seq b
      ON a.event_type = b.event_type
     AND b.rn BETWEEN a.rn - {_EWMA_L} AND a.rn - 1
    GROUP BY a.event_type, a.day, a.n, a.rn
)
SELECT event_type, day, n,
       CAST(fs AS BIGINT) AS fs, CAST(ns AS BIGINT) AS ns,
       CAST(fs AS DOUBLE) / ns AS forecast,
       CAST(CASE WHEN n * ns > 2 * fs THEN 1 ELSE 0 END AS INT) AS flag_hi,
       CAST(CASE WHEN 2 * n * ns < fs THEN 1 ELSE 0 END AS INT) AS flag_lo
FROM ew
""",
    doc="EWMA anomaly detection (alpha = 1/2, one-step-ahead): "
    "forecast_t = sum_j 2^-j * x_(t-j) over the prior observed days — "
    "the sequential smoothing recurrence made distributable by "
    "truncating at lag 20 (the 2^-20 tail is below one count at any "
    "scale) so each day's forecast is a BOUNDED weighted sum, computed "
    "as a fan-out-20 range self-join on the per-type row index instead "
    "of an order-dependent scan. Weights 2^(L-j) keep every partial "
    "sum an exact BIGINT (no float accumulation order to disagree on); "
    "the partial-window normalizer ns re-scales early rows, and the "
    "anomaly flags (2x over / 2x under forecast) are pure integer "
    "cross-multiplications. Runs on the DAILY ROLLUP (metadata grain): "
    "one shuffle to (type, day), a 20-wide bounded join, one agg.",
)
def events_ewma_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    seq = daily.withColumn(
        "rn", F.row_number().over(Window.partitionBy("event_type").orderBy("day"))
    )
    a = seq.select("event_type", "day", "n", "rn")
    b = seq.select(
        F.col("event_type").alias("b_type"),
        F.col("n").alias("b_n"),
        F.col("rn").alias("b_rn"),
    )
    weight = F.pow(F.lit(2.0), F.lit(_EWMA_L) - (F.col("rn") - F.col("b_rn"))).cast(
        "long"
    )
    ew = (
        a.join(
            b,
            (F.col("event_type") == F.col("b_type"))
            & (F.col("b_rn") >= F.col("rn") - _EWMA_L)
            & (F.col("b_rn") <= F.col("rn") - 1),
        )
        .groupBy("event_type", "day", "n", "rn")
        .agg(
            F.sum(F.col("b_n") * weight).cast("long").alias("fs"),
            F.sum(weight).cast("long").alias("ns"),
        )
    )
    return ew.select(
        "event_type",
        "day",
        "n",
        "fs",
        "ns",
        (F.col("fs").cast("double") / F.col("ns")).alias("forecast"),
        F.when(F.col("n") * F.col("ns") > 2 * F.col("fs"), 1)
        .otherwise(0)
        .cast("int")
        .alias("flag_hi"),
        F.when(2 * F.col("n") * F.col("ns") < F.col("fs"), 1)
        .otherwise(0)
        .cast("int")
        .alias("flag_lo"),
    )


# ---------------------------------------------------------------------------
# weighted median via cumulative-mass crossing
# ---------------------------------------------------------------------------


@register(
    "lineitem_weighted_median_price",
    """
WITH pp AS (
    SELECT l_returnflag,
           CAST(l_extendedprice AS DECIMAL(18,2)) AS price,
           CAST(SUM(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT))
                AS BIGINT) AS w
    FROM lineitem GROUP BY 1, 2
),
cum AS (
    SELECT l_returnflag, price, w,
           SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw,
           SUM(w) OVER (PARTITION BY l_returnflag) AS tw
    FROM pp
)
SELECT l_returnflag,
       CAST(MAX(tw) AS BIGINT) AS total_weight_scaled,
       CAST(MIN(CASE WHEN cw * 2 >= tw THEN price END) AS DOUBLE)
           AS weighted_median_price
FROM cum GROUP BY l_returnflag
""",
    doc="exact weighted median (price weighted by quantity) per return "
    "flag: the smallest price whose cumulative weight reaches half the "
    "total — computed by collapsing to (group, price) grain first (tie "
    "mass merges, so the crossing is unambiguous), then one cumulative "
    "window and a conditional MIN. No global sort of raw rows and no "
    "percentile UDAF: the heavy table reduces at (group, price) grain "
    "map-side before the window, which at 100 TB is the difference "
    "between sorting the fact table and sorting its price dictionary. "
    "Quantities scale to integer centi-units so every mass comparison "
    "is BIGINT-exact.",
)
def lineitem_weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    pp = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            "l_returnflag",
            F.col("l_extendedprice").cast("decimal(18,2)").alias("price"),
        )
        .agg(
            F.sum((F.col("l_quantity").cast("decimal(18,2)") * 100).cast("long"))
            .cast("long")
            .alias("w")
        )
    )
    wo = Window.partitionBy("l_returnflag").orderBy("price")
    wa = Window.partitionBy("l_returnflag")
    cum = pp.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wo).alias("cw"),
        F.sum("w").over(wa).alias("tw"),
    )
    return cum.groupBy("l_returnflag").agg(
        F.max("tw").cast("long").alias("total_weight_scaled"),
        F.min(F.when(F.col("cw") * 2 >= F.col("tw"), F.col("price")))
        .cast("double")
        .alias("weighted_median_price"),
    )


# ---------------------------------------------------------------------------
# 2x2 chi-square association screen (exact-integer statistic)
# ---------------------------------------------------------------------------


@register(
    "events_chi2_assoc",
    """
WITH per_user AS (
    SELECT user_id,
           MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
           MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_click,
           MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS has_signup,
           MAX(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS has_error,
           MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
    FROM events GROUP BY user_id
),
melted AS (
    SELECT 'view' AS feature, has_view AS x, conv FROM per_user
    UNION ALL SELECT 'click', has_click, conv FROM per_user
    UNION ALL SELECT 'signup', has_signup, conv FROM per_user
    UNION ALL SELECT 'error', has_error, conv FROM per_user
),
cells AS (
    SELECT feature,
           SUM(x * conv) AS a,
           SUM(x * (1 - conv)) AS b,
           SUM((1 - x) * conv) AS c,
           SUM((1 - x) * (1 - conv)) AS d
    FROM melted GROUP BY feature
)
SELECT feature,
       CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b,
       CAST(c AS BIGINT) AS c, CAST(d AS BIGINT) AS d,
       CAST((a + b + c + d) * (a * d - b * c) * (a * d - b * c) AS DOUBLE)
           / ((a + b) * (c + d) * (a + c) * (b + d)) AS chi2,
       CAST(a * (c + d) AS DOUBLE) / (c * (a + b)) AS conv_lift
FROM cells
WHERE (a + b) * (c + d) * (a + c) * (b + d) > 0 AND c > 0
""",
    doc="2x2 chi-square association screen: does having interacted with "
    "feature X associate with converting? chi2 = N*(ad-bc)^2 / "
    "((a+b)(c+d)(a+c)(b+d)) evaluated as ONE double division of exact "
    "BIGINT products (the classic shortcut form needs no expected-"
    "frequency floats, so both engines emit identical bits), plus the "
    "conversion-rate lift as the same style of integer cross-ratio. "
    "The user-grain contingency cells reduce map-side from one melt "
    "pass; guards drop degenerate margins instead of dividing by "
    "zero. Scale: user-grain rollup -> 4 rows; the only shuffle is "
    "the per-user collapse the corpus is usually already bucketed by.",
)
def events_chi2_assoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = {
        t: F.max(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"has_{t}")
        for t in ("view", "click", "signup", "error", "purchase")
    }
    per_user = _t(spark, sf_dir, "events").groupBy("user_id").agg(
        flags["view"], flags["click"], flags["signup"], flags["error"],
        flags["purchase"],
    ).withColumnRenamed("has_purchase", "conv")
    # melt via stack(): ONE pass over the user rollup (a 4-arm union
    # would recompute the per-user aggregate once per feature)
    melted = per_user.selectExpr(
        "stack(4, 'view', has_view, 'click', has_click, "
        "'signup', has_signup, 'error', has_error) AS (feature, x)",
        "conv",
    )
    cells = melted.groupBy("feature").agg(
        F.sum(F.col("x") * F.col("conv")).alias("a"),
        F.sum(F.col("x") * (1 - F.col("conv"))).alias("b"),
        F.sum((1 - F.col("x")) * F.col("conv")).alias("c"),
        F.sum((1 - F.col("x")) * (1 - F.col("conv"))).alias("d"),
    )
    n = F.col("a") + F.col("b") + F.col("c") + F.col("d")
    det = F.col("a") * F.col("d") - F.col("b") * F.col("c")
    marg = (
        (F.col("a") + F.col("b"))
        * (F.col("c") + F.col("d"))
        * (F.col("a") + F.col("c"))
        * (F.col("b") + F.col("d"))
    )
    return (
        cells.filter((marg > 0) & (F.col("c") > 0))
        .select(
            "feature",
            F.col("a").cast("long").alias("a"),
            F.col("b").cast("long").alias("b"),
            F.col("c").cast("long").alias("c"),
            F.col("d").cast("long").alias("d"),
            ((n * det * det).cast("double") / marg).alias("chi2"),
            (
                (F.col("a") * (F.col("c") + F.col("d"))).cast("double")
                / (F.col("c") * (F.col("a") + F.col("b")))
            ).alias("conv_lift"),
        )
    )


# ---------------------------------------------------------------------------
# interval-overlap counting via sweep line (+1/-1 running sum)
# ---------------------------------------------------------------------------


@register(
    "orders_inflight_by_day",
    """
WITH spans AS (
    SELECT o.o_orderkey,
           CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS open_day,
           GREATEST(
               CAST(CAST(o.o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT),
               CAST(MAX(CAST(l.l_shipdate AS DATE)) - DATE '1970-01-01' AS BIGINT))
               AS close_day
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate
),
deltas AS (
    SELECT open_day AS day, 1 AS delta FROM spans
    UNION ALL
    SELECT close_day + 1 AS day, -1 AS delta FROM spans
),
daily AS (
    SELECT day,
           CAST(SUM(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_opened,
           CAST(SUM(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_closed,
           CAST(SUM(delta) AS BIGINT) AS net
    FROM deltas GROUP BY day
)
SELECT day, n_opened, n_closed,
       CAST(SUM(net) OVER (ORDER BY day) AS BIGINT) AS open_orders
FROM daily
""",
    doc="interval-overlap counting (how many orders are in flight on "
    "each day an order opens or closes) via the sweep line: each order "
    "span [orderdate, max(orderdate, last shipdate)] (the synthetic data has ship dates independent of order dates, so the close is clamped to the open) becomes a +1 and a -1 event, the "
    "event stream collapses to day grain map-side, and ONE running sum "
    "over the day spine yields the concurrent-interval count — never "
    "the day-x-order interval join, whose fan-out is |days| * "
    "|open-orders| at any scale. The running window is over the "
    "CALENDAR-BOUNDED day grain (a few thousand rows regardless of "
    "fact size), so the unpartitioned window is safe by construction.",
)
def orders_inflight_by_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    epoch = F.lit("1970-01-01").cast("date")
    spans = (
        _t(spark, sf_dir, "orders")
        .join(
            _t(spark, sf_dir, "lineitem"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate")
        .agg(F.max(F.to_date("l_shipdate")).alias("close_date"))
        .select(
            F.datediff(F.to_date("o_orderdate"), epoch).cast("long").alias("open_day"),
            F.greatest(
                F.datediff(F.to_date("o_orderdate"), epoch).cast("long"),
                F.datediff("close_date", epoch).cast("long"),
            ).alias("close_day"),
        )
    )
    deltas = spans.select(F.col("open_day").alias("day"), F.lit(1).alias("delta")).unionByName(
        spans.select((F.col("close_day") + 1).alias("day"), F.lit(-1).alias("delta"))
    )
    daily = deltas.groupBy("day").agg(
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).cast("long").alias("n_opened"),
        F.sum(F.when(F.col("delta") < 0, 1).otherwise(0)).cast("long").alias("n_closed"),
        F.sum("delta").cast("long").alias("net"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "day",
        "n_opened",
        "n_closed",
        F.sum("net").over(w).cast("long").alias("open_orders"),
    )


# ---------------------------------------------------------------------------
# autocorrelation of the daily count series at bounded lags
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3, 7)


@register(
    "events_autocorr_daily",
    f"""
WITH daily AS (
    SELECT event_type,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events GROUP BY 1, 2
),
lags AS (SELECT unnest(ARRAY{list(_ACF_LAGS)}) AS lag),
m AS (
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nd,
           CAST(SUM(n) AS BIGINT) AS s1, CAST(SUM(n * n) AS BIGINT) AS s2
    FROM daily GROUP BY 1
),
cross_terms AS (
    SELECT a.event_type, l.lag,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(a.n * b.n) AS BIGINT) AS sxy,
           CAST(SUM(a.n) AS BIGINT) AS sx, CAST(SUM(b.n) AS BIGINT) AS sy
    FROM daily a
    JOIN lags l ON TRUE
    JOIN daily b ON b.event_type = a.event_type AND b.day = a.day + l.lag
    GROUP BY a.event_type, l.lag
)
SELECT c.event_type, CAST(c.lag AS INT) AS lag, c.n_pairs,
       CAST(c.n_pairs * c.sxy - c.sx * c.sy AS BIGINT) AS cov_num,
       CAST(c.n_pairs * c.sxy - c.sx * c.sy AS DOUBLE)
           / sqrt(CAST(m.nd * m.s2 - m.s1 * m.s1 AS DOUBLE))
           / sqrt(CAST(m.nd * m.s2 - m.s1 * m.s1 AS DOUBLE))
           * m.nd / c.n_pairs AS acf
FROM cross_terms c JOIN m USING (event_type)
WHERE m.nd * m.s2 > m.s1 * m.s1
""",
    doc="autocorrelation of the per-type daily count series at lags "
    "1/2/3/7 (the weekly-seasonality diagnostic behind the seasonal "
    "anomaly profile): lagged cross-moments come from a day-shifted "
    "self-join of the DAILY ROLLUP (calendar-bounded, so the join fans "
    "out |days| x |lags|, never corpus rows), variance from exact "
    "integer moments, and the ACF estimate normalizes the exact "
    "integer covariance numerator by the exact variance numerator — "
    "two BIGINT cross-products and one declared division order, so "
    "both engines emit identical doubles. Gaps in the calendar "
    "shorten n_pairs rather than zero-filling (the declared "
    "semantics; n_pairs is reported so the reader sees the support).",
)
def events_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    m = daily.groupBy("event_type").agg(
        F.count("*").cast("long").alias("nd"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    lags = spark.createDataFrame([(lag,) for lag in _ACF_LAGS], "lag long")
    b = daily.select(
        F.col("event_type").alias("b_type"),
        F.col("day").alias("b_day"),
        F.col("n").alias("b_n"),
    )
    cross = (
        daily.crossJoin(F.broadcast(lags))
        .join(
            b,
            (F.col("b_type") == F.col("event_type"))
            & (F.col("b_day") == F.col("day") + F.col("lag")),
        )
        .groupBy("event_type", "lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum(F.col("n") * F.col("b_n")).cast("long").alias("sxy"),
            F.sum("n").cast("long").alias("sx"),
            F.sum("b_n").cast("long").alias("sy"),
        )
    )
    cov = F.col("n_pairs") * F.col("sxy") - F.col("sx") * F.col("sy")
    varn = (F.col("nd") * F.col("s2") - F.col("s1") * F.col("s1")).cast("double")
    return (
        cross.join(m, "event_type")
        .filter(F.col("nd") * F.col("s2") > F.col("s1") * F.col("s1"))
        .select(
            "event_type",
            F.col("lag").cast("int").alias("lag"),
            "n_pairs",
            cov.cast("long").alias("cov_num"),
            (
                cov.cast("double")
                / F.sqrt(varn)
                / F.sqrt(varn)
                * F.col("nd")
                / F.col("n_pairs")
            ).alias("acf"),
        )
    )


@register(
    "events_scd2_lookup",
    """
WITH ordered AS (
    SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS prev_type
    FROM events
),
changes AS (
    SELECT user_id, event_type, us, event_id
    FROM ordered
    WHERE prev_type IS NULL OR event_type != prev_type
),
dim AS (
    SELECT user_id, event_type AS state, us AS valid_from_us,
           LEAD(us) OVER (PARTITION BY user_id ORDER BY us, event_id) AS valid_to_us,
           ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY us, event_id) AS version
    FROM changes
),
facts AS (
    SELECT user_id, event_id, epoch_us(ts) AS us
    FROM events WHERE event_type = 'purchase' AND user_id < 50
)
SELECT f.user_id, f.event_id, CAST(f.us AS BIGINT) AS us,
       d.state, CAST(d.version AS INTEGER) AS version,
       CAST(f.us - d.valid_from_us AS BIGINT) AS us_into_state
FROM facts f JOIN dim d
  ON d.user_id = f.user_id
 AND d.valid_from_us <= f.us
 AND (d.valid_to_us IS NULL OR f.us < d.valid_to_us)
""",
    doc="point-in-time dimension lookup against the SCD Type-2 build: "
    "each fact (purchase) joins the ONE dimension version whose "
    "validity interval contains its event time — the join every "
    "warehouse does between facts and slowly-changing dimensions, and "
    "the consumer of the graded events_scd2_intervals build. The "
    "dimension side is the CHANGE-COMPRESSED row set (orders of "
    "magnitude smaller than the log), so at scale this is a broadcast "
    "interval join — the fact table never shuffles; the containment "
    "predicate (from <= t < to, open current row) guarantees exactly "
    "one match per fact because the intervals tile each user's "
    "timeline. Integer-microsecond bounds keep both engines exact.",
)
def events_scd2_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    changes = e.select(
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("us"),
        "event_id",
        F.lag("event_type").over(w).alias("prev_type"),
    ).filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
    wv = Window.partitionBy("user_id").orderBy("us", "event_id")
    dim = changes.select(
        F.col("user_id").alias("d_user"),
        F.col("event_type").alias("state"),
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(wv).alias("valid_to_us"),
        F.row_number().over(wv).cast("int").alias("version"),
    )
    facts = e.filter((F.col("event_type") == "purchase") & (F.col("user_id") < 50)).select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    return facts.join(
        F.broadcast(dim),
        (F.col("d_user") == F.col("user_id"))
        & (F.col("valid_from_us") <= F.col("us"))
        & (F.col("valid_to_us").isNull() | (F.col("us") < F.col("valid_to_us"))),
    ).select(
        "user_id",
        "event_id",
        F.col("us").cast("long").alias("us"),
        "state",
        "version",
        (F.col("us") - F.col("valid_from_us")).cast("long").alias("us_into_state"),
    )


# ---------------------------------------------------------------------------
# session path mining: top ordered event-type signatures
# ---------------------------------------------------------------------------

_PATH_K = 5
_PATH_GAP_US = 28_800_000_000  # 8-hour gap: the sparse synthetic
# event stream (~2 events/user/day) needs a wide gap for multi-event
# sessions; at web density the same query runs with 30 minutes


@register(
    "events_top_paths",
    f"""
WITH marked AS (
    SELECT user_id, event_type, epoch_us(ts) AS us, event_id,
           CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > {_PATH_GAP_US}
                THEN 1 ELSE 0 END AS brk
    FROM events WHERE user_id < 60
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sess AS (
    SELECT user_id, event_type, us, event_id,
           SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
                          ROWS UNBOUNDED PRECEDING) AS sid
    FROM marked
),
ranked AS (
    SELECT user_id, sid, event_type,
           ROW_NUMBER() OVER (PARTITION BY user_id, sid
                              ORDER BY us, event_id) AS rn
    FROM sess
),
paths AS (
    SELECT user_id, sid,
           COUNT(*) AS sess_events,
{",".join(f'''
           MAX(CASE WHEN rn = {i} THEN event_type END) AS s{i}'''
          for i in range(1, _PATH_K + 1))}
    FROM ranked GROUP BY user_id, sid
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(CASE WHEN sess_events > {_PATH_K} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_truncated
FROM (
    SELECT concat_ws('>', {", ".join(f"s{i}" for i in range(1, _PATH_K + 1))})
               AS path,
           sess_events
    FROM paths
)
GROUP BY path
""",
    doc="session path mining: sessions (gap sessionization) "
    "reduced to their ordered first-5 event-type signature and counted "
    "— the path-frequency table behind funnel design and UX flow "
    "analysis. The order-sensitive 'first k in order' aggregation is "
    "done PORTABLY: a per-session rank window, then k conditional MAX "
    "pivots (one per position) — never array_agg/collect_list, whose "
    "within-group order no engine contract guarantees under "
    "distributed aggregation. Truncation is reported, not hidden "
    "(n_truncated = sessions longer than k). Shuffle shape: one "
    "per-user window chain (the sessionize shuffle), one (user, "
    "session) agg, one path-grain count — all key-local.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "events").filter(F.col("user_id") < 60).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("us").over(w)
    sess = e.withColumn(
        "brk",
        F.when(prev.isNull() | ((F.col("us") - prev) > _PATH_GAP_US), 1).otherwise(0),
    ).withColumn("sid", F.sum("brk").over(run))
    ws = Window.partitionBy("user_id", "sid").orderBy("us", "event_id")
    ranked = sess.withColumn("rn", F.row_number().over(ws))
    paths = ranked.groupBy("user_id", "sid").agg(
        F.count("*").alias("sess_events"),
        *[
            F.max(F.when(F.col("rn") == i, F.col("event_type"))).alias(f"s{i}")
            for i in range(1, _PATH_K + 1)
        ],
    )
    return (
        paths.select(
            F.concat_ws(">", *[f"s{i}" for i in range(1, _PATH_K + 1)]).alias("path"),
            "sess_events",
        )
        .groupBy("path")
        .agg(
            F.count("*").cast("long").alias("n_sessions"),
            F.sum(F.when(F.col("sess_events") > _PATH_K, 1).otherwise(0))
            .cast("long")
            .alias("n_truncated"),
        )
    )


# ---------------------------------------------------------------------------
# Gini concentration of per-user activity
# ---------------------------------------------------------------------------


@register(
    "events_gini_concentration",
    """
WITH per_user AS (
    SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT event_type, x,
           ROW_NUMBER() OVER (PARTITION BY event_type
                              ORDER BY x, user_id) AS i
    FROM per_user
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(x) AS BIGINT) AS total,
       CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS BIGINT) AS gini_num,
       CAST(2 * SUM(i * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
           / (COUNT(*) * SUM(x)) AS gini
FROM ranked GROUP BY event_type
""",
    doc="Gini coefficient of per-user activity per event type — the "
    "scalar concentration metric behind 'do a few users generate all "
    "the traffic' (and, run over per-source token mass, 'do a few "
    "sources dominate the corpus'): the rank formulation G = "
    "(2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over counts sorted "
    "ascending, which needs ONE rank window over the user-grain "
    "rollup (never the O(n^2) mean-absolute-difference definition) "
    "and stays BIGINT-exact until a single final division. "
    "Deterministic user_id tie-break makes the ranks total; ties in x "
    "leave the SUM(i*x) invariant across valid orderings, so the "
    "statistic is well-defined anyway.",
)
def events_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_user = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.count("*").cast("long").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("x", "user_id")
    ranked = per_user.select("event_type", "x", F.row_number().over(w).alias("i"))
    num = 2 * F.sum(F.col("i") * F.col("x")) - (F.count("*") + 1) * F.sum("x")
    return ranked.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("x").cast("long").alias("total"),
        num.cast("long").alias("gini_num"),
        (num.cast("double") / (F.count("*") * F.sum("x"))).alias("gini"),
    )


# ---------------------------------------------------------------------------
# cohort LTV curve: cumulative revenue by customer-cohort age
# ---------------------------------------------------------------------------


@register(
    "orders_cohort_ltv_curve",
    """
WITH firsts AS (
    SELECT o_custkey, MIN(year(o_orderdate)) AS cohort_year
    FROM orders GROUP BY o_custkey
),
rev AS (
    SELECT f.cohort_year,
           CAST(year(o.o_orderdate) - f.cohort_year AS INT) AS age_years,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS n_active,
           SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS revenue_d
    FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    GROUP BY 1, 2
),
sized AS (
    SELECT cohort_year, CAST(COUNT(*) AS BIGINT) AS cohort_users
    FROM firsts GROUP BY 1
)
SELECT r.cohort_year, r.age_years, s.cohort_users, r.n_orders, r.n_active,
       CAST(r.revenue_d AS DOUBLE) AS revenue,
       CAST(SUM(r.revenue_d) OVER (PARTITION BY r.cohort_year
                                   ORDER BY r.age_years) AS DOUBLE)
           AS cum_revenue,
       CAST(CAST(SUM(r.revenue_d) OVER (PARTITION BY r.cohort_year
                                        ORDER BY r.age_years) AS DOUBLE)
            / s.cohort_users AS DOUBLE) AS ltv_per_user
FROM rev r JOIN sized s USING (cohort_year)
""",
    doc="cohort LTV curve: customers grouped by first-order year, "
    "revenue accumulated by cohort age — the lifetime-value table "
    "behind acquisition-spend decisions (read DOWN a column to compare "
    "cohort quality at equal age). The running revenue stays DECIMAL "
    "inside the cumulative window (exact at any accumulation order) "
    "and casts to double only at the edge; LTV-per-user divides by the "
    "FULL cohort size, not survivors (n_active is reported beside it "
    "so retention and spend are not conflated). Shuffles: one "
    "per-customer first-order agg, one (cohort, age) rollup, one "
    "cohort-bounded window over a few dozen rows.",
)
def orders_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort_year")
    )
    rev = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort_year",
            (F.year("o_orderdate") - F.col("cohort_year")).cast("int").alias("age_years"),
        )
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.count_distinct("o_custkey").cast("long").alias("n_active"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("revenue_d"),
        )
    )
    sized = firsts.groupBy("cohort_year").agg(
        F.count("*").cast("long").alias("cohort_users")
    )
    w = Window.partitionBy("cohort_year").orderBy("age_years")
    return (
        rev.join(sized, "cohort_year")
        .select(
            "cohort_year",
            "age_years",
            "cohort_users",
            "n_orders",
            "n_active",
            F.col("revenue_d").cast("double").alias("revenue"),
            F.sum("revenue_d").over(w).cast("double").alias("cum_revenue"),
            (F.sum("revenue_d").over(w).cast("double") / F.col("cohort_users"))
            .cast("double")
            .alias("ltv_per_user"),
        )
    )


# ---------------------------------------------------------------------------
# Shewhart p-chart over the daily error rate
# ---------------------------------------------------------------------------


@register(
    "events_pchart_error_rate",
    """
WITH daily AS (
    SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
               AS x
    FROM events GROUP BY 1
),
tot AS (
    SELECT CAST(SUM(n) AS BIGINT) AS nn, CAST(SUM(x) AS BIGINT) AS xx
    FROM daily
)
SELECT d.day, d.n, d.x,
       CAST(d.x AS DOUBLE) / d.n AS p_day,
       CAST(t.xx AS DOUBLE) / t.nn AS p_bar,
       CAST(d.x * t.nn - t.xx * d.n AS BIGINT) AS dev_num,
       CAST(CASE WHEN CAST(d.x * t.nn - t.xx * d.n AS DOUBLE)
                      * CAST(d.x * t.nn - t.xx * d.n AS DOUBLE)
                  > 9.0 * t.xx * (t.nn - t.xx) * d.n
                 THEN 1 ELSE 0 END AS INT) AS out_of_control,
       CAST(CASE WHEN d.x * t.nn > t.xx * d.n THEN 1 ELSE -1 END AS INT)
           AS direction
FROM daily d CROSS JOIN tot t
""",
    doc="Shewhart p-chart over the daily error rate — with CUSUM "
    "(events_cusum_shift) and EWMA (events_ewma_anomaly) this "
    "completes the classic SPC trio (Shewhart catches big one-day "
    "jumps, CUSUM slow level shifts, EWMA drifts in between). The "
    "3-sigma binomial control test (p_day - p_bar)^2 > 9*p_bar*"
    "(1-p_bar)/n is evaluated as the cross-multiplied form "
    "(x*N - X*n)^2 > 9*X*(N-X)*n: every operand is an exact BIGINT "
    "from the daily rollup and the one squaring runs in doubles built "
    "from identical integers, so both engines flag identically. "
    "Center line from a 1-row broadcast total; the chart is "
    "calendar-bounded metadata.",
)
def events_pchart_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _t(spark, sf_dir, "events")
        .groupBy(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("x"),
        )
    )
    tot = daily.agg(
        F.sum("n").cast("long").alias("nn"), F.sum("x").cast("long").alias("xx")
    )
    dev = F.col("x") * F.col("nn") - F.col("xx") * F.col("n")
    return daily.crossJoin(F.broadcast(tot)).select(
        "day",
        "n",
        "x",
        (F.col("x").cast("double") / F.col("n")).alias("p_day"),
        (F.col("xx").cast("double") / F.col("nn")).alias("p_bar"),
        dev.cast("long").alias("dev_num"),
        F.when(
            dev.cast("double") * dev.cast("double")
            > 9.0 * F.col("xx") * (F.col("nn") - F.col("xx")) * F.col("n"),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("out_of_control"),
        F.when(F.col("x") * F.col("nn") > F.col("xx") * F.col("n"), 1)
        .otherwise(-1)
        .cast("int")
        .alias("direction"),
    )


# ---------------------------------------------------------------------------
# inter-arrival burstiness (squared coefficient of variation)
# ---------------------------------------------------------------------------


@register(
    "events_interarrival_burstiness",
    """
WITH gaps AS (
    SELECT event_type,
           epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY event_type ORDER BY epoch_us(ts), event_id)
               AS gap
    FROM events
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_gaps,
       CAST(s1 AS BIGINT) AS sum_gap_us,
       CAST(s1 AS DOUBLE) / n AS mean_gap_us,
       CAST(n * s2 - CAST(s1 AS DECIMAL(38,0)) * s1 AS DOUBLE)
           / (CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) AS cv2,
       CAST(CASE WHEN n * s2 > 2 * CAST(s1 AS DECIMAL(38,0)) * s1
                 THEN 1 ELSE 0 END AS INT) AS is_bursty
FROM (
    SELECT event_type, COUNT(*) AS n, SUM(gap) AS s1,
           SUM(CAST(gap AS DECIMAL(38,0)) * gap) AS s2
    FROM gaps WHERE gap IS NOT NULL
    GROUP BY event_type
)
""",
    doc="inter-arrival burstiness per event type: the squared "
    "coefficient of variation of consecutive arrival gaps — the "
    "stochastic-process diagnostic that separates Poisson-like "
    "arrivals (CV^2 ~ 1) from bursty ones (CV^2 >> 1), read before "
    "sizing streaming state or rate limits. CV^2 = (n*sum(g^2) - "
    "sum(g)^2) / sum(g)^2 from exact BIGINT microsecond moments "
    "(variance cross-product form, one declared division); the bursty "
    "flag (CV^2 > 2, i.e. n*sum(g^2) > 2*sum(g)^2 after adding the "
    "identity term) is a pure integer comparison. One per-type window "
    "for the LAG diffs, one moment agg — the gap stream never leaves "
    "its type partition.",
)
def events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("event_type").orderBy(F.unix_micros("ts"), "event_id")
    gaps = (
        _t(spark, sf_dir, "events")
        .select(
            "event_type",
            (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
    )
    # second moment in DECIMAL(38,0): an hour-scale gap in microseconds
    # squares past BIGINT range; decimal sums stay exact in both engines
    m = gaps.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("gap").alias("s1"),
        F.sum(F.col("gap").cast("decimal(38,0)") * F.col("gap")).alias("s2"),
    )
    s1d = F.col("s1").cast("decimal(38,0)")
    return m.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.col("s1").cast("long").alias("sum_gap_us"),
        (F.col("s1").cast("double") / F.col("n")).alias("mean_gap_us"),
        (
            (F.col("n") * F.col("s2") - s1d * F.col("s1")).cast("double")
            / (F.col("s1").cast("double") * F.col("s1").cast("double"))
        ).alias("cv2"),
        F.when(F.col("n") * F.col("s2") > 2 * s1d * F.col("s1"), 1)
        .otherwise(0)
        .cast("int")
        .alias("is_bursty"),
    )


# ---------------------------------------------------------------------------
# bot/automation detection heuristics per user
# ---------------------------------------------------------------------------

_BOT_FAST_GAP_US = 1_000_000  # gaps under 1s are "too fast for a human"
_BOT_SHARE_SCALE = 1000


@register(
    "events_bot_screen",
    f"""
WITH seq AS (
    SELECT user_id, epoch_us(ts) AS us, event_id,
           CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
           epoch_us(ts) - LAG(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS gap
    FROM events
),
per_day AS (
    SELECT user_id, day, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq GROUP BY 1, 2
),
day_stats AS (
    SELECT user_id, CAST(MAX(n) AS BIGINT) AS max_day_events
    FROM per_day GROUP BY 1
),
gap_modes AS (
    SELECT user_id, CAST(MAX(c) AS BIGINT) AS modal_gap_count
    FROM (SELECT user_id, gap, COUNT(*) AS c
          FROM seq WHERE gap IS NOT NULL GROUP BY 1, 2)
    GROUP BY 1
),
gap_stats AS (
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           CAST(SUM(CASE WHEN gap < {_BOT_FAST_GAP_US} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_fast_gaps
    FROM seq WHERE gap IS NOT NULL GROUP BY 1
)
SELECT g.user_id,
       g.n_gaps + 1 AS n_events,
       d.max_day_events,
       g.n_fast_gaps,
       m.modal_gap_count,
       CAST(floor(m.modal_gap_count * {_BOT_SHARE_SCALE} / g.n_gaps)
            AS BIGINT) AS modal_gap_share_scaled,
       CAST(CASE WHEN g.n_fast_gaps * 5 > g.n_gaps
                   OR m.modal_gap_count * 2 > g.n_gaps
                 THEN 1 ELSE 0 END AS INT) AS is_suspect
FROM gap_stats g
JOIN day_stats d USING (user_id)
JOIN gap_modes m USING (user_id)
""",
    doc="bot/automation screening per user — the traffic-hygiene stage "
    "a training-data pipeline runs before behavioral events feed "
    "features or labels: too-fast inter-event gaps (> 1/5 of gaps "
    "under 1 s) and metronomic timing (the MODAL gap covering > half "
    "of all gaps — humans do not repeat exact microsecond intervals) "
    "flag the user; max single-day volume rides along for the rate "
    "axis. Every heuristic is an integer cross-multiplication over "
    "per-user rollups; the modal-gap count is a (user, gap) grain agg "
    "whose key cannot explode past the event count. One per-user "
    "window + three same-key rollups — the stream shuffles once.",
)
def events_bot_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    seq = _t(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day"),
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).alias("gap"),
    )
    day_stats = (
        seq.groupBy("user_id", "day")
        .agg(F.count("*").alias("n"))
        .groupBy("user_id")
        .agg(F.max("n").cast("long").alias("max_day_events"))
    )
    gaps = seq.filter(F.col("gap").isNotNull())
    gap_modes = (
        gaps.groupBy("user_id", "gap")
        .agg(F.count("*").alias("c"))
        .groupBy("user_id")
        .agg(F.max("c").cast("long").alias("modal_gap_count"))
    )
    gap_stats = gaps.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum(F.when(F.col("gap") < _BOT_FAST_GAP_US, 1).otherwise(0))
        .cast("long")
        .alias("n_fast_gaps"),
    )
    return (
        gap_stats.join(day_stats, "user_id")
        .join(gap_modes, "user_id")
        .select(
            "user_id",
            (F.col("n_gaps") + 1).alias("n_events"),
            "max_day_events",
            "n_fast_gaps",
            "modal_gap_count",
            F.floor(
                F.col("modal_gap_count") * _BOT_SHARE_SCALE / F.col("n_gaps")
            )
            .cast("long")
            .alias("modal_gap_share_scaled"),
            F.when(
                (F.col("n_fast_gaps") * 5 > F.col("n_gaps"))
                | (F.col("modal_gap_count") * 2 > F.col("n_gaps")),
                1,
            )
            .otherwise(0)
            .cast("int")
            .alias("is_suspect"),
        )
    )


# ---------------------------------------------------------------------------
# trigram-index LIKE search (pg_trgm pattern) — graded invisible
# ---------------------------------------------------------------------------

_TRGM_PATTERN = "idg"  # the literal substring the graded probe searches


@register(
    "part_trigram_like_search",
    f"""
SELECT CAST(p_partkey AS BIGINT) AS p_partkey, p_name
FROM part WHERE p_name LIKE '%{_TRGM_PATTERN}%'
""",
    doc="trigram-accelerated substring search (the pg_trgm pattern): "
    "part names explode into 3-gram posting lists ONCE; a LIKE "
    "'%sub%' probe intersects the posting lists of the pattern's "
    "trigrams (every true match must contain ALL of them — trigram "
    "containment is a NECESSARY condition, so candidates are a "
    "superset) and an exact contains() verify removes false "
    "positives. The oracle is the plain LIKE scan: like the Bloom "
    "semi-join row, the index must be SEMANTICALLY INVISIBLE, which "
    "is the entire contract of an index. At 100 TB the posting list "
    "is built once and the probe touches |pattern trigrams| posting "
    "rows, not the corpus — this query grades the candidate+verify "
    "plumbing at test scale.",
)
def part_trigram_like_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    pat = _TRGM_PATTERN
    parts = _t(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("long").alias("p_partkey"), "p_name"
    )
    # posting lists: one row per (trigram, partkey)
    grams = parts.select(
        "p_partkey",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("p_name") - 2),
                lambda i: F.col("p_name").substr(i, F.lit(3)),
            )
        ).alias("g"),
    )
    pattern_grams = [pat[i : i + 3] for i in range(len(pat) - 2)]
    # candidates: keys whose posting rows cover EVERY pattern trigram
    cand = (
        grams.filter(F.col("g").isin(*pattern_grams))
        .groupBy("p_partkey")
        .agg(F.count_distinct("g").alias("hit"))
        .filter(F.col("hit") == len(pattern_grams))
        .select("p_partkey")
    )
    # exact verify: false positives (trigrams present but not adjacent)
    # are removed by contains(); no false negatives exist by necessity
    return (
        parts.join(cand, "p_partkey")
        .filter(F.col("p_name").contains(pat))
        .select("p_partkey", "p_name")
    )


# ---------------------------------------------------------------------------
# Cramér's V association between categorical columns (r x c chi-square)
# ---------------------------------------------------------------------------

_CV_TICKS = 1_000_000_000


@register(
    "lineitem_cramers_v",
    f"""
WITH cells AS (
    SELECT l_returnflag AS r, l_linestatus AS c, CAST(COUNT(*) AS BIGINT) AS o
    FROM lineitem GROUP BY 1, 2
),
rows_m AS (SELECT r, CAST(SUM(o) AS BIGINT) AS rm FROM cells GROUP BY 1),
cols_m AS (SELECT c, CAST(SUM(o) AS BIGINT) AS cm FROM cells GROUP BY 1),
n AS (SELECT CAST(SUM(o) AS BIGINT) AS nn FROM cells),
terms AS (
    SELECT CAST(floor(CAST(x.o AS DOUBLE) * x.o / r.rm / c.cm
                      * {_CV_TICKS} + 0.5) AS BIGINT) AS tick
    FROM cells x JOIN rows_m r USING (r) JOIN cols_m c USING (c)
),
dims AS (
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rows_m) AS nr,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cols_m) AS nc
)
SELECT d.nr AS n_rows, d.nc AS n_cols, n.nn AS n_items,
       CAST(SUM(t.tick) AS BIGINT) AS sum_ratio_ticks,
       (CAST(SUM(t.tick) AS DOUBLE) / {_CV_TICKS} - 1) * n.nn AS chi2,
       sqrt(GREATEST((CAST(SUM(t.tick) AS DOUBLE) / {_CV_TICKS} - 1)
                     / (LEAST(d.nr, d.nc) - 1), 0.0)) AS cramers_v
FROM terms t CROSS JOIN n CROSS JOIN dims d
GROUP BY d.nr, d.nc, n.nn
""",
    doc="Cramér's V association between two categorical columns (the "
    "r x c generalization of the graded 2x2 chi-square screen): chi2 "
    "= N*(sum_cells o^2/(row*col) - 1), each cell's ratio evaluated "
    "from exact BIGINT marginals in doubles built from identical "
    "integers and quantized to 1e-9 ticks BEFORE the order-free sum; "
    "V normalizes by min(r,c)-1 so the statistic is comparable across "
    "tables. Contingency cells, marginals, and dims all reduce "
    "map-side from one fact pass — association between two columns "
    "costs one scan at any scale.",
)
def lineitem_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = (
        _t(spark, sf_dir, "lineitem")
        .groupBy(
            F.col("l_returnflag").alias("r"), F.col("l_linestatus").alias("c")
        )
        .agg(F.count("*").cast("long").alias("o"))
    )
    rows_m = cells.groupBy("r").agg(F.sum("o").cast("long").alias("rm"))
    cols_m = cells.groupBy("c").agg(F.sum("o").cast("long").alias("cm"))
    n = cells.agg(F.sum("o").cast("long").alias("nn"))
    dims = rows_m.agg(F.count("*").cast("long").alias("nr")).crossJoin(
        cols_m.agg(F.count("*").cast("long").alias("nc"))
    )
    tick = F.floor(
        F.col("o").cast("double") * F.col("o") / F.col("rm") / F.col("cm")
        * _CV_TICKS
        + 0.5
    ).cast("long")
    terms = (
        cells.join(F.broadcast(rows_m), "r")
        .join(F.broadcast(cols_m), "c")
        .select(tick.alias("tick"))
    )
    ratio = F.sum("tick").cast("double") / _CV_TICKS - 1
    return (
        terms.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(dims))
        .groupBy(
            F.col("nr").alias("n_rows"),
            F.col("nc").alias("n_cols"),
            F.col("nn").alias("n_items"),
        )
        .agg(
            F.sum("tick").cast("long").alias("sum_ratio_ticks"),
            (ratio * F.first("nn")).alias("chi2"),
            F.sqrt(
                F.greatest(
                    ratio / (F.least(F.first("nr"), F.first("nc")) - 1), F.lit(0.0)
                )
            ).alias("cramers_v"),
        )
    )


# ---------------------------------------------------------------------------
# equi-depth histogram construction (the ANALYZE/optimizer-stats primitive)
# ---------------------------------------------------------------------------

_EQD_BUCKETS = 8


@register(
    "lineitem_equidepth_histogram",
    f"""
WITH bounds AS (
    SELECT {", ".join(
        f"percentile_disc({i}.0 / {_EQD_BUCKETS}) WITHIN GROUP "
        f"(ORDER BY CAST(l_extendedprice AS DECIMAL(18,2))) AS b{i}"
        for i in range(1, _EQD_BUCKETS)
    )}
    FROM lineitem
),
bucketed AS (
    SELECT CAST({" + ".join(
        f"CASE WHEN CAST(l.l_extendedprice AS DECIMAL(18,2)) > b.b{i} "
        "THEN 1 ELSE 0 END"
        for i in range(1, _EQD_BUCKETS)
    )} AS INT) AS bucket,
           CAST(l_extendedprice AS DECIMAL(18,2)) AS price
    FROM lineitem l CROSS JOIN bounds b
)
SELECT bucket,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(MIN(price) AS DOUBLE) AS lo,
       CAST(MAX(price) AS DOUBLE) AS hi
FROM bucketed GROUP BY bucket
""",
    doc="equi-depth histogram construction — the ANALYZE-statistics "
    "primitive every cost-based optimizer (and every skew diagnosis) "
    "rests on: 7 interior percentile_disc boundaries (a discrete "
    "order statistic — an ACTUAL value, portable across engines, "
    "unlike interpolating percentile_cont) computed in one reduce, "
    "broadcast back as one row, and each fact row bucketed by "
    "COUNTING THE BOUNDARIES BELOW IT (a sum of comparisons — no "
    "nested CASE ladder, no second sort). Depths come out near-equal "
    "by construction; lo/hi per bucket are the boundary audit. One "
    "dictionary-grain cumulative pass (the window runs over the DISTINCT-price dictionary, bounded by the value domain, not row count) + one broadcast scan — never a global sort of "
    "the fact table, which is what makes equi-depth viable at 100 TB.",
)
def lineitem_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    li = _t(spark, sf_dir, "lineitem").select(price.alias("price"))
    # boundaries from ONE cumulative pass over the (price, count)
    # dictionary — percentile_disc(q) IS the smallest value whose
    # cumulative count reaches ceil(q*n), so all 7 order statistics
    # fall out of a single window (7 separate percentile_disc
    # aggregates each ran their own sort-based reduce: 23.6 s -> ~1 s)
    pd_grain = li.groupBy("price").agg(F.count("*").alias("w"))
    # cumulative mass via the house two-phase prefix scan: the previous
    # bare Window.orderBy funneled the whole (price, count) dictionary
    # — O(distinct prices), which grows with the corpus — through ONE
    # task (round-8 funnel-audit catch); the grand total rides back as
    # a 1-row broadcast instead of an unbounded-following window
    from watsondedupe_spark.operators.text import global_prefix_sum

    tot = pd_grain.agg(F.sum("w").alias("n"))
    cum = (
        global_prefix_sum(pd_grain, "price", "w", out_col="_cw_excl")
        .crossJoin(F.broadcast(tot))
        .select("price", "w", (F.col("_cw_excl") + F.col("w")).alias("cw"), "n")
        # r13 (guide §1.2/§6): the cumulative dictionary feeds BOTH the
        # boundary aggregate and the final rollup below — materialize
        # it once (it is bounded by the value domain, not the corpus)
        # so the prefix-scan machinery doesn't re-execute per consumer
        .localCheckpoint(eager=True)
    )
    bounds = cum.agg(
        *[
            F.min(
                F.when(
                    F.col("cw") * _EQD_BUCKETS >= F.col("n") * i, F.col("price")
                )
            ).alias(f"b{i}")
            for i in range(1, _EQD_BUCKETS)
        ]
    )
    bucket = sum(
        F.when(F.col("price") > F.col(f"b{i}"), 1).otherwise(0)
        for i in range(1, _EQD_BUCKETS)
    ).cast("int")
    # r13 (guide §1.2 — don't rescan what you already aggregated): the
    # old final pass re-read the WHOLE fact table just to bucket each
    # row, but bucket assignment depends only on price, so n_rows/lo/hi
    # all fold from the (price, count) dictionary already in hand —
    # n_rows = sum of per-price counts, lo/hi = min/max price in the
    # bucket. One fact-table scan total instead of two; at 100 TB the
    # second scan IS the query's cost. Bit-identical: same bucket
    # expression, integer count sums, and min/max over the same values.
    return (
        cum.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"), "price", "w")
        .groupBy("bucket")
        .agg(
            F.sum("w").cast("long").alias("n_rows"),
            F.min("price").cast("double").alias("lo"),
            F.max("price").cast("double").alias("hi"),
        )
    )
