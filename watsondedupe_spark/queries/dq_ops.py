"""Data-quality / profiling operators as graded queries — the audit
stages a 100 TB ingest pipeline runs before anything else touches the
data. All oracle-exact vs DuckDB (integer arithmetic only; no float
aggregation crosses an engine boundary).

- **One-pass column profiler** (`docs_profile`): per-column row/null/
  distinct counts, min/max, and string byte volume for the whole table
  in a single scan. The distinct counts share one Expand-based
  aggregation (one shuffle total); everything else is plain partial
  aggregation. At 100 TB this is the "what is in this table" primitive —
  a per-column loop of ``SELECT COUNT(DISTINCT ...)`` would scan the
  table once per column.
- **Expectations audit** (`dq_expectations`): uniqueness, null-rate,
  referential-integrity, and range constraints evaluated as conditional
  aggregates (one scan per fact table) plus broadcast-able anti-joins
  for the FK checks. Modeled on the Deequ/Great-Expectations shape:
  the result is a tiny (check_name, violations, n_rows) relation a
  scheduler can gate on.
- **Robust outliers** (`events_mad_outliers`): per-group median and MAD
  (median absolute deviation) computed as exact order statistics off a
  per-group value histogram — no per-group sort of the raw events, and
  the second (deviation) median is derived from the same histogram, so
  the raw table is scanned exactly once. Values are quantized to integer
  cents so every order statistic is engine-exact.

Reference parity: none of these exist in WatsonDedupe — its only
statistics are the four global COUNT/SUMs of O20
(Database/SqliteProvider.cs:155-190); engine-side additions per
SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from watsondedupe_spark.queries import register
from watsondedupe_spark.sources import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# one-pass column profiler
# ---------------------------------------------------------------------------

_PROFILE_COLS = ["doc_id", "text", "lang", "source", "n_chars"]
_PROFILE_STRING_COLS = {"text", "lang", "source"}
# min/max over the full document text is profiling noise (and a wide
# shuffle value at scale); the profiler tracks ordering stats only for
# the short columns and byte volume for the long ones.
_PROFILE_ORDERED_COLS = {"doc_id", "lang", "source", "n_chars"}

# distinct over the long `text` column runs on its 128-bit md5 image on
# BOTH engines: the Expand shuffle then carries 32 bytes per row instead
# of the multi-KB document — the count is identical short of an md5
# collision, and at 100 TB the narrow shuffle is the difference between
# a profiler that runs and one that spills.
_PROFILE_ORACLE = "\nUNION ALL\n".join(
    f"""
SELECT '{c}' AS col_name,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {"md5(" + c + ")" if c == "text" else c}) AS BIGINT) AS n_distinct,
       {f"CAST(MIN({c}) AS VARCHAR)" if c in _PROFILE_ORDERED_COLS else "CAST(NULL AS VARCHAR)"} AS min_val,
       {f"CAST(MAX({c}) AS VARCHAR)" if c in _PROFILE_ORDERED_COLS else "CAST(NULL AS VARCHAR)"} AS max_val,
       {f"CAST(SUM(length({c})) AS BIGINT)" if c in _PROFILE_STRING_COLS else "CAST(NULL AS BIGINT)"} AS sum_len
FROM documents"""
    for c in _PROFILE_COLS
)


@register(
    "docs_profile",
    _PROFILE_ORACLE,
    doc="one-pass table profiler: every per-column statistic (rows, "
    "nulls, exact distinct, min/max, string volume) comes out of a "
    "single aggregation over a single scan (the multi-DISTINCT runs "
    "through Catalyst's Expand — one shuffle whose width is the column "
    "count, not one job per column), then pivots to the long "
    "(col_name, stats) form with a stack() projection. The oracle is "
    "the naive per-column UNION ALL.",
)
def docs_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"{c}__nulls")
        )
        distinct_src = F.md5(F.col(c)) if c == "text" else F.col(c)
        aggs.append(F.count_distinct(distinct_src).cast("long").alias(f"{c}__distinct"))
        if c in _PROFILE_ORDERED_COLS:
            aggs.append(F.min(c).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(c).cast("string").alias(f"{c}__max"))
        if c in _PROFILE_STRING_COLS:
            aggs.append(
                F.sum(F.length(c).cast("long")).cast("long").alias(f"{c}__len")
            )
    one = docs.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                (
                    F.col(f"{c}__min")
                    if c in _PROFILE_ORDERED_COLS
                    else F.lit(None).cast("string")
                ).alias("min_val"),
                (
                    F.col(f"{c}__max")
                    if c in _PROFILE_ORDERED_COLS
                    else F.lit(None).cast("string")
                ).alias("max_val"),
                (
                    F.col(f"{c}__len")
                    if c in _PROFILE_STRING_COLS
                    else F.lit(None).cast("long")
                ).alias("sum_len"),
            )
            for c in _PROFILE_COLS
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


# ---------------------------------------------------------------------------
# expectations audit
# ---------------------------------------------------------------------------

_EXPECT_ORACLE = """
WITH o AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS dup_pk,
           CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS null_cust,
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS bad_price
    FROM orders
),
l AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.1
                         THEN 1 ELSE 0 END) AS BIGINT) AS bad_disc,
           CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
                AS BIGINT) AS dup_pk
    FROM lineitem
),
fk_oc AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders
    WHERE o_custkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = orders.o_custkey)
),
fk_lo AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS v FROM lineitem
    WHERE l_orderkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = lineitem.l_orderkey)
)
SELECT 'orders_pk_unique' AS check_name, dup_pk AS violations, n AS n_rows FROM o
UNION ALL
SELECT 'orders_custkey_not_null', null_cust, n FROM o
UNION ALL
SELECT 'orders_price_positive', bad_price, n FROM o
UNION ALL
SELECT 'orders_fk_customer', fk_oc.v, o.n FROM fk_oc, o
UNION ALL
SELECT 'lineitem_pk_unique', dup_pk, n FROM l
UNION ALL
SELECT 'lineitem_qty_in_range', bad_qty, n FROM l
UNION ALL
SELECT 'lineitem_discount_in_range', bad_disc, n FROM l
UNION ALL
SELECT 'lineitem_fk_orders', fk_lo.v, l.n FROM fk_lo, l
"""


@register(
    "dq_expectations",
    _EXPECT_ORACLE,
    doc="Deequ-style expectations audit: uniqueness / null-rate / range "
    "constraints fold into ONE conditional aggregation per fact table "
    "(single scan each), referential integrity is a left-anti join per "
    "FK edge (Bloom-prunable; the orders side broadcasts under AQE at "
    "dim scale), and the verdicts land in a tiny (check, violations, "
    "n_rows) relation a pipeline gate can assert on.",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    customer = _t(spark, sf_dir, "customer")

    o = orders.agg(
        F.count("*").cast("long").alias("n"),
        (F.count("*") - F.count_distinct("o_orderkey")).cast("long").alias("dup_pk"),
        F.sum(F.col("o_custkey").isNull().cast("long")).cast("long").alias("null_cust"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).cast("long").alias("bad_price"),
    )
    li = lineitem.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("long"))
        .cast("long")
        .alias("bad_qty"),
        F.sum(((F.col("l_discount") < 0) | (F.col("l_discount") > 0.1)).cast("long"))
        .cast("long")
        .alias("bad_disc"),
        (F.count("*") - F.count_distinct(F.struct("l_orderkey", "l_linenumber")))
        .cast("long")
        .alias("dup_pk"),
    )
    fk_oc = (
        orders.filter(F.col("o_custkey").isNotNull())
        .join(customer, orders.o_custkey == customer.c_custkey, "left_anti")
        .agg(F.count("*").cast("long").alias("v"))
    )
    fk_lo = (
        lineitem.filter(F.col("l_orderkey").isNotNull())
        .join(orders, lineitem.l_orderkey == orders.o_orderkey, "left_anti")
        .agg(F.count("*").cast("long").alias("v"))
    )

    def row(name: str, src: DataFrame, vcol: str, ncol: DataFrame | None = None):
        if ncol is None:
            return src.select(
                F.lit(name).alias("check_name"),
                F.col(vcol).alias("violations"),
                F.col("n").alias("n_rows"),
            )
        return src.crossJoin(F.broadcast(ncol.select("n"))).select(
            F.lit(name).alias("check_name"),
            F.col(vcol).alias("violations"),
            F.col("n").alias("n_rows"),
        )

    parts = [
        row("orders_pk_unique", o, "dup_pk"),
        row("orders_custkey_not_null", o, "null_cust"),
        row("orders_price_positive", o, "bad_price"),
        row("orders_fk_customer", fk_oc, "v", o),
        row("lineitem_pk_unique", li, "dup_pk"),
        row("lineitem_qty_in_range", li, "bad_qty"),
        row("lineitem_discount_in_range", li, "bad_disc"),
        row("lineitem_fk_orders", fk_lo, "v", li),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# robust outliers: per-group exact median + MAD off one value histogram
# ---------------------------------------------------------------------------

_MAD_ORACLE = """
WITH q AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
),
vals AS (
    SELECT event_type, v, CAST(COUNT(*) AS BIGINT) AS c
    FROM q GROUP BY event_type, v
),
cum AS (
    SELECT event_type, v, c,
           SUM(c) OVER (PARTITION BY event_type ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_c,
           SUM(c) OVER (PARTITION BY event_type) AS n
    FROM vals
),
med AS (
    SELECT event_type, MIN(v) AS med, ANY_VALUE(n) AS n
    FROM cum WHERE cum_c >= (n + 1) // 2 GROUP BY event_type
),
dev AS (
    SELECT v.event_type, abs(v.v - m.med) AS d, SUM(v.c) AS c, ANY_VALUE(m.n) AS n,
           ANY_VALUE(m.med) AS med
    FROM vals v JOIN med m ON v.event_type = m.event_type
    GROUP BY v.event_type, abs(v.v - m.med)
),
dcum AS (
    SELECT event_type, d, c, med, n,
           SUM(c) OVER (PARTITION BY event_type ORDER BY d
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_c
    FROM dev
),
mad AS (
    SELECT event_type, MIN(d) AS mad, ANY_VALUE(med) AS med, ANY_VALUE(n) AS n
    FROM dcum WHERE cum_c >= (n + 1) // 2 GROUP BY event_type
)
SELECT d.event_type,
       CAST(m.med AS BIGINT) AS med_cents,
       CAST(m.mad AS BIGINT) AS mad_cents,
       CAST(m.n AS BIGINT) AS n_events,
       CAST(COALESCE(SUM(CASE WHEN abs(d.d) > 3 * m.mad THEN d.c END), 0)
            AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY d.event_type, m.med, m.mad, m.n
"""


@register(
    "events_mad_outliers",
    _MAD_ORACLE,
    doc="robust (median/MAD) outlier counts per event type with ONE scan "
    "of the raw table: aggregate to a per-(type, value-in-cents) "
    "histogram, read the exact lower-median order statistic off its "
    "per-group cumulative sum, derive the DEVIATION histogram from the "
    "same value histogram (never rescanning events), read the MAD off "
    "that, and count |v-med| > 3*MAD from histogram weights. All "
    "arithmetic is integer (cents quantization), so both engines agree "
    "bit-for-bit; the per-group windows run over distinct values, which "
    "is why this survives 100 TB where a per-group sort of raw events "
    "would not.",
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = _t(spark, sf_dir, "events")
    q = events.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("v")
    )
    vals = q.groupBy("event_type", "v").agg(F.count("*").cast("long").alias("c"))
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    cum = vals.select(
        "event_type",
        "v",
        "c",
        F.sum("c").over(wcum).alias("cum_c"),
        F.sum("c").over(wall).alias("n"),
    )
    med = (
        cum.filter(F.col("cum_c") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type")
        .agg(F.min("v").alias("med"), F.any_value("n").alias("n"))
    )
    dev = (
        vals.join(F.broadcast(med), "event_type")
        .groupBy("event_type", F.abs(F.col("v") - F.col("med")).alias("d"))
        .agg(
            F.sum("c").alias("c"),
            F.any_value("n").alias("n"),
            F.any_value("med").alias("med"),
        )
    )
    dwcum = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    dcum = dev.withColumn("cum_c", F.sum("c").over(dwcum))
    mad = (
        dcum.filter(F.col("cum_c") >= F.expr("(n + 1) div 2"))
        .groupBy("event_type")
        .agg(
            F.min("d").alias("mad"),
            F.any_value("med").alias("med"),
            F.any_value("n").alias("n"),
        )
    )
    return (
        dev.select("event_type", "d", "c")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "med", "mad", "n")
        .agg(
            F.coalesce(
                F.sum(F.when(F.abs(F.col("d")) > 3 * F.col("mad"), F.col("c"))),
                F.lit(0),
            )
            .cast("long")
            .alias("n_outliers")
        )
        .select(
            "event_type",
            F.col("med").cast("long").alias("med_cents"),
            F.col("mad").cast("long").alias("mad_cents"),
            F.col("n").cast("long").alias("n_events"),
            "n_outliers",
        )
    )
