"""Scale-posture operators as graded queries — the patterns that keep a
dim→fact pipeline viable at 100 TB, each proven oracle-exact at test SF:

- **Bloom-pruned semi-join** (`bloom_semi_revenue`): when the key set of
  a selective semi-join is too large to broadcast as a hash relation, a
  Bloom filter of it still fits in kilobytes. The fact scan drops
  non-matching rows BEFORE the shuffle; an exact semi-join over the
  survivors removes false positives. Oracle: the plain semi-join — the
  Bloom stage must be semantically invisible.
- **Salted distinct aggregation** (`events_distinct_users_salted`): a
  hot group key funnels its whole distinct-set into one task; routing
  values to salt buckets BY VALUE HASH keeps per-salt sets disjoint, so
  summing per-salt distinct counts is exact, spread over n_salts tasks.
- **CUBE grouping sets** (`cube_orders_status_year`): all four grain
  combinations in one pass over the fact (Spark expands grouping sets
  map-side; one shuffle total, not one per grain).
- **Entity masking** (`docs_entity_mask`): regex token redaction — the
  NER-lite scrub stage of a training-data pipeline — as a pure columnar
  regexp pass with per-source audit counts.

Reference parity: none of these exist in WatsonDedupe (its only join is
the IN-list chunk lookup, SqliteProvider.cs:333-355); engine-side
additions per SURVEY.md §2.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from watsondedupe_spark.operators.joins import bloom_semi_join
from watsondedupe_spark.operators.skew import salted_count_distinct
from watsondedupe_spark.queries import register
from watsondedupe_spark.queries.llm_pipeline import _docs
from watsondedupe_spark.sources import read_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_table(spark, sf_dir, name)


def _dec(col, scale=2):
    return F.col(col).cast(f"decimal(18,{scale})")


@register(
    "bloom_semi_revenue",
    """
SELECT l.l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
                (CAST(1 AS DECIMAL(18,2)) - CAST(l.l_discount AS DECIMAL(18,2)))
                AS DECIMAL(18,4))) AS DOUBLE) AS revenue
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_orderpriority = '1-URGENT')
GROUP BY l.l_returnflag
""",
    doc="Bloom-pruned semi-join: urgent-order keys folded into a ~16 KB "
    "bit array broadcast to the lineitem scan; exact semi-join over the "
    "survivors. Oracle is the plain semi-join (Bloom must be invisible).",
)
def bloom_semi_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    urgent = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pruned = bloom_semi_join(li, urgent, "l_orderkey", "o_orderkey")
    rev = (
        _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - _dec("l_discount"))
    ).cast("decimal(18,4)")
    return pruned.groupBy("l_returnflag").agg(
        F.count("*").alias("n_items"),
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(rev).cast("double").alias("revenue"),
    )


@register(
    "events_distinct_users_salted",
    """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events
GROUP BY event_type
""",
    doc="Salted two-phase COUNT(DISTINCT): values routed to salt buckets "
    "by value hash (disjoint per-salt sets; summing partials is exact), "
    "hot keys spread over n_salts tasks (operators/skew.py).",
)
def events_distinct_users_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return salted_count_distinct(ev, "event_type", "user_id", n_salts=16)


@register(
    "cube_orders_status_year",
    """
SELECT COALESCE(o_orderstatus, 'ALL') AS status,
       CAST(COALESCE(CAST(year(o_orderdate) AS INT), -1) AS INT) AS yr,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, year(o_orderdate))
""",
    doc="CUBE grouping sets: all four (status x year) grains in one "
    "shuffle (Catalyst expands grouping sets before the exchange).",
)
def cube_orders_status_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", F.year("o_orderdate").alias("_yr"))
        .agg(
            F.count("*").alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce(F.col("_yr"), F.lit(-1)).cast("int").alias("yr"),
            "n",
            "total",
        )
    )


@register(
    "docs_length_histogram",
    """
WITH b AS (SELECT MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM documents)
SELECT CAST(LEAST(((d.n_chars - b.lo) * 10) // (b.hi - b.lo + 1), 9) AS INT)
         AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(d.n_chars) AS BIGINT) AS min_chars,
       CAST(MAX(d.n_chars) AS BIGINT) AS max_chars
FROM documents d, b
GROUP BY 1
""",
    doc="Fixed-width 10-bucket length histogram (curriculum binning). "
    "Bounds come from a 1-row scalar-subquery broadcast, buckets from "
    "integer arithmetic — no global sort, unlike NTILE, so the shape "
    "survives any scale. Integer math keeps both engines bit-identical.",
)
def docs_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bounds = docs.agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.floor(
                    (F.col("n_chars") - F.col("lo"))
                    * F.lit(10)
                    / (F.col("hi") - F.col("lo") + 1)
                ),
                F.lit(9).cast("long"),
            )
            .cast("int")
            .alias("bucket"),
            "n_chars",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
    )


@register(
    "docs_token_freq_cms",
    """
SELECT t AS token,
       CAST(COUNT(*) AS BIGINT) AS true_count,
       TRUE AS overest_ok
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
WHERE t != ''
GROUP BY t
""",
    doc="Count-Min sketch over the token stream (functions/sketches.py): "
    "one shuffle bounded by depth*width cells regardless of corpus "
    "size; estimates probed for every distinct token via broadcast "
    "join. The sketch is xxhash64-internal, so the oracle checks the "
    "deterministic half of the CM contract per token: the exact count "
    "(both engines agree) and est >= truth (always, by construction — "
    "every occurrence of a token lands in its own counters). The "
    "probabilistic overestimate ENVELOPE (est <= truth + O(N/w), which "
    "a different corpus can legitimately violate for a few tokens) is "
    "asserted in pytest with a data-aware tolerance, not in the oracle.",
)
def docs_token_freq_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.functions.sketches import cm_estimate, cm_sketch

    width = 4096
    toks = _docs(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("token")
    ).filter(F.col("token") != "")
    sk = cm_sketch(toks, "token", depth=5, width=width)
    exact = toks.groupBy("token").agg(F.count("*").cast("long").alias("true_count"))
    est = cm_estimate(sk, exact, "token", depth=5, width=width)
    return est.select(
        "token",
        "true_count",
        (F.col("est_count") >= F.col("true_count")).alias("overest_ok"),
    )


_MASK_PATTERN = r"\b(customer|supplier|order|part)\b"


@register(
    "docs_entity_mask",
    """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(regexp_extract_all(text, '\\b(customer|supplier|order|part)\\b', 1))) AS BIGINT)
         AS total_masked,
       CAST(SUM(length(regexp_replace(text, '\\b(customer|supplier|order|part)\\b', '<ENT>', 'g'))) AS BIGINT)
         AS masked_chars
FROM documents
GROUP BY source
""",
    doc="Entity masking (NER-lite scrub): columnar regexp redaction with "
    "per-source audit counts — matched-token count and post-mask length "
    "prove the same rewrite happened on both engines.",
)
def docs_entity_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    masked = docs.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(_MASK_PATTERN), F.lit(1))).alias("_n"),
        F.length(F.regexp_replace("text", _MASK_PATTERN, "<ENT>")).alias("_len"),
    )
    return masked.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("_n").cast("long").alias("total_masked"),
        F.sum("_len").cast("long").alias("masked_chars"),
    )


@register(
    "docs_heavy_hitters",
    """
WITH toks AS (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents
),
t AS (SELECT token FROM toks WHERE token <> ''),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t),
counted AS (
    SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt FROM t GROUP BY token
)
SELECT c.token, c.cnt, tot.n_total
FROM counted c CROSS JOIN tot
WHERE c.cnt * 100 >= tot.n_total
""",
    doc="sketch-guided EXACT heavy hitters (tokens with >= 1% of stream "
    "mass): a Count-Min pass compresses the stream to a bounded cell "
    "table (one depth*width shuffle), the total mass is read off the "
    "sketch's d=0 row (no separate COUNT pass), and a broadcast probe "
    "of that row drops every token whose cell can't reach threshold "
    "BEFORE the exact groupBy — sound because CM only over-counts, so "
    "no true heavy hitter is ever pruned. The exact aggregate then runs "
    "on survivors only. At 100 TB this turns a full-vocabulary shuffle "
    "(billions of distinct n-grams, most of them singletons) into a "
    "shuffle of just the plausibly-heavy tail. Oracle is the naive "
    "GROUP BY ... HAVING form.",
)
def docs_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.functions.sketches import cm_prune_heavy, cm_sketch
    from watsondedupe_spark.queries.llm_pipeline import _docs_parallel

    toks = (
        _docs_parallel(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
    )
    sk = cm_sketch(toks, "token", depth=5, width=2048)
    tot = sk.filter(F.col("d") == 0).agg(F.sum("cnt").cast("long").alias("n_total"))
    items = toks.crossJoin(F.broadcast(tot))
    # ceil(n/100) <= cell  <=>  cell * 100 >= n  (integers)
    pruned = cm_prune_heavy(
        items, "token", sk, F.expr("(n_total + 99) div 100"), width=2048
    )
    return (
        pruned.groupBy("token")
        .agg(F.count("*").cast("long").alias("cnt"), F.any_value("n_total").alias("n_total"))
        .filter(F.col("cnt") * 100 >= F.col("n_total"))
    )


@register(
    "docs_lm_quality",
    """
WITH tok AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents
),
tok2 AS (SELECT doc_id, t FROM tok WHERE t != ''),
freq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cf FROM tok2 GROUP BY t),
per_doc AS (
    SELECT k.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(f.cf) AS BIGINT) AS freq_sum
    FROM tok2 k JOIN freq f ON k.t = f.t
    GROUP BY k.doc_id
)
SELECT doc_id, n_tokens,
       CAST(freq_sum AS DOUBLE) / n_tokens AS avg_token_freq
FROM per_doc
""",
    doc="unigram-LM quality proxy (the frequency-based stage of a "
    "curation recipe, cf. CCNet's LM filtering): per-document average "
    "corpus frequency of its tokens — boilerplate scores high, noise "
    "scores low, and downstream filters cut both tails. Two shuffles "
    "total (corpus token counts, then per-doc aggregation), both with "
    "map-side partial aggregation; the frequency join shuffles on the "
    "token key so cost scales with the token stream, never pairs. "
    "Exact-integer sums with ONE final double division keep the score "
    "bit-identical to the oracle.",
)
def docs_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.split("text", " ")).alias("t"))
        .filter(F.col("t") != "")
    )
    freq = toks.groupBy("t").agg(F.count("*").cast("long").alias("cf"))
    return (
        toks.join(freq, "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("cf").cast("long").alias("freq_sum"),
        )
        .select(
            "doc_id",
            "n_tokens",
            (F.col("freq_sum").cast("double") / F.col("n_tokens")).alias("avg_token_freq"),
        )
    )


# ---------------------------------------------------------------------------
# Z-order layout math, graded (round 6): the Morton interleave the
# clustered writer (sinks/zorder.py) ranges/sorts on is pure static bit
# arithmetic, so the oracle recomputes every code — an interleave that
# drops a bit, misorders dimensions, or overflows hash-mismatches. The
# physical write path (range partition + in-file sort + footer-stat
# pruning) stays pinned in test_zorder; this grades the curve itself.
# ---------------------------------------------------------------------------

_Z_BITS = 12


def _morton_sql(x: str, y: str, bits: int) -> str:
    parts = []
    for b in range(bits):
        parts.append(f"((({x} >> {b}) & 1) << {2 * b})")
        parts.append(f"((({y} >> {b}) & 1) << {2 * b + 1})")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


@register(
    "zorder_morton_codes",
    f"""
WITH q AS (
    SELECT o_orderkey,
           o_orderkey % {1 << _Z_BITS} AS x,
           o_custkey % {1 << _Z_BITS} AS y
    FROM orders
)
SELECT o_orderkey, CAST(x AS BIGINT) AS x, CAST(y AS BIGINT) AS y,
       {_morton_sql('x', 'y', _Z_BITS)} AS zvalue
FROM q
""",
    doc="the Z-order clustered writer's Morton curve, hash-gated: "
    "interleave 12 bits of two order dimensions into one code with "
    "static shift/mask arithmetic (sinks/zorder.py::zvalue — all "
    "whole-stage codegen, no UDF; disjoint bit positions make the OR "
    "fold equal the oracle's sum). This is the layout key Delta's "
    "OPTIMIZE ZORDER BY produces; range-partitioning on it gives every "
    "output file a tight bounding box in BOTH dimensions so parquet "
    "footer stats prune on either predicate.",
)
def zorder_morton_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.sinks.zorder import zvalue

    q = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_orderkey") % (1 << _Z_BITS)).cast("long").alias("x"),
        (F.col("o_custkey") % (1 << _Z_BITS)).cast("long").alias("y"),
    )
    return q.select("o_orderkey", "x", "y", zvalue(["x", "y"], bits=_Z_BITS))


# ---------------------------------------------------------------------------
# Custom Python Data Source connector, graded end to end (round 6): the
# blobgen source's md5-counter-mode keystream is SQL-reconstructible, so
# the oracle regenerates every payload byte-for-byte — partition
# planning, worker-side generation, planted-duplicate logic, and
# cross-partition determinism all sit under the hash gate.
# ---------------------------------------------------------------------------

_BG_N, _BG_BYTES, _BG_DUP = 2000, 1024, 10  # 1024 B = exactly 64 md5 blocks


def _bg_keystream_sql(src: str) -> str:
    terms = " || ".join(
        f"md5('blobgen:' || {src} || ':{k}')" for k in range(_BG_BYTES // 16)
    )
    return terms


@register(
    "blobgen_source_audit",
    f"""
WITH ids AS (
    SELECT unnest(generate_series(0, {_BG_N - 1})) AS id
),
src AS (
    SELECT id,
           (id % {_BG_DUP} = 0 AND id > 0) AS is_dup,
           CASE WHEN id % {_BG_DUP} = 0 AND id > 0 THEN 0 ELSE id END AS s
    FROM ids
)
SELECT id,
       'blob/' || lpad(CAST(id AS VARCHAR), 8, '0') AS object_key,
       is_dup,
       CAST({_BG_BYTES} AS BIGINT) AS n_bytes,
       md5({_bg_keystream_sql('s')}) AS payload_hexmd5
FROM src
""",
    doc="the Spark 4 Python Data Source connector (sources/blobgen.py, "
    "SPARK-44076) graded end to end: the source's range partitions "
    "generate content-seeded payloads worker-side, and because the "
    "payload is an md5 counter-mode keystream the oracle regenerates "
    "every byte in SQL (64 md5 blocks concatenated in hex) — a "
    "connector that mis-splits ranges, drops rows, breaks the planted-"
    "duplicate rule, or produces partition-dependent bytes "
    "hash-mismatches. Payloads are compared as md5-of-hex so the graded "
    "rows stay narrow.",
)
def blobgen_source_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.sources.blobgen import BlobGenDataSource

    try:
        spark.dataSource.register(BlobGenDataSource)
    except Exception:
        pass  # already registered in this session
    df = (
        spark.read.format("blobgen")
        .option("n", _BG_N)
        .option("parts", 16)
        .option("blob_bytes", _BG_BYTES)
        .option("dup_every", _BG_DUP)
        .load()
    )
    return df.select(
        "id",
        "object_key",
        "is_dup",
        F.length("payload").cast("long").alias("n_bytes"),
        F.md5(F.lower(F.hex("payload"))).alias("payload_hexmd5"),
    )


@register(
    "udtf_chunk_spans",
    """
SELECT doc_id,
       CAST(i AS INT) AS position,
       CAST(i * 64 AS BIGINT) AS address,
       CAST(LEAST(64, length(text) - i * 64) AS INT) AS length
FROM documents,
     unnest(generate_series(0, CAST(ceil(length(text) / 64.0) AS BIGINT) - 1)) AS t(i)
WHERE length(text) > 0
""",
    doc="the Python UDTF extension surface graded from SQL: LATERAL "
    "chunk_spans(length(text), 64) expands every document into its "
    "fixed-size span layout worker-side (functions/udtfs.py::ChunkSpans "
    "— SPARK-43797 table functions), and the oracle recomputes the "
    "tiling arithmetic with a per-row generate_series. A UDTF that "
    "drops the tail span, misnumbers positions, or leaks across rows "
    "hash-mismatches. (The expression-only twin used at scale is "
    "pinned against this same logic in tests.)",
)
def udtf_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.functions.udtfs import register_udtfs

    register_udtfs(spark)
    _docs(spark, sf_dir).createOrReplaceTempView("___docs_for_udtf")
    return spark.sql(
        "SELECT doc_id, s.position, s.address, s.length "
        "FROM ___docs_for_udtf, LATERAL chunk_spans(length(text), 64) s"
    )


# ---------------------------------------------------------------------------
# storage maintenance: small-file compaction planner
# ---------------------------------------------------------------------------

_COMPACT_TARGET = 2000  # bytes per output file (scaled to the sf0.01 corpus)


@register(
    "docs_compaction_plan",
    f"""
WITH sized AS (
    SELECT source, doc_id, n_chars,
           COALESCE(SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS pfx
    FROM documents
)
SELECT source,
       CAST(floor(pfx / {_COMPACT_TARGET}) AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(n_chars) AS BIGINT) AS total_bytes,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc,
       CAST(MAX(doc_id) AS BIGINT) AS last_doc,
       CAST(SUM(n_chars) AS DOUBLE) / {_COMPACT_TARGET} AS fill_ratio
FROM sized
GROUP BY source, CAST(floor(pfx / {_COMPACT_TARGET}) AS BIGINT)
""",
    doc="small-file compaction planner (the OPTIMIZE/bin-packing step "
    "every 100 TB table needs): within each partition (source), files "
    "in id order are assigned to output bins by floor(exclusive-"
    "prefix-bytes / target) — the deterministic cumulative-quota "
    "binning Delta/Iceberg compactors use, where a file joins the bin "
    "its start offset falls in (bins may overshoot by at most one "
    "file; never undershoot below target except the tail). Pure "
    "metadata arithmetic: one window + one agg, both partitioned by "
    "source, so the plan never touches file CONTENTS and shuffles "
    "only the file listing — at 100 TB that is millions of rows of "
    "metadata, not the bytes",
)
def docs_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = _docs(spark, sf_dir).select(
        "source",
        "doc_id",
        "n_chars",
        F.coalesce(F.sum("n_chars").over(w), F.lit(0)).alias("pfx"),
    )
    return (
        sized.withColumn(
            "bin", F.floor(F.col("pfx") / _COMPACT_TARGET).cast("long")
        )
        .groupBy("source", "bin")
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.sum("n_chars").cast("long").alias("total_bytes"),
            F.min("doc_id").cast("long").alias("first_doc"),
            F.max("doc_id").cast("long").alias("last_doc"),
            (F.sum("n_chars").cast("double") / _COMPACT_TARGET).alias("fill_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# boilerplate/template detection via shared token prefixes
# ---------------------------------------------------------------------------

_BP_K = 3  # prefix length in tokens


@register(
    "docs_boilerplate_prefixes",
    f"""
SELECT prefix,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(doc_id) AS BIGINT) AS min_doc
FROM (
    SELECT doc_id, source, n_chars,
           array_to_string(string_split(text, ' ')[1:{_BP_K}], ' ') AS prefix
    FROM documents
)
GROUP BY prefix HAVING COUNT(*) >= 2
""",
    doc="boilerplate/template detection: documents grouped by their "
    "first-3-token prefix; any prefix shared by >=2 docs is a template "
    "candidate (the header/banner screen run before near-dup, because "
    "shared boilerplate inflates every pairwise similarity and a "
    "prefix group is O(1) to strip). Cross-source counts separate "
    "site-wide templates from corpus-wide ones. One row-local prefix "
    "projection + one prefix-keyed agg — at 100 TB this is the "
    "cheapest dedup-adjacent screen there is (no pairs, no shingles; "
    "the prefix IS the blocking key).",
)
def docs_boilerplate_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    pre = _docs(spark, sf_dir).select(
        "doc_id",
        "source",
        "n_chars",
        F.array_join(F.slice(F.split("text", " "), 1, _BP_K), " ").alias("prefix"),
    )
    return (
        pre.groupBy("prefix")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.count_distinct("source").cast("long").alias("n_sources"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").cast("long").alias("min_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
