"""Round-4 batch 2: retrieval / tokenizer-induction / audit operators.

The next ring of operators a large-scale training-data + RAG pipeline
needs, each oracle-exact vs DuckDB under the house portability rules
(md5 hashes, quantized-integer vector math, fixed-order IEEE doubles,
integer threshold comparisons instead of float ones):

- hybrid retrieval with reciprocal-rank fusion (BM25 arm + embedding
  cosine arm, fused on bounded top-K candidate lists — the shape every
  RAG stack runs; the N-arm multi-query operator form is
  ``operators.joins.rrf_fuse``);
- CCNet-style per-language quality bucketing (head / middle / tail) on
  the unigram-LM score;
- BPE tokenizer training: merge-candidate pair scoring AND a fully
  graded one-round merge application (the multi-round trainer lives in
  ``operators.text.bpe_train``);
- winnowing fingerprints (Schleimer et al., SIGMOD'03 — the MOSS local
  fingerprinting algorithm) with per-document windows, plus the
  detection stage: an inverted-index candidate-pair join over the
  selected prints;
- per-dimension embedding distribution stats (the feature-normalization
  audit run before training retrievers);
- near-dup threshold sweep: pair/doc-drop counts at several Jaccard
  cutoffs in ONE pass over the cached candidate-pair substrate (the
  tuning curve that decides a dedup threshold before a 100 TB run);
- a sampled dup-rate estimate (md5-gated both-endpoint sampling, x1/p^2
  scale-up) graded beside the exact count as an accuracy audit;
- ANN recall audit: recall@k of the LSH-bucketed approximate top-k
  against the exact quantized-cosine top-k — the accuracy contract a
  100 TB deployment checks on a sample before trusting the index;
- the large-star/small-star connected-components variant graded against
  the same recursive-CTE oracle as the min-label query;
- per-doc n-gram novelty and per-source duplication audits (corpus
  contribution + provenance-level quality readouts);
- rendezvous / highest-random-weight shard routing with its
  reshard-stability audit (grow the fleet n -> n+1, move ~1/(n+1)).

Reference parity: none of these exist in WatsonDedupe (SURVEY.md §2.2);
they extend the LLM-pipeline surface the same way ``pipeline_ext`` and
``curation_ext`` do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from watsondedupe_spark.queries import _REGISTRY, register
from watsondedupe_spark.queries.curation_ext import _icos_sql

# imported for registration side effects: the recall audit composes the
# already-registered exact-kNN and LSH-ANN oracles (alphabetical import
# order in all_queries() guarantees both precede this module anyway;
# the explicit imports make the dependency local and order-proof)
from watsondedupe_spark.queries import engine_native  # noqa: F401  (emb_ann_topk_lsh)
from watsondedupe_spark.queries.llm_pipeline import (
    _SHINGLES_SQL,
    _docs,
    _docs_parallel,
    _emb,
    _quant_vec,
    jaccard_pair_stats_df,
)
from watsondedupe_spark.queries.pipeline_ext import (
    _BM25_TERMS,
    _bm25_term_sql,
    docs_bm25_lite,
)

# ---------------------------------------------------------------------------
# hybrid retrieval: BM25 arm + embedding arm, reciprocal-rank fusion
# ---------------------------------------------------------------------------

_RRF_K = 60  # the standard RRF damping constant (Cormack et al. 2009)
_RRF_TOPK = 50  # candidate-list depth per arm
_RRF_QUERY_VEC = 0  # vec_id of the probe embedding

_QUANT_LIST = "list_transform({x}, v -> CAST(floor(CAST(v AS DOUBLE) * 1000 + 0.5) AS BIGINT))"


def _rrf_oracle() -> str:
    bm25_tf = ",".join(
        f"""
           CAST(len(list_filter(string_split(text, ' '), x -> x = '{t}')) AS BIGINT) AS tf_{t}"""
        for t in _BM25_TERMS
    )
    bm25_df = ",".join(
        f"""
           CAST(SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_{t}"""
        for t in _BM25_TERMS
    )
    return f"""
WITH tf AS (
    SELECT doc_id,{bm25_tf}
    FROM documents
),
stats AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,{bm25_df}
    FROM tf
),
lex AS (
    SELECT doc_id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS INTEGER) AS lex_rnk
    FROM (
        SELECT t.doc_id, {" + ".join(_bm25_term_sql(t) for t in _BM25_TERMS)} AS score
        FROM tf t CROSS JOIN stats s
    )
    ORDER BY lex_rnk LIMIT {_RRF_TOPK}
),
qvec AS (
    SELECT {_QUANT_LIST.format(x="embedding")} AS qv
    FROM embeddings WHERE vec_id = {_RRF_QUERY_VEC}
),
sem AS (
    SELECT vec_id AS doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY csim DESC, vec_id) AS INTEGER) AS sem_rnk
    FROM (
        SELECT e.vec_id, {_icos_sql("q.qv", "v")} AS csim
        FROM (
            SELECT vec_id, {_QUANT_LIST.format(x="embedding")} AS v
            FROM embeddings WHERE vec_id != {_RRF_QUERY_VEC}
        ) e CROSS JOIN qvec q
    )
    ORDER BY sem_rnk LIMIT {_RRF_TOPK}
)
SELECT COALESCE(l.doc_id, s.doc_id) AS doc_id, l.lex_rnk, s.sem_rnk,
       COALESCE(1.0 / ({_RRF_K} + l.lex_rnk), 0.0)
       + COALESCE(1.0 / ({_RRF_K} + s.sem_rnk), 0.0) AS rrf
FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
"""


@register(
    "docs_hybrid_rrf",
    _rrf_oracle(),
    doc="hybrid retrieval with reciprocal-rank fusion (RRF, Cormack et "
    "al. 2009): a lexical arm (log-free BM25 over the query terms) and a "
    "semantic arm (quantized-integer cosine to a probe embedding) each "
    "produce a bounded top-K candidate list via distributed TakeOrdered "
    "(orderBy().limit(K) — never a global rank window over the corpus); "
    "ranks are then assigned on the <=K survivors and fused with "
    "1/(60+rank) in fixed IEEE order. The full-outer fusion join touches "
    "at most 2K rows regardless of corpus size — the 100 TB shape: "
    "candidate generation is distributed and index-backed, fusion is "
    "driver-cheap and exact.",
)
def docs_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    # lexical arm: BM25 scores (broadcast corpus stats), then top-K via
    # TakeOrdered; the rank window runs over the <=K survivors only
    lex_top = (
        docs_bm25_lite(spark, sf_dir)
        .select("doc_id", "score")
        .orderBy(F.desc("score"), "doc_id")
        .limit(_RRF_TOPK)
    )
    wl = Window.orderBy(F.desc("score"), "doc_id")
    lex = lex_top.select(
        "doc_id", F.row_number().over(wl).cast("int").alias("lex_rnk")
    )

    # semantic arm: 1-row quantized probe vector broadcast to every
    # candidate row; integer dot/norms fold JVM-side inside codegen
    emb = _emb(spark, sf_dir).select("vec_id", _quant_vec().alias("v"))
    qvec = (
        emb.filter(F.col("vec_id") == _RRF_QUERY_VEC)
        .select(F.col("v").alias("qv"))
    )

    def idot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x
        )

    csim = (
        idot("qv", "v").cast("double")
        / F.sqrt(idot("qv", "qv").cast("double"))
        / F.sqrt(idot("v", "v").cast("double"))
    )
    sem_top = (
        emb.filter(F.col("vec_id") != _RRF_QUERY_VEC)
        .crossJoin(F.broadcast(qvec))
        .select(F.col("vec_id").alias("doc_id"), csim.alias("csim"))
        .orderBy(F.desc("csim"), "doc_id")
        .limit(_RRF_TOPK)
    )
    ws = Window.orderBy(F.desc("csim"), "doc_id")
    sem = sem_top.select(
        "doc_id", F.row_number().over(ws).cast("int").alias("sem_rnk")
    )

    rrf = F.coalesce(
        F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("lex_rnk")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("sem_rnk")), F.lit(0.0))
    return lex.join(sem, "doc_id", "full_outer").select(
        "doc_id", "lex_rnk", "sem_rnk", rrf.alias("rrf")
    )


# ---------------------------------------------------------------------------
# CCNet-style quality buckets: head / middle / tail per language
# ---------------------------------------------------------------------------


@register(
    "docs_quality_buckets",
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
),
scored AS (
    SELECT d.doc_id, d.lang, p.n_tokens,
           CAST(p.freq_sum AS DOUBLE) / p.n_tokens AS avg_token_freq
    FROM per_doc p JOIN documents d ON d.doc_id = p.doc_id
)
SELECT doc_id, lang, n_tokens, avg_token_freq,
       CAST(bucket AS INTEGER) AS bucket,
       CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier
FROM (
    SELECT *, NTILE(3) OVER (PARTITION BY lang
                             ORDER BY avg_token_freq DESC, doc_id) AS bucket
    FROM scored
)
""",
    doc="CCNet-style quality bucketing (Wenzek et al. 2020): the unigram-"
    "LM score (docs_lm_quality's exact-integer form) split into head / "
    "middle / tail tertiles PER LANGUAGE via ntile — the partition key "
    "is the language, so the sort is per-lang range-partitioned, never "
    "global. At 100 TB the production variant replaces ntile with "
    "broadcast approx-quantile cutoffs (two scans, no sort at all); the "
    "exact tertile form here is what the oracle can check bit-for-bit. "
    "Ordering carries a doc_id tiebreak so the tertile boundary is "
    "deterministic on both engines.",
)
def docs_quality_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("t")).filter(
        F.col("t") != ""
    )
    freq = toks.groupBy("t").agg(F.count("*").cast("long").alias("cf"))
    per_doc = (
        toks.join(freq, "t")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("cf").cast("long").alias("freq_sum"),
        )
    )
    scored = per_doc.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        "n_tokens",
        (F.col("freq_sum").cast("double") / F.col("n_tokens")).alias("avg_token_freq"),
    )
    w = Window.partitionBy("lang").orderBy(F.desc("avg_token_freq"), "doc_id")
    bucket = F.ntile(3).over(w)
    tier = (
        F.when(F.col("bucket") == 1, "head")
        .when(F.col("bucket") == 2, "middle")
        .otherwise("tail")
    )
    return scored.select(
        "doc_id", "lang", "n_tokens", "avg_token_freq", bucket.cast("int").alias("bucket")
    ).select("doc_id", "lang", "n_tokens", "avg_token_freq", "bucket", tier.alias("tier"))


# ---------------------------------------------------------------------------
# BPE first-merge pair scoring (tokenizer induction)
# ---------------------------------------------------------------------------

_BPE_TOPK = 32


@register(
    "docs_bpe_pair_scores",
    f"""
WITH w AS (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
wf AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM w WHERE word != '' AND len(word) >= 2
    GROUP BY word
),
p AS (
    SELECT word, freq,
           unnest(list_transform(generate_series(1, len(word)-1),
                                 i -> substr(word, CAST(i AS INTEGER), 2))) AS pair
    FROM wf
)
SELECT pair,
       CAST(SUM(freq) AS BIGINT) AS pair_count,
       CAST(COUNT(DISTINCT word) AS BIGINT) AS n_types
FROM p GROUP BY pair
ORDER BY pair_count DESC, pair LIMIT {_BPE_TOPK}
""",
    doc="BPE merge-candidate scoring (Sennrich et al. 2016, one round): "
    "corpus word frequencies (one vocab-bounded shuffle — the word "
    "stream collapses to distinct types BEFORE the pair explode, so the "
    "expensive fan-out runs over the vocabulary, not the token stream), "
    "then adjacent character-pair occurrences weighted by word "
    "frequency, top-K by count via distributed TakeOrdered with a "
    "deterministic pair tiebreak. This is exactly the argmax a BPE "
    "trainer takes per merge; at 100 TB the vocab table is MBs and "
    "every subsequent merge round reuses it.",
)
def docs_bpe_pair_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _docs_parallel(spark, sf_dir).select(
        F.explode(F.split("text", " ")).alias("word")
    )
    wf = (
        words.filter((F.col("word") != "") & (F.char_length("word") >= 2))
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    # sequence(1, n-1) is safe: len >= 2 is already enforced, so the
    # descending-step surprise of sequence(1, 0) can't occur
    pairs = wf.select(
        "word",
        "freq",
        F.explode(
            F.expr("transform(sequence(1, char_length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("freq").cast("long").alias("pair_count"),
            F.count_distinct("word").cast("long").alias("n_types"),
        )
        .orderBy(F.desc("pair_count"), "pair")
        .limit(_BPE_TOPK)
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (Schleimer et al., SIGMOD'03)
# ---------------------------------------------------------------------------

_WIN_K = 8  # character k-gram length
_WIN_W = 4  # winnowing window (consecutive k-grams)
# 2^22: positions pack below the 40-bit gram hash (comb = h*2^22 + pos
# < 2^62, int64-safe). Docs at/above this length are excluded EXPLICITLY
# in both engines — packed-key corruption for over-long docs was silent.
_POS_BASE = 4_194_304


@register(
    "docs_winnowing",
    f"""
WITH g AS (
    SELECT doc_id,
           unnest(generate_series(1, len(text) - {_WIN_K - 1})) AS pos,
           unnest(list_transform(generate_series(1, len(text) - {_WIN_K - 1}),
                  i -> CAST(('0x' || substr(md5(substr(text, CAST(i AS INTEGER), {_WIN_K})), 1, 10)) AS BIGINT))) AS h,
           len(text) - {_WIN_K - 1} AS n_grams
    FROM documents WHERE len(text) >= {_WIN_K} AND len(text) < {_POS_BASE}
),
m AS (
    SELECT doc_id, pos, n_grams, h * {_POS_BASE} + pos AS comb FROM g
),
sel AS (
    SELECT doc_id, pos, n_grams,
           MIN(comb) OVER (PARTITION BY doc_id ORDER BY pos
                           ROWS BETWEEN CURRENT ROW AND {_WIN_W - 1} FOLLOWING) AS fp
    FROM m
)
SELECT DISTINCT doc_id,
       CAST(fp % {_POS_BASE} AS BIGINT) AS sel_pos,
       CAST(fp // {_POS_BASE} AS BIGINT) AS gram_hash
FROM sel WHERE pos <= n_grams - {_WIN_W - 1}
""",
    doc="winnowing fingerprint selection (Schleimer et al. SIGMOD'03, "
    "the MOSS algorithm): 40-bit md5 hashes of character 8-grams; every "
    "window of 4 consecutive grams selects its minimal hash, and the "
    "distinct selected (position, hash) set is the document fingerprint "
    "— guaranteeing any shared substring of length >= k+w-1 = 11 "
    "produces a shared fingerprint. The min is taken over a packed "
    "(hash << 22) | pos key, so ties break to the LEFTMOST position "
    "(deterministic variant of the paper's rightmost rule — documented "
    "deviation, identical guarantees). Window is partitioned per "
    "document and ordered by position: embarrassingly parallel, no "
    "global sort, no shuffle wider than the doc key.",
)
def docs_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    sel = _winnow_sel(spark, sf_dir)
    return sel.distinct().select(
        "doc_id",
        (F.col("fp") % _POS_BASE).cast("long").alias("sel_pos"),
        F.expr(f"fp div {_POS_BASE}").cast("long").alias("gram_hash"),
    )


def _winnow_sel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-distinct winnowing selection: one packed (hash, pos) min per
    window position, as ``(doc_id, fp)`` rows. Shared by the
    fingerprint query (which dedups at (doc_id, fp) grain) and the
    pairs query (which only needs (doc_id, gram_hash) grain — composing
    the finished fingerprint query there paid a second full distinct
    shuffle over the fingerprint stream for nothing)."""
    grams = (
        _docs_parallel(spark, sf_dir)
        .filter(
            (F.char_length("text") >= _WIN_K)
            # explicit doc-length cap: pos must stay below the pack base
            # or the min-key ordering silently corrupts (both engines
            # filter identically, so exclusion is visible, not silent)
            & (F.char_length("text") < _POS_BASE)
        )
        .select(
            "doc_id",
            (F.char_length("text") - (_WIN_K - 1)).alias("n_grams"),
            F.posexplode(
                F.expr(
                    f"transform(sequence(1, char_length(text) - {_WIN_K - 1}),"
                    f" i -> substring(text, i, {_WIN_K}))"
                )
            ).alias("pos0", "gram"),
        )
    )
    h = F.conv(F.substring(F.md5("gram"), 1, 10), 16, 10).cast("long")
    m = grams.select(
        "doc_id",
        "n_grams",
        (F.col("pos0") + 1).alias("pos"),
        (h * _POS_BASE + F.col("pos0") + 1).alias("comb"),
    )
    # the trailing-window filter applies AFTER the window min — a WHERE
    # before it would drop the last w-1 grams out of earlier frames
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _WIN_W - 1)
    return (
        m.select("doc_id", "pos", "n_grams", F.min("comb").over(w).alias("fp"))
        .filter(F.col("pos") <= F.col("n_grams") - (_WIN_W - 1))
        .select("doc_id", "fp")
    )


_WIN_MIN_SHARED = 3  # candidate pairs need >= this many shared prints
_WIN_STOP_PRINT = 50  # posting-list skew guard, as in the Jaccard build


def _winnowing_pairs_oracle() -> str:
    win_sql = _REGISTRY["docs_winnowing"].oracle
    return f"""
WITH prints AS (
    SELECT DISTINCT doc_id, gram_hash FROM ({win_sql}) w
),
rare AS (
    SELECT gram_hash FROM prints GROUP BY gram_hash
    HAVING COUNT(*) <= {_WIN_STOP_PRINT}
),
pr AS (SELECT p.doc_id, p.gram_hash FROM prints p JOIN rare USING (gram_hash))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared
FROM pr a JOIN pr b ON a.gram_hash = b.gram_hash AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {_WIN_MIN_SHARED}
"""


@register(
    "docs_winnowing_pairs",
    _winnowing_pairs_oracle(),
    doc="winnowing-based near-dup candidates — the detection stage the "
    "fingerprints exist to feed (MOSS's pipeline): documents sharing "
    f">= {_WIN_MIN_SHARED} distinct selected gram hashes pair up via an "
    "inverted index over the fingerprint table (the same posting-list "
    "shape as the Jaccard build: a stop-print cutoff bounds each list, "
    "so pair expansion is bounded and the corpus never self-joins on "
    "content). Character-level winnowing complements the word-3-gram "
    "MinHash path: it catches shared substrings word-shingles miss "
    "(editing, concatenation, code). The oracle composes the graded "
    "fingerprint query's SQL verbatim.",
)
def docs_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r12 (guide §2.4): dedup ONCE at (doc_id, gram_hash) grain straight
    # off the pre-distinct selection — composing the finished
    # fingerprint query here paid an extra full distinct shuffle at
    # (doc_id, pos, hash) grain whose position column this query
    # immediately discards. Same distinct hash set, one shuffle fewer.
    prints = (
        _winnow_sel(spark, sf_dir)
        .select("doc_id", F.expr(f"fp div {_POS_BASE}").cast("long").alias("gram_hash"))
        .distinct()
    )
    posting = (
        prints.groupBy("gram_hash")
        .agg(F.sort_array(F.collect_set("doc_id")).alias("ds"))
        .filter(F.size("ds") <= _WIN_STOP_PRINT)
    )
    pair_structs = F.flatten(
        F.transform(
            F.sequence(F.lit(0), F.size("ds") - 2),
            lambda i: F.transform(
                F.sequence(i + 1, F.size("ds") - 1),
                lambda j: F.struct(F.get("ds", i).alias("a"), F.get("ds", j).alias("b")),
            ),
        )
    )
    return (
        posting.filter(F.size("ds") >= 2)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.a").alias("doc_a"), F.col("p.b").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= _WIN_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# per-dimension embedding stats (feature-normalization audit)
# ---------------------------------------------------------------------------


@register(
    "emb_dim_stats",
    """
WITH dims AS (SELECT unnest(generate_series(1, 64)) AS i),
q AS (
    SELECT e.vec_id, d.i AS dim,
           CAST(floor(CAST(list_extract(e.embedding, CAST(d.i AS INTEGER)) AS DOUBLE) * 1000 + 0.5) AS BIGINT) AS v
    FROM embeddings e CROSS JOIN dims d
)
SELECT CAST(dim AS BIGINT) AS dim,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(MIN(v) AS BIGINT) AS min_q,
       CAST(MAX(v) AS BIGINT) AS max_q,
       CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mean_q,
       CAST(COUNT(*) * SUM(v*v) - SUM(v) * SUM(v) AS DOUBLE)
       / CAST(COUNT(*) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS var_q
FROM q GROUP BY dim
""",
    doc="per-dimension embedding distribution audit (the normalization "
    "check run before training a retriever): quantized values posexplode "
    "to (dim, v) and ONE partial-aggregated groupBy(dim) — 64 groups — "
    "computes count / min / max / mean / population variance with exact "
    "int64 sums and a fixed-order double division at the end, so both "
    "engines emit identical bits. Exactness bound: the raw sums stay "
    "int64-exact to ~10^9 vectors at this quantization, but the packed "
    "variance NUMERATOR n*sum(v^2) - sum(v)^2 overflows int64 around "
    "n ~ 3x10^6 (n*s2 grows as n^2*E[v^2] with E[v^2] ~ 10^6); past "
    "that, compute "
    "variance as s2/n - (s1/n)^2 in doubles instead of the packed "
    "integer form. At 100 TB this is a map-side combine into 64 rows — "
    "network cost is nil.",
)
def emb_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _emb(spark, sf_dir).select(
        F.posexplode(_quant_vec()).alias("pos0", "v")
    ).select((F.col("pos0") + 1).cast("long").alias("dim"), "v")
    n = F.count("*")
    s1 = F.sum("v")
    s2 = F.sum(F.col("v") * F.col("v"))
    return q.groupBy("dim").agg(
        n.cast("long").alias("n_vecs"),
        F.min("v").cast("long").alias("min_q"),
        F.max("v").cast("long").alias("max_q"),
        (s1.cast("double") / n).alias("mean_q"),
        ((n * s2 - s1 * s1).cast("double") / n.cast("double") / n.cast("double")).alias(
            "var_q"
        ),
    )


# ---------------------------------------------------------------------------
# near-dup threshold sweep (the dedup tuning curve)
# ---------------------------------------------------------------------------

_SWEEP_THRESHOLDS = (50, 60, 70, 80, 90)  # Jaccard x100, integer-exact
_STOP_SHINGLE_MAX = 50  # same skew guard as docs_jaccard_pairs


@register(
    "docs_dedup_threshold_sweep",
    f"""
WITH {_SHINGLES_SQL.strip()},
rare AS (
    SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {_STOP_SHINGLE_MAX}
),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM shr GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
    FROM shr x JOIN shr y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
),
j AS (
    SELECT i.doc_a, i.doc_b, i.n_common, sa.sz + sb.sz - i.n_common AS un
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
),
thr AS (SELECT unnest({list(_SWEEP_THRESHOLDS)}) AS thr)
SELECT CAST(t.thr AS INTEGER) AS thr,
       CAST(SUM(CASE WHEN j.n_common * 100 >= t.thr * j.un THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT CASE WHEN j.n_common * 100 >= t.thr * j.un THEN j.doc_b END) AS BIGINT) AS n_docs_dropped
FROM j CROSS JOIN thr t GROUP BY t.thr
""",
    doc="dedup threshold tuning curve: exact Jaccard candidate pairs "
    "(the docs_jaccard_pairs inverted-index shape — posting lists "
    "bounded by the stop-shingle cutoff, pair expansion row-local, "
    "never a corpus self-join) swept against 5 cutoffs in ONE pass: "
    "each threshold's pair count and greedy doc-drop count (distinct "
    "higher-id doc per passing pair) come from conditional aggregates "
    "over a broadcast 5-row threshold table. The comparison is "
    "100*intersection >= thr*union — pure int64, no float thresholds "
    "anywhere, so the curve is bit-exact on both engines. This is the "
    "curve a curation team reads before committing a threshold to a "
    "100 TB dedup run.",
)
def docs_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the pair substrate is the cached shared build (llm_pipeline.
    # jaccard_pair_stats_df) — the sweep reads the same materialized
    # candidate table docs_jaccard_pairs does instead of re-shuffling
    # the shingle stream
    j = jaccard_pair_stats_df(spark, sf_dir)
    thr = spark.createDataFrame([(t,) for t in _SWEEP_THRESHOLDS], "thr int")
    passes = F.col("n_common") * 100 >= F.col("thr") * F.col("un")
    return (
        j.crossJoin(F.broadcast(thr))
        .groupBy(F.col("thr").cast("int").alias("thr"))
        .agg(
            F.sum(F.when(passes, 1).otherwise(0)).cast("long").alias("n_pairs"),
            F.count_distinct(F.when(passes, F.col("doc_b"))).cast("long").alias(
                "n_docs_dropped"
            ),
        )
    )


# ---------------------------------------------------------------------------
# connected components, large-star/small-star variant (graded directly)
# ---------------------------------------------------------------------------


def _star_cluster_oracle() -> str:
    # identical answer contract to docs_dup_clusters — connected
    # components are algorithm-independent, so the same recursive-CTE
    # transitive closure grades BOTH implementations
    return _REGISTRY["docs_dup_clusters"].oracle


@register(
    "docs_dup_clusters_star",
    _star_cluster_oracle(),
    doc="the same near-dup clustering answer computed by the alternating "
    "large-star/small-star algorithm (Kiveris et al. 2014) instead of "
    "min-label propagation: one groupBy per star step, O(log d) rounds "
    "instead of O(diameter) — the variant that keeps chain-shaped dup "
    "graphs (crawl splices) tractable at 100 TB. Driver-graded against "
    "the identical recursive-CTE oracle as docs_dup_clusters, so the "
    "two algorithms' equivalence is a graded contract, not just the "
    "pytest parity pin in test_operators.",
)
def docs_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.operators.dedupe import connected_components
    from watsondedupe_spark.queries.llm_pipeline import docs_minhash_pairs

    pairs = docs_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    nodes = _docs(spark, sf_dir).select(F.col("doc_id").cast("long").alias("doc_id"))
    cc = connected_components(
        pairs, nodes, node_col="doc_id", src_col="doc_a", dst_col="doc_b",
        algorithm="star",
    )
    return cc.select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


# ---------------------------------------------------------------------------
# sampled dup-rate estimate (survey before you commit the full run)
# ---------------------------------------------------------------------------

#: deterministic doc-sampling gate at rate 1/2 (first 8 md5 nibbles)
_DR_GATE_HEX = "80000000"


@register(
    "docs_dup_rate_estimate",
    f"""
WITH {_SHINGLES_SQL.strip()},
rare AS (
    SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {_STOP_SHINGLE_MAX}
),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM shr GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
    FROM shr x JOIN shr y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
),
px AS (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE i.n_common * 10 >= 4 * (sa.sz + sb.sz - i.n_common)
),
sampled AS (
    SELECT doc_id FROM documents
    WHERE substr(md5('dr:' || CAST(doc_id AS VARCHAR)), 1, 8) < '{_DR_GATE_HEX}'
),
e AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs_exact FROM px),
s AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs_sampled
    FROM px p
    JOIN sampled sa ON sa.doc_id = p.doc_a
    JOIN sampled sb ON sb.doc_id = p.doc_b
)
SELECT e.n_pairs_exact, s.n_pairs_sampled,
       CAST(s.n_pairs_sampled * 4 AS BIGINT) AS est_pairs,
       CAST(s.n_pairs_sampled * 4 AS DOUBLE) / NULLIF(e.n_pairs_exact, 0)
           AS est_over_exact
FROM e CROSS JOIN s
""",
    doc="sampled dup-rate estimate — the survey a curation team runs "
    "BEFORE committing a 100 TB dedup pass: a deterministic md5-gated "
    "1/2 sample of documents keeps a pair iff BOTH endpoints are "
    "sampled (probability p^2 = 1/4), so the sampled >= 0.4-Jaccard "
    "pair count x4 estimates the corpus total from a quarter of the "
    "pair work. Graded as an accuracy audit: the query reports estimate "
    "AND exact side by side (hash-gated sampling is deterministic, so "
    "both are reproducible on any engine); in production only the "
    "sampled arm runs, over a sample small enough to be cheap. The "
    "threshold compare is pure int64 (n_common*10 >= 4*union) on both "
    "engines. Reads the cached pair substrate "
    "(llm_pipeline.jaccard_pair_stats_df).",
)
def docs_dup_rate_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    px = (
        jaccard_pair_stats_df(spark, sf_dir)
        .filter(F.col("n_common") * 10 >= 4 * F.col("un"))
        .select("doc_a", "doc_b")
    )
    gate = lambda c: F.substring(
        F.md5(F.concat(F.lit("dr:"), F.col(c).cast("string"))), 1, 8
    ) < _DR_GATE_HEX
    sampled_pairs = px.filter(gate("doc_a") & gate("doc_b"))
    e = px.agg(F.count("*").cast("long").alias("n_pairs_exact"))
    s = sampled_pairs.agg(F.count("*").cast("long").alias("n_pairs_sampled"))
    est = (F.col("n_pairs_sampled") * 4).cast("long")
    ratio = est.cast("double") / F.nullif(
        F.col("n_pairs_exact"), F.lit(0).cast("long")
    )
    return (
        e.crossJoin(F.broadcast(s))
        .select(
            "n_pairs_exact",
            "n_pairs_sampled",
            est.alias("est_pairs"),
            ratio.alias("est_over_exact"),
        )
    )


# ---------------------------------------------------------------------------
# rendezvous (HRW) shard routing + reshard-stability audit
# ---------------------------------------------------------------------------

_HRW_OLD, _HRW_NEW = 16, 17


@register(
    "docs_rendezvous_reshard",
    f"""
WITH sh AS (SELECT unnest(generate_series(0, {_HRW_NEW - 1})) AS s),
k AS (
    SELECT d.doc_id, sh.s,
           md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(sh.s AS VARCHAR))
           || lpad(CAST(sh.s AS VARCHAR), 2, '0') AS kd
    FROM documents d CROSS JOIN sh
),
a_old AS (
    SELECT doc_id, CAST(arg_max(s, kd) AS INTEGER) AS shard_old
    FROM k WHERE s < {_HRW_OLD} GROUP BY doc_id
),
a_new AS (
    SELECT doc_id, CAST(arg_max(s, kd) AS INTEGER) AS shard_new
    FROM k GROUP BY doc_id
)
SELECT o.shard_old AS shard,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN o.shard_old != n.shard_new THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
       CAST(SUM(CASE WHEN o.shard_old != n.shard_new THEN 1 ELSE 0 END) AS DOUBLE)
       / COUNT(*) AS moved_ratio
FROM a_old o JOIN a_new n USING (doc_id)
GROUP BY o.shard_old
""",
    doc="rendezvous / highest-random-weight shard routing (Thaler & "
    "Ravishankar 1998) and its reshard-stability audit: every doc "
    "routes to the shard maximizing md5(doc:shard), so growing the "
    f"fleet {_HRW_OLD}->{_HRW_NEW} moves only ~1/{_HRW_NEW} of docs — "
    "and every moved doc moves TO the new shard (pytest-pinned) — "
    "versus hash-mod routing, which reshuffles nearly everything. The "
    "argmax is ROW-LOCAL (array_max over a literal-size struct array "
    "inside codegen: no explode, no shuffle until the 16-group rollup); "
    "the weight key carries a lpad(shard) suffix so it is strictly "
    "distinct and the argmax is tie-free on both engines. At 100 TB "
    "this is the difference between an O(corpus/n) and an O(corpus) "
    "data movement when capacity changes.",
)
def docs_rendezvous_reshard(spark: SparkSession, sf_dir: str) -> DataFrame:
    def pick(n: int):
        arr = F.expr(
            f"transform(sequence(0, {n - 1}), s -> struct("
            "concat(md5(concat(cast(doc_id as string), ':', cast(s as string))),"
            " lpad(cast(s as string), 2, '0')) AS kd, s AS s))"
        )
        return F.array_max(arr)["s"].cast("int")

    assigned = _docs_parallel(spark, sf_dir).select(
        "doc_id", pick(_HRW_OLD).alias("shard_old"), pick(_HRW_NEW).alias("shard_new")
    )
    moved = F.sum(F.when(F.col("shard_old") != F.col("shard_new"), 1).otherwise(0))
    return assigned.groupBy(F.col("shard_old").alias("shard")).agg(
        F.count("*").cast("long").alias("n_docs"),
        moved.cast("long").alias("n_moved"),
        (moved.cast("double") / F.count("*")).alias("moved_ratio"),
    )


# ---------------------------------------------------------------------------
# per-source duplication audit
# ---------------------------------------------------------------------------


def _dup_by_source_oracle() -> str:
    cluster_sql = _REGISTRY["docs_dup_clusters"].oracle
    return f"""
WITH cl AS (SELECT doc_id, cluster_id FROM ({cluster_sql}) c),
sizes AS (SELECT cluster_id, COUNT(*) AS n FROM cl GROUP BY cluster_id)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN s.n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       CAST(SUM(CASE WHEN s.n >= 2 THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS dup_ratio
FROM documents d
JOIN cl ON cl.doc_id = d.doc_id
JOIN sizes s ON s.cluster_id = cl.cluster_id
GROUP BY d.source
"""


@register(
    "docs_dup_ratio_by_source",
    _dup_by_source_oracle(),
    doc="per-source duplication audit: the fraction of each source's "
    "documents that sit in a near-dup cluster of size >= 2 — the "
    "provenance-level data-quality readout a curation team uses to "
    "decide which crawl source to down-weight or re-crawl. Composes "
    "the graded near-dup clustering (its recursive-CTE oracle is "
    "embedded verbatim), adds one cluster-size aggregation and one "
    "source rollup; cluster ids shuffle, document text never does.",
)
def docs_dup_ratio_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.queries.llm_pipeline import docs_dup_clusters

    cl = docs_dup_clusters(spark, sf_dir)
    # cluster count grows with the corpus: the size table must never be
    # a broadcast build side (round-8 no-corpus-broadcast rule) — pin
    # the join shuffle-hash with the size rollup as build
    sizes = cl.groupBy("cluster_id").agg(F.count("*").alias("n")).hint("shuffle_hash")
    dup = F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "source")
        .join(cl, "doc_id")
        .join(sizes, "cluster_id")
        .groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            dup.cast("long").alias("n_dup_docs"),
            (dup.cast("double") / F.count("*")).alias("dup_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# n-gram novelty (corpus-contribution / curriculum ordering signal)
# ---------------------------------------------------------------------------


@register(
    "docs_ngram_novelty",
    f"""
WITH {_SHINGLES_SQL.strip()},
firsts AS (
    SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
)
SELECT s.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_grams,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
       / COUNT(*) AS novelty
FROM sh s JOIN firsts f USING (shingle)
GROUP BY s.doc_id
""",
    doc="per-document n-gram novelty: the fraction of a doc's distinct "
    "word-3-grams that first appear in IT under ingestion (doc_id) "
    "order — the corpus-contribution signal data-pruning recipes rank "
    "by (a doc whose grams all appeared earlier adds nothing; boiler"
    "plate scores ~0, fresh content ~1). Two shuffles, both keyed and "
    "partially aggregated: gram -> first-doc minimum, then doc_id for "
    "the per-doc tally. The gram stream never self-joins; cost scales "
    "with the distinct-gram count exactly like the dedup suite's "
    "posting build.",
)
def docs_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.queries.llm_pipeline import shingles_df

    sh = shingles_df(spark, sf_dir, distinct=True)
    firsts = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    novel = F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
    return (
        sh.join(firsts, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            novel.cast("long").alias("n_novel"),
            (novel.cast("double") / F.count("*")).alias("novelty"),
        )
    )


# ---------------------------------------------------------------------------
# BPE merge round (tokenizer training, graded)
# ---------------------------------------------------------------------------


_BPE_ROUND_ORACLE = """
WITH w AS (
    SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
wf AS (
    SELECT word, CAST(COUNT(*) AS BIGINT) AS freq
    FROM w WHERE word != '' GROUP BY word
),
pc AS (
    SELECT substr(word, CAST(i AS INTEGER), 1) AS a,
           substr(word, CAST(i AS INTEGER) + 1, 1) AS b,
           SUM(freq) AS cnt
    FROM (SELECT word, freq, unnest(generate_series(1, len(word)-1)) AS i
          FROM wf WHERE len(word) >= 2)
    GROUP BY 1, 2
),
best AS (SELECT a, b FROM pc ORDER BY cnt DESC, a, b LIMIT 1),
c2 AS (
    SELECT word, freq, i,
           substr(word, CAST(i AS INTEGER), 1) AS c,
           substr(word, CAST(i AS INTEGER) + 1, 1) AS cn
    FROM (SELECT word, freq, unnest(generate_series(1, len(word))) AS i FROM wf)
),
m AS (
    SELECT c2.*, best.a, best.b,
           (c2.c = best.a AND c2.cn = best.b) AS is_match
    FROM c2 CROSS JOIN best
),
mm AS (
    SELECT *, CASE WHEN is_match
                   THEN i - ROW_NUMBER() OVER (PARTITION BY word, is_match ORDER BY i)
              END AS isl
    FROM m
),
ap AS (
    SELECT *, is_match AND (ROW_NUMBER() OVER (PARTITION BY word, isl ORDER BY i) % 2 = 1)
              AS applied
    FROM mm
),
sel AS (
    SELECT word, freq, i,
           CASE WHEN applied THEN a || b
                WHEN NOT COALESCE(LAG(applied) OVER (PARTITION BY word ORDER BY i), FALSE)
                THEN c
           END AS sym
    FROM ap
)
SELECT word, ANY_VALUE(freq) AS freq,
       STRING_AGG(sym, ' ' ORDER BY i) AS syms
FROM sel WHERE sym IS NOT NULL
GROUP BY word
"""


@register(
    "docs_bpe_merge_round",
    _BPE_ROUND_ORACLE,
    doc="one full BPE training round, graded end to end: corpus word "
    "vocab -> weighted pair counts -> deterministic argmax merge "
    "(count DESC, pair ASC) -> the merge APPLIED to every word's "
    "symbol sequence with greedy left-to-right overlap semantics. The "
    "Spark side is the production trainer's row-local fold "
    "(operators/text.py::bpe_merge_step — a merged symbol never "
    "re-merges within the round); the oracle derives the same result "
    "independently via run-parity windows (within a run of k "
    "consecutive match positions, merges land at odd offsets — for "
    "a != b runs are singletons, so the rule degenerates to 'apply "
    "every match'). Multi-round training is operators/text.py::"
    "bpe_train (argmax-per-round TakeOrdered, lineage truncated; "
    "parity vs a reference implementation pinned in pytest). The only "
    "driver state is the 1-row argmax — the merge rule itself, which "
    "IS the trained artifact.",
)
def docs_bpe_merge_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.operators.text import (
        bpe_merge_step,
        bpe_pair_counts,
        bpe_word_vocab,
    )

    vocab = bpe_word_vocab(_docs_parallel(spark, sf_dir))
    best = bpe_pair_counts(vocab).orderBy(F.desc("cnt"), "a", "b").limit(1).collect()[0]
    return bpe_merge_step(vocab, best["a"], best["b"]).select(
        "word", "freq", F.array_join("syms", " ").alias("syms")
    )


# ---------------------------------------------------------------------------
# ANN recall audit: approximate top-k vs exact top-k
# ---------------------------------------------------------------------------


def _recall_oracle() -> str:
    exact_sql = _REGISTRY["emb_knn_cosine"].oracle
    approx_sql = _REGISTRY["emb_ann_topk_lsh"].oracle
    return f"""
WITH exact_q AS (SELECT query_id, neighbor_id FROM ({exact_sql}) x),
approx_q AS (SELECT query_id, neighbor_id, 1 AS hit FROM ({approx_sql}) y)
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(a.hit) AS BIGINT) AS n_hits,
       CAST(COUNT(a.hit) AS DOUBLE) / COUNT(*) AS recall
FROM exact_q e
LEFT JOIN approx_q a ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


def _recall_ivfpq_oracle() -> str:
    exact_sql = _REGISTRY["emb_knn_cosine"].oracle
    approx_sql = _REGISTRY["emb_ann_topk_ivfpq"].oracle
    return f"""
WITH exact_q AS (SELECT query_id, neighbor_id FROM ({exact_sql}) x),
approx_q AS (SELECT query_id, neighbor_id, 1 AS hit FROM ({approx_sql}) y)
SELECT e.query_id,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(a.hit) AS BIGINT) AS n_hits,
       CAST(COUNT(a.hit) AS DOUBLE) / COUNT(*) AS recall
FROM exact_q e
LEFT JOIN approx_q a ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
GROUP BY e.query_id
"""


@register(
    "emb_ann_recall_ivfpq",
    _recall_ivfpq_oracle(),
    doc="recall@10 of the full IVF-PQ index (coarse probe + lossy ADC "
    "codes) against the exact quantized-cosine top-k — the number that "
    "decides n_probe and code size before a 100 TB deployment trusts "
    "the compressed index. Same composed-oracle shape as the LSH "
    "recall audit; both arms reuse their graded plans (the IVF-PQ arm "
    "reads the shared cached index).",
)
def emb_ann_recall_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.queries.curation_ext import emb_ann_topk_ivfpq
    from watsondedupe_spark.queries.llm_pipeline import emb_knn_cosine

    exact = emb_knn_cosine(spark, sf_dir).select("query_id", "neighbor_id")
    approx = emb_ann_topk_ivfpq(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("hit").cast("long").alias("n_hits"),
            (F.count("hit").cast("double") / F.count("*")).alias("recall"),
        )
    )


@register(
    "emb_ann_recall_audit",
    _recall_oracle(),
    doc="ANN accuracy contract: recall@10 of the LSH-bucketed "
    "approximate top-k (emb_ann_topk_lsh) against the exact quantized-"
    "cosine top-k (emb_knn_cosine), per query — the audit a deployment "
    "runs on a query sample before trusting an approximate index at "
    "100 TB (and re-runs when the corpus drifts). Both arms are the "
    "already-graded plans; the audit itself joins two <= Qxk row sets "
    "(bounded by the query sample, never corpus-sized), so its cost is "
    "the two index probes. Composes the constituent queries' own "
    "oracles, so the graded contract covers the COMPARISON, not just "
    "each arm.",
)
def emb_ann_recall_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.queries.engine_native import emb_ann_topk_lsh
    from watsondedupe_spark.queries.llm_pipeline import emb_knn_cosine

    exact = emb_knn_cosine(spark, sf_dir).select("query_id", "neighbor_id")
    approx = emb_ann_topk_lsh(spark, sf_dir).select(
        "query_id", "neighbor_id", F.lit(1).alias("hit")
    )
    return (
        exact.join(approx, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("*").cast("long").alias("n_exact"),
            F.count("hit").cast("long").alias("n_hits"),
            (F.count("hit").cast("double") / F.count("*")).alias("recall"),
        )
    )


# ---------------------------------------------------------------------------
# IVF n_probe sweep: the recall/cost tuning curve
# ---------------------------------------------------------------------------


def _ivf_topk_sql(n_probe: int) -> str:
    """The emb_ann_topk_ivf oracle parameterized by n_probe."""
    from watsondedupe_spark.queries.engine_native import (
        _IVF_CENT_KEY,
        _QUANT_VEC_SQL,
        _cos_sql,
        _iq_cos_sql,
    )

    return f"""
WITH cents AS (
    SELECT vec_id AS centroid_id, embedding AS cv,
           {_QUANT_VEC_SQL.format(v='embedding')} AS qcv
    FROM embeddings
    ORDER BY {_IVF_CENT_KEY}, vec_id LIMIT 16
),
base AS (
    SELECT vec_id, embedding, {_QUANT_VEC_SQL.format(v='embedding')} AS qv
    FROM embeddings
),
scored AS (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           {_iq_cos_sql('e.qv', 'c.qcv')} AS csim
    FROM base e CROSS JOIN cents c
),
assign1 AS (
    SELECT vec_id, embedding, centroid_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) AS rn
        FROM scored)
    WHERE rn = 1
),
probes AS (
    SELECT vec_id AS query_id, embedding AS qv, centroid_id FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY csim DESC, centroid_id) AS rn
        FROM scored WHERE vec_id < 3)
    WHERE rn <= {n_probe}
),
sims AS (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           {_cos_sql('p.qv', 'a.embedding')} AS cosine
    FROM assign1 a JOIN probes p ON a.centroid_id = p.centroid_id AND a.vec_id != p.query_id
)
SELECT query_id, neighbor_id
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rnk
      FROM sims)
WHERE rnk <= 10
"""


def _probe_sweep_oracle() -> str:
    exact_sql = _REGISTRY["emb_knn_cosine"].oracle
    arms = []
    for p in (1, 2, 4):
        arms.append(f"""
SELECT CAST({p} AS BIGINT) AS n_probe,
       CAST(COUNT(*) AS BIGINT) AS n_exact,
       CAST(COUNT(a.hit) AS BIGINT) AS n_hits,
       CAST(COUNT(a.hit) AS DOUBLE) / COUNT(*) AS recall
FROM (SELECT query_id, neighbor_id FROM ({exact_sql}) x) e
LEFT JOIN (SELECT query_id, neighbor_id, 1 AS hit FROM ({_ivf_topk_sql(p)}) y) a
       ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
""")
    return " UNION ALL ".join(arms)


@register(
    "emb_ivf_probe_sweep",
    _probe_sweep_oracle(),
    doc="IVF tuning curve: pooled recall@10 against the exact top-k at "
    "n_probe = 1, 2, 4 — the table that sets the probe width for a "
    "deployment's recall SLO (each probed list costs |corpus|/n_cells "
    "of scan, so this row IS the recall-vs-latency frontier; read it "
    "next to emb_ivf_balance_audit, which says whether the per-list "
    "cost is uniform). Each arm reuses the graded IVF plan at a "
    "different probe width against the same exact arm; the three arms "
    "union into one 3-row table, and every join is bounded by the "
    "query sample (never corpus-sized). Oracle composes the "
    "emb_ann_topk_ivf oracle parameterized by probe width with the "
    "exact-kNN oracle, so the graded contract covers the whole curve.",
)
def emb_ivf_probe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from functools import reduce

    from watsondedupe_spark.operators.similarity import ann_topk_ivf
    from watsondedupe_spark.queries.llm_pipeline import emb_knn_cosine

    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 3)
    exact = emb_knn_cosine(spark, sf_dir).select("query_id", "neighbor_id")
    arms = []
    for p in (1, 2, 4):
        approx = ann_topk_ivf(emb, q, k=10, n_centroids=16, n_probe=p).select(
            "query_id", "neighbor_id", F.lit(1).alias("hit")
        )
        arms.append(
            exact.join(approx, ["query_id", "neighbor_id"], "left").agg(
                F.lit(p).cast("long").alias("n_probe"),
                F.count("*").cast("long").alias("n_exact"),
                F.count("hit").cast("long").alias("n_hits"),
                (F.count("hit").cast("double") / F.count("*")).alias("recall"),
            )
        )
    return reduce(DataFrame.unionByName, arms)


# ---------------------------------------------------------------------------
# LSH end-to-end precision/recall: does the banded candidate generation
# actually FIND the duplicates the exact measure defines?
# ---------------------------------------------------------------------------


def _lsh_pr_oracle() -> str:
    from watsondedupe_spark.queries.llm_pipeline import _SIG_SQL

    return f"""
WITH {_SHINGLES_SQL.strip()},
{_SIG_SQL},
cand AS (
    SELECT DISTINCT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b ON a.b1 = b.b1 AND a.doc_id < b.doc_id
        UNION ALL
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sig a JOIN sig b ON a.b2 = b.b2 AND a.doc_id < b.doc_id
    )
),
rare AS (
    SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= {_STOP_SHINGLE_MAX}
),
shr AS (SELECT sh.doc_id, sh.shingle FROM sh JOIN rare USING (shingle)),
sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM shr GROUP BY doc_id),
inter AS (
    SELECT x.doc_id AS doc_a, y.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
    FROM shr x JOIN shr y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
    GROUP BY x.doc_id, y.doc_id
),
j AS (
    SELECT i.doc_a, i.doc_b, i.n_common, sa.sz + sb.sz - i.n_common AS un
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
),
thr AS (SELECT unnest({list(_SWEEP_THRESHOLDS)}) AS thr),
truth AS (
    SELECT t.thr, j.doc_a, j.doc_b
    FROM j CROSS JOIN thr t
    WHERE j.n_common * 100 >= t.thr * j.un
),
hits AS (
    SELECT tr.thr, CAST(COUNT(c.doc_a) AS BIGINT) AS n_hit,
           CAST(COUNT(*) AS BIGINT) AS n_truth
    FROM truth tr
    LEFT JOIN cand c ON c.doc_a = tr.doc_a AND c.doc_b = tr.doc_b
    GROUP BY tr.thr
),
nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cand FROM cand)
SELECT CAST(h.thr AS INTEGER) AS thr, h.n_truth, nc.n_cand, h.n_hit,
       CAST(h.n_hit AS DOUBLE) / nc.n_cand AS precision,
       CAST(h.n_hit AS DOUBLE) / h.n_truth AS recall
FROM hits h CROSS JOIN nc
"""


@register(
    "docs_lsh_precision_recall",
    _lsh_pr_oracle(),
    doc="LSH end-to-end retrieval audit: at each Jaccard threshold, how "
    "many of the EXACT duplicate pairs (rare-shingle ground truth) the "
    "banded MinHash candidate generation actually surfaces (recall), "
    "and what fraction of its candidates are true at that bar "
    "(precision). docs_minhash_accuracy grades the ESTIMATOR per "
    "pair; this grades the RETRIEVAL — the number that decides band "
    "geometry (more bands = recall, longer bands = precision) before "
    "a 100 TB run, where a recall miss is an undetected duplicate "
    "and a precision miss is wasted verify compute. Reuses the "
    "cached signature and pair substrates; the truth-vs-candidate "
    "comparison is a left join on the bounded pair sets, counted "
    "per broadcast threshold — integer-exact (100*inter >= thr*union)",
)
def docs_lsh_precision_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from watsondedupe_spark.queries.llm_pipeline import (
        docs_minhash_pairs,
        jaccard_pair_stats_df,
    )

    cand = docs_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b")
    j = jaccard_pair_stats_df(spark, sf_dir)
    thr = spark.createDataFrame([(t,) for t in _SWEEP_THRESHOLDS], "thr int")
    truth = (
        j.crossJoin(F.broadcast(thr))
        .filter(F.col("n_common") * 100 >= F.col("thr") * F.col("un"))
        .select("thr", "doc_a", "doc_b")
    )
    hits = (
        # shuffle-hash, never broadcast: the candidate-pair side grows
        # with the corpus (AQE's broadcast conversion of it died at the
        # 100x scale tier); both sides are already pair-keyed, so the
        # shuffled join is the scale-free plan
        truth.join(
            cand.withColumn("hit", F.lit(1)).hint("shuffle_hash"),
            ["doc_a", "doc_b"],
            "left",
        )
        .groupBy("thr")
        .agg(
            F.count("hit").cast("long").alias("n_hit"),
            F.count("*").cast("long").alias("n_truth"),
        )
    )
    nc = cand.agg(F.count("*").cast("long").alias("n_cand"))
    return (
        hits.crossJoin(F.broadcast(nc))
        .select(
            F.col("thr").cast("int").alias("thr"),
            "n_truth",
            "n_cand",
            "n_hit",
            (F.col("n_hit").cast("double") / F.col("n_cand")).alias("precision"),
            (F.col("n_hit").cast("double") / F.col("n_truth")).alias("recall"),
        )
    )
