"""Tests for the curation_ext query batch: duplicate-span detection,
temperature mixing, and SemDeDup semantics (the oracle gate pins value
parity for the first two; these pin the *semantic invariants* and the
rows-only SemDeDup behavior)."""

import math

import pytest
from pyspark.sql import functions as F

from watsondedupe_spark.queries import all_queries
from watsondedupe_spark.queries.curation_ext import (
    _MIX_RATE_CAP,
    _MIX_TARGET_DIV,
    _SEM_COSINE,
    _SPAN_K,
)


def _q(name, spark, sf_dir):
    return all_queries()[name].spark(spark, sf_dir)


# ---------------------------------------------------------------------------
# docs_dup_spans
# ---------------------------------------------------------------------------


def test_dup_spans_islands_are_maximal(spark, sf_dir):
    """No two spans in one doc may overlap or touch — adjacency merges."""
    spans = _q("docs_dup_spans", spark, sf_dir).collect()
    assert spans, "synthetic corpus plants verbatim duplicates; spans expected"
    by_doc = {}
    for r in spans:
        assert r.span_len == r.span_end - r.span_start + 1
        assert r.span_len >= _SPAN_K
        assert r.span_start >= 1
        by_doc.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    for doc_id, ivs in by_doc.items():
        ivs.sort()
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert s2 > e1 + 1, f"doc {doc_id}: spans [{s1},{e1}] and [{s2},{e2}] not merged"


def test_dup_spans_on_planted_fixture(spark):
    """A phrase shared by two docs yields one merged span per doc covering
    exactly the shared run, and unique text yields nothing."""
    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    rows = [
        (0, f"unique preamble zero {shared} unique tail zero"),
        (1, f"{shared} completely different continuation here one"),
        (2, "no overlap at all in this document whatsoever six"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import watsondedupe_spark.queries.curation_ext as mod

    orig = mod._docs_parallel
    mod._docs_parallel = lambda s, d: docs
    try:
        out = {r.doc_id: (r.span_start, r.span_end) for r in
               _q("docs_dup_spans", spark, "unused").collect()}
    finally:
        mod._docs_parallel = orig
    # doc 0: shared run is tokens 4..11; doc 1: tokens 1..8; doc 2: absent
    assert out == {0: (4, 11), 1: (1, 8)}


# ---------------------------------------------------------------------------
# docs_mixture_sample
# ---------------------------------------------------------------------------


def test_mixture_rates_match_hand_computation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    counts = {r.source: r.cnt for r in docs.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    n_total = sum(counts.values())
    s_total = sum(int(math.isqrt(n)) for n in counts.values())
    expected = {
        src: min((n_total // _MIX_TARGET_DIV) * int(math.isqrt(n)) / (s_total * n), _MIX_RATE_CAP)
        for src, n in counts.items()
    }
    out = _q("docs_mixture_sample", spark, sf_dir)
    got = {r.source: r.rate for r in out.select("source", "rate").distinct().collect()}
    assert got == pytest.approx(expected)
    # the md5 gate is a uniform [0,1) draw: the per-source keep count
    # should be within a loose binomial envelope of rate * n
    kept = {r.source: r.k for r in out.groupBy("source").agg(F.count("*").alias("k")).collect()}
    for src, n in counts.items():
        mu = expected[src] * n
        tol = 5 * math.sqrt(mu) + 5
        assert abs(kept.get(src, 0) - mu) <= tol, (src, kept.get(src, 0), mu)


# ---------------------------------------------------------------------------
# emb_semantic_dedup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sem_result(spark, sf_dir):
    return _q("emb_semantic_dedup", spark, sf_dir).collect()


def test_semantic_dedup_deterministic(spark, sf_dir, sem_result):
    again = _q("emb_semantic_dedup", spark, sf_dir).collect()
    assert sorted((r.vec_id, r.centroid_id) for r in sem_result) == sorted(
        (r.vec_id, r.centroid_id) for r in again
    )


def test_semantic_dedup_kept_set_semantics(spark, sf_dir, sem_result):
    """Exactly the vectors with NO lower-id same-cluster neighbor at
    cosine >= threshold survive — brute-force recomputation in pure
    Python, INCLUDING the quantized-integer routing metric the operator
    uses (ivf_assign_np): top-1 centroid by (csim desc, centroid_id)."""
    import math

    from watsondedupe_spark.operators.similarity import ivf_centroids

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = sorted(
        (int(r.centroid_id), [math.floor(float(x) * 1000 + 0.5) for x in r.cv])
        for r in ivf_centroids(emb, 16).collect()
    )

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / math.sqrt(sum(x * x for x in a)) / math.sqrt(sum(y * y for y in b))

    by_cluster = {}
    for r in emb.collect():
        v = [math.floor(float(x) * 1000 + 0.5) for x in r.embedding]
        best = max(cents, key=lambda c: (cos(v, c[1]), -c[0]))
        by_cluster.setdefault(best[0], []).append((r.vec_id, v))

    expected_kept = set()
    for cid, members in by_cluster.items():
        members.sort()
        for i, (vid, v) in enumerate(members):
            if not any(cos(pv, v) >= _SEM_COSINE for _, pv in members[:i]):
                expected_kept.add((vid, cid))
    assert {(r.vec_id, r.centroid_id) for r in sem_result} == expected_kept


# ---------------------------------------------------------------------------
# PQ / ADC
# ---------------------------------------------------------------------------


def test_pq_codes_shape_and_determinism(spark, sf_dir):
    from watsondedupe_spark.operators.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cbs = pq_codebooks(emb, m=8, ks=16)
    assert len(cbs) == 8 and len(cbs[0]) == 16 and len(cbs[0][0]) == 8
    codes = pq_encode(emb, cbs).collect()
    assert all(len(r.codes) == 8 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r.codes)
    again = pq_encode(emb, pq_codebooks(emb, m=8, ks=16)).collect()
    assert sorted((r.vec_id, tuple(r.codes)) for r in codes) == sorted(
        (r.vec_id, tuple(r.codes)) for r in again
    )


def test_pq_adc_recall_vs_exact(spark):
    """On clustered data, PQ top-5 must recover most of the exact top-5;
    with one code per distinct anchor the subspace distances are exact
    for anchor-aligned vectors, so recall is high by construction."""
    import random

    from pyspark.sql import functions as F  # noqa: F811

    from watsondedupe_spark.operators.similarity import ann_topk_pq, cosine_topk

    rng = random.Random(7)
    anchors = [[rng.uniform(-1, 1) for _ in range(64)] for _ in range(4)]
    rows = []
    for i in range(80):
        a = anchors[i % 4]
        rows.append((i, [float(x + rng.uniform(-0.05, 0.05)) for x in a]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 2)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, q, k=5).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in ann_topk_pq(emb, q, k=5, m=8, ks=16).collect()}
    assert len(approx & exact) >= 6  # >= 60% joint recall over 2 queries


def test_pq_adc_ranks_well_formed(spark, sf_dir):
    out = _q("emb_ann_topk_pq", spark, sf_dir)
    rows = out.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        dists = [r.adist for r in rs]
        assert dists == sorted(dists)
        assert all(r.neighbor_id != qid for r in rs)


# ---------------------------------------------------------------------------
# k-means refinement
# ---------------------------------------------------------------------------


def test_kmeans_refine_reduces_sse_and_keeps_shape(spark):
    import random

    from watsondedupe_spark.operators.similarity import (
        ivf_assign,
        ivf_centroids,
        kmeans_refine,
    )

    rng = random.Random(3)
    anchors = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(3)]
    rows = [
        (i, [float(x + rng.uniform(-0.1, 0.1)) for x in anchors[i % 3]])
        for i in range(90)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    seed = ivf_centroids(emb, 3)

    def sse(cents):
        joined = ivf_assign(emb, cents).join(
            cents.withColumnRenamed("centroid_id", "cid"),
            F.col("centroid_id") == F.col("cid"),
        )
        dist2 = F.aggregate(
            F.zip_with("embedding", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double"),
        )
        return joined.agg(F.sum(dist2)).collect()[0][0]

    one = kmeans_refine(emb, seed, rounds=1)
    two = kmeans_refine(emb, one, rounds=1)
    assert two.count() == 3
    assert all(len(r.cv) == 16 for r in two.collect())
    # Lloyd never increases SSE, round over round (epsilon for fp noise)
    s0, s1, s2 = sse(seed), sse(one), sse(two)
    assert s1 <= s0 * 1.0001 and s2 <= s1 * 1.0001
    assert s2 < s0  # and it strictly improves from the coarse seed here


def test_kmeans_refine_exact_is_deterministic_partition(spark):
    """The exact-integer Lloyd form: every vector assigned exactly once,
    to one of the <= k seeded centroids, and the assignment is
    bit-identical across runs (exact int64 sums — no accumulation-order
    drift; the semantic correctness of the round itself is proven
    against the unrolled DuckDB oracle in emb_kmeans_refined_assign)."""
    import random

    from watsondedupe_spark.operators.similarity import kmeans_refine_exact

    rng = random.Random(9)
    anchors = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(3)]
    rows = [
        (i, [float(x + rng.uniform(-0.05, 0.05)) for x in anchors[i % 3]])
        for i in range(90)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a1 = {(r.vec_id, r.centroid_id) for r in kmeans_refine_exact(emb, 3, rounds=1).collect()}
    a2 = {(r.vec_id, r.centroid_id) for r in kmeans_refine_exact(emb, 3, rounds=1).collect()}
    assert a1 == a2  # exact integers: no run-to-run drift
    assert len(a1) == 90 and len({v for v, _ in a1}) == 90  # a partition
    assert len({c for _, c in a1}) <= 3  # clusters come from the k seeds


def test_hll_union_matches_exact_at_low_cardinality(spark, sf_dir):
    """At this cardinality the lgk=14 sketch is exact, so the two-level
    shard-merge must agree with count_distinct exactly — pinning that the
    merge is lossless over partition boundaries. (The registered query
    exposes the contract form exact_users/within_2pct; the raw estimate
    is rebuilt here to keep the stronger exactness pin.)"""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    shard = F.spark_partition_id().alias("shard")
    per_shard = events.groupBy("event_type", shard).agg(
        F.hll_sketch_agg(F.col("user_id").cast("string"), F.lit(14)).alias("sk")
    )
    got = {
        (r.event_type, r.approx_users)
        for r in per_shard.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).cast("long").alias("approx_users"))
        .collect()
    }
    want = {
        (r.event_type, r.n)
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == want
    rows = _q("events_user_hll_by_type", spark, sf_dir).collect()
    assert {(r.event_type, r.exact_users) for r in rows} == want
    assert all(r.within_2pct for r in rows)


def test_minhash_accuracy_within_estimator_envelope(spark, sf_dir):
    """Mean |estimate - exact| over candidate pairs must sit inside a few
    standard errors of the k-slot MinHash estimator (sigma <= 1/(2*sqrt(k)))."""
    rows = _q("docs_minhash_accuracy", spark, sf_dir).collect()
    assert rows, "candidate pairs exist in the synthetic corpus"
    for r in rows:
        assert 0.0 <= r.minhash_estimate <= 1.0
        assert 0.0 <= r.exact_jaccard <= 1.0
    from watsondedupe_spark.queries.llm_pipeline import minhash_sig_df

    k = sum(1 for c in minhash_sig_df(spark, sf_dir).columns if c.startswith("m"))
    mean_err = sum(r.abs_error for r in rows) / len(rows)
    assert mean_err <= 3.0 / (2.0 * math.sqrt(k)), (mean_err, k)


# ---------------------------------------------------------------------------
# IVF-PQ
# ---------------------------------------------------------------------------


def test_ivfpq_full_probe_equals_plain_pq(spark, sf_dir):
    """Probing every cell degenerates IVF-PQ to a full PQ/ADC scan: the
    codebooks, codes, and ADC tables are identical, so with
    n_probe == n_centroids the two operators must agree row-for-row."""
    from watsondedupe_spark.operators.similarity import ann_topk_ivfpq, ann_topk_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 2)
    full = ann_topk_ivfpq(emb, q, k=5, n_centroids=4, n_probe=4, quantize=1000)
    plain = ann_topk_pq(emb, q, k=5, quantize=1000)
    got = sorted(((r.query_id, r.rank, r.neighbor_id, r.adist) for r in full.collect()))
    want = sorted(((r.query_id, r.rank, r.neighbor_id, r.adist) for r in plain.collect()))
    assert got == want


def test_ivfpq_candidates_confined_to_probed_cells(spark, sf_dir):
    """Every returned neighbor's assigned cell must be one of its
    query's probed cells — the pruning contract that makes the probe
    read n_probe/n_centroids of the corpus instead of all of it."""
    from watsondedupe_spark.operators.similarity import (
        ann_topk_ivfpq,
        ivf_assign_np,
        ivf_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    out = ann_topk_ivfpq(emb, q, k=10, n_centroids=16, n_probe=4, quantize=1000).collect()
    cents = ivf_centroids(emb, 16)
    cell = {
        r.vec_id: r.centroid_id
        for r in ivf_assign_np(emb, cents, n_probe=1, quantize=1000).collect()
    }
    probed = {}
    for r in ivf_assign_np(q, cents, n_probe=4, quantize=1000).collect():
        probed.setdefault(r.vec_id, set()).add(r.centroid_id)
    for r in out:
        assert cell[r.neighbor_id] in probed[r.query_id]
        assert r.neighbor_id != r.query_id
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    for rs in by_q.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert [r.adist for r in rs] == sorted(r.adist for r in rs)


def test_ivfpq_refined_exact_distances_and_recall(spark, sf_dir):
    """The refine stage must (a) return EXACT quantized squared-L2
    distances for every returned pair (checked against a direct numpy
    recomputation from the raw vectors) and (b) never lose recall vs
    the unrefined ADC ranking against exact search over the same probed
    candidate pool — re-ranking a superset shortlist by the true metric
    can only fix ADC mis-orderings, not introduce them."""
    import numpy as np

    from watsondedupe_spark.operators.similarity import (
        ann_topk_ivfpq,
        ann_topk_ivfpq_refined,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    k = 10
    refined = ann_topk_ivfpq_refined(
        emb, q, k=k, refine=4, n_centroids=16, n_probe=4, quantize=1000
    ).collect()
    plain = ann_topk_ivfpq(
        emb, q, k=k, n_centroids=16, n_probe=4, quantize=1000
    ).collect()

    vecs = {
        r.vec_id: np.floor(np.asarray(r.embedding, dtype=np.float64) * 1000 + 0.5).astype(
            np.int64
        )
        for r in emb.collect()
    }
    # (a) exactness of every refined distance
    for r in refined:
        d = vecs[r.query_id] - vecs[r.neighbor_id]
        assert r.d2 == int((d * d).sum()), (r.query_id, r.neighbor_id)

    # (b) per query: the refined top-k true distances are a pointwise
    # lower-or-equal set vs the plain-ADC top-k's true distances
    def true_d2(qid, nid):
        d = vecs[qid] - vecs[nid]
        return int((d * d).sum())

    by_q_r, by_q_p = {}, {}
    for r in refined:
        by_q_r.setdefault(r.query_id, []).append(true_d2(r.query_id, r.neighbor_id))
    for r in plain:
        by_q_p.setdefault(r.query_id, []).append(true_d2(r.query_id, r.neighbor_id))
    for qid in by_q_p:
        rr, pp = sorted(by_q_r[qid]), sorted(by_q_p[qid])
        assert len(rr) == len(pp) == k
        assert all(a <= b for a, b in zip(rr, pp)), qid


def test_pq_encode_keep_cols_passthrough(spark, sf_dir):
    from watsondedupe_spark.operators.similarity import pq_codebooks, pq_encode

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "tag", F.col("vec_id") % 7
    )
    cbs = pq_codebooks(emb, m=8, ks=16)
    out = pq_encode(emb, cbs, keep_cols=("tag",)).collect()
    assert all(r.tag == r.vec_id % 7 for r in out)
    assert all(len(r.codes) == 8 for r in out)


# ---------------------------------------------------------------------------
# passage chunking
# ---------------------------------------------------------------------------


def test_passage_chunks_tile_documents(spark, sf_dir):
    """Window/stride invariants: starts are 1, 1+S, 1+2S, ...; every
    token is covered (the last window reaches the end of the doc); no
    window starts past the end of the previous one's coverage; token
    counts equal min(W, n - start + 1)."""
    from watsondedupe_spark.queries.curation_ext import _PSG_S, _PSG_W

    docs = {
        r.doc_id: len(r.text.split(" "))
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    out = _q("docs_passage_chunks", spark, sf_dir).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, rs in by_doc.items():
        n = docs[doc_id]
        rs.sort(key=lambda r: r.passage_idx)
        assert [r.passage_idx for r in rs] == list(range(1, len(rs) + 1))
        assert [r.start_tok for r in rs] == [1 + i * _PSG_S for i in range(len(rs))]
        for r in rs:
            assert r.n_tokens == min(_PSG_W, n - r.start_tok + 1)
        # full coverage: last window reaches the end
        last = rs[-1]
        assert last.start_tok + last.n_tokens - 1 == n
        # no redundant tail: each window past the first adds new tokens
        for prev, cur in zip(rs, rs[1:]):
            assert cur.start_tok + _PSG_W - 1 > prev.start_tok + prev.n_tokens - 1 or (
                cur.start_tok + cur.n_tokens - 1 > prev.start_tok + prev.n_tokens - 1
            )


def test_passage_chunks_edge_sizes(spark):
    """Boundary behavior around window/stride: short docs yield one
    passage; the first start past a fully covered doc is suppressed;
    the first token past coverage forces one more window."""
    from watsondedupe_spark.operators.text import passage_chunks

    w, s = 8, 6
    def doc(n):
        return " ".join(f"t{i}" for i in range(n))

    rows = [(n, doc(n)) for n in (1, 7, 8, 9, 14, 15, 20, 21)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = passage_chunks(df, "text", "doc_id", window=w, stride=s).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for n, rs in by_doc.items():
        rs.sort(key=lambda r: r.passage_idx)
        # starts at stride spacing, covering every token, no redundant tail
        assert rs[0].start_tok == 1
        assert all(b.start_tok - a.start_tok == s for a, b in zip(rs, rs[1:]))
        assert rs[-1].start_tok + rs[-1].n_tokens - 1 == n
        assert all(r.n_tokens == min(w, n - r.start_tok + 1) for r in rs)
    # exact passage counts: n <= w -> 1; w < n <= w+s (start 7 covers to 14) -> 2 ...
    assert {n: len(by_doc[n]) for n in (1, 7, 8, 9, 14, 15, 20, 21)} == {
        1: 1, 7: 1, 8: 1, 9: 2, 14: 2, 15: 3, 20: 3, 21: 4
    }


def test_passage_chunks_rejects_bad_stride(spark):
    from watsondedupe_spark.operators.text import passage_chunks

    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        passage_chunks(df, window=4, stride=5)
    with pytest.raises(ValueError):
        passage_chunks(df, window=4, stride=0)


def test_boundary_overlap_on_planted_splice(spark):
    """A page split across two crawl shards: doc 0's tail tokens equal
    doc 1's head tokens; unrelated docs produce nothing."""
    from watsondedupe_spark.queries.curation_ext import _BOUNDARY_K, docs_boundary_overlap
    import watsondedupe_spark.queries.curation_ext as mod

    boundary = " ".join(f"b{i}" for i in range(_BOUNDARY_K))
    rows = [
        (0, f"first shard body text {boundary}"),
        (1, f"{boundary} second shard continues here"),
        (2, "entirely unrelated document with enough tokens to pass the gate"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    orig = mod._docs
    mod._docs = lambda s, d: docs
    try:
        out = {(r.tail_doc, r.head_doc) for r in docs_boundary_overlap(spark, "unused").collect()}
    finally:
        mod._docs = orig
    assert out == {(0, 1)}


def test_dup_gram_ratio_bounds_and_consistency(spark, sf_dir):
    """Ratios lie in (0, 1]; n_dup <= n_grams; docs flagged by
    dup_spans must appear here (a duplicated span implies duplicated
    grams)."""
    out = {r.doc_id: r for r in _q("docs_dup_gram_ratio", spark, sf_dir).collect()}
    assert out
    for r in out.values():
        assert 0 < r.n_dup <= r.n_grams
        assert r.dup_gram_ratio == r.n_dup / r.n_grams
    spanned = {r.doc_id for r in _q("docs_dup_spans", spark, sf_dir).collect()}
    assert spanned <= set(out)


def test_query_collect_cap_refuses_oversized_wave(spark, monkeypatch):
    """The batch-KNN paths collect the query set driver-side (closure
    capture). Above QUERY_COLLECT_CAP that collect must refuse with a
    clear remediation error instead of materializing an unbounded query
    matrix on the driver."""
    import watsondedupe_spark.operators.similarity as sim

    rows = [(i, [float(i), 1.0, 2.0, 3.0]) for i in range(12)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    monkeypatch.setattr(sim, "QUERY_COLLECT_CAP", 5)
    for fn in (
        lambda: sim.cosine_topk_np(emb, emb, k=3),
        lambda: sim.ann_topk_pq(emb, emb, k=3, m=2, ks=4, quantize=1000),
        lambda: sim.ann_topk_ivfpq(emb, emb, k=3, n_centroids=2, m=2, ks=4),
        # round 11: the decontamination reference set rides the same
        # guard — its boundedness used to be a docstring-only contract
        lambda: sim.max_cosine_vs_set(emb, emb),
    ):
        with pytest.raises(ValueError, match="driver-collect cap"):
            fn()
    # under the cap the same paths still work
    small = emb.filter(F.col("vec_id") < 3)
    assert sim.cosine_topk_np(emb, small, k=3).count() > 0
    assert sim.max_cosine_vs_set(emb, small).count() == 12


def test_prebuilt_index_shape_mismatch_raises(spark):
    """A prebuilt PQ/IVF-PQ index fixes m/ks at build time; calling with
    different values must fail loudly, not silently mis-score."""
    from watsondedupe_spark.operators.similarity import (
        ann_topk_ivfpq,
        ann_topk_pq,
        ivf_assign_np,
        ivf_centroids,
        pq_codebooks,
        pq_encode,
    )

    rows = [(i, [float(i % 5), float(i % 3), 1.0, 2.0]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = emb.filter(F.col("vec_id") < 2)
    cbs = pq_codebooks(emb, m=2, ks=4)
    cents = ivf_centroids(emb, 2)
    assigned = ivf_assign_np(emb, cents, n_probe=1, quantize=1000)
    codes = pq_encode(assigned, cbs, quantize=1000, keep_cols=("centroid_id",))
    with pytest.raises(ValueError, match="prebuilt index mismatch"):
        ann_topk_pq(emb, q, m=4, ks=4, quantize=1000, codebooks=cbs, codes=codes)
    with pytest.raises(ValueError, match="prebuilt index mismatch"):
        ann_topk_ivfpq(
            emb, q, m=2, ks=8, n_centroids=2, quantize=1000,
            cents=cents, codebooks=cbs, codes=codes,
        )
    # matched shapes still serve
    ok = ann_topk_ivfpq(
        emb, q, k=3, m=2, ks=4, n_centroids=2, quantize=1000,
        cents=cents, codebooks=cbs, codes=codes,
    )
    assert ok.count() > 0


def test_token_budget_mix_invariants(spark, sf_dir):
    """Rates bounded by the cap; kept tokens track the per-source
    target within sampling noise; every source with a nonzero target is
    represented."""
    out = {r.source: r for r in _q("docs_token_budget_mix", spark, sf_dir).collect()}
    assert out
    for r in out.values():
        assert 0.0 < r.rate <= 31.0 / 32.0
        assert r.n_docs_kept > 0 and r.tokens_kept > 0
        # md5-gated Bernoulli sample: kept tokens within a loose factor
        # of target (small per-source doc counts => high variance)
        assert r.tokens_kept <= 4 * max(r.target_tokens, 1)


def test_dup_weighting_mass_per_cluster(spark, sf_dir):
    """Each near-dup cluster's total training weight must be exactly
    1.0 (n * 1/n), and singletons keep full weight — the invariant that
    makes duplicated content contribute one unit of loss mass."""
    rows = _q("docs_dup_weighting", spark, sf_dir).collect()
    assert rows
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert any(len(v) > 1 for v in by_cluster.values())  # real dups exist
    for cid, members in by_cluster.items():
        n = len(members)
        assert all(m.cluster_size == n for m in members)
        assert abs(sum(m.train_weight for m in members) - 1.0) < 1e-9


def test_minhash_bbit_contract(spark, sf_dir):
    """The b=1 estimator equals a driver-side parity recount of the
    signature tails (J = 2C - 1), pairs coincide with the exact
    jaccard-pair set, and abs_error is literally |exact - estimate|."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.curation_ext import _BBIT_K
    from watsondedupe_spark.queries.llm_pipeline import minhash_sig_df

    sigs = {r.doc_id: r for r in minhash_sig_df(spark, sf_dir).collect()}
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in all_queries()["docs_jaccard_pairs"].spark(spark, sf_dir).collect()
    }
    rows = all_queries()["docs_minhash_bbit"].spark(spark, sf_dir).collect()
    assert {(r.doc_a, r.doc_b) for r in rows} == set(exact)
    for r in rows:
        sa, sb = sigs[r.doc_a], sigs[r.doc_b]
        agree = sum(
            int(getattr(sa, f"m{j}")[-1], 16) % 2 == int(getattr(sb, f"m{j}")[-1], 16) % 2
            for j in range(1, _BBIT_K + 1)
        )
        want = (2 * agree - _BBIT_K) / _BBIT_K
        assert r.bbit_estimate == want
        assert r.exact_jaccard == exact[(r.doc_a, r.doc_b)]
        assert r.abs_error == abs(r.exact_jaccard - want)


def test_pq_adc_sdc_contract(spark, sf_dir):
    """SDC hits equal a numpy recomputation (encode queries and
    candidates with the md5-sampled codebooks, score via the 8x16x16
    code-distance table), and both recalls are hits/10."""
    import hashlib

    import numpy as np

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in emb])
    M = np.floor(
        np.array([r.embedding for r in emb], dtype=np.float64) * 1000 + 0.5
    ).astype(np.int64)
    skey = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in ids])
    samp = M[np.lexsort((ids, skey))[:16]]
    codes = np.empty((len(ids), 8), dtype=np.int64)
    for s in range(8):
        x = M[:, s * 8 : (s + 1) * 8]
        cb = samp[:, s * 8 : (s + 1) * 8]
        d2 = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=-1)
        codes[:, s] = d2.argmin(axis=1)
    dtab = np.empty((8, 16, 16), dtype=np.int64)
    for s in range(8):
        cb = samp[:, s * 8 : (s + 1) * 8]
        dtab[s] = ((cb[:, None, :] - cb[None, :, :]) ** 2).sum(axis=-1)
    # exact top-10 (cosine, quantized ints — the graded kNN recipe)
    rows = all_queries()["emb_pq_adc_sdc"].spark(spark, sf_dir).collect()
    assert {r.query_id for r in rows} == {0, 1, 2}
    for r in rows:
        qpos = int(np.where(ids == r.query_id)[0][0])
        sdist = dtab[np.arange(8), codes[qpos][None, :], codes[:, :]].sum(axis=1)
        order = sorted(
            [(d, i) for d, i in zip(sdist, ids) if i != r.query_id]
        )
        sdc_top = {i for _, i in order[:10]}
        qv = M[qpos]
        cos = (M @ qv) / np.sqrt(float(qv @ qv)) / np.sqrt((M * M).sum(axis=1))
        ex = sorted(
            [(c, i) for c, i in zip(cos, ids) if i != r.query_id],
            key=lambda t: (-t[0], t[1]),
        )
        exact_top = {i for _, i in ex[:10]}
        assert r.n_exact == 10
        assert r.sdc_hits == len(exact_top & sdc_top)
        assert r.adc_recall == r.adc_hits / 10
        assert r.sdc_recall == r.sdc_hits / 10


def test_bloom_fpr_audit_contract(spark, sf_dir):
    """A driver-side bit-set replay reproduces every count; the Bloom
    guarantee holds (zero false negatives); observed FPR is the exact
    quotient; theoretical FPR is fill^4."""
    import hashlib

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.curation_ext import _BLOOM_K, _BLOOM_M
    from watsondedupe_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def pos(h, j):
        return int(hashlib.md5(f"b{j}:{h}".encode()).hexdigest()[:8], 16) % _BLOOM_M

    a_hashes = {
        hashlib.md5(r.text.encode()).hexdigest() for r in docs if r.doc_id % 2 == 0
    }
    bits = {pos(h, j) for h in a_hashes for j in range(_BLOOM_K)}
    b_hashes = [
        hashlib.md5(r.text.encode()).hexdigest() for r in docs if r.doc_id % 2 == 1
    ]
    n_members = sum(1 for h in b_hashes if h in a_hashes)
    flagged = [all(pos(h, j) in bits for j in range(_BLOOM_K)) for h in b_hashes]
    n_fp = sum(
        1 for h, f in zip(b_hashes, flagged) if f and h not in a_hashes
    )
    [r] = all_queries()["docs_bloom_fpr_audit"].spark(spark, sf_dir).collect()
    assert (r.n_probes, r.n_members, r.n_flagged) == (
        len(b_hashes), n_members, sum(flagged)
    )
    assert r.n_false_pos == n_fp
    assert r.n_false_neg == 0  # THE Bloom guarantee
    assert r.bits_set == len(bits)
    assert r.observed_fpr == n_fp / (len(b_hashes) - n_members)
    fill = len(bits) / _BLOOM_M
    assert r.theoretical_fpr == fill * fill * fill * fill


def test_silhouette_matches_reference(spark, sf_dir):
    """Per-cluster simplified silhouette equals a plain-Python reference
    over the same deterministic centroids and quantized cosines."""
    import hashlib
    import math
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.curation_ext import _SIL_SCALE
    from watsondedupe_spark.sources import read_table

    rows = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    q = {r.vec_id: [int(math.floor(float(x) * 1000 + 0.5)) for x in r.embedding] for r in rows}

    def cent_key(vid):
        return int(hashlib.md5(str(vid).encode()).hexdigest()[:15], 16)

    cent_ids = sorted(q, key=lambda v: (cent_key(v), v))[:16]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / math.sqrt(sum(x * x for x in a)) / math.sqrt(sum(y * y for y in b))

    agg = defaultdict(lambda: [0, 0, 0])  # n, sum_scaled, n_negative
    for vid, v in q.items():
        sims = sorted(
            ((-cos(v, q[c]), c) for c in cent_ids)
        )
        own_sim, own_c = -sims[0][0], sims[0][1]
        next_sim = -sims[1][0]
        a, b = 1 - own_sim, 1 - next_sim
        s = 0 if max(a, b) == 0 else int(math.floor((b - a) / max(a, b) * _SIL_SCALE + 0.5))
        e = agg[own_c]
        e[0] += 1
        e[1] += s
        e[2] += s < 0

    got = all_queries()["emb_silhouette"].spark(spark, sf_dir).collect()
    assert {r.centroid_id: [r.n_members, r.sum_s_scaled, r.n_negative] for r in got} == dict(agg)
    for r in got:
        assert r.mean_silhouette == r.sum_s_scaled / _SIL_SCALE / r.n_members


def test_gopher_rules_audit_matches_reference(spark, sf_dir):
    """Per-source per-rule gate counts equal a plain-Python pass over the
    corpus, and every rule is exercised somewhere in the fixture."""
    from collections import Counter, defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.curation_ext import (
        _GR_MIN_STOP, _GR_MWL_HI, _GR_MWL_LO, _GR_REP_DEN, _GR_REP_NUM,
        _GR_WC_HI, _GR_WC_LO,
    )
    from watsondedupe_spark.queries.llm_pipeline import _STOPWORDS
    from watsondedupe_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("source", "text").collect()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0])
    for r in docs:
        toks = r.text.split(" ")
        wc = len(toks)
        chars_ns = sum(len(t) for t in toks)
        n_stop = len({t for t in toks if t in _STOPWORDS})
        top = max(Counter(toks).values())
        f_wc = wc < _GR_WC_LO or wc > _GR_WC_HI
        f_mwl = chars_ns < _GR_MWL_LO * wc or chars_ns > _GR_MWL_HI * wc
        f_stop = n_stop < _GR_MIN_STOP
        f_rep = top * _GR_REP_DEN > wc * _GR_REP_NUM
        e = agg[r.source]
        e[0] += 1
        e[1] += f_wc
        e[2] += f_mwl
        e[3] += f_stop
        e[4] += f_rep
        e[5] += not (f_wc or f_mwl or f_stop or f_rep)

    got = all_queries()["docs_gopher_rules_audit"].spark(spark, sf_dir).collect()
    assert {
        r.source: [r.n_docs, r.n_fail_wordcount, r.n_fail_meanwordlen,
                   r.n_fail_stopwords, r.n_fail_repetition, r.n_pass_all]
        for r in got
    } == dict(agg)


def test_token_chi2_drift_matches_reference(spark, sf_dir):
    """Per-source chi-square ticks equal the plain-Python per-token
    computation with identical operand order, and the source-only
    exclusion count is honest."""
    import math
    from collections import Counter, defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.curation_ext import _CHI2_TICKS
    from watsondedupe_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("source", "text").collect()
    st = defaultdict(Counter)
    for r in docs:
        st[r.source].update(r.text.split(" "))
    tot = Counter()
    for c in st.values():
        tot.update(c)
    n_all = sum(tot.values())

    got = {r.source: r for r in all_queries()["docs_token_chi2_drift"].spark(spark, sf_dir).collect()}
    assert set(got) == set(st)
    for src, counts in st.items():
        n_s = sum(counts.values())
        rest_n = n_all - n_s
        ticks = 0
        common = only = 0
        for t, o in counts.items():
            rest_ct = tot[t] - o
            if rest_ct <= 0:
                only += 1
                continue
            common += 1
            diff = float(o * rest_n - rest_ct * n_s)
            term = diff * diff / float(n_s) / float(rest_n) / float(rest_ct)
            ticks += int(math.floor(term * _CHI2_TICKS + 0.5))
        r = got[src]
        assert (r.n_common_tokens, r.n_source_only_tokens, r.chi2_ticks) == (
            common, only, ticks,
        )
        assert r.chi2 == ticks / _CHI2_TICKS


def test_vocab_growth_curve_matches_reference(spark, sf_dir):
    """Each decile's vocabulary size equals a plain-Python first-k-docs
    distinct count, and the curve is monotone (Heaps-law shape)."""
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.curation_ext import _VG_DECILES
    from watsondedupe_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    first_doc = {}
    occ = defaultdict(int)
    for r in docs:
        for t in r.text.split(" "):
            occ[t] += 1
            if t not in first_doc or r.doc_id < first_doc[t]:
                first_doc[t] = r.doc_id
    max_doc = max(r.doc_id for r in docs)

    got = {r.decile: r for r in all_queries()["docs_vocab_growth_curve"].spark(spark, sf_dir).collect()}
    assert set(got) == set(range(1, _VG_DECILES + 1))
    prev = -1
    for d in range(1, _VG_DECILES + 1):
        cutoff = (max_doc + 1) * d // _VG_DECILES
        vocab = sum(1 for fd in first_doc.values() if fd < cutoff)
        mass = sum(occ[t] for t, fd in first_doc.items() if fd < cutoff)
        r = got[d]
        assert (r.doc_cutoff, r.vocab_size, r.mass_of_seen_vocab) == (cutoff, vocab, mass)
        assert r.vocab_size >= prev
        prev = r.vocab_size
    assert got[_VG_DECILES].vocab_size == len(first_doc)


# ---------------------------------------------------------------------------
# docs_paragraph_dedup
# ---------------------------------------------------------------------------


def test_paragraph_dedup_on_planted_fixture(spark):
    """An identical doc pair strips exactly the later copy's paragraph,
    attributed to the later copy's source; unique text strips nothing."""
    shared = " ".join(f"w{i}" for i in range(20))  # one <32-token paragraph
    rows = [
        (0, shared, "srcA"),
        (1, shared, "srcB"),
        (2, "totally unique words here", "srcB"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    import watsondedupe_spark.queries.curation_ext as mod

    orig_par, orig_docs = mod._docs_parallel, mod._docs
    mod._docs_parallel = lambda s, d: docs
    mod._docs = lambda s, d: docs
    try:
        out = {r.source: r for r in _q("docs_paragraph_dedup", spark, "x").collect()}
    finally:
        mod._docs_parallel, mod._docs = orig_par, orig_docs
    assert out["srcA"].n_paras == 1 and out["srcA"].n_stripped == 0
    assert out["srcB"].n_paras == 2 and out["srcB"].n_stripped == 1
    assert out["srcB"].tokens_stripped == 20
    assert out["srcB"].strip_share == pytest.approx(0.5)
    assert out["srcA"].tokens_stripped == 0


def test_paragraph_dedup_bounds(spark, sf_dir):
    rows = _q("docs_paragraph_dedup", spark, sf_dir).collect()
    assert rows
    assert sum(r.n_stripped for r in rows) > 0, "corpus plants duplicate docs"
    for r in rows:
        assert 0 <= r.n_stripped <= r.n_paras
        assert 0 <= r.tokens_stripped
        assert r.strip_share == pytest.approx(r.n_stripped / r.n_paras)


# ---------------------------------------------------------------------------
# emb_decontaminate
# ---------------------------------------------------------------------------


def test_max_cosine_vs_set_known_vectors(spark):
    from watsondedupe_spark.operators.similarity import max_cosine_vs_set

    corpus = spark.createDataFrame(
        [(10, [1.0, 0.0], 7), (11, [0.0, 1.0], 8), (12, [1.0, 1.0], 7)],
        "vec_id long, embedding array<float>, label int",
    )
    refs = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got = {r.vec_id: r for r in
           max_cosine_vs_set(corpus, refs, keep_cols=("label",)).collect()}
    assert got[10].max_sim == pytest.approx(1.0)
    assert got[11].max_sim == pytest.approx(0.0)
    assert got[12].max_sim == pytest.approx(1.0 / math.sqrt(2.0), rel=1e-6)
    assert got[10].label == 7 and got[11].label == 8


def test_max_cosine_vs_set_empty_refs_raises(spark):
    from watsondedupe_spark.operators.similarity import max_cosine_vs_set

    emp = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError, match="empty reference set"):
        max_cosine_vs_set(emp, emp)


def test_emb_decontaminate_matches_reference(spark, sf_dir):
    """Independent numpy recomputation of the per-label flag counts."""
    import numpy as np

    from watsondedupe_spark.queries.curation_ext import _DECON_EVAL_N, _DECON_THR

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    V = np.floor(
        np.asarray([r.embedding for r in rows], dtype=np.float64) * 1000 + 0.5
    ).astype(np.int64)
    ids = np.asarray([r.vec_id for r in rows])
    labels = np.asarray([r.label for r in rows])
    ev, tr = V[ids < _DECON_EVAL_N], V[ids >= _DECON_EVAL_N]
    trl = labels[ids >= _DECON_EVAL_N]
    S = (tr @ ev.T).astype(np.float64)
    S = S / np.sqrt((tr * tr).sum(1).astype(np.float64))[:, None]
    S = S / np.sqrt((ev * ev).sum(1).astype(np.float64))[None, :]
    mx = S.max(axis=1)
    want = {
        int(lab): (
            int((trl == lab).sum()),
            int(((trl == lab) & (mx >= _DECON_THR)).sum()),
            float(mx[trl == lab].max()),
        )
        for lab in np.unique(trl)
    }
    got = {r.label: r for r in _q("emb_decontaminate", spark, sf_dir).collect()}
    assert set(got) == set(want)
    assert sum(r.n_flagged for r in got.values()) > 0, "threshold should flag some"
    for lab, (n_tr, n_fl, top) in want.items():
        assert got[lab].n_train == n_tr
        assert got[lab].n_flagged == n_fl
        assert got[lab].top_sim == top  # bit-exact: same int dot / sqrt / sqrt


def test_strip_paragraphs_on_planted_fixture(spark):
    """The later copy of a repeated paragraph is cut; unique tails and
    first instances survive; unaffected docs do not appear."""
    shared = " ".join(f"s{i}" for i in range(32))  # exactly one full window
    tail = "unique tail words"
    rows = [
        (0, shared, "srcA"),               # first instance — kept, absent
        (1, f"{shared} {tail}", "srcB"),   # para 1 stripped, tail kept
        (2, "all unique here", "srcB"),    # unaffected — absent
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    import watsondedupe_spark.queries.curation_ext as mod

    orig_par, orig_docs = mod._docs_parallel, mod._docs
    mod._docs_parallel = lambda s, d: docs
    mod._docs = lambda s, d: docs
    try:
        out = {r.doc_id: r for r in _q("docs_strip_paragraphs", spark, "x").collect()}
    finally:
        mod._docs_parallel, mod._docs = orig_par, orig_docs
    assert set(out) == {1}
    assert out[1].clean_text == tail
    assert out[1].n_removed == 32


def test_strip_paragraphs_consistent_with_dedup_stats(spark, sf_dir):
    """Total tokens removed by the strip equals the dedup stats' total."""
    stats = _q("docs_paragraph_dedup", spark, sf_dir).collect()
    stripped = _q("docs_strip_paragraphs", spark, sf_dir).collect()
    assert stripped, "corpus plants duplicate docs"
    assert sum(r.n_removed for r in stripped) == sum(
        r.tokens_stripped for r in stats
    )


def test_paragraph_dedup_matches_pure_python_reference(spark):
    """Randomized corpus (fixed seed) vs an independent pure-Python
    computation of the same first-instance semantics — widens coverage
    beyond the planted fixture and the synthetic corpus, including
    window-boundary doc lengths (exactly W, W+1, 2W tokens)."""
    import hashlib
    import random

    from watsondedupe_spark.queries.curation_ext import _PARA_W

    rng = random.Random(8)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for d in range(24):
        # force boundary lengths on some docs; duplicate some texts
        n = rng.choice([_PARA_W, _PARA_W + 1, 2 * _PARA_W, rng.randint(1, 90)])
        text = " ".join(rng.choice(vocab) for _ in range(n))
        if d % 5 == 4:
            text = rows[rng.randrange(len(rows))][1]  # verbatim copy
        rows.append((d, text, f"src{d % 3}"))

    # pure-python reference: same segmentation + first-instance rule
    ref = {}  # source -> [n_paras, n_stripped, tokens_stripped]
    seen = {}
    for doc_id, text, source in rows:
        t = text.split(" ")
        for idx, s in enumerate(range(0, len(t), _PARA_W)):
            seg = t[s : s + _PARA_W]
            h = hashlib.md5(" ".join(seg).encode()).hexdigest()
            r = ref.setdefault(source, [0, 0, 0])
            r[0] += 1
            if h in seen:
                r[1] += 1
                r[2] += len(seg)
            else:
                seen[h] = (doc_id, idx)

    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    import watsondedupe_spark.queries.curation_ext as mod

    orig_par, orig_docs = mod._docs_parallel, mod._docs
    mod._docs_parallel = lambda s, d: docs
    mod._docs = lambda s, d: docs
    try:
        got = {r.source: r for r in _q("docs_paragraph_dedup", spark, "x").collect()}
    finally:
        mod._docs_parallel, mod._docs = orig_par, orig_docs
    assert set(got) == set(ref)
    for src, (n_paras, n_stripped, tok) in ref.items():
        assert got[src].n_paras == n_paras
        assert got[src].n_stripped == n_stripped
        assert got[src].tokens_stripped == tok


def test_max_cosine_vs_set_matches_numpy_on_random_vectors(spark):
    """Randomized vectors (fixed seed): the operator's quantized-int
    max-cosine must be BIT-identical to an independent numpy fold."""
    import numpy as np

    rng = np.random.default_rng(8)
    n, d, nref = 50, 16, 7
    V = rng.normal(size=(n, d)).astype(np.float32)
    R = rng.normal(size=(nref, d)).astype(np.float32)

    from watsondedupe_spark.operators.similarity import max_cosine_vs_set

    corpus = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    refs = spark.createDataFrame(
        [(i, [float(x) for x in R[i]]) for i in range(nref)],
        "vec_id long, embedding array<float>",
    )
    got = {r.vec_id: r.max_sim for r in max_cosine_vs_set(corpus, refs).collect()}

    Vq = np.floor(V.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    Rq = np.floor(R.astype(np.float64) * 1000 + 0.5).astype(np.int64)
    S = (Vq @ Rq.T).astype(np.float64)
    S = S / np.sqrt((Vq * Vq).sum(1).astype(np.float64))[:, None]
    S = S / np.sqrt((Rq * Rq).sum(1).astype(np.float64))[None, :]
    want = S.max(axis=1)
    for i in range(n):
        assert got[i] == want[i], f"vec {i}: {got[i]!r} != {want[i]!r}"


def test_quality_auc_matches_bruteforce_reference(spark):
    """Randomized corpus (fixed seed): the bounded-bucket Mann-Whitney
    AUC must equal the brute-force pairwise AUC (wins + half-ties over
    P*N) computed on the same quantized scores, per language —
    including the NULL arm when a language has no positives."""
    import math
    import random
    import re as _re

    from watsondedupe_spark.queries.llm_pipeline import _STOPWORDS

    rng = random.Random(9)
    vocab = ["alpha", "beta!", "gamma,", "delta"] + list(_STOPWORDS)
    rows = []
    for d in range(60):
        n = rng.randint(3, 80)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        lang = rng.choice(["en", "de", "zz"])  # zz gets no duplicates
        if lang != "zz" and d % 4 == 3 and rows:
            cand = [r for r in rows if r[2] != "zz"]
            if cand:
                text = cand[rng.randrange(len(cand))][1]  # verbatim dup
        rows.append((d, text, lang))

    def bucket(text):
        t = text.split(" ")
        punct = (len(text) - len(_re.sub(r"[^a-zA-Z0-9 ]", "", text))) / len(text)
        stop = sum(1 for x in t if x in _STOPWORDS) / len(t)
        q = min(1.0, len(t) / 50.0) * (1.0 - punct) * (0.5 + stop)
        return math.floor(q * 1000 + 0.5)

    def norm(text):
        return _re.sub(" +", " ", _re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()

    from collections import Counter

    nc = Counter(norm(t) for _, t, _ in rows)
    ref = {}
    for lang in {l for _, _, l in rows}:
        pos = [bucket(t) for _, t, l in rows if l == lang and nc[norm(t)] > 1]
        neg = [bucket(t) for _, t, l in rows if l == lang and nc[norm(t)] <= 1]
        if pos and neg:
            u = sum(
                1.0 if p > n_ else (0.5 if p == n_ else 0.0)
                for p in pos
                for n_ in neg
            )
            ref[lang] = (len(pos), len(neg), u / (len(pos) * len(neg)))
        else:
            ref[lang] = (len(pos), len(neg), None)

    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    import watsondedupe_spark.queries.curation_ext as mod
    import watsondedupe_spark.queries.llm_pipeline as llm

    orig = llm._docs
    llm._docs = lambda s, d: docs
    mod._docs = lambda s, d: docs
    try:
        got = {r.lang: r for r in _q("docs_quality_auc", spark, "x").collect()}
    finally:
        llm._docs = orig
        mod._docs = orig
    assert set(got) == set(ref)
    for lang, (p, n_, auc) in ref.items():
        assert got[lang].n_pos == p and got[lang].n_neg == n_
        if auc is None:
            assert got[lang].auc is None
        else:
            assert abs(got[lang].auc - auc) < 1e-12, (lang, got[lang].auc, auc)


def test_quality_pr_curve_matches_bruteforce_reference(spark):
    """Same randomized corpus as the AUC test: each observed threshold
    row must equal the brute-force >=threshold filter's kept/clean/
    precision/recall per language."""
    import math
    import random
    import re as _re

    from watsondedupe_spark.queries.llm_pipeline import _STOPWORDS

    rng = random.Random(9)
    vocab = ["alpha", "beta!", "gamma,", "delta"] + list(_STOPWORDS)
    rows = []
    for d in range(60):
        n = rng.randint(3, 80)
        text = " ".join(rng.choice(vocab) for _ in range(n))
        lang = rng.choice(["en", "de", "zz"])
        if lang != "zz" and d % 4 == 3 and rows:
            cand = [r for r in rows if r[2] != "zz"]
            if cand:
                text = cand[rng.randrange(len(cand))][1]
        rows.append((d, text, lang))

    def bucket(text):
        t = text.split(" ")
        punct = (len(text) - len(_re.sub(r"[^a-zA-Z0-9 ]", "", text))) / len(text)
        stop = sum(1 for x in t if x in _STOPWORDS) / len(t)
        q = min(1.0, len(t) / 50.0) * (1.0 - punct) * (0.5 + stop)
        return math.floor(q * 1000 + 0.5)

    def norm(text):
        return _re.sub(" +", " ", _re.sub(r"[^a-z0-9 ]", "", text.lower())).strip()

    from collections import Counter

    nc = Counter(norm(t) for _, t, _ in rows)
    per_lang = {}
    for _, t, l in rows:
        per_lang.setdefault(l, []).append((bucket(t), nc[norm(t)] > 1))

    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    import watsondedupe_spark.queries.curation_ext as mod
    import watsondedupe_spark.queries.llm_pipeline as llm

    orig = llm._docs
    llm._docs = lambda s, d: docs
    mod._docs = lambda s, d: docs
    try:
        got = _q("docs_quality_pr_curve", spark, "x").collect()
    finally:
        llm._docs = orig
        mod._docs = orig

    assert got, "empty PR curve"
    for r in got:
        docs_l = per_lang[r.lang]
        kept = [(b, dup) for b, dup in docs_l if b >= r.threshold]
        clean_kept = sum(1 for _, dup in kept if not dup)
        total_clean = sum(1 for _, dup in docs_l if not dup)
        assert r.n_kept == len(kept) and r.n_clean_kept == clean_kept
        assert abs(r.precision - clean_kept / len(kept)) < 1e-12
        if total_clean:
            assert abs(r.recall - clean_kept / total_clean) < 1e-12
        else:
            assert r.recall is None
    # every observed bucket of every lang appears exactly once
    assert {(r.lang, r.threshold) for r in got} == {
        (l, b) for l, ds in per_lang.items() for b, _ in ds
    }


def test_quality_pair_excludes_empty_text(spark):
    """Round-10 advice: empty text nulls the quality score (0/0) and so
    the sbucket ordering key — and Spark windows sort NULLS FIRST while
    the DuckDB oracle defaults NULLS LAST, silently skewing neg_below.
    Both queries must exclude empty docs, identically to a corpus that
    never contained them."""
    base = [
        (0, "the cat sat on the mat", "en"),
        (1, "the cat sat on the mat", "en"),  # dup pair -> positives exist
        (2, "completely different words here", "en"),
        (3, "another unique document body", "en"),
    ]
    with_empty = base + [(4, "", "en"), (5, "", "en")]
    docs_a = spark.createDataFrame(base, "doc_id long, text string, lang string")
    docs_b = spark.createDataFrame(with_empty, "doc_id long, text string, lang string")

    import watsondedupe_spark.queries.curation_ext as mod
    import watsondedupe_spark.queries.llm_pipeline as llm

    orig = llm._docs
    results = {}
    try:
        for tag, docs in (("clean", docs_a), ("with_empty", docs_b)):
            llm._docs = lambda s, d, _docs=docs: _docs
            mod._docs = lambda s, d, _docs=docs: _docs
            results[tag] = (
                sorted(map(tuple, _q("docs_quality_auc", spark, "x").collect())),
                sorted(map(tuple, _q("docs_quality_pr_curve", spark, "x").collect())),
            )
    finally:
        llm._docs = orig
        mod._docs = orig
    assert results["clean"] == results["with_empty"]
    # the dup pair really registered (the test isn't vacuous)
    assert any(r[1] > 0 for r in results["clean"][0])  # n_pos > 0 somewhere
