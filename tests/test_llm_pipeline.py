

def test_leakage_safe_split_is_cluster_atomic(spark, sf_dir):
    """The split invariant the query exists for: every document in a
    near-dup cluster lands in the SAME split, and both splits are
    non-empty at corpus scale."""
    from watsondedupe_spark.queries import all_queries

    out = all_queries()["docs_leakage_safe_split"].spark(spark, sf_dir).collect()
    by_cluster = {}
    for r in out:
        by_cluster.setdefault(r.cluster_id, set()).add(r.split)
    assert all(len(s) == 1 for s in by_cluster.values())
    splits = {r.split for r in out}
    assert splits == {"train", "eval"}
    # ~7/8 of CLUSTERS go to train (binomial envelope over clusters)
    import math

    n = len(by_cluster)
    train = sum(1 for s in by_cluster.values() if s == {"train"})
    mu = n * 7 / 8
    assert abs(train - mu) <= 5 * math.sqrt(mu) + 5


def test_canonical_per_cluster_picks_best_quality(spark, sf_dir):
    """The canonical doc must be a cluster member with the maximum
    quality score (doc_id tiebreak), and n_members must partition the
    corpus."""
    from watsondedupe_spark.queries import all_queries

    qs = all_queries()
    clusters = {}
    for r in qs["docs_dup_clusters"].spark(spark, sf_dir).collect():
        clusters.setdefault(r.cluster_id, []).append(r.doc_id)
    quality = {
        r.doc_id: r.quality_score
        for r in qs["docs_quality"].spark(spark, sf_dir).collect()
    }
    out = qs["docs_canonical_per_cluster"].spark(spark, sf_dir).collect()
    assert sum(r.n_members for r in out) == sum(len(m) for m in clusters.values())
    for r in out:
        members = clusters[r.cluster_id]
        assert r.n_members == len(members)
        assert r.canonical_doc in members
        best = max(quality[d] for d in members)
        assert r.best_quality == best
        assert r.canonical_doc == min(d for d in members if quality[d] == best)


def test_shingle_containment_vs_jaccard_invariants(spark, sf_dir):
    """Containment dominates Jaccard for the same pair (its denominator
    is one side, Jaccard's is the union), both directions reconstruct
    n_common exactly, and every emitted pair clears the 0.8 gate."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.llm_pipeline import jaccard_pair_stats_df

    out = all_queries()["docs_shingle_containment"].spark(spark, sf_dir).collect()
    stats = {
        (r.doc_a, r.doc_b): r
        for r in jaccard_pair_stats_df(spark, sf_dir).collect()
    }
    for r in out:
        s = stats[(r.doc_a, r.doc_b)]
        jac = s.n_common / s.un
        assert max(r.c_ab, r.c_ba) >= 0.8
        assert r.c_ab >= jac and r.c_ba >= jac
        # c_ab * sz_a and c_ba * sz_b both recover the intersection
        assert abs(r.c_ab * s.sz_a - r.n_common) < 1e-9
        assert abs(r.c_ba * s.sz_b - r.n_common) < 1e-9
    # the gate is strictly stronger than the 0.4 jaccard pair gate only
    # in one direction: every containment pair must be a candidate pair
    assert all((r.doc_a, r.doc_b) in stats for r in out)


def test_tfidf_topk_ranking_contract(spark, sf_dir):
    """<= 3 terms per doc, ranks contiguous from 1, scores non-increasing
    with term-asc tiebreak, and every term actually occurs tf times in
    the doc's whitespace tokenization."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    rows = all_queries()["docs_tfidf_topk"].spark(spark, sf_dir).collect()
    texts = {
        r.doc_id: r.text.split(" ")
        for r in read_table(spark, sf_dir, "documents").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc, "no output rows"
    for doc_id, rs in by_doc.items():
        rs.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        for a, b in zip(rs, rs[1:]):
            assert a.score > b.score or (a.score == b.score and a.term < b.term)
        for r in rs:
            assert texts[doc_id].count(r.term) == r.tf


def test_observed_funnel_matches_direct_counts(spark, sf_dir):
    """The CollectMetrics counters must equal independently computed
    cumulative filter counts, monotone non-increasing by stage."""
    from pyspark.sql import functions as F

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    out = {r.stage: r.n_docs for r in
           all_queries()["docs_observed_funnel"].spark(spark, sf_dir).collect()}
    docs = read_table(spark, sf_dir, "documents")
    expect = {
        0: docs.count(),
        1: docs.filter(F.col("n_chars") >= 150).count(),
        2: docs.filter((F.col("n_chars") >= 150) & (F.col("lang") == "en")).count(),
        3: docs.filter(
            (F.col("n_chars") >= 150)
            & (F.col("lang") == "en")
            & (F.size(F.split("text", " ")) >= 40)
        ).count(),
    }
    assert out == expect
    assert out[0] >= out[1] >= out[2] >= out[3]


def test_source_overlap_minhash_contract(spark, sf_dir):
    """All source pairs present exactly once; the exact arm is a true
    Jaccard over per-source distinct shingle sets (recomputed
    independently); the estimate is a valid k=24 minwise fraction; and
    abs_err is literally |est - exact|."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.llm_pipeline import shingles_df
    from watsondedupe_spark.sources import read_table

    rows = all_queries()["docs_source_overlap_minhash"].spark(spark, sf_dir).collect()
    src_of = {
        r.doc_id: r.source
        for r in read_table(spark, sf_dir, "documents").select("doc_id", "source").collect()
    }
    sets = {}
    for r in shingles_df(spark, sf_dir).collect():
        sets.setdefault(src_of[r.doc_id], set()).add(r.shingle)
    n_src = len(sets)
    assert len(rows) == n_src * (n_src - 1) // 2
    assert len({(r.source_a, r.source_b) for r in rows}) == len(rows)
    for r in rows:
        assert r.source_a < r.source_b
        a, b = sets[r.source_a], sets[r.source_b]
        assert r.sz_a == len(a) and r.sz_b == len(b)
        assert r.shared == len(a & b)
        assert abs(r.exact_jaccard - len(a & b) / len(a | b)) < 1e-12
        assert 0.0 <= r.est_jaccard <= 1.0
        assert round(r.est_jaccard * 24, 6) == round(r.est_jaccard * 24)
        assert abs(r.abs_err - abs(r.est_jaccard - r.exact_jaccard)) < 1e-15


def test_label_centroid_sim_matches_numpy(spark, sf_dir):
    """Every label pair appears once and the quantized-sum cosine equals
    a numpy recomputation from the raw embeddings."""
    import numpy as np

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    rows = all_queries()["emb_label_centroid_sim"].spark(spark, sf_dir).collect()
    emb = read_table(spark, sf_dir, "embeddings").collect()
    sums, counts = {}, {}
    for r in emb:
        q = np.floor(np.asarray(r.embedding, dtype=np.float64) * 1000 + 0.5).astype(
            np.int64
        )
        sums[r.label] = sums.get(r.label, 0) + q
        counts[r.label] = counts.get(r.label, 0) + 1
    n_labels = len(sums)
    assert len(rows) == n_labels * (n_labels - 1) // 2
    for r in rows:
        assert r.label_a < r.label_b
        assert (r.n_a, r.n_b) == (counts[r.label_a], counts[r.label_b])
        sa, sb = sums[r.label_a], sums[r.label_b]
        want = float(sa @ sb) / np.sqrt(float(sa @ sa)) / np.sqrt(float(sb @ sb))
        assert abs(r.cos_centroid - want) < 1e-12
        assert -1.0 <= r.cos_centroid <= 1.0


def test_matryoshka_recall_matches_numpy(spark, sf_dir):
    """Per (dims, query) recall@10 equals a numpy recomputation of both
    the truncated and full-dim exact top-10 (same quantization, same
    cosine-desc-then-id tie order)."""
    import numpy as np

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.llm_pipeline import _KNN_QUERIES
    from watsondedupe_spark.sources import read_table

    rows = all_queries()["emb_matryoshka_recall"].spark(spark, sf_dir).collect()
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in emb])
    M = np.floor(
        np.array([r.embedding for r in emb], dtype=np.float64) * 1000 + 0.5
    ).astype(np.int64)

    def topk(d):
        X = M[:, :d]
        out = {}
        for qid in _KNN_QUERIES:
            qv = X[ids == qid][0]
            dots = X @ qv
            cos = dots / np.sqrt(float(qv @ qv)) / np.sqrt((X * X).sum(axis=1))
            order = sorted(
                [(c, i) for c, i in zip(cos, ids) if i != qid],
                key=lambda t: (-t[0], t[1]),
            )
            out[qid] = {i for _, i in order[:10]}
        return out

    full = topk(64)
    assert len(rows) == 2 * len(_KNN_QUERIES)
    for d in (16, 32):
        trunc = topk(d)
        for r in [r for r in rows if r.dims == d]:
            want_hits = len(full[r.query_id] & trunc[r.query_id])
            assert (r.n_exact, r.n_hits) == (10, want_hits)
            assert abs(r.recall - want_hits / 10) < 1e-15


def test_ivf_balance_audit_contract(spark, sf_dir):
    """Cells partition the corpus (sum of n_vecs == corpus size), shares
    sum to 1, and skew is exactly n * n_cells / total."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    rows = all_queries()["emb_ivf_balance_audit"].spark(spark, sf_dir).collect()
    n_corpus = read_table(spark, sf_dir, "embeddings").count()
    total = sum(r.n_vecs for r in rows)
    assert total == n_corpus
    assert len({r.centroid_id for r in rows}) == len(rows) <= 16
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.share == r.n_vecs / total
        assert r.skew == (r.n_vecs * len(rows)) / total


def test_top_pc_power_matches_numpy(spark, sf_dir):
    """The 64 components equal the exact integer X^T(X v0) under the
    floor(x*1000+0.5) quantization, and share = component / max|component|."""
    import numpy as np

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("embedding").collect()
    X = np.array(
        [np.floor(np.array(r.embedding, dtype=np.float64) * 1000 + 0.5) for r in emb],
        dtype=np.int64,
    )
    v0 = np.where(np.arange(X.shape[1]) % 2 == 0, 1, -1).astype(np.int64)
    want = X.T @ (X @ v0)
    rows = all_queries()["emb_top_pc_power"].spark(spark, sf_dir).collect()
    assert len(rows) == 64
    got = {r.dim: r.component for r in rows}
    assert got == {i + 1: int(want[i]) for i in range(64)}
    maxabs = max(abs(v) for v in got.values())
    for r in rows:
        assert r.share == r.component / maxabs


def test_watermark_lateness_contract(spark, sf_dir):
    """Buckets partition the event stream, shares sum to 1, and each
    bucket's max lateness sits inside the bucket's minute bounds."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    rows = all_queries()["events_watermark_lateness"].spark(spark, sf_dir).collect()
    n_events = read_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in rows) == n_events
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-9
    for r in rows:
        assert r.late_min >= 0
        assert r.late_min * 60_000_000 <= r.max_late_us < (r.late_min + 1) * 60_000_000


def test_quality_dup_corr_matches_numpy(spark, sf_dir):
    """corr recomputed from the graded cluster map + token counts with the
    same closed-form moment formula."""
    import math

    from pyspark.sql import functions as F

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    qs = all_queries()
    cc = {r.doc_id: r.cluster_id for r in qs["docs_dup_clusters"].spark(spark, sf_dir).collect()}
    sizes = {}
    for cl in cc.values():
        sizes[cl] = sizes.get(cl, 0) + 1
    toks = {
        r.doc_id: r.y
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("y"))
        .collect()
    }
    xs = [sizes[cc[d]] for d in cc]
    ys = [toks[d] for d in cc]
    n = float(len(xs))
    sx, sy = float(sum(xs)), float(sum(ys))
    sxy = float(sum(x * y for x, y in zip(xs, ys)))
    sxx = float(sum(x * x for x in xs))
    syy = float(sum(y * y for y in ys))
    want = (n * sxy - sx * sy) / math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    (row,) = qs["docs_quality_dup_corr"].spark(spark, sf_dir).collect()
    assert row.n_docs == len(xs)
    assert -1.0 <= row.corr_dup_tokens <= 1.0
    assert math.isclose(row.corr_dup_tokens, want, rel_tol=1e-12)


def test_jl_recall_matches_numpy(spark, sf_dir):
    """Recall@10 equals a numpy recomputation: project the quantized
    corpus with the md5-keyed sign matrix, take cosine top-10 in both
    spaces, intersect."""
    import numpy as np

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.pipeline_ext import _jl_signs
    from watsondedupe_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in emb])
    X = np.array(
        [np.floor(np.array(r.embedding, dtype=np.float64) * 1000 + 0.5) for r in emb],
        dtype=np.int64,
    )
    S = np.array(_jl_signs(), dtype=np.int64)  # 16 x 64
    Y = X @ S.T

    def topk(M, qrow, self_id):
        sims = (M @ M[qrow]) / np.sqrt((M * M).sum(axis=1)) / np.sqrt(M[qrow] @ M[qrow])
        order = sorted(range(len(ids)), key=lambda r: (-sims[r], ids[r]))
        return [ids[r] for r in order if ids[r] != self_id][:10]

    rows = all_queries()["emb_jl_recall"].spark(spark, sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        qrow = int(np.where(ids == r.query_id)[0][0])
        exact = set(topk(X.astype(np.float64), qrow, r.query_id))
        approx = set(topk(Y.astype(np.float64), qrow, r.query_id))
        assert (r.n_exact, r.n_hits) == (10, len(exact & approx))
        assert r.recall == r.n_hits / 10


def test_oov_rate_contract(spark, sf_dir):
    """Every source reports; token totals tile the corpus token stream;
    the OOV rate reproduces a driver-side recount against the same
    deterministic top-V vocab."""
    from collections import Counter

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.pipeline_ext import _OOV_VOCAB
    from watsondedupe_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("source", "text").collect()
    cnt = Counter()
    per_src = {}
    for r in docs:
        toks = [t for t in r.text.split(" ") if t]
        cnt.update(toks)
        per_src.setdefault(r.source, []).extend(toks)
    vocab = {t for t, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:_OOV_VOCAB]}
    rows = all_queries()["docs_oov_rate"].spark(spark, sf_dir).collect()
    assert {r.source for r in rows} == set(per_src)
    for r in rows:
        toks = per_src[r.source]
        oov = sum(1 for t in toks if t not in vocab)
        assert (r.n_tokens, r.n_oov) == (len(toks), oov)
        assert r.oov_rate == oov / len(toks)


def test_partitioned_probe_equals_ivf_topk(spark, sf_dir):
    """Probing the persisted partitioned store returns exactly the
    in-memory IVF top-k: same routing, same lists, same ranking."""
    from watsondedupe_spark.queries import all_queries

    qs = all_queries()
    want = {
        (r.query_id, r.rank): r.neighbor_id
        for r in qs["emb_ann_topk_ivf"].spark(spark, sf_dir).collect()
    }
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in qs["emb_ann_partitioned_probe"].spark(spark, sf_dir).collect()
    }
    assert got == want and len(got) == 30


def test_label_impurity_contract(spark, sf_dir):
    """Pair counts are symmetric-complete (sum over labels == total
    ordered co-member pairs), impurity is exactly n_diff/n_pairs, and a
    driver-side recount over the same buckets agrees."""
    from collections import Counter, defaultdict

    from pyspark.sql import functions as F

    from watsondedupe_spark.operators.similarity import sign_lsh_bucket
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    b = (
        read_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label", sign_lsh_bucket(F.col("embedding"), n_planes=6).alias("bucket"))
        .collect()
    )
    buckets = defaultdict(list)
    for r in b:
        buckets[r.bucket].append(r.label)
    want = Counter()
    want_diff = Counter()
    for labels in buckets.values():
        n = len(labels)
        cnt = Counter(labels)
        for lab, k in cnt.items():
            want[lab] += k * (n - 1)
            want_diff[lab] += k * (n - cnt[lab])
    rows = all_queries()["emb_label_impurity"].spark(spark, sf_dir).collect()
    assert {r.label: (r.n_pairs, r.n_diff) for r in rows} == {
        lab: (want[lab], want_diff[lab]) for lab in want
    }
    for r in rows:
        assert r.impurity == r.n_diff / r.n_pairs


def test_collocation_lift_contract(spark, sf_dir):
    """Top-K by bigram count with driver-side recount; lift is exactly
    n_ab * N_bigrams / (n_a * n_b)."""
    from collections import Counter

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.pipeline_ext import _COLLOC_K
    from watsondedupe_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("text").collect()
    uni, bi = Counter(), Counter()
    n_big = 0
    for r in docs:
        t = r.text.split(" ")
        if len(t) < 2:
            continue
        uni.update(t)
        for i in range(len(t) - 1):
            bi[t[i] + " " + t[i + 1]] += 1
            n_big += 1
    want = sorted(bi.items(), key=lambda kv: (-kv[1], kv[0]))[:_COLLOC_K]
    rows = all_queries()["docs_collocation_lift"].spark(spark, sf_dir).collect()
    got = {r.bigram: r for r in rows}
    assert set(got) == {g for g, _ in want}
    for g, n in want:
        r = got[g]
        wa, wb = g.split(" ")
        assert (r.n_ab, r.n_a, r.n_b) == (n, uni[wa], uni[wb])
        assert r.lift == (n * n_big) / (uni[wa] * uni[wb])


def test_pq_distortion_matches_numpy(spark, sf_dir):
    """Exact per-subspace reconstruction error recomputed with numpy from
    the same md5-sampled codebooks and argmin assignment."""
    import numpy as np

    from watsondedupe_spark.operators.similarity import pq_codebooks
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    emb_df = read_table(spark, sf_dir, "embeddings")
    emb = emb_df.select("vec_id", "embedding").collect()
    X = np.array(
        [np.floor(np.array(r.embedding, dtype=np.float64) * 1000 + 0.5) for r in emb],
        dtype=np.int64,
    )
    cbs = pq_codebooks(emb_df, m=8, ks=16)
    rows = all_queries()["emb_pq_distortion"].spark(spark, sf_dir).collect()
    assert len(rows) == 8
    got = {r.subspace: r for r in rows}
    for s in range(8):
        C = np.floor(np.asarray(cbs[s], dtype=np.float64) * 1000 + 0.5).astype(np.int64)
        sv = X[:, s * 8 : (s + 1) * 8]
        d2 = ((sv[:, None, :] - C[None, :, :]) ** 2).sum(axis=-1)
        want_err = int(d2.min(axis=1).sum())
        want_energy = int((sv * sv).sum())
        r = got[s]
        assert (r.n_vecs, r.sq_err, r.energy) == (len(X), want_err, want_energy)
        assert r.distortion == want_err / want_energy


def test_sq8_recall_matches_numpy(spark, sf_dir):
    """Recall@10 equals a numpy recomputation: same per-dim min/max
    affine int8 encode, same 255-scaled integer reconstruction, same
    cosine-desc-then-id tie order for both the approx and exact arms."""
    import numpy as np

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.llm_pipeline import _KNN_QUERIES
    from watsondedupe_spark.sources import read_table

    rows = all_queries()["emb_sq8_recall"].spark(spark, sf_dir).collect()
    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in emb])
    M = np.floor(
        np.array([r.embedding for r in emb], dtype=np.float64) * 1000 + 0.5
    ).astype(np.int64)
    mn, mx = M.min(axis=0), M.max(axis=0)
    den = mx - mn
    code = np.where(den == 0, 0, (M - mn) * 255 // np.where(den == 0, 1, den))
    R = mn * 255 + code * den  # 255x the dequantized value, all integer

    def topk(X, qv):
        dots = X @ qv
        cos = dots / np.sqrt(float(qv @ qv)) / np.sqrt((X * X).sum(axis=1))
        return cos

    got = {r.query_id: r for r in rows}
    assert set(got) == set(_KNN_QUERIES)
    for qid in _KNN_QUERIES:
        qv = M[ids == qid][0]
        exact = sorted(
            [(c, i) for c, i in zip(topk(M, qv), ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )
        approx = sorted(
            [(c, i) for c, i in zip(topk(R, qv), ids) if i != qid],
            key=lambda t: (-t[0], t[1]),
        )
        want = len({i for _, i in exact[:10]} & {i for _, i in approx[:10]})
        r = got[qid]
        assert (r.n_exact, r.n_hits) == (10, want)
        assert abs(r.recall - want / 10) < 1e-15


def test_hard_negatives_contract(spark, sf_dir):
    """Every mined pair crosses labels, ranks are dense per query, and
    the set equals a numpy recomputation (top-5 cosine among
    different-label candidates, cosine-desc-then-id tie order)."""
    import numpy as np

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.llm_pipeline import _KNN_QUERIES
    from watsondedupe_spark.sources import read_table

    rows = all_queries()["emb_hard_negatives"].spark(spark, sf_dir).collect()
    emb = read_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    ids = np.array([r.vec_id for r in emb])
    labels = {r.vec_id: r.label for r in emb}
    M = np.floor(
        np.array([r.embedding for r in emb], dtype=np.float64) * 1000 + 0.5
    ).astype(np.int64)
    for r in rows:
        assert r.query_label != r.neighbor_label
        assert r.query_label == labels[r.query_id]
        assert r.neighbor_label == labels[r.neighbor_id]
    for qid in _KNN_QUERIES:
        qv = M[ids == qid][0]
        cos = (M @ qv) / np.sqrt(float(qv @ qv)) / np.sqrt((M * M).sum(axis=1))
        order = sorted(
            [
                (c, i)
                for c, i in zip(cos, ids)
                if i != qid and labels[i] != labels[qid]
            ],
            key=lambda t: (-t[0], t[1]),
        )
        want = [i for _, i in order[:5]]
        got = sorted(
            [r for r in rows if r.query_id == qid], key=lambda r: r.rank
        )
        assert [r.neighbor_id for r in got] == want
        assert [r.rank for r in got] == [1, 2, 3, 4, 5]


def test_token_fertility_contract(spark, sf_dir):
    """Group sums equal a driver-side regex recount and the ratios are
    exactly the quotient of the integer sums."""
    import re

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.pipeline_ext import _PRETOK_RE
    from watsondedupe_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "lang", "source", "text"
    ).collect()
    want = {}
    for r in docs:
        k = (r.lang, r.source)
        d, w, p, c = want.get(k, (0, 0, 0, 0))
        want[k] = (
            d + 1,
            w + len(r.text.split(" ")),
            p + len(re.findall(_PRETOK_RE, r.text)),
            c + len(r.text.replace(" ", "")),
        )
    rows = all_queries()["docs_token_fertility"].spark(spark, sf_dir).collect()
    got = {(r.lang, r.source): r for r in rows}
    assert set(got) == set(want)
    for k, (d, w, p, c) in want.items():
        r = got[k]
        assert (r.n_docs, r.n_words, r.n_pretok, r.n_tok_chars) == (d, w, p, c)
        assert r.fertility == p / w
        assert r.avg_tok_len == c / p


def test_weighted_sample_contract(spark, sf_dir):
    """Exactly k rows, ranks dense, winners equal a driver-side
    recomputation of the u // w priority order, and the sample is
    size-biased (mean sampled weight exceeds the corpus mean)."""
    import hashlib

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.pipeline_ext import _SPS_K
    from watsondedupe_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    ).collect()

    def pri(doc_id, w):
        u = int(hashlib.md5(f"sps:{doc_id}".encode()).hexdigest()[:15], 16)
        return u // w

    order = sorted(((pri(r.doc_id, r.n_chars), r.doc_id) for r in docs))
    want = [d for _, d in order[:_SPS_K]]
    rows = all_queries()["docs_weighted_sample"].spark(spark, sf_dir).collect()
    got = sorted(rows, key=lambda r: r.rank)
    assert [r.doc_id for r in got] == want
    assert [r.rank for r in got] == list(range(1, _SPS_K + 1))
    for r in got:
        assert r.priority == pri(r.doc_id, r.weight)
    corpus_mean = sum(r.n_chars for r in docs) / len(docs)
    sample_mean = sum(r.weight for r in got) / len(got)
    assert sample_mean > corpus_mean


def test_quality_calibration_contract(spark, sf_dir):
    """Per-source percent ranks span [0, 1], match a driver-side rank
    recomputation over the graded docs_quality scores, deciles are
    floor(pct*10) capped at 9, and every source's best doc sits in
    decile 9."""
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries

    qrows = all_queries()["docs_quality"].spark(spark, sf_dir).collect()
    score = {r.doc_id: r.quality_score for r in qrows}
    rows = all_queries()["docs_quality_calibration"].spark(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == set(score)
    by_src = defaultdict(list)
    for r in rows:
        assert r.quality_score == score[r.doc_id]
        by_src[r.source].append(r)
    for src, rs in by_src.items():
        order = sorted(rs, key=lambda r: (r.quality_score, r.doc_id))
        n = len(order)
        for i, r in enumerate(order):
            want = 0.0 if n == 1 else i / (n - 1)
            assert r.src_pct == want
            assert r.calib_decile == min(9, int(want * 10))
        assert order[-1].calib_decile == 9


def test_simhash_accuracy_contract(spark, sf_dir):
    """Pairs equal the graded candidate set; exact_jaccard matches a
    driver-side token-set intersection; hamming_frac is hamming/60; and
    the estimator is monotone in aggregate (mean exact jaccard at low
    hamming >= mean at high hamming)."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    cand = {
        (r.id_a, r.id_b): r.hamming
        for r in all_queries()["docs_simhash_candidates"].spark(spark, sf_dir).collect()
    }
    toks = {
        r.doc_id: set(r.text.split(" "))
        for r in read_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    rows = all_queries()["docs_simhash_accuracy"].spark(spark, sf_dir).collect()
    assert {(r.id_a, r.id_b) for r in rows} == set(cand)
    lo, hi = [], []
    for r in rows:
        assert r.hamming == cand[(r.id_a, r.id_b)]
        assert r.hamming_frac == r.hamming / 60
        a, b = toks[r.id_a], toks[r.id_b]
        want = len(a & b) / len(a | b)
        assert r.exact_jaccard == want
        (lo if r.hamming <= 6 else hi).append(want)
    if lo and hi:
        assert sum(lo) / len(lo) >= sum(hi) / len(hi)


def test_opq_distortion_contract(spark, sf_dir):
    """Permuted-space per-subspace squared errors equal a numpy
    recomputation (energy-ranked round-robin permutation, md5-sampled
    codebooks, argmin-L2 with lowest-code ties), and the permutation
    achieves its purpose: subspace energy imbalance (max/min) is no
    worse than the identity layout's."""
    import hashlib

    import numpy as np

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in emb])
    M = np.floor(
        np.array([r.embedding for r in emb], dtype=np.float64) * 1000 + 0.5
    ).astype(np.int64)
    e = (M * M).sum(axis=0)
    order = sorted(range(64), key=lambda d: (-e[d], d))
    assign = sorted((r % 8, r // 8, d) for r, d in enumerate(order))
    pi = [d for _s, _p, d in assign]
    P = M[:, pi]
    skey = np.array([int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) for i in ids])
    samp = P[np.lexsort((ids, skey))[:16]]
    sq_err = np.zeros(8, dtype=np.int64)
    for s in range(8):
        x = P[:, s * 8 : (s + 1) * 8]
        cb = samp[:, s * 8 : (s + 1) * 8]
        d2 = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(axis=-1)
        sq_err[s] = d2.min(axis=1).sum()
    rows = all_queries()["emb_opq_distortion"].spark(spark, sf_dir).collect()
    assert len(rows) == 8
    for r in rows:
        s = int(r.subspace)
        assert r.sq_err == sq_err[s]
        assert r.energy == int(P[:, s * 8 : (s + 1) * 8].astype(object).__pow__(2).sum())
        assert r.distortion == r.sq_err / r.energy
    perm_en = sorted(r.energy for r in rows)
    ident = all_queries()["emb_pq_distortion"].spark(spark, sf_dir).collect()
    ident_en = sorted(r.energy for r in ident)
    assert perm_en[-1] / perm_en[0] <= ident_en[-1] / ident_en[0]


def test_lsh_precision_recall_contract(spark, sf_dir):
    """P/R equal a driver-side set comparison of the graded candidate
    and exact-pair substrates; recall is monotone non-decreasing in the
    threshold (higher-similarity pairs are easier for LSH)."""
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.llm_pipeline import jaccard_pair_stats_df

    cand = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["docs_minhash_pairs"].spark(spark, sf_dir).collect()
    }
    j = jaccard_pair_stats_df(spark, sf_dir).collect()
    rows = sorted(
        all_queries()["docs_lsh_precision_recall"].spark(spark, sf_dir).collect(),
        key=lambda r: r.thr,
    )
    prev_recall = -1.0
    for r in rows:
        truth = {
            (x.doc_a, x.doc_b) for x in j if x.n_common * 100 >= r.thr * x.un
        }
        hit = truth & cand
        assert (r.n_truth, r.n_cand, r.n_hit) == (len(truth), len(cand), len(hit))
        assert r.precision == len(hit) / len(cand)
        assert r.recall == len(hit) / len(truth)
        assert r.recall >= prev_recall
        prev_recall = r.recall


def test_text_vs_embedding_dedup_contract(spark, sf_dir):
    """Class counts equal a driver-side set comparison of the two graded
    pair substrates, and the classes partition the union."""
    from watsondedupe_spark.queries import all_queries

    tp = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["docs_jaccard_pairs"].spark(spark, sf_dir).collect()
    }
    ep = {
        (r.vec_a, r.vec_b)
        for r in all_queries()["emb_near_dup_pairs"].spark(spark, sf_dir).collect()
    }
    rows = all_queries()["docs_text_vs_embedding_dedup"].spark(spark, sf_dir).collect()
    got = {r.agreement: r.n_pairs for r in rows}
    want = {
        "both": len(tp & ep),
        "text_only": len(tp - ep),
        "embedding_only": len(ep - tp),
    }
    want = {k: v for k, v in want.items() if v}
    assert got == want
    assert sum(got.values()) == len(tp | ep)


def test_langid_confusion_contract(spark, sf_dir):
    """Cells equal a driver-side recount over the graded predictions,
    each actual language's row_rates sum to 1, and cell counts
    partition the corpus."""
    from collections import Counter

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    pred = {
        r.doc_id: r.pred_lang
        for r in all_queries()["docs_langid"].spark(spark, sf_dir).collect()
    }
    actual = {
        r.doc_id: r.lang
        for r in read_table(spark, sf_dir, "documents").select("doc_id", "lang").collect()
    }
    cells = Counter((actual[d], pred[d]) for d in pred)
    rows = all_queries()["docs_langid_confusion"].spark(spark, sf_dir).collect()
    got = {(r.actual_lang, r.pred_lang): r for r in rows}
    assert set(got) == set(cells)
    assert sum(r.n_docs for r in rows) == len(pred)
    totals = Counter(actual[d] for d in pred)
    by_actual = Counter()
    for r in rows:
        assert r.n_docs == cells[(r.actual_lang, r.pred_lang)]
        assert r.row_rate == r.n_docs / totals[r.actual_lang]
        by_actual[r.actual_lang] += r.row_rate
    for lang, s in by_actual.items():
        assert abs(s - 1.0) < 1e-12


def test_vocab_coverage_curve_contract(spark, sf_dir):
    """Coverage equals a driver-side recount at every cut, is monotone
    non-decreasing in the cut, and hits 1.0 once the cut spans the
    whole vocabulary."""
    from collections import Counter

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.pipeline_ext import _COVERAGE_CUTS
    from watsondedupe_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("text").collect()
    cnt = Counter(t for r in docs for t in r.text.split(" ") if t)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    rows = sorted(
        all_queries()["docs_vocab_coverage_curve"].spark(spark, sf_dir).collect(),
        key=lambda r: r.cut,
    )
    assert [r.cut for r in rows] == list(_COVERAGE_CUTS)
    prev = -1.0
    for r in rows:
        want = sum(c for _, c in ranked[: r.cut])
        assert (r.covered_tokens, r.total_tokens, r.vocab_size) == (
            want, total, len(cnt)
        )
        assert r.coverage == want / total
        assert r.coverage >= prev
        prev = r.coverage
        if r.cut >= len(cnt):
            assert r.coverage == 1.0


def test_mixture_diversity_contract(spark, sf_dir):
    """Indices equal a driver-side recount: simpson = sum p^2,
    effective_sources = 1/simpson, top_share = max share; effective
    sources never exceeds the source count."""
    from collections import Counter

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("lang", "source").collect()
    per = Counter((r.lang, r.source) for r in docs)
    rows = all_queries()["docs_mixture_diversity"].spark(spark, sf_dir).collect()
    langs = {lang for lang, _ in per}
    assert {r.lang for r in rows} == langs
    for r in rows:
        ns = {s: n for (lg, s), n in per.items() if lg == r.lang}
        t = sum(ns.values())
        ss = sum(n * n for n in ns.values())
        assert (r.n_sources, r.n_docs) == (len(ns), t)
        assert r.simpson == ss / (t * t)
        assert r.effective_sources == (t * t) / ss
        assert r.top_share == max(ns.values()) / t
        assert r.effective_sources <= r.n_sources + 1e-9


def test_vector_quality_contract(spark, sf_dir):
    """Classes partition the corpus, bounds come from the 1/99
    percentile_disc of integer norms, and a driver-side reclassification
    agrees cell for cell."""
    import math
    from collections import defaultdict

    import numpy as np

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    emb = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    M = np.floor(
        np.array([r.embedding for r in emb], dtype=np.float64) * 1000 + 0.5
    ).astype(np.int64)
    nrm2 = (M * M).sum(axis=1)
    zero_dims = (M == 0).sum(axis=1)
    vs = sorted(nrm2.tolist())

    def disc(q):
        return vs[max(0, math.ceil(q * len(vs)) - 1)]

    lo, hi = disc(0.01), disc(0.99)
    want = defaultdict(lambda: [0, None, None, 0])
    for n2, zd in zip(nrm2.tolist(), zero_dims.tolist()):
        c = (
            "zero" if n2 == 0
            else "low_norm" if n2 < lo
            else "high_norm" if n2 > hi
            else "normal"
        )
        w = want[c]
        w[0] += 1
        w[1] = n2 if w[1] is None else min(w[1], n2)
        w[2] = n2 if w[2] is None else max(w[2], n2)
        w[3] += zd
    rows = all_queries()["emb_vector_quality"].spark(spark, sf_dir).collect()
    got = {r.quality: r for r in rows}
    assert set(got) == set(want)
    assert sum(r.n_vectors for r in rows) == len(emb)
    for c, (n, mn, mx, zd) in want.items():
        r = got[c]
        assert (r.n_vectors, r.min_nrm2, r.max_nrm2, r.total_zero_dims) == (n, mn, mx, zd)


def test_dedup_impact_audit_contract(spark, sf_dir):
    """Cells equal a driver-side recount against the graded canonical
    set; kept docs equal the canonical count; per-source shares of
    kept+dropped sum to 1."""
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    canon = {
        r.canonical_doc
        for r in all_queries()["docs_canonical_per_cluster"].spark(spark, sf_dir).collect()
    }
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text"
    ).collect()
    want = defaultdict(lambda: [0, 0, 0])
    src_docs = defaultdict(int)
    for r in docs:
        src_docs[r.source] += 1
        st = "kept" if r.doc_id in canon else "dropped"
        w = want[(st, r.source)]
        w[0] += 1
        w[1] += r.n_chars
        w[2] += len(r.text.split(" "))
    rows = all_queries()["docs_dedup_impact_audit"].spark(spark, sf_dir).collect()
    got = {(r.status, r.source): r for r in rows}
    assert set(got) == set(want)
    assert sum(r.n_docs for r in rows if r.status == "kept") == len(canon)
    share = defaultdict(float)
    for r in rows:
        n, ch, tk = want[(r.status, r.source)]
        assert (r.n_docs, r.total_chars, r.total_tokens) == (n, ch, tk)
        assert r.mean_chars == ch / n
        assert r.share_of_source == n / src_docs[r.source]
        share[r.source] += r.share_of_source
    for s, v in share.items():
        assert abs(v - 1.0) < 1e-12


def test_length_ks_drift_contract(spark, sf_dir):
    """KS numerators equal a scipy-free driver recomputation over exact
    ECDFs (cross-multiplied integers), at_length attains the max, and
    D is in [0, 1]."""
    from collections import Counter, defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.sources import read_table

    docs = read_table(spark, sf_dir, "documents").select("source", "n_chars").collect()
    per = defaultdict(Counter)
    for r in docs:
        per[r.source][r.n_chars] += 1
    total = len(docs)
    xs = sorted({r.n_chars for r in docs})
    rows = all_queries()["docs_length_ks_drift"].spark(spark, sf_dir).collect()
    got = {r.source: r for r in rows}
    assert set(got) == set(per)
    for src, cnt in per.items():
        t1 = sum(cnt.values())
        t2 = total - t1
        rest = Counter()
        for s2, c2 in per.items():
            if s2 != src:
                rest.update(c2)
        cs = cr = 0
        best, at = -1, None
        for x in xs:
            cs += cnt.get(x, 0)
            cr += rest.get(x, 0)
            d = abs(cs * t2 - cr * t1)
            if d > best:
                best, at = d, x
        r = got[src]
        assert (r.n_source, r.n_rest, r.ks_num, r.at_length) == (t1, t2, best, at)
        assert r.ks_d == best / (t1 * t2)
        assert 0.0 <= r.ks_d <= 1.0


def test_mutual_knn_pairs_matches_bruteforce(spark, sf_dir):
    """The bucket-bounded reciprocal-kNN graph equals a plain-Python
    reference: same quantized cosines, same per-source top-k ranks over
    the same bucket-restricted candidates, reciprocity both ways."""
    import math
    from collections import defaultdict

    from watsondedupe_spark.operators.similarity import _plane_sign
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.pipeline_ext import _MUTUAL_K, _mutual_planes
    from watsondedupe_spark.sources import read_table

    rows = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").collect()
    _MUTUAL_PLANES = _mutual_planes(len(rows))  # == the floor (4) at fixture size
    vecs = {r.vec_id: [int(math.floor(float(x) * 1000 + 0.5)) for x in r.embedding] for r in rows}
    raw = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def bucket(vid):
        b = 0
        for j in range(1, _MUTUAL_PLANES + 1):
            proj = 0.0
            for i, x in enumerate(raw[vid], start=1):
                proj += x * _plane_sign(j, i)
            if proj >= 0:
                b |= 1 << (j - 1)
        return b

    buckets = defaultdict(list)
    for vid in vecs:
        buckets[bucket(vid)].append(vid)

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        dot = sum(x * y for x, y in zip(va, vb))
        na = sum(x * x for x in va)
        nb = sum(y * y for y in vb)
        return dot / math.sqrt(na) / math.sqrt(nb)

    topk = {}
    for members in buckets.values():
        for src in members:
            cand = sorted(
                ((-cos(src, dst), dst) for dst in members if dst != src)
            )[:_MUTUAL_K]
            topk[src] = {dst: rnk for rnk, (_, dst) in enumerate(cand, start=1)}

    expected = {}
    for src, nbrs in topk.items():
        for dst, rnk in nbrs.items():
            if src < dst and src in topk.get(dst, {}):
                expected[(src, dst)] = (rnk, topk[dst][src], cos(src, dst))

    got = all_queries()["emb_mutual_knn_pairs"].spark(spark, sf_dir).collect()
    assert {(r.vec_a, r.vec_b): (r.rank_ab, r.rank_ba, r.cosine) for r in got} == expected
    assert expected  # non-degenerate: sf0.001 must yield at least one pair


def test_pagerank_matches_sequential_fixed_point(spark, sf_dir):
    """The distributed fixed-point PageRank equals a sequential Python
    run of the same integer recurrence over the same candidate graph,
    and total mass stays conserved to within the flooring loss."""
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.llm_pipeline import (
        _PR_ROUNDS, _PR_TICK, docs_minhash_pairs,
    )

    pairs = docs_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    adj = defaultdict(set)
    for r in pairs:
        adj[r.doc_a].add(r.doc_b)
        adj[r.doc_b].add(r.doc_a)

    ranks = {v: _PR_TICK for v in adj}
    teleport = 15 * _PR_TICK // 100
    for _ in range(_PR_ROUNDS):
        nxt = {v: teleport for v in adj}
        for u, nbrs in adj.items():
            share = (85 * (ranks[u] // len(nbrs))) // 100
            for v in nbrs:
                nxt[v] += share
        ranks = nxt

    got = all_queries()["docs_dup_graph_pagerank"].spark(spark, sf_dir).collect()
    assert {r.doc_id: (r.degree, r.rank_ticks) for r in got} == {
        v: (len(adj[v]), ranks[v]) for v in adj
    }
    assert got  # the sf0.001 fixture must contain a candidate graph
    for r in got:
        assert r.pagerank == r.rank_ticks / _PR_TICK
    # mass conservation: sum(ranks) ~ N * TICK, short only by floor loss
    n = len(adj)
    total = sum(ranks.values())
    assert n * _PR_TICK * 0.80 <= total <= n * _PR_TICK


def test_lsh_capacity_plan_matches_reference(spark, sf_dir):
    """Predicted pair counts equal a plain-Python bucket histogram at
    every plane choice, coarse buckets are exact masks of the 8-plane
    bucket, and cost decreases monotonically with plane count."""
    from collections import Counter

    from watsondedupe_spark.operators.similarity import _plane_sign
    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.pipeline_ext import (
        _CAP_MAX_PLANES, _CAP_PLANE_CHOICES,
    )
    from watsondedupe_spark.sources import read_table

    rows = read_table(spark, sf_dir, "embeddings").select("embedding").collect()

    def bucket8(vec):
        b = 0
        for j in range(1, _CAP_MAX_PLANES + 1):
            proj = sum(float(x) * _plane_sign(j, i) for i, x in enumerate(vec, start=1))
            if proj >= 0:
                b |= 1 << (j - 1)
        return b

    b8 = [bucket8(r.embedding) for r in rows]
    got = {r.n_planes: r for r in all_queries()["emb_lsh_capacity_plan"].spark(spark, sf_dir).collect()}
    assert set(got) == set(_CAP_PLANE_CHOICES)
    prev_pairs = None
    for p in sorted(_CAP_PLANE_CHOICES, reverse=True):
        hist = Counter(b % (1 << p) for b in b8)
        r = got[p]
        assert r.n_buckets_used == len(hist)
        assert r.max_bucket == max(hist.values())
        assert r.predicted_pairs == sum(n * (n - 1) // 2 for n in hist.values())
        if prev_pairs is not None:
            assert r.predicted_pairs >= prev_pairs  # coarser -> more pairs
        prev_pairs = r.predicted_pairs


def test_cluster_density_audit_matches_reference(spark, sf_dir):
    """Edge counts, density, and the chain-risk flag equal a plain-Python
    union-find over the same candidate pairs."""
    from collections import defaultdict

    from watsondedupe_spark.queries import all_queries
    from watsondedupe_spark.queries.llm_pipeline import docs_minhash_pairs

    pairs = [
        (r.doc_a, r.doc_b)
        for r in docs_minhash_pairs(spark, sf_dir).select("doc_a", "doc_b").collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    members = defaultdict(set)
    for x in parent:
        members[find(x)].add(x)
    edge_cnt = defaultdict(int)
    for a, b in pairs:
        edge_cnt[find(a)] += 1

    got = {r.cluster_id: r for r in all_queries()["docs_cluster_density_audit"].spark(spark, sf_dir).collect()}
    expected = {min(ms): (len(ms), edge_cnt[root]) for root, ms in members.items() if len(ms) >= 2}
    assert {cid: (r.size, r.n_edges) for cid, r in got.items()} == expected
    for r in got.values():
        possible = r.size * (r.size - 1) // 2
        assert r.n_possible == possible
        assert r.density == r.n_edges / possible
        assert r.is_chain_risk == (1 if r.n_edges < r.size else 0)
        assert r.n_edges >= r.size - 1  # connectivity lower bound


def test_cluster_repair_is_a_refinement(spark, sf_dir):
    """Repair may only SPLIT flagged clusters, never merge across
    original clusters, never touch unflagged docs, and every surviving
    repaired edge-set keeps labels = min doc_id per component."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from watsondedupe_spark.queries import all_queries

    rows = all_queries()["docs_cluster_repair"].spark(spark, sf_dir).collect()
    audit = {
        r.cluster_id: r
        for r in all_queries()["docs_cluster_density_audit"].spark(spark, sf_dir).collect()
    }
    by_new = defaultdict(set)
    for r in rows:
        if r.was_flagged == 0:
            # unflagged docs keep their label verbatim
            assert r.repaired_cluster_id == r.cluster_id
            # and their cluster is either a singleton or not chain-risk
            a = audit.get(r.cluster_id)
            assert a is None or a.is_chain_risk == 0
        else:
            a = audit.get(r.cluster_id)
            assert a is not None and a.is_chain_risk == 1
        by_new[r.repaired_cluster_id].add(r)
    # refinement: each repaired cluster lives inside ONE original cluster
    for new_id, members in by_new.items():
        assert len({m.cluster_id for m in members}) == 1
        # min-label convention: the repaired id is the min member doc_id
        assert new_id == min(m.doc_id for m in members)
