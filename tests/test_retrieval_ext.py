"""Semantics + plan-shape tests for the round-4 batch-2 operators
(queries/retrieval_ext.py): hybrid RRF retrieval, CCNet quality
buckets, BPE tokenizer training (pair scoring, graded merge round,
multi-round trainer vs a reference implementation), winnowing
fingerprints + candidate pairs, embedding dim stats, the dedup
threshold sweep, the ANN recall audit, incremental PQ index appends,
n-gram novelty, per-source dup audit, the sampled dup-rate estimate,
and rendezvous resharding."""

import pytest
from pyspark.sql import functions as F

from watsondedupe_spark import plans as P
from watsondedupe_spark.queries import all_queries


def q(name, spark, sf_dir):
    return all_queries()[name].spark(spark, sf_dir)


# ---------------------------------------------------------------------------
# hybrid RRF
# ---------------------------------------------------------------------------


def test_hybrid_rrf_rank_and_score_contract(spark, sf_dir):
    rows = q("docs_hybrid_rrf", spark, sf_dir).collect()
    assert 0 < len(rows) <= 100  # at most 2 x top-K candidates
    by_id = {r.doc_id: r for r in rows}
    # every row carries at least one arm's rank, and each rank set is a
    # prefix of 1..K without gaps or duplicates
    lex = sorted(r.lex_rnk for r in rows if r.lex_rnk is not None)
    sem = sorted(r.sem_rnk for r in rows if r.sem_rnk is not None)
    assert lex == list(range(1, len(lex) + 1))
    assert sem == list(range(1, len(sem) + 1))
    for r in rows:
        assert r.lex_rnk is not None or r.sem_rnk is not None
        want = (1.0 / (60 + r.lex_rnk) if r.lex_rnk is not None else 0.0) + (
            1.0 / (60 + r.sem_rnk) if r.sem_rnk is not None else 0.0
        )
        assert r.rrf == want
    # a doc ranked by both arms must outscore a doc ranked only at the
    # same position in one arm
    both = [r for r in rows if r.lex_rnk is not None and r.sem_rnk is not None]
    for r in both:
        solo = [
            s
            for s in rows
            if s.doc_id != r.doc_id
            and s.sem_rnk is None
            and s.lex_rnk is not None
            and s.lex_rnk >= r.lex_rnk
        ]
        for s in solo:
            assert r.rrf > s.rrf


def test_hybrid_rrf_topk_is_take_ordered_not_global_window(spark, sf_dir):
    """Candidate generation must be distributed TakeOrdered; the rank
    windows run over the <=K survivors only. The probe vector and the
    corpus stats broadcast."""
    df = q("docs_hybrid_rrf", spark, sf_dir)
    plan = P.physical_plan(df)
    # one TakeOrdered per arm (formatted plans list nodes twice —
    # tree + detail — so two operators appear as four mentions)
    assert plan.count("TakeOrderedAndProject") >= 2
    # corpus stats and the probe vector are 1-row broadcast builds
    # (BroadcastNestedLoopJoin with no condition — not a hash join)
    assert "BroadcastNestedLoopJoin" in plan
    # the fusion join runs over <= 2K rank rows, never corpus-sized
    assert "Join type: FullOuter" in plan


# ---------------------------------------------------------------------------
# quality buckets
# ---------------------------------------------------------------------------


def test_quality_buckets_are_per_lang_tertiles(spark, sf_dir):
    rows = q("docs_quality_buckets", spark, sf_dir).collect()
    assert rows
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    for lang, rs in by_lang.items():
        sizes = {b: sum(1 for r in rs if r.bucket == b) for b in (1, 2, 3)}
        # ntile: bucket sizes differ by at most one, head first
        assert max(sizes.values()) - min(v for v in sizes.values() if v or True) <= 1
        # head docs score >= tail docs within the language
        head = [r.avg_token_freq for r in rs if r.bucket == 1]
        tail = [r.avg_token_freq for r in rs if r.bucket == 3]
        if head and tail:
            assert min(head) >= max(tail)
        tiers = {r.bucket: r.tier for r in rs}
        assert all(
            tiers[b] == t for b, t in ((1, "head"), (2, "middle"), (3, "tail")) if b in tiers
        )


# ---------------------------------------------------------------------------
# BPE pair scores
# ---------------------------------------------------------------------------


def test_bpe_pair_scores_on_crafted_corpus(spark, tmp_path):
    """'low lower lowest' x known frequencies: pair counts must equal
    hand-computed adjacent-pair totals weighted by word frequency."""
    docs = spark.createDataFrame(
        [
            (0, "low low lower", "en", "s", 13),
            (1, "low lowest", "en", "s", 10),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.pair: (r.pair_count, r.n_types)
        for r in q("docs_bpe_pair_scores", spark, str(tmp_path)).collect()
    }
    # freq: low=3, lower=1, lowest=1
    # 'lo': 3+1+1=5 from 3 types; 'ow': same; 'we': lower+lowest=2 (2 types)
    assert out["lo"] == (5, 3)
    assert out["ow"] == (5, 3)
    assert out["we"] == (2, 2)
    assert out["er"] == (1, 1)
    assert out["st"] == (1, 1)


def test_bpe_pair_scores_vocab_bounded_shuffle(spark, sf_dir):
    # the pair explode must run on the distinct-word table (vocab), not
    # the raw token stream; partial aggregation collapses map-side
    df = q("docs_bpe_pair_scores", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert "TakeOrderedAndProject" in P.physical_plan(df)


# ---------------------------------------------------------------------------
# winnowing
# ---------------------------------------------------------------------------


def test_winnowing_guarantee_on_shared_substring(spark, tmp_path):
    """Two docs sharing a long substring must share a fingerprint
    (the winnowing guarantee: any match of length >= k+w-1 = 11 is
    caught); a doc with disjoint content must not share its prints."""
    shared = "abcdefghijklmnopqrstuv"  # 22 chars of common text
    docs = spark.createDataFrame(
        [
            (0, "XXX" + shared + "YYY", "en", "s", 28),
            (1, "QQQQ" + shared + "ZZ", "en", "s", 28),
            (2, "0123456789" * 3, "en", "s", 30),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    rows = q("docs_winnowing", spark, str(tmp_path)).collect()
    prints = {}
    for r in rows:
        prints.setdefault(r.doc_id, set()).add(r.gram_hash)
    assert prints[0] & prints[1], "shared substring must share a fingerprint"
    assert not (prints[0] & prints[2])
    assert not (prints[1] & prints[2])


def test_winnowing_selects_every_window_min(spark, tmp_path):
    """Brute-force reference on one small doc: the distinct set of
    per-window (min-hash, leftmost-pos) picks must match exactly."""
    import hashlib

    text = "the quick brown fox jumps over the lazy dog again"
    docs = spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    k, w, base = 8, 4, 1 << 20
    n_grams = len(text) - k + 1
    combs = []
    for p in range(1, n_grams + 1):
        gram = text[p - 1 : p - 1 + k]
        h = int(hashlib.md5(gram.encode()).hexdigest()[:10], 16)
        combs.append(h * base + p)
    want = set()
    for s in range(n_grams - w + 1):
        fp = min(combs[s : s + w])
        want.add((fp % base, fp // base))
    got = {
        (r.sel_pos, r.gram_hash)
        for r in q("docs_winnowing", spark, str(tmp_path)).collect()
    }
    assert got == want


def test_winnowing_no_global_sort(spark, sf_dir):
    # per-doc windows only: no single-partition exchange anywhere
    df = q("docs_winnowing", spark, sf_dir)
    plan = P.physical_plan(df).lower()
    assert "singlepartition" not in plan
    assert not P.has_cartesian(df)


# ---------------------------------------------------------------------------
# dim stats
# ---------------------------------------------------------------------------


def test_dim_stats_match_numpy(spark, sf_dir):
    import numpy as np

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    mat = np.floor(np.array([r.embedding for r in emb], dtype="float64") * 1000 + 0.5)
    rows = q("emb_dim_stats", spark, sf_dir).collect()
    assert len(rows) == 64
    for r in rows:
        col = mat[:, r.dim - 1]
        assert r.n_vecs == len(col)
        assert r.min_q == int(col.min()) and r.max_q == int(col.max())
        assert r.mean_q == pytest.approx(col.mean(), abs=1e-12)
        assert r.var_q == pytest.approx(col.var(), rel=1e-12)


def test_dim_stats_is_one_partial_agg(spark, sf_dir):
    df = q("emb_dim_stats", spark, sf_dir)
    assert P.has_partial_aggregation(df)
    assert P.shuffle_count(df) == 1  # one exchange on the 64-dim key


# ---------------------------------------------------------------------------
# threshold sweep
# ---------------------------------------------------------------------------


def test_threshold_sweep_is_monotone_and_consistent(spark, sf_dir):
    rows = {r.thr: r for r in q("docs_dedup_threshold_sweep", spark, sf_dir).collect()}
    assert sorted(rows) == [50, 60, 70, 80, 90]
    # raising the threshold can only shrink the curve
    for lo, hi in zip([50, 60, 70, 80], [60, 70, 80, 90]):
        assert rows[lo].n_pairs >= rows[hi].n_pairs
        assert rows[lo].n_docs_dropped >= rows[hi].n_docs_dropped
    for r in rows.values():
        assert r.n_docs_dropped <= r.n_pairs
    # cross-check one point against the graded jaccard query (>= 0.5
    # pairs are a subset of its >= 0.4 output, exact integer condition)
    jac = q("docs_jaccard_pairs", spark, sf_dir).collect()
    n_50 = sum(1 for r in jac if r.jaccard >= 0.5)
    assert rows[50].n_pairs == n_50


def test_threshold_sweep_broadcasts_thresholds(spark, sf_dir):
    df = q("docs_dedup_threshold_sweep", spark, sf_dir)
    # the tiny threshold-literal table must fan out as a broadcast
    # nested-loop (never a corpus-side shuffle on a synthetic key);
    # shuffled HASH joins are expected here since round 7 — the shared
    # jaccard substrate pins its sizes joins shuffle-hash so the pair
    # table can never be broadcast at corpus scale
    plan = P.physical_plan(df)
    assert "BroadcastNestedLoopJoin" in plan or P.uses_broadcast_join(df)
    # the only nested-loop allowed is the 5-row threshold fan-out (a
    # deliberate literal crossJoin); a corpus-side cartesian would show
    # as a second one or a CartesianProduct
    import re

    assert plan.count("CartesianProduct") == 0
    # formatted plans print each node twice (tree + details): count
    # distinct node ids
    assert len(re.findall(r"\(\d+\) BroadcastNestedLoopJoin", plan)) <= 1
    assert P.has_partial_aggregation(df)


# ---------------------------------------------------------------------------
# BPE trainer
# ---------------------------------------------------------------------------


def _ref_bpe(word_freqs, n_merges):
    """Reference BPE (Sennrich et al. 2016): dict-based, single process.
    Greedy left-to-right merge application; argmax tiebreak (count DESC,
    pair ASC) matches the operator's contract."""
    vocab = {w: [*w] for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            syms = vocab[w]
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        (a, b) = best[0]
        merges.append((a, b))
        for w in vocab:
            syms, out = vocab[w], []
            for x in syms:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            vocab[w] = out
    return merges, vocab


def test_bpe_train_matches_reference(spark, tmp_path):
    corpus = (
        "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest banana bandana"
    )
    docs = spark.createDataFrame(
        [(0, corpus, "en", "s", len(corpus))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from watsondedupe_spark.operators.text import bpe_train, bpe_word_vocab

    wf = {}
    for w in corpus.split():
        wf[w] = wf.get(w, 0) + 1
    ref_merges, ref_vocab = _ref_bpe(wf, 8)

    merges, final = bpe_train(bpe_word_vocab(docs), 8)
    assert merges == ref_merges
    got = {r.word: list(r.syms) for r in final.collect()}
    assert got == ref_vocab
    # every word reconstructs from its symbols
    for w, syms in got.items():
        assert "".join(syms) == w


def test_bpe_segment_applies_trained_merges(spark):
    from watsondedupe_spark.operators.text import bpe_segment

    df = spark.createDataFrame([("lowest",), ("slower",)], "word string")
    out = {
        r.word: list(r.syms)
        for r in bpe_segment(df, [("l", "o"), ("lo", "w"), ("e", "s")]).collect()
    }
    assert out["lowest"] == ["low", "es", "t"]
    assert out["slower"] == ["s", "low", "e", "r"]


def test_bpe_merge_round_overlap_semantics(spark, tmp_path):
    """Runs of a doubled character merge at odd offsets only (greedy
    left-to-right): 'aaaa' -> [aa, aa], 'aaa' -> [aa, a]."""
    docs = spark.createDataFrame(
        [(0, "aaaa aaa aa aaaa", "en", "s", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.word: r.syms for r in q("docs_bpe_merge_round", spark, str(tmp_path)).collect()}
    assert out == {"aaaa": "aa aa", "aaa": "aa a", "aa": "aa"}


def test_bpe_fold_property_vs_reference(spark):
    """Property check over a dense two-letter space: every word of
    length <= 6 over {a, b}, four training rounds — the distributed
    fold must match the reference on all overlap shapes at once."""
    import itertools

    words = [
        "".join(t)
        for n in range(1, 7)
        for t in itertools.product("ab", repeat=n)
    ]
    wf = {w: (i % 5) + 1 for i, w in enumerate(words)}
    text = " ".join(w for w, f in wf.items() for _ in range(f))
    docs = spark.createDataFrame(
        [(0, text, "en", "s", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    from watsondedupe_spark.operators.text import bpe_train, bpe_word_vocab

    ref_merges, ref_vocab = _ref_bpe(wf, 4)
    merges, final = bpe_train(bpe_word_vocab(docs), 4)
    assert merges == ref_merges
    assert {r.word: list(r.syms) for r in final.collect()} == ref_vocab


def test_ngram_novelty_bounds_and_first_doc(spark, sf_dir):
    rows = q("docs_ngram_novelty", spark, sf_dir).collect()
    assert rows
    by_id = {r.doc_id: r for r in rows}
    # the lowest-id doc with grams contributes only novel grams
    first = min(by_id)
    assert by_id[first].n_novel == by_id[first].n_grams
    for r in rows:
        assert 0 <= r.n_novel <= r.n_grams
        assert r.novelty == pytest.approx(r.n_novel / r.n_grams)


def test_pq_index_append_matches_full_build(spark, sf_dir):
    """Incremental index maintenance: frozen centroids + codebooks mean
    append-encode of a new batch is row-identical to a from-scratch
    encode of the grown corpus, and queries can't tell the difference."""
    from pyspark.sql import functions as SF

    from watsondedupe_spark.operators.similarity import (
        ann_topk_ivfpq,
        ivf_assign_np,
        ivf_centroids,
        pq_codebooks,
        pq_encode,
        pq_index_append,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    old = emb.filter(SF.col("vec_id") < 400)
    new = emb.filter(SF.col("vec_id") >= 400)
    # artifacts frozen at initial-build time, from the OLD corpus only
    cents = ivf_centroids(old, 16)
    cbs = pq_codebooks(old, m=8, ks=16)

    def build(corpus):
        assigned = ivf_assign_np(corpus, cents, n_probe=1, quantize=1000)
        return pq_encode(assigned, cbs, quantize=1000, keep_cols=("centroid_id",))

    codes_old = build(old)
    codes_incr = pq_index_append(codes_old, new, cents, cbs)
    codes_full = build(emb)
    as_set = lambda df: {
        (r.vec_id, tuple(r.codes), r.centroid_id) for r in df.collect()
    }
    assert as_set(codes_incr) == as_set(codes_full)

    q3 = emb.filter(SF.col("vec_id").isin(0, 1, 2))
    res = lambda codes: {
        (r.query_id, r.neighbor_id, r.adist, r.rank)
        for r in ann_topk_ivfpq(
            emb, q3, k=10, quantize=1000, cents=cents, codebooks=cbs, codes=codes
        ).collect()
    }
    assert res(codes_incr) == res(codes_full)


# ---------------------------------------------------------------------------
# ANN recall audit
# ---------------------------------------------------------------------------


def test_ann_recall_matches_direct_comparison(spark, sf_dir):
    """The audit's recall must equal a hand comparison of the two
    constituent (already-graded) queries' outputs."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in q("emb_knn_cosine", spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in q("emb_ann_topk_lsh", spark, sf_dir).collect()
    }
    rows = q("emb_ann_recall_audit", spark, sf_dir).collect()
    assert {r.query_id for r in rows} == {p[0] for p in exact}
    for r in rows:
        e = {n for qq, n in exact if qq == r.query_id}
        a = {n for qq, n in approx if qq == r.query_id}
        assert r.n_exact == len(e)
        assert r.n_hits == len(e & a)
        assert r.recall == pytest.approx(len(e & a) / len(e))
        assert 0.0 <= r.recall <= 1.0


# ---------------------------------------------------------------------------
# per-source duplication audit
# ---------------------------------------------------------------------------


def test_dup_ratio_by_source_consistent_with_clusters(spark, sf_dir):
    cl = {r.doc_id: r.cluster_id for r in q("docs_dup_clusters", spark, sf_dir).collect()}
    from collections import Counter

    sizes = Counter(cl.values())
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source").collect()
    want = {}
    for r in docs:
        n, d = want.get(r.source, (0, 0))
        want[r.source] = (n + 1, d + (1 if sizes[cl[r.doc_id]] >= 2 else 0))
    rows = q("docs_dup_ratio_by_source", spark, sf_dir).collect()
    assert {r.source for r in rows} == set(want)
    for r in rows:
        n, d = want[r.source]
        assert (r.n_docs, r.n_dup_docs) == (n, d)
        assert r.dup_ratio == pytest.approx(d / n)


# ---------------------------------------------------------------------------
# rendezvous resharding
# ---------------------------------------------------------------------------


def test_rendezvous_moved_docs_go_only_to_new_shard(spark, sf_dir):
    """HRW property: adding shard 16 can only re-route docs TO it, and
    the overall moved fraction is near the theoretical 1/17."""
    import hashlib

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id").collect()

    def pick(doc_id, n):
        return max(
            range(n),
            key=lambda s: hashlib.md5(f"{doc_id}:{s}".encode()).hexdigest()
            + f"{s:02d}",
        )

    n_total = n_moved = 0
    for r in docs:
        old, new = pick(r.doc_id, 16), pick(r.doc_id, 17)
        n_total += 1
        if old != new:
            n_moved += 1
            assert new == 16, "a moved doc must land on the NEW shard"
    rows = q("docs_rendezvous_reshard", spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == n_total
    assert sum(r.n_moved for r in rows) == n_moved
    # expectation 1/17 ~ 5.9%; allow generous sampling slack
    assert n_moved / n_total < 0.2


def test_rendezvous_assignment_is_row_local(spark, sf_dir):
    df = q("docs_rendezvous_reshard", spark, sf_dir)
    # the 16-group rollup plus (small-corpus only) the scan-width
    # round-robin from _docs_parallel; the argmax itself adds none
    assert P.shuffle_count(df) <= 2
    assert not P.has_cartesian(df)
    plan = P.physical_plan(df)
    assert "array_max" in plan  # row-local argmax, no per-shard explode
    assert "Generate" not in plan


# ---------------------------------------------------------------------------
# winnowing pairs + dup-rate estimate
# ---------------------------------------------------------------------------


def test_winnowing_pairs_detect_shared_substrings(spark, tmp_path):
    shared = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            (0, "AAA " + shared + " BBB", "en", "s", 51),
            (1, "CC " + shared + " DD", "en", "s", 49),
            (2, "totally different content here with no overlap at all x", "en", "s", 56),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.parquet(str(tmp_path / "documents.parquet"))
    pairs = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in q("docs_winnowing_pairs", spark, str(tmp_path)).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] >= 3
    assert not any(2 in p for p in pairs)


def test_dup_rate_estimate_contract(spark, sf_dir):
    row = q("docs_dup_rate_estimate", spark, sf_dir).collect()[0]
    assert row.n_pairs_sampled <= row.n_pairs_exact
    assert row.est_pairs == row.n_pairs_sampled * 4
    if row.n_pairs_exact:
        assert row.est_over_exact == pytest.approx(
            row.est_pairs / row.n_pairs_exact
        )
    # the sampled arm equals a direct recount over gated endpoints
    jac = q("docs_jaccard_pairs", spark, sf_dir).collect()
    import hashlib

    def gated(doc_id):
        return hashlib.md5(f"dr:{doc_id}".encode()).hexdigest()[:8] < "80000000"

    n = sum(
        1
        for r in jac
        if r.n_common * 10 >= 4 * round(r.n_common / r.jaccard)
        and gated(r.doc_a)
        and gated(r.doc_b)
    )
    assert row.n_pairs_sampled == n


def test_ivfpq_recall_matches_direct_comparison(spark, sf_dir):
    exact = {
        (r.query_id, r.neighbor_id)
        for r in q("emb_knn_cosine", spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in q("emb_ann_topk_ivfpq", spark, sf_dir).collect()
    }
    for r in q("emb_ann_recall_ivfpq", spark, sf_dir).collect():
        e = {n for qq, n in exact if qq == r.query_id}
        a = {n for qq, n in approx if qq == r.query_id}
        assert r.n_hits == len(e & a)
        assert r.recall == pytest.approx(len(e & a) / len(e))


def test_multiprobe_recall_dominates_single_probe(spark, sf_dir):
    """Radius-1 multi-probe must return a superset-or-equal recall:
    every query's hit count vs exact search is >= the single-probe
    query's, and its candidate set contains the single-probe set."""
    exact = {}
    for r in q("emb_knn_cosine", spark, sf_dir).collect():
        exact.setdefault(r.query_id, set()).add(r.neighbor_id)
    single, multi = {}, {}
    for r in q("emb_ann_topk_lsh", spark, sf_dir).collect():
        single.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in q("emb_ann_topk_lsh_mp", spark, sf_dir).collect():
        multi.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(multi) >= set(single)
    for qq in exact:
        s_hits = len(exact[qq] & single.get(qq, set()))
        m_hits = len(exact[qq] & multi.get(qq, set()))
        assert m_hits >= s_hits


# ---------------------------------------------------------------------------
# IVF probe sweep
# ---------------------------------------------------------------------------


def test_ivf_probe_sweep_monotone(spark, sf_dir):
    """Recall is monotone non-decreasing in n_probe: any exact-top-10
    member reachable at probe width p stays reachable at p' > p (wider
    probing only adds candidate lists, and anything outscoring an exact
    member is itself an exact member), so hits can only grow."""
    from watsondedupe_spark.queries import all_queries

    rows = sorted(
        all_queries()["emb_ivf_probe_sweep"].spark(spark, sf_dir).collect(),
        key=lambda r: r.n_probe,
    )
    assert [r.n_probe for r in rows] == [1, 2, 4]
    assert all(r.n_exact == 30 for r in rows)  # 3 queries x k=10
    assert all(r.recall == r.n_hits / r.n_exact for r in rows)
    assert rows[0].n_hits <= rows[1].n_hits <= rows[2].n_hits
