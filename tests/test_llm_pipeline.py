

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
