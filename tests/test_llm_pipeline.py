

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
