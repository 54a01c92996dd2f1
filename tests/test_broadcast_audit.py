"""Unit tests for the no-corpus-broadcast audit itself (round 8).

The rule in ``plans.broadcast_audit`` is load-bearing (52 parametrized
plan tests and the registry-wide sweep ride on it), so its parser and
classifiers get direct coverage here: the balanced-expression splitter,
the alias/expression resolver, the leaf classifiers, and end-to-end
classifications on purpose-built toy plans.
"""

from pyspark.sql import functions as F

from watsondedupe_spark import plans as P


# -- pure-python parser pieces ------------------------------------------------


def test_split_top_respects_nesting():
    assert P._split_top("a#1, pmod(b#2, 16), cast(c#3 as string)") == [
        "a#1",
        "pmod(b#2, 16)",
        "cast(c#3 as string)",
    ]
    assert P._split_top("") == []
    assert P._split_top("struct(a, b)[0], x") == ["struct(a, b)[0]", "x"]


def test_defining_expr_balanced_backscan():
    details = "Output [2]: [pmod(xxhash64(t#5, 42), 4096) AS h#88, count#90L]"
    assert P._defining_expr(details, "h#88") == "pmod(xxhash64(t#5, 42), 4096)"
    # unknown attribute -> None
    assert P._defining_expr(details, "zz#1") is None


def test_key_is_bounded_via_expression_and_alias():
    details = "\n".join(
        [
            "Output [2]: [pmod(xxhash64(t#5, 42), 4096) AS h#88]",
            "Output [1]: [dayofweek(ts#3) AS dow#9]",
            "Output [1]: [lang#4 AS actual_lang#12]",
            "Output [1]: [doc_id#1 AS u#7L]",
        ]
    )
    assert P._key_is_bounded("h#88", details)  # pmod bucketing
    assert P._key_is_bounded("dow#9", details)  # calendar grain
    assert P._key_is_bounded("actual_lang#12", details)  # alias of bounded col
    assert P._key_is_bounded("source#2", details)  # whitelisted name
    assert not P._key_is_bounded("u#7L", details)  # alias of a corpus id
    assert not P._key_is_bounded("cluster_id#3L", details)


def test_leaf_classifiers():
    corpus_leaf = (
        "\nOutput [2]: [doc_id#0L, text#1]\n"
        "Location: InMemoryFileIndex [file:/data/sf/documents.parquet]\n"
        "PushedFilters: [IsNotNull(doc_id)]\n"
    )
    dim_leaf = (
        "\nOutput [2]: [r_regionkey#0L, r_name#1]\n"
        "Location: InMemoryFileIndex [file:/data/sf/region.parquet]\n"
    )
    sample_leaf = (
        "\nOutput [2]: [vec_id#0L, embedding#1]\n"
        "Location: InMemoryFileIndex [file:/data/sf/embeddings.parquet]\n"
        "PushedFilters: [IsNotNull(vec_id), LessThan(vec_id,3)]\n"
    )
    point_leaf = (
        "\nOutput [1]: [object_key#0]\n"
        "Location: InMemoryFileIndex [file:/store/objects/p001]\n"
        "PushedFilters: [EqualTo(object_key,k1)]\n"
    )
    assert P._leaf_is_corpus("Scan parquet", corpus_leaf)
    assert not P._leaf_is_corpus("Scan parquet", dim_leaf)
    assert P._leaf_is_corpus("Scan parquet", sample_leaf)
    assert not P._leaf_has_point_filter(corpus_leaf)
    assert P._leaf_has_point_filter(sample_leaf)  # literal id upper bound
    assert P._leaf_has_point_filter(point_leaf)
    # substrate leaf: corpus-ness from column markers
    assert P._leaf_is_corpus("Scan ExistingRDD", "\nOutput [1]: [doc_id#3L]\n")
    assert not P._leaf_is_corpus("Scan ExistingRDD", "\nOutput [1]: [centroid#3]\n")


# -- end-to-end toy plans ------------------------------------------------------


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_dim_broadcast_is_ok(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    dims = spark.read.parquet(f"{sf_dir}/region.parquet")
    df = docs.join(
        F.broadcast(dims.withColumnRenamed("r_regionkey", "doc_id")), "doc_id"
    )
    df.collect()
    assert P.corpus_broadcast_violations(df, strict=True) == []


def test_filtered_corpus_broadcast_is_scan_tracking(spark, sf_dir):
    """Filter/Project over a corpus scan: static estimate tracks file
    size, so even an explicit broadcast is classified ok (non-strict
    AND strict — there is no estimate breaker)."""
    docs = _docs(spark, sf_dir)
    small = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id", "source")
    df = docs.join(F.broadcast(small), "doc_id")
    df.collect()
    audit = P.broadcast_audit(df)
    assert audit and all(r["ok"] and not r.get("anchored") for r in audit)


def test_corpus_agg_broadcast_is_anchored_only(spark, sf_dir):
    """An aggregate keyed by a corpus id, explicitly broadcast: the
    finalized plan anchors it to the agg's measured shuffle stage —
    allowed by default, REJECTED under strict."""
    docs = _docs(spark, sf_dir)
    sizes = docs.groupBy("doc_id").agg(F.count("*").alias("n"))
    df = docs.join(F.broadcast(sizes), "doc_id")
    df.collect()
    audit = P.broadcast_audit(df)
    anchored = [r for r in audit if r.get("anchored")]
    assert anchored, audit
    assert P.corpus_broadcast_violations(df) == []
    assert P.corpus_broadcast_violations(df, strict=True) != []


def test_bounded_key_agg_broadcast_is_ok_even_strict(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    per_source = docs.groupBy("source").agg(F.count("*").alias("n"))
    df = docs.join(F.broadcast(per_source), "source")
    df.collect()
    assert P.corpus_broadcast_violations(df, strict=True) == []


def test_limited_sample_broadcast_is_ok_even_strict(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    sample = docs.select("doc_id").limit(5)
    df = docs.join(F.broadcast(sample), "doc_id")
    df.collect()
    assert P.corpus_broadcast_violations(df, strict=True) == []


def test_exploded_join_side_broadcast_is_violation(spark, sf_dir):
    """A join inside the broadcast side above its measured stages is an
    expanding chain — no anchor, unbounded keys: hard violation."""
    docs = _docs(spark, sf_dir)
    a = docs.select("doc_id", "source").groupBy("doc_id").agg(
        F.count("*").alias("na")
    )
    b = docs.select("doc_id", "lang").groupBy("doc_id").agg(
        F.count("*").alias("nb")
    )
    side = a.join(b, "doc_id")  # join above both measured stages
    df = docs.join(F.broadcast(side), "doc_id")
    df.collect()
    bad = P.corpus_broadcast_violations(df)
    assert bad, P.broadcast_audit(df)


# -- round-8 review fixes: pmod parsing, time grains, branch-aware funnels ----


def test_pmod_column_modulus_is_not_bounded():
    """A greedy regex anchored on the xxhash64 SEED literal here; the
    balanced-paren parser must see the real (column) modulus."""
    details = "Output [1]: [pmod(xxhash64(g#12, 42), n_buckets#9) AS h#88]"
    assert not P._key_is_bounded("h#88", details)
    # literal modulus with nested parens still classifies bounded
    details2 = (
        "Output [1]: [pmod(FLOOR(((event_id#1L * 4096) / 100000)), 4096) AS b#2L]"
    )
    assert P._key_is_bounded("b#2L", details2)
    # least() clamp between floor and pmod (the watermark shape)
    details3 = (
        "Output [1]: [pmod(least(FLOOR(((event_id#1L * 4096) / 100000)), 4095),"
        " 4096) AS b#3L]"
    )
    assert P._key_is_bounded("b#3L", details3)


def test_time_grain_digit_floor_scales_with_unit():
    # per-second micros buckets: corpus-scale cardinality, NOT bounded
    assert not P._expr_is_bounded("(unix_micros(ts#3) div 1000000)")
    # hourly micros (the events_burst_hours key): bounded
    assert P._expr_is_bounded("(unix_micros(ts#3) div 3600000000)")
    # minute-grain millis: bounded (rejected by the old 6-digit floor)
    assert P._expr_is_bounded("(unix_millis(ts#3) div 60000)")
    # minute-grain seconds: bounded
    assert P._expr_is_bounded("(unix_seconds(ts#3) div 60)")
    # per-second seconds grain: not bounded
    assert not P._expr_is_bounded("(unix_seconds(ts#3) div 1)")


def test_one_branch_limit_does_not_launder_the_funnel(spark, sf_dir):
    """A dim.limit() branch of a join must not clear a corpus branch
    funneling through the same SinglePartition exchange."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    dim = ev.select("event_type").distinct().limit(3)
    joined = ev.join(F.broadcast(dim), "event_type")
    bad = joined.select(
        "event_id", F.row_number().over(Window.orderBy("event_id")).alias("rn")
    )
    bad.collect()
    viol = P.single_partition_violations(bad)
    assert viol, "corpus branch outside the limit must still flag"
    assert "outside every bounding operator" in viol[0]["reason"]


def test_limit_above_corpus_still_bounds_the_funnel(spark, sf_dir):
    """The branch-aware scan must keep classifying a genuine top-k
    (limit ABOVE the corpus scan) as bounded."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ok = ev.orderBy("event_id").limit(5).coalesce(1).select(F.sum("event_id"))
    ok.collect()
    assert not P.single_partition_violations(ok)


def test_filter_allowed_violations_scoped_by_reason_and_count():
    """Round-9 advice: an allowlist entry excuses only its priced-in
    shape and count — unrelated or surplus violations still surface."""
    allow = {"q": {"note": "n", "reason_re": r"refine list", "max": 1}}
    match = {"node_id": 1, "reason": "bounded refine list via rank<=k"}
    other = {"node_id": 2, "reason": "corpus-growing leaves [documents]"}
    # matching violation inside budget: excused
    assert P.filter_allowed_violations("q", [match], allow) == []
    # unrelated violation: kept even though the query is allowlisted
    assert P.filter_allowed_violations("q", [other], allow) == [other]
    # two matching violations but max=1: the second still fails
    assert P.filter_allowed_violations("q", [match, dict(match)], allow) == [match]
    # un-allowlisted query: everything kept
    assert P.filter_allowed_violations("z", [match], allow) == [match]
