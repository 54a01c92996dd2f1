"""as-of and range join operators: semantics vs a brute-force reference
on small data, plus the one-shuffle plan shape."""

import random

import pytest
from pyspark.sql import functions as F

from watsondedupe_spark import plans as P
from watsondedupe_spark.operators.joins import (
    asof_join,
    bloom_filter_build,
    bloom_might_contain,
    bloom_semi_join,
    range_join,
)


def _ts(s):
    return f"2024-01-01 {s}:00"


def test_asof_join_matches_bruteforce(spark):
    rng = random.Random(5)
    lefts = [(u, _ts(f"{rng.randrange(10, 20):02d}:{rng.randrange(60):02d}"), i)
             for i, u in enumerate(rng.choices(range(4), k=25))]
    rights = [(u, _ts(f"{rng.randrange(10, 20):02d}:{rng.randrange(60):02d}"), 100 + i)
              for i, u in enumerate(rng.choices(range(4), k=25))]
    L = spark.createDataFrame(lefts, "user_id long, ts string, click_id long") \
        .withColumn("ts", F.col("ts").cast("timestamp"))
    R = spark.createDataFrame(rights, "user_id long, ts string, view_id long") \
        .withColumn("ts", F.col("ts").cast("timestamp"))

    got = {
        r.click_id: r.view_id
        for r in asof_join(L, R, on="user_id", ts="ts", tie_cols=["view_id"]).collect()
    }
    lrows = L.collect()
    rrows = R.collect()
    for lr in lrows:
        cands = [rr for rr in rrows if rr.user_id == lr.user_id and rr.ts <= lr.ts]
        want = max(cands, key=lambda rr: (rr.ts, rr.view_id)).view_id if cands else None
        assert got[lr.click_id] == want, lr.click_id
    assert len(got) == len(lrows)  # every left row survives (left-outer semantics)


def test_asof_join_tolerance(spark):
    L = spark.createDataFrame(
        [(1, _ts("12:00"), 1)], "user_id long, ts string, click_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    R = spark.createDataFrame(
        [(1, _ts("11:00"), 10)], "user_id long, ts string, view_id long"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ok = asof_join(L, R, on="user_id", ts="ts").collect()[0]
    assert ok.view_id == 10
    stale = asof_join(L, R, on="user_id", ts="ts", tolerance="30 minutes").collect()[0]
    assert stale.view_id is None


def test_asof_join_single_shuffle_no_cartesian(spark):
    L = spark.range(100).select(
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 60).alias("ts"),
        F.col("id").alias("click_id"),
    )
    R = spark.range(100).select(
        (F.col("id") % 5).alias("user_id"),
        F.timestamp_seconds(F.col("id") * 45).alias("ts"),
        F.col("id").alias("view_id"),
    )
    df = asof_join(L, R, on="user_id", ts="ts")
    assert not P.has_cartesian(df)
    # union + one window = exactly one hashpartitioning exchange on the key
    assert P.shuffle_count(df) == 1


def test_range_join_containment(spark):
    points = spark.createDataFrame(
        [("k", 5), ("k", 150), ("k", 250)], "object_key string, pos long"
    )
    intervals = spark.createDataFrame(
        [("k", 0, 100), ("k", 100, 100)], "object_key string, address long, length long"
    )
    got = sorted(
        (r.pos, r.address)
        for r in range_join(points, intervals, "object_key", "pos", "address", "length").collect()
    )
    assert got == [(5, 0), (150, 100)]  # 250 falls outside every interval


def test_bloom_semi_join_exact_equals_semi_join(spark):
    fact = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("k"), F.col("id").alias("payload")
    )
    keys = spark.range(0, 200).select((F.col("id") * 7).alias("kk"))
    got = bloom_semi_join(fact, keys, "k", "kk", n_bits=1 << 12).collect()
    want = fact.join(
        keys.select(F.col("kk").alias("k")).distinct(), "k", "left_semi"
    ).collect()
    assert sorted((r.k, r.payload) for r in got) == sorted(
        (r.k, r.payload) for r in want
    )
    assert len(got) > 0


def test_bloom_filter_no_false_negatives_and_low_fpp(spark):
    keys = spark.range(0, 1000).select((F.col("id") * 13 + 5).alias("k"))
    bloom = bloom_filter_build(keys, "k", n_bits=1 << 15)
    probe = spark.range(0, 20000).select(F.col("id").alias("k"))
    hits = probe.filter(bloom_might_contain(bloom, "k")).collect()
    hit_set = {r.k for r in hits}
    member = {13 * i + 5 for i in range(1000) if 13 * i + 5 < 20000}
    # no false negatives: every member below the probe range is present
    assert member <= hit_set
    # false-positive rate bounded (k=3, m=32768, n=1000 -> fpp ~ 7e-4)
    assert len(hit_set - member) < 200


def test_bloom_prefilter_only_is_superset(spark):
    fact = spark.range(0, 3000).select((F.col("id") % 101).alias("k"))
    keys = spark.range(0, 10).select((F.col("id") * 11).alias("k"))
    loose = bloom_semi_join(fact, keys, "k", n_bits=1 << 12, exact=False)
    tight = bloom_semi_join(fact, keys, "k", n_bits=1 << 12, exact=True)
    assert loose.count() >= tight.count()
    got = {r.k for r in tight.select("k").distinct().collect()}
    assert got == {11 * i for i in range(10) if 11 * i < 101}


def test_rrf_fuse_multi_query_multi_arm(spark):
    """Three-arm fusion over two queries: scores must equal the
    hand-computed sum of 1/(60+rank) contributions, with missing ranks
    contributing zero."""
    from watsondedupe_spark.operators.joins import rrf_fuse

    mk = lambda rows: spark.createDataFrame(rows, "query_id long, doc_id long, rank int")
    a = mk([(1, 10, 1), (1, 11, 2), (2, 20, 1)])
    b = mk([(1, 11, 1), (1, 12, 2), (2, 21, 1)])
    c = mk([(1, 10, 2), (2, 20, 2), (2, 22, 1)])
    got = {(r.query_id, r.doc_id): r.rrf for r in rrf_fuse([a, b, c]).collect()}
    want = {
        (1, 10): 1 / 61 + 1 / 62,
        (1, 11): 1 / 62 + 1 / 61,
        (1, 12): 1 / 62,
        (2, 20): 1 / 61 + 1 / 62,
        (2, 21): 1 / 61,
        (2, 22): 1 / 61,
    }
    assert set(got) == set(want)
    for key, v in want.items():
        assert got[key] == pytest.approx(v, rel=1e-15)
    # a doc present in more arms at equal-or-better ranks outranks one
    # present in fewer
    assert got[(2, 20)] > got[(2, 21)]
