"""Salted aggregation: exact results under extreme key skew."""

from pyspark.sql import functions as F

from watsondedupe_spark.operators.skew import (
    explode_salt,
    salted_collect_set,
    salted_count_distinct,
)


def _skewed(spark):
    # one key owns 90% of the rows, values repeat so distinct < count
    hot = spark.range(9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 700).alias("v")
    )
    cold = spark.range(1000).select(
        F.concat(F.lit("c"), (F.col("id") % 10).cast("string")).alias("k"),
        (F.col("id") % 37).alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_count_distinct_exact(spark):
    df = _skewed(spark)
    got = {r.k: r.n_distinct for r in salted_count_distinct(df, "k", "v", n_salts=8).collect()}
    want = {
        r.k: r.n for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    assert got == want
    assert got["hot"] == 700


def test_salted_collect_set_exact_and_bounded(spark):
    df = _skewed(spark)
    got = {r.k: r.values for r in salted_collect_set(df, "k", "v", n_salts=8).collect()}
    want = {
        r.k: sorted(r.s)
        for r in df.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    assert got == want
    capped = {
        r.k: r.values
        for r in salted_collect_set(df, "k", "v", n_salts=8, max_size=10).collect()
    }
    assert all(len(v) <= 10 for v in capped.values())
    assert capped["hot"] == want["hot"][:10]


def test_explode_salt_join_parity(spark):
    big = _skewed(spark).withColumn(
        "_salt", F.pmod(F.xxhash64("v"), F.lit(4))
    )
    dim = spark.createDataFrame(
        [("hot", "H")] + [(f"c{i}", f"C{i}") for i in range(10)], "k string, label string"
    )
    salted_dim = explode_salt(dim, 4)
    j = big.join(salted_dim, ["k", "_salt"]).groupBy("k").count()
    plain = _skewed(spark).join(dim, "k").groupBy("k").count()
    assert {(r.k, r["count"]) for r in j.collect()} == {
        (r.k, r["count"]) for r in plain.collect()
    }


def test_salted_join_equals_plain_join_on_skewed_key(spark):
    from pyspark.sql import functions as F

    from watsondedupe_spark.operators.skew import salted_join

    # 90% of big rows share one hot key
    big = spark.range(2000).select(
        F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim"), F.col("id")).alias("attr")
    )
    want = {(r.k, r.payload, r.attr) for r in big.join(small, "k").collect()}
    got = {(r.k, r.payload, r.attr) for r in salted_join(big, small, "k", n_salts=8).collect()}
    assert got == want
    # left join keeps unmatched big rows exactly once
    big2 = big.withColumn("k", F.col("k") + 1000)  # no matches
    left = salted_join(big2, small, "k", n_salts=8, how="left").collect()
    assert len(left) == 2000 and all(r.attr is None for r in left)
