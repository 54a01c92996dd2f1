"""The functions namespace: every exported expression is a Catalyst
column (no Python UDF) and computes what its operator-module home says."""

from pyspark.sql import Column
from pyspark.sql import functions as F

from watsondedupe_spark import functions as WF


def test_exports_are_column_expressions(spark):
    # column construction requires an active session (higher-order
    # functions resolve lambdas through it)
    for name in (
        "chunk_key_col",
        "l2_norm",
        "token_count",
        "quality_score",
        "normalized_text",
        "content_hash",
    ):
        assert isinstance(getattr(WF, name)(F.lit("x")), Column), name
    assert isinstance(WF.cosine(F.lit("x"), F.lit("y")), Column)
    assert isinstance(WF.dot(F.lit("x"), F.lit("y")), Column)


def test_normalized_text_and_hash(spark):
    df = spark.createDataFrame([("  The QUICK,,  fox!  ",)], "t string")
    row = df.select(
        WF.normalized_text("t").alias("n"), WF.content_hash(WF.normalized_text("t")).alias("h")
    ).collect()[0]
    assert row.n == "the quick fox"
    import hashlib

    assert row.h == hashlib.md5(b"the quick fox").hexdigest()


def test_interval_contains(spark):
    df = spark.createDataFrame([(0, 100), (100, 50), (150, 10)], "address long, length long")
    hit = df.filter(WF.interval_contains("address", "length", 120)).collect()
    assert [(r.address, r.length) for r in hit] == [(100, 50)]


def test_vector_functions(spark):
    df = spark.createDataFrame(
        [([1.0, 0.0], [1.0, 0.0]), ([1.0, 0.0], [0.0, 1.0])], "a array<float>, b array<float>"
    )
    rows = df.select(
        WF.dot(F.col("a"), F.col("b")).alias("d"), WF.cosine(F.col("a"), F.col("b")).alias("c")
    ).collect()
    assert rows[0].d == 1.0 and rows[0].c == 1.0
    assert rows[1].d == 0.0 and rows[1].c == 0.0
