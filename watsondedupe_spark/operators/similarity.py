"""Similarity search over embedding columns (``array<float>``).

Brute-force cosine top-k is the correctness baseline: a broadcast join
of the (small) query set against the corpus with the dot product
evaluated JVM-side via ``zip_with``/``aggregate`` — no Python, no
shuffle except the final per-query top-k.

The scale path is sign-LSH (random hyperplanes): corpus vectors are
bucketed once by sign bits; a query probes only its bucket (optionally
multi-probe neighbors). At 100 TB the bucket column is also the
partition key, so a probe touches one partition instead of the corpus.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product of two float arrays (double accumulation)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / l2_norm(a) / l2_norm(b)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors for each query vector (brute force).

    Queries are broadcast (they are the small side by construction);
    the corpus is scanned once; the only shuffle is the per-query
    window top-k. Returns (query_id, neighbor_id, cosine, rank).
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _plane_sign(plane: int, dim: int) -> int:
    """Deterministic ±1 from md5 — reproducible across sessions/engines."""
    return 1 if hashlib.md5(f"p{plane}:{dim}".encode()).hexdigest()[0] in "01234567" else -1


def sign_lsh_bucket(vec: Column, n_planes: int = 8, n_dims: int = 64) -> Column:
    """Random-hyperplane sign bucket (0 .. 2**n_planes - 1), JVM-side.

    Hyperplane components are ±1 derived from md5, embedded as literals;
    each projection is an ``aggregate`` fold over the vector, so the
    whole bucket assignment stays inside whole-stage codegen.
    """
    bucket = F.lit(0).cast("long")
    for j in range(1, n_planes + 1):
        signs = [_plane_sign(j, i) for i in range(1, n_dims + 1)]
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(s) for s in signs]),
                lambda x, s: x.cast("double") * s.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, j - 1)
    return bucket


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    n_dims: int = 64,
) -> DataFrame:
    """Approximate top-k: probe only the query's sign-LSH bucket.

    Trades recall for a ~2**n_planes candidate reduction; increase
    recall with fewer planes or multi-probe. Same output shape as
    :func:`cosine_topk`.
    """
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        sign_lsh_bucket(F.col(vec_col), n_planes, n_dims).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        sign_lsh_bucket(F.col(vec_col), n_planes, n_dims).alias("bucket"),
    )
    scored = (
        cb.join(F.broadcast(qb), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
