"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: runs the real CDC dedupe engine pipeline
(chunker UDF over the sf0.001 documents) and returns the per-object
dedup accounting DataFrame.

``queries()`` / ``oracle_sql()`` — the registered query surface from
``watsondedupe_spark.queries`` (SURVEY.md §2.3 DQ1-DQ20 + the
LLM-pipeline additions), each Spark implementation paired with a DuckDB
oracle. ``python tools/check.py`` runs the same comparison locally.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from watsondedupe_spark.queries import oracle_sql as _oracle_sql  # noqa: E402
from watsondedupe_spark.queries import queries as _queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC-chunk the sf0.001 documents corpus and account dedup.

    Exercises the whole write path distributedly (binary payloads ->
    mapInPandas chunker -> chunk_key aggregation) without touching disk:
    returns one row per object with its chunk count, mapped bytes, and
    how many of its chunks are shared with at least one other object.
    """
    from pyspark.sql import functions as F

    from watsondedupe_spark.chunking import ChunkSettings, SMALL_FILE_PROFILE, chunk_objects

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    objs = docs.select(
        F.col("doc_id").cast("string").alias("object_key"),
        F.encode("text", "UTF-8").alias("data"),
    )
    chunks = chunk_objects(objs, ChunkSettings(*SMALL_FILE_PROFILE))
    refs = chunks.groupBy("chunk_key").agg(F.count("*").alias("ref_count"))
    return (
        chunks.join(refs, "chunk_key")
        .groupBy("object_key")
        .agg(
            F.count("*").cast("long").alias("chunk_count"),
            F.sum("length").cast("long").alias("mapped_bytes"),
            F.sum(F.when(F.col("ref_count") > 1, 1).otherwise(0)).cast("long").alias("shared_chunks"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each ``queries()`` key (omissions =>
    rows-only check for non-SQL-expressible ops)."""
    return _oracle_sql()
