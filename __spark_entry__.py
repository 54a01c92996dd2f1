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


def _ship_package(spark: SparkSession) -> None:
    """Make ``watsondedupe_spark`` importable on executors regardless of
    how the session was built.

    The driver process imports the package via the sys.path insert
    above, but Python WORKERS only see it if the repo dir happens to be
    their cwd or PYTHONPATH (``session.get_spark`` arranges the latter;
    an externally supplied default session may not). Zipping the package
    and ``addPyFile``-ing it works after context creation and makes the
    contract self-contained.

    The zip lands at one deterministic per-user temp path, overwritten
    in place (atomic rename), so repeated sessions reuse the slot
    instead of leaking a mkdtemp dir per SparkContext. Caveat:
    ``addPyFile`` cannot refresh modules a live Python worker has
    already imported — a long-lived foreign session that ran a stale
    copy keeps it until its workers recycle
    (``spark.python.worker.reuse=false`` or a fresh context).
    """
    sc = spark.sparkContext
    if getattr(sc, "_wds_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    root = os.path.dirname(os.path.abspath(__file__))
    pkg = os.path.join(root, "watsondedupe_spark")
    slot = os.path.join(tempfile.gettempdir(), f"wds_pkg_{os.getuid()}")
    os.makedirs(slot, exist_ok=True)
    zpath = os.path.join(slot, "watsondedupe_spark.zip")
    tmp = zpath + ".tmp"
    with zipfile.ZipFile(tmp, "w") as z:
        for dirpath, _, files in os.walk(pkg):
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(dirpath, f)
                    z.write(full, os.path.relpath(full, root))
    os.replace(tmp, zpath)
    sc.addPyFile(zpath)
    sc._wds_pkg_shipped = True


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: CDC-chunk the sf0.001 documents corpus and account dedup.

    Exercises the whole write path distributedly (binary payloads ->
    mapInPandas chunker -> chunk_key aggregation) without touching disk:
    returns one row per object with its chunk count, mapped bytes, and
    how many of its chunks are shared with at least one other object.
    """
    from pyspark.sql import functions as F

    from watsondedupe_spark.chunking import ChunkSettings, SMALL_FILE_PROFILE, chunk_objects

    _ship_package(spark)
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

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            _ship_package(spark)
            return fn(spark, sf_dir)

        run.__name__ = getattr(fn, "__name__", "query")
        run.__doc__ = fn.__doc__
        return run

    return {name: wrap(fn) for name, fn in _queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each ``queries()`` key (omissions =>
    rows-only check for non-SQL-expressible ops)."""
    return _oracle_sql()
