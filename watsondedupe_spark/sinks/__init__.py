"""Sink-side writers: partitioned, bucketed, and chunk-store layouts.

The reference's only sinks are callback-driven chunk files and stdout
(DedupeCallbacks.cs:15-58, Cli/Program.cs:343-355); the Spark engine's
sinks are table layouts chosen for how they will be READ at 100 TB:

- **partitioned** parquet for partition-pruned scans (a predicate on the
  partition column skips whole directories);
- **bucketed** tables for co-located joins: two tables bucketed on the
  same key with the same bucket count join WITHOUT a shuffle — the
  exchange that dominates large-join cost simply disappears from the
  plan (asserted in tests/test_sinks.py via the plans auditor);
- **chunk-store layout**: `chunk_key`-prefix partitioning so point
  lookups and GC deletes prune to one directory of the payload table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Directory-partitioned parquet. Reads filtering on a partition
    column prune at the directory level (PartitionFilters in the scan,
    before any row is touched)."""
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", max_records_per_file)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (and optionally sorted) table via ``saveAsTable``.

    Joining two tables bucketed on the same keys with the same
    ``n_buckets`` needs no exchange: each task reads matching buckets
    from both sides. Sorting within buckets additionally removes the
    sort from sort-merge joins. Bucket metadata lives in the session
    catalog (Hive metastore in production)."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def write_chunk_store_layout(
    chunk_rows: DataFrame,
    path: str,
    prefix_len: int = 2,
    mode: str = "overwrite",
) -> None:
    """Payload-table layout for the content-addressed chunk store.

    Partition by the first ``prefix_len`` chars of ``chunk_key`` (chunk
    keys are base64 of SHA-256, so prefixes are uniform — no skew by
    construction): a point read or a GC delete prunes to 1/64**prefix_len
    of the table, and inserts append to their prefix directory without
    touching others."""
    (
        chunk_rows.withColumn("key_prefix", F.substring("chunk_key", 1, prefix_len))
        .write.mode(mode)
        .partitionBy("key_prefix")
        .parquet(path)
    )


def read_chunk_store_layout(spark: SparkSession, path: str) -> DataFrame:
    """Read the prefix-partitioned chunk store; filters on ``chunk_key``
    should be paired with ``key_prefix`` for directory pruning:
    ``df.filter((F.col('key_prefix') == k[:2]) & (F.col('chunk_key') == k))``.
    """
    return spark.read.parquet(path)
