"""A custom connector on Spark 4's Python Data Source API: deterministic
synthetic binary objects.

The reference's only "source" is byte streams handed to ``Write``
(DedupeLibrary.cs:126-159); a Spark engine's sources are pluggable
DataFrame readers. This module exercises the NEW extension seam — the
Python DataSource API (SPARK-44076) — the modern way to add a format
without JVM code: ``partitions()`` declares the parallelism (one task
per partition object, exactly how a 100 TB connector splits work across
executors), ``read(partition)`` yields rows worker-side, and filters/
projections still apply above it.

The generated rows are content-seeded (md5-keyed from ``(seed, id)``),
so the source is reproducible across runs, partitionings, and cluster
layouts — the same property every other deterministic operator here
relies on — and includes planted duplicate payloads (every
``dup_every``-th object repeats payload 0) so dedupe pipelines have
known ground truth to chew on.

Usage::

    spark.dataSource.register(BlobGenDataSource)
    df = (spark.read.format("blobgen")
          .option("n", 1000).option("parts", 32).option("blob_bytes", 4096)
          .load())
    # schema: id long, object_key string, payload binary, is_dup boolean
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

BLOBGEN_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("object_key", StringType(), False),
        StructField("payload", BinaryType(), False),
        StructField("is_dup", BooleanType(), False),
    ]
)


def _payload(seed: str, ident: int, blob_bytes: int) -> bytes:
    """Deterministic pseudo-random bytes: md5 counter-mode keystream."""
    out = bytearray()
    counter = 0
    base = f"{seed}:{ident}".encode()
    while len(out) < blob_bytes:
        out.extend(hashlib.md5(base + b":" + str(counter).encode()).digest())
        counter += 1
    return bytes(out[:blob_bytes])


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class BlobGenReader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("parts", 8))
        self.blob_bytes = int(options.get("blob_bytes", 4096))
        self.dup_every = int(options.get("dup_every", 10))
        self.seed = options.get("seed", "blobgen")

    def partitions(self):
        step = max(1, -(-self.n // self.parts))  # ceil division
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            is_dup = self.dup_every > 0 and i % self.dup_every == 0 and i > 0
            src = 0 if is_dup else i
            yield (
                i,
                f"blob/{i:08d}",
                _payload(self.seed, src, self.blob_bytes),
                is_dup,
            )


class BlobGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "blobgen"

    def schema(self) -> StructType:
        return BLOBGEN_SCHEMA

    def reader(self, schema: StructType) -> BlobGenReader:
        return BlobGenReader(self.options)
