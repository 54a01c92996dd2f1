"""Snapshot-versioned parquet persistence for the index tables.

The reference keeps its index in SQLite with row-level CRUD serialized by
in-process mutexes (src/DedupeLibrary/Database/SqliteProvider.cs:29-30).
A Spark-native engine wants ACID *table* commits instead. In production
this layer is Delta Lake / Iceberg (``MERGE INTO``, optimistic
concurrency, time travel); this container has plain parquet only, so we
provide the same contract with the classic snapshot-pointer pattern:

    {root}/{table}/v00000001/...parquet     immutable snapshot
    {root}/{table}/_VERSION                 pointer file, atomic rename

A commit writes a new snapshot directory, then atomically renames a tmp
pointer over ``_VERSION``. Readers resolve the pointer once per read.
Single-writer semantics (same as the reference); swapping this class for
a Delta-backed one changes no engine code — the engine only calls
``read`` / ``commit`` / ``append``.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from watsondedupe_spark.schemas import TABLE_SCHEMAS


class IndexStore:
    """Parquet-backed table store with atomic snapshot commits."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- internals ----------------------------------------------------------

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_VERSION")

    def current_version(self, name: str) -> int:
        try:
            with open(self._pointer(name)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _snapshot_path(self, name: str, version: int) -> str:
        return os.path.join(self._table_dir(name), f"v{version:08d}")

    # -- contract -----------------------------------------------------------

    def exists(self, name: str) -> bool:
        return self.current_version(name) > 0

    def read(self, name: str, schema: StructType | None = None) -> DataFrame:
        """Current snapshot of ``name``; empty (typed) DataFrame if absent."""
        v = self.current_version(name)
        if v == 0:
            schema = schema or TABLE_SCHEMAS[name]
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(self._snapshot_path(name, v))

    def commit(self, name: str, df: DataFrame) -> int:
        """Write ``df`` as the next snapshot and flip the pointer atomically."""
        os.makedirs(self._table_dir(name), exist_ok=True)
        old = self.current_version(name)
        new = old + 1
        path = self._snapshot_path(name, new)
        df.write.mode("overwrite").parquet(path)
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(new))
        os.replace(tmp, self._pointer(name))  # atomic on POSIX
        # retire the previous snapshot (time travel is Delta's job, not ours)
        if old > 0:
            shutil.rmtree(self._snapshot_path(name, old), ignore_errors=True)
        return new

    def append(self, name: str, df: DataFrame) -> int:
        """Append = read current + union + commit.

        With Delta this is a metadata-only ``append`` commit; with plain
        parquet we must materialize a new snapshot. Engine call sites keep
        appends batched so this stays one job per ingest batch.
        """
        current = self.read(name, df.schema)
        return self.commit(name, current.unionByName(df))
