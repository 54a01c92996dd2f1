"""Snapshot-versioned parquet persistence for the index tables.

The reference keeps its index in SQLite with row-level CRUD serialized by
in-process mutexes (src/DedupeLibrary/Database/SqliteProvider.cs:29-30).
A Spark-native engine wants ACID *table* commits instead. In production
this layer is Delta Lake / Iceberg (``MERGE INTO``, optimistic
concurrency, time travel); this container has plain parquet only, so we
provide the same contract with a manifest-of-parts design — the same
file-log idea those formats use:

    {root}/{table}/p00000001/...parquet     immutable data part
    {root}/{table}/_MANIFEST                json {version, parts}, atomic rename

A *commit* (full replace) writes one new part and a manifest referencing
only it. An *append* writes a part containing ONLY the new rows and a
manifest referencing old parts + the new one — O(batch), not O(table),
which is the difference between linear and quadratic total ingest cost
over many batches. Readers resolve the manifest once and scan the listed
parts as one multi-path parquet read. When a table accumulates more than
``max_parts`` parts, the next append folds them into one (bounded read
fan-in — the OPTIMIZE/compaction analogue).

Every manifest version is also retained as ``_MANIFEST.v{N}`` for the
last ``retain_versions`` commits, so ``read_version`` gives Delta-style
time travel: part files stay on disk as long as ANY retained manifest
references them, and GC only removes parts unreachable from every
retained version.

Single-writer semantics (same as the reference); swapping this class for
a Delta-backed one changes no engine code — the engine only calls
``read`` / ``commit`` / ``append``.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from watsondedupe_spark.schemas import TABLE_SCHEMAS


class IndexStore:
    """Parquet-backed table store with atomic manifest commits."""

    #: appends fold all live parts into one once this many accumulate
    max_parts = 16
    #: how many historical manifest versions stay readable (time travel)
    retain_versions = 8

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- internals ----------------------------------------------------------

    def _table_dir(self, name: str) -> str:
        return os.path.join(self.root, name)

    def _pointer(self, name: str) -> str:
        return os.path.join(self._table_dir(name), "_MANIFEST")

    def _state(self, name: str) -> dict:
        try:
            with open(self._pointer(name)) as f:
                return json.load(f)
        except FileNotFoundError:
            return {"version": 0, "parts": []}

    def current_version(self, name: str) -> int:
        return self._state(name)["version"]

    def _part_path(self, name: str, version: int) -> str:
        return os.path.join(self._table_dir(name), f"p{version:08d}")

    def _version_pointer(self, name: str, version: int) -> str:
        return self._pointer(name) + f".v{version:08d}"

    def _swap_manifest(self, name: str, state: dict) -> None:
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f)
        # retained history copy first, then the atomic current-pointer
        # flip: a crash between the two leaves the old current manifest
        # authoritative and at worst an orphan history file
        with open(self._version_pointer(name, state["version"]), "w") as f:
            json.dump(state, f)
        os.replace(tmp, self._pointer(name))  # atomic on POSIX
        # expire history beyond the retention window
        floor = state["version"] - self.retain_versions
        for v in self.versions(name):
            if v < floor:
                try:
                    os.remove(self._version_pointer(name, v))
                except FileNotFoundError:
                    pass

    def versions(self, name: str) -> list[int]:
        """Retained (time-travel-readable) manifest versions, ascending."""
        tdir = self._table_dir(name)
        if not os.path.isdir(tdir):
            return []
        prefix = "_MANIFEST.v"
        return sorted(
            int(e[len(prefix):])
            for e in os.listdir(tdir)
            if e.startswith(prefix)
        )

    def read_version(self, name: str, version: int) -> DataFrame:
        """Snapshot of ``name`` as of ``version`` — Delta-style time
        travel over the retained manifest history."""
        try:
            with open(self._version_pointer(name, version)) as f:
                state = json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"version {version} of {name} is not retained "
                f"(have {self.versions(name)})"
            )
        if not state["parts"]:
            return self.spark.createDataFrame([], TABLE_SCHEMAS[name])
        return self.spark.read.parquet(*state["parts"])

    def _gc(self, name: str) -> None:
        """Remove part dirs unreachable from the current manifest AND
        every retained historical manifest. Safe to run after the swap:
        crashed writers leave at worst an orphan dir, never a dangling
        reference."""
        live: set[str] = set()
        for state in [self._state(name)] + [
            json.load(open(self._version_pointer(name, v)))
            for v in self.versions(name)
        ]:
            live.update(os.path.basename(p) for p in state["parts"])
        tdir = self._table_dir(name)
        for entry in os.listdir(tdir):
            if entry.startswith("p") and entry not in live:
                shutil.rmtree(os.path.join(tdir, entry), ignore_errors=True)

    # -- contract -----------------------------------------------------------

    def exists(self, name: str) -> bool:
        return self.current_version(name) > 0

    def read(self, name: str, schema: StructType | None = None) -> DataFrame:
        """Current snapshot of ``name``; empty (typed) DataFrame if absent."""
        state = self._state(name)
        if not state["parts"]:
            schema = schema or TABLE_SCHEMAS[name]
            return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(*state["parts"])

    def table_meta(self, name: str) -> dict:
        """Caller-provided table statistics carried in the manifest (the
        Delta/Iceberg table-properties analogue). Empty dict if none."""
        return self._state(name).get("meta", {})

    def commit(self, name: str, df: DataFrame, meta: dict | None = None) -> int:
        """Write ``df`` as the full new table state; flip the manifest
        atomically; retire every previous part. ``meta=None`` carries the
        previous manifest's meta forward; pass a dict to replace it."""
        os.makedirs(self._table_dir(name), exist_ok=True)
        state = self._state(name)
        new = state["version"] + 1
        path = self._part_path(name, new)
        df.write.mode("overwrite").parquet(path)
        self._swap_manifest(
            name,
            {
                "version": new,
                "parts": [path],
                "meta": state.get("meta", {}) if meta is None else meta,
            },
        )
        self._gc(name)
        return new

    def append(self, name: str, df: DataFrame, meta: dict | None = None) -> int:
        """Append ONLY the new rows as a fresh part — O(batch) I/O.

        (With Delta this is a metadata-only append commit; the manifest
        gives plain parquet the same cost shape.) Every ``max_parts``
        appends the parts fold into one so read fan-in stays bounded.
        ``meta`` as in :meth:`commit`.
        """
        state = self._state(name)
        if len(state["parts"]) >= self.max_parts:
            return self.commit(name, self.read(name, df.schema).unionByName(df), meta=meta)
        os.makedirs(self._table_dir(name), exist_ok=True)
        new = state["version"] + 1
        path = self._part_path(name, new)
        df.write.mode("overwrite").parquet(path)
        self._swap_manifest(
            name,
            {
                "version": new,
                "parts": state["parts"] + [path],
                "meta": state.get("meta", {}) if meta is None else meta,
            },
        )
        return new

    def compact(self, name: str) -> int:
        """Fold all live parts into one (the OPTIMIZE analogue); no-op on
        an absent table."""
        if not self.exists(name):
            return 0
        return self.commit(name, self.read(name))
