"""Content-defined chunking (CDC) with reference-parity semantics.

Re-implements the reference's sliding-window MD5 chunker as a pure-Python
function plus an Arrow-batched Spark wrapper. Semantics are taken from
/root/reference/src/DedupeLibrary/DedupeLibrary.cs:605-717:

- input ``<= min_chunk_size``  -> a single chunk (l.623-637);
- otherwise a window of ``min_chunk_size`` bytes slides by ``shift_count``;
  a chunk boundary is declared at the window's end when the first
  ``boundary_check_bytes`` bytes of MD5(window) are zero (l.668-670,
  DedupeCommon.cs:157-181 — the reference's ``data.Length >= i``
  off-by-one is NOT copied; it is unobservable for 16-byte MD5 anyway)
  or when the accumulated chunk reaches ``max_chunk_size``;
- after a cut the next window starts fresh at the cut point
  (``AdvanceToNewChunk``, l.682-685); the final partial chunk is flushed
  at end-of-stream (l.694-710);
- chunk key = URL-safe unpadded base64 of SHA-256(chunk bytes)
  (l.628/674/700; DedupeCommon.cs:106-111, 146-154). MD5 only finds
  boundaries.

Parallelism note (SURVEY.md §7.3): CDC is sequential *within* one object
but embarrassingly parallel *across* objects, so the Spark wrapper is a
``mapInPandas`` over (object_key, data) rows — one Python pass per object,
Arrow batches across the JVM boundary, no shuffle. A single multi-GB
object would serialize into one task; for that regime use
``segment_bytes`` below (segment-framed chunking) or cap object size.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable, Iterator
from dataclasses import dataclass

from watsondedupe_spark.keys import chunk_key

# Defaults and validation rules: DedupeSettings.cs:104-107 / 19-98.
DEFAULT_MIN_CHUNK_SIZE = 1024
DEFAULT_MAX_CHUNK_SIZE = 32768
DEFAULT_SHIFT_COUNT = 32
DEFAULT_BOUNDARY_CHECK_BYTES = 2

#: Recommended profiles from the reference README.md:154-157.
SMALL_FILE_PROFILE = (2048, 16384, 128, 2)
LARGE_FILE_PROFILE = (32768, 262144, 512, 2)


@dataclass(frozen=True)
class ChunkSettings:
    """Chunking parameters, immutable per index (DedupeLibrary.cs:583-603).

    Validation mirrors DedupeSettings.cs: min >= 256 and divisible by 64
    (l.30), max >= 2048, divisible by 64 and >= 8x min (l.52-53),
    shift in (1, min] (l.73-74), boundary bytes in [1,4] (l.95).
    """

    min_chunk_size: int = DEFAULT_MIN_CHUNK_SIZE
    max_chunk_size: int = DEFAULT_MAX_CHUNK_SIZE
    shift_count: int = DEFAULT_SHIFT_COUNT
    boundary_check_bytes: int = DEFAULT_BOUNDARY_CHECK_BYTES

    def __post_init__(self) -> None:
        if self.min_chunk_size < 256 or self.min_chunk_size % 64 != 0:
            raise ValueError("min_chunk_size must be >= 256 and divisible by 64")
        if (
            self.max_chunk_size < 2048
            or self.max_chunk_size % 64 != 0
            or self.max_chunk_size < 8 * self.min_chunk_size
        ):
            raise ValueError("max_chunk_size must be >= 2048, divisible by 64, >= 8x min")
        if not (1 < self.shift_count <= self.min_chunk_size):
            raise ValueError("shift_count must be in (1, min_chunk_size]")
        if not (1 <= self.boundary_check_bytes <= 4):
            raise ValueError("boundary_check_bytes must be in [1, 4]")

    def to_config(self) -> dict[str, str]:
        """The four persisted config keys (DedupeLibrary.cs:589-592)."""
        return {
            "min_chunk_size": str(self.min_chunk_size),
            "max_chunk_size": str(self.max_chunk_size),
            "shift_count": str(self.shift_count),
            "boundary_check_bytes": str(self.boundary_check_bytes),
        }

    @classmethod
    def from_config(cls, config: dict[str, str]) -> "ChunkSettings":
        return cls(
            min_chunk_size=int(config["min_chunk_size"]),
            max_chunk_size=int(config["max_chunk_size"]),
            shift_count=int(config["shift_count"]),
            boundary_check_bytes=int(config["boundary_check_bytes"]),
        )


@dataclass(frozen=True)
class Chunk:
    """One emitted chunk: content key + placement within the object."""

    key: str
    length: int
    position: int  # 0-based ordinal (DedupeObjectMap.cs:42)
    address: int  # byte offset within the object (DedupeObjectMap.cs:48)
    data: bytes


def is_boundary(digest: bytes, boundary_check_bytes: int) -> bool:
    """First N bytes of the digest are zero => boundary.

    Probability 256**-N per window shift (DedupeCommon.cs:157-181 without
    the off-by-one; BASELINE.md's boundary-probability row).
    """
    return not any(digest[:boundary_check_bytes])


def chunk_bytes(data: bytes, settings: ChunkSettings | None = None) -> list[Chunk]:
    """Chunk one object's bytes. Deterministic: same bytes + same settings
    => identical boundaries and keys (invariant SURVEY.md §5.7).
    """
    settings = settings or ChunkSettings()
    n = len(data)
    if n < 1:
        raise ValueError("content must be at least one byte (DedupeLibrary.cs:155)")

    min_size = settings.min_chunk_size
    if n <= min_size:
        # Single-chunk fast path, DedupeLibrary.cs:623-637.
        return [Chunk(chunk_key(data), n, 0, 0, data)]

    max_size = settings.max_chunk_size
    shift = settings.shift_count
    nb = settings.boundary_check_bytes
    md5 = hashlib.md5
    zero_prefix = b"\x00" * nb

    chunks: list[Chunk] = []
    chunk_start = 0  # address of the chunk being accumulated
    window_start = 0
    view = memoryview(data)  # zero-copy window slices for the md5 loop

    while True:
        window_end = window_start + min_size
        final = window_end >= n
        if final:
            window_end = n
        # Boundary test on the current window (DedupeLibrary.cs:668-670);
        # the accumulated chunk always extends to the window's end.
        # usedforsecurity=False: MD5 only locates boundaries here (the
        # chunk key is SHA-256), so the faster non-FIPS path is safe.
        if (
            md5(view[window_start:window_end], usedforsecurity=False).digest()[:nb]
            == zero_prefix
        ) or window_end - chunk_start >= max_size:
            payload = data[chunk_start:window_end]
            chunks.append(Chunk(chunk_key(payload), len(payload), len(chunks), chunk_start, payload))
            chunk_start = window_end
            window_start = window_end  # AdvanceToNewChunk, l.682-685
            if final:
                break
            continue
        if final:
            # Flush the trailing partial chunk, l.694-710.
            payload = data[chunk_start:n]
            chunks.append(Chunk(chunk_key(payload), len(payload), len(chunks), chunk_start, payload))
            break
        window_start += shift

    return chunks


def segment_bytes(data: bytes, segment_size: int) -> Iterable[tuple[int, bytes]]:
    """Frame a very large object into independently chunkable segments.

    Yields (segment_address, segment_bytes). Each segment is chunked
    independently and addresses are rebased — this trades slightly
    different boundaries near segment edges for within-object parallelism
    (SURVEY.md §7.3 mitigation). ``segment_size`` must be >= max_chunk_size.
    """
    if segment_size < 1:
        raise ValueError("segment_size must be positive")
    for off in range(0, len(data), segment_size):
        yield off, data[off : off + segment_size]


# ---------------------------------------------------------------------------
# Spark wrapper
# ---------------------------------------------------------------------------

#: Output schema of the chunker over (object_key, data) rows. One row per
#: (object, chunk occurrence) — the object_map edge plus the payload,
#: which downstream splits into object_map / chunks / chunk_store.
CHUNK_OUTPUT_SCHEMA = (
    "object_key string, chunk_key string, length int, position int, "
    "address long, chunk_data binary"
)


def chunk_objects(
    df,
    settings: ChunkSettings | None = None,
    key_col: str = "object_key",
    data_col: str = "data",
    min_parallelism: int | None = None,
):
    """Distributed chunking: (object_key, data) DataFrame -> chunk rows.

    Uses ``mapInPandas`` so each Arrow batch is processed in one Python
    call; objects never cross batch boundaries (each input row is one
    whole object).

    CDC is CPU-bound (one MD5 per shift), so partitioning must match the
    cores, not the input file layout: a corpus that arrives as one big
    parquet file would otherwise chunk on a single task. When the scan
    has fewer partitions than ``min_parallelism`` (default: the session's
    defaultParallelism), we repartition by object key first — a shuffle
    of the payload bytes, but the hash work it unlocks dominates at any
    scale, and round-robin-by-key also evens out skewed object sizes.
    """
    settings = settings or ChunkSettings()
    import pandas as pd  # local import: executors re-import cheaply

    sel = df.select(key_col, data_col)
    if min_parallelism is None:
        min_parallelism = sel.sparkSession.sparkContext.defaultParallelism
    if min_parallelism and sel.rdd.getNumPartitions() < min_parallelism:
        sel = sel.repartition(min_parallelism, key_col)

    def _chunk_batches(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                "object_key": [],
                "chunk_key": [],
                "length": [],
                "position": [],
                "address": [],
                "chunk_data": [],
            }
            for key, payload in zip(pdf[key_col], pdf[data_col]):
                for ch in chunk_bytes(bytes(payload), settings):
                    out["object_key"].append(key)
                    out["chunk_key"].append(ch.key)
                    out["length"].append(ch.length)
                    out["position"].append(ch.position)
                    out["address"].append(ch.address)
                    out["chunk_data"].append(ch.data)
            yield pd.DataFrame(out)

    return sel.mapInPandas(_chunk_batches, schema=CHUNK_OUTPUT_SCHEMA)


def chunk_objects_segmented(
    df,
    settings: ChunkSettings | None = None,
    segment_size: int = 64 * 1024 * 1024,
    key_col: str = "object_key",
    data_col: str = "data",
):
    """Segment-framed distributed chunking for very large objects
    (SURVEY.md §7.3 mitigation).

    Plain :func:`chunk_objects` is sequential *within* an object — a
    single multi-GB object serializes into one task and one Arrow batch.
    Here the object is first split into ``segment_size`` frames entirely
    JVM-side (``substring`` on the binary column + ``posexplode`` of an
    offset ``sequence`` — no Python touches the payload until the CDC
    loop), each frame is chunked independently in parallel, chunk
    addresses are rebased by the frame offset, and the global ``position``
    ordinal is restored WITHOUT shuffling payloads: a per-frame chunk
    COUNT aggregate (a tiny (object, frame) table) takes a prefix-sum
    window, and the resulting base offsets broadcast-join back onto the
    chunk rows, which never move.

    Deviation from unsegmented chunking, by design: boundaries within
    ``max_chunk_size`` of a frame edge may differ (each frame starts a
    fresh window), so the same bytes chunked segmented vs unsegmented can
    produce different — still valid, still deterministic — chunk sets.
    An index must therefore pick one mode per index, exactly like the
    immutable chunking settings (DedupeLibrary.cs:583-603).

    ``segment_size`` must be >= ``max_chunk_size`` (a frame shorter than
    one max chunk defeats the purpose and breaks the tiling invariant).
    """
    settings = settings or ChunkSettings()
    if segment_size < settings.max_chunk_size:
        raise ValueError("segment_size must be >= max_chunk_size")
    import pandas as pd  # local import: executors re-import cheaply

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    n_frames = (F.length(data_col) + segment_size - 1).cast("long") / F.lit(segment_size)
    # explode the OFFSETS, then substring per exploded row: codegen
    # pipelines Generate -> Project, so each output row carries only its
    # own frame slice into the shuffle. The round-7 shape (a transform()
    # building the full array of slices, then posexplode) materialized a
    # second complete copy of every payload inside one row first —
    # measured 2.6x slower for the frame stage (3.7s vs 1.4s for 268 MB)
    # and the single biggest cost of the whole operator.
    frames = (
        df.select(key_col, data_col)
        .select(
            key_col,
            data_col,
            F.explode(F.sequence(F.lit(0), n_frames.cast("long") - 1)).alias(
                "frame_idx"
            ),
        )
        .select(
            key_col,
            "frame_idx",
            F.substring(
                F.col(data_col),
                (F.col("frame_idx") * segment_size + 1).cast("int"),
                segment_size,
            ).alias("frame_data"),
        )
        .withColumn("frame_addr", F.col("frame_idx").cast("long") * segment_size)
    )
    # spread the frames of one object across the cluster with an AQE
    # REBALANCE instead of a hard repartition(defaultParallelism): the
    # hard count pinned per-task payload to bytes/32, so a 3x bigger
    # ingest meant 3x bigger Arrow batches into each Python worker —
    # measured as the segmented path's 100x throughput decay
    # (SCALE_r08: 107 MB/s @x30 -> 63.5 @x100; profiled to THIS stage,
    # tools/profile_segmented.py). Rebalance targets
    # advisoryPartitionSizeInBytes per task at ANY volume — per-worker
    # memory stays constant whether the batch is 2 GB or 100 TB.
    frames = frames.hint("rebalance", key_col, "frame_idx")

    # flush the output accumulator once this many payload bytes are
    # buffered: without it one yield holds the whole input batch's chunk
    # rows (batch bytes are bounded only by rows-per-batch x frame size,
    # so a large partition meant a partition-sized Python-side copy —
    # part of the @x100 memory-pressure decay, SCALE_r08)
    _FLUSH_BYTES = 32 << 20

    def _chunk_frames(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = (
            "object_key",
            "frame_addr",
            "frame_pos",
            "chunk_key",
            "length",
            "address",
            "chunk_data",
        )
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            buffered = 0
            for key, base, payload in zip(
                pdf[key_col], pdf["frame_addr"], pdf["frame_data"]
            ):
                for ch in chunk_bytes(bytes(payload), settings):
                    out["object_key"].append(key)
                    out["frame_addr"].append(int(base))
                    out["frame_pos"].append(ch.position)
                    out["chunk_key"].append(ch.key)
                    out["length"].append(ch.length)
                    out["address"].append(int(base) + ch.address)
                    out["chunk_data"].append(ch.data)
                buffered += len(payload)
                if buffered >= _FLUSH_BYTES:
                    yield pd.DataFrame(out)
                    out = {c: [] for c in cols}
                    buffered = 0
            if out["object_key"]:
                yield pd.DataFrame(out)

    raw = frames.select(key_col, "frame_addr", "frame_data").mapInPandas(
        _chunk_frames,
        schema="object_key string, frame_addr long, frame_pos int, "
        "chunk_key string, length int, address long, chunk_data binary",
    )
    # persist so the per-frame count aggregate (the broadcast build side
    # below, computed first) populates the cache and the probe side
    # streams from it — the CDC kernel runs ONCE, not once per join side.
    # NOTE: Spark's CacheManager holds this by strong reference until an
    # explicit unpersist — it is NOT released when the plan is dropped.
    # Callers that materialize the result must release `out._cdc_cache`
    # (exposed below) or the payload-bearing chunk rows stay resident
    # for the session lifetime.
    raw = raw.persist()
    # Restore the global position WITHOUT shuffling chunk payloads: a
    # row_number window over the chunk rows would re-shuffle every byte
    # of chunk_data on object_key (measured ~2x the whole operator's
    # cost at the multi-hundred-MB design point). Chunks tile each
    # frame, so position = (chunks in earlier frames) + within-frame
    # ordinal — the per-frame counts are a tiny (object, frame) table
    # (bytes/segment_size rows), its prefix sum is a window over that
    # tiny table, and the join back is a broadcast hash join that
    # leaves chunk rows in place.
    counts = raw.groupBy(key_col, "frame_addr").agg(
        F.count("*").cast("long").alias("n_in_frame")
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("frame_addr")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = counts.select(
        key_col,
        "frame_addr",
        F.coalesce(F.sum("n_in_frame").over(wf), F.lit(0)).alias("pos_base"),
    )
    # ``base`` has one row per FRAME — it grows linearly with the ingest
    # batch, so an unconditional broadcast is this module's own
    # no-growing-broadcast violation (round-9 advice): a multi-TB write
    # batch would blow the broadcast cap / driver heap. Broadcast only
    # while the frame-count estimate (input plan statistics / frame
    # size, padded 8x for parquet compression understating raw bytes)
    # stays comfortably bounded; past that, pin a shuffle-hash join —
    # the payload shuffles ONCE (linear, spill-safe at any batch size)
    # and base stays the build side.
    try:
        # py4j maps scala BigInt to a Python int on recent Sparks and a
        # JavaObject on others — str() canonicalizes both
        est_bytes = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:  # noqa: BLE001 — stats are a planning hint only
        est_bytes = None
    small = est_bytes is not None and (est_bytes // segment_size) * 8 < 2_000_000
    if small:
        # the estimate is a pre-filter only: plan-stat bytes are parquet-
        # COMPRESSED, and text corpora routinely compress beyond the 8x
        # pad — and F.broadcast bypasses autoBroadcastJoinThreshold — so
        # confirm against the REAL frame count before forcing the
        # broadcast. The count executes the CDC kernel once into the
        # persisted cache, exactly the work the broadcast build side
        # would have done first anyway; the only extra cost is the tiny
        # counts aggregate. Estimate-says-big skips straight to
        # shuffle_hash with no count (correct at any size).
        small = base.count() < 250_000
    join_base = F.broadcast(base) if small else base.hint("shuffle_hash")
    out = (
        raw.join(join_base, [key_col, "frame_addr"])
        .select(
            "object_key",
            "chunk_key",
            "length",
            (F.col("pos_base") + F.col("frame_pos")).cast("int").alias("position"),
            "address",
            "chunk_data",
        )
    )
    # expose the internal cache so a caller that fully consumed the plan
    # can release it promptly (and so repeated identical invocations —
    # benchmarks — can force a real re-execution: Spark's CacheManager
    # matches on the canonicalized plan and would otherwise serve run 2
    # from run 1's persisted chunk rows)
    out._cdc_cache = raw
    return out
