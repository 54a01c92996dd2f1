"""Engine integration tests — the reference harness scenarios as invariants.

Scenario sources: SampleApp/Program.cs:19-35 (3-identical-writes dedup),
Cli/test.bat (50-copy ingest + prefix pagination + duplicate-key
rejection), Test.ReadStream/Program.cs:187-264 (random-access reads),
and FIXTURES.md §4 invariants.
"""

import random

import pytest
from pyspark.sql import functions as F

from watsondedupe_spark.chunking import ChunkSettings, SMALL_FILE_PROFILE
from watsondedupe_spark.engine import (
    DedupeEngine,
    DuplicateKeyError,
    ObjectNotFoundError,
)

SMALL = ChunkSettings(*SMALL_FILE_PROFILE)


def rand_bytes(n: int, seed: int) -> bytes:
    return random.Random(seed).randbytes(n)


@pytest.fixture(params=["file", "sqlite"])
def engine(spark, tmp_path, request):
    """Every engine scenario runs on BOTH store backends — the storage
    swap point (store.py) is proven by the second implementation passing
    the same engine suite with zero engine-code changes."""
    from watsondedupe_spark.store import IndexStore, SqliteIndexStore

    cls = IndexStore if request.param == "file" else SqliteIndexStore
    return DedupeEngine.create(spark, str(tmp_path / "idx"), SMALL, store_cls=cls)


def test_create_then_open_preserves_settings(spark, tmp_path):
    root = str(tmp_path / "idx")
    DedupeEngine.create(spark, root, SMALL)
    reopened = DedupeEngine.open(spark, root)
    assert reopened.settings == SMALL
    with pytest.raises(ValueError):
        DedupeEngine.create(spark, root, SMALL)


def test_open_missing_index(spark, tmp_path):
    with pytest.raises(FileNotFoundError):
        DedupeEngine.open(spark, str(tmp_path / "nope"))


@pytest.mark.parametrize("size", [1, 2048, 5000, 60_000])
def test_write_get_roundtrip(engine, size):
    data = rand_bytes(size, seed=size)
    engine.write(f"k{size}", data)
    assert engine.get(f"k{size}") == data


def test_duplicate_key_rejected_write_or_replace_succeeds(engine):
    engine.write("dup", b"version one")
    with pytest.raises(DuplicateKeyError):
        engine.write("dup", b"version two")
    engine.write_or_replace("dup", b"version two")
    assert engine.get("dup") == b"version two"
    assert engine.stats().object_count == 1


def test_exists_and_try_get(engine):
    engine.write("present", b"here")
    assert engine.exists("present")
    assert not engine.exists("absent")
    assert engine.try_get("present") == b"here"
    assert engine.try_get("absent") is None
    with pytest.raises(ObjectNotFoundError):
        engine.get("absent")


def test_three_identical_writes_dedup_ratio(engine):
    """SampleApp scenario: same payload under 3 keys => ratio ~= 3x."""
    data = rand_bytes(50_000, seed=1)
    df = engine.spark.createDataFrame(
        [(f"copy{i}", bytearray(data)) for i in range(3)], "object_key string, data binary"
    )
    engine.write_batch(df)
    s = engine.stats()
    assert s.object_count == 3
    assert s.logical_bytes == 3 * 50_000
    assert s.physical_bytes == 50_000
    assert s.ratio_x == pytest.approx(3.0)
    assert s.ratio_percent == pytest.approx(100 * (1 - 1 / 3))


def test_refcount_equals_map_count_invariant(engine):
    """DQ9: chunks.ref_count == COUNT(*) over object_map per chunk_key."""
    data = rand_bytes(40_000, seed=2)
    df = engine.spark.createDataFrame(
        [("a", bytearray(data)), ("b", bytearray(data)), ("c", bytearray(rand_bytes(9000, 3)))],
        "object_key string, data binary",
    )
    engine.write_batch(df)
    mismatch = (
        engine.chunks.alias("c")
        .join(
            engine.object_map.groupBy("chunk_key").agg(F.count("*").alias("n")).alias("m"),
            "chunk_key",
            "full_outer",
        )
        .filter(F.col("c.ref_count") != F.col("m.n"))
        .count()
    )
    assert mismatch == 0


def test_delete_gc_semantics(engine):
    """Invariant 5.3: deleting one of N refs GCs nothing; the last ref GCs."""
    data = rand_bytes(30_000, seed=4)
    df = engine.spark.createDataFrame(
        [("x", bytearray(data)), ("y", bytearray(data))], "object_key string, data binary"
    )
    engine.write_batch(df)
    assert engine.delete("x") == []  # shared chunks survive
    assert engine.get("y") == data
    gc = engine.delete("y")
    assert len(gc) > 0  # last reference frees all chunks
    s = engine.stats()
    assert s.object_count == 0 and s.chunk_count == 0
    assert engine.chunk_store.count() == 0
    assert engine.object_map.count() == 0
    with pytest.raises(ObjectNotFoundError):
        engine.delete("x")


def test_metadata_and_coverage_invariants(engine):
    """FIXTURES §4.2/4.5: comp_length = sum(map.length), chunk_count =
    count(map rows), positions are 0..n-1 by address, addresses tile."""
    data = rand_bytes(70_000, seed=5)
    engine.write("big", data)
    meta = engine.get_metadata("big")
    assert meta.original_length == 70_000
    assert meta.comp_length == sum(r.length for r in meta.object_map)
    assert meta.chunk_count == len(meta.object_map)
    addr = 0
    for i, r in enumerate(meta.object_map):
        assert r.position == i and r.address == addr
        addr += r.length
    assert addr == 70_000
    assert {c.chunk_key for c in meta.chunks} == {r.chunk_key for r in meta.object_map}


def test_map_for_position(engine):
    data = rand_bytes(40_000, seed=6)
    engine.write("pos", data)
    for p in [0, 1, 2048, 39_999]:
        rows = engine.map_for_position("pos", p).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r.address <= p < r.address + r.length
    assert engine.map_for_position("pos", 40_000).count() == 0


def test_get_range_matches_slices(engine):
    data = rand_bytes(50_000, seed=7)
    engine.write("rng", data)
    for off, ln in [(0, 10), (2047, 10), (16_000, 20_000), (49_990, 100), (50_000, 5)]:
        assert engine.get_range("rng", off, ln) == data[off : off + ln]
    assert engine.get_range("rng", 10, 0) == b""


def test_stream_read_and_seek(engine):
    """Invariant 5.4: DedupeStream reads equal slices at any seek position."""
    import io as _io

    data = rand_bytes(60_000, seed=8)
    engine.write("strm", data)
    s = engine.get_stream("strm")
    assert s.read(100) == data[:100]
    s.seek(30_000)
    assert s.read(5000) == data[30_000:35_000]
    s.seek(-100, _io.SEEK_END)
    assert s.read() == data[-100:]
    s.seek(0)
    assert s.read() == data
    assert s.read(10) == b""


def test_list_objects_keyset_pagination(engine):
    """Invariant 5.5: repeated pages walk all keys exactly once in id order."""
    df = engine.spark.createDataFrame(
        [(f"{i:03d}", bytearray(rand_bytes(300, i))) for i in range(25)],
        "object_key string, data binary",
    )
    engine.write_batch(df)
    seen: list[str] = []
    start, pages = 0, 0
    while True:
        page = engine.list_objects(index_start=start, max_results=10)
        seen += [o.object_key for o in page.objects]
        ids = [o.id for o in page.objects]
        assert ids == sorted(ids)
        pages += 1
        if page.next_index_start is None:
            break
        start = page.next_index_start
    assert seen == [f"{i:03d}" for i in range(25)]
    assert pages == 3

    pfx = engine.list_objects(prefix="01", max_results=100)
    assert [o.object_key for o in pfx.objects] == [f"01{i}" for i in range(10)]
    # page size is capped at 100 (EnumerationResult.cs:60)
    assert len(engine.list_objects(max_results=10_000).objects) == 25


def test_list_objects_prefix_supplementary_plane_keys(engine):
    """Round-9 advice (medium): the prefix prune bound must be the true
    prefix successor, not prefix + U+FFFF — a part holding only keys
    with supplementary-plane characters (emoji sort ABOVE U+FFFF) was
    silently pruned out of listings by the old bound."""
    # part 1: ONLY keys whose post-prefix char sorts above U+FFFF, so
    # the part's whole object_key span sits above "01" + U+FFFF
    hi = engine.spark.createDataFrame(
        [(f"01\U0001F600{i}", bytearray(rand_bytes(200, 90 + i))) for i in range(3)],
        "object_key string, data binary",
    )
    engine.write_batch(hi)
    # part 2: plain BMP keys under the same prefix, plus a decoy
    lo = engine.spark.createDataFrame(
        [("01a", bytearray(rand_bytes(200, 1))), ("02z", bytearray(rand_bytes(200, 2)))],
        "object_key string, data binary",
    )
    engine.write_batch(lo)
    got = sorted(o.object_key for o in engine.list_objects(prefix="01").objects)
    assert got == sorted([f"01\U0001F600{i}" for i in range(3)] + ["01a"])


def test_prefix_successor_bounds():
    from watsondedupe_spark.engine import _prefix_successor

    assert _prefix_successor("ab") == "ac"
    assert _prefix_successor("a\U0010FFFF") == "b"
    assert _prefix_successor("\U0010FFFF") is None
    # incrementing into the surrogate block skips to U+E000
    assert _prefix_successor("x퟿") == "x"
    # every string with the prefix sorts strictly below the successor
    for p in ("k", "01", "z\U0010FFFE"):
        s = _prefix_successor(p)
        assert p < s and (p + "\U0010FFFF" * 4) < s


def test_batch_rejects_duplicate_keys(engine):
    engine.write("taken", b"x")
    df = engine.spark.createDataFrame(
        [("new", bytearray(b"a")), ("taken", bytearray(b"b"))], "object_key string, data binary"
    )
    with pytest.raises(DuplicateKeyError):
        engine.write_batch(df)
    dup = engine.spark.createDataFrame(
        [("same", bytearray(b"a")), ("same", bytearray(b"b"))], "object_key string, data binary"
    )
    with pytest.raises(DuplicateKeyError):
        engine.write_batch(dup)


def test_ids_are_monotone_across_batches(engine):
    engine.write("first", b"1")
    engine.write("second", b"2")
    df = engine.spark.createDataFrame(
        [("third", bytearray(b"3")), ("fourth", bytearray(b"4"))], "object_key string, data binary"
    )
    engine.write_batch(df)
    rows = engine.objects.orderBy("id").collect()
    assert [r.id for r in rows] == [1, 2, 3, 4]
    assert rows[0].object_key == "first"


def test_empty_index_stats(engine):
    s = engine.stats()
    assert (s.object_count, s.chunk_count, s.logical_bytes, s.physical_bytes) == (0, 0, 0, 0)
    assert s.ratio_x == 0.0 and s.ratio_percent == 0.0


def test_get_batch_distributed_reassembly(engine):
    """get_batch reassembles every requested object byte-identically in
    one job; missing keys are absent (batched try_get semantics)."""
    payloads = {
        f"gb{i}": random.Random(400 + i).randbytes(5000 + 9000 * i) for i in range(4)
    }
    df = engine.spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()], "object_key string, data binary"
    )
    engine.write_batch(df)
    got = {
        r.object_key: bytes(r.data)
        for r in engine.get_batch([*payloads, "gb-missing"]).collect()
    }
    assert set(got) == set(payloads)  # missing key absent, no error
    for k, v in payloads.items():
        assert got[k] == v, k


def test_write_or_replace_batch_replaces_and_preserves_shared_chunks(spark, tmp_path):
    from pyspark.sql import functions as F

    from watsondedupe_spark.chunking import ChunkSettings
    from watsondedupe_spark.engine import DedupeEngine

    eng = DedupeEngine.create(spark, str(tmp_path / "ix"), ChunkSettings(2048, 16384, 128, 2))
    payload_a = b"alpha" * 2000
    payload_b = b"bravo" * 2000
    batch1 = spark.createDataFrame(
        [("k1", payload_a), ("k2", payload_a)], "object_key string, data binary"
    )
    eng.write_batch(batch1)

    # replace k2's content, add k3; k1 untouched
    batch2 = spark.createDataFrame(
        [("k2", payload_b), ("k3", payload_b)], "object_key string, data binary"
    )
    n = eng.write_or_replace_batch(batch2)
    assert n == 2

    assert bytes(eng.get("k1")) == payload_a  # shared chunks survived k2's delete
    assert bytes(eng.get("k2")) == payload_b
    assert bytes(eng.get("k3")) == payload_b
    # refcount invariant holds after the replace
    refs = {r.chunk_key: r.ref_count for r in eng.chunks.collect()}
    counts = {
        r.chunk_key: r.cnt
        for r in eng.object_map.groupBy("chunk_key").agg(F.count("*").alias("cnt")).collect()
    }
    assert refs == counts


def test_replace_batch_10k_keys_stays_distributed(spark, tmp_path, monkeypatch):
    """A bulk replace must never materialize the existing-key set on the
    driver: write_or_replace_batch hands delete_batch a DataFrame (the
    join path), and the GC set comes back as a DataFrame too. Refcount
    and GC semantics must match the list path exactly."""
    from pyspark.sql import DataFrame as SparkDataFrame
    from pyspark.sql import functions as F

    from watsondedupe_spark.chunking import ChunkSettings
    from watsondedupe_spark.engine import DedupeEngine

    eng = DedupeEngine.create(spark, str(tmp_path / "ix"), ChunkSettings(2048, 16384, 128, 2))
    n = 10_000
    batch1 = spark.range(n).select(
        F.concat(F.lit("k"), F.col("id")).alias("object_key"),
        F.encode(F.concat(F.lit("payload-v1-"), F.col("id")), "UTF-8").alias("data"),
    )
    assert eng.write_batch(batch1) == n

    seen: dict[str, type] = {}
    orig = DedupeEngine.delete_batch

    def spy(self, keys):
        seen["keys_type"] = type(keys)
        return orig(self, keys)

    monkeypatch.setattr(DedupeEngine, "delete_batch", spy)

    # replace every key with new content (all old single-chunk payloads
    # become garbage), plus one brand-new key
    batch2 = spark.range(n + 1).select(
        F.concat(F.lit("k"), F.col("id")).alias("object_key"),
        F.encode(F.concat(F.lit("payload-v2-"), F.col("id")), "UTF-8").alias("data"),
    )
    assert eng.write_or_replace_batch(batch2) == n + 1
    assert issubclass(seen["keys_type"], SparkDataFrame)  # join path, not a list

    assert eng.stats().object_count == n + 1
    assert bytes(eng.get("k0")) == b"payload-v2-0"
    assert bytes(eng.get(f"k{n}")) == f"payload-v2-{n}".encode()
    # GC: every v1 payload chunk is gone — store carries exactly the live set
    assert eng.chunk_store.count() == eng.chunks.count()
    # refcount invariant after the replace
    bad = (
        eng.chunks.join(
            eng.object_map.groupBy("chunk_key").agg(F.count("*").alias("cnt")),
            "chunk_key",
            "full_outer",
        )
        .filter(
            F.coalesce(F.col("ref_count"), F.lit(-1)) != F.coalesce(F.col("cnt"), F.lit(-2))
        )
        .count()
    )
    assert bad == 0


def test_delete_batch_dataframe_returns_gc_set(spark, tmp_path):
    """The DataFrame form of delete_batch returns the GC'd chunk keys as
    a DataFrame with the same contents the list form would produce."""
    from pyspark.sql import functions as F

    from watsondedupe_spark.chunking import ChunkSettings
    from watsondedupe_spark.engine import DedupeEngine

    eng = DedupeEngine.create(spark, str(tmp_path / "ix"), ChunkSettings(2048, 16384, 128, 2))
    shared = b"shared" * 2000
    batch = spark.createDataFrame(
        [("a", shared), ("b", shared), ("c", b"solo" * 3000)],
        "object_key string, data binary",
    )
    eng.write_batch(batch)
    solo_chunks = {r.chunk_key for r in eng.object_map.filter("object_key = 'c'").collect()}

    doomed = spark.createDataFrame([("b",), ("c",)], "object_key string")
    gc = eng.delete_batch(doomed)
    assert {r.chunk_key for r in gc.collect()} == solo_chunks  # shared chunks survive via 'a'
    assert bytes(eng.get("a")) == shared
    assert eng.stats().object_count == 1


def test_delete_list_form_caps_gc_return(spark, tmp_path, monkeypatch):
    """A list-key delete whose GC set exceeds GC_RETURN_CAP returns a
    DataFrame (the distributed contract), never a driver-side list."""
    import watsondedupe_spark.engine as engine_mod
    from watsondedupe_spark.chunking import ChunkSettings
    from watsondedupe_spark.engine import DedupeEngine

    monkeypatch.setattr(engine_mod, "GC_RETURN_CAP", 3)
    eng = DedupeEngine.create(spark, str(tmp_path / "ix"), ChunkSettings(2048, 16384, 128, 2))
    eng.write("big", rand_bytes(120_000, seed=77))  # many unique chunks
    n_chunks = eng.object_map.count()
    assert n_chunks > 3

    gc = eng.delete("big")
    from pyspark.sql import DataFrame

    assert isinstance(gc, DataFrame)  # above-cap GC set stays distributed
    assert gc.count() == n_chunks
    assert eng.stats().object_count == 0
    assert eng.chunk_store.count() == 0  # payloads actually GC'd

    # under the cap the reference-faithful list still comes back
    eng.write("small", b"tiny")
    assert eng.delete("small") != []  # one chunk -> list form
    assert isinstance(eng.delete_batch([]), list)


def test_store_append_is_incremental_and_compaction_folds(spark, tmp_path):
    """Appends must write only the new part (O(batch) I/O) and fold into
    one part after max_parts accumulate."""
    from pyspark.sql import functions as F

    from watsondedupe_spark.store import IndexStore

    store = IndexStore(spark, str(tmp_path / "st"))
    store.max_parts = 4
    for i in range(4):
        store.append("config", spark.createDataFrame([(f"k{i}", f"v{i}")], "key string, value string"))
    assert len(store._state("config")["parts"]) == 4
    # 5th append exceeds max_parts: folds everything into one part + itself
    store.append("config", spark.createDataFrame([("k4", "v4")], "key string, value string"))
    assert len(store._state("config")["parts"]) == 1
    rows = {(r.key, r.value) for r in store.read("config").collect()}
    assert rows == {(f"k{i}", f"v{i}") for i in range(5)}
    # explicit compact is a no-op on one part but keeps contents intact
    store.compact("config")
    assert {(r.key, r.value) for r in store.read("config").collect()} == rows
    # commit retires all prior parts
    store.commit("config", spark.createDataFrame([("only", "row")], "key string, value string"))
    assert len(store._state("config")["parts"]) == 1
    assert store.read("config").count() == 1


def test_incremental_views_across_versions(spark, tmp_path):
    from watsondedupe_spark.engine import DedupeEngine

    eng = DedupeEngine.create(spark, str(tmp_path / "incr_idx"))
    eng.write("a", b"first payload " * 300)
    v_chunks = eng.store.current_version("chunks")
    v_objects = eng.store.current_version("objects")
    eng.write("b", b"second payload entirely different " * 300)

    new_chunks = {r.chunk_key for r in eng.chunks_added_since(v_chunks).collect()}
    b_chunks = {r.chunk_key for r in eng.get_chunks("b").collect()}
    a_chunks = {r.chunk_key for r in eng.get_chunks("a").collect()}
    assert new_chunks == b_chunks - a_chunks
    assert not (new_chunks & a_chunks)

    new_objects = eng.objects_added_since(v_objects).collect()
    assert [r.object_key for r in new_objects] == ["b"]


def test_op_lock_reentrant_same_thread(spark, tmp_path):
    """The composite-op lock is reentrant per thread (round-6 advice):
    nested acquisition must not deadlock — it is what lets
    write_or_replace hold one critical section across delete+write."""
    from watsondedupe_spark.store import IndexStore

    store = IndexStore(spark, str(tmp_path / "reent"))
    with store.op_lock():
        with store.op_lock():  # would flock-deadlock without reentrancy
            with store.op_lock("other"):  # independent name, same tls
                pass
        # inner exit must NOT release the outer hold: a second store
        # instance (fresh file description) still blocks on the lock
        import fcntl

        other = IndexStore(spark, str(tmp_path / "reent"))
        fd = __import__("os").open(str(tmp_path / "reent" / "_OPLOCK.write"), 2)
        try:
            with pytest.raises(BlockingIOError):
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
        finally:
            __import__("os").close(fd)
        assert other is not None
    # fully released after the outer exit
    fd = __import__("os").open(str(tmp_path / "reent" / "_OPLOCK.write"), 2)
    import fcntl

    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    fcntl.flock(fd, fcntl.LOCK_UN)
    __import__("os").close(fd)


def test_write_or_replace_batch_atomic_and_correct(engine, spark):
    """Batched O5 replaces existing keys and ingests new ones in one
    composite critical section (the delete+write phases share the
    reentrant op_lock — no DuplicateKeyError window)."""
    df1 = spark.createDataFrame(
        [("r1", bytearray(b"one" * 1000)), ("r2", bytearray(b"two" * 1000))],
        "object_key string, data binary",
    )
    engine.write_batch(df1)
    df2 = spark.createDataFrame(
        [("r2", bytearray(b"TWO" * 1500)), ("r3", bytearray(b"three" * 1000))],
        "object_key string, data binary",
    )
    assert engine.write_or_replace_batch(df2) == 2
    assert engine.get("r1") == b"one" * 1000
    assert engine.get("r2") == b"TWO" * 1500
    assert engine.get("r3") == b"three" * 1000
    assert engine.stats().object_count == 3


def test_recover_prunes_partial_ingest(engine, spark):
    """Crash-repair scan (round-6 advice): map/chunk/payload rows whose
    key never reached the objects table (the logical commit point) are
    pruned and refcounts rebuilt; shared chunks survive with corrected
    counts; a healthy index reports zero deltas."""
    from pyspark.sql import functions as F

    engine.write("keep", b"shared payload " * 500)
    assert engine.recover() == {"object_map": 0, "chunks": 0, "chunk_store": 0}

    # simulate a crashed ingest: a second key committed its map rows,
    # refcount increments, and one orphan-only payload — but no objects
    # row (the thread pool died before write_objects landed)
    keep_map = engine.get_object_map("keep").collect()
    ghost_map = [
        ("ghost", r.chunk_key, r.length, r.position, r.address) for r in keep_map
    ] + [("ghost", "ghost_only_chunk", 7, len(keep_map), keep_map[-1].address + keep_map[-1].length)]
    engine.store.append(
        "object_map",
        spark.createDataFrame(
            ghost_map,
            "object_key string, chunk_key string, length int, position int, address long",
        ),
    )
    v, chunks, _ = engine.store.snapshot("chunks")
    engine.store.commit(
        "chunks",
        chunks.withColumn("ref_count", F.col("ref_count") + 1).unionByName(
            spark.createDataFrame(
                [("ghost_only_chunk", 7, 1)], "chunk_key string, length int, ref_count long"
            )
        ),
        expected_version=v,
    )
    engine.store.append(
        "chunk_store",
        spark.createDataFrame(
            [("ghost_only_chunk", bytearray(b"ghostly"))], "chunk_key string, data binary"
        ),
    )

    deltas = engine.recover()
    assert deltas["object_map"] == -len(ghost_map)
    assert deltas["chunks"] == -1  # only the ghost-only chunk drops
    assert deltas["chunk_store"] == -1
    # the survivor is fully intact with its original refcounts
    assert engine.get("keep") == b"shared payload " * 500
    assert engine.chunks.filter(F.col("ref_count") != 1).count() == 0
    assert engine.recover() == {"object_map": 0, "chunks": 0, "chunk_store": 0}


def test_recover_is_resumable_after_partial_repair(engine, spark):
    """A crash mid-recover (map pruned, refcounts not yet rebuilt) must
    be finished by a second recover() — each table is verified
    independently, no early-out on a clean object_map."""
    from pyspark.sql import functions as F

    engine.write("solo", b"resumable payload " * 400)
    # the half-recovered state: object_map already clean, but chunks
    # carry inflated refcounts and an orphan chunk + payload linger
    v, chunks, _ = engine.store.snapshot("chunks")
    engine.store.commit(
        "chunks",
        chunks.withColumn("ref_count", F.col("ref_count") + 3).unionByName(
            spark.createDataFrame(
                [("lingering_chunk", 5, 2)], "chunk_key string, length int, ref_count long"
            )
        ),
        expected_version=v,
    )
    engine.store.append(
        "chunk_store",
        spark.createDataFrame(
            [("lingering_chunk", bytearray(b"xxxxx"))], "chunk_key string, data binary"
        ),
    )
    deltas = engine.recover()
    assert deltas["object_map"] == 0
    assert deltas["chunks"] == -1
    assert deltas["chunk_store"] == -1
    assert engine.chunks.filter(F.col("ref_count") != 1).count() == 0
    assert engine.get("solo") == b"resumable payload " * 400
    assert engine.recover() == {"object_map": 0, "chunks": -0, "chunk_store": -0}


@pytest.mark.parametrize("crash_point", ["object_map", "chunks", "chunk_store", "objects"])
def test_crash_matrix_real_write_path(engine, spark, crash_point):
    """Round-7 crash matrix: crash-inject the REAL write path after each
    of the four table commits (``_crash_after`` forces the deterministic
    sequential commit order) and assert the exact repair semantics per
    point. The commit-order invariant — objects commits LAST — makes the
    post-objects crash a complete ingest (zero repairs) and guarantees a
    reader can never observe a key with missing map/chunks/payloads.
    Runs on both backends via the engine fixture."""
    from watsondedupe_spark.engine import SimulatedCrash

    base = b"crash matrix shared payload " * 200
    engine.write("base", base)
    n_base_map = engine.get_object_map("base").count()
    n_base_chunks = engine.chunks.count()
    n_base_store = engine.chunk_store.count()

    victims = spark.createDataFrame(
        [
            ("vic_dup", bytearray(base)),  # shares EVERY chunk with base
            ("vic_uniq", bytearray(b"unique victim bytes/" * 400)),
        ],
        "object_key string, data binary",
    )
    engine._crash_after = crash_point
    try:
        with pytest.raises(SimulatedCrash):
            engine.write_batch(victims)
    finally:
        engine._crash_after = None

    if crash_point == "objects":
        # past the logical commit point: the ingest is complete
        assert engine.recover() == {"object_map": 0, "chunks": 0, "chunk_store": 0}
        assert engine.get("vic_dup") == base
        assert engine.get("vic_uniq") == b"unique victim bytes/" * 400
        # shared chunks were deduped, refcounts doubled on base's chunks
        assert engine.chunks.filter(F.col("ref_count") == 2).count() == n_base_map
        return

    # pre-objects crash: victims must not exist observably even BEFORE
    # repair (reads resolve through objects — the invariant's payoff)
    assert not engine.exists("vic_dup") and not engine.exists("vic_uniq")

    deltas = engine.recover()
    n_vic_map = deltas["object_map"]
    assert n_vic_map < 0  # map committed first in every pre-objects state
    if crash_point == "object_map":
        # only the map landed: no chunk/payload wreckage to prune
        assert deltas["chunks"] == 0 and deltas["chunk_store"] == 0
    elif crash_point == "chunks":
        # unique victim chunks entered the chunks table; payloads did not
        assert deltas["chunks"] < 0 and deltas["chunk_store"] == 0
    else:  # chunk_store
        assert deltas["chunks"] < 0 and deltas["chunk_store"] < 0

    # wreckage fully gone: tables back at base cardinality, refcounts
    # rebuilt to exactly the map-derived truth, survivor readable
    assert engine.object_map.count() == n_base_map
    assert engine.chunks.count() == n_base_chunks
    assert engine.chunk_store.count() == n_base_store
    assert engine.chunks.filter(F.col("ref_count") != 1).count() == 0
    assert engine.get("base") == base
    assert engine.recover() == {"object_map": 0, "chunks": 0, "chunk_store": 0}


def test_point_reads_prune_parts_at_plan_level(spark, tmp_path):
    """Round-8 data skipping: with three parts of disjoint key spans,
    a point read must PLAN a scan over exactly one part directory —
    the manifest min/max check runs before Spark ever opens a footer."""
    import re

    from pyspark.sql import functions as F

    from watsondedupe_spark import plans as P
    from watsondedupe_spark.chunking import ChunkSettings
    from watsondedupe_spark.engine import DedupeEngine

    eng = DedupeEngine.create(
        spark, str(tmp_path / "ix"), ChunkSettings(256, 2048, 16, 2)
    )
    for lo in (0, 10, 20):
        rows = [(f"k{lo + i:04d}", bytearray(f"payload-{lo + i}".encode() * 300))
                for i in range(10)]
        eng.write_batch(
            spark.createDataFrame(rows, "object_key string, data binary")
        )
    state = eng.store._state("objects")
    assert len(state["parts"]) == 3

    probe = eng.store.read_point("objects", "object_key", ["k0015"]).filter(
        F.col("object_key") == "k0015"
    )
    locs = re.findall(r"Location: InMemoryFileIndex \[([^\]]*)\]", P.physical_plan(probe))
    assert locs and all(len(loc.split(",")) == 1 for loc in locs), locs
    assert probe.count() == 1

    # engine-level reads resolve through the pruned path
    assert eng.exists("k0015") and not eng.exists("nope")
    assert eng.get("k0015") == b"payload-15" * 300
    assert eng.get_range("k0015", 3, 7) == (b"payload-15" * 300)[3:10]
    page = eng.list_objects(prefix="k00", max_results=100)
    assert len(page.objects) == 30


def test_verify_clean_index_and_planted_faults(engine):
    """engine.verify(): empty on a healthy index; each planted fault
    class is detected exactly once, including missing_payload (a
    payload row dropped by raw store surgery) which the graded query
    does not plant. Runs on both store backends via the fixture."""
    from watsondedupe_spark.keys import chunk_key

    spark = engine.spark
    engine.write_batch(
        spark.createDataFrame(
            [(f"k{i}", bytearray(rand_bytes(6000, 70 + i))) for i in range(4)],
            "object_key string, data binary",
        )
    )
    assert engine.verify().count() == 0

    victim, loser = [
        r.chunk_key
        for r in engine.chunks.orderBy("chunk_key").limit(2).collect()
    ]
    # garbage payload under an existing key + an unreferenced payload
    orphan = b"___orphan"
    engine.store.append(
        "chunk_store",
        spark.createDataFrame(
            [(victim, bytearray(b"x")), (chunk_key(orphan), bytearray(orphan))],
            "chunk_key string, data binary",
        ),
    )
    # ghost map row (object never committed) referencing the victim
    engine.store.append(
        "object_map",
        spark.createDataFrame(
            [("___ghost", victim, 1, 0, 0)],
            "object_key string, chunk_key string, length int, position int, address long",
        ),
    )
    # drop one payload entirely: missing_payload for `loser`
    v, cs, _ = engine.store.snapshot("chunk_store")
    engine.store.commit(
        "chunk_store", cs.filter(F.col("chunk_key") != loser), expected_version=v
    )

    got = {
        (r.check, r.key)
        for r in engine.verify().collect()
    }
    assert got == {
        ("hash_mismatch", victim),
        ("dup_payload", victim),
        ("length_drift", victim),
        ("orphan_payload", chunk_key(orphan)),
        ("orphan_map", "___ghost"),
        ("refcount_drift", victim),
        ("missing_payload", loser),
    }


def test_repair_heals_fixable_faults_and_escalates_unfixable(engine):
    """engine.repair(): the planted fault matrix heals to a clean
    verify(); a chunk whose ONLY payload row is corrupt cannot be
    healed from the index — its garbage is dropped and the loss
    surfaces as missing_payload (honest escalation, never silently
    wrong bytes)."""
    from watsondedupe_spark.keys import chunk_key

    spark = engine.spark
    engine.write_batch(
        spark.createDataFrame(
            [(f"r{i}", bytearray(rand_bytes(6000, 80 + i))) for i in range(3)],
            "object_key string, data binary",
        )
    )
    victim, lost = [
        r.chunk_key for r in engine.chunks.orderBy("chunk_key").limit(2).collect()
    ]
    orphan = b"___orphan2"
    engine.store.append(
        "chunk_store",
        spark.createDataFrame(
            [(victim, bytearray(b"x")), (chunk_key(orphan), bytearray(orphan))],
            "chunk_key string, data binary",
        ),
    )
    engine.store.append(
        "object_map",
        spark.createDataFrame(
            [("___ghost", victim, 1, 0, 0)],
            "object_key string, chunk_key string, length int, position int, address long",
        ),
    )
    # make `lost` solely-corrupt: replace its only payload with garbage
    v, cs, _ = engine.store.snapshot("chunk_store")
    surgically = cs.withColumn(
        "data",
        F.when(F.col("chunk_key") == lost, F.lit(b"rot")).otherwise(F.col("data")),
    )
    engine.store.commit("chunk_store", surgically, expected_version=v)

    assert engine.verify().count() > 0
    deltas = engine.repair()
    assert deltas["chunk_store_canonicalized"] < 0
    left = {(r.check, r.key) for r in engine.verify().collect()}
    # everything healed except the unhealable data loss, now explicit
    assert left == {("missing_payload", lost)}
    # repair is idempotent: a second pass changes nothing more
    again = engine.repair()
    assert again["chunk_store_canonicalized"] == 0
    assert {(r.check, r.key) for r in engine.verify().collect()} == left


def test_verify_and_repair_flag_null_payloads(engine):
    """Round-10 advice: a NULL chunk_store payload makes the recomputed
    hash and stored length NULL, and a plain ``!=`` evaluates to NULL —
    the unreadable row would escape hash_mismatch/length_drift AND
    repair()'s detection count. The null-safe comparisons must flag it
    like any other corruption: a NULL duplicate is canonicalized away,
    a solely-NULL chunk escalates honestly to missing_payload."""
    spark = engine.spark
    engine.write_batch(
        spark.createDataFrame(
            [(f"n{i}", bytearray(rand_bytes(6000, 90 + i))) for i in range(3)],
            "object_key string, data binary",
        )
    )
    victim, solo = [
        r.chunk_key for r in engine.chunks.orderBy("chunk_key").limit(2).collect()
    ]
    # NULL duplicate payload under `victim`
    engine.store.append(
        "chunk_store",
        spark.createDataFrame([(victim, None)], "chunk_key string, data binary"),
    )
    # make `solo`'s ONLY payload NULL via store surgery
    v, cs, _ = engine.store.snapshot("chunk_store")
    surgically = cs.withColumn(
        "data",
        F.when(F.col("chunk_key") == solo, F.lit(None).cast("binary")).otherwise(
            F.col("data")
        ),
    )
    engine.store.commit("chunk_store", surgically, expected_version=v)

    got = {(r.check, r.key) for r in engine.verify().collect()}
    assert got == {
        ("hash_mismatch", victim),
        ("dup_payload", victim),
        ("length_drift", victim),
        ("hash_mismatch", solo),
        ("length_drift", solo),
    }

    deltas = engine.repair()
    assert deltas["chunk_store_canonicalized"] == -2  # both NULL rows dropped
    left = {(r.check, r.key) for r in engine.verify().collect()}
    assert left == {("missing_payload", solo)}


def test_verify_scoped_modes(engine):
    """Scoped scrubs (round 10): shard runs partition the payload
    checks exactly (disjoint union == full scan's payload classes,
    metadata-wide checks reported only by the full scan); an
    incremental scan against the CURRENT version is empty; a bad shard
    index raises."""
    spark = engine.spark
    engine.write_batch(
        spark.createDataFrame(
            [(f"s{i}", bytearray(rand_bytes(6000, 100 + i))) for i in range(4)],
            "object_key string, data binary",
        )
    )
    victim = engine.chunks.agg(F.min("chunk_key")).collect()[0][0]
    engine.store.append(
        "chunk_store",
        spark.createDataFrame([(victim, bytearray(b"x"))],
                              "chunk_key string, data binary"),
    )
    full = {(r.check, r.key) for r in engine.verify().collect()}
    payload_full = {(c, k) for c, k in full if c not in ("refcount_drift", "orphan_map")}
    shard_union: set = set()
    for i in range(3):
        got = {(r.check, r.key) for r in engine.verify(shards=(i, 3)).collect()}
        assert not shard_union & got  # disjoint
        assert not {c for c, _ in got} & {"refcount_drift", "orphan_map"}
        shard_union |= got
    assert shard_union == payload_full
    # nothing appended since the current version -> empty incremental
    v_now = engine.store.versions("chunk_store")[-1]
    assert engine.verify(since_version=v_now).count() == 0
    with pytest.raises(ValueError):
        engine.verify(shards=(3, 3))


def test_clone_roundtrip_and_refusals(engine, tmp_path):
    """clone() (round 10): replica preserves settings and bytes on the
    OPPOSITE backend, refuses an existing destination, and keeps the
    ingest-id high-water so post-clone writes never collide."""
    from watsondedupe_spark.engine import DedupeEngine
    from watsondedupe_spark.store import IndexStore, SqliteIndexStore

    spark = engine.spark
    payloads = {f"c{i}": rand_bytes(6000, 110 + i) for i in range(3)}
    engine.write_batch(
        spark.createDataFrame(
            [(k, bytearray(v)) for k, v in payloads.items()],
            "object_key string, data binary",
        )
    )
    other = (
        SqliteIndexStore if isinstance(engine.store, IndexStore) else IndexStore
    )
    dest = str(tmp_path / "clone")
    engine.clone(dest, store_cls=other)
    clone = DedupeEngine.open(spark, dest)
    assert isinstance(clone.store, other)
    assert clone.settings == engine.settings
    for k, v in payloads.items():
        assert clone.get(k) == v
    # id continuity: next ingest id continues above the carried high-water
    clone.write("c_new", b"y" * 6000)
    ids = sorted(r.id for r in clone.objects.collect())
    assert ids == [1, 2, 3, 4]
    # destination already an index -> refuse
    with pytest.raises(ValueError):
        engine.clone(dest)


def test_checkpoint_ledger_and_pitr(engine, tmp_path):
    """Consistency-point ledger (round 10): each composite op appends
    one row inside its critical section; clone(at=) restores a named
    point — including objects deleted after it; unknown seq raises."""
    from watsondedupe_spark.engine import DedupeEngine

    spark = engine.spark
    assert engine.checkpoints.count() == 0
    engine.write_batch(
        spark.createDataFrame(
            [("p1", bytearray(rand_bytes(6000, 120))),
             ("p2", bytearray(rand_bytes(6000, 121)))],
            "object_key string, data binary",
        )
    )
    engine.write_batch(
        spark.createDataFrame(
            [("p3", bytearray(rand_bytes(6000, 122)))],
            "object_key string, data binary",
        )
    )
    engine.delete_batch(["p1"])
    ops = [(r.seq, r.op) for r in engine.checkpoints.orderBy("seq").collect()]
    assert ops == [(1, "ingest"), (2, "ingest"), (3, "delete")]

    engine.clone(str(tmp_path / "r"), at=2)
    restored = DedupeEngine.open(spark, str(tmp_path / "r"))
    keys = {r.object_key for r in restored.objects.collect()}
    assert keys == {"p1", "p2", "p3"}  # p1 is back, pre-delete state
    assert restored.get("p1") == rand_bytes(6000, 120)
    with pytest.raises(ValueError):
        engine.clone(str(tmp_path / "x"), at=99)


def test_restore_inplace_and_redo(engine):
    """restore(at=) (round 10): metadata-only rollback of the live
    index — deleted objects come back byte-identical, post-restore
    writes continue cleanly from the restored high-water, and the
    rollback is itself undoable (restore forward to a later point)."""
    spark = engine.spark
    p1, p2 = rand_bytes(6000, 130), rand_bytes(6000, 131)
    engine.write_batch(
        spark.createDataFrame(
            [("r1", bytearray(p1)), ("r2", bytearray(p2))],
            "object_key string, data binary",
        )
    )
    engine.delete_batch(["r1"])  # point 2
    assert not engine.exists("r1")
    engine.restore(at=1)
    assert engine.get("r1") == p1 and engine.get("r2") == p2
    # post-restore ingest: id continues from the restored high-water
    engine.write_batch(
        spark.createDataFrame(
            [("r3", bytearray(rand_bytes(6000, 132)))],
            "object_key string, data binary",
        )
    )
    assert sorted(r.id for r in engine.objects.collect()) == [1, 2, 3]
    # the rollback is itself undoable: restore forward to the
    # post-delete point — r1 gone again, r3 (written after) gone too
    engine.restore(at=2)
    keys = {r.object_key for r in engine.objects.collect()}
    assert keys == {"r2"}
    with pytest.raises(ValueError):
        engine.restore(at=99)


def test_verify_consistent_mode_suppresses_torn_reads(engine):
    """verify(consistent=True) (round 10): a scrub racing a live ingest
    must not page on a torn cross-table interleaving. Simulate the torn
    state with raw store surgery (a chunks row committed whose payload
    has not landed yet — exactly mid-_commit_ingest): the current-state
    scan reports it, the ledger-cut scan stays clean because the cut
    predates the tear; after the next composite op records a new point,
    consistent mode sees the (healed) real state again."""
    spark = engine.spark
    engine.write_batch(
        spark.createDataFrame(
            [("t1", bytearray(rand_bytes(6000, 140)))],
            "object_key string, data binary",
        )
    )
    assert engine.verify(consistent=True).count() == 0
    # torn state: chunks row without its payload (mid-ingest shape)
    engine.store.append(
        "chunks",
        spark.createDataFrame(
            [("zz_torn_key", 7, 1)], "chunk_key string, length int, ref_count long"
        ),
    )
    assert {r.check for r in engine.verify().collect()} >= {"missing_payload"}
    assert engine.verify(consistent=True).count() == 0  # pinned to the cut


def test_restore_refuses_expired_point_atomically(engine, spark):
    """restore(at=) must be all-or-nothing (round 11): tables version at
    different rates, so a ledger point can outlive SOME of its four
    manifest versions. Restoring such a point must fail BEFORE the first
    manifest flip — a mid-loop failure would leave the index torn (some
    tables rolled back, others current) and a later recover() would GC
    payloads for the torn-away objects."""
    engine.write_batch(
        spark.createDataFrame(
            [("e1", bytearray(rand_bytes(6000, 160))),
             ("e2", bytearray(rand_bytes(6000, 161)))],
            "object_key string, data binary",
        )
    )  # point 1
    # age ONLY the chunks table past the retention window (objects'
    # point-1 version stays retained — the asymmetry under test)
    for _ in range(engine.store.retain_versions + 2):
        v, chunks, _ = engine.store.snapshot("chunks")
        engine.store.commit("chunks", chunks, expected_version=v)
    before = {
        t: engine.store.current_version(t)
        for t in ("objects", "object_map", "chunks", "chunk_store")
    }
    with pytest.raises(ValueError, match="expired|not retained|restorable"):
        engine.restore(at=1)
    after = {
        t: engine.store.current_version(t)
        for t in ("objects", "object_map", "chunks", "chunk_store")
    }
    assert after == before  # NO table was flipped — not even objects
    assert engine.get("e1") == rand_bytes(6000, 160)
    assert engine.recover() == {"object_map": 0, "chunks": 0, "chunk_store": 0}


def test_recover_checkpoints_stale_refcount_repair(engine, spark):
    """recover() with inflated-but-same-cardinality refcounts rewrites
    chunks with deltas['chunks'] == 0 (round 11): the repair COMMIT, not
    the row delta, must drive the new consistency point — otherwise a
    restore/clone to the latest point silently rolls the repair back."""
    engine.write("s1", b"stale refcount payload " * 300)
    n_points = engine.checkpoints.count()
    v, chunks, _ = engine.store.snapshot("chunks")
    engine.store.commit(
        "chunks",
        chunks.withColumn("ref_count", F.col("ref_count") + 5),
        expected_version=v,
    )
    deltas = engine.recover()
    assert deltas == {"object_map": 0, "chunks": 0, "chunk_store": 0}
    last = engine.checkpoints.orderBy(F.desc("seq")).first()
    assert engine.checkpoints.count() == n_points + 1 and last.op == "recover"
    # the latest point now NAMES the repaired state: restoring to it
    # keeps the rebuilt refcounts
    engine.restore(at=int(last.seq))
    assert engine.chunks.filter(F.col("ref_count") != 1).count() == 0
    # and a genuinely clean pass still records nothing new
    n_points = engine.checkpoints.count()
    assert engine.recover() == {"object_map": 0, "chunks": 0, "chunk_store": 0}
    assert engine.checkpoints.count() == n_points


def test_clone_at_preserves_id_high_water(engine, tmp_path):
    """clone(at=) must carry the objects high-water mark AS OF the
    checkpoint from the manifest meta (round 11), not max(id) of the
    restored rows — ids of objects deleted before the point must never
    be reused by post-clone ingest."""
    from watsondedupe_spark.engine import DedupeEngine

    spark = engine.spark
    engine.write("h1", rand_bytes(6000, 170))  # id 1
    engine.write("h2", rand_bytes(6000, 171))  # id 2
    engine.delete("h2")  # point: objects == {h1}, meta max_id == 2
    point = engine.checkpoints.orderBy(F.desc("seq")).first()
    assert point.op == "delete"
    clone = engine.clone(str(tmp_path / "pitr"), at=int(point.seq))
    clone.write("h3", rand_bytes(6000, 172))
    ids = sorted(r.id for r in clone.objects.collect())
    assert ids == [1, 3]  # h2's id 2 is retired, not recycled


def test_verify_shard_validates_index_types(engine):
    """A float shard index would build a range predicate matching
    nothing — a silently-clean scan of zero chunks (round 11)."""
    for bad in ((1.5, 4), (0, 4.0), ("1", 4)):
        with pytest.raises(ValueError):
            engine.verify(shards=bad)


def test_cli_shard_parse_errors_are_argparse_errors():
    import argparse

    from watsondedupe_spark.cli import _parse_shard

    assert _parse_shard("2/4") == (2, 4)
    assert _parse_shard("0/1") == (0, 1)
    for bad in ("1.5/4", "3", "4/4", "2/0", "a/b", "-1/4"):
        with pytest.raises(argparse.ArgumentTypeError):
            _parse_shard(bad)


def test_shard_range_partitions_key_space_exactly():
    """The rolling-scrub cells are key RANGES (round 11): every possible
    urlsafe-b64 key lands in exactly one shard for any n, and the union
    of the n ranges is unbounded on both ends."""
    import random as _random

    from watsondedupe_spark.engine import SHARD_CELLS, shard_range

    alpha = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_"
    rng = _random.Random(7)
    keys = ["".join(rng.choice(alpha) for _ in range(43)) for _ in range(500)]

    def member(k, lo, hi):
        return (lo is None or k >= lo) and (hi is None or k < hi)

    for n in (1, 2, 3, 4, 7, 64, 100):
        bounds = [shard_range(i, n) for i in range(n)]
        assert bounds[0][0] is None and bounds[-1][1] is None
        # contiguous: each hi == next lo
        for (lo_a, hi_a), (lo_b, hi_b) in zip(bounds, bounds[1:]):
            assert hi_a == lo_b and hi_a is not None
        for k in keys:
            assert sum(member(k, lo, hi) for lo, hi in bounds) == 1, (k, n)
    with pytest.raises(ValueError):
        shard_range(0, SHARD_CELLS + 1)
    with pytest.raises(ValueError):
        shard_range(-1, 4)


def test_shard_scan_pushes_range_predicate_and_prunes_io(spark, tmp_path):
    """The shard predicate must reach the parquet scan as PushedFilters
    (round 11): on the optimize()-range-clustered layout that is what
    makes a 1/n scrub read ~1/n of the payload bytes at 100 TB instead
    of post-filtering a full scan. Also pins the clustering itself:
    after optimize(), chunk_store files cover narrow disjoint key spans."""
    import glob
    import random as _random

    import pyarrow.parquet as pq

    engine = DedupeEngine.create(spark, str(tmp_path / "idx"), SMALL)
    rng = _random.Random(11)
    engine.write_batch(
        spark.createDataFrame(
            [(f"k{i}", bytearray(rng.randbytes(6000))) for i in range(32)],
            "object_key string, data binary",
        )
    )
    # at test scale the size-derived file count is 1; shrink the target
    # so the rewrite shows its multi-file shape (at 100 TB the 128 MB
    # default produces thousands of files)
    engine.OPTIMIZE_TARGET_FILE_BYTES = 16_384
    engine.optimize()
    plan = engine.verify(shards=(1, 4))._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(chunk_key" in plan, plan[:4000]
    assert "LessThan(chunk_key" in plan, plan[:4000]
    # the witness above can be satisfied by the chunks METADATA scan alone
    # (verify() eagerly checkpoints the payload branch before the plan is
    # captured) — so also pin pushdown on the PAYLOAD scan directly: the
    # only FileScan in this plan is the chunk_store relation, so range
    # pushdown here IS the 1/n-IO claim's witness
    from watsondedupe_spark.engine import shard_predicate

    payload_plan = (
        engine.chunk_store.filter(shard_predicate(1, 4))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the relation witness is the ReadSchema (only chunk_store carries a
    # binary data column) — the Location path string is truncated at
    # ~100 chars and cannot be matched reliably
    assert "data:binary" in payload_plan, payload_plan[:4000]
    assert "GreaterThanOrEqual(chunk_key" in payload_plan, payload_plan[:4000]
    assert "LessThan(chunk_key" in payload_plan, payload_plan[:4000]
    # layout: every rewritten file spans a narrow key range, files are
    # mutually disjoint (that disjointness IS the row-group prunability)
    part = engine.store._state("chunk_store")["parts"][-1]
    spans = []
    for f in glob.glob(part + "/*.parquet"):
        md = pq.read_metadata(f)
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins, maxs = [], []
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(cols["chunk_key"]).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    assert len(spans) >= 2, "expected a multi-file range-clustered rewrite"
    spans.sort()
    for (_, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a <= lo_b, spans


def test_shard_range_cell_bound_message():
    """n beyond the shard grid names the REAL problem (round-12 advice):
    the old message ('shard 0 out of range for 5000 shards') misstated a
    grid-capacity error as an index error."""
    from watsondedupe_spark.engine import SHARD_CELLS, shard_range

    with pytest.raises(ValueError, match="SHARD_CELLS"):
        shard_range(0, SHARD_CELLS + 1)


def test_cli_shard_grid_bound_is_usage_error(spark, tmp_path, capsys):
    """--shard 0/5000 must surface as an argparse usage error (exit 2),
    not a raw ValueError traceback from deep inside shard_range."""
    from watsondedupe_spark import cli

    root = str(tmp_path / "idx")
    assert cli.main([root, "create"], spark=spark) == 0
    capsys.readouterr()
    with pytest.raises(SystemExit) as exc:
        cli.main([root, "verify", "--shard", "0/5000"], spark=spark)
    assert exc.value.code == 2
    assert "4096" in capsys.readouterr().err


def test_optimize_records_consistency_point_quiet_window(spark, tmp_path):
    """A quiet window of RETAIN+1 back-to-back optimize() calls must not
    expire the newest ledger point's versions out from under
    verify(consistent=True) (round-11 verdict item #3): every completed
    compaction pass records its own consistency point."""
    engine = DedupeEngine.create(spark, str(tmp_path / "idx"), SMALL)
    engine.write_batch(
        spark.createDataFrame(
            [(f"k{i}", bytearray(rand_bytes(3000, i))) for i in range(6)],
            "object_key string, data binary",
        )
    )
    engine.store.retain_versions = 3  # shrink the window to keep this fast
    for _ in range(engine.store.retain_versions + 1):
        engine.optimize()
    rows = engine.store.table_meta("checkpoints")["rows"]
    assert rows[-1]["op"] == "optimize"
    # the newest point's four versions are all retained -> green scrub
    assert engine.verify(consistent=True).count() == 0


def test_consistent_verify_retention_fallback_raises_with_remediation(
    spark, tmp_path
):
    """When every ledger point's versions have expired (checkpoint-LESS
    store-level compactions), verify(consistent=True) raises one loud
    error naming the remediation — instead of an opaque read_version
    failure mid-scrub — and any composite op heals the mode."""
    engine = DedupeEngine.create(spark, str(tmp_path / "idx"), SMALL)
    engine.write_batch(
        spark.createDataFrame(
            [(f"k{i}", bytearray(rand_bytes(3000, 50 + i))) for i in range(4)],
            "object_key string, data binary",
        )
    )
    engine.store.retain_versions = 2
    for _ in range(3):
        for t in ("objects", "object_map", "chunks", "chunk_store"):
            engine.store.compact(t)  # store-level: records NO ledger point
    with pytest.raises(ValueError, match="no consistency point is fully retained"):
        engine.verify(consistent=True)
    engine.write("heal_key", b"heal payload " * 200)  # records a fresh point
    assert engine.verify(consistent=True).count() == 0


def test_optimize_incremental_rewrites_only_new_parts(spark, tmp_path):
    """optimize(incremental=True) after a small append folds ONLY the
    appended parts (O(new bytes)): the clustered chunk_store baseline
    part survives by PATH (its bytes untouched), the watermark covers
    every live part afterwards, a second incremental pass is a zero-IO
    no-op, and answers are byte-identical throughout."""
    import os

    tables = ("objects", "object_map", "chunks", "chunk_store")
    engine = DedupeEngine.create(spark, str(tmp_path / "idx"), SMALL)
    payloads = {f"k{i}": rand_bytes(4000, 700 + i) for i in range(28)}
    first = {k: payloads[k] for k in list(payloads)[:22]}
    second = {k: payloads[k] for k in list(payloads)[22:]}
    engine.write_batch(
        spark.createDataFrame(
            [(k, bytearray(v)) for k, v in first.items()],
            "object_key string, data binary",
        )
    )
    engine.OPTIMIZE_TARGET_FILE_BYTES = 16_384
    engine.optimize()
    cs_base = engine.store.live_parts("chunk_store")
    assert len(cs_base) == 1

    engine.write_batch(
        spark.createDataFrame(
            [(k, bytearray(v)) for k, v in second.items()],
            "object_key string, data binary",
        )
    )
    appended = [p for p in engine.store.live_parts("chunk_store") if p != cs_base[0]]
    assert appended, "the second batch must append new chunk_store parts"
    base_mtime = os.path.getmtime(cs_base[0])

    out = engine.optimize(incremental=True)
    assert out["chunk_store"] > 0
    post = engine.store.live_parts("chunk_store")
    assert cs_base[0] in post, "the clustered baseline part must survive untouched"
    assert os.path.getmtime(cs_base[0]) == base_mtime
    assert len(post) == 2, post  # baseline + ONE folded clustered delta part
    assert not any(p in post for p in appended)
    meta = engine.store.table_meta("chunk_store")
    assert sorted(meta["clustered_parts"]) == sorted(
        os.path.basename(p) for p in post
    )
    # the pass recorded a consistency point
    assert engine.store.table_meta("checkpoints")["rows"][-1]["op"] == "optimize"

    # second incremental pass: fully clustered -> zero IO, zero flips
    v_before = {t: engine.store.current_version(t) for t in tables}
    out2 = engine.optimize(incremental=True)
    assert all(v == 0 for v in out2.values()), out2
    assert {t: engine.store.current_version(t) for t in tables} == v_before

    # semantics: every object byte-identical, integrity scan clean, and
    # the shard scans still partition the chunks exactly across the
    # mixed (baseline + delta) clustered layout
    from watsondedupe_spark.engine import shard_predicate

    assert engine.verify().count() == 0
    for k, v in payloads.items():
        assert engine.get(k) == v
    n_chunks = engine.chunks.count()
    assert (
        sum(
            engine.chunks.filter(shard_predicate(i, 4)).count() for i in range(4)
        )
        == n_chunks
    )


def test_objects_append_preserves_clustered_watermark(spark, tmp_path):
    """The objects commit advances its max_id watermark via meta MERGE,
    not replace (r12): a write_batch between two optimize() passes must
    leave ``clustered_parts`` intact so the incremental fold rewrites
    only the appended objects part — before the fix the id-watermark
    meta replace silently degraded every incremental optimize() into a
    full objects-table refold."""
    import os

    engine = DedupeEngine.create(spark, str(tmp_path / "idx"), SMALL)
    engine.write_batch(
        spark.createDataFrame(
            [(f"k{i}", bytearray(rand_bytes(3000, 11 + i))) for i in range(12)],
            "object_key string, data binary",
        )
    )
    engine.optimize()
    obj_base = engine.store.live_parts("objects")
    assert len(obj_base) == 1
    meta0 = engine.store.table_meta("objects")
    assert meta0["clustered_parts"] == [os.path.basename(obj_base[0])]
    max_id0 = meta0["max_id"]

    engine.write_batch(
        spark.createDataFrame(
            [(f"n{i}", bytearray(rand_bytes(3000, 99 + i))) for i in range(3)],
            "object_key string, data binary",
        )
    )
    meta1 = engine.store.table_meta("objects")
    # both meta keys survive the append: the id watermark advanced AND
    # the clustering watermark was carried, not clobbered
    assert meta1["max_id"] == max_id0 + 3
    assert meta1["clustered_parts"] == [os.path.basename(obj_base[0])]

    base_mtime = os.path.getmtime(obj_base[0])
    engine.optimize(incremental=True)
    post = engine.store.live_parts("objects")
    assert obj_base[0] in post, "clustered objects baseline must survive by path"
    assert os.path.getmtime(obj_base[0]) == base_mtime
    assert len(post) == 2  # baseline + one folded delta part
    assert engine.objects.count() == 15
    assert engine.verify().count() == 0


def test_optimize_full_resets_incremental_watermark(spark, tmp_path):
    """A full optimize() after incremental passes re-tightens the layout
    to ONE part per table and a single-entry watermark."""
    engine = DedupeEngine.create(spark, str(tmp_path / "idx"), SMALL)
    for lo in (0, 8):
        engine.write_batch(
            spark.createDataFrame(
                [
                    (f"k{i}", bytearray(rand_bytes(3000, 300 + i)))
                    for i in range(lo, lo + 8)
                ],
                "object_key string, data binary",
            )
        )
        engine.optimize(incremental=True)
    engine.optimize()
    import os

    for t in ("objects", "object_map", "chunks", "chunk_store"):
        parts = engine.store.live_parts(t)
        assert len(parts) == 1, (t, parts)
        assert engine.store.table_meta(t)["clustered_parts"] == [
            os.path.basename(parts[0])
        ]
    assert engine.verify().count() == 0


def test_clone_at_without_max_id_fails_loudly(spark, tmp_path):
    """clone(at=) on a checkpoint whose objects manifest meta lacks the
    max_id high-water mark (pre-max_id-era index) must fail loudly
    (round-12 advice): a silent max(id)-of-rows fallback would re-issue
    ids of objects deleted before the point."""
    engine = DedupeEngine.create(spark, str(tmp_path / "idx"), SMALL)
    engine.write("a", b"payload a " * 300)
    engine.store.update_meta(
        "objects", lambda m: {k: v for k, v in m.items() if k != "max_id"}
    )
    engine._record_checkpoint("test")
    seq = int(engine.store.table_meta("checkpoints")["rows"][-1]["seq"])
    with pytest.raises(ValueError, match="max_id"):
        engine.clone(str(tmp_path / "c"), at=seq)
    # the LIVE clone path still works (meta restored by the next write)
    engine.write("b", b"payload b " * 300)
    clone = engine.clone(str(tmp_path / "c2"))
    assert sorted(r.object_key for r in clone.objects.collect()) == ["a", "b"]


def test_vacuum_reclaims_orphans_with_grace_and_retention(engine):
    """vacuum() (the Delta VACUUM analogue) removes a crashed writer's
    aged orphan part dirs, SPARES younger-than-grace dirs (possible
    in-flight writers) and everything referenced by any retained
    manifest version (time-travel readers), and changes no answers."""
    import os
    import time as _time

    data = {f"v{i}": rand_bytes(3000, 40 + i) for i in range(6)}
    engine.write_batch(
        engine.spark.createDataFrame(
            [(k, bytearray(v)) for k, v in data.items()],
            "object_key string, data binary",
        )
    )
    v_before = engine.store.current_version("chunk_store")
    engine.optimize()  # prior parts now referenced ONLY by retained history

    tdir = os.path.join(engine.store.root, "chunk_store")
    old = os.path.join(tdir, "p99999990_orphaned")
    fresh = os.path.join(tdir, "p99999991_inflight")
    for p in (old, fresh):
        os.makedirs(p)
        with open(os.path.join(p, "part-junk.parquet"), "wb") as f:
            f.write(b"x" * 4096)
    stale = _time.time() - 7200
    os.utime(old, (stale, stale))

    out = engine.vacuum()
    assert out["chunk_store"]["parts_removed"] == 1
    assert out["chunk_store"]["mb_reclaimed"] > 0
    assert not os.path.exists(old)
    assert os.path.exists(fresh), "younger-than-grace dir must be spared"
    # explicit zero grace (single-writer quiesced) removes the fresh one
    out2 = engine.vacuum(grace_seconds=0)
    assert out2["chunk_store"]["parts_removed"] == 1
    assert not os.path.exists(fresh)
    # retention protection: the pre-optimize version stays readable
    assert engine.store.read_version("chunk_store", v_before).count() > 0
    for k, v in data.items():
        assert engine.get(k) == v
    assert engine.verify().count() == 0


def test_cli_vacuum_verb(spark, tmp_path, capsys):
    import json as _json
    import os
    import time as _time

    from watsondedupe_spark import cli

    root = str(tmp_path / "idx")
    assert cli.main([root, "create"], spark=spark) == 0
    eng = DedupeEngine.open(spark, root)
    eng.write("k0", b"payload " * 500)
    orphan = os.path.join(root, "objects", "p99999990_orphaned")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "junk.parquet"), "wb") as f:
        f.write(b"y" * 1024)
    stale = _time.time() - 7200
    os.utime(orphan, (stale, stale))
    capsys.readouterr()
    assert cli.main([root, "vacuum"], spark=spark) == 0
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["objects"]["parts_removed"] == 1
    assert not os.path.exists(orphan)
    assert eng.get("k0") == b"payload " * 500


def test_surgical_repair_rewrites_only_affected_parts(engine, spark):
    """r12 optimization witness: when the store is past the surgical
    byte gate, repair()/recover() canonicalization and GC rewrite ONLY
    the parts that may contain a bad key — healthy parts survive BY
    PATH — and the healed state is byte-identical to the full-rewrite
    path's answer (verify() clean, payloads intact)."""
    from watsondedupe_spark.keys import chunk_key

    eng = engine
    eng.SURGICAL_MIN_BYTES = 0  # force the surgical path on a tiny store
    # three separate batches -> three chunk_store PART DIRS, each with
    # its own Bloom sidecar (pruning is per part; hash keys need the
    # membership witness, spans cover the whole keyspace)
    for lo in (0, 8, 16):
        eng.write_batch(
            spark.createDataFrame(
                [(f"k{i:03d}", rand_bytes(40_000, seed=i)) for i in range(lo, lo + 8)],
                "object_key string, data binary",
            )
        )
    before_parts = set(eng.store.live_parts("chunk_store"))
    assert len(before_parts) > 1

    # plant: a duplicate-garbage payload under an existing key plus an
    # orphan payload (no chunks row) — the repair()+recover() classes
    victim = eng.chunks.agg(F.min("chunk_key")).collect()[0][0]
    orphan = b"surgical-orphan-payload"
    eng.store.append(
        "chunk_store",
        spark.createDataFrame(
            [(victim, bytearray(b"x")), (chunk_key(orphan), bytearray(orphan))],
            "chunk_key string, data binary",
        ),
    )
    planted_part = (set(eng.store.live_parts("chunk_store")) - before_parts).pop()

    deltas = eng.repair()
    # both planted rows are gone: the garbage dup via canonicalization,
    # the orphan via recover()'s GC
    assert deltas["chunk_store_canonicalized"] == -1
    assert deltas["chunk_store"] == -1
    assert eng.verify().count() == 0
    after_parts = set(eng.store.live_parts("chunk_store"))
    # surgical witness: every healthy pre-existing part whose key span
    # excludes the victim survived BY PATH (untouched bytes); the
    # planted part and the victim's part were rewritten
    survivors = before_parts & after_parts
    assert len(survivors) >= len(before_parts) - 2
    assert planted_part not in after_parts
    # and the data still reassembles exactly
    got = eng.get("k003")
    assert got == rand_bytes(40_000, seed=3)


def test_surgical_delete_falls_back_below_byte_gate(engine, spark):
    """Below SURGICAL_MIN_BYTES the full-rewrite path runs (single
    part afterwards) and heals identically."""
    from watsondedupe_spark.keys import chunk_key

    eng = engine
    assert eng.SURGICAL_MIN_BYTES > 0  # class default: tiny stores full-rewrite
    objs = spark.createDataFrame(
        [(f"k{i:03d}", rand_bytes(30_000, seed=100 + i)) for i in range(4)],
        "object_key string, data binary",
    )
    eng.write_batch(objs)
    orphan = b"fallback-orphan"
    eng.store.append(
        "chunk_store",
        spark.createDataFrame(
            [(chunk_key(orphan), bytearray(orphan))],
            "chunk_key string, data binary",
        ),
    )
    deltas = eng.repair()
    assert deltas["chunk_store"] == -1
    assert eng.verify().count() == 0
    assert eng.get("k001") == rand_bytes(30_000, seed=101)
