"""Chunker unit/property tests — the §5 invariants of SURVEY.md.

These run before any Spark wrapping: the chunker must be provably correct
as a pure function (roundtrip, determinism, bounds, single-chunk path,
max-size forced boundary) per the reference harness behaviors
(src/SampleApp/Program.cs:19-35, src/Cli/test.bat, Test.ReadStream).
"""

import base64
import hashlib
import random

import pytest
from hypothesis import given, settings as hyp_settings, strategies as st

from watsondedupe_spark.chunking import (
    Chunk,
    ChunkSettings,
    SMALL_FILE_PROFILE,
    chunk_bytes,
    is_boundary,
    segment_bytes,
)
from watsondedupe_spark.keys import chunk_key

SMALL = ChunkSettings(*SMALL_FILE_PROFILE)  # 2048/16384/128/2 (README.md:154-157)


def rand_bytes(n: int, seed: int = 42) -> bytes:
    return random.Random(seed).randbytes(n)


# --- settings validation (DedupeSettings.cs:19-98) -------------------------


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(min_chunk_size=128),  # < 256
        dict(min_chunk_size=300),  # not /64
        dict(max_chunk_size=1024),  # < 2048
        dict(min_chunk_size=4096, max_chunk_size=8192),  # < 8x min
        dict(shift_count=1),  # must be > 1
        dict(shift_count=2048),  # > min
        dict(boundary_check_bytes=0),
        dict(boundary_check_bytes=5),
    ],
)
def test_settings_validation_rejects(kwargs):
    with pytest.raises(ValueError):
        ChunkSettings(**kwargs)


def test_settings_roundtrip_config():
    s = ChunkSettings(*SMALL_FILE_PROFILE)
    assert ChunkSettings.from_config(s.to_config()) == s


# --- key encoding parity (DedupeCommon.cs:106-111, 146-154) ----------------


def test_chunk_key_is_urlsafe_unpadded_b64_sha256():
    data = b"hello world"
    raw = hashlib.sha256(data).digest()
    expected = base64.b64encode(raw).decode().replace("=", "").replace("/", "_").replace("+", "-")
    assert chunk_key(data) == expected
    assert "=" not in chunk_key(data)


def test_chunk_key_known_vector():
    # sha256("") = e3b0c442...; b64 of raw digest, unpadded urlsafe
    assert chunk_key(b"") == "47DEQpj8HBSa-_TImW-5JCeuQeRkm5NMpJWZG3hSuFU"


# --- boundary predicate (DedupeCommon.cs:157-181) ---------------------------


def test_is_boundary():
    assert is_boundary(b"\x00\x00" + b"\xff" * 14, 2)
    assert not is_boundary(b"\x00\x01" + b"\x00" * 14, 2)
    assert is_boundary(b"\x00" * 16, 4)
    assert not is_boundary(b"\x01" + b"\x00" * 15, 1)


# --- core invariants --------------------------------------------------------


def reassemble(chunks: list[Chunk]) -> bytes:
    return b"".join(c.data for c in sorted(chunks, key=lambda c: c.address))


@pytest.mark.parametrize(
    "size",
    [1, 100, 2047, 2048, 2049, 5000, 16384, 16385, 70000, 200001],
)
def test_roundtrip_at_boundary_sizes(size):
    """Invariant 5.1: sizes below/at/above min and above max."""
    data = rand_bytes(size, seed=size)
    chunks = chunk_bytes(data, SMALL)
    assert reassemble(chunks) == data


def test_single_chunk_path():
    """<= min_chunk_size -> exactly one chunk (DedupeLibrary.cs:623-637)."""
    data = rand_bytes(2048)
    chunks = chunk_bytes(data, SMALL)
    assert len(chunks) == 1
    assert chunks[0] == Chunk(chunk_key(data), 2048, 0, 0, data)


def test_empty_rejected():
    with pytest.raises(ValueError):
        chunk_bytes(b"", SMALL)


def test_determinism():
    """Invariant 5.7: same bytes + settings => same boundaries and keys."""
    data = rand_bytes(100_000)
    a = chunk_bytes(data, SMALL)
    b = chunk_bytes(data, SMALL)
    assert [(c.key, c.address, c.length) for c in a] == [
        (c.key, c.address, c.length) for c in b
    ]


def test_chunk_size_bounds_and_tiling():
    """FIXTURES.md §4.6: lengths in [1, max]; addresses tile [0, n)."""
    data = rand_bytes(500_000, seed=7)
    chunks = chunk_bytes(data, SMALL)
    assert len(chunks) > 1
    pos = 0
    for i, c in enumerate(chunks):
        assert c.position == i
        assert c.address == pos
        assert 1 <= c.length <= SMALL.max_chunk_size
        pos += c.length
    assert pos == len(data)
    # all but the last chunk are at least min-size (window starts at min)
    for c in chunks[:-1]:
        assert c.length >= SMALL.min_chunk_size


def test_max_size_forced_boundary():
    """Incompressible-ish constant data never hits an MD5 boundary at every
    window, but a chunk must still cut at max_chunk_size."""
    data = rand_bytes(200_000, seed=99)
    chunks = chunk_bytes(data, SMALL)
    assert max(c.length for c in chunks) <= SMALL.max_chunk_size


def test_identical_payloads_share_chunks():
    """Invariant 5.2/FIXTURES §4.4: objects with identical bytes produce the
    identical ordered chunk-key sequence — the premise of dedup."""
    data = rand_bytes(80_000, seed=3)
    a = chunk_bytes(data, SMALL)
    b = chunk_bytes(data, SMALL)
    assert [c.key for c in a] == [c.key for c in b]


def test_repeated_block_intra_dedup():
    """small.txt-style intra-file duplication: a block repeated many times
    yields far fewer distinct chunk keys than chunk occurrences. Uses
    boundary_check_bytes=1 (one boundary per ~32 KB at shift=128) so
    content-defined cuts actually fire and re-synchronize across repeats;
    at the default N=2 a boundary fires only every ~8 MB (256^-N per
    shift, DedupeCommon.cs:157-181)."""
    block = rand_bytes(40_000, seed=5)
    data = block * 8
    chunks = chunk_bytes(data, ChunkSettings(2048, 16384, 128, 1))
    distinct = {c.key for c in chunks}
    assert len(distinct) < len(chunks)


def test_segment_bytes_tiles():
    data = rand_bytes(100_000)
    segs = list(segment_bytes(data, 32768))
    assert b"".join(s for _, s in segs) == data
    assert [off for off, _ in segs] == list(range(0, 100_000, 32768))


@hyp_settings(max_examples=25, deadline=None)
@given(st.binary(min_size=1, max_size=60_000))
def test_roundtrip_property(data):
    chunks = chunk_bytes(data, SMALL)
    assert reassemble(chunks) == data
    assert sum(c.length for c in chunks) == len(data)


def test_spark_chunker_matches_local(spark):
    """The mapInPandas wrapper emits exactly the pure-function rows."""
    from watsondedupe_spark.chunking import chunk_objects

    payloads = {f"obj{i}": rand_bytes(10_000 + 7000 * i, seed=i) for i in range(6)}
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()], "object_key string, data binary"
    )
    rows = chunk_objects(df, SMALL).collect()
    got = {}
    for r in rows:
        got.setdefault(r.object_key, []).append(r)
    for key, payload in payloads.items():
        expected = chunk_bytes(payload, SMALL)
        actual = sorted(got[key], key=lambda r: r.position)
        assert [(c.key, c.length, c.position, c.address) for c in expected] == [
            (r.chunk_key, r.length, r.position, r.address) for r in actual
        ]
        assert b"".join(bytes(r.chunk_data) for r in actual) == payload


def test_chunk_key_col_matches_python(spark):
    """Columnar key expression == pure-Python key (keys.py parity)."""
    from pyspark.sql import functions as F

    from watsondedupe_spark.keys import chunk_key_col

    payloads = [rand_bytes(n, seed=n) for n in (1, 17, 1000)]
    df = spark.createDataFrame([(bytearray(p),) for p in payloads], "data binary")
    rows = df.select(chunk_key_col(F.col("data")).alias("k")).collect()
    assert [r.k for r in rows] == [chunk_key(p) for p in payloads]


def test_segmented_chunker_tiles_and_rebases(spark):
    """Segment-framed chunking: frames chunked independently, addresses
    rebased by frame offset, positions globally re-derived — the result
    still tiles the object exactly and reassembles byte-identically."""
    from watsondedupe_spark.chunking import chunk_objects_segmented

    payloads = {f"big{i}": rand_bytes(150_000 + 40_000 * i, seed=100 + i) for i in range(3)}
    df = spark.createDataFrame(
        [(k, bytearray(v)) for k, v in payloads.items()], "object_key string, data binary"
    )
    rows = chunk_objects_segmented(df, SMALL, segment_size=65536).collect()
    got = {}
    for r in rows:
        got.setdefault(r.object_key, []).append(r)
    for key, payload in payloads.items():
        ordered = sorted(got[key], key=lambda r: r.address)
        # positions are the 0-based rank of addresses
        assert [r.position for r in ordered] == list(range(len(ordered)))
        # chunks tile [0, len) with no gaps or overlaps
        cursor = 0
        for r in ordered:
            assert r.address == cursor
            cursor += r.length
        assert cursor == len(payload)
        # payload roundtrip + per-chunk content addressing still holds
        assert b"".join(bytes(r.chunk_data) for r in ordered) == payload
        for r in ordered:
            assert r.chunk_key == chunk_key(bytes(r.chunk_data))
        # frame interiors chunk exactly like the plain chunker: every
        # boundary that is not within max_chunk_size of a frame edge must
        # also be a plain-chunker boundary of that frame's bytes
        assert len(ordered) >= len(payload) // SMALL.max_chunk_size


def test_segmented_rejects_small_segment():
    from watsondedupe_spark.chunking import chunk_objects_segmented

    with pytest.raises(ValueError):
        chunk_objects_segmented(None, SMALL, segment_size=1024)
